"""Shared numpy core for language-ID and perplexity scoring.

This module is imported by BOTH the Spark pandas UDFs (functions/langid.py)
and the single-process reference labeler (tests/reference_labeler.py), so
the distributed pipeline and the oracle run literally the same arithmetic —
the keep/drop F1 gate (BASELINE.json) then measures pipeline plumbing, not
model drift.

Design (north_star: "fastText language-ID model broadcast to executors …
batched character/word n-gram hash + KenLM-style perplexity scorer"):

* **Language ID** — hashed character-trigram bag (fastText-style input
  featurization) → L2-normalized doc vector → cosine against per-language
  centroid rows trained on the seeded corpus. Pure numpy, fully batch
  vectorized (no per-row Python beyond the text→bytes encode).
* **Perplexity** — hashed character-4-gram unigram LM with add-one
  smoothing trained on the seeded English corpus; score is
  log-perplexity = −mean log P(gram). KenLM-in-spirit (n-gram LM score
  per doc), hash-bucketed so the table is a dense vector that broadcasts
  in one piece.

Everything is deterministic: polynomial byte hashes (no Python ``hash``),
fixed seeds, fixed dimensions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from . import corpus

LANGID_DIM = 2048
PPL_DIM = 16384
_INF = float("inf")


def _ngram_buckets(text: str, n: int, dim: int) -> np.ndarray:
    """Polynomial rolling hash of byte n-grams → bucket ids (vectorized)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if b.size < n:
        return np.empty(0, dtype=np.int64)
    acc = np.zeros(b.size - n + 1, dtype=np.int64)
    for i in range(n):
        acc = acc * 31 + b[i : b.size - n + 1 + i]
        acc %= 1 << 40  # keep well inside int64 before the final mod
    return acc % dim


def doc_vector(text: str) -> np.ndarray:
    """L2-normalized hashed-trigram count vector."""
    buckets = _ngram_buckets(text, 3, LANGID_DIM)
    v = np.bincount(buckets, minlength=LANGID_DIM).astype(np.float64)
    norm = np.linalg.norm(v)
    return v / norm if norm > 0 else v


@dataclass
class LangIdModel:
    langs: tuple[str, ...]
    centroids: np.ndarray  # (L, LANGID_DIM), rows L2-normalized

    def predict_batch(self, texts: list[str]) -> tuple[list[str], np.ndarray]:
        """Batch argmax-cosine prediction. Returns (labels, margins) where
        margin = best − second-best cosine (confidence proxy)."""
        if not texts:
            return [], np.empty(0)
        X = np.stack([doc_vector(t or "") for t in texts])  # (N, D)
        scores = X @ self.centroids.T  # (N, L)
        order = np.argsort(scores, axis=1)
        best = order[:, -1]
        margin = scores[np.arange(len(texts)), best] - scores[
            np.arange(len(texts)), order[:, -2]
        ]
        return [self.langs[i] for i in best], margin


@dataclass
class PerplexityModel:
    log_probs: np.ndarray  # (PPL_DIM,)

    def log_perplexity_batch(self, texts: list[str]) -> np.ndarray:
        out = np.empty(len(texts))
        for i, t in enumerate(texts):
            buckets = _ngram_buckets(t or "", 4, PPL_DIM)
            out[i] = -self.log_probs[buckets].mean() if buckets.size else _INF
        return out


@lru_cache(maxsize=1)
def langid_model() -> LangIdModel:
    """Train the seeded model once per process (executors train identically
    from the same seed — equivalent to broadcasting fitted weights, without
    shipping a binary blob; the weights ARE a function of the seed)."""
    langs = corpus.LANGS
    rows = []
    for lang in langs:
        V = np.stack([doc_vector(t) for t in corpus.training_corpus(lang)])
        c = V.mean(axis=0)
        rows.append(c / np.linalg.norm(c))
    return LangIdModel(langs=langs, centroids=np.stack(rows))


@lru_cache(maxsize=1)
def perplexity_model() -> PerplexityModel:
    counts = np.zeros(PPL_DIM, dtype=np.float64)
    for t in corpus.training_corpus("en"):
        buckets = _ngram_buckets(t, 4, PPL_DIM)
        counts += np.bincount(buckets, minlength=PPL_DIM)
    total = counts.sum()
    log_probs = np.log((counts + 1.0) / (total + PPL_DIM))
    return PerplexityModel(log_probs=log_probs)
