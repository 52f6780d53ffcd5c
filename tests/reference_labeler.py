"""Single-process reference labeler — the correctness oracle.

Implements the keep/drop decision, quality signals, and PII scrub in plain
Python (``re`` + the shared numpy models), using the exact same rule
constants (data_profiler_spark.rules) and pattern list
(data_profiler_spark.functions.pii.PATTERNS) as the distributed pipeline —
FIXTURES.md §F1: "a single-process Python labeler using the exact same rule
constants, then the Spark pipeline must match: keep/drop F1 ≥ 0.99 and
byte-identical scrubbed text per document."

Definitions mirror the pinned Spark-expression semantics documented in
data_profiler_spark/functions/textstats.py (ASCII-whitespace split, space
trim, non-overlapping counts).
"""

from __future__ import annotations

import re

from data_profiler_spark import rules
from data_profiler_spark.functions.pii import PATTERNS
from data_profiler_spark.functions.textmodel import langid_model, perplexity_model

_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_PII_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PATTERNS]


def signals(text: str) -> dict:
    words = [w for w in _WS_RE.split(text) if w]
    lines = [l.strip(" ") for l in text.split("\n")]
    lines = [l for l in lines if l]
    wc = len(words)
    lc = len(lines)
    mean_wl = sum(len(w) for w in words) / wc if wc else 0.0
    mean_ll = sum(len(l) for l in lines) / lc if lc else 0.0
    symbol_count = text.count("#") + text.count("...")
    bullet = sum(1 for l in lines if l[0] in "-*•")
    ellipsis = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    lower_words = {w.lower() for w in words}
    stop_hits = sum(1 for s in rules.STOPWORDS if s in lower_words)
    alpha = sum(1 for w in words if _ALPHA_RE.search(w))
    distinct_lines = len(set(lines))
    n2 = wc - 1
    grams = [words[i] + " " + words[i + 1] for i in range(n2)] if wc >= 2 else []
    dup_2gram = 1.0 - len(set(grams)) / n2 if n2 > 0 else 0.0
    return {
        "word_count": wc,
        "line_count": lc,
        "mean_word_length": mean_wl,
        "mean_line_length": mean_ll,
        "symbol_ratio": symbol_count / wc if wc else 0.0,
        "bullet_line_fraction": bullet / lc if lc else 0.0,
        "ellipsis_line_fraction": ellipsis / lc if lc else 0.0,
        "stopword_hits": stop_hits,
        "alpha_word_fraction": alpha / wc if wc else 0.0,
        "dup_line_fraction": 1.0 - distinct_lines / lc if lc else 0.0,
        "dup_2gram_fraction": dup_2gram,
    }


def heuristic_reasons(sig: dict) -> list[str]:
    out = []
    if sig["word_count"] < rules.MIN_WORDS:
        out.append("too_few_words")
    if sig["word_count"] > rules.MAX_WORDS:
        out.append("too_many_words")
    if sig["word_count"] > 0 and not (
        rules.MIN_MEAN_WORD_LENGTH <= sig["mean_word_length"] <= rules.MAX_MEAN_WORD_LENGTH
    ):
        out.append("mean_word_length")
    if sig["mean_line_length"] > rules.MAX_MEAN_LINE_LENGTH:
        out.append("mean_line_length")
    if sig["symbol_ratio"] > rules.MAX_SYMBOL_TO_WORD_RATIO:
        out.append("symbol_ratio")
    if sig["bullet_line_fraction"] > rules.MAX_BULLET_LINE_FRACTION:
        out.append("bullet_lines")
    if sig["ellipsis_line_fraction"] > rules.MAX_ELLIPSIS_LINE_FRACTION:
        out.append("ellipsis_lines")
    if sig["stopword_hits"] < rules.MIN_STOPWORD_HITS:
        out.append("stopwords")
    if sig["alpha_word_fraction"] < rules.MIN_ALPHA_WORD_FRACTION:
        out.append("alpha_words")
    if sig["dup_line_fraction"] > rules.MAX_DUP_LINE_FRACTION:
        out.append("dup_lines")
    if sig["dup_2gram_fraction"] > rules.MAX_DUP_2GRAM_FRACTION:
        out.append("dup_2grams")
    return out


def scrub(text: str) -> tuple[str, dict]:
    counts = {}
    cur = text
    for name, rx, repl in _PII_COMPILED:
        cur, n = rx.subn(repl, cur)
        counts[name] = n
    return cur, counts


def label_batch(texts: list[str], keep_langs=rules.KEEP_LANGS) -> list[dict]:
    """Label a batch of documents (batched so the numpy models vectorize)."""
    langs, _margins = langid_model().predict_batch(texts)
    ppls = perplexity_model().log_perplexity_batch(texts)
    out = []
    for text, lang_pred, log_ppl in zip(texts, langs, ppls):
        sig = signals(text)
        reasons = []
        if lang_pred not in keep_langs:
            reasons.append("lang")
        reasons.extend(heuristic_reasons(sig))
        if log_ppl > rules.MAX_LOG_PERPLEXITY:
            reasons.append("perplexity")
        scrubbed, pii = scrub(text)
        out.append(
            {
                "lang_pred": lang_pred,
                "log_ppl": float(log_ppl),
                "signals": sig,
                "drop_reasons": reasons,
                "keep": not reasons,
                "scrubbed_text": scrubbed,
                "pii_counts": pii,
            }
        )
    return out
