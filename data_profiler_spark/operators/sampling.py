"""Deterministic corpus-selection operators for training-data mixes.

Two selection primitives every pretraining pipeline runs after cleaning:

* **Token-budget selection** — "take the highest-priority documents until
  the token budget is spent". The naive expression is a global
  ``Window.orderBy(priority)`` running sum, which Spark executes on a
  SINGLE partition — a non-starter at corpus scale. ``token_budget_sample``
  gets the EXACT same answer with a bounded-size priority histogram:
  one groupBy over ≤ ``bins`` keys, a driver-side threshold scan over
  that histogram, and a narrow filter. Only the single boundary bin
  (expected n/bins rows) pays a sort.
* **Exact stratified sampling** — exactly ``n`` rows per stratum,
  deterministically (hash-ranked), where ``DataFrame.sampleBy`` is only
  approximate.

Determinism discipline: ties are broken by ``md5`` of the id column
(oracle-checkable, CLAUDE.md hashing rule), never by partition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BINS = 4096


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    priority: Column,
    tokens: Column,
    id_col: str = "doc_id",
    bins: int = DEFAULT_BINS,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Select documents in priority order until the token budget is spent.

    Exact semantics (matched by the DuckDB oracle): order all docs by
    (priority DESC, md5(id) ASC); keep each doc whose running token total
    INCLUDING itself is ≤ ``budget_tokens``. Null priorities sort last
    (coalesced to ``lo``).

    Scale shape — the whole point of this operator:

    1. One narrow projection computes ``(id, prio, toks, bin)`` where
       ``bin = floor((prio - lo) / (hi - lo) * bins)`` (equal priorities
       always share a bin, so bin order is priority order).
    2. One groupBy over ≤ ``bins`` keys → per-bin token totals — a
       map-side-combinable agg whose result fits on the driver no matter
       the corpus size.
    3. The driver scans bins highest-first: bins whose cumulative total
       stays within budget are taken WHOLE (a pure filter, no sort);
       the single boundary bin gets the leftover budget.
    4. Only the boundary bin (expected n/``bins`` rows) is sorted — a
       per-bin window, not a global one. Its running sum must start from
       the same (priority DESC, hash) order the global sort would use,
       which holds because every higher-priority doc is in a higher bin.

    Returns ``(id, priority, tokens, selected_bin)`` for the selected
    docs. ``lo``/``hi`` bound the priority range (default [0, 1] — the
    engine's quality-score range); out-of-range values clamp into the
    edge bins, which stays EXACT as long as clamped values keep their
    relative order within the edge bin (they do: the boundary-bin sort
    uses the raw priority, not the bin).
    """
    span = float(hi) - float(lo)
    prio = F.coalesce(priority.cast("double"), F.lit(float(lo)))
    raw_bin = F.floor((prio - F.lit(float(lo))) / F.lit(span) * F.lit(bins)).cast("long")
    bin_col = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(bins - 1))
    base = df.select(
        F.col(id_col),
        prio.alias("priority"),
        tokens.cast("long").alias("tokens"),
        bin_col.alias("selected_bin"),
        F.md5(F.col(id_col).cast("string")).alias("_tb"),
    )

    hist = {
        r["selected_bin"]: r["total"]
        for r in base.groupBy("selected_bin").agg(F.sum("tokens").alias("total")).collect()
    }
    cum = 0
    full_bins: list[int] = []
    boundary_bin: int | None = None
    boundary_budget = 0
    for b in sorted(hist, reverse=True):
        if cum + hist[b] <= budget_tokens:
            full_bins.append(b)
            cum += hist[b]
        else:
            boundary_bin = b
            boundary_budget = budget_tokens - cum
            break

    out_cols = [id_col, "priority", "tokens", "selected_bin"]
    whole = base.filter(F.col("selected_bin").isin(full_bins) if full_bins else F.lit(False))
    if boundary_bin is None:
        return whole.select(*out_cols)
    w = Window.partitionBy("selected_bin").orderBy(
        F.col("priority").desc(), F.col("_tb").asc()
    )
    partial = (
        base.filter(F.col("selected_bin") == boundary_bin)
        .withColumn("_run", F.sum("tokens").over(w))
        .filter(F.col("_run") <= boundary_budget)
    )
    return whole.select(*out_cols).unionByName(partial.select(*out_cols))


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, chosen by
    md5-hash rank of the id — deterministic, seedless, and uniform-ish
    (hash order is independent of any data column), unlike
    ``DataFrame.sampleBy`` which is probabilistic in both membership and
    count.

    One shuffle (the per-stratum window). The window partitions by
    stratum, so a corpus-dominating stratum concentrates on one task;
    for production-scale strata pre-filter with a ``TABLESAMPLE``-style
    hash band (``md5(id) < k/|stratum|`` estimate) first and rank only
    survivors — noted rather than built in because the exact top-n on
    the band is the same code path.
    """
    w = Window.partitionBy(strata_col).orderBy(F.md5(F.col(id_col).cast("string")))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )
