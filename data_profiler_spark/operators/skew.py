"""Key-skew measurement — the evidence behind the pipeline's salting.

The north rule requires "partitioning / shuffle / skew handled
explicitly": ``pipeline.url_salt`` defuses host-level skew, and this
module MEASURES the skew so the salt-bucket count is chosen from data
instead of folklore. One groupBy on the key (map-side partial agg) plus
one tiny summary agg — cost is one shuffle whose volume is the number of
distinct keys per task.

A Zipf host distribution (typical for web crawls) shows up here as
``skew_ratio`` (max/avg rows per key) in the hundreds-to-millions: that
is the straggler multiplier a key-partitioned stage would suffer, and
directly the number of salt buckets needed to flatten the hottest key to
average-task size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_expr(url: Column) -> Column:
    """scheme://HOST/... → host (empty string when the url has no
    authority component). Pure JVM regexp — usable inside any plan."""
    return F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)


def key_skew_report(df: DataFrame, key: Column) -> DataFrame:
    """Single-row skew summary of ``key``'s row distribution:

    n_keys, total_rows, max_cnt, avg_cnt, p50_cnt, p99_cnt (exact percentiles —
    engine invariant, never approx), skew_ratio = max/avg, top1_share =
    hottest key's fraction of all rows.
    """
    counts = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    q = F.percentile("cnt", F.array(F.lit(0.5), F.lit(0.99)))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.avg("cnt"), 6).alias("avg_cnt"),
        F.round(q[0], 6).alias("p50_cnt"),
        F.round(q[1], 6).alias("p99_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_ratio"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
    )


def recommend_salt_buckets(report_row: dict, target_ratio: float = 2.0, cap: int = 4096) -> int:
    """Salt buckets that flatten the hottest key to ``target_ratio`` × the
    average key's row count (driver-side pure function over the
    :func:`key_skew_report` row). Power-of-two, capped — more buckets than
    cluster tasks only adds tiny files."""
    ratio = float(report_row.get("skew_ratio") or 1.0)
    need = max(1.0, ratio / target_ratio)
    return int(min(cap, 2 ** math.ceil(math.log2(need)) if need > 1 else 1))
