"""Error aggregation — reference A18 (``api/services/errors.py:84-276``).

Error events become a side DataFrame of ``(code, line_number, column,
catastrophic)`` rows; the rollup is one small groupBy: count, first
occurrence (min line), share of total rows, catastrophic flag. The
reference's dedupe-by-code accumulation (``workspace.py:239-287``) is the
same groupBy with ``count``; "first occurrence" (``errors.py:141-143``)
is ``min(line_number)``.

The catastrophic gate (reference stops the pipeline on the first
catastrophic error — ``errors.py:52-56``) maps to: run the cheap validation
aggregates first, check ``any_catastrophic``, and skip the expensive stage
when it trips (SURVEY.md §7.3.6 — same observable outcome in a lazy
engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Error-code registry (reference ``errors.py:12-56`` discipline): code →
# catastrophic?  Codes used by the intake validators in io/intake.py.
ERROR_CODES: dict[str, bool] = {
    "E_UTF8_INVALID": True,
    "E_HEADER_MISSING": True,
    "E_JAGGED_ROW": True,
    "E_UNQUOTED_DELIM": False,
    "E_QUOTE_RULE": False,
    "W_DELIMITER_MISMATCH": False,
    "W_QUOTING_MISMATCH": False,
    "W_MIXED_LINE_ENDINGS": False,
}

ERROR_SCHEMA = "code string, line_number long, column string"


def error_rollup(errors: DataFrame, total_rows: int) -> DataFrame:
    """Group error rows by code: count, first line, % of rows, catastrophic.

    Deterministic order: catastrophic first, then count desc, code asc
    (reference sorts summaries by count desc, ``errors.py:217-218``)."""
    cat = F.create_map(
        *[x for code, is_cat in ERROR_CODES.items() for x in (F.lit(code), F.lit(is_cat))]
    )
    return (
        errors.groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.min("line_number").alias("first_line"),
        )
        .withColumn("catastrophic", F.coalesce(cat[F.col("code")], F.lit(False)))
        .withColumn(
            "pct_of_rows",
            F.round(F.col("count") / F.lit(max(total_rows, 1)) * 100.0, 4),
        )
        .orderBy(F.desc("catastrophic"), F.desc("count"), F.asc("code"))
    )


def any_catastrophic(rollup: DataFrame) -> bool:
    """Driver-side catastrophic gate."""
    return rollup.filter(F.col("catastrophic")).limit(1).count() > 0
