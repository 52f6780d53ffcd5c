"""Profile artifact sinks — reference S8 (``api/services/pipeline.py:502-584``,
CSV export ``api/routers/runs.py:1039-1197``).

The reference emits ``profile.json`` (nested per-column profile tree) and
``metrics.csv`` (flat per-column rows with CSV-injection sanitizing,
``runs.py:1012-1036``). Here both are driver-side renderings of the small
collected profile dict from ``operators.profiler.profile_table`` — the
distributed work already happened; artifacts never touch executors. The
HTML report of the reference is presentation, not engine, and stays out of
scope (SURVEY.md §2.1 S8).

Counts-not-values discipline: the artifact carries aggregates and bounded
top-N values only — exactly what ``profile_table`` returns.
"""

from __future__ import annotations

import csv
import json
import math
import os
from typing import Any


def _json_safe(v: Any) -> Any:
    """inf/NaN → null, recursively — reference P12 JSON sanitizer
    (``runs.py:184-208``)."""
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    return v


def csv_injection_sanitize(value: str) -> str:
    """Prefix ``'`` when a cell starts with ``= + - @`` — reference P11
    (``runs.py:1012-1036``); the Spark-side expression twin lives in
    operators.validators.csv_injection_sanitize."""
    return "'" + value if value[:1] in ("=", "+", "-", "@") else value


def write_profile_artifacts(profile: dict, out_dir: str) -> dict[str, str]:
    """Write ``profile.json`` + ``metrics.csv`` for a profile_table dict.
    Returns {artifact_name: path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    jpath = os.path.join(out_dir, "profile.json")
    with open(jpath, "w") as f:
        json.dump(_json_safe(profile), f, indent=2, default=str)
    paths["profile.json"] = jpath

    cpath = os.path.join(out_dir, "metrics.csv")
    distincts = profile.get("distincts", {})
    with open(cpath, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            [
                "column_name",
                "total_count",
                "non_null_count",
                "null_count",
                "empty_count",
                "distinct_count",
                "cardinality_ratio",
                "top_values",
            ]
        )
        for col, row in sorted(distincts.items()):
            top = profile.get("top_values", {}).get(col, [])
            top_str = ";".join(f"{v}:{c}" for v, c in top)
            w.writerow(
                [
                    csv_injection_sanitize(str(col)),
                    row.get("total_count"),
                    row.get("non_null_count"),
                    row.get("null_count"),
                    row.get("empty_count"),
                    row.get("distinct_count"),
                    row.get("cardinality_ratio"),
                    csv_injection_sanitize(top_str),
                ]
            )
    paths["metrics.csv"] = cpath
    return paths
