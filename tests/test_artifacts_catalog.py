"""Artifact sinks (S8) + catalog seam + end-to-end profile_table."""

from __future__ import annotations

import csv
import json
import os

from data_profiler_spark.io import artifacts, catalog
from data_profiler_spark.operators import profiler as P


def test_profile_table_and_artifacts(documents, tmp_path):
    prof = P.profile_table(documents, ["n_chars"], ["lang", "source"])
    assert prof["row_count"] == documents.count()
    assert prof["distincts"]["lang"]["distinct_count"] > 0
    assert prof["top_values"]["lang"]

    paths = artifacts.write_profile_artifacts(prof, str(tmp_path))
    loaded = json.load(open(paths["profile.json"]))
    assert loaded["row_count"] == prof["row_count"]
    with open(paths["metrics.csv"]) as f:
        rows = list(csv.DictReader(f))
    by_col = {r["column_name"]: r for r in rows}
    assert int(by_col["lang"]["distinct_count"]) == prof["distincts"]["lang"]["distinct_count"]
    assert "top_values" in rows[0]


def test_json_safe_and_injection():
    assert artifacts._json_safe({"a": float("nan"), "b": [float("inf"), 1]}) == {
        "a": None,
        "b": [None, 1],
    }
    assert artifacts.csv_injection_sanitize("=cmd()") == "'=cmd()"
    assert artifacts.csv_injection_sanitize("safe") == "safe"


def test_catalog_parquet_fallback(spark, documents, tmp_path):
    out = str(tmp_path / "t")
    df = documents.withColumn("part", documents.lang)
    catalog.write_partitioned(df, out, ["part"])
    assert spark.read.parquet(out).count() == documents.count()
    # partition-level overwrite is idempotent: rewriting one partition
    # replaces it without touching or duplicating the others
    catalog.write_partitioned(df.filter(df.lang == "en"), out, ["part"])
    again = spark.read.parquet(out)
    assert again.count() == documents.count()
    assert not catalog.is_table_target(out)
    assert catalog.is_table_target("db.pages")
    assert catalog.snapshot_history(spark, out) == []  # no manifest here


def test_catalog_snapshot_history_manifest(tmp_path):
    os.makedirs(tmp_path / "run", exist_ok=True)
    with open(tmp_path / "run" / "manifest.json", "w") as f:
        json.dump({"completed_batches": {"2023-01": {"month": "2023-01", "metrics": {"rows": 5}}}}, f)
    hist = catalog.snapshot_history(None, str(tmp_path / "run"))
    assert hist == [{"month": "2023-01", "metrics": {"rows": 5}}]
