"""Intake validators (S2-S7) + multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_profiler_spark.io import intake
from data_profiler_spark.operators import errors as E
from data_profiler_spark.operators import multimodal as mm


# --------------------------------------------------------------------------
# S2 — UTF-8
# --------------------------------------------------------------------------

def test_utf8_exact_offset(spark):
    rows = [
        (1, b"hello world"),
        (2, "héllo".encode("utf-8")),
        (3, b"ok\xc3ko"),           # lone continuation starter at offset 2
        (4, b"\xff\xfe start"),     # invalid at offset 0
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    v = intake.utf8_validity_udf(F.col("payload"))
    got = {
        r["id"]: (r["valid"], r["off"])
        for r in df.select("id", v["valid"].alias("valid"), v["error_offset"].alias("off")).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (True, None)
    assert got[3] == (False, 2)
    assert got[4] == (False, 0)
    assert got[5] == (True, None)


def test_utf8_report_on_pages(pages):
    r = intake.utf8_report(pages, "html").collect()[0]
    assert r["total"] == pages.count()
    # synth injects ~0.5% invalid html payloads
    assert 0 < r["invalid_count"] < r["total"] * 0.05
    assert r["min_error_offset"] is not None


# --------------------------------------------------------------------------
# S3 — line endings
# --------------------------------------------------------------------------

def test_line_ending_counts_and_normalize(spark):
    df = spark.createDataFrame(
        [("a\r\nb\r\nc",), ("x\ny",), ("p\rq\r\n",)], "text string"
    )
    row = df.agg(*intake.line_ending_counts_exprs("text")).collect()[0]
    assert (row["crlf_count"], row["lf_count"], row["cr_count"]) == (3, 1, 1)
    style, mixed = intake.line_ending_style(row.asDict())
    assert style == "crlf" and mixed
    normed = df.select(intake.normalize_line_endings(F.col("text")).alias("t")).collect()
    assert all("\r" not in r["t"] for r in normed)


# --------------------------------------------------------------------------
# S4/S5/S7 — sniff + jagged rows
# --------------------------------------------------------------------------

def test_sniff_delimiter_and_quoting():
    lines = ['id|name|amount', '1|alice|10.00', '2|"bob|jr"|20.00']
    d, dc = intake.sniff_delimiter(lines)
    assert d == "|" and dc > 0.5
    quoted, _ = intake.sniff_quoting(lines, "|")
    assert quoted


def test_jagged_row_report(spark, tmp_path):
    p = tmp_path / "jag.csv"
    p.write_text("a|b|c\n1|2|3\n4|5\n6|7|8|9\n")
    rep = {r["n_fields"]: r["line_count"] for r in intake.jagged_row_report(spark, str(p), "\\|").collect()}
    assert rep == {3: 2, 2: 1, 4: 1}


def test_gzip_csv_intake(spark, tmp_path):
    """S1: codec auto-detection by extension — gzipped CSVs read
    transparently (reference decompresses by suffix/magic,
    ``runs.py:374-382``)."""
    import gzip

    p = tmp_path / "data.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("a|b\n1|x\n2|y\n")
    df = spark.read.option("header", True).option("sep", "|").csv(str(p))
    assert df.count() == 2 and df.columns == ["a", "b"]


def test_read_csv_with_errors(spark, tmp_path):
    p = tmp_path / "q.csv"
    p.write_text('a|b\n1|"ok"\n2|"broken\n')
    df, corrupt = intake.read_csv_with_errors(spark, str(p), "|", quoted=True)
    n_corrupt = df.agg(corrupt).collect()[0]["corrupt_count"]
    assert df.count() >= 1
    assert n_corrupt is not None


# --------------------------------------------------------------------------
# A18 — error rollup
# --------------------------------------------------------------------------

def test_error_rollup_and_catastrophic_gate(spark):
    errs = spark.createDataFrame(
        [
            ("E_JAGGED_ROW", 7, "c1"),
            ("E_JAGGED_ROW", 3, "c1"),
            ("W_DELIMITER_MISMATCH", 1, None),
        ],
        E.ERROR_SCHEMA,
    )
    rolled = E.error_rollup(errs, total_rows=100)
    rows = rolled.collect()
    assert rows[0]["code"] == "E_JAGGED_ROW"  # catastrophic sorts first
    assert rows[0]["count"] == 2 and rows[0]["first_line"] == 3
    assert rows[0]["pct_of_rows"] == 2.0
    assert E.any_catastrophic(rolled)
    benign = E.error_rollup(errs.filter("code LIKE 'W%'"), 100)
    assert not E.any_catastrophic(benign)


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media_df(spark, 60, partitions=4).cache()


def test_media_meta_plumbing(media):
    meta = mm.extract_media_meta(media).collect()
    assert len(meta) == 60
    by_kind = {}
    for r in meta:
        by_kind.setdefault(r["kind"], []).append(r)
        assert r["n_bytes"] > 0 and len(r["sha256"]) == 64
    assert all(r["width"] is not None for r in by_kind["image"])
    assert all(r["duration_ms"] is not None for r in by_kind["audio"] + by_kind["video"])
    assert all(r["width"] is None for r in by_kind["audio"])


def test_media_meta_deterministic_under_repartition(media):
    a = sorted((r["media_id"], r["sha256"]) for r in mm.extract_media_meta(media).collect())
    b = sorted(
        (r["media_id"], r["sha256"])
        for r in mm.extract_media_meta(media.repartition(13)).collect()
    )
    assert a == b


def test_media_features_shape(media):
    feats = mm.extract_media_features(media).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-9


def test_frame_sampling_one_to_many(media):
    frames = mm.sample_frames(media)
    agg = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(agg) == 60
    assert any(r["n"] > 1 for r in agg)


def test_real_decode_is_marked_unimplemented(media):
    with pytest.raises(NotImplementedError):
        mm.extract_media_features(media, decode="real")
