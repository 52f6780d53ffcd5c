"""Candidate keys (A19), duplicate groups (A20), type inference (A15/A16),
normaltest (A7) — reference-semantics unit tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_profiler_spark.operators import keys as K
from data_profiler_spark.operators import profiler as P
from data_profiler_spark.operators.typeinfer import decide_type, infer_column_types


@pytest.fixture(scope="module")
def employees(spark):
    # mirrors the reference's compound-key fixture expectations
    # (tests/fixtures/README.md: Employee_ID unique; First+Last+Date unique)
    rows = [
        ("Ann", "Lee", "2024-01-01", "E1", None),
        ("Ann", "Lee", "2024-01-02", "E2", "10"),
        ("Bob", "Lee", "2024-01-01", "E3", "10"),
        ("Bob", "Ray", "2024-01-01", "E4", "20"),
        ("Cat", "Ray", "2024-01-01", "E5", None),
        ("Cat", "Ray", "2024-01-02", "E6", "30"),
    ]
    return spark.createDataFrame(
        rows, "first string, last string, day string, emp_id string, dept string"
    )


def test_candidate_key_scoring(employees):
    cands = K.candidate_keys(
        employees, ["first", "last", "emp_id", "dept"], max_width=2, min_score=0.5
    )
    best = cands[0]
    assert best.columns == ("emp_id",)
    assert best.distinct_ratio == 1.0 and best.score == 1.0
    # dept has 2/6 nulls -> null_ratio_sum penalty applies
    dept = [c for c in cands if c.columns == ("dept",)]
    assert not dept  # distinct 3/6 = 0.5 ratio, score 0.5*(1-1/3)=0.33 < gate


def test_candidate_key_compound(employees):
    cands = K.candidate_keys(
        employees, ["first", "last", "day"], max_width=3, min_score=0.9
    )
    assert ("first", "last", "day") in [c.columns for c in cands]


def test_duplicate_groups_and_null_keys(spark):
    rows = [("a", 1), ("a", 2), ("b", 3), (None, 4), ("", 5), ("c", 6), ("a", 7)]
    df = spark.createDataFrame(rows, "k string, id int")
    groups = K.duplicate_groups(df, ["k"], id_col="id").collect()
    assert len(groups) == 1
    assert groups[0]["k"] == "a" and groups[0]["dup_count"] == 3
    assert groups[0]["example_ids"] == [1, 2, 7]
    assert K.null_key_count(df, ["k"]) == 2  # null + empty-after-trim


# --------------------------------------------------------------------------
# A15/A16 type inference
# --------------------------------------------------------------------------

def test_decide_type_reference_rules():
    # dominance 0.66 over the sample (types.py:95)
    assert decide_type(100, 90, 0, 0, 0, 90)[0] == "numeric"
    assert decide_type(100, 0, 0, 80, 0, 80)[0] == "date"
    # date-first precedence at equal dominance
    assert decide_type(100, 70, 0, 70, 0, 70)[0] == "date"
    # money subset disambiguation: 2-decimal dominant
    assert decide_type(100, 100, 90, 0, 0, 90)[0] == "money"
    # mixed: two types above 20%, none dominant (types.py:309-316)
    t, _ = decide_type(100, 40, 0, 0, 40, 80)
    assert t == "mixed"
    # code: low cardinality (types.py:96-98)
    assert decide_type(100, 0, 0, 0, 10, 8)[0] == "code"
    # unknown: no values
    assert decide_type(0, 0, 0, 0, 0, 0)[0] == "unknown"


def test_infer_column_types_on_df(spark):
    rows = [(str(i), f"{i}.00", "20240101", "abc", f"v{i}") for i in range(1, 60)]
    df = spark.createDataFrame(rows, "num string, mny string, dt string, alp string, vc string")
    out = infer_column_types(df)
    assert out["num"].inferred_type == "numeric"
    assert out["mny"].inferred_type == "money"
    assert out["dt"].inferred_type == "date"
    assert out["alp"].inferred_type in ("alpha", "code")  # 1 distinct value
    assert out["num"].confidence == 1.0


# --------------------------------------------------------------------------
# A7 — normaltest from raw moments
# --------------------------------------------------------------------------

def _moments(xs):
    n = len(xs)
    return (
        n,
        sum(xs) / n,
        sum(x * x for x in xs) / n,
        sum(x**3 for x in xs) / n,
        sum(x**4 for x in xs) / n,
    )


def test_normaltest_accepts_gaussian_rejects_uniform():
    import random

    rng = random.Random(7)
    gauss = [rng.gauss(0, 1) for _ in range(5000)]
    unif = [rng.random() for _ in range(5000)]
    p_g = P.normaltest_pvalue(*_moments(gauss))
    p_u = P.normaltest_pvalue(*_moments(unif))
    assert p_g > 0.01
    assert p_u < 1e-6
    assert P.normaltest_pvalue(5, 0, 1, 0, 1) is None  # n < 8 gate


def test_normaltest_matches_scipy_if_available():
    scipy_stats = pytest.importorskip("scipy.stats")
    import random

    rng = random.Random(3)
    xs = [rng.gauss(2, 3) for _ in range(400)]
    ours = P.normaltest_pvalue(*_moments(xs))
    theirs = scipy_stats.normaltest(xs).pvalue
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_raw_moments_exprs(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "x double")
    r = df.agg(*P.raw_moments_exprs("x")).collect()[0]
    assert r["x_n"] == 4 and r["x_m1"] == 2.5
    assert r["x_m2"] == 7.5 and r["x_m4"] == 88.5
