"""Benchmark harness — prints ONE JSON line.

Default: headline queries + the quality-filter scoring pipeline at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

``--scaling``: runs the scoring job at two parallelism levels (local[8]
vs local[32]) on identical input in separate subprocesses and reports
docs/sec at both + scaling efficiency = (T_8 / T_32) / (32/8)
(north-rule evidence; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic pages volume for the scoring benchmark, ∝ scale factor
PAGES_N = int(os.environ.get("SPARK_GRAFT_PAGES_N", "40000"))

BENCH_QUERIES = [
    "profile_nchars",
    "distinct_counts",
    "top10_lang",
    "hist_nchars",
    "money_validation",
    "tpch_q1",
    "top10_customers_revenue",
    "events_hourly",
    "token_stats_by_lang",
    "dedup_exact",
    "ann_cosine_top10",
    "minhash_lsh_dedup",
    "user_sessions",
    "quality_score_by_source",
]


def _run_score_job(cores: int, n_docs: int) -> float:
    """Score n_docs synthetic pages end-to-end (generate → score → write);
    returns elapsed seconds. Runs in-process with the given core count."""
    from data_profiler_spark.pipeline import score_pages
    from data_profiler_spark.session import get_spark
    from data_profiler_spark.synth import pages_df

    spark = get_spark(app_name=f"bench_score_{cores}", cores=cores)
    out = f"/tmp/bench_score_{cores}"
    shutil.rmtree(out, ignore_errors=True)
    pages = pages_df(spark, n_docs, partitions=cores * 2)
    # warm up JVM + python workers on a small slice (excluded from timing)
    score_pages(pages.limit(200)).write.mode("overwrite").format("noop").save()
    t0 = time.time()
    score_pages(pages).write.mode("overwrite").parquet(out)
    return time.time() - t0


def main() -> None:
    if "--score-subprocess" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--score-subprocess") + 1])
        n = int(sys.argv[sys.argv.index("--score-subprocess") + 2])
        print(json.dumps({"elapsed": _run_score_job(cores, n)}))
        return

    if "--scaling" in sys.argv:
        results = {}
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--score-subprocess", str(cores), str(PAGES_N)],
                capture_output=True,
                text=True,
                check=True,
                cwd=str(Path(__file__).parent),
            )
            elapsed = json.loads(out.stdout.strip().splitlines()[-1])["elapsed"]
            results[cores] = elapsed
        t8, t32 = results[8], results[32]
        eff = (t8 / t32) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "quality_filter_scaling",
                    "value": round(eff, 4),
                    "unit": "efficiency",
                    "sf": PAGES_N,
                    "queries": {
                        "docs_per_sec_local8": round(PAGES_N / t8, 1),
                        "docs_per_sec_local32": round(PAGES_N / t32, 1),
                        "t_local8_sec": round(t8, 2),
                        "t_local32_sec": round(t32, 2),
                    },
                }
            )
        )
        return

    import __spark_entry__ as entry_mod
    from data_profiler_spark.pipeline import score_pages
    from data_profiler_spark.session import get_spark
    from data_profiler_spark.synth import pages_df

    spark = get_spark(app_name="bench", cores=CPUS)
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 3)

    # quality-filter scoring throughput (generate excluded via cache+count)
    pages = pages_df(spark, PAGES_N, partitions=CPUS * 2).cache()
    pages.count()
    t0 = time.time()
    score_pages(pages).write.mode("overwrite").format("noop").save()
    score_sec = time.time() - t0
    pages.unpersist()
    timings["quality_filter_score"] = round(score_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "sf": SF_DIR,
                "queries": timings,
                "docs_per_sec_score": round(PAGES_N / score_sec, 1),
                "pages_n": PAGES_N,
            }
        )
    )


if __name__ == "__main__":
    main()
