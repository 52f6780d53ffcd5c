"""Per-query perf adjudication for host-noise-suspect bench rows.

Round 4 flagged `user_sessions` and `simhash_pairs` as >2x their round-3
times on UNCHANGED code. The suite-level markers can't adjudicate that:
they run once at suite start, while the documented host failure mode
(BASELINE.md) is DRAM-bandwidth throttling that comes and goes within a
window and caps streaming stages while a point-in-time marker reads flat.

This script brackets EACH timed query run with the compute and bandwidth
markers (marker, query, marker — the mean of the two brackets is the
concurrent reference), repeats `--rounds` times, and prints one JSON line
with raw times, bracketed marker values, and marker-relative ratios. A
query is CLEARED when either (a) its raw time in a marker-flat window
(compute <= ~0.9 s, bw <= ~0.35 s vs quiet refs 0.75/0.255) is within
~1.5x of round 3, or (b) its bandwidth-marker-relative ratio matches the
round-3 ratio (the query scales with DRAM bandwidth, so the elevation is
the window, not the engine).

Usage: python scripts/adjudicate_perf.py [--rounds 3] [--queries a,b]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def _markers(spark, cpus: int) -> tuple[float, float]:
    # bench.py's marker workloads, not a copy: the quiet references are
    # calibrated against those exact workloads (see scale_step._markers).
    import bench

    return bench._jvm_marker(spark, cpus), bench._jvm_bw_marker(spark, cpus)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--queries", default="user_sessions,simhash_pairs")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import bench
    from data_profiler_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="adjudicate", cores=args.cpus)
    qs = entry_mod.queries()
    qs.update(bench.BENCH_OVERRIDES)
    names = [n.strip() for n in args.queries.split(",") if n.strip()]

    _markers(spark, args.cpus)  # codegen warm-up for the markers
    alloc = round(bench._alloc_marker(), 3)
    for n in names:
        qs[n](spark, args.sf_dir).collect()  # warm: codegen + page cache

    out: dict = {"alloc_marker": alloc, "rounds": {}, "sf_dir": args.sf_dir}
    for n in names:
        rows = []
        for _ in range(args.rounds):
            c0, b0 = _markers(spark, args.cpus)
            t0 = time.time()
            qs[n](spark, args.sf_dir).collect()
            q = time.time() - t0
            c1, b1 = _markers(spark, args.cpus)
            cm, bm = (c0 + c1) / 2, (b0 + b1) / 2
            rows.append(
                {
                    "t": round(q, 3),
                    "compute_marker": round(cm, 3),
                    "bw_marker": round(bm, 3),
                    "vs_compute": round(q / cm, 2),
                    "vs_bw": round(q / bm, 2),
                }
            )
            print(f"# {n}: {rows[-1]}", file=sys.stderr, flush=True)
        out["rounds"][n] = rows
        best = min(r["t"] for r in rows)
        out.setdefault("best", {})[n] = best
        out.setdefault("best_vs_bw", {})[n] = min(r["vs_bw"] for r in rows)
        out.setdefault("best_vs_compute", {})[n] = min(r["vs_compute"] for r in rows)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
