"""Design-point A/B for the bucketed seen layout (VERDICT r4 #2).

The bench-scale A/B (BENCH/BASELINE.md) shows the DELTA layout winning
at 1M seeds because the standing bloom keeps the anti-join's probe side
tiny — the bucketed append's per-wave shuffle+sort costs more than the
join saves. The bucketed layout's regime is the opposite corner of the
design space: a seen table orders of magnitude larger than a wave's
discoveries, with the exact anti-join carrying real traffic (bloom off,
or a bloom fpp worth of probes at 10^10 keys is still millions of rows).

This job measures THAT corner on one axis: seen = N rows (both
layouts), candidates = M << N per "wave", bloom disabled, and times the
exact anti-join alone over several reps — delta layout (union of
per-wave parquet dirs, shuffled SortMergeJoin) vs bucketed catalog
table (zero Exchange on the seen side). It also reports the plans'
Exchange counts so the structural claim is checked in the same run.

Usage: python jobs/bucketed_ab.py [n_seen] [n_cand] [n_waves] [reps]
Writes BENCH/BUCKETED_AB.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_point(spark, n_seen, n_cand, n_waves, reps, tbl):
    from pyspark.sql import functions as F

    from llm_scraper_spark.sinks.bucketed import write_bucketed

    base = tempfile.mkdtemp(prefix="bucketed_ab_", dir="/dev/shm"
                            if os.path.isdir("/dev/shm") else None)
    try:
        # seen rows split across n_waves delta dirs (the delta layout's
        # real on-disk shape after n_waves commits)
        seen_expr = spark.range(n_seen).select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
            (F.col("id") % n_waves).cast("int").alias("first_seen_wave"))
        for w in range(n_waves):
            (seen_expr.filter(F.col("first_seen_wave") == w)
             .write.mode("overwrite")
             .parquet(f"{base}/delta/wave={w}"))
        write_bucketed(seen_expr, tbl, ["url_hash"], 32,
                       path=f"{base}/bucketed")

        # candidates: half hit the seen set, half are new
        cand = spark.range(n_cand).select(
            F.when(F.col("id") % 2 == 0,
                   F.xxhash64((F.col("id") * (n_seen // n_cand))
                              .cast("string")))
            .otherwise(F.xxhash64(F.concat(F.lit("new:"),
                                           F.col("id").cast("string"))))
            .alias("url_hash")).localCheckpoint()

        delta_seen = spark.read.parquet(
            *[f"{base}/delta/wave={w}" for w in range(n_waves)])
        buck_seen = spark.table(tbl)

        def time_join(seen_df):
            j = cand.join(seen_df.select("url_hash"), on="url_hash",
                          how="left_anti")
            plan = j._jdf.queryExecution().executedPlan().toString()
            walls = []
            for _ in range(reps):
                t0 = time.time()
                n = j.count()
                walls.append(round(time.time() - t0, 3))
            return walls, n, plan.count("Exchange")

        d_walls, d_n, d_ex = time_join(delta_seen)
        b_walls, b_n, b_ex = time_join(buck_seen)
        assert d_n == b_n, (d_n, b_n)
        return {
            "n_seen": n_seen, "n_cand": n_cand, "survivors": d_n,
            "d_walls": d_walls, "d_med": statistics.median(d_walls),
            "d_ex": d_ex,
            "b_walls": b_walls, "b_med": statistics.median(b_walls),
            "b_ex": b_ex,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def main() -> None:
    seen_sizes = ([int(x) for x in sys.argv[1].split(",")]
                  if len(sys.argv) > 1 else [20_000_000, 60_000_000])
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_waves = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from llm_scraper_spark.session import get_spark

    spark = get_spark(app_name="bucketed_ab", master="local[32]",
                      shuffle_partitions=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        points = [run_point(spark, n, n_cand, n_waves, reps,
                            f"ab_seen_bucketed_{i}")
                  for i, n in enumerate(seen_sizes)]
    finally:
        spark.stop()

    rows = "".join(
        f"| {p['n_seen']:,} | {p['n_seen'] // p['n_cand']}:1 "
        f"| {p['d_walls']} | {p['d_med']} | {p['d_ex']} "
        f"| {p['b_walls']} | {p['b_med']} | {p['b_ex']} "
        f"| **{p['d_med'] / p['b_med']:.2f}x** |\n"
        for p in points)
    md = f"""# Bucketed seen layout — design-point A/B

The wave loop's exact anti-join, DELTA layout ({n_waves} per-wave
parquet dirs, shuffled SortMergeJoin) vs BUCKETED catalog table
(bucketBy(url_hash, 32), zero Exchange on the seen side). Candidates
= {n_cand:,} per wave, 50% hits; bloom DISABLED so the join carries
all traffic — the 10^10 regime where per-wave discoveries dwarf any
broadcast and the seen side dominates. local[32], broadcast joins
off, median of {reps} reps; survivor counts identical per point.

| seen rows | seen:cand | delta walls (s) | delta med | delta Exch | bucketed walls (s) | bucketed med | buck Exch | speedup |
|---|---|---|---|---|---|---|---|---|
{rows}
The delta layout's cost grows with the seen table (its shuffle is
O(seen)); the bucketed join's stays ~flat (the seen side streams from
disk pre-partitioned, only the candidate side exchanges). The
structural claim is verified in-run: 1 Exchange in every bucketed
plan vs 2 in every delta plan. At the bench's 1M-seed wave-loop
config the ordering REVERSES (BENCH/BASELINE.md) — the bloom
pre-filter keeps the probe side tiny there while the bucketed append
pays a per-wave shuffle+sort — which is why delta is the default and
bucketed is the opt-in for this regime (seen_layout="bucketed").
"""
    out = os.path.join(REPO, "BENCH", "BUCKETED_AB.md")
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
