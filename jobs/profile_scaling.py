"""Section-level 1->4 scaling profile of the bench frontier.

Runs the exact bench_frontier dataflow with per-section timers at two
core counts (fresh subprocess per level, like bench.py --scaling) and
prints each section's time at both levels plus its individual scaling
efficiency — locating the serial/sublinear section that caps the
job's intrinsic 1->4 efficiency (ledger quiet-host median 0.781).

Usage: python jobs/profile_scaling.py [n_seeds]
       python jobs/profile_scaling.py --leg CPUS N_SEEDS   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def leg(cpus: int, n_seeds: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from llm_scraper_spark.functions.urls import with_canonical
    from llm_scraper_spark.operators.frontier import schedule_wave, with_salt
    from llm_scraper_spark.operators.seen import first_occurrence_dedup
    from llm_scraper_spark.session import get_spark
    from llm_scraper_spark.sources.synthetic import synth_seeds

    n_hosts = max(256, n_seeds // 500)
    spark = get_spark(app_name=f"profile_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    t = {}
    t0 = time.time()
    warm = with_canonical(synth_seeds(spark, 10_000, n_hosts=16))
    warm.groupBy("url_hash").count().write.format("noop").mode("overwrite").save()
    t["warmup"] = time.time() - t0

    FANOUT = 3
    t0 = time.time()
    seeds = synth_seeds(spark, n_seeds, n_hosts=n_hosts)
    canon = with_canonical(seeds.select("url", "priority", "seq"),
                           key_hex=False)
    frontier = with_salt(first_occurrence_dedup(canon, "url_hash", "seq"))
    frontier = frontier.persist()
    n_frontier = frontier.count()
    t["sec1_seed_canon_dedup_persist"] = time.time() - t0

    t0 = time.time()
    scheduled = schedule_wave(frontier, default_budget=32)
    n_scheduled = scheduled.count()
    t["sec2_schedule_wave"] = time.time() - t0

    t0 = time.time()
    links = frontier.select(
        F.explode(F.sequence(F.lit(0), F.lit(FANOUT - 1))).alias("i"),
        F.col("canonical_url").alias("parent"),
        F.col("host"),
    ).select(
        F.concat(
            F.lit("https://"), F.col("host"), F.lit("/p/"),
            F.pmod(F.xxhash64("parent", "i"), F.lit(n_seeds * 2)).cast("string"),
        ).alias("url"),
        (F.xxhash64("parent") + F.col("i")).alias("disc_ord"),
    )
    cand = with_canonical(links, key_hex=False).drop("url")
    cand = first_occurrence_dedup(cand, "url_hash", "disc_ord")
    new = cand.join(frontier.select("url_hash"), on="url_hash", how="left_anti")
    n_new = new.count()
    t["sec3_expand_canon_dedup_antijoin"] = time.time() - t0
    frontier.unpersist()
    spark.stop()
    t["total_timed"] = (t["sec1_seed_canon_dedup_persist"]
                        + t["sec2_schedule_wave"]
                        + t["sec3_expand_canon_dedup_antijoin"])
    return {"cpus": cpus, "counts": [n_frontier, n_scheduled, n_new],
            "times": {k: round(v, 2) for k, v in t.items()}}


def main() -> None:
    if "--leg" in sys.argv:
        i = sys.argv.index("--leg")
        print(json.dumps(leg(int(sys.argv[i + 1]), int(sys.argv[i + 2]))))
        return
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    out = {}
    for cpus in (4, 1):
        r = subprocess.run(
            [sys.executable, __file__, "--leg", str(cpus), str(n_seeds)],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-3000:])
            raise SystemExit(1)
        out[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
    t1, t4 = out[1]["times"], out[4]["times"]
    print(f"{'section':40s} {'local[1]':>9s} {'local[4]':>9s} {'eff':>6s}")
    for k in t1:
        eff = t1[k] / (4 * t4[k]) if t4[k] else float("nan")
        print(f"{k:40s} {t1[k]:9.2f} {t4[k]:9.2f} {eff:6.3f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
