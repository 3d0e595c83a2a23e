"""Skew handling: adaptive salting evens out a pathologically hot host
(SURVEY §7.2 step 6 at sandbox scale)."""

from pyspark.sql import functions as F

from llm_scraper_spark.operators.frontier import (
    host_histogram, schedule_wave, with_adaptive_salt)


def _skewed_frontier(spark, n=200_000, hot_share=0.5, n_hosts=50):
    """~half the frontier on one hot host, rest Zipf-ish."""
    df = spark.range(n)
    u = (F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(1000))
         .cast("double") / 1000.0)
    host = F.when(u < hot_share, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("host"), F.pmod(F.xxhash64("id"), F.lit(n_hosts))
                 .cast("string"), F.lit(".example.com")))
    return (
        df.withColumn("host", host)
        .withColumn("url", F.concat(F.lit("https://"), F.col("host"),
                                    F.lit("/p/"), F.col("id").cast("string")))
        .withColumn("canonical_url", F.col("url"))
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("priority", F.lit(1.0))
        .withColumn("seq", F.col("id").cast("long"))
        .drop("id")
    )


def test_adaptive_salt_bounds_shard_size(spark):
    fr = _skewed_frontier(spark)
    salted = with_adaptive_salt(fr, rows_per_shard=10_000, max_salts=64)
    shard_sizes = (
        salted.groupBy("host", "salt").count().agg(F.max("count")).first()[0]
    )
    # hot host (~100k rows) must be sharded to ~rows_per_shard-sized shards
    assert shard_sizes <= 15_000, f"max shard {shard_sizes}"
    # cold hosts keep salt 0 (no pointless fan-out)
    cold = salted.filter(F.col("host") != "hot.example.com")
    assert cold.filter(F.col("salt") != 0).count() == 0 or (
        cold.groupBy("host").count().agg(F.max("count")).first()[0] > 10_000
    )


def test_politeness_budget_survives_salting(spark):
    """Budget accounting is per HOST even when the host is salted into many
    shards (SURVEY §7.4 hard part 3)."""
    fr = _skewed_frontier(spark, n=50_000)
    salted = with_adaptive_salt(fr, rows_per_shard=2_000, max_salts=32)
    sched = schedule_wave(salted, default_budget=7)
    per_host = sched.groupBy("host").count().agg(F.max("count")).first()[0]
    assert per_host <= 7
    # and the hot host still gets exactly its budget (not starved)
    hot = sched.filter(F.col("host") == "hot.example.com").count()
    assert hot == 7


def test_histogram(spark):
    fr = _skewed_frontier(spark, n=20_000)
    hist = host_histogram(fr).orderBy(F.col("n_pending").desc()).first()
    assert hist["host"] == "hot.example.com"


def test_window_group_limit_in_plan(spark):
    """The politeness top-k must plan as WindowGroupLimit with a Partial
    (pre-shuffle) pass — this is what makes the unsalted window skew-immune
    (each map task ships <= budget rows per host into the exchange)."""
    fr = _skewed_frontier(spark, n=10_000)
    plan = schedule_wave(fr, default_budget=8)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
