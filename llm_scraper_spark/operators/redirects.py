"""Redirect-chain resolution by pointer doubling.

A real crawl discovers 3xx redirects as (src -> dst) edges: short-link
services, http->https upgrades, tracking hops, CDN canonicalizers. The
frontier must schedule the CHAIN TERMINAL, not the hop — otherwise the
seen-set fills with alias URLs, politeness budgets are charged to the
wrong host, and the same terminal is fetched once per alias. The
reference follows redirects imperatively inside each fetch
(``/root/reference/src/llm_scraper/scraper.py:78-109`` —
``allow_redirects=True`` + ``raise_for_status``), which works one URL at
a time; at 10^10-URL scale the redirect graph is itself a table, and
resolution must be a dataflow.

``resolve_redirects`` resolves over a FUNCTIONAL graph (each src has
exactly one dst — the semantics of a 3xx Location header); conflicting
observations are collapsed to ``min(dst)`` per src up front (mirrored in
the oracle), so a src logged with two Location values over time cannot
multiply state rows through the doubling joins,
and resolves every node to its terminal with POINTER DOUBLING
(Wyllie-style pointer jumping): after round k every node knows the node
``min(2^k, dist-to-terminal)`` hops ahead, so ``log2(max_hops)`` rounds
— 4 joins for a 16-hop budget — replace a 16-step sequential walk. Each
round is ONE equi-join of the state table against itself plus nothing
else: no windows, no driver collect, shuffle volume O(nodes) slim rows.
Rows already at a terminal are split out BEFORE the join (they would
otherwise all collide on their own key), which also makes the join's
skew profile the in-degree of popular redirect TARGETS — exactly the
keys AQE skew-join splits. Lineage is cut with tracked localCheckpoints
(iterative self-joins otherwise double the plan per round).

Cycles (a->b->a redirect loops — common misconfiguration) never
terminate a walk; they surface as ``resolved = false`` with
``final_url`` = the node reached after exactly ``max_hops`` hops and
``hops = max_hops``, the same contract HTTP clients implement as "too
many redirects". ``max_hops`` must be a power of two so the doubled
distance lands exactly on the budget in both engines.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 16,
                      src_col: str = "src", dst_col: str = "dst",
                      checkpoint_interval: int = 2) -> DataFrame:
    """Resolve every node of a functional redirect graph to its terminal.

    Returns ``(url, final_url, hops, resolved)`` for every node that
    appears in the edge table (as source or target):

    - ``resolved = true``: ``final_url`` is a terminal (no out-edge) and
      ``hops`` is the exact chain length walked to reach it.
    - ``resolved = false``: the walk did not terminate within
      ``max_hops`` hops (cycle, or a chain longer than the budget);
      ``final_url`` is the node after exactly ``max_hops`` hops and
      ``hops = max_hops`` — bit-identical to a sequential step-capped
      walk, which is what the DuckDB oracle replays.

    ``resolved`` is decided by a final LOOKAHEAD join (does final_url
    have an out-edge?), not by the loop's internal flag: the flag only
    turns true one composition AFTER a walk lands on a terminal, so a
    chain that terminates exactly on the last round's hop budget would
    read false from it. The lookahead is the same definition the oracle
    uses, closing that boundary case in both engines at the cost of one
    extra broadcast-sized join on the distinct source set.
    """
    if max_hops & (max_hops - 1) or max_hops <= 0:
        raise ValueError("max_hops must be a positive power of two")
    from .checkpoints import local_checkpoint_tracked, release_checkpoint

    spark = edges.sparkSession
    # Enforce the functional-graph precondition, not just assume it: a
    # per-fetch redirect log legitimately records the same (src, dst) hop
    # many times (dedup), but a src observed with TWO DISTINCT dsts
    # (Location header changed between fetches) would multiply state rows
    # through every doubling join (2^rounds copies) and diverge from the
    # oracle. Collapse to one dst per src deterministically — min(dst) —
    # the same election the oracle applies, so both engines walk the
    # identical functional graph.
    e = (edges.select(F.col(src_col).alias("url"),
                      F.col(dst_col).alias("_d"))
         .groupBy("url").agg(F.min("_d").alias("_d")))
    nodes = (
        e.select("url")
        .union(e.select(F.col("_d").alias("url")))
        .distinct()
    )
    # state: ptr = node min(2^k, dist)) hops ahead; final = ptr is terminal
    state = nodes.join(e, "url", "left").select(
        "url",
        F.coalesce("_d", F.col("url")).alias("ptr"),
        F.when(F.col("_d").isNull(), 0).otherwise(1)
        .cast("long").alias("hops"),
        F.col("_d").isNull().alias("final"),
    )
    prev_ck_ids: set[int] = set()
    for i in range(max_hops.bit_length() - 1):
        done = state.filter("final")
        act = state.filter("NOT final")
        jump = state.select(
            F.col("url").alias("ptr"), F.col("ptr").alias("_jptr"),
            F.col("hops").alias("_jhops"), F.col("final").alias("_jfinal"),
        )
        act = act.join(jump, "ptr").select(
            "url", F.col("_jptr").alias("ptr"),
            (F.col("hops") + F.col("_jhops")).alias("hops"),
            F.col("_jfinal").alias("final"),
        )
        state = done.unionByName(act)
        if (i + 1) % checkpoint_interval == 0:
            state, ck = local_checkpoint_tracked(state)
            release_checkpoint(spark, prev_ck_ids)
            prev_ck_ids = ck
    srcs = e.select(F.col("url").alias("ptr")).distinct().withColumn(
        "_has_out", F.lit(True))
    return state.join(srcs, "ptr", "left").select(
        "url", F.col("ptr").alias("final_url"), "hops",
        F.col("_has_out").isNull().alias("resolved"),
    )


def resolve_redirects_oracle_sql(edges_sql: str, max_hops: int = 16) -> str:
    """DuckDB twin of :func:`resolve_redirects` — a sequential recursive
    walk capped at ``max_hops`` steps; the last row per url is the node
    ``min(dist_to_terminal, max_hops)`` hops out, and ``resolved`` is a
    lookahead on that landing node (so a chain that terminates EXACTLY at
    the hop budget counts as resolved — same as the doubling, whose
    final flag propagates from the terminal's own state). Pointer
    doubling composes jumps whose distances sum to exactly the same step
    count, so the two formulations agree bit-for-bit, including on
    cycles (both report the node after exactly ``max_hops`` hops)."""
    return f"""
WITH RECURSIVE e AS (SELECT src, min(dst) AS dst FROM ({edges_sql}) GROUP BY src),
nodes AS (SELECT src AS url FROM e UNION SELECT dst FROM e),
walk(url, cur, hops) AS (
  SELECT url, url, 0::BIGINT FROM nodes
  UNION ALL
  SELECT w.url, e.dst, w.hops + 1
  FROM walk w JOIN e ON e.src = w.cur
  WHERE w.hops < {max_hops}
),
fin AS (
  SELECT url, arg_max(cur, hops) AS final_url,
         max(hops)::BIGINT AS hops
  FROM walk GROUP BY url
)
SELECT f.url, f.final_url, f.hops,
       NOT EXISTS (SELECT 1 FROM e WHERE e.src = f.final_url) AS resolved
FROM fin f"""
