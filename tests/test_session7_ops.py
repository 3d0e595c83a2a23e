"""Session-7 operators: SALSA, co-citation, redirect resolution,
Z-order layout, span integrity — edge-case and property tests beyond
the driver's oracle gate."""

import duckdb
import pytest
from pyspark.sql import Row, functions as F


# ---------------------------------------------------------------------------
# redirect resolution
# ---------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_redirects_basic_chain_and_cycle(spark):
    from llm_scraper_spark.operators.redirects import resolve_redirects

    pairs = [("a", "b"), ("b", "c"),          # chain -> c terminal
             ("x", "y"), ("y", "x"),          # 2-cycle
             ("solo", "c")]                   # 1 hop to terminal
    out = {r["url"]: r for r in
           resolve_redirects(_edges(spark, pairs), max_hops=16).collect()}
    assert out["a"]["final_url"] == "c" and out["a"]["hops"] == 2
    assert out["a"]["resolved"] is True
    assert out["b"]["final_url"] == "c" and out["b"]["hops"] == 1
    assert out["c"]["final_url"] == "c" and out["c"]["hops"] == 0
    assert out["c"]["resolved"] is True
    assert out["solo"]["resolved"] is True and out["solo"]["hops"] == 1
    # cycle: unresolved, exactly max_hops hops, landing back on itself
    assert out["x"]["resolved"] is False and out["x"]["hops"] == 16
    assert out["x"]["final_url"] == "x"     # 16 is even -> back at x
    assert out["y"]["final_url"] == "y"


def test_redirects_exact_budget_chain_is_resolved(spark):
    """A chain terminating exactly at max_hops must read resolved=True
    (the lookahead fix — the doubling's internal flag lags a round)."""
    from llm_scraper_spark.operators.redirects import resolve_redirects

    pairs = [(f"n{i}", f"n{i+1}") for i in range(16)]   # n0 -> ... -> n16
    out = {r["url"]: r for r in
           resolve_redirects(_edges(spark, pairs), max_hops=16).collect()}
    assert out["n0"]["final_url"] == "n16" and out["n0"]["hops"] == 16
    assert out["n0"]["resolved"] is True
    # one past the budget: unresolved, parked at the budget node
    pairs21 = [(f"m{i}", f"m{i+1}") for i in range(20)]
    out21 = {r["url"]: r for r in
             resolve_redirects(_edges(spark, pairs21), max_hops=16).collect()}
    assert out21["m0"]["final_url"] == "m16" and out21["m0"]["hops"] == 16
    assert out21["m0"]["resolved"] is False


def test_redirects_matches_sequential_oracle(spark):
    """Doubling == step-by-step walk on a messy deterministic graph."""
    from llm_scraper_spark.operators.redirects import (
        resolve_redirects, resolve_redirects_oracle_sql,
    )

    # functional graph on 60 nodes: node i -> (i*7+3) % 60 for i % 3 != 0
    pairs = [(f"u{i}", f"u{(i * 7 + 3) % 60}")
             for i in range(60) if i % 3 and i != (i * 7 + 3) % 60]
    got = {(r["url"], r["final_url"], r["hops"], r["resolved"])
           for r in resolve_redirects(_edges(spark, pairs),
                                      max_hops=16).collect()}
    vals = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    sql = resolve_redirects_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", max_hops=16)
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_redirects_rejects_non_power_of_two():
    from llm_scraper_spark.operators.redirects import resolve_redirects

    with pytest.raises(ValueError):
        resolve_redirects(None, max_hops=12)


# ---------------------------------------------------------------------------
# SALSA
# ---------------------------------------------------------------------------

def test_salsa_degree_normalization_beats_link_farm(spark):
    """The TKC fix, on the canonical adversarial shape: a 10-page clique
    farm (every page links every other) vs an honest authority fed by 20
    dedicated hubs. Under HITS the clique's mutual reinforcement
    compounds multiplicatively per round (9^(2k)) and OVERTAKES the
    honest authority; under SALSA every hop divides by the degree it
    passes through, so the clique's mass stays bounded at ~1.0 and the
    honest authority stays on top."""
    from llm_scraper_spark.operators.graph import host_hits, salsa_scores

    farm = [(i, j) for i in range(10) for j in range(10) if i != j]
    honest = [(100 + h, 99) for h in range(20)]
    df = spark.createDataFrame(farm + honest, "src long, dst long")

    hits = {r["host"]: r for r in host_hits(df, iterations=2).collect()}
    assert hits[0]["authority"] > hits[99]["authority"]   # TKC: farm wins

    salsa = {r["host"]: r for r in salsa_scores(df, iterations=2).collect()}
    assert salsa[99]["authority"] > salsa[0]["authority"]  # SALSA: honest
    # clique mass bounded at ~rank_one, not compounding
    assert salsa[0]["authority"] <= 1_000_000_000


def test_salsa_matches_unrolled_oracle(spark):
    from llm_scraper_spark.operators.graph import (
        salsa_scores, salsa_oracle_sql,
    )

    pairs = [(i, (i * i + 1) % 13) for i in range(40)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {(r["host"], r["hub"], r["authority"])
           for r in salsa_scores(df, iterations=3).collect()}
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = salsa_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", iterations=3)
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# co-citation / coupling
# ---------------------------------------------------------------------------

def test_cocitation_counts_and_degree_cap(spark):
    from llm_scraper_spark.operators.graph import cocitation_pairs

    pairs = [(1, 10), (1, 11),               # 10,11 co-cited via 1
             (2, 10), (2, 11),               # and again via 2
             (10, 50), (11, 50)]             # 10,11 coupled via 50
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = {(r["host_a"], r["host_b"]): r
           for r in cocitation_pairs(df, max_degree=64,
                                     min_count=1).collect()}
    assert out[(10, 11)]["cocited"] == 2
    assert out[(10, 11)]["coupled"] == 1
    # hub cap: a center with out-degree > cap contributes no wedges
    hub = [(9, 100 + i) for i in range(10)]
    df2 = spark.createDataFrame(hub, "src long, dst long")
    assert cocitation_pairs(df2, max_degree=4, min_count=1).count() == 0
    assert cocitation_pairs(df2, max_degree=16, min_count=1).count() == 45


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

def _morton_ref(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_bits(spark):
    from llm_scraper_spark.operators.layout import zorder_key

    cases = [(0, 0), (3, 0), (0, 3), (65535, 65535), (0x1234, 0xABCD),
             (1, 2), (32768, 1)]
    df = spark.createDataFrame(cases, "x long, y long")
    got = df.select("x", "y",
                    zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_pruning_skips_far_files(spark):
    """Rows clustered in two opposite corners of the (x, y) space must
    land in different files, and a box over one corner must not scan the
    other corner's file."""
    from llm_scraper_spark.operators.layout import layout_pruning_stats

    low = [(i, i % 50) for i in range(100)]              # near origin
    high = [(65000 + i % 100, 65000 + i % 70) for i in range(100)]
    df = spark.createDataFrame(low + high, "x long, y long")
    out = layout_pruning_stats(df, "x", "y", n_files=16,
                               box=(0, 200, 0, 200)).collect()
    scanned = [r for r in out if r["scanned"]]
    skipped = [r for r in out if not r["scanned"]]
    assert len(skipped) >= 1                  # far corner pruned
    assert sum(r["match_rows"] for r in scanned) == 100
    assert all(r["match_rows"] == 0 for r in skipped)


# ---------------------------------------------------------------------------
# span integrity
# ---------------------------------------------------------------------------

def _span(kind, text, ref, off):
    return Row(kind=kind, text=text, media_ref=ref, offset=off)


def test_span_integrity_flags_violations(spark):
    from llm_scraper_spark.operators.corpus import span_integrity

    rows = [
        Row(doc_id="good", spans=[
            _span("text", "hello world", "", 0),
            _span("media", "", "img://1", 1),
            _span("text", "bye", "", 2),
        ]),
        Row(doc_id="bad_order", spans=[
            _span("text", "a", "", 1),        # offset 1 at position 0
            _span("text", "b", "", 0),
        ]),
        Row(doc_id="bad_shape", spans=[
            _span("media", "", "", 0),        # media span, empty ref
        ]),
        Row(doc_id="empty", spans=[]),
    ]
    out = {r["doc_id"]: r
           for r in span_integrity(spark.createDataFrame(rows)).collect()}
    g = out["good"]
    assert g["order_ok"] and g["shape_ok"]
    assert g["n_spans"] == 3 and g["n_media"] == 1
    assert g["kind_runs"] == 3                # text | media | text
    assert g["text_chars"] == len("hello world") + len("bye")
    assert g["media_ppm"] == 1_000_000 // 3
    assert out["bad_order"]["order_ok"] is False
    assert out["bad_order"]["shape_ok"] is True
    assert out["bad_shape"]["shape_ok"] is False
    e = out["empty"]
    assert e["n_spans"] == 0 and e["order_ok"] and e["kind_runs"] == 0
    assert e["media_ppm"] == 0 and e["text_chars"] == 0


def test_span_integrity_plan_is_native(spark):
    """All-HOF projection: no Python eval stage, no exchange."""
    from llm_scraper_spark.operators.corpus import span_integrity
    from llm_scraper_spark.plans.explain import physical_plan

    rows = [Row(doc_id="d", spans=[_span("text", "x", "", 0)])]
    q = span_integrity(spark.createDataFrame(rows))
    p = physical_plan(q, "simple")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


# ---------------------------------------------------------------------------
# UCB1 scheduling
# ---------------------------------------------------------------------------

def test_ucb_exploration_bonus_favors_thin_history(spark):
    """A 1/1 host must outscore a 60/100 host: UCB1's whole point is
    that one success over one pull carries a huge confidence bonus."""
    from llm_scraper_spark.operators.frontier import ucb_schedule

    rows = ([("fresh", True)]
            + [("veteran", i < 60) for i in range(100)])
    df = spark.createDataFrame(rows, "host string, ok boolean")
    out = {r["host"]: r for r in ucb_schedule(df, top_k=1).collect()}
    assert out["fresh"]["score_fp"] > out["veteran"]["score_fp"]
    assert out["fresh"]["picked"] and not out["veteran"]["picked"]
    # exact fixed-point arithmetic: mean=1e6, bonus=floor(sqrt(2*6*1e12))
    assert out["fresh"]["mean_fp"] == 1_000_000
    assert out["fresh"]["bonus_fp"] == int((2 * 6 * 10**12) ** 0.5)


def test_ucb_matches_oracle(spark):
    import duckdb as _dd
    from llm_scraper_spark.operators.frontier import (
        ucb_schedule, ucb_schedule_oracle_sql,
    )

    rows = [(f"h{i % 7}", (i * 13) % 5 != 0) for i in range(200)]
    df = spark.createDataFrame(rows, "host string, ok boolean")
    got = {tuple(r) for r in ucb_schedule(df, top_k=3).collect()}
    vals = ", ".join(f"('{h}', {str(o).lower()})" for h, o in rows)
    sql = ucb_schedule_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(host, ok)", top_k=3)
    want = {tuple(r) for r in _dd.sql(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# C4 filters
# ---------------------------------------------------------------------------

def test_c4_rules_line_and_page_level(spark):
    from llm_scraper_spark.operators.text_analysis import c4_filters

    good = "\n".join(
        [f"this line number {i} is a proper sentence." for i in range(5)])
    rows = [
        Row(doc_id="keep", text=good),
        # only 4 sentences -> page dropped by the sentence floor
        Row(doc_id="thin", text="\n".join(
            [f"sentence number {i} sits right here." for i in range(4)])),
        # lines: no punct / short / javascript -> all dropped
        Row(doc_id="nolines", text="\n".join([
            "no terminal punctuation on this line",
            "too short.",
            "this line mentions javascript explicitly.",
        ])),
        Row(doc_id="lorem", text=good + "\nlorem ipsum dolor sit amet."),
        Row(doc_id="brace", text=good + "\nfunction f() { return 1; }"),
    ]
    out = {r["doc_id"]: r
           for r in c4_filters(spark.createDataFrame(rows)).collect()}
    assert out["keep"]["keep"] is True
    assert out["keep"]["n_kept"] == 5 and out["keep"]["n_sentences"] == 5
    assert out["thin"]["keep"] is False
    n = out["nolines"]
    assert n["n_lines"] == 3 and n["n_kept"] == 0 and n["keep"] is False
    assert out["lorem"]["has_lorem"] and out["lorem"]["keep"] is False
    assert out["brace"]["has_brace"] and out["brace"]["keep"] is False


def test_c4_plan_is_native_no_shuffle(spark):
    from llm_scraper_spark.operators.text_analysis import c4_filters
    from llm_scraper_spark.plans.explain import physical_plan

    df = spark.createDataFrame([Row(doc_id="d", text="a line here.")])
    p = physical_plan(c4_filters(df), "simple")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p


# ---------------------------------------------------------------------------
# crawl-value scheduling
# ---------------------------------------------------------------------------

def test_crawl_value_composition_semantics(spark):
    """Importance x staleness: a high-rank host's stale page beats a
    low-rank host's equally stale page; a never-revisited page (NULL
    lambda) gets full exploration staleness; a fresh page (age 0)
    scores zero regardless of rank."""
    from llm_scraper_spark.operators.frontier import crawl_value_schedule

    pages = spark.createDataFrame(
        [("u1", "big", 500_000, 4),     # known-changing, stale, big host
         ("u2", "small", 500_000, 4),   # same change profile, small host
         ("u3", "big", None, 10),       # never revisited -> optimism
         ("u4", "big", 2_000_000, 0)],  # just fetched -> zero value
        "url string, host string, lambda_fp long, age long")
    ranks = spark.createDataFrame(
        [("big", 1_000_000), ("small", 10_000)], "host string, rank long")
    out = {r["url"]: r
           for r in crawl_value_schedule(pages, ranks, top_k=2).collect()}
    assert out["u1"]["value"] > out["u2"]["value"]
    assert out["u3"]["staleness_fp"] == 1_000_000
    assert out["u3"]["value"] == 1_000_000         # full rank weight
    assert out["u4"]["staleness_fp"] == 0 and out["u4"]["value"] == 0
    assert out["u3"]["picked"] and out["u1"]["picked"]
    assert not out["u4"]["picked"]
    # staleness = 1e6 - floor(1e6*exp(-0.5*4)) for u1
    import math
    assert out["u1"]["staleness_fp"] == 1_000_000 - math.floor(
        1e6 * math.exp(-2.0))


# ---------------------------------------------------------------------------
# bow-tie decomposition
# ---------------------------------------------------------------------------

def test_bowtie_hand_graph(spark):
    """Core cycle {1,2,3}, IN node 10 -> core, core -> OUT node 20,
    isolated pair 30 -> 31 (other). Pivot = max-degree node in the
    core."""
    from llm_scraper_spark.operators.graph import bowtie_decomposition

    pairs = [(1, 2), (2, 3), (3, 1),     # SCC core
             (10, 1),                    # IN
             (3, 20),                    # OUT
             (30, 31)]                   # disconnected
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = {r["host"]: r["cls"]
           for r in bowtie_decomposition(df, max_hops=8).collect()}
    assert out[1] == out[2] == out[3] == "core"
    assert out[10] == "in" and out[20] == "out"
    assert out[30] == "other" and out[31] == "other"


def test_bowtie_matches_capped_oracle(spark):
    import duckdb as _dd
    from llm_scraper_spark.operators.graph import (
        bowtie_decomposition, bowtie_oracle_sql,
    )

    pairs = [(i, (i * 5 + 2) % 30) for i in range(30) if i % 4]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {tuple(r) for r in bowtie_decomposition(df, max_hops=4).collect()}
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = bowtie_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", max_hops=4)
    want = {tuple(r) for r in _dd.sql(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# media-text alignment
# ---------------------------------------------------------------------------

def test_media_text_align_argmax_and_ties(spark):
    from llm_scraper_spark.operators.multimodal import media_text_align

    flat = spark.createDataFrame(
        [("d1", 0, "text", ""),
         ("d1", 1, "media", "img://a"),
         ("d1", 2, "text", ""),
         ("d2", 0, "media", "img://b")],     # media-only doc: NULL row
        "doc_id string, span_idx int, kind string, media_ref string")

    # deterministic score: text_idx 2 wins for img://a
    def score(media_ref, text_idx):
        return F.when(text_idx == 2, F.lit(100)).otherwise(F.lit(1))

    out = {r["doc_id"]: r for r in media_text_align(flat, score).collect()}
    assert len(out) == 2          # 1 row per media span, incl. captionless
    r = out["d1"]
    assert (r["media_idx"], r["text_idx"]) == (1, 2)
    # a media span in a text-less doc survives with NULL alignment so
    # coverage is auditable
    assert out["d2"]["text_idx"] is None and out["d2"]["score"] is None

    # equal scores -> smallest text_idx wins
    tie = {r["doc_id"]: r
           for r in media_text_align(flat, lambda m, t: F.lit(7)).collect()}
    assert tie["d1"]["text_idx"] == 0


# ---------------------------------------------------------------------------
# embedding PCA (integer power iteration)
# ---------------------------------------------------------------------------

def test_embedding_pca_finds_dominant_direction(spark):
    """Vectors = spread along a planted axis + small noise: the
    recovered component must align with the axis (|cos| > 0.95) and the
    result must be invariant to partitioning (integer arithmetic has no
    float summation order to leak)."""
    import math
    import random
    from llm_scraper_spark.operators.similarity import embedding_pca

    rng = random.Random(7)
    d = 8
    axis = [1.0 if i == 3 else 0.0 for i in range(d)]
    rows = []
    for k in range(200):
        a = rng.uniform(-2, 2)
        rows.append((k, [a * axis[i] + rng.uniform(-0.05, 0.05)
                         for i in range(d)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(embedding_pca(df, iterations=4).collect(),
                 key=lambda r: r["dim"])
    v = [r["v_fp"] for r in out]
    norm = math.sqrt(sum(c * c for c in v))
    cos = abs(v[3]) / norm
    assert cos > 0.95, v
    assert out[0]["lam_fp"] > 0

    # partition invariance: identical integers under a different layout
    out2 = sorted(embedding_pca(df.repartition(13), iterations=4).collect(),
                  key=lambda r: r["dim"])
    assert [(r["dim"], r["v_fp"], r["lam_fp"]) for r in out] == \
           [(r["dim"], r["v_fp"], r["lam_fp"]) for r in out2]


# ---------------------------------------------------------------------------
# property fuzz: pointer doubling vs a pure-Python sequential walker
# ---------------------------------------------------------------------------

def _walk_py(edges: dict, node: str, max_hops: int):
    cur, hops = node, 0
    while hops < max_hops and cur in edges:
        cur = edges[cur]
        hops += 1
    return cur, hops, cur not in edges


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_redirects_fuzz_vs_python_walker(spark, seed):
    import random
    from llm_scraper_spark.operators.redirects import resolve_redirects

    rng = random.Random(seed)
    n = 40
    emap = {}
    for i in range(n):
        if rng.random() < 0.7:
            t = rng.randrange(n)
            if t != i:
                emap[f"u{i}"] = f"u{t}"
    pairs = list(emap.items())
    got = {r["url"]: (r["final_url"], r["hops"], r["resolved"])
           for r in resolve_redirects(_edges(spark, pairs),
                                      max_hops=8).collect()}
    nodes = set(emap) | set(emap.values())
    for u in nodes:
        assert got[u] == _walk_py(emap, u, 8), u


def test_zorder_fuzz_vs_python_reference(spark):
    import random
    from llm_scraper_spark.operators.layout import zorder_key

    rng = random.Random(42)
    cases = [(rng.randrange(65536), rng.randrange(65536))
             for _ in range(300)]
    df = spark.createDataFrame(cases, "x long, y long")
    for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"))
                       .alias("z")).collect():
        assert r["z"] == _morton_ref(r["x"], r["y"])


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------

def test_zorder_layout_single_exchange_no_python(spark):
    from llm_scraper_spark.operators.layout import layout_pruning_stats
    from llm_scraper_spark.plans.explain import physical_plan

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    q = layout_pruning_stats(df, "x", "y", n_files=8, box=(0, 1, 0, 1))
    p = physical_plan(q, "simple")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange") <= 2     # partial+final agg pair max


def test_ucb_plan_no_python(spark):
    from llm_scraper_spark.operators.frontier import ucb_schedule
    from llm_scraper_spark.plans.explain import physical_plan

    df = spark.createDataFrame([("h", True)], "host string, ok boolean")
    p = physical_plan(ucb_schedule(df), "simple")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_span_integrity_null_fields_are_violations(spark):
    """NULL text/media_ref/offset is the corruption class the audit
    exists for — it must read as a violation, not SQL-NULL."""
    from pyspark.sql import types as T
    from llm_scraper_spark.operators.corpus import span_integrity

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(T.StructType([
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]))),
    ])
    rows = [
        ("null_text", [{"kind": "media", "text": None,
                        "media_ref": "img://x", "offset": 0}]),
        ("null_ref", [{"kind": "media", "text": "",
                       "media_ref": None, "offset": 0}]),
        ("null_offset", [{"kind": "text", "text": "ok",
                          "media_ref": "", "offset": None}]),
    ]
    out = {r["doc_id"]: r for r in span_integrity(
        spark.createDataFrame(rows, schema)).collect()}
    assert out["null_text"]["shape_ok"] is True      # None text reads ''
    assert out["null_text"]["text_chars"] == 0
    assert out["null_ref"]["shape_ok"] is False
    assert out["null_offset"]["order_ok"] is False


# ---------------------------------------------------------------------------
# dot-segment resolution
# ---------------------------------------------------------------------------

def test_dot_segments_vs_urljoin(spark):
    """Battery against urllib's RFC 3986 resolution (cases without
    duplicate slashes, which we deliberately collapse)."""
    from urllib.parse import urljoin, urlsplit
    from llm_scraper_spark.functions.urls import resolve_dot_segments

    cases = ["/a/b/c", "/a/b/../c", "/a/./b", "/../a", "/a/..", "/a/b/..",
             "/a/b/.", "/a/b/", "/a/../../b/c/./d/../e", "/..", "/.",
             "/a/b/c/../../../../x", "/x/y/../", "/"]
    df = spark.createDataFrame([(c,) for c in cases], "p string")
    got = {r["p"]: r["r"] for r in df.select(
        "p", resolve_dot_segments(F.col("p")).alias("r")).collect()}
    for c in cases:
        want = urlsplit(urljoin("http://h", c)).path or "/"
        assert got[c] == want, (c, got[c], want)


def test_fairness_index_known_values(spark):
    from llm_scraper_spark.operators.frontier import fairness_index

    even = spark.createDataFrame([(h, 10) for h in range(4)],
                                 "host int, x long")
    assert fairness_index(even, "x").collect()[0]["jain_fp"] == 1_000_000
    skew = spark.createDataFrame([(0, 40), (1, 0), (2, 0), (3, 0)],
                                 "host int, x long")
    # one host gets everything: J = 1/n = 0.25
    assert fairness_index(skew, "x").collect()[0]["jain_fp"] == 250_000


# ---------------------------------------------------------------------------
# deepwalk
# ---------------------------------------------------------------------------

def test_deepwalk_walks_follow_edges_and_stop_at_dead_ends(spark):
    from llm_scraper_spark.operators.graph import deepwalk_corpus

    # path graph 1->2->3 (3 is a dead end), plus isolated-ish 7->8
    pairs = [(1, 2), (2, 3), (7, 8)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    rows = deepwalk_corpus(df, length=8, start_mod=1).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["host"]
    emap = dict(pairs)
    for wid, steps in walks.items():
        path = [steps[i] for i in sorted(steps)]
        assert path[0] == wid
        for a, b in zip(path, path[1:]):
            assert emap[a] == b          # every hop is a real edge
        assert path[-1] not in emap or len(path) == 8   # stopped at end
    # walk from 1 must traverse to the dead end
    p1 = [walks[1][i] for i in sorted(walks[1])]
    assert p1 == [1, 2, 3]
    assert [walks[8][i] for i in sorted(walks[8])] == [8]


# ---------------------------------------------------------------------------
# consistent-hash ring
# ---------------------------------------------------------------------------

def test_ring_growth_moves_only_to_new_shard(spark):
    """The consistent-hashing contract: adding shard n relocates only
    keys whose successor is a new vnode — every moved key lands on the
    NEW shard, and the moved fraction stays near vnodes'/total."""
    from llm_scraper_spark.operators.frontier import ring_assign

    keys = spark.createDataFrame([(f"k{i}",) for i in range(2000)],
                                 "key string")
    a = {r["key"]: r["shard"] for r in ring_assign(keys, 8).collect()}
    b = {r["key"]: r["shard"] for r in ring_assign(keys, 9).collect()}
    moved = [k for k in a if a[k] != b[k]]
    assert all(b[k] == 8 for k in moved)          # only to the new shard
    frac = len(moved) / len(a)
    assert 0.02 < frac < 0.30, frac               # ~1/9 expected
    # unmoved keys keep their shard exactly
    for k in a:
        if k not in moved:
            assert a[k] == b[k]


def test_modularity_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge under the perfect
    2-community labeling: Q must be strongly positive and match the
    textbook value."""
    from llm_scraper_spark.operators.graph import modularity

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a + 10, b + 10) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(3, 10)],
                                  "src long, dst long")
    labels = spark.createDataFrame(
        [(h, 0) for h in range(4)] + [(h + 10, 1) for h in range(4)],
        "host long, label long")
    out = modularity(edges, labels).collect()
    m = 13
    expect = 0
    for e_c, d_c in ((6, 13), (6, 13)):
        expect += (4 * m * e_c - d_c * d_c) * 1_000_000 // (4 * m * m)
    assert out[0]["q_fp"] == expect
    assert out[0]["q_fp"] > 300_000          # strong structure


def test_pct_encoding_battery(spark):
    from llm_scraper_spark.functions.urls import normalize_pct_encoding

    cases = {
        "/a%41b": "/aAb",            # unreserved decodes
        "/x%7ey": "/x~y",
        "/q%3a%2Fz": "/q%3A%2Fz",    # reserved: hex uppercased only
        "/bad%zz": "/bad%zz",        # malformed passthrough
        "/t%4": "/t%4",
        "/end%": "/end%",
        "plain": "plain",
        "%41%42%43": "ABC",
        "/mix%2Fa%5Fb%2e%30": "/mix%2Fa_b.0",
    }
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["n"] for r in df.select(
        "s", normalize_pct_encoding(F.col("s")).alias("n")).collect()}
    for c, want in cases.items():
        assert got[c] == want, (c, got[c], want)


def test_layout_sink_prunes_partitions(spark, tmp_path):
    """The physical skip: a corner box must open fewer file groups than
    exist, the scan plan must carry the partition filter, and the
    pruned read must equal the full-scan filter exactly."""
    from llm_scraper_spark.sinks.layout_sink import (
        read_pruned, write_zorder_layout,
    )

    rows = ([(i, i % 200, i % 97) for i in range(500)]
            + [(1000 + i, 65000 + i % 100, 65000 + i % 50)
               for i in range(500)])
    df = spark.createDataFrame(rows, "id long, x long, y long")
    path = str(tmp_path / "zl")
    write_zorder_layout(df, path, "x", "y", n_files=16)
    out, stats = read_pruned(spark, path, "x", "y", box=(0, 300, 0, 300))
    assert stats["scanned_groups"] < stats["total_groups"], stats
    got = sorted((r["id"], r["x"], r["y"]) for r in out.collect())
    want = sorted((i, i % 200, i % 97) for i in range(500))
    assert got == want
    # the partition filter reached the scan
    from llm_scraper_spark.plans.explain import physical_plan
    assert "PartitionFilters" in physical_plan(out, "formatted") or \
           "file_id" in physical_plan(out, "simple")
