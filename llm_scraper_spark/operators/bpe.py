"""Distributed BPE merge learning — the scalable core of tokenizer
training (Sennrich, Haddow & Birch, "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016).

A 100 TB corpus trains a tokenizer the same way SentencePiece/HF do at
scale: ONE pass over the corpus builds the word histogram, and every
merge iteration after that runs on the VOCABULARY table (distinct words
x counts — bounded by language, not corpus size). Each round:

1. pair counts: explode each word's adjacent symbol pairs weighted by
   the word's count — a narrow projection plus one vocab-sized
   map-side-combined aggregate;
2. argmax pair with a deterministic tiebreak
   (count DESC, left ASC, right ASC) — a TakeOrdered, no full sort;
3. apply the merge to every word's symbol sequence with a GREEDY
   LEFTMOST NON-OVERLAPPING fold ("a a a a" merging (a,a) ->
   "aa aa", not "aa a a").

The fold is the engine-portability trick: symbols live as a
space-delimited string, and the merge applies via a left fold with a
STRING accumulator — Spark's ``aggregate()`` higher-order function and
DuckDB's ``list_reduce`` (init prepended) express the identical
step function, so :func:`bpe_oracle_sql` replays every round
value-for-value with no goldens. (A naive ``replace(' a a ', ' aa ')``
is NOT equivalent: string replace consumes the shared delimiter and
under-merges runs.)

Each word ends with the classic ``</w>`` end-of-word symbol, so merges
can capture suffixes (Sennrich §3.2).

Returns the merge table ``(merge_rank, left, right, pair_count)`` —
driver-sized by construction (``n_merges`` rows), like packing
boundaries; all the heavy work is distributed.

Reference anchor: the reference estimates tokens at 1.33/word
(utils/text.py:22-30) and never trains a tokenizer; this is the
100 TB-pipeline extension (SURVEY §2.9 token heuristics tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# same pre-tokenizer as text_analysis.token_count_bpe — letters runs,
# digit runs, single non-space symbols
WORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
EOW = "</w>"


def _merge_step(left: str, right: str):
    """(acc: str, s: str) -> str fold step applying one merge greedily.

    acc is the space-joined output so far; merge fires when acc's LAST
    symbol == left and the incoming symbol == right. The merged symbol
    is the concatenation, which cannot re-match ``left`` — exactly the
    leftmost non-overlapping semantics."""
    def step(acc, s):
        last = F.regexp_extract(acc, "[^ ]*$", 0)
        merged = F.concat(
            acc.substr(F.lit(1), F.length(acc) - F.length(last)),
            F.lit(left + right))
        return (
            F.when((acc != "") & (last == F.lit(left))
                   & (s == F.lit(right)), merged)
            .when(acc == "", s)
            .otherwise(F.concat(acc, F.lit(" "), s))
        )

    return step


def _driver_merges(rows: list[tuple[str, int]],
                   n_merges: int) -> list[tuple[int, str, str, int]]:
    """Sequential BPE over a COLLECTED vocabulary histogram — the hybrid
    finish (VERDICT r4 #5): the corpus pass and histogram stay
    distributed, but once the vocab table fits a driver bound the merge
    rounds run in-memory, killing the one-Spark-job-per-merge wall
    (~0.5s/round of scheduler latency x 30k-50k merges for a real
    tokenizer). Semantics are EXACTLY the distributed loop's — same
    positional pair counts (overlaps included), same (n DESC, a, b)
    argmax tiebreak, same greedy leftmost non-overlapping application,
    same n >= 2 stop — so the DuckDB oracle replays either path
    unchanged. Incremental: a merge re-diffs only the words that
    contain the pair (an index pair -> word ids), with a lazy-validated
    heap for the argmax."""
    import heapq
    from collections import Counter

    words = [s.split(" ") for s, _ in rows]
    cnts = [int(c) for _, c in rows]

    def word_pairs(syms):
        return Counter(zip(syms, syms[1:]))

    pair_n: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for p, k in word_pairs(syms).items():
            pair_n[p] += k * cnts[i]
            pair_words.setdefault(p, set()).add(i)
    heap = [(-n, a, b) for (a, b), n in pair_n.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negn, a, b = heap[0]
            if pair_n.get((a, b), 0) != -negn:  # stale entry
                heapq.heappop(heap)
                continue
            best = (a, b, -negn)
            break
        if best is None or best[2] < 2:
            break
        a, b, n = best
        merges.append((rank, a, b, n))
        merged = a + b
        for i in sorted(pair_words.get((a, b), ())):
            syms = words[i]
            old = word_pairs(syms)
            out, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == a
                        and syms[j + 1] == b):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            new = word_pairs(out)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    pair_n[p] += d * cnts[i]
                    if pair_n[p] <= 0:
                        del pair_n[p]
                    else:
                        heapq.heappush(heap, (-pair_n[p], p[0], p[1]))
                if p in new:
                    pair_words.setdefault(p, set()).add(i)
                elif p in pair_words:
                    pair_words[p].discard(i)
        pair_words.pop((a, b), None)
    return merges


def bpe_learn_merges(docs: DataFrame, n_merges: int = 8,
                     text_col: str = "text",
                     driver_finish_max_vocab: int = 2_000_000) -> DataFrame:
    """Learn ``n_merges`` BPE merges over a document corpus. Stops early
    if the vocabulary runs out of repeated pairs. When the distinct-word
    histogram fits ``driver_finish_max_vocab`` rows (it is bounded by
    language, not corpus size — the common case even at 100 TB), the
    merge rounds run driver-side on the collected histogram
    (:func:`_driver_merges`, identical semantics); above the bound the
    per-round distributed loop runs instead. See module docs."""
    from .checkpoints import local_checkpoint_tracked, release_checkpoint

    spark = docs.sparkSession
    words = (
        # NB: F.regexp_extract_all with a Python literal, NOT F.expr —
        # a SQL string literal would eat the backslash in \s
        docs.select(F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), 0)
        ).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            # 'h e l l o </w>' — one space-joined symbol string per word
            F.concat(
                F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
                F.lit(" " + EOW)).alias("s"),
            "cnt",
        )
    )
    words, prev_ck = local_checkpoint_tracked(words)
    n_vocab = words.count()  # vocab-sized metadata count off the checkpoint
    if n_vocab <= driver_finish_max_vocab:
        rows = [(r["s"], r["cnt"]) for r in words.collect()]
        release_checkpoint(spark, prev_ck)
        return spark.createDataFrame(
            _driver_merges(rows, n_merges),
            "merge_rank int, left string, right string, pair_count long")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        syms = F.split(F.col("s"), " ")
        pairs = (
            words.select(
                F.posexplode(F.slice(syms, 1, F.size(syms) - 1))
                .alias("_i", "a"),
                syms.alias("_l"), F.col("cnt"))
            .select(F.col("a"),
                    F.element_at(F.col("_l"), F.col("_i") + 2).alias("b"),
                    "cnt")
            .groupBy("a", "b").agg(F.sum("cnt").alias("n"))
        )
        top = (pairs.orderBy(F.desc("n"), "a", "b").limit(1)).collect()
        if not top or top[0]["n"] is None or top[0]["n"] < 2:
            break
        left, right, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((rank, left, right, n))
        folded = F.aggregate(
            F.split(F.col("s"), " "), F.lit(""), _merge_step(left, right))
        words, ck = local_checkpoint_tracked(
            words.select(folded.alias("s"), "cnt"))
        release_checkpoint(spark, prev_ck)
        prev_ck = ck
    release_checkpoint(spark, prev_ck)
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long")


def bpe_oracle_sql(docs_sql: str, n_merges: int = 8,
                   text_col: str = "text") -> str:
    """DuckDB replay of :func:`bpe_learn_merges`: word histogram, then
    every round's pair argmax + greedy fold unrolled as chained CTEs.
    The fold is ``list_reduce`` with the accumulator type equal to the
    element type (VARCHAR), init '' prepended — the exact step function
    the Spark ``aggregate()`` runs. Assumes the corpus supports all
    ``n_merges`` rounds (the early-stop path is Spark-only; callers
    pick n_merges below the corpus's merge capacity)."""
    parts = [f"""WITH w0 AS (
  SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' {EOW}' AS s,
         count(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_extract_all({text_col}, '{WORD_RE}')) AS word
        FROM ({docs_sql}))
  GROUP BY 1)"""]
    for r in range(n_merges):
        parts.append(f""",
p{r} AS (
  SELECT l[i] AS a, l[i + 1] AS b, SUM(cnt)::BIGINT AS n
  FROM (SELECT string_split(s, ' ') AS l, cnt FROM w{r}),
       UNNEST(range(1, len(l))) AS t(i)
  GROUP BY 1, 2),
best{r} AS (
  SELECT a, b, n, {r} AS merge_rank FROM p{r}
  ORDER BY n DESC, a, b LIMIT 1),
w{r + 1} AS (
  SELECT list_reduce(
           list_prepend('', string_split(s, ' ')),
           (acc, x) -> CASE
             WHEN acc <> ''
                  AND regexp_extract(acc, '[^ ]*$') = best{r}.a
                  AND x = best{r}.b
             THEN substr(acc, 1,
                         length(acc) - length(regexp_extract(acc, '[^ ]*$')))
                  || best{r}.a || best{r}.b
             WHEN acc = '' THEN x
             ELSE acc || ' ' || x END) AS s,
         cnt
  FROM w{r}, best{r})""")
    union = " UNION ALL ".join(
        f"SELECT merge_rank, a AS left, b AS right, n AS pair_count "
        f"FROM best{r}" for r in range(n_merges))
    parts.append(f"\nSELECT * FROM ({union}) ORDER BY merge_rank")
    return "".join(parts)
