"""Checkpointed crawl state with a wave ledger (SURVEY.md §2.10 T3/T4).

The reference's resumability is "frontier + seen live on disk"
(/root/reference/cache.py:47-76). Here every wave commits:

    state_dir/
      ledger.json                # committed waves + next_seq (written LAST)
      frontier/wave=K/           # full pending snapshot after wave K
      seen_delta/wave=K/         # hashes first seen in wave K (append-only)
      documents/wave=K/          # documents emitted in wave K
      schedule_log/wave=K/       # (wave, seq, url) fetch order — golden_crawl
      metrics/wave=K/            # per-partition lineage + fetch/dedup metrics

Commit protocol: data dirs first, ledger last via atomic rename — a crash
mid-wave leaves the ledger pointing at the previous complete wave, so
resume replays from a consistent snapshot (the Iceberg-snapshot analogue;
with Iceberg jars on the classpath these become real table commits).
The seen set is append-only (delta per wave), so resuming reads
``seen_delta/wave<=K`` — no rewrite of 10^10 rows per wave.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class CrawlState:
    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # --- ledger ---------------------------------------------------------
    @property
    def _ledger_path(self) -> str:
        return os.path.join(self.dir, "ledger.json")

    def read_ledger(self) -> dict:
        if not os.path.exists(self._ledger_path):
            return {"waves": [], "next_seq": 0}
        with open(self._ledger_path) as f:
            return json.load(f)

    def commit_wave(self, wave: int, next_seq: int, stats: dict) -> None:
        ledger = self.read_ledger()
        ledger["waves"] = [w for w in ledger["waves"] if w["wave"] != wave]
        ledger["waves"].append({"wave": wave, "next_seq": next_seq, **stats})
        ledger["waves"].sort(key=lambda w: w["wave"])
        ledger["next_seq"] = next_seq
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".ledger.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(ledger, f, indent=2)
        os.replace(tmp, self._ledger_path)  # atomic commit point

    def last_wave(self) -> int | None:
        waves = self.read_ledger()["waves"]
        return waves[-1]["wave"] if waves else None

    # --- table IO -------------------------------------------------------
    def _p(self, table: str, wave: int) -> str:
        return os.path.join(self.dir, table, f"wave={wave}")

    def write(self, table: str, wave: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._p(table, wave))

    def read(self, table: str, wave: int) -> DataFrame:
        return self.spark.read.parquet(self._p(table, wave))

    def read_frontier(self, wave: int) -> DataFrame:
        return self.read("frontier", wave)

    def read_seen(self, upto_wave: int) -> DataFrame | None:
        paths = [
            self._p("seen_delta", w)
            for w in range(upto_wave + 1)
            if os.path.exists(self._p("seen_delta", w))
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def expire_results(self, keep_last_n_waves: int) -> list[int]:
        """T5 retention (reference TTL, cache.py:229-263): drop result
        tables (documents / schedule_log / metrics) for waves older than
        the last N. Crawl STATE (frontier snapshots, seen deltas) is never
        expired — the seen set must stay exact."""
        import shutil

        ledger = self.read_ledger()
        waves = sorted(w["wave"] for w in ledger["waves"] if w["wave"] >= 0)
        expired = waves[:-keep_last_n_waves] if keep_last_n_waves else waves
        for w in expired:
            for table in ("documents", "schedule_log", "metrics"):
                path = self._p(table, w)
                if os.path.exists(path):
                    shutil.rmtree(path)
        return expired

    def read_all(self, table: str) -> DataFrame | None:
        base = os.path.join(self.dir, table)
        if not os.path.exists(base):
            return None
        return self.spark.read.option("basePath", base).parquet(base)
