"""Small-file compaction EXECUTOR (VERDICT r3 #5) — rewrite a
wave-fragmented parquet table into ~target-size files, crash-safe.

``q_compaction_plan`` plans groups with the sequence-packing window
(corpus.pack_sequences on file metadata); this module executes such a
plan against real files with the same commit discipline as the crawl
state (crawl/state.py): stage everything, commit with ONE atomic rename,
then garbage-collect — a crash at any point either rolls back (nothing
committed) or rolls forward (commit already durable), never both layouts.

Protocol:

1. ``data_files`` enumerates the committed ``*.parquet`` leaves (driver-
   side listing — the same metadata-scale work an Iceberg planner does;
   file COUNT, not data size, bounds it).
2. The plan runs through ``corpus.pack_sequences`` over the files-sized
   metadata table: files ordered by path, packed greedily into
   ``capacity`` groups by byte size (or exact row counts with
   ``by_rows=True`` — one extra metadata scan, used by the driver oracle
   because parquet byte sizes are encoder-dependent while row counts are
   engine-portable).
3. Each multi-file group is rewritten into ``_compacting/part-compact-
   e<E>-g<N>.parquet`` (read exactly that group's files, coalesce(1));
   ``E`` is a per-pass epoch (1 + max epoch among committed files), so
   output names are collision-free across passes — a re-compaction can
   never overwrite a RETAINED file from a prior pass. Single-file
   groups are RETAINED in place — no write amplification for
   already-right-sized files.
4. COMMIT: a manifest json (new-file moves + obsolete inputs) is
   fsynced and atomically renamed to ``_compaction_manifest.json`` —
   the single commit point.
5. GC/finish: move staged files into the table root, delete obsolete
   inputs (and now-empty wave dirs), remove the manifest.

``recover_compaction`` settles a crashed run: manifest present → roll
FORWARD (finish is idempotent: moves skip missing sources, deletes skip
missing targets); stage dir without manifest → roll BACK (delete the
stage; the committed table was never touched). ``compact_files`` calls
it first, so a crashed compaction self-heals on the next attempt.

Single-writer contract (documented, same as CrawlState.compact_frontier):
run compaction offline or behind the crawl's own wave serialization —
a concurrent reader inside the finish window could see both layouts.
The post-compaction layout is FLAT (wave=K fragmentation is what is
being removed); per-row wave provenance lives in the data's own
``wave`` column, not the directory name.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_compaction_manifest.json"
STAGE = "_compacting"
DEFAULT_TARGET = 128 * 1024 * 1024
_EPOCH_RE = re.compile(r"part-compact-e(\d+)-g\d+\.parquet$")


def _next_epoch(files: list[tuple[str, int]]) -> int:
    """1 + the highest compaction epoch among committed files. Output
    names carry this epoch (part-compact-e<E>-g<N>.parquet), so a pass
    can never name an output after a RETAINED file from a prior pass —
    the collision that used to let _finish's os.replace overwrite a
    bystander whose rows were never rewritten. Legacy un-epoched
    part-compact-g<N> names count as epoch 0."""
    best = 0
    for rel, _ in files:
        m = _EPOCH_RE.search(os.path.basename(rel))
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def data_files(table_dir: str) -> list[tuple[str, int]]:
    """(relpath, size_bytes) of every committed data file, sorted by
    relpath. Staging/metadata (``_``/``.`` prefixed anywhere in the
    relative path) is excluded."""
    out = []
    for root, _dirs, names in os.walk(table_dir):
        rel_root = os.path.relpath(root, table_dir)
        if any(part.startswith(("_", "."))
               for part in rel_root.split(os.sep) if part != "."):
            continue
        for n in names:
            if n.startswith(("_", ".")) or not n.endswith(".parquet"):
                continue
            p = os.path.join(root, n)
            out.append((os.path.relpath(p, table_dir), os.path.getsize(p)))
    return sorted(out)


def _finish(table_dir: str) -> None:
    """Idempotent roll-forward of a committed manifest: stage -> final
    moves, obsolete-input deletes, empty-dir sweep, manifest removal."""
    mpath = os.path.join(table_dir, MANIFEST)
    with open(mpath) as f:
        manifest = json.load(f)
    dsts = {mv["dst"] for mv in manifest["new"]}
    for mv in manifest["new"]:
        src = os.path.join(table_dir, mv["src"])
        dst = os.path.join(table_dir, mv["dst"])
        if os.path.exists(src):
            os.replace(src, dst)
    for rel in manifest["old"]:
        # legacy (pre-epoch) manifests could reuse an input's name for
        # an output: the move above already atomically replaced it —
        # deleting would drop the NEW file
        if rel in dsts:
            continue
        p = os.path.join(table_dir, rel)
        if os.path.exists(p):
            os.remove(p)
    for root, dirs, names in os.walk(table_dir, topdown=False):
        if root == table_dir:
            continue
        # a source dir whose data files were all folded away may still
        # hold writer metadata (_SUCCESS etc.) — that's an empty dir for
        # every reader, and leaving it breaks partition-discovery reads
        leftovers = [n for n in names if n.startswith(("_", "."))]
        if not dirs and len(leftovers) == len(names):
            for n in leftovers:
                os.remove(os.path.join(root, n))
            os.rmdir(root)
    shutil.rmtree(os.path.join(table_dir, STAGE), ignore_errors=True)
    os.remove(mpath)


def recover_compaction(table_dir: str) -> str:
    """Settle a possibly-crashed compaction. Returns the action taken:
    'forward' (manifest was committed — finish it), 'rollback' (staged
    but never committed — discard), or 'clean'."""
    if os.path.exists(os.path.join(table_dir, MANIFEST)):
        _finish(table_dir)
        return "forward"
    if os.path.isdir(os.path.join(table_dir, STAGE)):
        shutil.rmtree(os.path.join(table_dir, STAGE))
        return "rollback"
    return "clean"


def _row_counts(spark: SparkSession, table_dir: str,
                files: list[tuple[str, int]]) -> dict[str, int]:
    """relpath -> exact row count, from one metadata-cheap scan grouped
    by input_file_name (count(*) over parquet reads footers, not data)."""
    paths = [os.path.join(table_dir, rel) for rel, _ in files]
    rows = (
        spark.read.parquet(*paths)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_abs = {}
    for r in rows:
        f = r["f"]
        if f.startswith("file:"):
            f = f[len("file:"):]
            while f.startswith("//"):
                f = f[1:]
            if not f.startswith("/"):
                f = "/" + f
        by_abs[os.path.normpath(f)] = int(r["n"])
    # a zero-row part file never appears in the grouped scan — weight 0
    # (it still joins some group and is GC'd with it)
    return {rel: by_abs.get(os.path.normpath(os.path.join(table_dir, rel)), 0)
            for rel, _ in files}


def plan_groups(spark: SparkSession, files: list[tuple[str, int]],
                capacity: int,
                weights: dict[str, int] | None = None) -> dict[int, list[str]]:
    """group id -> ordered input relpaths, via the SAME packing window
    q_compaction_plan uses (corpus.pack_sequences: files ordered by
    path, greedy running-sum DIV capacity)."""
    from ..operators.corpus import pack_sequences

    fdf = spark.createDataFrame(
        [(rel, int(weights[rel] if weights else size))
         for rel, size in files],
        "path string, weight long",
    )
    plan = pack_sequences(fdf, tokens_col="weight", capacity=capacity,
                          order_col="path").select("path", "seq_id").collect()
    groups: dict[int, list[str]] = {}
    for r in plan:
        groups.setdefault(int(r["seq_id"]), []).append(r["path"])
    for g in groups.values():
        g.sort()
    return groups


def compact_files(spark: SparkSession, table_dir: str,
                  capacity: int = DEFAULT_TARGET,
                  by_rows: bool = False) -> dict:
    """Execute a compaction pass. Returns stats: files/bytes before and
    after, group count, rewritten vs retained groups, and the
    read-amplification ratio (files a full-table read must open, before
    / after)."""
    recover_compaction(table_dir)
    files = data_files(table_dir)
    stats = {
        "files_before": len(files),
        "bytes_before": sum(s for _, s in files),
    }
    if len(files) <= 1:
        stats.update(files_after=len(files), bytes_after=stats["bytes_before"],
                     groups=len(files), rewritten=0, retained=len(files),
                     read_amplification=1.0)
        return stats
    weights = _row_counts(spark, table_dir, files) if by_rows else None
    groups = plan_groups(spark, files, capacity, weights)

    stage = os.path.join(table_dir, STAGE)
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    epoch = _next_epoch(files)
    retained_names = set()
    new, old, retained = [], [], 0
    for g in sorted(groups):
        inputs = groups[g]
        if len(inputs) == 1:
            retained += 1
            retained_names.add(inputs[0])
            continue
        out_tmp = os.path.join(stage, f"g{g}")
        (spark.read.parquet(*[os.path.join(table_dir, rel)
                              for rel in inputs])
         .coalesce(1).write.mode("overwrite").parquet(out_tmp))
        part = [n for n in os.listdir(out_tmp)
                if n.endswith(".parquet") and not n.startswith(("_", "."))]
        assert len(part) == 1, part
        dst = f"part-compact-e{epoch}-g{g}.parquet"
        staged_rel = os.path.join(STAGE, dst)
        os.replace(os.path.join(out_tmp, part[0]),
                   os.path.join(table_dir, staged_rel))
        shutil.rmtree(out_tmp)
        new.append({"src": staged_rel, "dst": dst})
        old.extend(inputs)
    # belt-and-braces: the epoch scheme makes every dst fresh; if that
    # invariant is ever broken, fail BEFORE the commit point (nothing
    # staged is visible, rollback is automatic) rather than overwrite
    # a retained file's rows
    clobbered = {mv["dst"] for mv in new} & retained_names
    assert not clobbered, f"compaction dst collides with retained {clobbered}"

    # COMMIT: fsync'd manifest + atomic rename (crash before = rollback,
    # crash after = roll forward; same shape as CrawlState._write_ledger)
    fd, tmp = tempfile.mkstemp(dir=table_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"new": new, "old": old}, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(table_dir, MANIFEST))
    try:
        dfd = os.open(table_dir, os.O_RDONLY)
        os.fsync(dfd)
        os.close(dfd)
    except OSError:
        pass
    _finish(table_dir)

    after = data_files(table_dir)
    stats.update(
        files_after=len(after),
        bytes_after=sum(s for _, s in after),
        groups=len(groups),
        rewritten=len(new),
        retained=retained,
        read_amplification=round(len(files) / max(len(after), 1), 3),
    )
    return stats
