"""Versioned parquet tables: snapshot isolation, time-travel, rollback.

The table-format layer a 100 TB deployment puts under every other
operator in this engine (the rollup tiers, the persisted BM25/ANN
indexes, the compaction pass): readers must pin a consistent snapshot
while writers land new data, yesterday's snapshot must stay queryable,
and a bad load must be revertible without copying data. The reference
has no table format at all (its cache layer is latest-only,
utils/cache_manager.py); this module supplies the missing substrate
with the classic log-structured design the public formats
(Delta/Iceberg papers) converge on, re-expressed minimally:

- Data files are IMMUTABLE. Every commit writes its rows into a fresh
  ``data/c{N}/`` directory; nothing ever rewrites an existing file.
- A snapshot is a MANIFEST: ``_manifests/v{N}.json`` holds the full
  file list visible at version N (self-contained, not a delta chain)
  plus the commit's ``added``/``removed`` lists for incremental
  consumers. Readers never list the data directory — a scan plans from
  the manifest's file list, so a concurrent writer is invisible until
  its manifest lands.
- Commits are ATOMIC and optimistic: the manifest is written to a temp
  name and ``os.link``-ed to ``v{N}.json`` — link fails with EEXIST if
  another writer claimed N first (retry on the next number). A reader
  either sees the complete manifest or nothing.
- ``rollback`` is a METADATA commit: a new version whose file list is a
  byte-copy of the target's. History stays linear and the bad
  version remains inspectable; no data moves.
- ``vacuum`` deletes data files unreachable from every retained
  manifest — the only destructive operation, explicitly invoked.

Scale notes (100 TB): commit cost is O(files in the commit) — the
manifest rewrite carries the full list, which at millions of files
wants the checkpoint-compaction the big formats add; the `added`/
`removed` lists are already the delta a compactor needs. Reads plan
from the manifest (no object-store LISTing, the expensive operation at
cloud scale), pushdown/pruning work unchanged since the files are
plain parquet, and ``incremental_read`` gives exactly-the-new-files
CDC for append pipelines (the st02 absorb discipline upstream).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFESTS, f"v{version:08d}.json")


def table_version(root: str) -> int:
    """Latest committed version, or 0 if the table doesn't exist yet."""
    mdir = os.path.join(root, _MANIFESTS)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _list_parquet(commit_dir: str) -> list[str]:
    return sorted(
        os.path.join(commit_dir, f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def committed_txn(root: str, txn_id: str) -> int | None:
    """Version that already committed ``txn_id``, or None. Linear in
    retained manifests — at millions of commits this wants the
    checkpointed latest-txn map the big formats keep; the scan is the
    honest baseline the checkpoint would cache."""
    for v in range(table_version(root), 0, -1):
        path = _manifest_path(root, v)
        if not os.path.exists(path):
            break  # vacuumed history below here
        if read_manifest(root, v).get("txn_id") == txn_id:
            return v
    return None


def _commit(root: str, files: list[str], added: list[str],
            removed: list[str], op: str, txn_id: str | None = None) -> int:
    """Atomically claim the next version number for this snapshot."""
    mdir = os.path.join(root, _MANIFESTS)
    os.makedirs(mdir, exist_ok=True)
    rel = [os.path.relpath(f, root) for f in files]
    while True:
        # re-check inside the claim loop: a racing writer may have landed
        # this txn while we were writing data files
        if txn_id is not None:
            seen = committed_txn(root, txn_id)
            if seen is not None:
                return seen
        version = table_version(root) + 1
        manifest = {
            "version": version,
            "op": op,
            "files": rel,
            "added": [os.path.relpath(f, root) for f in added],
            "removed": [os.path.relpath(f, root) for f in removed],
            "txn_id": txn_id,
        }
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, _manifest_path(root, version))
            os.unlink(tmp)
            return version
        except FileExistsError:
            os.unlink(tmp)  # lost the race; retry with the next number


def write_version(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    mode: str = "append",
    txn_id: str | None = None,
) -> int:
    """Commit ``df`` as a new table version.

    ``mode='append'`` adds the rows to the current snapshot;
    ``'overwrite'`` replaces it (previous files leave the snapshot but
    stay on disk for time-travel). Returns the committed version.

    ``txn_id`` makes the commit IDEMPOTENT: if any retained manifest
    already carries it, the write is a no-op returning that version —
    the transactional-writer discipline that turns a retried streaming
    micro-batch into exactly-once (see ``start_versioned_sink``)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if txn_id is not None:
        seen = committed_txn(root, txn_id)
        if seen is not None:
            return seen
    current = table_version(root)
    commit_dir = os.path.join(
        root, _DATA, f"c{current + 1:08d}-{uuid.uuid4().hex[:8]}"
    )
    df.write.parquet(commit_dir)
    new_files = _list_parquet(commit_dir)
    prev = (
        [os.path.join(root, f) for f in read_manifest(root, current)["files"]]
        if current
        else []
    )
    if mode == "append":
        return _commit(root, prev + new_files, new_files, [], "append", txn_id)
    return _commit(root, new_files, new_files, prev, "overwrite", txn_id)


def read_version(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Scan the table as of ``version`` (default: latest). Plans directly
    from the manifest's file list — no directory listing, and an empty
    snapshot is an error (there is nothing to infer a schema from).

    ``merge_schema=True`` unions the schemas across the snapshot's files
    (columns added by later appends read as NULL in older files) — the
    additive half of schema evolution; renames/retypes need a rewrite."""
    if version is None:
        version = table_version(root)
    files = read_manifest(root, version)["files"]
    if not files:
        raise ValueError(f"version {version} of {root} is empty")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[os.path.join(root, f) for f in files])


def start_versioned_sink(
    stream_df: DataFrame, root: str, checkpoint: str, query_name: str | None = None
):
    """Structured-Streaming sink INTO the versioned table with
    exactly-once semantics: each micro-batch commits as one ``append``
    version whose ``txn_id`` is (streaming query id, batch id). The
    query id is read from the CHECKPOINT's metadata file, so a
    crashed-and-retried batch (same checkpoint => same query id and
    batch id) finds its txn already committed and no-ops, while a fresh
    checkpoint gets a new query id and can never collide with an old
    run's txns — the transactional-writer discipline the public
    log-structured formats document. Downstream consumers get atomic,
    CDC-readable versions (``incremental_read``) instead of the raw
    file litter a parquet file sink leaves. Returns the started query;
    callers own ``awaitTermination``."""

    def _query_id() -> str:
        # written by the engine at query start, stable across restarts
        # on the same checkpoint
        with open(os.path.join(checkpoint, "metadata")) as f:
            return json.load(f)["id"]

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        write_version(
            batch_df.sparkSession,
            batch_df,
            root,
            txn_id=f"{_query_id()}:{batch_id}",
        )

    writer = stream_df.writeStream.foreachBatch(absorb).option(
        "checkpointLocation", checkpoint
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.trigger(availableNow=True).start()


def incremental_read(
    spark: SparkSession, root: str, from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC for append pipelines: the rows ADDED by commits in
    ``(from_version, to_version]`` — exactly the new files, never a
    rescan of the base. Raises if the range crosses an overwrite or
    rollback (appends-only is what makes file-level CDC exact; a
    replaced snapshot needs a diff, not a file union)."""
    if to_version is None:
        to_version = table_version(root)
    added: list[str] = []
    for v in range(from_version + 1, to_version + 1):
        m = read_manifest(root, v)
        if m["op"] != "append":
            raise ValueError(
                f"incremental_read crosses non-append commit v{v} ({m['op']})"
            )
        added.extend(m["added"])
    if not added:
        raise ValueError(
            f"no files added in ({from_version}, {to_version}] of {root}"
        )
    return spark.read.parquet(*[os.path.join(root, f) for f in added])


def rollback(root: str, to_version: int) -> int:
    """Revert the table to ``to_version``'s snapshot as a NEW commit.
    Pure metadata — the file list is copied, no data moves, and the
    rolled-back versions remain time-travel-readable."""
    target = read_manifest(root, to_version)
    current = read_manifest(root, table_version(root))
    files = [os.path.join(root, f) for f in target["files"]]
    added = sorted(set(target["files"]) - set(current["files"]))
    removed = sorted(set(current["files"]) - set(target["files"]))
    return _commit(
        root,
        files,
        [os.path.join(root, f) for f in added],
        [os.path.join(root, f) for f in removed],
        f"rollback:{to_version}",
    )


def vacuum(root: str, retain_from: int) -> list[str]:
    """Delete data files unreachable from every manifest >=
    ``retain_from`` (and drop the older manifests). Time-travel before
    ``retain_from`` dies here — this is the one destructive operation,
    so it returns the deleted paths for the caller's audit log."""
    latest = table_version(root)
    retain_from = min(retain_from, latest)
    keep: set[str] = set()
    for v in range(retain_from, latest + 1):
        keep.update(read_manifest(root, v)["files"])
    deleted = []
    data_root = os.path.join(root, _DATA)
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            if not name.endswith(".parquet") or name.startswith(("_", ".")):
                continue  # markers/checksums aren't snapshot members
            full = os.path.join(dirpath, name)
            if os.path.relpath(full, root) not in keep:
                os.unlink(full)
                deleted.append(full)
    for v in range(1, retain_from):
        path = _manifest_path(root, v)
        if os.path.exists(path):
            os.unlink(path)
    return sorted(deleted)
