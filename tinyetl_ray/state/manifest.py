"""Copy-on-write table layout, idempotent commit manifests, LSN watermarks.

The distributed generalization of TinyETL's finalize/truncate semantics
(/root/reference/src/transfer.rs:92-118, src/connectors/parquet.rs:456-513 —
buffer everything, write one file, no append): here every partition writes an
immutable Parquet snapshot per epoch, and an epoch becomes visible only when
the driver atomically publishes a commit file naming every partition
manifest. Re-running an epoch rewrites byte-identical snapshots (merge output
is deterministically sorted) and re-publishes the same commit — exactly-once
via idempotence, not coordination.

Layout (table_root/):
    parts/part-00017/epoch-000003-<fp12>.parquet  # LWW winners incl. delete tombstones
                                            # (content-addressed names: racing
                                            # writers can never clobber bytes)
    _commits/epoch-000003.json              # per-partition manifests + watermarks
    _commits/LATEST                         # name of newest committed epoch (atomic rename)

Partition snapshots keep the full change shape (lsn, op, payload): ``op``
rows with 'delete' are tombstones that must survive so a late, older-ts
upsert in a later epoch still loses; ``lsn``/``ts`` are the LWW order. The
public table view filters tombstones and projects the payload.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

COMMITS_DIR = "_commits"
PARTS_DIR = "parts"
LATEST = "LATEST"


def part_dir(root: str, pid: int) -> str:
    return os.path.join(root, PARTS_DIR, f"part-{pid:05d}")


def snapshot_path(root: str, pid: int, epoch: int, fp: str | None = None) -> str:
    """Snapshot file path. ``fp`` (the content fingerprint) makes the name
    CONTENT-ADDRESSED: identical content keeps the idempotent same-name
    rewrite property, while two concurrent writers racing for the same
    (partition, epoch) slot — e.g. an ingest epoch vs a compaction, where
    only one wins the OCC commit — can never clobber each other's bytes;
    the loser's file is simply never referenced (fsck reports it as an
    orphan, vacuum deletes it)."""
    name = f"epoch-{epoch:06d}.parquet" if fp is None else f"epoch-{epoch:06d}-{fp[:12]}.parquet"
    return os.path.join(part_dir(root, pid), name)


def _atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


class _Fingerprint:
    """Chunking-INVARIANT snapshot content fingerprint (round-3 advice):
    one running sha256 per hashed column (conv_id key-hash, turn_idx, lsn),
    fed chunk by chunk — concatenating chunk bytes equals hashing the whole
    column, so the digest depends only on the row stream, never on which
    writer ran (write_snapshot vs write_snapshot_chunks) or on
    TINYETL_SPILL_MERGE_* chunk settings. Finalized in a fixed order with
    the row count first."""

    def __init__(self):
        self._conv = hashlib.sha256()
        self._turn = hashlib.sha256()
        self._lsn = hashlib.sha256()
        self._rows = 0

    def update(self, t: pa.Table) -> None:
        from ..hashing import hash_strings

        self._rows += len(t)
        self._conv.update(hash_strings(t.column("conv_id")).tobytes())
        self._turn.update(t.column("turn_idx").to_numpy().tobytes())
        self._lsn.update(t.column("lsn").to_numpy().tobytes())

    def hexdigest(self) -> str:
        h = hashlib.sha256()
        h.update(str(self._rows).encode())
        h.update(self._conv.digest())
        h.update(self._turn.digest())
        h.update(self._lsn.digest())
        return h.hexdigest()


def write_snapshot(root: str, pid: int, epoch: int, table: pa.Table) -> dict[str, Any]:
    """Write one partition's epoch snapshot atomically; return its manifest.

    Runs INSIDE a merge task (distributed side-effect write); a retried task
    simply re-runs write-then-rename with identical content, landing on the
    identical content-addressed name.
    """
    fp = _Fingerprint()
    if len(table):
        fp.update(table)
    path = snapshot_path(root, pid, epoch, fp.hexdigest())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp-", suffix=".parquet")
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    lsns = table.column("lsn").to_numpy() if len(table) else []
    ops = table.column("op") if "op" in table.column_names else None
    n_del = 0
    if ops is not None and len(table):
        import pyarrow.compute as pc

        n_del = pc.sum(pc.cast(pc.equal(ops, "delete"), pa.int64())).as_py() or 0
    turns = table.column("turn_idx").to_numpy() if len(table) else []
    return {
        "partition": pid,
        "epoch": epoch,
        "file": os.path.relpath(path, root),
        "rows": len(table),
        "tombstones": int(n_del),
        "live_rows": len(table) - int(n_del),
        "lsn_watermark": int(max(lsns)) if len(table) else -1,
        # per-partition turn bound: lets conversation-level lookups
        # enumerate candidate turn-blocks instead of scanning every file
        "max_turn_idx": int(max(turns)) if len(table) else -1,
        "content_hash": fp.hexdigest(),
    }


def write_view_snapshot(
    root: str, pid: int, epoch: int, table: pa.Table, lsn_watermark: int
) -> dict[str, Any]:
    """Atomic snapshot writer for DERIVED (materialized-view) tables.

    Same write-then-rename + manifest shape as write_snapshot so the commit /
    carry-forward / snapshot_files machinery applies unchanged, but makes NO
    assumption about the column set (no lsn/op/turn_idx): the watermark is
    supplied by the caller as the BASE-table lsn this partial reflects, and
    the content fingerprint is a generic Arrow-IPC hash of the (caller-
    sorted) table. Runs inside a distributed build task; retries rewrite
    identical bytes onto the identical content-addressed name."""
    import pyarrow.ipc as ipc

    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    fp = hashlib.sha256(sink.getvalue().to_pybytes()).hexdigest()
    path = snapshot_path(root, pid, epoch, fp)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path), prefix=".tmp-", suffix=".parquet"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return {
        "partition": pid,
        "epoch": epoch,
        "file": os.path.relpath(path, root),
        "rows": len(table),
        "tombstones": 0,
        "live_rows": len(table),
        "lsn_watermark": int(lsn_watermark),
        "max_turn_idx": -1,
        "content_hash": fp,
    }


def write_snapshot_chunks(
    root: str, pid: int, epoch: int, chunks, schema: pa.Schema
) -> dict[str, Any]:
    """Streaming variant of write_snapshot: consume an ITERATOR of
    key-range-ordered chunks, writing parquet row groups incrementally so a
    partition's state never has to fit in one task's memory (the spill-safe
    merge path — see cdc._sorted_run_merge_chunks). Same atomic
    write-then-rename and the same manifest shape; the _Fingerprint scheme
    makes the content_hash identical to write_snapshot's for the same row
    stream regardless of chunk boundaries.
    """
    import pyarrow.compute as pc

    pdir = part_dir(root, pid)
    os.makedirs(pdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=pdir, prefix=".tmp-", suffix=".parquet")
    os.close(fd)
    fp = _Fingerprint()
    rows = 0
    n_del = 0
    lsn_max = -1
    turn_max = -1
    try:
        with pq.ParquetWriter(tmp, schema) as writer:
            for t in chunks:
                if len(t) == 0:
                    continue
                writer.write_table(t)
                rows += len(t)
                if "op" in t.column_names:
                    n_del += (
                        pc.sum(
                            pc.cast(pc.equal(t.column("op"), "delete"), pa.int64())
                        ).as_py()
                        or 0
                    )
                lsn_max = max(lsn_max, int(pc.max(t.column("lsn")).as_py()))
                turn_max = max(turn_max, int(pc.max(t.column("turn_idx")).as_py()))
                fp.update(t)
        # fingerprint is only known once the stream is drained: the
        # content-addressed final name is chosen at rename time
        path = snapshot_path(root, pid, epoch, fp.hexdigest())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return {
        "partition": pid,
        "epoch": epoch,
        "file": os.path.relpath(path, root),
        "rows": rows,
        "tombstones": int(n_del),
        "live_rows": rows - int(n_del),
        "lsn_watermark": lsn_max,
        "max_turn_idx": turn_max,
        "content_hash": fp.hexdigest(),
    }


def schema_to_b64(schema: pa.Schema) -> str:
    import base64

    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_b64(s: str) -> pa.Schema:
    import base64

    import pyarrow.ipc as ipc

    return ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


class ConcurrentCommitError(RuntimeError):
    """Another writer published a commit between this writer's read of the
    table state and its publish attempt (optimistic concurrency check)."""


def commit_epoch(
    root: str,
    epoch: int,
    manifests: list[dict[str, Any]],
    stats: dict[str, Any] | None = None,
    schema: pa.Schema | None = None,
    extra: dict[str, Any] | None = None,
    expected_prev_epoch: int | None = None,
) -> dict[str, Any]:
    """Driver-side atomic publish: the epoch exists once LATEST points at it.

    ``schema`` is the evolved change schema at this epoch — stored in the
    commit so readers can align older, narrower snapshots (additive schema
    evolution) without probing every snapshot footer.

    ``expected_prev_epoch``: optimistic-concurrency guard — publish only if
    the table's current LATEST still names that epoch (-1 = no commit yet);
    otherwise raise ConcurrentCommitError so the caller re-reads state and
    retries rather than silently clobbering another writer's commit.
    """
    if expected_prev_epoch is not None:
        cur = latest_commit(root)
        cur_epoch = -1 if cur is None else int(cur["epoch"])
        if cur_epoch != expected_prev_epoch:
            raise ConcurrentCommitError(
                f"expected table at epoch {expected_prev_epoch} but found "
                f"{cur_epoch} — a concurrent writer committed first"
            )
    commit = {
        "epoch": epoch,
        "watermark": max((m["lsn_watermark"] for m in manifests), default=-1),
        "partitions": sorted(manifests, key=lambda m: m["partition"]),
        "stats": stats or {},
    }
    if schema is not None:
        commit["schema_b64"] = schema_to_b64(schema)
    if extra:
        commit.update(extra)  # e.g. the pinned partitioner (num_partitions,
        # turn_block) — a table property once the first epoch commits
    cpath = os.path.join(root, COMMITS_DIR, f"epoch-{epoch:06d}.json")
    _atomic_write_bytes(cpath, json.dumps(commit, indent=1).encode())
    _atomic_write_bytes(os.path.join(root, COMMITS_DIR, LATEST), f"epoch-{epoch:06d}".encode())
    return commit


def latest_commit(root: str) -> dict[str, Any] | None:
    lpath = os.path.join(root, COMMITS_DIR, LATEST)
    if not os.path.exists(lpath):
        return None
    with open(lpath) as f:
        name = f.read().strip()
    with open(os.path.join(root, COMMITS_DIR, f"{name}.json")) as f:
        return json.load(f)


def list_commits(root: str) -> list[dict[str, Any]]:
    """Full lineage: every committed epoch with its per-partition manifests."""
    cdir = os.path.join(root, COMMITS_DIR)
    if not os.path.isdir(cdir):
        return []
    out = []
    for name in sorted(os.listdir(cdir)):
        if name.startswith("epoch-") and name.endswith(".json"):
            with open(os.path.join(cdir, name)) as f:
                out.append(json.load(f))
    return out


def snapshot_files(root: str, commit: dict[str, Any]) -> list[str]:
    return [os.path.join(root, m["file"]) for m in commit["partitions"] if m["rows"] > 0]


def partition_watermarks(commit: dict[str, Any] | None) -> dict[int, int]:
    if not commit:
        return {}
    return {m["partition"]: m["lsn_watermark"] for m in commit["partitions"]}
