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


def _exclusive_write_bytes(path: str, data: bytes) -> bool:
    """Atomically create ``path`` with ``data`` ONLY if it does not already
    exist (hardlink publish — the POSIX-atomic create-if-absent). Returns
    True on create. Returns False if the file already exists with EXACTLY
    these bytes (an idempotent re-publish, e.g. our own crashed earlier
    attempt); raises FileExistsError if it exists with DIFFERENT bytes
    (a concurrent writer won the slot)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)  # fails with FileExistsError if taken
            return True
        except FileExistsError:
            with open(path, "rb") as f:
                if f.read() == data:
                    return False
            raise
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


# Fingerprint scheme version, recorded in every manifest row that carries a
# content_hash. Bump whenever the digest formula changes (scheme 1 was the
# round-3 key-only / view-IPC hash; scheme 2 is the all-columns, type-aware
# digest below). fsck only recomputes-and-compares rows whose recorded
# scheme matches — older rows are reported "legacy_unverified", never
# falsely "corrupt".
FP_SCHEME = 2


class _ColHash:
    """Three running sha256 streams for ONE column: null mask, primary
    bytes (fixed-width values, or per-row lengths for var-width), and
    var-width data bytes. Keeping the streams separate is what makes the
    digest chunking-invariant: each stream's per-chunk contribution
    concatenates to exactly the whole-column byte sequence. The column's
    canonical Arrow type name (recorded once, on the first chunk) is mixed
    into the final digest so identical value bytes under different logical
    types (int64 vs timestamp[us], bool vs uint8) cannot collide."""

    __slots__ = ("mask", "a", "b", "typ")

    def __init__(self):
        self.mask = hashlib.sha256()
        self.a = hashlib.sha256()
        self.b = hashlib.sha256()
        self.typ: str | None = None

    def digest(self) -> bytes:
        h = hashlib.sha256()
        h.update((self.typ or "").encode())
        h.update(b"\x00")
        h.update(self.mask.digest())
        h.update(self.a.digest())
        h.update(self.b.digest())
        return h.digest()


def _update_col_hash(ch: _ColHash, col: pa.ChunkedArray | pa.Array) -> None:
    """Feed one column slice's canonical bytes into its running streams.

    Encodings (all fixed layout per row, so chunk boundaries can't matter):
      - every type: null mask as one bool byte per row
      - string/binary: int64 length per row -> ``a``; raw row-ordered UTF-8
        data bytes -> ``b`` (no per-byte-position loop — sha256 over the
        Arrow data buffer slice directly)
      - fixed-width (int/float/bool/temporal): null-filled values' native
        bytes -> ``a`` (temporals/bools canonicalized via int cast; the
        ORIGINAL logical type still disambiguates via the recorded type
        name, so int64 [1,2,3] and timestamp[us] [1,2,3] differ)
      - anything else (decimal/list/struct/...): canonical per-row uint64
        hash of the string rendering -> ``a``; if even the string cast is
        unsupported, a per-row sha256 of the repr. An object-dtype numpy
        result is explicitly rejected before hashing — ``.tobytes()`` on
        object arrays emits PyObject POINTERS, which would make the digest
        nondeterministic across processes.
    """
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        for chunk in col.chunks:
            _update_col_hash(ch, chunk)
        return
    n = len(col)
    if n == 0:
        return
    if col.null_count:
        ch.mask.update(np.asarray(pc.is_null(col)).tobytes())
    else:
        ch.mask.update(np.zeros(n, dtype=bool).tobytes())
    typ = col.type
    if pa.types.is_large_string(typ):
        col, typ = col.cast(pa.string()), pa.string()
    elif pa.types.is_large_binary(typ):
        col, typ = col.cast(pa.binary()), pa.binary()
    if ch.typ is None:
        # canonical type identity: recorded AFTER the large->normal
        # normalization (same logical values), BEFORE the int/uint casts
        # below (different logical types must stay distinct)
        ch.typ = str(typ)
    if pa.types.is_string(typ) or pa.types.is_binary(typ):
        bufs = col.buffers()  # [validity, offsets(int32), data]
        off = np.frombuffer(bufs[1], dtype=np.int32, count=n + 1 + col.offset)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        ch.a.update(np.diff(off).tobytes())
        if bufs[2] is not None and off[-1] > off[0]:
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            ch.b.update(data[off[0] : off[-1]].tobytes())
        return
    if (
        pa.types.is_timestamp(typ)
        or pa.types.is_date(typ)
        or pa.types.is_time(typ)
        or pa.types.is_duration(typ)
    ):
        col = pc.cast(col, pa.int64())
    elif pa.types.is_boolean(typ):
        col = pc.cast(col, pa.uint8())
    try:
        vals = pc.fill_null(col, 0) if col.null_count else col
        np_vals = vals.to_numpy(zero_copy_only=False)
        if np_vals.dtype == object:
            raise ValueError("object dtype: tobytes() would hash pointers")
        ch.a.update(np_vals.tobytes())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError):
        try:
            from ..hashing import hash_strings

            ch.a.update(hash_strings(pc.cast(col, pa.string())).tobytes())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # last resort (nested types pyarrow can't render): per-row
            # sha256 of the repr — slow but deterministic, and per-row
            # framing keeps the stream chunking-invariant
            for v in col.to_pylist():
                ch.a.update(hashlib.sha256(repr(v).encode()).digest())


class _Fingerprint:
    """Chunking-INVARIANT snapshot content fingerprint covering EVERY column
    (round-4 advice: bit rot or out-of-band mutation of payload columns must
    fail fsck, and two snapshots differing only in payload must land on
    distinct content-addressed names). Per column, running sha256 streams
    are fed chunk by chunk — concatenating chunk bytes equals hashing the
    whole column, so the digest depends only on the row stream, never on
    which writer ran (write_snapshot vs write_snapshot_chunks /
    write_view_snapshot) or on TINYETL_SPILL_MERGE_* chunk settings or
    parquet row-group layout. Finalized with the row count first, then the
    per-column digests keyed by sorted column name. Makes NO assumption
    about the column set, so base-table and derived-view snapshots share
    this one scheme (and fsck one recompute path)."""

    def __init__(self):
        self._cols: dict[str, _ColHash] = {}
        self._rows = 0

    def update(self, t: pa.Table) -> None:
        self._rows += len(t)
        for name in t.column_names:
            _update_col_hash(self._cols.setdefault(name, _ColHash()), t.column(name))

    def hexdigest(self) -> str:
        h = hashlib.sha256()
        h.update(str(self._rows).encode())
        for name in sorted(self._cols):
            h.update(name.encode())
            h.update(b"\x00")
            h.update(self._cols[name].digest())
        return h.hexdigest()


def write_snapshot(root: str, pid: int, epoch: int, table: pa.Table) -> dict[str, Any]:
    """Write one partition's epoch snapshot atomically; return its manifest.

    Runs INSIDE a merge task (distributed side-effect write); a retried task
    simply re-runs write-then-rename with identical content, landing on the
    identical content-addressed name.

    Two fingerprints per snapshot: ``content_hash`` covers every row and
    column (file integrity — fsck's target, and the content-addressed
    name); ``live_hash`` covers only the surviving-upsert rows, so it is
    INVARIANT under tombstone-dropping compaction (which preserves live
    rows and their key order) — the exact change-identity signal
    materialized views diff on.
    """
    import pyarrow.compute as _pc

    fp = _Fingerprint()
    lfp = _Fingerprint()
    n_live_hashed = 0
    if len(table):
        fp.update(table)
        live = (
            table.filter(_pc.equal(table.column("op"), "upsert"))
            if "op" in table.column_names
            else table
        )
        if len(live):
            lfp.update(live)
            n_live_hashed = len(live)
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
        "fp_scheme": FP_SCHEME,
        # canonical "no surviving rows" is "" — the same value the
        # compaction/repartition pseudo-rows for emptied partitions use,
        # so a view refresh never sees two encodings of 'empty' and
        # rebuilds a partition whose live content didn't change
        "live_hash": lfp.hexdigest() if n_live_hashed else "",
    }


def write_view_snapshot(
    root: str, pid: int, epoch: int, table: pa.Table, lsn_watermark: int
) -> dict[str, Any]:
    """Atomic snapshot writer for DERIVED (materialized-view) tables.

    Same write-then-rename + manifest shape as write_snapshot so the commit /
    carry-forward / snapshot_files machinery applies unchanged, but makes NO
    assumption about the column set (no lsn/op/turn_idx): the watermark is
    supplied by the caller as the BASE-table lsn this partial reflects, and
    the content fingerprint is the same generic chunking-invariant
    _Fingerprint the base-table writers use (round-4 advice: an IPC-bytes
    hash depended on record-batch chunking, so a multi-row-group readback
    could false-flag 'corrupt' in fsck). Runs inside a distributed build
    task; retries rewrite identical bytes onto the identical
    content-addressed name."""
    fpr = _Fingerprint()
    if len(table):
        fpr.update(table)
    fp = fpr.hexdigest()
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
        "fp_scheme": FP_SCHEME,
        # view partials carry no tombstones; "" is the canonical empty
        "live_hash": fp if len(table) else "",
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
    lfp = _Fingerprint()
    n_live_hashed = 0
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
                live = t
                if "op" in t.column_names:
                    n_del += (
                        pc.sum(
                            pc.cast(pc.equal(t.column("op"), "delete"), pa.int64())
                        ).as_py()
                        or 0
                    )
                    live = t.filter(pc.equal(t.column("op"), "upsert"))
                lsn_max = max(lsn_max, int(pc.max(t.column("lsn")).as_py()))
                turn_max = max(turn_max, int(pc.max(t.column("turn_idx")).as_py()))
                fp.update(t)
                if len(live):
                    lfp.update(live)
                    n_live_hashed += len(live)
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
        "fp_scheme": FP_SCHEME,
        "live_hash": lfp.hexdigest() if n_live_hashed else "",
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
    """Driver-side atomic publish: the epoch exists once its JSON is
    (exclusively) created; LATEST is a derived pointer readers can heal.

    ``schema`` is the evolved change schema at this epoch — stored in the
    commit so readers can align older, narrower snapshots (additive schema
    evolution) without probing every snapshot footer.

    ``expected_prev_epoch``: optimistic-concurrency guard — publish only if
    the table's current LATEST still names that epoch (-1 = no commit yet);
    otherwise raise ConcurrentCommitError so the caller re-reads state and
    retries rather than silently clobbering another writer's commit.

    The guard is enforced TWICE: a cheap early LATEST read (fast-fail with
    a precise message), and — because check-then-act leaves a race window
    where two writers both pass the read — an EXCLUSIVE hardlink create of
    the epoch JSON itself, so at most one writer can ever own an epoch
    slot. A re-publish with byte-identical content (our own earlier attempt
    that crashed between the JSON write and the LATEST update) is accepted
    idempotently.
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
    try:
        _exclusive_write_bytes(cpath, json.dumps(commit, indent=1).encode())
    except FileExistsError:
        raise ConcurrentCommitError(
            f"epoch {epoch} was published by a concurrent writer between the "
            f"optimistic check and this publish — re-read state and retry"
        ) from None
    _atomic_write_bytes(os.path.join(root, COMMITS_DIR, LATEST), f"epoch-{epoch:06d}".encode())
    return commit


def latest_commit(root: str) -> dict[str, Any] | None:
    """The exclusively-created epoch JSON is the COMMIT POINT (its hardlink
    publish is the atomic create-if-absent that decides OCC races); LATEST
    is a derived pointer that can lag a writer that crashed between the two
    writes. Readers heal the lag: follow LATEST, then advance while the
    next sequential epoch JSON exists (epochs are prev+1 within a table)."""
    cdir = os.path.join(root, COMMITS_DIR)
    lpath = os.path.join(cdir, LATEST)
    if os.path.exists(lpath):
        with open(lpath) as f:
            name = f.read().strip()
        n = int(name.rsplit("-", 1)[1])
    else:
        # LATEST itself missing: the very first commit's crash window —
        # fall back to scanning for published epoch JSONs
        if not os.path.isdir(cdir):
            return None
        epochs = [
            int(x[len("epoch-") : -len(".json")])
            for x in os.listdir(cdir)
            if x.startswith("epoch-") and x.endswith(".json")
        ]
        if not epochs:
            return None
        n = max(epochs)
    while os.path.exists(os.path.join(cdir, f"epoch-{n + 1:06d}.json")):
        n += 1
    with open(os.path.join(cdir, f"epoch-{n:06d}.json")) as f:
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
