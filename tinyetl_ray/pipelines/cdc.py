"""The flagship pipeline: change-log replay → LWW-merged transcript table.

Ray-Data-first restructuring of TinyETL's 10-step sequential transfer engine
(/root/reference/src/transfer.rs:23-199 — read batch, validate, transform,
write, one batch at a time, zero parallelism). Here every stage is a lazy
``Dataset`` transform executed by the streaming executor with backpressure:

    read_parquet(changes)                         # step 9's read, distributed
      └─ map_batches(DecodeValidate)              # steps 2+9 validate (vectorized)
      └─ map_batches(PreReduce)                   # combiner: collapse churn pre-shuffle
      └─ map_batches(AddPartitionId)              # salted hash routing
      └─ groupby(partition_id).map_groups(merge)  # THE shuffle + final LWW
      └─ [write per-partition COW snapshot + manifest]   # exactly-once commit

Two entry points:
- ``replay``          — pure Dataset→Dataset (used by queries()/oracle checks)
- ``replay_commit``   — full epoch loop with COW snapshots, commit manifests,
                        LSN watermarks and checkpoint resume (the product)
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..schema import (
    CHANGE_SCHEMA,
    align_to,
    evolve,
    evolve_all,
    strip_metadata,
    transcript_schema_of,
)
from ..stages.decode import DecodeValidate
from ..stages.merge import PreReduce, finalize_payload, lww_reduce
from ..stages.partition import DEFAULT_TURN_BLOCK, PARTITION_COL, AddPartitionId
from ..state import manifest as mf

BASE_LSN = -1  # base-table rows replay as upserts that any real event beats on lsn

# A merge task whose PRIOR SNAPSHOT exceeds this many rows switches from the
# in-memory concat+sort to the external sorted-run merge (snapshots are
# key-sorted with unique keys, so prior ⋈ delta is a streaming merge-join of
# two sorted inputs — peak memory = one chunk + the epoch delta, never the
# whole partition). The in-memory path stays the default: it is faster and
# the documented P-sizing rule keeps partitions inside a worker's heap; this
# is the guard rail for skewed giant partitions at 10^10 scale.
SPILL_MERGE_ROWS = int(os.environ.get("TINYETL_SPILL_MERGE_ROWS", "4000000"))
SPILL_MERGE_CHUNK_ROWS = 1 << 18


def _sorted_run_merge_chunks(prior_path, delta, schema, chunk_rows):
    """Yield key-sorted merged chunks of (prior snapshot ⋈ epoch delta).

    The prior snapshot is key-sorted with UNIQUE keys (finalize_payload), so
    chunk key ranges are disjoint and increasing. The delta — small after the
    PreReduce combiner — is LWW-reduced in memory once; each snapshot chunk
    is then unioned with its key-range slice of the delta and locally
    reduced. Associativity of LWW makes this bit-identical to the in-memory
    concat+sort of the whole partition."""
    import bisect

    from ..stages.merge import finalize_payload, lww_reduce

    d = finalize_payload(
        lww_reduce(align_to(delta, schema), keep_deletes=True), drop_cols=()
    )
    dkeys = list(
        zip(d.column("conv_id").to_pylist(), d.column("turn_idx").to_pylist())
    )
    lo = 0
    pf = pq.ParquetFile(prior_path)
    for rb in pf.iter_batches(batch_size=chunk_rows):
        chunk = align_to(pa.Table.from_batches([rb]), schema)
        if len(chunk) == 0:
            continue
        last_key = (
            chunk.column("conv_id")[-1].as_py(),
            chunk.column("turn_idx")[-1].as_py(),
        )
        hi = bisect.bisect_right(dkeys, last_key, lo=lo)
        if hi > lo:
            union = pa.concat_tables([chunk, d.slice(lo, hi - lo)])
            lo = hi
            yield finalize_payload(lww_reduce(union, keep_deletes=True), drop_cols=())
        else:
            yield chunk  # untouched key range: already reduced and sorted
    if lo < len(d):
        yield d.slice(lo)  # delta keys beyond the prior's max key


def default_shuffle_blocks() -> int:
    """Map-side block count feeding the groupby shuffle.

    The sort shuffle's cost is dominated by (map blocks × reduce partitions)
    object count, not bytes, at our block sizes — measured on the 16M-event
    wide log: 64 map blocks → 6.8s, 16 → 2.5s at 32 CPUs. Coalescing the
    combined/pre-reduced stream to ~half the cluster's cores keeps map tasks
    busy while minimizing shuffle objects; floor of 16 preserves parallelism
    on small sessions, and on a real multi-node cluster this scales with
    total cores. Delegates to the shared heuristic in ``hashing`` (also
    used by the dedup and parity pipelines) so one tuning serves all paths.
    """
    from ..hashing import shuffle_blocks

    return shuffle_blocks(floor=16, divisor=2)


def base_as_changes(batch: pa.Table, change_schema: pa.Schema) -> pa.Table:
    """Lift base transcript rows into the change shape (op=upsert, lsn=-1).

    LWW then treats base state uniformly: a change with ts >= base ts wins;
    an older-ts change loses to the base row — exactly the semantics of
    merging against current table state, with no special-case join.
    """
    n = len(batch)
    t = batch.add_column(0, pa.field("lsn", pa.int64()), pa.array([BASE_LSN] * n, pa.int64()))
    t = t.add_column(1, pa.field("op", pa.string()), pa.array(["upsert"] * n, pa.string()))
    return align_to(t, change_schema)


def union_change_schema(
    change_ds: ray.data.Dataset, extra: list[pa.Schema] | None = None
) -> pa.Schema:
    """Evolved (additive-union) change schema across epochs + prior state.

    CAVEAT: ``Dataset.schema()`` on a multi-file parquet read reflects only the
    sampled fragment — it can miss columns that appear in later (evolved)
    files. File-based entry points must union the parquet FOOTER schemas
    instead (see ``file_union_schema``); this helper is for in-memory
    datasets whose schema is exact.
    """
    schemas = [CHANGE_SCHEMA, pa.schema(change_ds.schema().base_schema)]
    for s in extra or []:
        schemas.append(s)
    return evolve_all(schemas)


def file_union_schema(files: list[str], extra: list[pa.Schema] | None = None) -> pa.Schema:
    """Additive union over parquet footer schemas (cheap metadata reads).

    At 10^10-event scale, footers of every change file would instead be
    summarized once in the change-log's own manifest; reading P footers on
    the driver is the sandbox-scale equivalent.
    """
    return evolve_all([CHANGE_SCHEMA] + [pq.read_schema(f) for f in files] + (extra or []))


def replay(
    changes: ray.data.Dataset,
    base: ray.data.Dataset | None = None,
    *,
    num_partitions: int = 64,
    turn_block: int = DEFAULT_TURN_BLOCK,
    on_error: str = "raise",
    keep_partition_col: bool = False,
    change_schema: pa.Schema | None = None,
    shuffle_blocks: int | None = None,
    quarantine_dir: str | None = None,
) -> ray.data.Dataset:
    """Replay a change log (optionally over a base table) → merged transcript.

    Streaming end to end: the only materialization is the groupby shuffle.
    """
    schema = change_schema or union_change_schema(changes)
    ds = changes.map_batches(
        DecodeValidate(schema, on_error=on_error, quarantine_dir=quarantine_dir),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(PreReduce(), batch_format="pyarrow")
    if base is not None:
        # base rows get the SAME validation as change events: an unvalidated
        # null-ts base row would sort last in every LWW run (nulls-last) and
        # beat every real event — including deletes — forever
        b = base.map_batches(
            lambda t, s=schema: base_as_changes(t, s), batch_format="pyarrow"
        ).map_batches(
            DecodeValidate(schema, on_error=on_error, quarantine_dir=quarantine_dir),
            batch_format="pyarrow",
        )
        ds = ds.union(b)
    ds = ds.map_batches(AddPartitionId(num_partitions, turn_block), batch_format="pyarrow")
    ds = ds.repartition(shuffle_blocks or default_shuffle_blocks())

    def _merge(group: pa.Table) -> pa.Table:
        out = finalize_payload(lww_reduce(group, keep_deletes=False), drop_cols=("lsn", "op"))
        return out if keep_partition_col else out.drop_columns([PARTITION_COL])

    return ds.groupby(PARTITION_COL).map_groups(_merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Committed, resumable replay (COW snapshots + manifests + watermarks)
# ---------------------------------------------------------------------------


def read_table(
    table_root: str,
    columns: list[str] | None = None,
    at_epoch: int | None = None,
) -> ray.data.Dataset:
    """Public view of the committed table: latest snapshots, tombstones
    filtered, payload projected, stable (conv_id, turn_idx) order within
    partitions (each snapshot was written key-sorted).

    ``columns`` prunes AT THE PARQUET READ (plus the internal ``op`` column
    for tombstone filtering) — a 2-column scan of a wide-text table never
    deserializes the text bytes.

    ``at_epoch`` = TIME TRAVEL: read the table as of an older commit (its
    snapshot files are immutable, so any still-unvacuumed epoch is fully
    reconstructible from its commit manifest alone)."""
    if at_epoch is None:
        commit = mf.latest_commit(table_root)
    else:
        commit = next(
            (c for c in mf.list_commits(table_root) if c["epoch"] == at_epoch), None
        )
        if commit is None:
            raise ValueError(f"no commit at epoch {at_epoch} under {table_root}")
    if commit is None:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    files = mf.snapshot_files(table_root, commit)
    if not files:
        return ray.data.from_arrow(pa.table({}))
    schema = (
        strip_metadata(mf.schema_from_b64(commit["schema_b64"]))
        if "schema_b64" in commit
        else None
    )
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(list(columns) + ["op"]))
        if schema is not None:
            # evolved columns may be missing from older snapshot files; only
            # push down the ones guaranteed present everywhere
            base_names = set(CHANGE_SCHEMA.names)
            if not set(read_cols) <= base_names:
                read_cols = None  # fall back: align handles backfill
    ds = ray.data.read_parquet(files, columns=read_cols)

    def _view(t: pa.Table, s: pa.Schema | None = schema) -> pa.Table:
        if read_cols is None and s is not None:
            t = align_to(t, s)  # older snapshots backfill evolved columns as null
        t = t.filter(pc.equal(t.column("op"), "upsert"))
        drop = [c for c in ("lsn", "op") if c in t.column_names]
        t = t.drop_columns(drop)
        if columns is not None:
            t = t.select([c for c in columns if c in t.column_names])
        return t

    return ds.map_batches(_view, batch_format="pyarrow")


def read_turn(table_root: str, conv_id: str, turn_idx: int) -> pa.Table:
    """Point lookup via partition pruning: (conv_id, turn_idx) routes to
    exactly ONE partition (the same salted hash the writer used), so the
    lookup reads a single snapshot file — not the table. This is the payoff
    of deterministic routing; at 10^10 scale it is the difference between a
    file read and a table scan."""
    from ..stages.partition import partition_ids

    commit = mf.latest_commit(table_root)
    if commit is None:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    P = commit.get("num_partitions", len(commit["partitions"]))
    tb = commit.get("turn_block", DEFAULT_TURN_BLOCK)
    pid = int(
        partition_ids(
            pa.array([conv_id]), pa.array([turn_idx], pa.int32()), P, tb
        )[0]
    )
    man = next((m for m in commit["partitions"] if m["partition"] == pid), None)
    if man is None or man["rows"] == 0:
        return transcript_schema_of(CHANGE_SCHEMA).empty_table()
    t = pq.read_table(os.path.join(table_root, man["file"]))
    t = t.filter(
        pc.and_(
            pc.equal(t.column("conv_id"), conv_id),
            pc.equal(t.column("turn_idx"), pa.scalar(turn_idx, pa.int32())),
        )
    )
    t = t.filter(pc.equal(t.column("op"), "upsert"))
    return t.drop_columns(["lsn", "op"])


def read_conversation(table_root: str, conv_id: str) -> pa.Table:
    """All turns of one conversation via partition pruning: the commit's
    per-partition ``max_turn_idx`` bounds the turn space, so candidate
    partitions are {route(conv, tb) for tb ≤ max_turn // turn_block} — a
    handful of files regardless of table size (the conv-level analog of
    read_turn's single-file point lookup).

    Manifests written before ``max_turn_idx`` existed (or carried forward
    unchanged through incremental epochs) lack the field; any such non-empty
    partition makes the turn bound unknowable, so the prune degrades to a
    scan of every non-empty partition rather than silently dropping
    high-turn rows (round-2 advice: defaulting the bound to -1 returned an
    empty conversation for fully-legacy tables)."""
    from ..stages.partition import partition_ids

    commit = mf.latest_commit(table_root)
    if commit is None:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    P = commit.get("num_partitions", len(commit["partitions"]))
    tb = commit.get("turn_block", DEFAULT_TURN_BLOCK)
    live = [m for m in commit["partitions"] if m["rows"] > 0]
    if any("max_turn_idx" not in m for m in live):
        pids = {m["partition"] for m in live}  # legacy manifests: no prune
    else:
        max_turn = max((m["max_turn_idx"] for m in live), default=-1)
        if max_turn < 0:
            return transcript_schema_of(CHANGE_SCHEMA).empty_table()
        blocks = np.arange(0, max_turn // tb + 1, dtype=np.int32)
        pids = set(
            partition_ids(
                pa.array([conv_id] * len(blocks)),
                pa.array(blocks * tb, pa.int32()),  # representative turn per block
                P,
                tb,
            ).tolist()
        )
    tables = []
    for m in commit["partitions"]:
        if m["partition"] in pids and m["rows"] > 0:
            t = pq.read_table(os.path.join(table_root, m["file"]))
            t = t.filter(pc.equal(t.column("conv_id"), conv_id))
            tables.append(t)
    if not tables:
        return transcript_schema_of(CHANGE_SCHEMA).empty_table()
    out = pa.concat_tables(tables, promote_options="default")
    out = out.filter(pc.equal(out.column("op"), "upsert"))
    out = out.drop_columns([c for c in ("lsn", "op") if c in out.column_names])
    if len(out):
        out = out.take(pc.sort_indices(out, sort_keys=[("turn_idx", "ascending")]))
    return out


def table_stats(table_root: str) -> dict[str, Any]:
    """Operator-facing rollup of the latest commit + lineage."""
    commit = mf.latest_commit(table_root)
    if commit is None:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    parts = commit["partitions"]
    return {
        "epoch": commit["epoch"],
        "watermark": commit["watermark"],
        "num_partitions": commit.get("num_partitions", len(parts)),
        "live_rows": sum(m.get("live_rows", m["rows"]) for m in parts),
        "tombstones": sum(m.get("tombstones", 0) for m in parts),
        "snapshot_files": sum(1 for m in parts if m["rows"] > 0),
        "epochs_committed": len(mf.list_commits(table_root)),
    }


def _last_change_epoch(commit: dict[str, Any] | None) -> int:
    """Index of the newest CHANGE epoch applied to the table.

    Compactions advance the snapshot/commit epoch counter but apply no change
    events, so checkpoint resume must compare against the last *change* epoch
    — comparing against the raw commit epoch would silently skip every change
    epoch whose index <= a compaction's commit number (data loss)."""
    if commit is None:
        return -1
    if "last_change_epoch" in commit:
        return int(commit["last_change_epoch"])
    return int(commit["epoch"])  # legacy commit predating the field


def replay_commit(
    table_root: str,
    epoch_files: list[list[str]],
    *,
    base_files: list[str] | None = None,
    num_partitions: int = 64,
    turn_block: int = DEFAULT_TURN_BLOCK,
    on_error: str = "raise",
    quarantine_dir: str | None = None,
    first_change_epoch: int = 0,
    spill_merge_rows: int | None = None,
    spill_merge_chunk_rows: int | None = None,
    progress: Any = None,
) -> list[dict[str, Any]]:
    """Apply change epochs to the committed table at ``table_root``.

    ``progress``: optional callable invoked ONCE PER COMMITTED EPOCH with a
    metrics dict (change_epoch, commit_epoch, partitions_written,
    num_partitions, events_applied, delete_events, live_rows, secs,
    events_per_sec, watermark) — the incremental progress surface
    (reference transfer.rs:121-134 estimated-rows/progress parity), built
    entirely from the manifest rows the merge already returns.

    ``spill_merge_rows`` / ``spill_merge_chunk_rows`` override the
    SPILL_MERGE_* defaults (prior-snapshot row count above which a merge
    task streams instead of concat+sort — see _sorted_run_merge_chunks).

    ``first_change_epoch``: global change-epoch index of ``epoch_files[0]``
    — lets incremental callers (the tail loop) submit only NEW epochs
    instead of padding the already-applied prefix.

    ``epoch_files[e]`` = parquet files of CHANGE epoch e (global change-epoch
    numbering — the checkpoint resumes by SKIPPING change epochs already
    applied, tracked as ``last_change_epoch`` in each commit so intervening
    compactions — which advance the commit/snapshot epoch counter but apply
    no events — never cause a change epoch to be skipped; inside an epoch
    re-application is idempotent: snapshots rewrite identically and events
    with lsn <= the partition watermark are filtered).

    ``base_files``: optional initial transcript table (the "table before the
    binlog tail started"). Applied only when bootstrapping (no prior commit):
    its rows enter epoch 0's merge as lsn=-1 upserts, so any real change
    event beats them on (ts, lsn) exactly like merging against live state.

    Per epoch:
      1. evolved schema = union(current table schema, epoch schema)
      2. decode + watermark filter + combiner + salted partition routing
      3. SHUFFLE THE CHANGES ONLY — each per-partition merge task loads its
         own partition's prior snapshot from disk inside the task (no
         whole-table re-shuffle per epoch; untouched partitions are never
         even read, their manifests carry forward). This requires the
         partitioner (num_partitions, turn_block) to be FIXED per table —
         both are recorded in the commit and reused on later epochs.
      4. the merge task writes `parts/part-K/epoch-E.parquet` atomically and
         returns a manifest row (per-partition lineage+metrics)
      5. driver publishes the epoch commit (atomic rename) — exactly-once

    Returns the list of commit records (one per newly applied epoch).

    SIZING (the one capacity rule): a merge task holds one partition's live
    state + its epoch changes in memory (~2-3x the snapshot bytes during
    sort). Pick ``num_partitions`` so snapshot_bytes ≈ total_live_bytes / P
    fits a worker's heap with headroom — e.g. 10^10 events x ~200 B ≈ 2 TB
    live → P = 4096 gives ~500 MB partitions, comfortably inside an 8 GB
    worker. P is pinned at table creation; re-partitioning = compact into a
    new table root with a different P.
    """
    smr = SPILL_MERGE_ROWS if spill_merge_rows is None else spill_merge_rows
    smc = (
        SPILL_MERGE_CHUNK_ROWS if spill_merge_chunk_rows is None else spill_merge_chunk_rows
    )
    commits: list[dict[str, Any]] = []
    for change_epoch, files in enumerate(epoch_files, start=first_change_epoch):
        prev = mf.latest_commit(table_root)
        if _last_change_epoch(prev) >= change_epoch:
            continue  # checkpoint resume: change epoch already applied
        # commit/snapshot numbering is independent of change-epoch indices
        # (compactions consume commit epochs too)
        commit_ep = prev["epoch"] + 1 if prev is not None else change_epoch
        t0 = time.perf_counter()
        if prev is not None:
            # the partitioner is a table property once the first epoch commits
            num_partitions = prev.get("num_partitions", num_partitions)
            turn_block = prev.get("turn_block", turn_block)
        changes = ray.data.read_parquet(files)
        extra: list[pa.Schema] = []
        prev_files: list[str] = []
        if prev is not None:
            prev_files = mf.snapshot_files(table_root, prev)
            if "schema_b64" in prev:
                extra.append(mf.schema_from_b64(prev["schema_b64"]))
            elif prev_files:
                extra.append(pq.read_schema(prev_files[0]))
        bootstrap_base = base_files if prev is None else None
        if bootstrap_base:
            for bf in bootstrap_base:
                s = pq.read_schema(bf)
                extra.append(
                    pa.schema([f for f in s if f.name not in ("lsn", "op")])
                )
        schema = file_union_schema(files, extra)
        wm = mf.partition_watermarks(prev)
        # pid → (prior snapshot path, rows), resolved driver-side (tiny),
        # read inside each merge task; rows gate the spill-safe merge
        prior_snapshots: dict[int, tuple[str, int]] = (
            {
                m["partition"]: (os.path.join(table_root, m["file"]), m["rows"])
                for m in prev["partitions"]
                if m["rows"] > 0
            }
            if prev is not None
            else {}
        )

        ds = changes.map_batches(
            DecodeValidate(schema, on_error=on_error, quarantine_dir=quarantine_dir),
            batch_format="pyarrow",
        )
        if wm:
            min_wm = min(wm.values())
            ds = ds.map_batches(
                lambda t, w=min_wm: t.filter(pc.greater(t.column("lsn"), w)),
                batch_format="pyarrow",
            )
        ds = ds.map_batches(PreReduce(), batch_format="pyarrow")
        if bootstrap_base:
            # same validation as change events (see replay): null-ts /
            # negative-turn base rows must not slip past the merge invariants
            b = (
                ray.data.read_parquet(bootstrap_base)
                .map_batches(
                    lambda t, s=schema: base_as_changes(t, s), batch_format="pyarrow"
                )
                .map_batches(
                    DecodeValidate(
                        schema, on_error=on_error, quarantine_dir=quarantine_dir
                    ),
                    batch_format="pyarrow",
                )
            )
            ds = ds.union(b)
        ds = ds.map_batches(AddPartitionId(num_partitions, turn_block), batch_format="pyarrow")
        if wm:
            # Per-partition watermark prune (beyond the global-min filter
            # above): partitions ahead of the min would otherwise re-merge
            # already-applied events — correct under LWW idempotence, but
            # wasted merge work. Vectorized gather against a tiny pid-indexed
            # watermark array.
            wm_arr = np.full(num_partitions, -1, dtype=np.int64)
            for p, w in wm.items():
                wm_arr[int(p)] = w

            def _prune(t: pa.Table, w: np.ndarray = wm_arr) -> pa.Table:
                pids = t.column(PARTITION_COL).to_numpy()
                keep = t.column("lsn").to_numpy() > w[pids]
                return t.filter(pa.array(keep))

            ds = ds.map_batches(_prune, batch_format="pyarrow")
        ds = ds.repartition(default_shuffle_blocks())

        def _merge_write(
            group: pa.Table,
            root: str = table_root,
            ep: int = commit_ep,
            priors: dict[int, tuple[str, int]] = prior_snapshots,
            sch: pa.Schema = schema,
            _smr: int = smr,
            _smc: int = smc,
        ) -> pa.Table:
            pid = int(group.column(PARTITION_COL)[0].as_py())
            t = group.drop_columns([PARTITION_COL])
            n_events = len(t)  # group rows are this epoch's (pre-reduced) changes
            n_deletes = pc.sum(
                pc.cast(pc.equal(t.column("op"), "delete"), pa.int64())
            ).as_py() or 0
            prior = priors.get(pid)
            if prior is not None and prior[1] > _smr:
                # spill-safe path: external sorted-run merge, one chunk +
                # the epoch delta in memory at a time
                man = mf.write_snapshot_chunks(
                    root,
                    pid,
                    ep,
                    _sorted_run_merge_chunks(prior[0], t, sch, _smc),
                    sch,
                )
            else:
                if prior is not None:
                    state = align_to(pq.read_table(prior[0]), sch)
                    t = pa.concat_tables([t, state])
                merged = lww_reduce(t, keep_deletes=True)
                merged = finalize_payload(merged, drop_cols=())
                man = mf.write_snapshot(root, pid, ep, merged)
            # per-epoch lineage metrics (not just snapshot totals)
            man["events_applied"] = int(n_events)
            man["delete_events"] = int(n_deletes)
            return pa.table({k: [man[k]] for k in man})

        man_rows = ds.groupby(PARTITION_COL).map_groups(_merge_write, batch_format="pyarrow")
        manifests = man_rows.take_all()  # tiny: one row per partition
        # partitions with no events this epoch keep their prior snapshot by
        # carrying the old manifest forward (no rewrite)
        seen = {m["partition"] for m in manifests}
        if prev is not None:
            for m in prev["partitions"]:
                if m["partition"] not in seen:
                    m = dict(m)
                    m["events_applied"] = 0  # untouched this epoch
                    m["delete_events"] = 0
                    manifests.append(m)
        stats = {
            "epoch_secs": round(time.perf_counter() - t0, 3),
            "partitions_written": len(seen),
        }
        commits.append(
            mf.commit_epoch(
                table_root,
                commit_ep,
                manifests,
                stats,
                schema=schema,
                extra={
                    "num_partitions": num_partitions,
                    "turn_block": turn_block,
                    "last_change_epoch": change_epoch,
                },
                # optimistic concurrency: abort if another writer committed
                # between our state read and this publish
                expected_prev_epoch=prev["epoch"] if prev is not None else -1,
            )
        )
        if progress is not None:
            secs = stats["epoch_secs"]
            ev = sum(int(m.get("events_applied", 0)) for m in manifests)
            progress(
                {
                    "change_epoch": change_epoch,
                    "commit_epoch": commit_ep,
                    "partitions_written": len(seen),
                    "num_partitions": num_partitions,
                    "events_applied": ev,
                    "delete_events": sum(
                        int(m.get("delete_events", 0)) for m in manifests
                    ),
                    # carried-forward rows from a legacy commit may predate
                    # the live_rows field (same fallback as table_stats)
                    "live_rows": sum(
                        int(m.get("live_rows", m["rows"])) for m in manifests
                    ),
                    "secs": secs,
                    "events_per_sec": int(ev / max(secs, 1e-9)),
                    "watermark": commits[-1]["watermark"],
                }
            )
    return commits


def compact(table_root: str, drop_tombstones: bool = True) -> dict[str, Any]:
    """Compaction / tombstone GC: rewrite every partition's snapshot keeping
    only current winners (optionally dropping delete tombstones), committed
    as a new epoch.

    Trade-off documented for operators: dropping tombstones makes the table
    smaller but means a LATER-arriving event with ts older than a dropped
    delete would resurrect the key — only safe once the change stream is
    known to have advanced past the tombstone's ts (a retention window, like
    Kafka compacted-topic or Delta VACUUM semantics). Per-partition rewrite
    tasks run distributed; the commit is the same atomic manifest publish.
    """
    prev = mf.latest_commit(table_root)
    if prev is None:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    epoch = prev["epoch"] + 1
    schema = mf.schema_from_b64(prev["schema_b64"]) if "schema_b64" in prev else None
    live_parts = [m for m in prev["partitions"] if m["rows"] > 0]
    if not live_parts:
        return prev
    # the PINNED partitioner carries forward in the commit record
    num_partitions = prev.get("num_partitions", len(prev["partitions"]))
    turn_block = prev.get("turn_block", DEFAULT_TURN_BLOCK)

    prior_wm = mf.partition_watermarks(prev)

    # Snapshots are ALREADY partitioned and key-sorted: compaction is a
    # per-partition streaming rewrite — read own snapshot in row-group
    # chunks, align/filter, append to the new snapshot — with NO shuffle.
    # (Round 2 routed every row through the groupby exchange only to land
    # in the partition it came from — an all-to-all that at 100 TB moves
    # the entire table for nothing; it also held each partition's table in
    # one task's memory, which write_snapshot_chunks avoids.)
    def _rewrite_parts(
        batch,
        root: str = table_root,
        ep: int = epoch,
        sch: pa.Schema = schema,
        pw: dict[int, int] = prior_wm,
        drop: bool = drop_tombstones,
    ) -> pa.Table:
        rows = []
        for m in batch.to_pylist():
            path = os.path.join(root, m["file"])
            out_schema = sch if sch is not None else pq.read_schema(path)

            def chunks():
                pf = pq.ParquetFile(path)
                for rb in pf.iter_batches(batch_size=SPILL_MERGE_CHUNK_ROWS):
                    t = pa.Table.from_batches([rb])
                    if sch is not None:
                        t = align_to(t, sch)
                    if drop:
                        t = t.filter(pc.equal(t.column("op"), "upsert"))
                    yield t  # filter preserves the snapshot's key order

            man = mf.write_snapshot_chunks(root, m["partition"], ep, chunks(), out_schema)
            # carry the prior watermark forward: if this partition's max-lsn
            # winner was a dropped tombstone, recomputing from survivors
            # would REGRESS the watermark and weaken the replay lsn filter /
            # changes_since semantics
            man["lsn_watermark"] = max(
                int(man["lsn_watermark"]), int(pw.get(m["partition"], -1))
            )
            if man["rows"] == 0:
                # every row was a dropped tombstone: don't reference the
                # 0-row file (fsck/vacuum treat rows>0 as 'live'; a
                # referenced-but-filtered-out file would read as an orphan)
                # — use the same explicitly-empty row the carry-forward
                # path below emits for untouched empty partitions
                try:
                    os.remove(os.path.join(root, man["file"]))
                except OSError:
                    pass
                man["file"] = ""
                man["content_hash"] = ""
                man.pop("fp_scheme", None)
            rows.append(man)
        return pa.Table.from_pylist(rows)

    manifests = (
        ray.data.from_items(live_parts)
        .map_batches(_rewrite_parts, batch_size=1, batch_format="pyarrow")
        .take_all()
    )
    # partitions with no LIVE rows after compaction become explicitly empty
    # (carrying the old manifest forward would re-reference dropped
    # tombstones); their lsn watermark is preserved so it never regresses
    seen = {m["partition"] for m in manifests}
    for m in prev["partitions"]:
        if m["partition"] not in seen:
            manifests.append(
                {
                    "partition": m["partition"],
                    "epoch": epoch,
                    "file": "",
                    "rows": 0,
                    "tombstones": 0,
                    "live_rows": 0,
                    "lsn_watermark": m["lsn_watermark"],
                    "content_hash": "",
                    "live_hash": "",
                }
            )
    stats = {"compaction": True, "dropped_tombstones": drop_tombstones}
    return mf.commit_epoch(
        table_root,
        epoch,
        manifests,
        stats,
        schema=schema,
        extra={
            "num_partitions": num_partitions,
            "turn_block": turn_block,
            # a compaction applies no change events: resume bookkeeping
            # carries the last CHANGE epoch forward unchanged
            "last_change_epoch": _last_change_epoch(prev),
        },
        expected_prev_epoch=prev["epoch"],
    )


def repartition_table(
    src_root: str,
    dst_root: str,
    num_partitions: int,
    turn_block: int = DEFAULT_TURN_BLOCK,
) -> dict[str, Any]:
    """Migrate a committed table to a NEW pinned partitioner.

    The partitioner (num_partitions, turn_block) is a table property — this
    is the documented "re-partitioning = compact into a new table root with
    a different P" operation made real. Latest snapshots stream through the
    new router (tombstones and lsn/op INCLUDED, so LWW semantics survive:
    a late, older-ts upsert still loses to a migrated delete) and commit as
    epoch 0 of the new root.

    Watermark carry-forward: epochs apply in lsn order, so every event with
    lsn ≤ the source's GLOBAL watermark has been applied; each new
    partition's watermark is floored there (recomputing from winner rows
    alone could under-state the stream position — winners don't retain
    every applied lsn — causing harmless-but-wasteful re-merges on resume).
    ``last_change_epoch`` carries forward so checkpoint resume against the
    same change stream continues exactly where the source stopped."""
    prev = mf.latest_commit(src_root)
    if prev is None:
        raise FileNotFoundError(f"no committed epoch under {src_root}")
    if mf.latest_commit(dst_root) is not None:
        raise FileExistsError(f"{dst_root} already has commits")
    schema = mf.schema_from_b64(prev["schema_b64"]) if "schema_b64" in prev else None
    files = mf.snapshot_files(src_root, prev)
    wm_floor = int(prev["watermark"])

    ds = ray.data.read_parquet(files) if files else None
    manifests: list[dict[str, Any]] = []
    if ds is not None:
        if schema is not None:
            ds = ds.map_batches(
                lambda t, s=schema: align_to(t, s), batch_format="pyarrow"
            )
        ds = ds.map_batches(
            AddPartitionId(num_partitions, turn_block), batch_format="pyarrow"
        )

        # Memory note: groupby().map_groups hands each DESTINATION partition
        # to its task as one in-memory table — the migration's peak heap is
        # one destination partition (same P-sizing rule as the replay
        # merge's in-memory path). The chunked writer below removes the
        # SECOND whole-partition buffer (pq.write_table's) by streaming
        # row groups; a partition that cannot fit a worker's heap at all
        # must be migrated in two hops (src → intermediate larger P → dst)
        # since Ray's group shuffle has no spill-to-disk group iterator.
        chunk_rows = SPILL_MERGE_CHUNK_ROWS

        def _write(
            group: pa.Table,
            root: str = dst_root,
            floor: int = wm_floor,
        ) -> pa.Table:
            pid = int(group.column(PARTITION_COL)[0].as_py())
            t = finalize_payload(
                group.drop_columns([PARTITION_COL]), drop_cols=()
            )
            man = mf.write_snapshot_chunks(
                root,
                pid,
                0,
                (t.slice(o, chunk_rows) for o in range(0, max(len(t), 1), chunk_rows)),
                t.schema,
            )
            man["lsn_watermark"] = max(int(man["lsn_watermark"]), floor)
            return pa.table({k: [man[k]] for k in man})

        manifests = (
            ds.repartition(default_shuffle_blocks())
            .groupby(PARTITION_COL)
            .map_groups(_write, batch_format="pyarrow")
            .take_all()
        )
    seen = {m["partition"] for m in manifests}
    for pid in range(num_partitions):
        if pid not in seen:
            manifests.append(
                {
                    "partition": pid,
                    "epoch": 0,
                    "file": "",
                    "rows": 0,
                    "tombstones": 0,
                    "live_rows": 0,
                    "lsn_watermark": wm_floor,
                    "content_hash": "",
                    "live_hash": "",
                }
            )
    return mf.commit_epoch(
        dst_root,
        0,
        manifests,
        {"repartitioned_from": src_root, "src_epoch": prev["epoch"]},
        schema=schema,
        extra={
            "num_partitions": num_partitions,
            "turn_block": turn_block,
            "last_change_epoch": _last_change_epoch(prev),
        },
        expected_prev_epoch=-1,
    )


def _snapshot_file_epoch(fname: str) -> int | None:
    """Epoch encoded in a snapshot filename (``epoch-NNNNNN[-fp].parquet``),
    or None if the name doesn't follow the writers' convention."""
    if not (fname.startswith("epoch-") and fname.endswith(".parquet")):
        return None
    core = fname[len("epoch-") : -len(".parquet")]
    num = core.split("-", 1)[0]
    return int(num) if num.isdigit() else None


def vacuum(table_root: str, keep_last: int = 2) -> dict[str, Any]:
    """Snapshot GC (Delta-VACUUM analog): delete partition snapshot files
    referenced ONLY by commits older than the newest ``keep_last`` — those
    epochs stop being time-travel targets; commit JSONs are kept as lineage
    metadata. Safe against concurrent readers of retained epochs because
    snapshots are immutable and deletion only touches unreferenced files."""
    commits = mf.list_commits(table_root)
    if not commits:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    keep = commits[-keep_last:] if keep_last > 0 else commits[-1:]
    referenced = {
        os.path.abspath(os.path.join(table_root, m["file"]))
        for c in keep
        for m in c["partitions"]
        if m["rows"] > 0
    }
    latest_epoch = int(commits[-1]["epoch"])
    deleted = 0
    parts_dir = os.path.join(table_root, mf.PARTS_DIR)
    for dirpath, _dirs, files in os.walk(parts_dir):
        for f in files:
            if f.startswith(".tmp-"):
                # a live writer's in-flight atomic write: deleting it fails
                # that writer's publish rename (same exemption fsck makes)
                continue
            if not f.endswith(".parquet"):
                continue
            p = os.path.abspath(os.path.join(dirpath, f))
            if p in referenced:
                continue
            ep = _snapshot_file_epoch(f)
            if ep is not None and ep > latest_epoch:
                # completed snapshot of a writer racing toward the NEXT
                # commit — unreferenced only because its commit hasn't
                # published yet; a later vacuum (after more commits) will
                # collect it if that writer lost or died
                continue
            os.remove(p)
            deleted += 1
    return {
        "deleted_files": deleted,
        "retained_epochs": [c["epoch"] for c in keep],
        "retained_files": len(referenced),
    }


def tail(
    table_root: str,
    watch_dir: str,
    *,
    num_partitions: int = 64,
    turn_block: int = DEFAULT_TURN_BLOCK,
    poll_secs: float = 1.0,
    max_idle_polls: int | None = None,
    on_error: str = "raise",
) -> list[dict[str, Any]]:
    """WAL/binlog TAIL loop: watch ``watch_dir`` for new change files
    (lexicographic order = epoch order, the convention log shippers follow)
    and apply each unseen file as the next change epoch.

    Applied files are tracked by (name, size, mtime_ns) FINGERPRINT in an
    atomically-updated sidecar (``_commits/TAIL_STATE``), not by count: a
    shipper may prune files the tailer already applied, a late file may
    sort before an applied one, and a pruned NAME may even be reused for
    new content — a count-based cursor would silently stall or skip in all
    three cases. State entries for names no longer present in the watch
    dir are retired, bounding the sidecar to the directory size. The state
    update lands AFTER the commit, so a crash between the two re-applies
    one epoch — a no-op under LWW idempotence.

    ``max_idle_polls`` bounds the loop for tests/batch drains (None = run
    until interrupted). Returns the commits applied."""
    import json

    state_path = os.path.join(table_root, mf.COMMITS_DIR, "TAIL_STATE")

    def fingerprint(path: str) -> list:
        st = os.stat(path)
        return [st.st_size, st.st_mtime_ns]

    def load_state() -> dict[str, list]:
        if not os.path.exists(state_path):
            return {}
        with open(state_path) as f:
            return json.load(f)["applied"]

    def save_state(state: dict[str, list]) -> None:
        mf._atomic_write_bytes(
            state_path, json.dumps({"applied": state}).encode()
        )

    applied: list[dict[str, Any]] = []
    idle = 0
    while True:
        seen = load_state()
        files = sorted(
            f for f in os.listdir(watch_dir) if f.endswith(".parquet")
        )
        # retire entries for pruned files (keeps the state bounded; a reused
        # name will mismatch on fingerprint and be re-processed anyway)
        seen = {k: v for k, v in seen.items() if k in set(files)}
        # fingerprint ONCE, before the apply: these pre-apply stats are what
        # get persisted as 'applied'. Re-statting after replay_commit would
        # mark a file a shipper rewrote DURING the apply as done without its
        # new content ever being applied; with the pre-apply stat, a
        # mid-apply rewrite mismatches on the next poll and re-applies
        # (a no-op for the already-merged rows under LWW idempotence).
        stats_now = {f: fingerprint(os.path.join(watch_dir, f)) for f in files}
        new = [f for f in files if seen.get(f) != stats_now[f]]
        if new:
            idle = 0
            # ALL currently-unseen files apply as ONE change epoch (they are
            # already lsn-ordered, and LWW merges an epoch's files together
            # anyway): a burst of shipper files pays one commit + manifest
            # round trip instead of one per file. Fingerprints stay
            # per-file; a crash between commit and state save re-applies the
            # whole batch — a no-op under LWW idempotence.
            base_epoch = _last_change_epoch(mf.latest_commit(table_root)) + 1
            batch = [os.path.join(watch_dir, f) for f in new]
            try:
                commits = replay_commit(
                    table_root,
                    [batch],
                    num_partitions=num_partitions,
                    turn_block=turn_block,
                    on_error=on_error,
                    first_change_epoch=base_epoch,
                )
            except mf.ConcurrentCommitError:
                # another writer (a compactor, a restore) published between
                # this tailer's state read and its publish. Fingerprints were
                # NOT saved, so re-entering the loop re-reads table state,
                # recomputes the epoch cursor, and re-applies the same batch
                # — a long-running tailer must outlive commit races, not die
                continue
            applied.extend(commits)
            for f in new:
                seen[f] = stats_now[f]
            save_state(seen)
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return applied
            time.sleep(poll_secs)


def changes_since(table_root: str, after_epoch: int) -> ray.data.Dataset:
    """Incremental CDC-out: the change rows committed AFTER ``after_epoch``.

    Reads only the latest snapshots and keeps rows whose lsn is above the
    older commit's watermark — the per-key winners that changed since then,
    including delete tombstones (op retained so consumers can propagate
    deletes)."""
    commits = mf.list_commits(table_root)
    older = [c for c in commits if c["epoch"] == after_epoch]
    newer = [c for c in commits if c["epoch"] > after_epoch]
    if not older or not newer:
        raise ValueError(f"need commits on both sides of epoch {after_epoch}")
    wm = older[0]["watermark"]
    latest = newer[-1]
    # MANIFEST-LEVEL partition prune: a partition whose current
    # lsn_watermark never passed the older commit's watermark cannot hold a
    # row with lsn > wm, so its snapshot is never opened — an incremental
    # consumer of a 10^10-row table reads only the partitions that actually
    # changed, not the table
    touched = [
        m
        for m in latest["partitions"]
        if m["rows"] > 0 and m["lsn_watermark"] > wm
    ]
    if not touched:
        sch = (
            mf.schema_from_b64(latest["schema_b64"])
            if "schema_b64" in latest
            else CHANGE_SCHEMA
        )
        return ray.data.from_arrow(sch.empty_table())
    # single path-join point: snapshot_files owns manifest→path resolution
    files = mf.snapshot_files(table_root, {"partitions": touched})
    ds = ray.data.read_parquet(files)
    if "schema_b64" in latest:
        s = mf.schema_from_b64(latest["schema_b64"])
        ds = ds.map_batches(lambda t, sc=s: align_to(t, sc), batch_format="pyarrow")
    return ds.map_batches(
        lambda t, w=wm: t.filter(pc.greater(t.column("lsn"), w)),
        batch_format="pyarrow",
    )


def restore(table_root: str, to_epoch: int) -> dict[str, Any]:
    """Roll the table back to an older commit by publishing a NEW commit
    that re-references the target epoch's snapshot files (the Delta-RESTORE
    analog; the reference engine has no lineage at all — every TinyETL run
    overwrites its target, /root/reference/src/transfer.rs:22-118).

    Metadata-only and O(#partitions): snapshots are immutable, so nothing is
    read or rewritten at any table size. History is preserved — the rolled-
    back commits remain as lineage (a later vacuum can GC their files), and
    the restore itself is a commit, so it is OCC-guarded, time-travelable
    and restorable again. Watermarks and last_change_epoch revert with the
    manifest rows, so a subsequent replay_commit resume re-applies exactly
    the change epochs that came after the restored state.

    Raises FileNotFoundError if any snapshot the target epoch needs was
    already vacuumed, and ValueError for an unknown epoch."""
    commits = mf.list_commits(table_root)
    if not commits:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    target = next((c for c in commits if c["epoch"] == to_epoch), None)
    if target is None:
        raise ValueError(f"no commit at epoch {to_epoch} under {table_root}")
    cur = commits[-1]
    if cur["epoch"] == to_epoch:
        return cur  # already there: no-op, publish nothing
    missing = [
        m["file"]
        for m in target["partitions"]
        if m["rows"] > 0 and not os.path.exists(os.path.join(table_root, m["file"]))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore {table_root} to epoch {to_epoch}: "
            f"{len(missing)} snapshot file(s) vacuumed, e.g. {missing[0]}"
        )
    extra = {
        k: target[k]
        for k in ("num_partitions", "turn_block", "last_change_epoch")
        if k in target
    }
    extra["restored_from_epoch"] = int(to_epoch)
    return mf.commit_epoch(
        table_root,
        cur["epoch"] + 1,
        [dict(m) for m in target["partitions"]],
        stats={"restored_from_epoch": int(to_epoch)},
        schema=mf.schema_from_b64(target["schema_b64"])
        if "schema_b64" in target
        else None,
        extra=extra,
        expected_prev_epoch=cur["epoch"],
    )


def clone_table(
    src_root: str, dst_root: str, at_epoch: int | None = None
) -> dict[str, Any]:
    """Zero-copy clone of a committed table (Delta SHALLOW-CLONE analog,
    but self-contained): hardlink the chosen commit's immutable snapshot
    files into ``dst_root`` and publish them as the clone's epoch 0.

    O(#partitions) metadata + link syscalls — no data bytes move on the
    same filesystem (falls back to a file copy across devices). The clone
    is fully independent afterwards: commits, compaction and vacuum on
    either side never change the other's visible state (vacuum merely
    unlinks one name of a shared inode; the bytes live until the last
    reference drops). ``at_epoch`` clones a TIME-TRAVEL state instead of
    the latest commit."""
    import shutil

    if mf.latest_commit(dst_root) is not None:
        raise FileExistsError(f"{dst_root} already holds a committed table")
    if at_epoch is None:
        commit = mf.latest_commit(src_root)
        if commit is None:
            raise FileNotFoundError(f"no committed epoch under {src_root}")
    else:
        commit = next(
            (c for c in mf.list_commits(src_root) if c["epoch"] == at_epoch), None
        )
        if commit is None:
            raise ValueError(f"no commit at epoch {at_epoch} under {src_root}")
    manifests = []
    for m in commit["partitions"]:
        d = dict(m)
        d["epoch"] = 0
        if m["rows"] > 0:
            src_p = os.path.join(src_root, m["file"])
            dst_p = mf.snapshot_path(
                dst_root, int(m["partition"]), 0, m["content_hash"]
            )
            os.makedirs(os.path.dirname(dst_p), exist_ok=True)
            try:
                os.link(src_p, dst_p)
            except FileExistsError:
                pass  # idempotent retry: the immutable link already exists
            except OSError:
                shutil.copy2(src_p, dst_p)  # cross-device fallback
            d["file"] = os.path.relpath(dst_p, dst_root)
        manifests.append(d)
    extra = {
        k: commit[k]
        for k in ("num_partitions", "turn_block", "last_change_epoch")
        if k in commit
    }
    extra["cloned_from"] = {
        "root": os.path.abspath(src_root),
        "epoch": int(commit["epoch"]),
    }
    return mf.commit_epoch(
        dst_root,
        0,
        manifests,
        stats={"cloned_from_epoch": int(commit["epoch"])},
        schema=mf.schema_from_b64(commit["schema_b64"])
        if "schema_b64" in commit
        else None,
        extra=extra,
        expected_prev_epoch=-1,
    )


def fsck(table_root: str, all_epochs: bool = False) -> dict[str, Any]:
    """Distributed integrity audit (read-only): recompute every referenced
    snapshot's content fingerprint and compare to its manifest entry.

    Reports
      - ``missing``  — manifest references a file that does not exist
      - ``corrupt``  — recomputed fingerprint differs (bit rot, torn write,
        or out-of-band mutation of an "immutable" snapshot)
      - ``orphans``  — parquet files under parts/ that NO commit references
        (debris from a writer that died before its commit published; safe
        to delete, and vacuum-style GC never sees them because it walks
        manifests of retained commits)
      - ``legacy_unverified`` — referenced snapshots whose manifest rows
        were written under an older fingerprint scheme (no ``fp_scheme`` or
        a different version): existence-checked only, never recomputed —
        a formula change must not report intact pre-upgrade data corrupt

    Verification fans out one Ray task batch per snapshot and STREAMS each
    file row-group-wise through the same chunking-invariant ALL-COLUMNS
    fingerprint the writers used (round-4 advice: payload columns are
    covered, so role/text/tool/ts bit rot fails the audit too) — a 100 TB
    audit never holds a partition in one heap. Checks the latest commit by
    default; ``all_epochs`` audits every still-materialized epoch (skipping
    vacuumed files, which are expected to be gone). Base-table and derived
    view snapshots share one recompute path since _Fingerprint makes no
    column-set assumption.

    Orphan deletion is only safe when NO writer is concurrently active: a
    mid-commit writer's published-but-not-yet-referenced snapshot looks
    identical to debris (its commit publish is the step that references
    it). ``.tmp-*`` scratch files of in-flight atomic writes are therefore
    never reported."""
    commits = mf.list_commits(table_root)
    if not commits:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    chosen = commits if all_epochs else commits[-1:]
    latest_epoch = commits[-1]["epoch"]

    # (file, expected_hash) for every referenced live snapshot; dedup —
    # carried-forward manifests reference the same file across epochs.
    # Rows written under an OLDER fingerprint scheme (manifest.FP_SCHEME
    # records the formula version) cannot be recomputed-and-compared by
    # this build: they are reported "legacy_unverified", never falsely
    # "corrupt" (existence is still checked).
    ref: dict[str, str] = {}
    missing: list[str] = []
    legacy: list[str] = []
    for c in chosen:
        for m in c["partitions"]:
            if m["rows"] <= 0:
                continue
            f = m["file"]
            p = os.path.join(table_root, f)
            if not os.path.exists(p):
                # vacuumed files in old epochs are expected; in the LATEST
                # commit a missing file is table-breaking
                if c["epoch"] == latest_epoch:
                    missing.append(f)
                continue
            if m.get("fp_scheme") != mf.FP_SCHEME:
                if f not in legacy:
                    legacy.append(f)
                continue
            ref.setdefault(f, m["content_hash"])

    def _check(batch: pa.Table, root: str = table_root) -> pa.Table:
        out_f, out_ok, out_got = [], [], []
        for row in batch.to_pylist():
            path = os.path.join(root, row["file"])
            pf = pq.ParquetFile(path)
            fp = mf._Fingerprint()
            for rb in pf.iter_batches(batch_size=1 << 20):
                fp.update(pa.Table.from_batches([rb]))
            got = fp.hexdigest()
            out_f.append(row["file"])
            out_ok.append(got == row["expect"])
            out_got.append(got)
        return pa.table({"file": out_f, "ok": out_ok, "got": out_got})

    corrupt: list[str] = []
    if ref:
        items = [{"file": f, "expect": h} for f, h in sorted(ref.items())]
        ds = ray.data.from_items(items, override_num_blocks=len(items))
        for t in ds.map_batches(_check, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for row in t.to_pylist():
                if not row["ok"]:
                    corrupt.append(row["file"])

    all_ref = {
        os.path.abspath(os.path.join(table_root, m["file"]))
        for c in commits
        for m in c["partitions"]
        if m["rows"] > 0
    }
    orphans: list[str] = []
    parts_dir = os.path.join(table_root, mf.PARTS_DIR)
    for dirpath, _dirs, fnames in os.walk(parts_dir):
        for f in fnames:
            if f.startswith(".tmp-"):
                continue  # in-flight atomic write of a live writer
            p = os.path.abspath(os.path.join(dirpath, f))
            if p.endswith(".parquet") and p not in all_ref:
                orphans.append(os.path.relpath(p, table_root))
    return {
        "ok": not (missing or corrupt),
        "checked": len(ref),
        "epochs_audited": [c["epoch"] for c in chosen],
        "missing": sorted(missing),
        "corrupt": sorted(corrupt),
        "legacy_unverified": sorted(legacy),
        "orphans": sorted(orphans),
    }


def _render_line_rows(t: pa.Table, P: int) -> pa.Table:
    """Shared exporter map stage: pre-render each turn's ``role: text`` line
    vectorized and route by conv_id hash — ship only (route, conv, turn,
    line) through the shuffle, never the full payload. Used by both
    assemble_conversations and turn_context_windows so separator/null-role
    policy stays in one place."""
    from ..hashing import hash_strings

    role = pc.fill_null(pc.cast(t.column("role"), pa.string()), "")
    text = pc.fill_null(pc.cast(t.column("text"), pa.string()), "")
    line = pc.binary_join_element_wise(role, text, ": ")
    conv = t.column("conv_id")
    h = hash_strings(conv)
    return pa.table(
        {
            "_p": pa.array((h % np.uint64(P)).astype(np.int32)),
            "conv_id": conv,
            "turn_idx": t.column("turn_idx"),
            "line": line,
        }
    )


def assemble_conversations(
    ds: ray.data.Dataset, sep: str = "\n"
) -> ray.data.Dataset:
    """Bulk transcript assembly: the LWW final state (one row per turn) →
    one row per CONVERSATION with turn count and the turn-ordered
    ``role: text`` transcript — the training-corpus export shape (the bulk
    analog of read_conversation's pruned point lookup).

    Scale shape: turns hash-shuffle ONCE on conv_id (slim: the conv key
    plus the per-turn line, pre-rendered vectorized), then each hash bucket
    assembles all of its conversations LOCALLY with a vectorized pandas
    sort + groupby-join — no per-conversation task, no driver state, no
    global sort. Conversations salted across base partitions by turn-range
    re-unite in their hash bucket."""
    import pandas as pd

    P = default_shuffle_blocks() * 4

    def line_rows(t: pa.Table) -> pa.Table:
        return _render_line_rows(t, P)

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=True)
        out = pd.DataFrame(
            {
                "n_turns": g.size(),
                "transcript": g["line"].agg(sep.join),
            }
        ).reset_index()
        out["n_turns"] = out["n_turns"].astype(np.int64)
        return out[["conv_id", "n_turns", "transcript"]]

    return (
        ds.map_batches(line_rows, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(assemble, batch_format="pandas")
    )


def turn_context_windows(
    ds: ray.data.Dataset, k: int = 2, sep: str = "\n"
) -> ray.data.Dataset:
    """Per-turn training contexts: each turn paired with its ``k`` preceding
    turns of the same conversation, rendered as one ``role: text`` block —
    the SFT-example construction shape (assemble_conversations exports whole
    transcripts; this exports a sliding window per turn).

    Same scale shape as assemble_conversations: one slim conv_id hash
    shuffle of pre-rendered lines, then each bucket builds every window
    VECTORIZED (k grouped shifts + string concat — no per-turn loop, no
    per-conversation task)."""
    import pandas as pd

    P = default_shuffle_blocks() * 4

    def line_rows(t: pa.Table) -> pa.Table:
        return _render_line_rows(t, P)

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        ctx = df["line"]
        for j in range(1, k + 1):
            p = g["line"].shift(j)
            cand = p.str.cat(ctx, sep=sep)  # NaN wherever the shift ran out
            ctx = cand.where(p.notna(), ctx)
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "turn_idx": df["turn_idx"],
                "context": ctx,
            }
        )

    return (
        ds.map_batches(line_rows, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(windows, batch_format="pandas")
    )
