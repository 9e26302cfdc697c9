"""Incremental materialized-view maintenance over committed CDC tables.

TinyETL re-runs a whole pipeline to refresh any downstream artifact (one
Source→Target pass per run, /root/reference/src/transfer.rs:22-118 — no
notion of "what changed since last run"). This module is the CDC-native
replacement: a DERIVED aggregate table kept in sync with a committed base
table by reading ONLY the base partitions whose lsn_watermark CHANGED since
the view's last refresh — manifest-level change pruning, the same trick
cdc.changes_since uses for CDC-out. Watermark regression (possible only via
cdc.restore; compaction floors watermarks) also triggers a rebuild, so views
follow rollbacks.

Views are SPEC-DRIVEN: a ViewSpec names a group key and a list of
DISTRIBUTIVE aggregates (count / sum / sum_len / max / min). Why
distributive only: the base partitioner salts hot conversations across
partitions by turn-range (stages/partition.py), so a group may SPAN
partitions — the view therefore stores per-(base partition) PARTIAL
aggregates, one view partition per base partition, and the public read
combines partials with a small groupby. A changed base partition
invalidates exactly one view partition; untouched partials carry forward by
manifest reference, never re-read. (Algebraic aggregates like avg decompose
into two distributive ones; holistic ones like exact quantiles need the
histogram pattern in pipelines/corpus.py instead.)

Scale shape at 10^10 events: a refresh after an epoch that touched K of P
partitions reads K snapshots (not the table), each build task streams its
snapshot row-group-by-row-group (never whole-partition in heap), and the
final combine runs over ~#groups rows — orders of magnitude smaller than
the base. Exactly-once via the same write-then-rename content-addressed
snapshots + atomic commit publish as the base table; refresh is idempotent
and OCC-safe.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..state import manifest as mf

# Streaming chunk size for the per-partition partial build: bounds task heap
# at ~chunk + #distinct-groups regardless of partition size.
BUILD_CHUNK_ROWS = 1 << 20

_KINDS = ("count", "sum", "sum_len", "max", "min")
# partial-combine function per kind: partials of count/sum/sum_len re-SUM,
# max/min re-max/re-min (all distributive)
_COMBINE = {"count": "sum", "sum": "sum", "sum_len": "sum", "max": "max", "min": "min"}


@dataclass(frozen=True)
class ViewAgg:
    """One distributive aggregate: ``name`` is the output column, ``kind``
    one of count/sum/sum_len/max/min, ``src`` the base column it reads
    (None for count). ``out_type``: partials are always int64; the read
    casts back (e.g. 'timestamp_us' for a max-over-ts)."""

    name: str
    kind: str
    src: str | None = None
    out_type: str = "int64"  # int64 | timestamp_us

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown aggregate kind {self.kind!r}")
        if self.kind != "count" and not self.src:
            raise ValueError(f"aggregate {self.name!r} ({self.kind}) needs src")


@dataclass(frozen=True)
class ViewSpec:
    """A materialized view definition: per-``key`` distributive aggregates
    over the base table's surviving upserts."""

    name: str
    key: str
    aggs: tuple[ViewAgg, ...] = field(default_factory=tuple)

    def partial_schema(self) -> pa.Schema:
        return pa.schema(
            [pa.field(self.key, pa.string(), nullable=False)]
            + [pa.field(a.name, pa.int64()) for a in self.aggs]
        )

    def read_columns(self) -> list[str]:
        cols = ["op", self.key]
        for a in self.aggs:
            if a.src and a.src not in cols:
                cols.append(a.src)
        return cols


# The canned per-conversation stats view (round-4 original).
CONV_STATS = ViewSpec(
    name="conv_stats",
    key="conv_id",
    aggs=(
        ViewAgg("turns", "count"),
        ViewAgg("chars", "sum_len", "text"),
        ViewAgg("last_ts_us", "max", "ts", out_type="timestamp_us"),
    ),
)

# Per-role message stats over the same payload — proves spec generality.
ROLE_STATS = ViewSpec(
    name="role_stats",
    key="role",
    aggs=(
        ViewAgg("messages", "count"),
        ViewAgg("chars", "sum_len", "text"),
        ViewAgg("first_ts_us", "min", "ts", out_type="timestamp_us"),
        ViewAgg("last_ts_us", "max", "ts", out_type="timestamp_us"),
    ),
)


def _agg_input(t: pa.Table, a: ViewAgg) -> pa.Array:
    """Vectorized int64 input column for one aggregate over a batch."""
    if a.kind == "count":
        import numpy as np

        return pa.array(np.ones(len(t), dtype=np.int64))
    col = t.column(a.src)
    if a.kind == "sum_len":
        return pc.cast(pc.utf8_length(col), pa.int64())
    return pc.cast(col, pa.int64())  # sum / max / min (timestamps via int64)


def _partial_stats(
    path: str, spec: ViewSpec, chunk_rows: int = BUILD_CHUNK_ROWS
) -> pa.Table:
    """Per-group partial aggregates of ONE base partition snapshot, streamed
    row-group-wise (column-pruned read: op/key/src columns only — a wide
    evolved snapshot never deserializes its other columns)."""
    parts: list[pa.Table] = []
    pf = pq.ParquetFile(path)
    pa_aggs = [(a.name, _COMBINE[a.kind]) for a in spec.aggs]
    # additive schema evolution: a snapshot written before an evolved column
    # existed simply lacks it — read what is present and backfill nulls
    # (null inputs contribute nothing to sum/max/min and 0 to sum_len)
    present = set(pf.schema_arrow.names)
    cols = [c for c in spec.read_columns() if c in present]
    missing = [c for c in spec.read_columns() if c not in present]
    for rb in pf.iter_batches(batch_size=chunk_rows, columns=cols):
        t = pa.Table.from_batches([rb])
        for c in missing:
            t = t.append_column(c, pa.nulls(len(t), pa.string()))
        t = t.filter(pc.equal(t.column("op"), "upsert"))
        if len(t) == 0:
            continue
        chunk = pa.table(
            {spec.key: t.column(spec.key)}
            | {a.name: _agg_input(t, a) for a in spec.aggs}
        )
        parts.append(chunk.group_by(spec.key).aggregate(pa_aggs))
    if not parts:
        return spec.partial_schema().empty_table()
    suffixed = [(f"{a.name}_{_COMBINE[a.kind]}", _COMBINE[a.kind]) for a in spec.aggs]
    merged = pa.concat_tables(parts).group_by(spec.key).aggregate(suffixed)
    out = pa.table(
        {spec.key: merged.column(spec.key)}
        | {
            a.name: merged.column(f"{a.name}_{_COMBINE[a.kind]}_{_COMBINE[a.kind]}")
            for a in spec.aggs
        }
    ).cast(spec.partial_schema())
    # deterministic row order -> byte-identical snapshot on retry/re-run
    return out.sort_by(spec.key)


def refresh_view(
    table_root: str,
    view_root: str,
    spec: ViewSpec,
    *,
    build_chunk_rows: int | None = None,
    occ_retries: int = 2,
) -> dict[str, Any]:
    """Bring the view at ``view_root`` up to the base table's latest commit.
    First call builds every partial; later calls rebuild only partitions
    whose base lsn_watermark CHANGED (manifest diff — untouched partials
    carry forward without being read; a regression means the base was
    restored to an older epoch and rebuilds too). Returns the view commit.

    No-op (returns the existing commit, publishes nothing) when the view
    already reflects the base's latest epoch. A base commit that changed
    no partition watermark — e.g. a compaction, which floors watermarks —
    publishes a metadata-only view epoch recording the new base_epoch,
    rewriting nothing.

    Two refreshers racing on the same view root: the OCC loser re-enters
    (up to ``occ_retries`` times) — it re-reads both manifests, usually
    finding the winner already published its work and no-oping; snapshots
    are content-addressed, so the retry can never clobber bytes."""
    for attempt in range(occ_retries + 1):
        try:
            return _refresh_view_once(
                table_root, view_root, spec, build_chunk_rows=build_chunk_rows
            )
        except mf.ConcurrentCommitError:
            if attempt == occ_retries:
                raise
    raise AssertionError("unreachable")


def _refresh_view_once(
    table_root: str,
    view_root: str,
    spec: ViewSpec,
    *,
    build_chunk_rows: int | None = None,
) -> dict[str, Any]:
    base = mf.latest_commit(table_root)
    if base is None:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    prev = mf.latest_commit(view_root)
    if prev is not None and prev.get("view") != spec.name:
        raise ValueError(
            f"view root {view_root} holds view {prev.get('view')!r}, "
            f"refusing to refresh it as {spec.name!r}"
        )
    if prev is not None and prev.get("base_epoch") == base["epoch"]:
        return prev
    prev_wm = mf.partition_watermarks(prev)
    # The view row remembers the BASE partition's live_hash (fingerprint of
    # its surviving-upsert rows) it was built from: an exact identity check
    # that stays correct even when a restore + re-apply lands a DIFFERENT
    # row set on a coinciding max lsn (round-4 advice — watermark equality
    # alone is not proof of identity once rollbacks exist). live_hash, not
    # content_hash, so tombstone-dropping compaction — which preserves live
    # rows and their order — still rebuilds nothing. Older view commits
    # lack the key and rebuild once (self-healing).
    prev_bh = (
        {m["partition"]: m.get("base_live_hash") for m in prev["partitions"]}
        if prev is not None
        else {}
    )
    # INEQUALITY, not advance: normal commits only ever raise a partition's
    # watermark (compaction explicitly floors it, cdc.py _rewrite_parts), so
    # a REGRESSION means the base was cdc.restore()d to an older epoch — the
    # view must rebuild those partitions or it would silently keep the
    # rolled-back state.
    changed = [
        m
        for m in base["partitions"]
        if m["partition"] not in prev_wm
        or m["lsn_watermark"] != prev_wm[m["partition"]]
        or m.get("live_hash", "") != prev_bh.get(m["partition"])
    ]
    epoch = prev["epoch"] + 1 if prev is not None else 0
    new_rows: list[dict[str, Any]] = []
    if changed:
        items = [
            {
                "pid": int(m["partition"]),
                "path": os.path.join(table_root, m["file"]) if m["rows"] > 0 else "",
                "wm": int(m["lsn_watermark"]),
                "bh": m.get("live_hash", ""),
            }
            for m in changed
        ]
        chunk = BUILD_CHUNK_ROWS if build_chunk_rows is None else build_chunk_rows

        def _build(
            batch: pa.Table,
            root: str = view_root,
            ep: int = epoch,
            sp: ViewSpec = spec,
            _chunk: int = chunk,
        ) -> pa.Table:
            rows = []
            for item in batch.to_pylist():
                partial = (
                    _partial_stats(item["path"], sp, _chunk)
                    if item["path"]
                    else sp.partial_schema().empty_table()
                )
                row = mf.write_view_snapshot(root, item["pid"], ep, partial, item["wm"])
                row["base_live_hash"] = item["bh"]
                rows.append(row)
            return pa.table({k: [r[k] for r in rows] for k in rows[0]})

        ds = ray.data.from_items(items, override_num_blocks=len(items))
        new_rows = [
            r
            for t in ds.map_batches(_build, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
            for r in t.to_pylist()
        ]  # tiny: one manifest row per rebuilt partition
    rebuilt = {r["partition"] for r in new_rows}
    manifests = list(new_rows)
    if prev is not None:
        # carry forward ONLY partials whose base partition still EXISTS in
        # the current base commit: cdc.restore to an epoch that predates a
        # partition's first write publishes a commit WITHOUT that partition,
        # and keeping its partial would freeze the rolled-back rows into the
        # view forever (views must follow rollbacks)
        base_pids = {m["partition"] for m in base["partitions"]}
        manifests += [
            dict(m)
            for m in prev["partitions"]
            if m["partition"] not in rebuilt and m["partition"] in base_pids
        ]
    return mf.commit_epoch(
        view_root,
        epoch,
        manifests,
        stats={"partitions_rebuilt": len(rebuilt)},
        schema=spec.partial_schema(),
        extra={
            "view": spec.name,
            "base_root": os.path.abspath(table_root),
            "base_epoch": int(base["epoch"]),
        },
        expected_prev_epoch=prev["epoch"] if prev is not None else -1,
    )


def read_view(view_root: str, spec: ViewSpec) -> ray.data.Dataset:
    """Public view: combine the per-base-partition partials into final
    per-group values. The combine is a groupby over ~#groups partial rows —
    tiny relative to the base table; most groups have exactly one partial
    (only turn-range-salted hot conversations span base partitions).

    A fully-empty view (every surviving base row deleted) yields a 0-row
    dataset IN THE SAME FINAL SCHEMA as a non-empty read (same column
    names, timestamp columns already cast) so empty↔non-empty transitions
    never change the contract; note Ray Data drops empty blocks, so
    ``to_pandas()`` on that result has no columns."""
    from ray.data.aggregate import Max, Min, Sum

    commit = mf.latest_commit(view_root)
    if commit is None:
        raise FileNotFoundError(f"no committed view epoch under {view_root}")
    if commit.get("view") != spec.name:
        raise ValueError(
            f"view root {view_root} holds view {commit.get('view')!r}, "
            f"not {spec.name!r}"
        )

    def _final(t: pa.Table, sp: ViewSpec = spec) -> pa.Table:
        cols: dict[str, Any] = {sp.key: t.column(sp.key)}
        for a in sp.aggs:
            col = pc.cast(t.column(a.name), pa.int64())
            name = a.name
            if a.out_type == "timestamp_us":
                col = pc.cast(col, pa.timestamp("us"))
                name = a.name.removesuffix("_us")
            cols[name] = col
        return pa.table(cols)

    files = mf.snapshot_files(view_root, commit)
    if not files:
        # empty view: same FINAL schema as the non-empty path (the partial
        # and aggregated shapes share column names, so finalizing an empty
        # partial-shaped table yields exactly the public schema)
        return ray.data.from_arrow(_final(spec.partial_schema().empty_table()))
    ds = ray.data.read_parquet(files)
    ray_aggs = []
    for a in spec.aggs:
        cls = {"sum": Sum, "max": Max, "min": Min}[_COMBINE[a.kind]]
        ray_aggs.append(cls(a.name, alias_name=a.name))
    agg = ds.groupby(spec.key).aggregate(*ray_aggs)
    return agg.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Backward-compatible conv_stats entry points (round-4 original surface)
# ---------------------------------------------------------------------------


def refresh_conv_stats(
    table_root: str, view_root: str, *, build_chunk_rows: int | None = None
) -> dict[str, Any]:
    return refresh_view(
        table_root, view_root, CONV_STATS, build_chunk_rows=build_chunk_rows
    )


def read_conv_stats(view_root: str) -> ray.data.Dataset:
    return read_view(view_root, CONV_STATS)
