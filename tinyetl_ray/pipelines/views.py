"""Incremental materialized-view maintenance over committed CDC tables.

TinyETL re-runs a whole pipeline to refresh any downstream artifact (one
Source→Target pass per run, /root/reference/src/transfer.rs:22-118 — no
notion of "what changed since last run"). This module is the CDC-native
replacement: a DERIVED aggregate table (per-conversation stats) kept in sync
with a committed base table by reading ONLY the base partitions whose
lsn_watermark advanced since the view's last refresh — manifest-level change
pruning, the same trick cdc.changes_since uses for CDC-out.

Why this is exact without replaying deltas: the base partitioner salts hot
conversations across partitions by turn-range (stages/partition.py), so a
conversation may SPAN partitions — but every aggregate maintained here is
DISTRIBUTIVE (count / sum / max / min), so the view stores per-(base
partition) PARTIAL aggregates, one view partition per base partition, and
the public read combines partials with a small groupby. A changed base
partition invalidates exactly one view partition; untouched partials carry
forward by manifest reference, never re-read.

Scale shape at 10^10 events: a refresh after an epoch that touched K of P
partitions reads K snapshots (not the table), each build task streams its
snapshot row-group-by-row-group (never whole-partition in heap), and the
final combine runs over ~#conversations rows — orders of magnitude smaller
than the base. Exactly-once via the same write-then-rename snapshots +
atomic commit publish as the base table; refresh is idempotent and OCC-safe.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..state import manifest as mf

# Partial (per base partition) schema. last_ts is carried as int64
# microseconds so the second-level max() runs on a plain integer column;
# read_conv_stats casts back to timestamp[us].
VIEW_PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turns", pa.int64()),
        pa.field("chars", pa.int64()),
        pa.field("last_ts_us", pa.int64()),
    ]
)

# Streaming chunk size for the per-partition partial build: bounds task heap
# at ~chunk + #distinct-convs regardless of partition size.
BUILD_CHUNK_ROWS = 1 << 20


def _partial_stats(path: str, chunk_rows: int = BUILD_CHUNK_ROWS) -> pa.Table:
    """Per-conversation partial aggregates of ONE base partition snapshot,
    streamed row-group-wise (column-pruned read: op/conv_id/text/ts only —
    a wide evolved snapshot never deserializes its other columns)."""
    parts: list[pa.Table] = []
    pf = pq.ParquetFile(path)
    cols = ["op", "conv_id", "text", "ts"]
    for rb in pf.iter_batches(batch_size=chunk_rows, columns=cols):
        t = pa.Table.from_batches([rb])
        t = t.filter(pc.equal(t.column("op"), "upsert"))
        if len(t) == 0:
            continue
        chunk = pa.table(
            {
                "conv_id": t.column("conv_id"),
                "one": pa.array([1] * len(t), pa.int64()),
                "chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )
        parts.append(
            chunk.group_by("conv_id").aggregate(
                [("one", "sum"), ("chars", "sum"), ("ts_us", "max")]
            )
        )
    if not parts:
        return VIEW_PARTIAL_SCHEMA.empty_table()
    merged = (
        pa.concat_tables(parts)
        .group_by("conv_id")
        .aggregate([("one_sum", "sum"), ("chars_sum", "sum"), ("ts_us_max", "max")])
    )
    out = pa.table(
        {
            "conv_id": merged.column("conv_id"),
            "turns": merged.column("one_sum_sum"),
            "chars": merged.column("chars_sum_sum"),
            "last_ts_us": merged.column("ts_us_max_max"),
        }
    ).cast(VIEW_PARTIAL_SCHEMA)
    # deterministic row order -> byte-identical snapshot on retry/re-run
    return out.sort_by("conv_id")


def refresh_conv_stats(
    table_root: str, view_root: str, *, build_chunk_rows: int | None = None
) -> dict[str, Any]:
    """Bring the conv_stats view at ``view_root`` up to the base table's
    latest commit. First call builds every partial; later calls rebuild only
    partitions whose base lsn_watermark advanced (manifest diff — untouched
    partials carry forward without being read). Returns the view commit.

    No-op (returns the existing commit, publishes nothing) when the view
    already reflects the base's latest epoch. A base commit that advanced
    no partition watermark — e.g. a compaction, whose tombstone GC can only
    LOWER a watermark — publishes a metadata-only view epoch recording the
    new base_epoch, rewriting nothing."""
    base = mf.latest_commit(table_root)
    if base is None:
        raise FileNotFoundError(f"no committed epoch under {table_root}")
    prev = mf.latest_commit(view_root)
    if prev is not None and prev.get("base_epoch") == base["epoch"]:
        return prev
    prev_wm = mf.partition_watermarks(prev)
    # INEQUALITY, not advance: normal commits only ever raise a partition's
    # watermark (compaction explicitly floors it, cdc.py _rewrite_parts), so
    # a REGRESSION means the base was cdc.restore()d to an older epoch — the
    # view must rebuild those partitions or it would silently keep the
    # rolled-back state. Equal watermark ⇒ identical surviving upserts
    # (changed winners always carry a higher lsn) ⇒ skip is exact.
    changed = [
        m
        for m in base["partitions"]
        if m["partition"] not in prev_wm
        or m["lsn_watermark"] != prev_wm[m["partition"]]
    ]
    epoch = prev["epoch"] + 1 if prev is not None else 0
    new_rows: list[dict[str, Any]] = []
    if changed:
        items = [
            {
                "pid": int(m["partition"]),
                "path": os.path.join(table_root, m["file"]) if m["rows"] > 0 else "",
                "wm": int(m["lsn_watermark"]),
            }
            for m in changed
        ]
        chunk = BUILD_CHUNK_ROWS if build_chunk_rows is None else build_chunk_rows

        def _build(
            batch: pa.Table,
            root: str = view_root,
            ep: int = epoch,
            _chunk: int = chunk,
        ) -> pa.Table:
            rows = []
            for item in batch.to_pylist():
                partial = (
                    _partial_stats(item["path"], _chunk)
                    if item["path"]
                    else VIEW_PARTIAL_SCHEMA.empty_table()
                )
                rows.append(
                    mf.write_view_snapshot(root, item["pid"], ep, partial, item["wm"])
                )
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
        manifests += [
            dict(m) for m in prev["partitions"] if m["partition"] not in rebuilt
        ]
    return mf.commit_epoch(
        view_root,
        epoch,
        manifests,
        stats={"partitions_rebuilt": len(rebuilt)},
        schema=VIEW_PARTIAL_SCHEMA,
        extra={
            "view": "conv_stats",
            "base_root": os.path.abspath(table_root),
            "base_epoch": int(base["epoch"]),
        },
        expected_prev_epoch=prev["epoch"] if prev is not None else -1,
    )


def read_conv_stats(view_root: str) -> ray.data.Dataset:
    """Public view: combine the per-base-partition partials into final
    per-conversation stats. The combine is a groupby over ~#conversations
    partial rows — tiny relative to the base table; most conversations have
    exactly one partial (only turn-range-salted hot conversations span
    base partitions).

    A fully-empty view (every surviving base row deleted) yields a 0-row
    dataset; note Ray Data drops empty blocks, so ``to_pandas()`` on that
    result has no columns — callers needing the schema of an empty result
    should consult VIEW_PARTIAL_SCHEMA."""
    from ray.data.aggregate import Max, Sum

    commit = mf.latest_commit(view_root)
    if commit is None:
        raise FileNotFoundError(f"no committed view epoch under {view_root}")
    files = mf.snapshot_files(view_root, commit)
    if not files:
        return ray.data.from_arrow(
            pa.schema(
                [
                    pa.field("conv_id", pa.string(), nullable=False),
                    pa.field("turns", pa.int64()),
                    pa.field("chars", pa.int64()),
                    pa.field("last_ts", pa.timestamp("us")),
                ]
            ).empty_table()
        )
    ds = ray.data.read_parquet(files)
    agg = ds.groupby("conv_id").aggregate(
        Sum("turns", alias_name="turns"),
        Sum("chars", alias_name="chars"),
        Max("last_ts_us", alias_name="last_ts_us"),
    )

    def _final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turns": pc.cast(t.column("turns"), pa.int64()),
                "chars": pc.cast(t.column("chars"), pa.int64()),
                "last_ts": pc.cast(
                    pc.cast(t.column("last_ts_us"), pa.int64()), pa.timestamp("us")
                ),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")
