"""Deterministic synthesis of transcript CDC inputs.

Two producers:

1. ``make_base`` / ``make_changes`` — seeded numpy generators for the
   transcript base table and an ordered change-event log (FIXTURES.md A1/A2):
   zipf-hot conversations, out-of-ts-order updates, equal-ts conflicts,
   delete-then-reupsert, duplicate events, and a schema-evolution epoch.
   Used by unit tests and the benchmark (no wall clock, no external data).

2. ``derive_changes_batch`` — a *pure column-arithmetic* derivation of a
   change log from the driver-provided ``events`` parquet table
   (event_id, ts, user_id, event_type, value, props). Because the mapping is
   deterministic and SQL-expressible, the DuckDB oracle can derive the
   identical change log and replay it with window functions — giving the CDC
   merge a value-exact oracle (see __ray_entry__.oracle_sql). The Ray side
   runs this inside ``map_batches(batch_format="pyarrow")``.

Derivation rule (keep in lockstep with DERIVE_SQL in __ray_entry__.py):
    lsn      = event_id
    op       = 'delete' if event_id % 11 == 0 else 'upsert'
    conv_id  = 'conv-' || (user_id % 199)
    turn_idx = int32(event_id % 37)
    role     = ['user','assistant','system','tool'][event_id % 4]
    text     = NULL if delete else 'msg:'||event_id||':'||event_type||':'||props
    tool     = event_type if event_id % 4 == 3 else NULL
    ts       = ts truncated to whole seconds      (creates equal-ts conflicts)
    model    = (evolved epochs only) 'm'||(event_id % 3) if event_id >= threshold
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA

_ROLES = np.array(["user", "assistant", "system", "tool"])

# ---------------------------------------------------------------------------
# 1. Seeded generators (tests + bench)
# ---------------------------------------------------------------------------


def _conv_ids(rng: np.random.RandomState, n: int, n_convs: int, zipf_a: float) -> np.ndarray:
    """Zipf-ish conversation draw so a few conversations are hot (salting
    exercise — SURVEY.md §7.3 hot-conversation skew)."""
    ranks = rng.zipf(zipf_a, size=n) % n_convs
    return ranks.astype(np.int64)


def make_base(n_convs: int = 100, mean_turns: int = 8, seed: int = 7) -> pa.Table:
    """Base transcript table: every conversation has a contiguous turn range."""
    rng = np.random.RandomState(seed)
    turns = rng.poisson(mean_turns, size=n_convs).clip(1)
    conv = np.repeat(np.arange(n_convs), turns)
    turn_idx = np.concatenate([np.arange(t) for t in turns]).astype(np.int32)
    n = len(conv)
    role = _ROLES[turn_idx % 4]
    tool_mask = turn_idx % 4 == 3
    base_ts = np.int64(1_700_000_000_000_000)  # fixed epoch-us origin
    ts = base_ts + conv * 10_000_000 + turn_idx.astype(np.int64) * 1_000_000
    text = np.char.add(
        np.char.add("base text ", conv.astype(str)),
        np.char.add("/", turn_idx.astype(str)),
    )
    return pa.table(
        {
            "conv_id": np.char.add("conv-", conv.astype(str)),
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": pa.array(np.where(tool_mask, "search", None)),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    ).cast(TRANSCRIPT_SCHEMA)


def make_changes(
    n_events: int = 5000,
    n_convs: int = 100,
    max_turn: int = 40,
    seed: int = 11,
    n_epochs: int = 3,
    evolve_from_epoch: int | None = None,
    start_lsn: int = 0,
) -> list[pa.Table]:
    """Ordered change-event epochs with every correctness case of FIXTURES.md
    A2: inserts, updates, out-of-ts-order updates, equal-ts conflicts,
    deletes + re-upserts, duplicate events, hot conversations, and (from
    ``evolve_from_epoch`` on) an extra nullable ``model`` column."""
    rng = np.random.RandomState(seed)
    conv0 = _conv_ids(rng, n_events, n_convs, zipf_a=1.5)
    turn0 = rng.randint(0, max_turn, size=n_events).astype(np.int32)
    is_del0 = rng.rand(n_events) < 0.08
    base_ts = np.int64(1_700_100_000_000_000)
    lsn0 = np.arange(n_events, dtype=np.int64)
    # mostly increasing ts with jitter; coarse to seconds → equal-ts conflicts;
    # negative jitter → out-of-ts-order arrivals (earlier ts at later lsn)
    ts0 = base_ts + lsn0 * 250_000 + rng.randint(-2_000_000, 2_000_000, size=n_events)
    ts0 = (ts0 // 1_000_000) * 1_000_000
    role_idx0 = rng.randint(0, 4, size=n_events).astype(np.int8)

    # duplicate ~1% of events immediately after themselves (idempotence case)
    dup_idx = np.sort(rng.choice(n_events, size=max(1, n_events // 100), replace=False))
    order = np.sort(np.concatenate([np.arange(n_events), dup_idx]))
    conv, turn_idx = conv0[order], turn0[order]
    is_del, ts = is_del0[order], ts0[order]
    role_idx = role_idx0[order]
    n = len(order)
    lsn = start_lsn + np.arange(n, dtype=np.int64)  # strictly increasing

    # Build Arrow PER EPOCH: a single pa.string() array caps at 2 GiB of
    # offsets/bytes (int32), which a 10^8-row text column exceeds — chunked
    # construction keeps every array small AND bounds peak memory. String
    # kernels stay Arrow C++ (np.char.* is single-core Python-slow).
    bounds = np.linspace(0, n, n_epochs + 1).astype(int)
    epochs = []
    for e in range(n_epochs):
        lo, hi = bounds[e], bounds[e + 1]
        m = hi - lo
        c, tn, d = conv[lo:hi], turn_idx[lo:hi], is_del[lo:hi]
        ls = lsn[lo:hi]
        conv_str = pc.binary_join_element_wise(
            pa.scalar("conv-"), pc.cast(pa.array(c), pa.string()), ""
        )
        text = pc.binary_join_element_wise(
            pa.scalar("edit:"),
            pc.cast(pa.array(ls), pa.string()),
            pa.scalar("@"),
            pc.cast(pa.array(c), pa.string()),
            "",
        )
        del_mask = pa.array(d)
        nulls_s = pa.nulls(m, pa.string())
        role = pa.array(_ROLES[role_idx[lo:hi].astype(np.int64)], pa.string())
        tool_mask = (role_idx[lo:hi] == 3) & ~d
        cols = {
            "lsn": pa.array(ls),
            "op": pc.if_else(del_mask, pa.scalar("delete"), pa.scalar("upsert")),
            "conv_id": conv_str,
            "turn_idx": pa.array(tn),
            "role": pc.if_else(del_mask, nulls_s, role),
            "text": pc.if_else(del_mask, nulls_s, text),
            "tool": pc.if_else(pa.array(tool_mask), pa.scalar("search"), nulls_s),
            "ts": pa.array(ts[lo:hi], pa.timestamp("us")),
        }
        part = pa.table(cols).cast(CHANGE_SCHEMA)
        if evolve_from_epoch is not None and e >= evolve_from_epoch:
            model = pc.binary_join_element_wise(
                pa.scalar("m"), pc.cast(pa.array(ls % 3), pa.string()), ""
            )
            part = part.append_column(pa.field("model", pa.string()), model)
        epochs.append(part)
    return epochs


# ---------------------------------------------------------------------------
# 2. Derivation from the driver's `events` table (oracle-checkable path)
# ---------------------------------------------------------------------------

EVOLVE_LSN_THRESHOLD = 500  # events with lsn >= threshold carry `model`


def derive_changes_batch(batch: pa.Table, with_model: bool = False) -> pa.Table:
    """Map one Arrow batch of the `events` table to change events.

    Pure vectorized arithmetic — keep in lockstep with DERIVE_SQL
    (__ray_entry__.py) so DuckDB derives the identical log.
    """
    batch = batch.combine_chunks()
    eid = batch.column("event_id").to_numpy()
    uid = batch.column("user_id").to_numpy()
    etype_a = batch.column("event_type")

    is_del = eid % 11 == 0
    keep = pa.array(~is_del)  # mask: payload nulled on deletes
    op = np.where(is_del, "delete", "upsert")
    conv = pc.binary_join_element_wise(
        pa.array(np.full(len(eid), "conv", dtype=object), pa.string()),
        pa.array((uid % 199).astype(str), pa.string()),
        "-",
    )
    turn_idx = (eid % 37).astype(np.int32)
    role = pa.array(_ROLES[(eid % 4).astype(np.int64)], pa.string())
    # text = 'msg:' || event_id || ':' || event_type || ':' || props  (vectorized join)
    text = pc.binary_join_element_wise(
        pa.array(np.full(len(eid), "msg", dtype=object), pa.string()),
        pc.cast(batch.column("event_id"), pa.string()),
        batch.column("event_type"),
        batch.column("props"),
        ":",
    )
    tool = pc.if_else(pa.array(eid % 4 == 3), etype_a, pa.nulls(len(eid), pa.string()))
    ts_us = batch.column("ts").cast(pa.int64()).to_numpy()
    ts_coarse = (ts_us // 1_000_000) * 1_000_000

    cols = {
        "lsn": pa.array(eid, pa.int64()),
        "op": pa.array(op, pa.string()),
        "conv_id": conv,
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pc.if_else(keep, role, pa.nulls(len(eid), pa.string())),
        "text": pc.if_else(keep, text, pa.nulls(len(eid), pa.string())),
        "tool": pc.if_else(keep, tool, pa.nulls(len(eid), pa.string())),
        "ts": pa.array(ts_coarse, pa.timestamp("us")),
    }
    out = pa.table(cols).cast(CHANGE_SCHEMA)
    if with_model:
        model = np.where(
            (eid >= EVOLVE_LSN_THRESHOLD) & ~is_del,
            np.char.add("m", (eid % 3).astype(str)).astype(object),
            None,
        )
        out = out.append_column(pa.field("model", pa.string()), pa.array(model, pa.string()))
    return out
