"""Unit tests: LWW reduce laws, partitioner, schema evolution, hashing.

Model: the reference's inline-unit-test style (381 #[test] fns across
/root/reference/src/**; e.g. schema inference matrix src/schema.rs:572-807)
— but aimed at the new engine's core algebra.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tinyetl_ray import hashing
from tinyetl_ray.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA, align_to, evolve
from tinyetl_ray.stages.merge import lww_reduce
from tinyetl_ray.stages.partition import partition_ids
from tinyetl_ray.synth import make_base, make_changes


def ch(rows):
    """Build a change table from (lsn, op, conv, turn, text, ts_us) tuples."""
    return pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": [r[1] for r in rows],
            "conv_id": [r[2] for r in rows],
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "role": ["user"] * len(rows),
            "text": [r[4] for r in rows],
            "tool": [None] * len(rows),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        }
    ).cast(CHANGE_SCHEMA)


def winners(t, keep_deletes=False):
    out = lww_reduce(t, keep_deletes=keep_deletes)
    return {
        (c, i): (o, x)
        for c, i, o, x in zip(
            out.column("conv_id").to_pylist(),
            out.column("turn_idx").to_pylist(),
            out.column("op").to_pylist(),
            out.column("text").to_pylist(),
        )
    }


def test_later_ts_wins():
    t = ch([(1, "upsert", "a", 0, "old", 100), (2, "upsert", "a", 0, "new", 200)])
    assert winners(t) == {("a", 0): ("upsert", "new")}


def test_out_of_order_ts_loses():
    # earlier ts arriving at later lsn must LOSE (FIXTURES.md A2)
    t = ch([(1, "upsert", "a", 0, "new", 200), (2, "upsert", "a", 0, "stale", 100)])
    assert winners(t) == {("a", 0): ("upsert", "new")}


def test_equal_ts_higher_lsn_wins():
    t = ch([(1, "upsert", "a", 0, "first", 100), (2, "upsert", "a", 0, "second", 100)])
    assert winners(t) == {("a", 0): ("upsert", "second")}


def test_delete_wins_removes_key():
    t = ch([(1, "upsert", "a", 0, "x", 100), (2, "delete", "a", 0, None, 200)])
    assert winners(t) == {}
    assert winners(t, keep_deletes=True) == {("a", 0): ("delete", None)}


def test_delete_then_reupsert():
    t = ch(
        [
            (1, "upsert", "a", 0, "x", 100),
            (2, "delete", "a", 0, None, 200),
            (3, "upsert", "a", 0, "back", 300),
        ]
    )
    assert winners(t) == {("a", 0): ("upsert", "back")}


def test_duplicate_events_idempotent():
    t = ch([(1, "upsert", "a", 0, "x", 100), (1, "upsert", "a", 0, "x", 100)])
    assert winners(t) == {("a", 0): ("upsert", "x")}


def test_reduce_is_associative():
    """apply(apply(S,a),b) == apply(S, a+b) — the combiner law (SURVEY §5.2)."""
    epochs = make_changes(n_events=2000, n_convs=20, seed=3, n_epochs=2)
    both = pa.concat_tables(epochs)
    direct = lww_reduce(both, keep_deletes=False)
    pre = pa.concat_tables([lww_reduce(e, keep_deletes=True) for e in epochs])
    staged = lww_reduce(pre, keep_deletes=False)
    assert direct.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
        staged.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


def test_hash_deterministic_and_spread():
    a = pa.array([f"conv-{i}" for i in range(1000)])
    h1, h2 = hashing.hash_strings(a), hashing.hash_strings(a)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) > 990  # no mass collisions
    pids = h1 % np.uint64(64)
    counts = np.bincount(pids.astype(int), minlength=64)
    assert counts.max() < 60  # roughly uniform


def test_partitioner_key_stability_and_salting():
    conv = pa.array(["hot"] * 1000 + ["cold"] * 10)
    turn = pa.array(list(range(1000)) + list(range(10)), pa.int32())
    pids = partition_ids(conv, turn, num_partitions=32, turn_block=64)
    # same (conv, turn) always → same partition
    pids2 = partition_ids(conv, turn, num_partitions=32, turn_block=64)
    assert (pids == pids2).all()
    # hot conversation fans out across many partitions (turn-range salting)
    assert len(np.unique(pids[:1000])) >= 8
    # within one turn block, routing is constant
    assert len(np.unique(pids[:64])) == 1


def test_schema_evolve_additive():
    s2 = evolve(CHANGE_SCHEMA, pa.schema([pa.field("model", pa.string())]))
    assert s2.names[-1] == "model"
    with pytest.raises(TypeError):
        evolve(CHANGE_SCHEMA, pa.schema([pa.field("text", pa.int64())]))


def test_align_backfills_nulls():
    s2 = evolve(CHANGE_SCHEMA, pa.schema([pa.field("model", pa.string())]))
    t = ch([(1, "upsert", "a", 0, "x", 100)])
    a = align_to(t, s2)
    assert a.schema == s2
    assert a.column("model").null_count == 1


def test_synth_shapes():
    base = make_base(n_convs=10, seed=1)
    assert base.schema == TRANSCRIPT_SCHEMA
    epochs = make_changes(n_events=500, n_convs=10, seed=2, n_epochs=3, evolve_from_epoch=2)
    assert "model" not in epochs[0].column_names
    assert "model" in epochs[2].column_names
    lsns = np.concatenate([e.column("lsn").to_numpy() for e in epochs])
    assert (np.diff(lsns) >= 0).all() and lsns[0] == 0
