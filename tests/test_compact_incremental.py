"""Compaction, CDC-out (changes_since), pinned partitioner, and the
Hypothesis property: replay == sequential oracle for arbitrary event lists."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.schema import CHANGE_SCHEMA
from tinyetl_ray.state import manifest as mf
from tinyetl_ray.synth import make_changes

from .util import assert_frames_equal, sequential_lww


def _write_epochs(tmp_path, n_epochs=3, n_events=3000, **kw):
    epochs = make_changes(n_events=n_events, n_convs=40, seed=13, n_epochs=n_epochs, **kw)
    files = []
    for e, t in enumerate(epochs):
        p = tmp_path / f"e{e}.parquet"
        pq.write_table(t, p)
        files.append([str(p)])
    return epochs, files


def test_incremental_equals_oneshot_after_refactor(tmp_path):
    """State-inside-merge-task design: multi-epoch incremental == one-shot."""
    epochs, files = _write_epochs(tmp_path, n_epochs=4)
    root = str(tmp_path / "t")
    for k in range(1, 5):
        cdc.replay_commit(root, files[:k], num_partitions=8)
    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs))
    assert_frames_equal(got, want)
    # partitioner pinned in the commit
    c = mf.latest_commit(root)
    assert c["num_partitions"] == 8 and "turn_block" in c


def test_partitioner_pinned_overrides_caller(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files[:1], num_partitions=8)
    # caller asks for a different partition count on resume — table wins
    cdc.replay_commit(root, files, num_partitions=32)
    assert mf.latest_commit(root)["num_partitions"] == 8
    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs))
    assert_frames_equal(got, want)


def test_untouched_partitions_not_rewritten(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=1, n_events=3000)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    c0 = mf.latest_commit(root)
    # epoch 1 touches a single conversation → most partitions carry forward
    one = pa.table(
        {
            "lsn": pa.array([10_000], pa.int64()),
            "op": ["upsert"],
            "conv_id": ["conv-1"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["patched"],
            "tool": [None],
            "ts": pa.array([2_000_000_000_000_000], pa.timestamp("us")),
        }
    ).cast(CHANGE_SCHEMA)
    p1 = tmp_path / "single.parquet"
    pq.write_table(one, p1)
    cdc.replay_commit(root, files + [[str(p1)]], num_partitions=8)
    c1 = mf.latest_commit(root)
    rewritten = [
        m for m in c1["partitions"] if m["file"] and f"epoch-{1:06d}" in m["file"]
    ]
    assert len(rewritten) == 1  # only the touched partition was rewritten
    got = cdc.read_table(root).to_pandas()
    patched = got[(got.conv_id == "conv-1") & (got.turn_idx == 0)]
    assert patched.iloc[0]["text"] == "patched"


def test_compact_drops_tombstones_preserves_state(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    before = cdc.read_table(root).to_pandas()
    pre_tombs = sum(m["tombstones"] for m in mf.latest_commit(root)["partitions"])
    assert pre_tombs > 0
    c = cdc.compact(root)
    assert c["stats"]["compaction"] is True
    after = cdc.read_table(root).to_pandas()
    assert_frames_equal(after, before)
    assert sum(m["tombstones"] for m in c["partitions"]) == 0
    # replay continues to work after compaction (partitioner preserved) AND
    # the post-compaction change epoch must actually APPLY: the compaction
    # consumed a commit-epoch number, but change-epoch resume bookkeeping
    # (last_change_epoch) must not let it shadow real change epochs
    extra = make_changes(n_events=500, n_convs=40, seed=99, n_epochs=1, start_lsn=50_000)[0]
    p = tmp_path / "extra.parquet"
    pq.write_table(extra, p)
    new_commits = cdc.replay_commit(root, files + [[str(p)]], num_partitions=8)
    assert len(new_commits) == 1, "post-compaction change epoch was skipped"
    final = cdc.read_table(root).to_pandas()
    # oracle: dropping tombstones makes the compacted LIVE state the new
    # base (the documented retention-window semantics — a dropped delete can
    # no longer shadow an older-ts upsert), so replay `extra` over `before`
    want = sequential_lww(extra, base=pa.Table.from_pandas(before, preserve_index=False))
    assert_frames_equal(final, want)


def test_compaction_does_not_shadow_change_epochs(tmp_path):
    """Regression: compact() used to share the resume epoch counter with
    replay_commit, silently skipping any change epoch indexed <= the
    compaction's commit number."""
    epochs, files = _write_epochs(tmp_path, n_epochs=1)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    # keep tombstones: this test is about epoch bookkeeping, and dropped
    # tombstones legitimately change replay results for overlapping-ts events
    cdc.compact(root, drop_tombstones=False)  # commit epoch 1, change epoch still 0
    cdc.compact(root, drop_tombstones=False)  # commit epoch 2
    c = mf.latest_commit(root)
    assert c["epoch"] == 2 and c["last_change_epoch"] == 0
    # change epochs 1 and 2 arrive after two compactions
    more = make_changes(n_events=800, n_convs=40, seed=7, n_epochs=2, start_lsn=80_000)
    mfiles = []
    for e, t in enumerate(more):
        p = tmp_path / f"m{e}.parquet"
        pq.write_table(t, p)
        mfiles.append([str(p)])
    applied = cdc.replay_commit(root, files + mfiles, num_partitions=8)
    assert len(applied) == 2, "change epochs shadowed by compaction commits"
    assert mf.latest_commit(root)["last_change_epoch"] == 2
    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs + more))
    assert_frames_equal(got, want)


def test_compact_watermark_never_regresses(tmp_path):
    """If a partition's max-lsn winner is a delete tombstone,
    compact(drop_tombstones=True) must carry the prior watermark forward,
    not recompute a lower one from surviving upserts."""
    t = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": ["upsert", "delete"],
            "conv_id": ["a", "a"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": ["user", None],
            "text": ["hello", None],
            "tool": [None, None],
            "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
        }
    ).cast(CHANGE_SCHEMA)
    p = tmp_path / "e0.parquet"
    pq.write_table(t, p)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, [[str(p)]], num_partitions=2)
    wm_before = mf.latest_commit(root)["watermark"]
    assert wm_before == 2  # the tombstone's lsn
    c = cdc.compact(root, drop_tombstones=True)
    assert c["watermark"] == wm_before, "compaction regressed the lsn watermark"
    for m in c["partitions"]:
        assert m["tombstones"] == 0


def test_changes_since(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=3)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    wm0 = mf.list_commits(root)[0]["watermark"]
    delta = cdc.changes_since(root, after_epoch=0).to_pandas()
    assert (delta["lsn"] > wm0).all()
    assert len(delta) > 0
    assert {"op", "conv_id", "turn_idx"} <= set(delta.columns)
    with pytest.raises(ValueError):
        cdc.changes_since(root, after_epoch=2)  # nothing newer


def test_changes_since_prunes_untouched_partitions(tmp_path):
    """CDC-out opens ONLY partitions whose watermark advanced past the
    anchor — an incremental epoch touching one conversation must not make
    changes_since scan the whole table."""
    import pyarrow.parquet as _pq

    epochs, files = _write_epochs(tmp_path, n_epochs=1, n_events=3000)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=16)
    # tiny incremental epoch touching a single conversation
    one = pa.table(
        {
            "lsn": pa.array([10_000_000], pa.int64()),
            "op": pa.array(["upsert"]),
            "conv_id": pa.array(["conv-1"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["late edit"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([2_000_000_000_000_000], pa.timestamp("us")),
        }
    )
    p = str(tmp_path / "inc.parquet")
    _pq.write_table(one, p)
    cdc.replay_commit(root, [files[0], [p]], num_partitions=16)
    delta = cdc.changes_since(root, after_epoch=0)
    latest = mf.latest_commit(root)
    wm0 = mf.list_commits(root)[0]["watermark"]
    n_live = sum(1 for m in latest["partitions"] if m["rows"] > 0)
    touched = [
        m
        for m in latest["partitions"]
        if m["rows"] > 0 and m["lsn_watermark"] > wm0
    ]
    # the fixture advances exactly ONE partition past the anchor, so the
    # manifest prune reads 1 snapshot instead of all n_live
    assert len(touched) == 1 < n_live
    got = delta.to_pandas()
    assert got["text"].tolist() == ["late edit"]


# ---------------------------------------------------------------------------
# Hypothesis: replay == sequential oracle for arbitrary event lists
# ---------------------------------------------------------------------------

_event = st.tuples(
    st.sampled_from(["upsert", "delete"]),
    st.integers(0, 3),  # conv
    st.integers(0, 3),  # turn
    st.integers(0, 5),  # ts bucket (collisions on purpose)
    st.text(alphabet="abcxyz ", min_size=0, max_size=8),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_event, min_size=1, max_size=40))
def test_replay_matches_oracle_property(events):
    n = len(events)
    t = pa.table(
        {
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
            "op": [e[0] for e in events],
            "conv_id": [f"c{e[1]}" for e in events],
            "turn_idx": pa.array([e[2] for e in events], pa.int32()),
            "role": ["user"] * n,
            "text": [None if e[0] == "delete" else e[4] for e in events],
            "tool": [None] * n,
            "ts": pa.array([1_000_000 * e[3] for e in events], pa.timestamp("us")),
        }
    ).cast(CHANGE_SCHEMA)
    got = cdc.replay(ray.data.from_arrow(t), num_partitions=4).to_pandas()
    want = sequential_lww(t)
    if want.empty:
        assert len(got) == 0
    else:
        assert_frames_equal(got, want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    ep0_events=st.lists(_event, min_size=1, max_size=30),
    ep1_events=st.lists(_event, min_size=1, max_size=30),
)
def test_spill_merge_property(tmp_path_factory, ep0_events, ep1_events):
    """Property: for ARBITRARY two-epoch change lists (ts collisions,
    deletes, duplicate keys), the spill-safe external sorted-run merge
    produces state identical to the in-memory concat+sort path."""
    import pyarrow.parquet as _pq

    tmp = tmp_path_factory.mktemp("spill-prop")

    def epoch_table(events, lsn0):
        n = len(events)
        return pa.table(
            {
                "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
                "op": [e[0] for e in events],
                "conv_id": [f"c{e[1]}" for e in events],
                "turn_idx": pa.array([e[2] for e in events], pa.int32()),
                "role": ["user"] * n,
                "text": [None if e[0] == "delete" else e[4] for e in events],
                "tool": [None] * n,
                "ts": pa.array(
                    [1_000_000 * e[3] for e in events], pa.timestamp("us")
                ),
            }
        ).cast(CHANGE_SCHEMA)

    files = []
    for i, ev in enumerate([ep0_events, ep1_events]):
        p = str(tmp / f"e{i}.parquet")
        _pq.write_table(epoch_table(ev, i * 1000), p)
        files.append([p])
    mem_root, spill_root = str(tmp / "mem"), str(tmp / "spill")
    cdc.replay_commit(mem_root, files, num_partitions=2)
    cdc.replay_commit(
        spill_root, files, num_partitions=2,
        spill_merge_rows=0, spill_merge_chunk_rows=3,
    )
    mem = cdc.read_table(mem_root).to_pandas()
    spill = cdc.read_table(spill_root).to_pandas()
    if mem.empty:
        assert spill.empty
    else:
        assert_frames_equal(spill, mem[spill.columns])
    # tombstone counts per partition identical too
    cm = {m["partition"]: m["tombstones"] for m in mf.latest_commit(mem_root)["partitions"]}
    cs = {m["partition"]: m["tombstones"] for m in mf.latest_commit(spill_root)["partitions"]}
    assert cm == cs


def test_repartition_table(tmp_path):
    """Changing the pinned partitioner = COW rebuild into a new root: state
    identical, tombstones survive, resume picks up the carried
    last_change_epoch and the NEW partitioner, and point lookups route
    through the new layout."""
    epochs, files = _write_epochs(tmp_path, n_epochs=3)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cdc.replay_commit(src, files[:2], num_partitions=8)
    cdc.repartition_table(src, dst, num_partitions=16)
    a = cdc.read_table(src).to_pandas()
    b = cdc.read_table(dst).to_pandas()
    assert_frames_equal(b, a[b.columns])
    c = mf.latest_commit(dst)
    assert c["num_partitions"] == 16
    # tombstones migrated (deletes must keep beating older-ts upserts)
    assert sum(m["tombstones"] for m in c["partitions"]) == sum(
        m["tombstones"] for m in mf.latest_commit(src)["partitions"]
    ) > 0
    # resume: replaying ALL epochs against both roots skips the applied two
    # and applies only epoch 2 — final states equal across partitioners
    cdc.replay_commit(src, files, num_partitions=8)
    cdc.replay_commit(dst, files, num_partitions=999)  # pinned 16 wins
    a2 = cdc.read_table(src).to_pandas()
    b2 = cdc.read_table(dst).to_pandas()
    assert_frames_equal(b2, a2[b2.columns])
    assert mf.latest_commit(dst)["num_partitions"] == 16
    # point lookup routes through the new layout
    row = b2.iloc[5]
    got = cdc.read_turn(dst, row["conv_id"], int(row["turn_idx"])).to_pandas()
    assert len(got) == 1 and got.iloc[0]["text"] == row["text"]
    # refuses to clobber an existing table
    with pytest.raises(FileExistsError):
        cdc.repartition_table(src, dst, num_partitions=4)


def test_read_turn_point_lookup(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    full = cdc.read_table(root).to_pandas()
    row = full.iloc[17]
    got = cdc.read_turn(root, row["conv_id"], int(row["turn_idx"])).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["text"] == row["text"]
    # absent key → empty with proper schema
    missing = cdc.read_turn(root, "conv-does-not-exist", 0)
    assert missing.num_rows == 0
    assert "conv_id" in missing.column_names


def test_table_stats(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    s = cdc.table_stats(root)
    live = cdc.read_table(root).count()
    assert s["live_rows"] == live
    assert s["num_partitions"] == 8
    assert s["epochs_committed"] == 2
    assert s["tombstones"] > 0


def test_compact_crash_window_idempotent(tmp_path):
    """Compaction interrupted after snapshots but before the commit publish:
    re-running produces identical content hashes and the same table state
    (write-then-rename + deterministic output = idempotent recovery)."""
    import json

    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    before = cdc.read_table(root).to_pandas()
    c1 = cdc.compact(root, drop_tombstones=False)
    # simulate the crash window: delete the compaction commit + rewind LATEST
    cpath = os.path.join(root, "_commits", f"epoch-{c1['epoch']:06d}.json")
    os.remove(cpath)
    with open(os.path.join(root, "_commits", "LATEST"), "w") as f:
        f.write(f"epoch-{c1['epoch'] - 1:06d}")
    c2 = cdc.compact(root, drop_tombstones=False)
    h1 = {m["partition"]: m["content_hash"] for m in c1["partitions"]}
    h2 = {m["partition"]: m["content_hash"] for m in c2["partitions"]}
    assert h1 == h2, "recovered compaction rewrote different snapshot content"
    assert c2["epoch"] == c1["epoch"] and c2["last_change_epoch"] == 1
    after = cdc.read_table(root).to_pandas()
    assert_frames_equal(after, before)


def test_changes_since_after_compaction(tmp_path):
    """CDC-out across a compaction boundary: watermark carry-forward keeps
    changes_since(after_epoch) correct — only events newer than the anchor
    commit's watermark flow, tombstones retained when kept."""
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files[:1], num_partitions=8)
    wm0 = mf.latest_commit(root)["watermark"]
    cdc.replay_commit(root, files, num_partitions=8)
    cdc.compact(root, drop_tombstones=False)  # commit epoch 2, no event change
    delta = cdc.changes_since(root, after_epoch=0).to_pandas()
    assert len(delta) > 0
    assert (delta["lsn"] > wm0).all()
    # same delta as before the compaction would have produced: winners of
    # epoch-1 events only
    want = sequential_lww(pa.concat_tables(epochs))  # final state sanity
    got_state = cdc.read_table(root).to_pandas()
    assert_frames_equal(got_state, want)


def test_time_travel_read(tmp_path):
    """read_table(at_epoch=N) reconstructs older committed states exactly."""
    epochs, files = _write_epochs(tmp_path, n_epochs=3)
    root = str(tmp_path / "t")
    for k in range(1, 4):
        cdc.replay_commit(root, files[:k], num_partitions=8)
    for k in range(1, 4):
        got = cdc.read_table(root, at_epoch=k - 1).to_pandas()
        want = sequential_lww(pa.concat_tables(epochs[:k]))
        assert_frames_equal(got, want)
    with pytest.raises(ValueError):
        cdc.read_table(root, at_epoch=99)


def test_vacuum_gc(tmp_path):
    """vacuum deletes snapshots referenced only by pre-retention commits;
    retained epochs stay fully time-travel readable."""
    import glob

    epochs, files = _write_epochs(tmp_path, n_epochs=3)
    root = str(tmp_path / "t")
    for k in range(1, 4):
        cdc.replay_commit(root, files[:k], num_partitions=8)
    n_before = len(glob.glob(os.path.join(root, "parts", "*", "*.parquet")))
    res = cdc.vacuum(root, keep_last=2)
    n_after = len(glob.glob(os.path.join(root, "parts", "*", "*.parquet")))
    assert res["deleted_files"] > 0
    assert n_after == n_before - res["deleted_files"]
    assert res["retained_epochs"] == [1, 2]
    # retained epochs still read (incl. time travel one back)
    got2 = cdc.read_table(root).to_pandas()
    assert_frames_equal(got2, sequential_lww(pa.concat_tables(epochs)))
    got1 = cdc.read_table(root, at_epoch=1).to_pandas()
    assert_frames_equal(got1, sequential_lww(pa.concat_tables(epochs[:2])))


def test_tail_watch_dir(tmp_path):
    """The WAL-tail loop applies files as they land and resumes cleanly."""
    epochs, files = _write_epochs(tmp_path, n_epochs=3)
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    root = str(tmp_path / "t")
    # first two files are already there
    for i in range(2):
        os.link(files[i][0], watch / f"{i:04d}.parquet")
    applied = cdc.tail(
        root, str(watch), num_partitions=8, poll_secs=0.05, max_idle_polls=2
    )
    # both pending files batch into ONE change epoch (one commit round trip)
    assert [c["last_change_epoch"] for c in applied] == [0]
    # a third file lands; a RESTARTED tailer applies only it
    os.link(files[2][0], watch / "0002.parquet")
    applied2 = cdc.tail(
        root, str(watch), num_partitions=8, poll_secs=0.05, max_idle_polls=2
    )
    assert [c["last_change_epoch"] for c in applied2] == [1]
    got = cdc.read_table(root).to_pandas()
    assert_frames_equal(got, sequential_lww(pa.concat_tables(epochs)))


def test_tail_batches_pending_files_into_one_commit(tmp_path):
    """A burst of 5 pending shipper files produces ONE commit (one manifest
    round trip), with per-file fingerprints still tracked in TAIL_STATE."""
    import json

    epochs, files = _write_epochs(tmp_path, n_epochs=5)
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    root = str(tmp_path / "t")
    for i in range(5):
        os.link(files[i][0], watch / f"{i:04d}.parquet")
    applied = cdc.tail(
        root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2
    )
    assert len(applied) == 1
    with open(os.path.join(root, "_commits", "TAIL_STATE")) as f:
        state = json.load(f)["applied"]
    assert len(state) == 5  # fingerprints per file, not per batch
    got = cdc.read_table(root).to_pandas()
    assert_frames_equal(got, sequential_lww(pa.concat_tables(epochs)))


def test_optimistic_concurrency_guard(tmp_path):
    """A writer whose state read is stale must get ConcurrentCommitError at
    publish, never silently clobber the other writer's commit."""
    epochs, files = _write_epochs(tmp_path, n_epochs=1)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    prev = mf.latest_commit(root)
    # writer A read state at epoch 0; writer B (simulated) publishes epoch 1
    mf.commit_epoch(
        root, 1, prev["partitions"], {"simulated": True},
        extra={"num_partitions": 8, "turn_block": 64, "last_change_epoch": 0},
    )
    with pytest.raises(mf.ConcurrentCommitError):
        mf.commit_epoch(
            root, 1, prev["partitions"], {}, expected_prev_epoch=0,
        )
    # the winning commit is intact
    assert mf.latest_commit(root)["stats"] == {"simulated": True}


# ---------------------------------------------------------------------------
# Hypothesis: additive schema evolution — random optional columns per epoch
# ---------------------------------------------------------------------------

_evo_epoch = st.lists(
    st.tuples(
        st.integers(0, 2),  # conv
        st.integers(0, 2),  # turn
        st.text(alphabet="xyz", min_size=1, max_size=4),  # text
        st.one_of(st.none(), st.text(alphabet="m", min_size=1, max_size=2)),  # model?
        st.one_of(st.none(), st.integers(0, 9)),  # score?
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_evo_epoch, min_size=1, max_size=3), st.integers(0, 3))
def test_schema_evolution_property(epoch_rows, drop_mask):
    """Epochs randomly CARRY or LACK the optional columns (model, score);
    replay must equal the pandas oracle over the column-union — earlier
    rows backfill null, no column ever lost."""
    import pandas as pd

    tmp = __import__("tempfile").mkdtemp(prefix="evo-prop-")
    files, frames = [], []
    lsn = 0
    for e, rows in enumerate(epoch_rows):
        n = len(rows)
        data = {
            "lsn": pa.array(range(lsn, lsn + n), pa.int64()),
            "op": ["upsert"] * n,
            "conv_id": [f"c{r[0]}" for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": ["user"] * n,
            "text": [r[2] for r in rows],
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([1_000_000 * (lsn + i) for i in range(n)], pa.timestamp("us")),
        }
        # epoch e carries 'model' iff bit 0 of (drop_mask >> e), 'score' iff bit 1
        if not (drop_mask >> e) & 1:
            data["model"] = pa.array([r[3] for r in rows], pa.string())
        if not (drop_mask >> e) & 2:
            data["score"] = pa.array([r[4] for r in rows], pa.int64())
        t = pa.table(data)
        p = os.path.join(tmp, f"e{e}.parquet")
        pq.write_table(t, p)
        files.append([p])
        frames.append(t.to_pandas())
        lsn += n
    # the oracle's column union = columns that appeared in >= 1 epoch (the
    # engine must not invent columns no epoch carried)
    union_cols = []
    for df in frames:
        for c in df.columns:
            if c not in union_cols:
                union_cols.append(c)
    for i, df in enumerate(frames):
        for c in union_cols:
            if c not in df.columns:
                df[c] = None
        frames[i] = df[union_cols]
    root = os.path.join(tmp, "t")
    cdc.replay_commit(root, files, num_partitions=4)
    got = cdc.read_table(root).to_pandas()
    all_rows = pa.Table.from_pandas(
        __import__("pandas").concat(frames, ignore_index=True), preserve_index=False
    )
    want = sequential_lww(all_rows)
    assert sorted(got.columns) == sorted(want.columns)
    assert_frames_equal(got, want)


def test_read_conversation_pruned(tmp_path):
    """Conversation-level lookup reads only the partitions its turn-blocks
    can route to, and returns every live turn in order."""
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=16)
    full = cdc.read_table(root).to_pandas()
    conv = full["conv_id"].value_counts().index[0]  # busiest conversation
    got = cdc.read_conversation(root, conv).to_pandas()
    want = full[full["conv_id"] == conv].sort_values("turn_idx").reset_index(drop=True)
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    # absent conversation → typed empty
    assert cdc.read_conversation(root, "conv-nope").num_rows == 0
    # pruning really happened: candidate partitions << total for small
    # max_turn (max_turn < turn_block → exactly ONE candidate partition)
    c = mf.latest_commit(root)
    max_turn = max(m.get("max_turn_idx", -1) for m in c["partitions"])
    assert max_turn < 64  # fixture turns < turn_block → 1 block → 1 file read


def test_spill_safe_merge_matches_in_memory(tmp_path):
    """Partitions larger than the spill threshold stream through the external
    sorted-run merge (one chunk + the epoch delta in memory). Final state,
    per-partition row counts and idempotent re-apply must match the
    in-memory concat+sort path exactly."""
    epochs, files = _write_epochs(tmp_path, n_epochs=3, n_events=6000)
    mem_root, spill_root = str(tmp_path / "mem"), str(tmp_path / "spill")
    cdc.replay_commit(mem_root, files, num_partitions=4)
    # threshold 50 rows with 64-row chunks: every non-trivial partition takes
    # the streaming path with many chunks
    cdc.replay_commit(
        spill_root,
        files,
        num_partitions=4,
        spill_merge_rows=50,
        spill_merge_chunk_rows=64,
    )
    mem = cdc.read_table(mem_root).to_pandas()
    spill = cdc.read_table(spill_root).to_pandas()
    assert_frames_equal(spill, mem[spill.columns])
    # snapshots row-identical per partition (tombstones included)
    cm, cs = mf.latest_commit(mem_root), mf.latest_commit(spill_root)
    rows_m = {m["partition"]: m["rows"] for m in cm["partitions"]}
    rows_s = {m["partition"]: m["rows"] for m in cs["partitions"]}
    assert rows_m == rows_s
    assert {m["partition"]: m["tombstones"] for m in cm["partitions"]} == {
        m["partition"]: m["tombstones"] for m in cs["partitions"]
    }
    # idempotent no-op re-apply on the spill path too
    assert (
        cdc.replay_commit(
            spill_root,
            files,
            num_partitions=4,
            spill_merge_rows=50,
            spill_merge_chunk_rows=64,
        )
        == []
    )


def test_read_conversation_legacy_manifest(tmp_path):
    """Manifests written before max_turn_idx existed must not make lookups
    return empty/partial conversations: with the field missing, the prune
    degrades to scanning every non-empty partition."""
    import json

    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=16)
    full = cdc.read_table(root).to_pandas()
    conv = full["conv_id"].value_counts().index[0]
    want = cdc.read_conversation(root, conv).to_pandas()
    # simulate a legacy table: strip max_turn_idx from the committed manifest
    c = mf.latest_commit(root)
    cpath = os.path.join(root, "_commits", f"epoch-{c['epoch']:06d}.json")
    for m in c["partitions"]:
        m.pop("max_turn_idx", None)
    with open(cpath, "w") as f:
        json.dump(c, f)
    got = cdc.read_conversation(root, conv).to_pandas()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_edge_cases_vacuum_tail_conversation(tmp_path):
    """Robustness: vacuum with oversized retention, tail on an empty dir,
    read_conversation/time-travel on fresh tables."""
    epochs, files = _write_epochs(tmp_path, n_epochs=1)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=4)
    # keep_last beyond history: nothing deleted
    res = cdc.vacuum(root, keep_last=10)
    assert res["deleted_files"] == 0
    # tail over an empty watch dir exits after max_idle_polls with no commits
    watch = tmp_path / "empty"
    os.makedirs(watch)
    assert cdc.tail(root, str(watch), poll_secs=0.01, max_idle_polls=2) == []
    # vacuum on a missing table raises
    with pytest.raises(FileNotFoundError):
        cdc.vacuum(str(tmp_path / "nope"))


def test_tail_with_schema_evolution(tmp_path):
    """Files landing in the tail dir may carry NEW columns mid-stream —
    additive evolution must apply through the tail loop."""
    e0 = make_changes(n_events=600, n_convs=10, seed=5, n_epochs=1)[0]
    e1 = make_changes(
        n_events=600, n_convs=10, seed=6, n_epochs=1, start_lsn=10_000,
        evolve_from_epoch=0,
    )[0]
    assert "model" in e1.column_names and "model" not in e0.column_names
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    pq.write_table(e0, watch / "0000.parquet")
    pq.write_table(e1, watch / "0001.parquet")
    root = str(tmp_path / "t")
    applied = cdc.tail(root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2)
    assert len(applied) == 1  # both pending files batch into one epoch
    got = cdc.read_table(root).to_pandas()
    assert "model" in got.columns
    df1 = e1.to_pandas()
    df0 = e0.to_pandas()
    df0["model"] = None
    want = sequential_lww(pa.Table.from_pandas(
        __import__("pandas").concat([df0, df1], ignore_index=True), preserve_index=False
    ))
    assert_frames_equal(got, want)


def test_tail_survives_pruned_and_late_files(tmp_path):
    """Applied files removed by the shipper, and a late file sorting BEFORE
    an applied one, must not stall or skip the tailer (file-name state, not
    a count cursor)."""
    epochs, files = _write_epochs(tmp_path, n_epochs=3)
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    root = str(tmp_path / "t")
    os.link(files[0][0], watch / "0005.parquet")
    cdc.tail(root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2)
    # shipper prunes the applied file; a new one lands
    os.remove(watch / "0005.parquet")
    os.link(files[1][0], watch / "0007.parquet")
    applied = cdc.tail(root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2)
    assert len(applied) == 1, "tailer stalled after shipper pruned applied files"
    # a LATE file sorting before the applied ones still gets applied
    os.link(files[2][0], watch / "0001.parquet")
    applied = cdc.tail(root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2)
    assert len(applied) == 1, "late-sorting file skipped"
    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs))
    assert_frames_equal(got, want)


def test_tail_reprocesses_reused_name_with_new_content(tmp_path):
    """A pruned file NAME reused for NEW content must be re-processed: the
    applied-state entry is a (size, mtime_ns) fingerprint, so the reused
    name mismatches and applies as a fresh epoch (a name-presence cursor
    would silently skip it)."""
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    root = str(tmp_path / "t")
    os.link(files[0][0], watch / "0001.parquet")
    cdc.tail(root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2)
    # shipper prunes, then REUSES the name for epoch 1's content
    os.remove(watch / "0001.parquet")
    os.link(files[1][0], watch / "0001.parquet")
    applied = cdc.tail(root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2)
    assert len(applied) == 1, "reused name with new content was skipped"
    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs))
    assert_frames_equal(got, want)


def test_tail_retries_after_concurrent_commit(tmp_path, monkeypatch):
    """A commit race (e.g. a compactor publishing between the tailer's state
    read and its publish) must not kill the tail loop: fingerprints are only
    saved after a successful commit, so the loop re-enters, re-reads table
    state, and re-applies the same batch."""
    epochs, files = _write_epochs(tmp_path, n_epochs=1)
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    root = str(tmp_path / "t")
    os.link(files[0][0], watch / "0001.parquet")

    real = cdc.replay_commit
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise mf.ConcurrentCommitError("simulated concurrent compaction")
        return real(*a, **k)

    monkeypatch.setattr(cdc, "replay_commit", flaky)
    applied = cdc.tail(
        root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=2
    )
    assert calls["n"] == 2, "tail did not retry after ConcurrentCommitError"
    assert len(applied) == 1
    got = cdc.read_table(root).to_pandas()
    assert_frames_equal(got, sequential_lww(pa.concat_tables(epochs)))
