"""Incremental materialized-view maintenance (pipelines/views.py):
exactness vs full recompute, manifest-level pruning of untouched partitions,
no-op / compaction / delete semantics, streaming partial build."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.pipelines.views import read_conv_stats, refresh_conv_stats
from tinyetl_ray.schema import CHANGE_SCHEMA
from tinyetl_ray.state import manifest as mf
from tinyetl_ray.synth import make_changes

from .util import sequential_lww


def _write_epochs(tmp_path, n_epochs=3, n_events=3000, **kw):
    epochs = make_changes(n_events=n_events, n_convs=40, seed=29, n_epochs=n_epochs, **kw)
    files = []
    for e, t in enumerate(epochs):
        p = tmp_path / f"e{e}.parquet"
        pq.write_table(t, p)
        files.append([str(p)])
    return epochs, files


def _expected_stats(final: pd.DataFrame) -> pd.DataFrame:
    g = final.groupby("conv_id")
    out = pd.DataFrame(
        {
            "turns": g.size(),
            "chars": g["text"].apply(lambda s: s.str.len().sum()),
            "last_ts": g["ts"].max(),
        }
    ).reset_index()
    return out.sort_values("conv_id").reset_index(drop=True)


def _got_stats(view_root: str) -> pd.DataFrame:
    df = read_conv_stats(view_root).to_pandas()
    if df.empty:  # Ray drops empty blocks, so a 0-row dataset loses columns
        return df
    return df.sort_values("conv_id").reset_index(drop=True)[
        ["conv_id", "turns", "chars", "last_ts"]
    ]


def _assert_stats_match(view_root: str, epochs: list[pa.Table]) -> None:
    want = _expected_stats(sequential_lww(pa.concat_tables(epochs)))
    got = _got_stats(view_root)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_full_refresh_matches_recompute(tmp_path):
    epochs, files = _write_epochs(tmp_path)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=8)
    c = refresh_conv_stats(root, view)
    assert c["stats"]["partitions_rebuilt"] > 0
    _assert_stats_match(view, epochs)


def test_incremental_refresh_prunes_untouched(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=2, n_events=4000)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files[:1], num_partitions=8)
    c0 = refresh_conv_stats(root, view)
    _assert_stats_match(view, epochs[:1])
    by_pid0 = {m["partition"]: m for m in c0["partitions"]}

    # second wave touches only one conversation -> few partitions
    import pyarrow.compute as pc

    one_conv = epochs[1].column("conv_id")[0]
    small = epochs[1].filter(pc.equal(epochs[1].column("conv_id"), one_conv))
    p = tmp_path / "late.parquet"
    pq.write_table(small, p)
    cdc.replay_commit(root, [[str(p)]], num_partitions=8, first_change_epoch=1)
    c1 = refresh_conv_stats(root, view)
    assert c1["stats"]["partitions_rebuilt"] < 8, "refresh rebuilt everything"
    # untouched view partitions carried forward by manifest reference
    rebuilt = {
        m["partition"]
        for m in c1["partitions"]
        if m["epoch"] == c1["epoch"]
    }
    for m in c1["partitions"]:
        if m["partition"] not in rebuilt:
            assert m == by_pid0[m["partition"]], "carried manifest mutated"
    _assert_stats_match(view, [epochs[0], small])


def test_refresh_is_noop_when_current(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=1)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=4)
    c0 = refresh_conv_stats(root, view)
    c1 = refresh_conv_stats(root, view)
    assert c1["epoch"] == c0["epoch"] and len(mf.list_commits(view)) == 1


def test_compaction_publishes_metadata_only_epoch(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=4)
    refresh_conv_stats(root, view)
    cdc.compact(root, drop_tombstones=True)
    c = refresh_conv_stats(root, view)
    # tombstone GC never advances a watermark: nothing rebuilt, base_epoch
    # recorded so the next refresh is a pure no-op
    assert c["stats"]["partitions_rebuilt"] == 0
    assert c["base_epoch"] == mf.latest_commit(root)["epoch"]
    _assert_stats_match(view, epochs)
    assert refresh_conv_stats(root, view)["epoch"] == c["epoch"]


def test_delete_drops_from_stats(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=1, n_events=2000)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=4)
    refresh_conv_stats(root, view)
    final = sequential_lww(pa.concat_tables(epochs))
    victim = final.iloc[0]
    max_lsn = max(int(t.column("lsn")[-1].as_py()) for t in epochs)
    tomb = pa.table(
        {
            "lsn": pa.array([max_lsn + 1], pa.int64()),
            "op": ["delete"],
            "conv_id": [victim["conv_id"]],
            "turn_idx": pa.array([victim["turn_idx"]], pa.int32()),
            "role": [None],
            "text": [None],
            "tool": [None],
            "ts": pa.array([pd.Timestamp("2026-01-01").value // 1000], pa.timestamp("us")),
        }
    ).cast(CHANGE_SCHEMA)
    p = tmp_path / "tomb.parquet"
    pq.write_table(tomb, p)
    cdc.replay_commit(root, [[str(p)]], num_partitions=4, first_change_epoch=1)
    refresh_conv_stats(root, view)
    got = _got_stats(view)
    want = _expected_stats(cdc.read_table(root).to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the victim's conversation lost exactly one turn
    before = _expected_stats(final)
    row_b = before[before["conv_id"] == victim["conv_id"]]["turns"].iloc[0]
    row_a = want[want["conv_id"] == victim["conv_id"]]
    assert row_a.empty or row_a["turns"].iloc[0] == row_b - 1


def test_losing_lww_epoch_rebuilds_nothing(tmp_path):
    """An epoch whose events all LOSE last-writer-wins (older ts than the
    incumbents, despite higher lsn) changes no surviving row — the partition
    watermarks (max lsn of SURVIVING rows) stay put, so the view refresh
    publishes a metadata-only epoch and the stats remain exact."""
    import pyarrow.compute as pc

    epochs, files = _write_epochs(tmp_path, n_epochs=1, n_events=2000)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=8)
    refresh_conv_stats(root, view)

    stale = epochs[0].set_column(
        epochs[0].column_names.index("lsn"),
        "lsn",
        pc.add(epochs[0].column("lsn"), 1_000_000),
    )
    stale = stale.set_column(
        stale.column_names.index("ts"),
        "ts",
        pc.subtract(stale.column("ts").cast(pa.int64()), 86_400_000_000).cast(
            pa.timestamp("us")
        ),
    )
    p = tmp_path / "stale.parquet"
    pq.write_table(stale, p)
    cdc.replay_commit(root, [[str(p)]], num_partitions=8, first_change_epoch=1)
    c = refresh_conv_stats(root, view)
    assert c["stats"]["partitions_rebuilt"] == 0
    _assert_stats_match(view, epochs)


def test_refresh_follows_base_restore(tmp_path):
    """Rolling the BASE back (cdc.restore) regresses partition watermarks —
    the refresh must detect the inequality and rebuild, or the view would
    silently keep the rolled-back state."""
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=8)
    refresh_conv_stats(root, view)
    _assert_stats_match(view, epochs)
    cdc.restore(root, 0)
    c = refresh_conv_stats(root, view)
    assert c["stats"]["partitions_rebuilt"] > 0
    _assert_stats_match(view, epochs[:1])
    # rolling forward again (restore to the pre-rollback epoch) re-syncs too
    cdc.restore(root, 1)
    refresh_conv_stats(root, view)
    _assert_stats_match(view, epochs)


from hypothesis import strategies as _st

_event = _st.tuples(
    _st.sampled_from(["upsert", "delete"]),
    _st.integers(0, 3),  # conv
    _st.integers(0, 3),  # turn
    _st.integers(0, 5),  # ts bucket (collisions on purpose)
    _st.text(alphabet="abcxyz ", min_size=0, max_size=8),
)


def _epoch_table(events, lsn0):
    import numpy as np

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
            "ts": pa.array([1_000_000 * e[3] for e in events], pa.timestamp("us")),
        }
    ).cast(CHANGE_SCHEMA)


def test_view_refresh_property(tmp_path_factory):
    """Property: for ARBITRARY epoch sequences (ts collisions, deletes,
    duplicate keys — including epochs that entirely lose LWW), refreshing
    after every commit always equals a from-scratch recompute of the
    current state's stats."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        eps=st.lists(
            st.lists(_event, min_size=1, max_size=20), min_size=1, max_size=3
        )
    )
    def run(eps):
        tmp = tmp_path_factory.mktemp("views-prop")
        root, view = str(tmp / "t"), str(tmp / "v")
        files, tables = [], []
        for i, ev in enumerate(eps):
            t = _epoch_table(ev, i * 1000)
            p = str(tmp / f"e{i}.parquet")
            pq.write_table(t, p)
            files.append([p])
            tables.append(t)
            cdc.replay_commit(root, files, num_partitions=3)
            refresh_conv_stats(root, view)
            final = sequential_lww(pa.concat_tables(tables))
            got = _got_stats(view)
            if final.empty:  # every winner is a delete: view must be empty
                assert len(got) == 0
            else:
                pd.testing.assert_frame_equal(
                    got, _expected_stats(final), check_dtype=False
                )

    run()


def test_streaming_build_chunks_equal_default(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=1, n_events=2500)
    root = str(tmp_path / "t")
    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    cdc.replay_commit(root, files, num_partitions=4)
    refresh_conv_stats(root, v1)
    refresh_conv_stats(root, v2, build_chunk_rows=64)  # many chunks per partition
    pd.testing.assert_frame_equal(_got_stats(v1), _got_stats(v2))
    # and the chunked build's snapshots hash identically (sorted partials)
    h1 = {m["partition"]: m["content_hash"] for m in mf.latest_commit(v1)["partitions"]}
    h2 = {m["partition"]: m["content_hash"] for m in mf.latest_commit(v2)["partitions"]}
    assert h1 == h2


def test_role_stats_spec_generality(tmp_path):
    """A second spec over the same base table: per-role message counts,
    char sums, first/last timestamps — exact vs a pandas recompute, and a
    view root refuses a refresh/read under the wrong spec."""
    import pytest

    from tinyetl_ray.pipelines.views import ROLE_STATS, read_view, refresh_view

    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files[:1], num_partitions=8)
    vc, vr = str(tmp_path / "conv"), str(tmp_path / "role")
    refresh_conv_stats(root, vc)
    refresh_view(root, vr, ROLE_STATS)
    cdc.replay_commit(root, files, num_partitions=8)
    refresh_view(root, vr, ROLE_STATS)

    got = (
        read_view(vr, ROLE_STATS)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)[["role", "messages", "chars", "first_ts", "last_ts"]]
    )
    final = sequential_lww(pa.concat_tables(epochs))
    g = final.groupby("role")
    want = pd.DataFrame(
        {
            "messages": g.size(),
            "chars": g["text"].apply(lambda s: s.str.len().sum()),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
        }
    ).reset_index().sort_values("role").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # spec-mismatch guards: wrong spec on an existing view root
    with pytest.raises(ValueError, match="holds view"):
        refresh_view(root, vc, ROLE_STATS)
    with pytest.raises(ValueError, match="holds view"):
        read_view(vc, ROLE_STATS)


def test_view_over_evolved_column(tmp_path):
    """A spec aggregating an EVOLVED column must not crash on snapshots
    written before the column existed: missing columns backfill null, which
    contributes nothing to sum_len/max/min."""
    from tinyetl_ray.pipelines.views import ViewAgg, ViewSpec, read_view, refresh_view

    epochs, _files = _write_epochs(tmp_path, n_epochs=2, n_events=2000)
    # epoch 0 physically LACKS the evolved `model` column; epoch 1 has it
    e0 = epochs[0]
    e1 = epochs[1].append_column(
        "model",
        pa.array(
            [f"m{i % 3}" for i in range(len(epochs[1]))], pa.string()
        ),
    )
    p0, p1 = tmp_path / "v0.parquet", tmp_path / "v1.parquet"
    pq.write_table(e0, p0)
    pq.write_table(e1, p1)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, [[str(p0)]], num_partitions=4)
    spec = ViewSpec(
        name="model_chars",
        key="conv_id",
        aggs=(ViewAgg("turns", "count"), ViewAgg("model_chars", "sum_len", "model")),
    )
    refresh_view(root, view, spec)  # all partials from model-less snapshots
    cdc.replay_commit(root, [[str(p0)], [str(p1)]], num_partitions=4)
    refresh_view(root, view, spec)

    got = (
        read_view(view, spec)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    final = cdc.read_table(root).to_pandas()
    g = final.groupby("conv_id")
    want = pd.DataFrame(
        {
            "turns": g.size(),
            "model_chars": g["model"].apply(lambda s: int(s.str.len().sum())),
        }
    ).reset_index().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_refresh_retries_through_occ_conflict(tmp_path, monkeypatch):
    """A refresher whose publish loses to a concurrent writer must retry by
    re-entering (re-reads both manifests) instead of dying; content-addressed
    snapshots make the retry clobber-free."""
    epochs, files = _write_epochs(tmp_path, n_epochs=1, n_events=1500)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=4)

    real = mf.commit_epoch
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise mf.ConcurrentCommitError("simulated racing refresher")
        return real(*a, **k)

    monkeypatch.setattr(mf, "commit_epoch", flaky)
    c = refresh_conv_stats(root, view)
    assert calls["n"] == 2 and c["stats"]["partitions_rebuilt"] > 0
    _assert_stats_match(view, epochs)

def test_view_rebuilds_after_restore_reapply_coinciding_watermark(tmp_path):
    """Round-4 advice: equal per-partition watermark is NOT proof of
    identity once restore exists. Restore the base, re-apply the same lsns
    with DIFFERENT payload — watermarks coincide with what the view
    recorded, and only the live_hash comparison forces the rebuild."""
    import pyarrow.compute as pc

    epochs, files = _write_epochs(tmp_path, n_epochs=2, n_events=3000)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files, num_partitions=4)
    refresh_conv_stats(root, view)
    _assert_stats_match(view, epochs)

    cdc.restore(root, 0)
    t1 = epochs[1]
    mut = pc.binary_replace_slice(t1.column("text"), start=0, stop=0, replacement="ALT-")
    t1b = t1.set_column(t1.column_names.index("text"), "text", mut).cast(CHANGE_SCHEMA)
    p = tmp_path / "alt.parquet"
    pq.write_table(t1b, p)
    cdc.replay_commit(root, [[str(p)]], num_partitions=4, first_change_epoch=1)

    c = refresh_conv_stats(root, view)
    assert c["stats"]["partitions_rebuilt"] > 0, "view silently kept stale state"
    _assert_stats_match(view, [epochs[0], t1b])


def test_view_drops_partitions_vanished_by_restore(tmp_path):
    """cdc.restore to an epoch that PREDATES a partition's first write
    publishes a base commit WITHOUT that partition — the refresh must drop
    its partial, not carry the rolled-back rows forward forever."""
    tiny = make_changes(n_events=30, n_convs=1, seed=5, n_epochs=1)[0]
    wide = make_changes(n_events=2500, n_convs=40, seed=6, n_epochs=1)[0]
    # re-lsn the wide epoch ABOVE the tiny one so it applies as epoch 1
    import numpy as np

    lsn0 = int(pa.compute.max(tiny.column("lsn")).as_py()) + 1
    wide = wide.set_column(
        wide.column_names.index("lsn"),
        "lsn",
        pa.array(np.arange(lsn0, lsn0 + len(wide), dtype=np.int64)),
    )
    p0, p1 = tmp_path / "e0.parquet", tmp_path / "e1.parquet"
    pq.write_table(tiny, p0)
    pq.write_table(wide, p1)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, [[str(p0)]], num_partitions=8)
    n_parts_e0 = len(mf.latest_commit(root)["partitions"])
    cdc.replay_commit(root, [[str(p0)], [str(p1)]], num_partitions=8)
    assert len(mf.latest_commit(root)["partitions"]) > n_parts_e0, (
        "test needs epoch 1 to introduce NEW partitions"
    )
    refresh_conv_stats(root, view)
    cdc.restore(root, 0)
    refresh_conv_stats(root, view)
    got = _got_stats(view)
    base = cdc.read_table(root).to_pandas()
    assert set(got["conv_id"]) == set(base["conv_id"]), (
        "view kept conversations from partitions the restore removed"
    )
    _assert_stats_match(view, [tiny])


def test_read_view_empty_has_final_schema(tmp_path):
    """A fully-empty view reads back 0 rows IN THE FINAL SCHEMA (same
    column names and types as a non-empty read — e.g. last_ts as
    timestamp, not the partial's last_ts_us int64)."""
    epochs, files = _write_epochs(tmp_path, n_epochs=1, n_events=60)
    # delete EVERY surviving turn
    final = sequential_lww(pa.concat_tables(epochs))
    n = len(final)
    lsn0 = int(pa.compute.max(epochs[0].column("lsn")).as_py()) + 1
    import numpy as np

    deletes = pa.table(
        {
            "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
            "op": ["delete"] * n,
            "conv_id": pa.array(final["conv_id"].tolist(), pa.string()),
            "turn_idx": pa.array(final["turn_idx"].tolist(), pa.int32()),
            "role": [None] * n,
            "text": [None] * n,
            "tool": [None] * n,
            # strictly NEWER than every upsert so the deletes win LWW
            "ts": pa.array(
                [int(final["ts"].max().value // 1000) + 1_000_000] * n,
                pa.timestamp("us"),
            ),
        }
    ).cast(CHANGE_SCHEMA)
    pd_ = tmp_path / "deletes.parquet"
    pq.write_table(deletes, pd_)
    root, view = str(tmp_path / "t"), str(tmp_path / "v")
    cdc.replay_commit(root, files + [[str(pd_)]], num_partitions=4)
    cdc.compact(root, drop_tombstones=True)
    refresh_conv_stats(root, view)
    ds = read_conv_stats(view)
    sch = ds.schema()
    assert ds.count() == 0
    assert sch.names == ["conv_id", "turns", "chars", "last_ts"]
    assert "timestamp" in str(sch.types[sch.names.index("last_ts")])
