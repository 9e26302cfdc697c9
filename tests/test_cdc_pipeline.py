"""E2E replay vs exact-state oracle + exactly-once + resume (SURVEY.md §5.2)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.schema import CHANGE_SCHEMA
from tinyetl_ray.state import manifest as mf
from tinyetl_ray.synth import make_base, make_changes

from .util import assert_frames_equal, sequential_lww


@pytest.fixture()
def small_log(tmp_path):
    base = make_base(n_convs=40, seed=7)
    epochs = make_changes(
        n_events=4000, n_convs=40, seed=11, n_epochs=3, evolve_from_epoch=2
    )
    epoch_files = []
    for e, t in enumerate(epochs):
        p = tmp_path / f"changes/epoch={e}.parquet"
        os.makedirs(p.parent, exist_ok=True)
        pq.write_table(t, p)
        epoch_files.append([str(p)])
    return base, epochs, epoch_files


def test_replay_matches_sequential_oracle(small_log):
    base, epochs, _ = small_log
    changes = pa.concat_tables(epochs, promote_options="default")
    got = cdc.replay(
        ray.data.from_arrow(changes), ray.data.from_arrow(base), num_partitions=16
    ).to_pandas()
    want = sequential_lww(changes, base)
    assert_frames_equal(got, want)
    # schema evolution: merged table carries `model`, null for pre-evolution winners
    assert "model" in got.columns
    assert got["model"].isna().any() and got["model"].notna().any()


def test_replay_without_base(small_log):
    _, epochs, _ = small_log
    changes = pa.concat_tables(epochs, promote_options="default")
    got = cdc.replay(ray.data.from_arrow(changes), num_partitions=8).to_pandas()
    want = sequential_lww(changes)
    assert_frames_equal(got, want)


def test_commit_resume_exactly_once(small_log, tmp_path):
    base, epochs, epoch_files = small_log
    root = str(tmp_path / "table")

    # epoch 0 only
    commits = cdc.replay_commit(root, epoch_files[:1], num_partitions=8)
    assert len(commits) == 1 and commits[0]["epoch"] == 0
    wm0 = commits[0]["watermark"]

    # re-apply epoch 0 → skipped (already committed), state unchanged
    again = cdc.replay_commit(root, epoch_files[:1], num_partitions=8)
    assert again == []
    assert mf.latest_commit(root)["watermark"] == wm0

    # resume with all epochs → applies 1, 2 only
    commits = cdc.replay_commit(root, epoch_files, num_partitions=8)
    assert [c["epoch"] for c in commits] == [1, 2]

    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs, promote_options="default"))
    assert_frames_equal(got, want)

    # incremental result == one-shot full replay into a fresh table
    root2 = str(tmp_path / "table2")
    cdc.replay_commit(root2, [sum(epoch_files, [])], num_partitions=8)
    got2 = cdc.read_table(root2).to_pandas()
    assert_frames_equal(got2, want)


def test_commit_is_idempotent_on_rerun(small_log, tmp_path):
    """Simulated failure-between-write-and-commit: wipe the commit record,
    keep snapshot files, re-run the epoch → identical content hashes."""
    _, _, epoch_files = small_log
    root = str(tmp_path / "table")
    c1 = cdc.replay_commit(root, epoch_files[:1], num_partitions=8)[0]
    # crash before commit published: remove _commits, snapshots remain
    for f in os.listdir(os.path.join(root, mf.COMMITS_DIR)):
        os.remove(os.path.join(root, mf.COMMITS_DIR, f))
    c2 = cdc.replay_commit(root, epoch_files[:1], num_partitions=8)[0]
    h1 = {m["partition"]: m["content_hash"] for m in c1["partitions"]}
    h2 = {m["partition"]: m["content_hash"] for m in c2["partitions"]}
    assert h1 == h2


def test_lineage_and_metrics(small_log, tmp_path):
    _, _, epoch_files = small_log
    root = str(tmp_path / "table")
    cdc.replay_commit(root, epoch_files, num_partitions=8)
    lineage = mf.list_commits(root)
    assert [c["epoch"] for c in lineage] == [0, 1, 2]
    for c in lineage:
        assert c["watermark"] >= 0
        for m in c["partitions"]:
            assert {"rows", "tombstones", "live_rows", "lsn_watermark", "content_hash"} <= set(m)
        assert "epoch_secs" in c["stats"]


def test_malformed_events_raise_or_drop():
    bad = pa.table(
        {
            "lsn": pa.array([1, None], pa.int64()),
            "op": ["upsert", "bogus"],
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["x", "y"],
            "tool": [None, None],
            "ts": pa.array([100, 100], pa.timestamp("us")),
        }
    )
    with pytest.raises(Exception):
        cdc.replay(ray.data.from_arrow(bad), num_partitions=2).materialize()
    ok = cdc.replay(ray.data.from_arrow(bad), num_partitions=2, on_error="drop").to_pandas()
    assert len(ok) == 1 and ok.iloc[0]["conv_id"] == "a"


def test_null_ts_event_rejected():
    """ts is the LWW tiebreak (sorted nulls-last): a null-ts event must be
    rejected at decode, not silently win every merge."""
    bad = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": ["upsert", "upsert"],
            "conv_id": ["a", "a"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["real", "null-ts-imposter"],
            "tool": [None, None],
            "ts": pa.array([100, None], pa.timestamp("us")),
        }
    )
    with pytest.raises(Exception):
        cdc.replay(ray.data.from_arrow(bad), num_partitions=2).materialize()
    ok = cdc.replay(ray.data.from_arrow(bad), num_partitions=2, on_error="drop").to_pandas()
    assert ok["text"].tolist() == ["real"]


def test_quarantine_dead_letter(tmp_path):
    import glob

    bad = pa.table(
        {
            "lsn": pa.array([1, None, 3], pa.int64()),
            "op": ["upsert", "upsert", "bogus"],
            "conv_id": ["a", "b", "c"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": ["user"] * 3,
            "text": ["x", "y", "z"],
            "tool": [None] * 3,
            "ts": pa.array([100, 100, 100], pa.timestamp("us")),
        }
    )
    qdir = str(tmp_path / "quarantine")
    ok = cdc.replay(
        ray.data.from_arrow(bad),
        num_partitions=2,
        on_error="quarantine",
        quarantine_dir=qdir,
    ).to_pandas()
    assert ok["conv_id"].tolist() == ["a"]
    qfiles = glob.glob(qdir + "/*.parquet")
    assert qfiles
    quarantined = pa.concat_tables([pq.read_table(f) for f in qfiles])
    assert quarantined.num_rows == 2
    assert set(quarantined.column("conv_id").to_pylist()) == {"b", "c"}


def test_hot_conversation_stress(tmp_path):
    """One conversation with 50k turns: salting must spread it across
    partitions and the merged table must stay exact."""
    import numpy as np

    n = 50_000
    turn = np.arange(n, dtype=np.int32) % 10_000
    t = pa.table(
        {
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
            "op": ["upsert"] * n,
            "conv_id": ["hot"] * n,
            "turn_idx": pa.array(turn),
            "role": ["user"] * n,
            "text": [f"t{i}" for i in range(n)],
            "tool": [None] * n,
            "ts": pa.array((np.arange(n, dtype=np.int64) // 7) * 1_000_000, pa.timestamp("us")),
        }
    )
    out = cdc.replay(
        ray.data.from_arrow(t), num_partitions=16, keep_partition_col=True
    ).to_pandas()
    # every turn present exactly once; winner = max lsn per turn (ts grows with lsn)
    assert len(out) == 10_000
    assert out["partition_id"].nunique() >= 8  # hot conv spread by turn-range salt
    w = out.set_index("turn_idx")["text"]
    for turn_idx in (0, 1, 9_999):
        last_lsn = max(i for i in range(n) if i % 10_000 == turn_idx)
        assert w[turn_idx] == f"t{last_lsn}"


def test_read_table_column_pruning(small_log, tmp_path):
    _, epochs, epoch_files = small_log
    root = str(tmp_path / "table")
    cdc.replay_commit(root, epoch_files, num_partitions=8)
    slim = cdc.read_table(root, columns=["conv_id", "turn_idx"]).to_pandas()
    full = cdc.read_table(root).to_pandas()
    assert list(slim.columns) == ["conv_id", "turn_idx"]
    assert len(slim) == len(full)
    # evolved column requested → falls back to aligned read, still correct
    ev = cdc.read_table(root, columns=["conv_id", "model"]).to_pandas()
    assert list(ev.columns) == ["conv_id", "model"] and len(ev) == len(full)


def test_unicode_and_long_text_torture(tmp_path):
    texts = [
        "emoji 🎉🚀 and ünïcödé — 中文テキスト; quotes \"'` and \\ backslash",
        "x" * 5000,          # long text
        "",                  # empty string (distinct from null)
        "line\nbreaks\tand\ttabs",
    ]
    n = len(texts)
    t = pa.table(
        {
            "lsn": pa.array(range(n), pa.int64()),
            "op": ["upsert"] * n,
            "conv_id": [f"c{i}" for i in range(n)],
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": ["user"] * n,
            "text": texts,
            "tool": [None] * n,
            "ts": pa.array([1_000_000 * i for i in range(n)], pa.timestamp("us")),
        }
    ).cast(CHANGE_SCHEMA)
    p = tmp_path / "torture.parquet"
    pq.write_table(t, p)
    root = str(tmp_path / "table")
    cdc.replay_commit(root, [[str(p)]], num_partitions=4)
    got = cdc.read_table(root).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert got["text"].tolist() == texts  # per-turn text-exact through the lake


def test_task_retry_exactly_once(tmp_path):
    """A pipeline task fails once (injected); Ray's task retry reruns it and
    the final merged state is still exact — the 'exactly-once across
    retries' property (SURVEY §7.3) exercised with a REAL mid-pipeline
    failure, not a simulated rerun."""
    epochs = make_changes(n_events=2000, n_convs=30, seed=21, n_epochs=1)
    p = tmp_path / "log.parquet"
    pq.write_table(epochs[0], p)
    flag = tmp_path / "blew-up-once"

    def flaky(t: pa.Table) -> pa.Table:
        # kill the worker PROCESS (system failure → Ray task retry); a plain
        # exception would be user-code and correctly fail the job instead
        if not flag.exists():
            flag.write_text("x")
            os._exit(1)
        return t

    ds = ray.data.read_parquet(str(p)).map_batches(flaky, batch_format="pyarrow")
    got = cdc.replay(ds, num_partitions=4).to_pandas()
    assert flag.exists()  # the failure really fired
    want = sequential_lww(epochs[0])
    assert_frames_equal(got, want)


def test_assemble_conversations_edges():
    """Null role/text render as empty strings; turns ordered by turn_idx even
    when delivered across many blocks; one output row per conversation."""
    t = pa.table(
        {
            "conv_id": ["b", "a", "a", "b", "a"],
            "turn_idx": pa.array([1, 2, 0, 0, 1], pa.int32()),
            "role": ["user", None, "system", "tool", "assistant"],
            "text": ["hi", "late", "sys", None, "mid"],
            "tool": [None] * 5,
            "ts": pa.array([0] * 5, pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)  # one row per block
    got = (
        cdc.assemble_conversations(ds)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == ["a", "b"]
    assert got["n_turns"].tolist() == [3, 2]
    assert got["transcript"].tolist() == [
        "system: sys\nassistant: mid\n: late",
        "tool: \nuser: hi",
    ]


def test_turn_context_windows_edges():
    """Window truncates at conversation start, never crosses conversations,
    and k larger than the conversation length degrades to full history."""
    t = pa.table(
        {
            "conv_id": ["a", "a", "a", "b"],
            "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
            "role": ["u", "a", "u", "u"],
            "text": ["one", "two", "three", "solo"],
            "tool": [None] * 4,
            "ts": pa.array([0] * 4, pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = (
        cdc.turn_context_windows(ds, k=5)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["context"].tolist() == [
        "u: one",
        "u: one\na: two",
        "u: one\na: two\nu: three",
        "u: solo",
    ]
