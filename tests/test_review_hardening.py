"""Round-5 adversarial-review hardening: exclusive OCC publish + LATEST
heal, tail's pre-apply fingerprints, base-row validation, vacuum's
in-flight-writer exemptions, and compaction of all-tombstone partitions."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.schema import CHANGE_SCHEMA
from tinyetl_ray.state import manifest as mf
from tinyetl_ray.synth import make_base, make_changes

from .util import assert_frames_equal, sequential_lww


def _write_epochs(tmp_path, n_epochs=2, n_events=1200):
    epochs = make_changes(n_events=n_events, n_convs=30, seed=77, n_epochs=n_epochs)
    files = []
    for e, t in enumerate(epochs):
        p = tmp_path / f"e{e}.parquet"
        pq.write_table(t, p)
        files.append([str(p)])
    return epochs, files


# ---------------------------------------------------------------------------
# commit_epoch: the epoch JSON publish is an atomic create-if-absent
# ---------------------------------------------------------------------------


def test_commit_publish_is_exclusive_not_clobbering(tmp_path):
    """Two writers that BOTH passed the optimistic check (the check-then-act
    race window) cannot both publish: the second hits the exclusive create
    and gets ConcurrentCommitError; the winner's commit bytes survive."""
    _, files = _write_epochs(tmp_path, n_epochs=1)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=4)
    prev = mf.latest_commit(root)
    mf.commit_epoch(
        root, 1, prev["partitions"], {"writer": "A"},
        extra={"num_partitions": 4, "turn_block": 64, "last_change_epoch": 0},
    )
    # writer B skipped/passed the early check (simulated by omitting the
    # OCC arg) — the exclusive epoch-JSON create must still stop it
    with pytest.raises(mf.ConcurrentCommitError):
        mf.commit_epoch(
            root, 1, prev["partitions"], {"writer": "B"},
            extra={"num_partitions": 4, "turn_block": 64, "last_change_epoch": 0},
        )
    assert mf.latest_commit(root)["stats"] == {"writer": "A"}


def test_commit_republish_identical_bytes_is_idempotent(tmp_path):
    """A writer that crashed between the JSON publish and the LATEST update
    may re-publish the SAME commit (byte-identical) without error."""
    _, files = _write_epochs(tmp_path, n_epochs=1)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=4)
    prev = mf.latest_commit(root)
    args = (root, 1, prev["partitions"], {"writer": "A"})
    kw = dict(extra={"num_partitions": 4, "turn_block": 64, "last_change_epoch": 0})
    c1 = mf.commit_epoch(*args, **kw)
    c2 = mf.commit_epoch(*args, **kw)  # identical bytes -> accepted
    assert c1 == c2
    assert mf.latest_commit(root)["epoch"] == 1


def test_latest_commit_heals_lagging_pointer(tmp_path):
    """The epoch JSON is the commit point: a LATEST pointer that lags
    (writer crashed between the two writes) is healed by readers, and a
    stale writer's OCC check fails against the HEALED epoch."""
    _, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, [files[0]], num_partitions=4)
    cdc.replay_commit(root, files, num_partitions=4)  # resume applies e1
    assert mf.latest_commit(root)["epoch"] == 1
    # crash window: epoch-1 JSON exists, LATEST still says epoch 0
    with open(os.path.join(root, "_commits", "LATEST"), "w") as f:
        f.write("epoch-000000")
    healed = mf.latest_commit(root)
    assert healed["epoch"] == 1
    with pytest.raises(mf.ConcurrentCommitError):
        mf.commit_epoch(
            root, 1, healed["partitions"], {}, expected_prev_epoch=0,
        )
    # first-ever-commit crash window: LATEST missing entirely
    os.remove(os.path.join(root, "_commits", "LATEST"))
    assert mf.latest_commit(root)["epoch"] == 1


# ---------------------------------------------------------------------------
# tail: fingerprints captured BEFORE the apply
# ---------------------------------------------------------------------------


def test_tail_mid_apply_rewrite_is_reapplied(tmp_path, monkeypatch):
    """A shipper that rewrites a watched file DURING the apply must see its
    new content applied on the next poll — the persisted fingerprint is the
    PRE-apply stat, so the rewrite mismatches instead of being marked done."""
    epochs, files = _write_epochs(tmp_path, n_epochs=2)
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    root = str(tmp_path / "t")
    target = watch / "0000.parquet"
    os.link(files[0][0], target)

    real = cdc.replay_commit
    state = {"rewritten": False}

    def rewriting_apply(*a, **k):
        out = real(*a, **k)
        if not state["rewritten"]:
            state["rewritten"] = True
            os.remove(target)  # shipper replaces the file mid-window
            os.link(files[1][0], target)
        return out

    monkeypatch.setattr(cdc, "replay_commit", rewriting_apply)
    applied = cdc.tail(
        root, str(watch), num_partitions=4, poll_secs=0.01, max_idle_polls=3
    )
    assert len(applied) == 2, "rewritten content was never applied"
    got = cdc.read_table(root).to_pandas()
    assert_frames_equal(got, sequential_lww(pa.concat_tables(epochs)))


# ---------------------------------------------------------------------------
# base rows get the same validation as change events
# ---------------------------------------------------------------------------


def test_base_rows_with_null_ts_are_rejected(tmp_path):
    """A null-ts base row would sort nulls-last and win every LWW merge
    forever (even over deletes); the base path must validate like the
    change path does."""
    base = make_base(n_convs=5, seed=3)
    ts = base.column("ts").to_pylist()
    ts[0] = None
    bad_base = base.set_column(
        base.column_names.index("ts"), "ts", pa.array(ts, base.schema.field("ts").type)
    )
    bp = tmp_path / "base.parquet"
    pq.write_table(bad_base, bp)
    _, files = _write_epochs(tmp_path, n_epochs=1)
    root = str(tmp_path / "t")
    with pytest.raises(Exception, match="malformed"):
        cdc.replay_commit(root, files, base_files=[str(bp)], num_partitions=4)


def test_negative_turn_idx_is_rejected(tmp_path):
    """turn_idx routes to floor-division turn blocks enumerated from 0:
    a negative index would commit but be invisible to the pruned
    read_conversation, so the validator refuses it up front."""
    row = pa.table(
        {
            "lsn": pa.array([1], pa.int64()),
            "op": ["upsert"],
            "conv_id": ["c1"],
            "turn_idx": pa.array([-5], pa.int32()),
            "role": ["user"],
            "text": ["x"],
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([1000], pa.timestamp("us")),
        }
    )
    t = row.cast(CHANGE_SCHEMA)
    p = tmp_path / "neg.parquet"
    pq.write_table(t, p)
    root = str(tmp_path / "t")
    with pytest.raises(Exception, match="malformed"):
        cdc.replay_commit(root, [[str(p)]], num_partitions=4)


# ---------------------------------------------------------------------------
# vacuum: in-flight writer exemptions
# ---------------------------------------------------------------------------


def test_vacuum_spares_inflight_writer_files(tmp_path):
    """vacuum must not delete a live writer's scratch (.tmp-*) or its
    completed-but-not-yet-committed next-epoch snapshot; a same-or-older
    epoch OCC loser IS collected."""
    _, files = _write_epochs(tmp_path, n_epochs=2)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=4)
    pdir = os.path.join(root, "parts", "part-00000")
    latest = mf.latest_commit(root)["epoch"]
    scratch = os.path.join(pdir, ".tmp-writer.parquet")
    ahead = os.path.join(pdir, f"epoch-{latest + 1:06d}-aaaaaaaaaaaa.parquet")
    loser = os.path.join(pdir, f"epoch-{latest:06d}-bbbbbbbbbbbb.parquet")
    for p in (scratch, ahead, loser):
        with open(p, "wb") as f:
            f.write(b"x")
    cdc.vacuum(root, keep_last=1)
    assert os.path.exists(scratch), "in-flight scratch deleted"
    assert os.path.exists(ahead), "uncommitted next-epoch snapshot deleted"
    assert not os.path.exists(loser), "same-epoch OCC loser not collected"


# ---------------------------------------------------------------------------
# compaction: an all-tombstone partition leaves no dangling file reference
# ---------------------------------------------------------------------------


def test_compact_all_tombstone_partition_unreferences_file(tmp_path):
    """Dropping tombstones from a partition whose every row is a tombstone
    must produce the explicitly-empty manifest row (file ''), not a
    referenced 0-row file that fsck/vacuum would treat as an orphan."""
    # find two conv ids that land in different partitions (P=2, turn 0)
    from tinyetl_ray.stages.partition import partition_ids

    def pid_of(c: str) -> int:
        return int(
            partition_ids(pa.array([c]), pa.array([0], pa.int32()), 2, 64)[0]
        )

    a, b = None, None
    i = 0
    while a is None or b is None:
        cand = f"conv-{i}"
        if pid_of(cand) == 0 and a is None:
            a = cand
        elif pid_of(cand) == 1 and b is None:
            b = cand
        i += 1
    rows = {
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "op": ["upsert", "delete", "upsert"],  # conv a ends as a tombstone
        "conv_id": [a, a, b],
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "role": ["user", "user", "user"],
        "text": ["x", "y", "z"],
        "tool": pa.array([None, None, None], pa.string()),
        "ts": pa.array([1, 2, 1], pa.timestamp("us")),
    }
    t = pa.table(rows).cast(CHANGE_SCHEMA)
    p = tmp_path / "c.parquet"
    pq.write_table(t, p)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, [[str(p)]], num_partitions=2)
    c = cdc.compact(root, drop_tombstones=True)
    empty = [m for m in c["partitions"] if m["rows"] == 0]
    assert empty and all(m["file"] == "" for m in empty)
    r = cdc.fsck(root)
    assert r["ok"] and not r["orphans"], r
    got = cdc.read_table(root).to_pandas()
    assert list(got["conv_id"]) == [b]


# ---------------------------------------------------------------------------
# oracle-artifact fingerprint marker: vouches only for COMPLETE sets
# ---------------------------------------------------------------------------


def _art_stubs(monkeypatch, tmp_path, calls):
    """Patch ORACLE_ART into tmp and replace the two artifact producers
    with recorders that write one parquet file each."""
    from tinyetl_ray.pipelines import corpus

    monkeypatch.setattr(corpus, "ORACLE_ART", str(tmp_path / "art"))

    def fake_parquet(name):
        d = corpus.oracle_art_dir(str(tmp_path / "sfX"), name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"x": [1]}), os.path.join(d, "part-0.parquet"))

    def fake_simhash(sf_dir):
        calls.append("simhash")
        fake_parquet("simhash_sigs")

    class _FakeDs:
        def materialize(self):
            return self

    def fake_minhash(sf_dir):
        calls.append("minhash")
        fake_parquet("lsh_edges")
        return _FakeDs()

    monkeypatch.setattr(corpus, "dedup_simhash", fake_simhash)
    monkeypatch.setattr(corpus, "dedup_minhash", fake_minhash)


def _ensure(monkeypatch, sf_dir, budget):
    import __ray_entry__ as e

    monkeypatch.setattr(e, "_ART_BUDGET_SEC", budget)
    e._ART_ATTEMPTED.clear()  # simulate a fresh process
    e._ensure_oracle_artifacts(sf_dir)


def test_artifact_regeneration_runs_to_completion(tmp_path, monkeypatch):
    """After the scoped wipe, BOTH artifact steps always run — a budget
    skip used to strand the dedup_minhash oracle on a zero-file glob (a
    manufactured failure); now an exhausted budget still regenerates the
    full set and stamps the marker (round-5 review)."""
    from tinyetl_ray.pipelines import corpus

    calls: list[str] = []
    _art_stubs(monkeypatch, tmp_path, calls)
    sf = tmp_path / "sfX"
    sf.mkdir()
    pq.write_table(pa.table({"doc_id": ["d"], "text": ["t"]}),
                   sf / "documents.parquet")
    marker = os.path.join(corpus.oracle_art_dir(str(sf), ""), "_fingerprint")

    # even a negative (exhausted) budget regenerates the COMPLETE set
    _ensure(monkeypatch, str(sf), -1.0)
    assert calls == ["simhash", "minhash"] and os.path.exists(marker)

    # plant stale leftover edge files with NO marker (prior crash): the
    # next pass must WIPE and regenerate both, then stamp
    os.remove(marker)
    d = corpus.oracle_art_dir(str(sf), "lsh_edges")
    os.makedirs(d, exist_ok=True)
    stale = os.path.join(d, "stale.parquet")
    pq.write_table(pa.table({"x": [99]}), stale)
    calls.clear()
    _ensure(monkeypatch, str(sf), 120.0)
    assert calls == ["simhash", "minhash"], "untrusted leftovers not wiped"
    assert not os.path.exists(stale)
    assert os.path.exists(marker)

    # marker now vouches: a fresh process regenerates nothing
    calls.clear()
    _ensure(monkeypatch, str(sf), 120.0)
    assert calls == []
