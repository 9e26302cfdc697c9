"""Integrity audit (cdc.fsck): clean pass, corrupt-snapshot detection,
missing-file detection, orphan detection, view-snapshot hashing, and the
vacuumed-old-epoch exemption."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.pipelines.views import refresh_conv_stats
from tinyetl_ray.state import manifest as mf
from tinyetl_ray.synth import make_changes


def _mk_table(tmp_path, n_epochs=2, n_events=1500):
    epochs = make_changes(n_events=n_events, n_convs=25, seed=41, n_epochs=n_epochs)
    files = []
    for e, t in enumerate(epochs):
        p = tmp_path / f"e{e}.parquet"
        pq.write_table(t, p)
        files.append([str(p)])
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=6)
    return root


def _live_snapshot(root):
    m = next(m for m in mf.latest_commit(root)["partitions"] if m["rows"] > 0)
    return os.path.join(root, m["file"]), m["file"]


def test_fsck_clean_and_all_epochs(tmp_path):
    root = _mk_table(tmp_path)
    r = cdc.fsck(root)
    assert r["ok"] and not r["missing"] and not r["corrupt"] and not r["orphans"]
    assert r["checked"] > 0
    r_all = cdc.fsck(root, all_epochs=True)
    assert r_all["ok"] and r_all["epochs_audited"] == [0, 1]
    assert r_all["checked"] >= r["checked"]


def test_fsck_detects_corruption(tmp_path):
    root = _mk_table(tmp_path)
    path, rel = _live_snapshot(root)
    # out-of-band mutation: rewrite the snapshot with one row dropped
    t = pq.read_table(path)
    pq.write_table(t.slice(1), path)
    r = cdc.fsck(root)
    assert not r["ok"] and rel in r["corrupt"] and not r["missing"]


def test_fsck_detects_missing_and_orphans(tmp_path):
    root = _mk_table(tmp_path)
    path, rel = _live_snapshot(root)
    content = pq.read_table(path)
    os.remove(path)
    # debris: a parquet no commit references (crashed writer's leftover)
    junk = mf.snapshot_path(root, 0, 99)
    pq.write_table(content, junk)
    r = cdc.fsck(root)
    assert not r["ok"]
    assert rel in r["missing"]
    assert any(o.endswith("epoch-000099.parquet") for o in r["orphans"])


def test_fsck_vacuumed_old_epoch_is_not_missing(tmp_path):
    root = _mk_table(tmp_path, n_epochs=3)
    cdc.vacuum(root, keep_last=1)
    r = cdc.fsck(root, all_epochs=True)
    # old epochs' files are gone BY DESIGN: not missing, not corrupt
    assert r["ok"] and r["epochs_audited"] == [0, 1, 2]


def test_fsck_view_snapshots(tmp_path):
    root = _mk_table(tmp_path)
    view = str(tmp_path / "v")
    refresh_conv_stats(root, view)
    r = cdc.fsck(view)
    assert r["ok"] and r["checked"] > 0
    path, rel = _live_snapshot(view)
    t = pq.read_table(path)
    pq.write_table(t.slice(0, max(len(t) - 1, 0)), path)
    r2 = cdc.fsck(view)
    assert not r2["ok"] and rel in r2["corrupt"]

def test_fsck_detects_payload_only_corruption(tmp_path):
    """Round-4 advice: the fingerprint covers payload columns, so bit rot
    that leaves the keys (conv_id/turn_idx/lsn) intact but mutates text
    must fail the audit — the old key-only fingerprint passed this."""
    import pyarrow as pa
    import pyarrow.compute as pc

    root = _mk_table(tmp_path)
    path, rel = _live_snapshot(root)
    t = pq.read_table(path)
    idx = t.column_names.index("text")
    mutated = pc.binary_replace_slice(
        pc.coalesce(t.column("text"), pa.scalar("", pa.string())), 0, 1, "X"
    )
    pq.write_table(t.set_column(idx, "text", mutated), path)
    r = cdc.fsck(root)
    assert not r["ok"] and rel in r["corrupt"] and not r["missing"]


def test_fsck_ignores_inflight_tmp_files(tmp_path):
    """A live writer's .tmp-* scratch file (mkstemp before the atomic
    rename) is not debris: reporting it as a deletable orphan would invite
    an operator to break the writer's publish mid-commit."""
    root = _mk_table(tmp_path)
    pdir = os.path.dirname(_live_snapshot(root)[0])
    with open(os.path.join(pdir, ".tmp-abc123.parquet"), "wb") as f:
        f.write(b"partial write in progress")
    r = cdc.fsck(root)
    assert r["ok"] and not r["orphans"]


def test_fsck_legacy_scheme_rows_are_not_corrupt(tmp_path):
    """A manifest row written under an OLDER fingerprint scheme (different
    or missing fp_scheme) is existence-checked but never hash-compared: a
    digest-formula upgrade must not report intact pre-upgrade snapshots as
    corrupt. Rows under the current scheme in the same commit still verify."""
    import json

    root = _mk_table(tmp_path)
    # age one live row in the latest commit file to the pre-versioning form
    cpath = os.path.join(root, mf.COMMITS_DIR, sorted(
        os.listdir(os.path.join(root, mf.COMMITS_DIR)))[-1])
    with open(cpath) as f:
        commit = json.load(f)
    aged = next(m for m in commit["partitions"] if m["rows"] > 0)
    aged.pop("fp_scheme", None)
    aged["content_hash"] = "0" * 64  # old-formula hash can never match
    with open(cpath, "w") as f:
        json.dump(commit, f)
    r = cdc.fsck(root)
    assert r["ok"], r
    assert aged["file"] in r["legacy_unverified"]
    assert aged["file"] not in r["corrupt"]
    # the other (current-scheme) rows were still recomputed
    assert r["checked"] >= 1
