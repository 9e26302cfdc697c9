"""Table lifecycle: restore (rollback-as-a-new-commit) and zero-copy clone.

Both are metadata-only manifest operations over immutable snapshots —
the tests pin content equality, lineage preservation, resume-after-restore,
vacuum interaction, and clone independence (hardlinked bytes survive the
source's vacuum)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.state import manifest as mf
from tinyetl_ray.synth import make_changes

from .util import sequential_lww

KEY = ["conv_id", "turn_idx"]


def _write_epochs(tmp_path, n_epochs=2, n_events=2000):
    epochs = make_changes(n_events=n_events, n_convs=30, seed=17, n_epochs=n_epochs)
    files = []
    for e, t in enumerate(epochs):
        p = tmp_path / f"e{e}.parquet"
        pq.write_table(t, p)
        files.append([str(p)])
    return epochs, files


def _table_df(root, at_epoch=None) -> pd.DataFrame:
    return (
        cdc.read_table(root, at_epoch=at_epoch)
        .to_pandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )


def _expected(epochs) -> pd.DataFrame:
    return (
        sequential_lww(pa.concat_tables(epochs))
        .sort_values(KEY)
        .reset_index(drop=True)
    )


def test_restore_round_trip_and_resume(tmp_path):
    epochs, files = _write_epochs(tmp_path)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=8)
    e0 = mf.list_commits(root)[0]["epoch"]

    c = cdc.restore(root, e0)
    assert c["epoch"] == 2 and c["restored_from_epoch"] == e0
    pd.testing.assert_frame_equal(_table_df(root), _expected(epochs[:1]), check_dtype=False)
    # lineage intact: the rolled-back epoch is still time-travel readable
    pd.testing.assert_frame_equal(_table_df(root, at_epoch=1), _expected(epochs), check_dtype=False)
    assert [cm["epoch"] for cm in mf.list_commits(root)] == [0, 1, 2]

    # resume after restore: last_change_epoch reverted, so passing both
    # change epochs re-applies exactly the second one
    applied = cdc.replay_commit(root, files, num_partitions=8)
    assert [cm["epoch"] for cm in applied] == [3]
    pd.testing.assert_frame_equal(_table_df(root), _expected(epochs), check_dtype=False)


def test_restore_noop_and_unknown_epoch(tmp_path):
    _, files = _write_epochs(tmp_path, n_epochs=1)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=4)
    cur = mf.latest_commit(root)
    assert cdc.restore(root, cur["epoch"]) == cur  # no-op publishes nothing
    assert len(mf.list_commits(root)) == 1
    with pytest.raises(ValueError):
        cdc.restore(root, 99)


def test_restore_refuses_vacuumed_target(tmp_path):
    epochs, files = _write_epochs(tmp_path, n_epochs=3)
    root = str(tmp_path / "t")
    cdc.replay_commit(root, files, num_partitions=4)
    cdc.vacuum(root, keep_last=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        cdc.restore(root, 0)
    # the retained epoch still restores fine (no-op here, it IS latest)
    assert cdc.restore(root, 2)["epoch"] == 2


def test_clone_equal_and_independent(tmp_path):
    epochs, files = _write_epochs(tmp_path)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cdc.replay_commit(src, files, num_partitions=8)
    c = cdc.clone_table(src, dst)
    assert c["epoch"] == 0 and c["cloned_from"]["epoch"] == 1
    pd.testing.assert_frame_equal(_table_df(dst), _table_df(src), check_dtype=False)

    # advance the CLONE: the source's visible state must not move
    late = make_changes(n_events=500, n_convs=30, seed=99, n_epochs=1)[0]
    import pyarrow.compute as pc

    bump = pc.add(late.column("lsn"), 10_000_000)
    late = late.set_column(late.column_names.index("lsn"), "lsn", bump)
    p = tmp_path / "late.parquet"
    pq.write_table(late, p)
    cdc.replay_commit(dst, [[str(p)]], num_partitions=8, first_change_epoch=2)
    assert not _table_df(dst).equals(_table_df(src))
    pd.testing.assert_frame_equal(_table_df(src), _expected(epochs), check_dtype=False)

    # vacuum + compact the SOURCE: the clone's hardlinked bytes survive
    before = _table_df(dst)
    cdc.compact(src, drop_tombstones=True)
    cdc.vacuum(src, keep_last=1)
    pd.testing.assert_frame_equal(_table_df(dst), before, check_dtype=False)


def test_clone_at_epoch_and_guards(tmp_path):
    epochs, files = _write_epochs(tmp_path)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cdc.replay_commit(src, files, num_partitions=4)
    cdc.clone_table(src, dst, at_epoch=0)
    pd.testing.assert_frame_equal(_table_df(dst), _expected(epochs[:1]), check_dtype=False)
    with pytest.raises(FileExistsError):
        cdc.clone_table(src, dst)
    with pytest.raises(ValueError):
        cdc.clone_table(src, str(tmp_path / "dst2"), at_epoch=42)
    # cloned snapshots are hardlinks of the source's (same inode)
    cm = mf.latest_commit(dst)
    m = next(m for m in cm["partitions"] if m["rows"] > 0)
    src_m = next(
        x
        for x in mf.list_commits(src)[0]["partitions"]
        if x["partition"] == m["partition"]
    )
    assert os.stat(os.path.join(dst, m["file"])).st_ino == os.stat(
        os.path.join(src, src_m["file"])
    ).st_ino
