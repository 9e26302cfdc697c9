"""Snapshot content_hash must be CHUNKING-INVARIANT (round-3 advice): the
same row stream hashes identically whether written by write_snapshot (one
table) or write_snapshot_chunks (any chunk boundaries / spill settings)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from tinyetl_ray.state import manifest as mf


def _table(n: int = 1000) -> pa.Table:
    import numpy as np

    rng = np.random.RandomState(3)
    conv = pa.array([f"conv-{i % 37}" for i in range(n)])
    return pa.table(
        {
            "conv_id": conv,
            "turn_idx": pa.array(rng.randint(0, 50, n), pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(rng.randint(0, 10**9, n), pa.timestamp("us")),
            "lsn": pa.array(np.arange(n), pa.int64()),
            "op": pa.array(["upsert"] * n),
        }
    )


def test_hash_identical_across_writers_and_chunkings(tmp_path):
    t = _table()
    root = str(tmp_path)
    m_whole = mf.write_snapshot(root, 0, 0, t)
    for pid, sizes in ((1, [1000]), (2, [1, 999]), (3, [100] * 10), (4, [333, 333, 334])):
        chunks = []
        off = 0
        for s in sizes:
            chunks.append(t.slice(off, s))
            off += s
        m = mf.write_snapshot_chunks(root, pid, 0, iter(chunks), t.schema)
        assert m["content_hash"] == m_whole["content_hash"], sizes
        assert m["rows"] == m_whole["rows"]
        assert m["lsn_watermark"] == m_whole["lsn_watermark"]
        # files are byte-comparable rows too (resolve via the manifest's
        # content-addressed file names)
        assert pq.read_table(os.path.join(root, m["file"])).equals(
            pq.read_table(os.path.join(root, m_whole["file"]))
        )


def test_hash_differs_for_different_content(tmp_path):
    t = _table()
    t2 = t.set_column(
        t.column_names.index("lsn"),
        "lsn",
        pa.array(range(1, len(t) + 1), pa.int64()),
    )
    m1 = mf.write_snapshot(str(tmp_path), 0, 0, t)
    m2 = mf.write_snapshot(str(tmp_path), 1, 0, t2)
    assert m1["content_hash"] != m2["content_hash"]
