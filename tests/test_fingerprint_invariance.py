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


def test_payload_only_mutation_changes_hash_and_filename(tmp_path):
    """Round-4 advice pin: two snapshots identical in every KEY column
    (conv_id, turn_idx, lsn) but differing in one payload byte must produce
    distinct content_hashes — and therefore distinct content-addressed
    filenames (no clobber collision) — and payload bit rot must be visible
    to fsck's recompute."""
    t = _table()
    texts = t.column("text").to_pylist()
    texts[500] = texts[500] + "!"  # one payload byte, keys untouched
    t2 = t.set_column(t.column_names.index("text"), "text", pa.array(texts))
    m1 = mf.write_snapshot(str(tmp_path), 0, 0, t)
    m2 = mf.write_snapshot(str(tmp_path), 1, 0, t2)
    assert m1["content_hash"] != m2["content_hash"]
    assert os.path.basename(m1["file"]) != os.path.basename(m2["file"])
    # same check for a null-flip (mask stream, not value stream)
    tools = t.column("tool").to_pylist()
    tools[0] = "search"
    t3 = t.set_column(t.column_names.index("tool"), "tool", pa.array(tools, pa.string()))
    m3 = mf.write_snapshot(str(tmp_path), 2, 0, t3)
    assert m3["content_hash"] != m1["content_hash"]


def test_live_hash_invariant_under_tombstone_drop(tmp_path):
    """live_hash covers only surviving upserts: a snapshot carrying
    tombstones and its compacted twin (tombstones dropped, live rows and
    order preserved) must agree on live_hash while their content_hashes
    differ — the exact identity signal view refresh diffs on."""
    import pyarrow.compute as pc

    t = _table()
    ops = ["delete" if i % 10 == 0 else "upsert" for i in range(len(t))]
    t_del = t.set_column(t.column_names.index("op"), "op", pa.array(ops))
    t_compacted = t_del.filter(pc.equal(t_del.column("op"), "upsert"))
    m_full = mf.write_snapshot(str(tmp_path), 0, 0, t_del)
    m_comp = mf.write_snapshot(str(tmp_path), 1, 1, t_compacted)
    assert m_full["live_hash"] == m_comp["live_hash"]
    assert m_full["content_hash"] != m_comp["content_hash"]
    # and the chunked writer agrees with the whole-table writer on BOTH
    chunks = [t_del.slice(0, 137), t_del.slice(137, 400), t_del.slice(537)]
    m_chunked = mf.write_snapshot_chunks(str(tmp_path), 2, 0, iter(chunks), t_del.schema)
    assert m_chunked["content_hash"] == m_full["content_hash"]
    assert m_chunked["live_hash"] == m_full["live_hash"]


# --- property: the digest is a function of the ROW STREAM only -------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _diverse_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "s": pa.array([r["s"] for r in rows], pa.string()),
            "i": pa.array([r["i"] for r in rows], pa.int64()),
            "f": pa.array([r["f"] for r in rows], pa.float64()),
            "b": pa.array([r["b"] for r in rows], pa.bool_()),
            "ts": pa.array([r["i"] for r in rows], pa.timestamp("us")),
        }
    )


_row = st.fixed_dictionaries(
    {
        # unicode (multi-byte), empty strings, and nulls all hit the
        # var-width mask/length/data streams differently
        "s": st.one_of(st.none(), st.text(max_size=8)),
        "i": st.integers(min_value=-(2**40), max_value=2**40),
        "f": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
        "b": st.one_of(st.none(), st.booleans()),
    }
)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(_row, min_size=1, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=59), max_size=4),
)
def test_fingerprint_is_chunking_invariant_property(rows, cuts):
    """Any slicing of the same row stream (including empty slices and
    offset-bearing slices) must hash identically; permuting rows must not
    (fingerprint is order-sensitive by design — snapshots are key-sorted)."""
    t = _diverse_table(rows)
    whole = mf._Fingerprint()
    whole.update(t)
    bounds = sorted({c for c in cuts if c <= len(t)} | {0, len(t)})
    sliced = mf._Fingerprint()
    for lo, hi in zip(bounds, bounds[1:]):
        sliced.update(t.slice(lo, hi - lo))
    assert sliced.hexdigest() == whole.hexdigest()
    if len(t) > 1 and not t.slice(0, 1).equals(t.slice(len(t) - 1, 1)):
        rev = mf._Fingerprint()
        rev.update(t.take(list(range(len(t) - 1, -1, -1))))
        assert rev.hexdigest() != whole.hexdigest()


def test_digest_covers_logical_type_and_exotic_columns(tmp_path):
    """Type identity and fallback-type determinism: identical value bytes
    under different logical types must not collide, and decimal/list/struct
    columns (numpy object-dtype conversions — where .tobytes() would hash
    PyObject pointers) must hash by VALUE, deterministically, with chunking
    invariance."""
    from decimal import Decimal

    from tinyetl_ray.state import manifest as mf2

    def fp(t):
        f = mf2._Fingerprint()
        f.update(t)
        return f.hexdigest()

    # same integers, different logical type -> different digest
    assert fp(pa.table({"x": pa.array([1, 2, 3], pa.int64())})) != fp(
        pa.table({"x": pa.array([1, 2, 3], pa.timestamp("us"))})
    )
    assert fp(pa.table({"x": pa.array([True, False], pa.bool_())})) != fp(
        pa.table({"x": pa.array([1, 0], pa.uint8())})
    )
    # large_string canonicalizes to string (same logical values, one digest)
    assert fp(pa.table({"x": pa.array(["ab", "c"], pa.string())})) == fp(
        pa.table({"x": pa.array(["ab", "c"], pa.large_string())})
    )
    # object-dtype families: equal values -> equal digest (fresh instances),
    # one-value change -> different digest, slicing -> same digest
    dec = pa.array([Decimal("1.23"), Decimal("4.56")], pa.decimal128(10, 2))
    lst = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    stc = pa.array([{"a": 1}, {"a": 2}])
    t = pa.table({"d": dec, "v": lst, "s": stc})
    t_same = pa.table(
        {
            "d": pa.array([Decimal("1.23"), Decimal("4.56")], pa.decimal128(10, 2)),
            "v": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32())),
            "s": pa.array([{"a": 1}, {"a": 2}]),
        }
    )
    assert fp(t) == fp(t_same)
    t_diff = t.set_column(0, "d", pa.array(
        [Decimal("1.23"), Decimal("4.57")], pa.decimal128(10, 2)))
    assert fp(t) != fp(t_diff)
    f_sliced = mf._Fingerprint()
    f_sliced.update(t.slice(0, 1))
    f_sliced.update(t.slice(1))
    assert f_sliced.hexdigest() == fp(t)


def test_live_hash_empty_is_canonical_empty_string(tmp_path):
    """A snapshot with ZERO surviving upserts records live_hash \"\" — the
    same encoding the compaction/repartition pseudo-rows use for emptied
    partitions — so a view refresh never sees two spellings of 'empty'."""
    t = _table(20)
    all_dead = t.set_column(
        t.column_names.index("op"), "op", pa.array(["delete"] * len(t))
    )
    m = mf.write_snapshot(str(tmp_path), 0, 0, all_dead)
    assert m["live_rows"] == 0 and m["live_hash"] == ""
    m_chunked = mf.write_snapshot_chunks(
        str(tmp_path), 1, 0, iter([all_dead.slice(0, 7), all_dead.slice(7)]), all_dead.schema
    )
    assert m_chunked["live_hash"] == ""
    assert m["content_hash"] == m_chunked["content_hash"]  # content still hashed
    assert m["fp_scheme"] == mf.FP_SCHEME == m_chunked["fp_scheme"]
