"""Round-5 whole-file-review hardening of the sources/stages/corpus
modules: per-row cast salvage for non-numeric types, NULL-safe decimal
binds, schema-declared (not row-sniffed) SQL DDL, quote-aware transform
parsing, scalar coalesce broadcasting, CSV record counting with quoted
newlines, canonical column order across permuted CSV part files, and
bytes inside avro json-typed values."""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


# --- validator: on_error="drop" salvage for non-numeric types ---------------


def test_validator_drop_salvages_datetime_rows():
    """One unparseable timestamp must null ONLY its own row — the old
    salvage retried the whole-batch cast (which re-raises on the bad value)
    and left every row null."""
    from tinyetl_ray.stages.validate import ColumnSpec, SchemaValidator

    v = SchemaValidator(
        [ColumnSpec("ts", "datetime", nullable=True)], on_error="drop"
    )
    batch = pa.table(
        {"ts": ["2021-01-01T00:00:00", "not-a-date", "2022-05-05T06:07:08"]}
    )
    out = v(batch)
    vals = out.column("ts").to_pylist()
    assert len(vals) == 3  # nullable: rows kept
    assert vals[0] is not None and vals[0].year == 2021
    assert vals[1] is None
    assert vals[2] is not None and vals[2].year == 2022


def test_validator_drop_non_nullable_datetime_drops_only_bad_row():
    from tinyetl_ray.stages.validate import ColumnSpec, SchemaValidator

    v = SchemaValidator(
        [ColumnSpec("ts", "datetime", nullable=False)], on_error="drop"
    )
    out = v(pa.table({"ts": ["2021-01-01T00:00:00", "nope"]}))
    vals = out.column("ts").to_pylist()
    assert len(vals) == 1 and vals[0].year == 2021


def test_validator_drop_bool_salvage():
    from tinyetl_ray.stages.validate import ColumnSpec, SchemaValidator

    v = SchemaValidator(
        [ColumnSpec("ok", "boolean", nullable=True)], on_error="drop"
    )
    out = v(pa.table({"ok": ["true", "banana", "false"]}))
    assert out.column("ok").to_pylist() == [True, None, False]


# --- SQL writer: NULL-safe decimal binds, schema-declared DDL ---------------


def test_write_table_decimal_null_binds_none(tmp_path):
    from decimal import Decimal

    from tinyetl_ray.sources.sql import write_table

    db = str(tmp_path / "t.db")

    def factory():
        # adapter must be registered in the WORKER process that binds
        sqlite3.register_adapter(Decimal, str)
        return sqlite3.connect(db, check_same_thread=False)

    df = pd.DataFrame({"id": [1, 2, 3], "bal": [1.25, None, 3.5]})
    n = write_table(
        ray.data.from_pandas(df),
        "money",
        factory,
        decimal_cols={"bal": (18, 2)},
    )
    assert n == 3
    got = sqlite3.connect(db).execute(
        "SELECT id, bal FROM money ORDER BY id"
    ).fetchall()
    # sqlite's NUMERIC affinity converts the exact-string bind back to a
    # number; the point under test is the NULL surviving as NULL (the old
    # code raised InvalidOperation on Decimal(str(None)))
    assert got[0] == (1, 1.25)
    assert got[1][1] is None
    assert got[2] == (3, 3.5)


def test_create_table_sql_null_first_row_keeps_numeric_type(tmp_path):
    """A NULL in the first row must not demote the column to TEXT: DDL now
    comes from the dataset's declared Arrow schema, not a 1-row probe."""
    from tinyetl_ray.sources.sql import write_table

    db = str(tmp_path / "t.db")
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "amount": pa.array([None, 7.5], pa.float64()),
        }
    )
    write_table(ray.data.from_arrow(t), "amts", lambda: sqlite3.connect(db, check_same_thread=False))
    ddl = sqlite3.connect(db).execute(
        "SELECT sql FROM sqlite_master WHERE name='amts'"
    ).fetchone()[0]
    assert "amount DOUBLE PRECISION" in ddl  # not TEXT


def test_create_table_sql_accepts_arrow_schema():
    from tinyetl_ray.sources.sql import create_table_sql

    sch = pa.schema(
        [("id", pa.int64()), ("ts", pa.timestamp("us")), ("name", pa.string())]
    )
    ddl = create_table_sql("tbl", sch, "generic")
    assert "id BIGINT" in ddl and "ts TIMESTAMP" in ddl and "name TEXT" in ddl


# --- transform: quote-aware statement split, scalar coalesce ----------------


def test_parse_assignments_delimiters_inside_string_literals():
    from tinyetl_ray.stages.transform import parse_assignments

    pairs = parse_assignments("a = replace(name, ';', ','); b = name + '\\n'")
    assert [p[0] for p in pairs] == ["a", "b"]
    assert pairs[0][1] == "replace(name, ';', ',')"


def test_coalesce_scalar_first_broadcasts():
    from tinyetl_ray.stages.transform import ExpressionTransform

    df = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    out = ExpressionTransform("a = coalesce(0, x)")(df)
    assert out["a"].tolist() == [0.0, 0.0, 0.0]  # not [0, NaN, NaN]
    out2 = ExpressionTransform("a = coalesce(None, x)")(df)
    assert out2["a"].tolist() == [1.0, 2.0, 3.0]


# --- CSV row counting with quoted embedded newlines --------------------------


def test_count_written_rows_csv_quoted_newlines(tmp_path):
    from tinyetl_ray.sources.io import count_written_rows

    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write('id,text\n1,"a\nb"\n2,"c""d\ne"\n')
    assert count_written_rows(p, "csv") == 2


def test_count_written_rows_csv_plain_unchanged(tmp_path):
    from tinyetl_ray.sources.io import count_written_rows

    p = str(tmp_path / "y.csv")
    with open(p, "w") as f:
        f.write("id,v\n1,a\n2,b\n3,c\n")
    assert count_written_rows(p, "csv") == 3


# --- CSV part files with permuted column order -------------------------------


def test_sniffed_read_csv_normalizes_column_order(tmp_path):
    from tinyetl_ray.sources.io import sniffed_read_csv

    p1, p2 = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    with open(p1, "w") as f:
        f.write("x,y\n1,one\n2,two\n")
    with open(p2, "w") as f:
        f.write("y,x\nthree,3\nfour,4\n")
    ds = sniffed_read_csv([p1, p2])
    out = ds.to_pandas().sort_values("x").reset_index(drop=True)
    assert list(out.columns) == ["x", "y"]
    assert out["x"].tolist() == [1, 2, 3, 4]
    assert out["y"].tolist() == ["one", "two", "three", "four"]
    # every written block shares ONE schema
    dest = str(tmp_path / "out")
    ds.write_parquet(dest)
    import pyarrow.parquet as pq

    schemas = {
        tuple(pq.ParquetFile(os.path.join(dest, f)).schema_arrow.names)
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    }
    assert schemas == {("x", "y")}


# --- avro: bytes inside json-typed values ------------------------------------


def test_avro_fixed_field_decodes_without_typeerror(tmp_path):
    """A 'fixed' field (raw bytes) lands in the json-string fallback —
    json.dumps(bytes) used to raise TypeError after a clean wire decode."""
    import json
    import struct

    from tinyetl_ray.sources.avro import decode_container

    def zz(n: int) -> bytes:  # zig-zag varint
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "blob", "type": {"type": "fixed", "name": "f4", "size": 4}},
        ],
    }
    meta_schema = json.dumps(schema).encode()
    sync = b"S" * 16
    header = (
        b"Obj\x01"
        + zz(1)  # one metadata entry
        + zz(len(b"avro.schema")) + b"avro.schema"
        + zz(len(meta_schema)) + meta_schema
        + zz(0)
        + sync
    )
    rec = zz(7) + b"\x01\x02\x03\x04"
    block = zz(1) + zz(len(rec)) + rec + sync
    p = str(tmp_path / "f.avro")
    with open(p, "wb") as f:
        f.write(header + block)
    with open(p, "rb") as fh:
        t = decode_container(fh.read())
    assert t.column("id").to_pylist() == [7]
    blob = t.column("blob").to_pylist()[0]
    assert blob is not None and json.loads(blob) == "\x01\x02\x03\x04"


# --- corpus: query-matrix pruned read, single tokenize pass -------------------


def test_query_matrix_matches_full_read(tmp_path):
    from tinyetl_ray.pipelines.corpus import _query_matrix

    rng = np.random.default_rng(3)
    ids = rng.permutation(200).astype(np.int64)
    mat = rng.normal(size=(200, 8))
    offsets = pa.array(np.arange(201, dtype=np.int32) * 8, pa.int32())
    lst = pa.ListArray.from_arrays(
        offsets, pa.array(mat.ravel().astype(np.float64), pa.float64())
    )
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": lst}),
        str(tmp_path / "embeddings.parquet"),
        row_group_size=32,  # many row groups: exercises the streaming scan
    )
    got_mat, got_ids = _query_matrix(str(tmp_path), n=5)
    assert got_ids.tolist() == [0, 1, 2, 3, 4]
    want = mat[np.argsort(ids)[:5]]
    np.testing.assert_allclose(got_mat, want)


def test_pack_sequences_tokenizes_once(tmp_path):
    """The tokenize stage must run once per row, not once per consumer —
    counted via a side-channel marker file appended per processed row."""
    from tinyetl_ray.pipelines.corpus import pack_sequences_ds

    df = pd.DataFrame(
        {"doc_id": np.arange(40, dtype=np.int64),
         "text": ["w " * (i % 7 + 1) for i in range(40)]}
    )
    marker = str(tmp_path / "calls")
    os.makedirs(marker)

    def spy(b: pd.DataFrame) -> pd.DataFrame:
        with open(os.path.join(marker, f"{os.getpid()}-{b['doc_id'].iloc[0]}"), "a") as f:
            f.write(f"{len(b)}\n")
        return b

    docs = ray.data.from_pandas(df).map_batches(spy, batch_format="pandas")
    out = pack_sequences_ds(docs, budget=16).to_pandas()
    assert len(out) == 40
    seen = 0
    for fn in os.listdir(marker):
        with open(os.path.join(marker, fn)) as f:
            seen += sum(int(x) for x in f.read().split())
    assert seen == 40  # upstream lineage executed exactly once
