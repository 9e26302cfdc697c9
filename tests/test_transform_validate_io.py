"""TinyETL parity: transform engine, schema validator, IO dispatch, sniffing.

Models the reference's test matrix: transformer semantics
(src/transformer.rs:510-1508), schema validation (src/schema.rs:148-244 and
test_schema/ fixtures), CSV column-order round trip (src/connectors/csv.rs:630-686),
type sniffing (csv.rs:82-111).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tinyetl_ray.sources.io import (
    ApplyTypes,
    read_any,
    sniff_column_types,
    sniffed_read_csv,
    write_any,
)
from tinyetl_ray.stages.transform import (
    ExpressionTransform,
    FunctionTransform,
    parse_assignments,
    project,
)
from tinyetl_ray.stages.validate import ColumnSpec, SchemaValidator


def employees_df():
    # FIXTURES.md B3 shape (examples/13_yaml_config/employees.csv)
    return pd.DataFrame(
        {
            "id": [1, 2, 3],
            "first_name": ["Ada", "Alan", "Grace"],
            "last_name": ["Lovelace", "Turing", "Hopper"],
            "monthly_salary": [9000.0, 8000.5, 9500.25],
            "active": [True, False, True],
        }
    )


def test_parse_assignments():
    assert parse_assignments("a = 1; b = a + 2") == [("a", "1"), ("b", "a + 2")]
    with pytest.raises(ValueError):
        parse_assignments("not an assignment!")


def test_inline_transform_add_override_and_chain():
    # README:855-860 derived-column example: full_name, annual_salary
    t = ExpressionTransform(
        "full_name = concat(first_name, ' ', last_name);"
        "annual_salary = monthly_salary * 12;"
        "annual_k = annual_salary / 1000"
    )
    out = t(employees_df())
    assert list(out["full_name"]) == ["Ada Lovelace", "Alan Turing", "Grace Hopper"]
    assert out["annual_salary"].tolist() == [108000.0, 96006.0, 114003.0]
    # all input columns preserved (inline mode copies the row first)
    assert "monthly_salary" in out.columns
    # chained: later expression sees earlier result
    assert out["annual_k"].round(3).tolist() == [108.0, 96.006, 114.003]


def test_transform_filter_drops_rows():
    t = ExpressionTransform("flag = active", filter_expr="monthly_salary > 8500")
    out = t(employees_df())
    assert out["id"].tolist() == [1, 3]


def test_transform_lua_surface_parity():
    """The reference README's documented Lua transforms, expressed with the
    helper mapping (transform.py's Lua → helper table): string.sub /
    string.match captures / tonumber / string.lower / `and-or` selection."""
    df = pd.DataFrame(
        {
            "hire_date": ["1999-04-01", "2015-12-31", "bad"],
            "email": ["A@X.COM", "B@Y.io", None],
            "age": [25, 44, 31],
        }
    )
    # README:859  hire_year = tonumber(string.sub(row.hire_date, 1, 4))
    # README:491  year = tonumber(row.birth_date:match('^(%d%d%d%d)'))
    # README:460  email=string.lower(row.email); age_group=age<30 and 'young' or 'mature'
    t = ExpressionTransform(
        "hire_year = tonumber(substr(hire_date, 0, 4));"
        "hire_year2 = tonumber(extract(hire_date, r'^(\\d{4})'));"
        "email_lc = lower(email);"
        "age_group = iif(age < 30, 'young', 'mature')"
    )
    out = t(df)
    assert out["hire_year"].tolist()[:2] == [1999, 2015]
    assert pd.isna(out["hire_year"].iloc[2])  # tonumber('bad ') → nil/NaN
    assert out["hire_year"].tolist()[:2] == out["hire_year2"].tolist()[:2]
    assert out["email_lc"].tolist()[:2] == ["a@x.com", "b@y.io"]
    assert out["age_group"].tolist() == ["young", "mature", "mature"]
    # string.find / gsub / .. concatenation analogs
    t2 = ExpressionTransform(
        "at_pos = find(email, '@');"
        "masked = replace(email, r'[A-Z]', '*');"
        "tagged = concat(lower(email), ':', tostring(age))"
    )
    out2 = t2(df.dropna(subset=["email"]).reset_index(drop=True))
    assert out2["at_pos"].tolist() == [1, 1]
    assert out2["masked"].iloc[0] == "*@*.***"  # A@X.COM with [A-Z] → *
    assert out2["tagged"].iloc[1] == "b@y.io:44"


def test_function_transform_projection():
    ft = FunctionTransform(project(["id", "first_name"]))
    out = ft(employees_df())
    assert list(out.columns) == ["id", "first_name"]


def test_expression_sandbox_blocks_builtins():
    t = ExpressionTransform("x = __import__('os').getpid()")
    with pytest.raises(Exception):
        t(employees_df())


def test_validator_defaults_pattern_required():
    # FIXTURES.md B4 semantics: defaults injected, patterns enforced
    specs = [
        ColumnSpec("id", "integer", nullable=False),
        ColumnSpec("name", "string", pattern=r"[A-Za-z\s]+"),
        ColumnSpec("age", "integer", nullable=True, default=25),
    ]
    good = pa.table(
        {
            "id": ["1", "2"],
            "name": ["Ada Lovelace", "Alan Turing"],
            "age": [None, "41"],
        }
    )
    out = SchemaValidator(specs)(good)
    assert out.column("id").type == pa.int64()
    assert out.column("age").to_pylist() == [25, 41]

    bad_name = pa.table({"id": ["1"], "name": ["R2D2"], "age": ["5"]})
    with pytest.raises(ValueError):
        SchemaValidator(specs)(bad_name)
    dropped = SchemaValidator(specs, on_error="drop")(bad_name)
    assert len(dropped) == 0

    missing_required = pa.table({"name": ["Ada"], "age": ["1"]})
    with pytest.raises(ValueError):
        SchemaValidator(specs)(missing_required)


def test_sniff_types_matrix():
    # FIXTURES.md B5 torture shapes (reference csv.rs:82-111 + date formats)
    df = pd.DataFrame(
        {
            "ints": ["1", "-2", "3"],
            "decs": ["1.5", "2.25", "-0.5"],
            "bools": ["true", "False", "TRUE"],
            "iso_dates": ["2023-12-25", "2024-01-01", "2022-06-30"],
            "datetimes": ["2023-12-25 10:30:00", "2023-01-01 00:00:00", "2023-05-05 05:05:05"],
            "mixed": ["1", "x", "2.5"],
            "empties": ["", "a", ""],
        }
    )
    mapping = sniff_column_types(ray.data.from_pandas(df), list(df.columns))
    out = ApplyTypes(mapping)(df)
    assert str(out["ints"].dtype) == "Int64"
    assert out["decs"].dtype == np.float64
    assert str(out["bools"].dtype) == "boolean"
    assert str(out["iso_dates"].dtype).startswith("datetime64")
    assert str(out["datetimes"].dtype).startswith("datetime64")
    assert out["mixed"].dtype == object  # mixed stays string (schema.rs:520-543)
    assert out["empties"].isna().tolist() == [True, False, True]  # "" → null


def test_sniff_consensus_across_blocks(tmp_path):
    """A bad value in only ONE block must demote the whole column to string
    everywhere — per-batch sniffing would give blocks divergent schemas."""
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    pd.DataFrame({"v": ["1", "2", "3"], "w": ["7", "8", "9"]}).to_csv(a, index=False)
    pd.DataFrame({"v": ["4", "oops", "6"], "w": ["10", "11", "12"]}).to_csv(b, index=False)
    ds = sniffed_read_csv([str(a), str(b)])
    out = ds.to_pandas()
    assert out["v"].dtype == object  # demoted everywhere, values intact
    assert set(out["v"]) == {"1", "2", "3", "4", "oops", "6"}
    assert str(out["w"].dtype) == "Int64"  # clean column still promoted


def test_io_roundtrip_and_column_order(tmp_path):
    # column-order preservation through csv round trip (csv.rs:630-686)
    df = pd.DataFrame({"one": [1, 2], "two": ["a", "b"], "three": ["x", "y"]})
    src = tmp_path / "t.csv"
    df.to_csv(src, index=False)
    ds = read_any(str(src))
    assert ds.schema().names == ["one", "two", "three"]
    out_dir = tmp_path / "out_parquet"
    write_any(ds, str(out_dir), fmt="parquet")
    back = ray.data.read_parquet(str(out_dir)).to_pandas()
    assert sorted(back["one"].tolist()) == [1, 2]
    with pytest.raises(ValueError):
        read_any("/nope/file.xyz")


def test_sniffed_read_csv(tmp_path):
    p = tmp_path / "typed.csv"
    pd.DataFrame(
        {"id": ["1", "2"], "price": ["1.5", "2.5"], "when": ["2023-12-25", "2024-01-01"], "note": ["a", "b"]}
    ).to_csv(p, index=False)
    out = sniffed_read_csv(str(p)).to_pandas()
    assert str(out["id"].dtype) in ("Int64", "int64")
    assert out["price"].dtype == np.float64
    assert str(out["when"].dtype).startswith("datetime64")


def test_url_secrets_and_fragments(monkeypatch):
    from tinyetl_ray.sources.urls import inject_secrets, parse_target

    monkeypatch.setenv("TINYETL_SECRET_DB_PASS", "s3cret")
    assert inject_secrets("postgres://u:{db_pass}@h/db") == "postgres://u:s3cret@h/db"
    with pytest.raises(KeyError):
        inject_secrets("postgres://u:{missing}@h/db")
    assert parse_target("/tmp/x/foo.parquet#mytab") == ("/tmp/x/foo.parquet", "mytab")
    assert parse_target("file:///tmp/x/foo.parquet") == ("/tmp/x/foo.parquet", "foo")
    with pytest.raises(ValueError):
        parse_target("ssh://host/data.csv")  # username is required (ssh.rs)
    with pytest.raises(NotImplementedError):
        parse_target("snowflake://acct/db")  # mock deliberately unreproduced
    with pytest.raises(ConnectionError):
        # http(s) is implemented (download-to-temp) — an unreachable host is
        # a connection error, not a refusal; loopback path in test_cli.py
        parse_target("https://127.0.0.1:9/data.csv")


def test_json_typed_column_validation_and_roundtrip(tmp_path):
    """Declared-json columns: parse-validated, and the tinyetl:type marker
    survives a parquet round trip (reference schema.rs:318-329)."""
    import pyarrow.parquet as pq

    from tinyetl_ray.stages.validate import ColumnSpec, SchemaValidator, json_columns

    specs = [
        ColumnSpec(name="id", type="integer"),
        ColumnSpec(name="payload", type="json"),
    ]
    good = pa.table({"id": [1, 2], "payload": ['{"a": 1}', "[1, 2, 3]"]})
    out = SchemaValidator(specs)(good)
    assert json_columns(out.schema) == ["payload"]

    bad = pa.table({"id": [1, 2], "payload": ['{"a": 1}', "{not json"]})
    with pytest.raises(ValueError):
        SchemaValidator(specs)(bad)
    dropped = SchemaValidator(specs, on_error="drop")(bad)
    assert dropped.column("id").to_pylist() == [1]

    # parquet round trip preserves the marker
    p = tmp_path / "j.parquet"
    pq.write_table(out, p)
    assert json_columns(pq.read_schema(str(p))) == ["payload"]


def test_date_parser_breadth():
    """The sniffer accepts the reference's full date-format matrix
    (src/date_parser.rs:11-116)."""
    cases = {
        "2023-12-25T10:30:00.123": "2023-12-25 10:30:00.123",
        "2023-12-25 10:30": "2023-12-25 10:30:00",
        "12/25/2023": "2023-12-25",
        "25.12.2023": "2023-12-25",
        "2023/12/25": "2023-12-25",
        "Dec 25, 2023": "2023-12-25",
        "December 25, 2023": "2023-12-25",
        "25 Dec 2023": "2023-12-25",
        "2023-12-25 10:30:00 AM": "2023-12-25 10:30:00",
        "12-25-2023": "2023-12-25",
    }
    for raw, want in cases.items():
        df = pd.DataFrame({"d": [raw, raw]})
        mapping = sniff_column_types(ray.data.from_pandas(df), ["d"])
        assert mapping.get("d", "").startswith("date:"), raw
        out = ApplyTypes(mapping)(df)
        assert str(out["d"].iloc[0]).startswith(want.split(" ")[0]), raw


def test_decimal_typed_column():
    """Declared precision/scale makes `decimal` a real Arrow decimal128
    (fixed-point, exact) instead of the float64 degradation."""
    specs = [
        ColumnSpec("id", "integer"),
        ColumnSpec("amount", "decimal", precision=12, scale=2),
        ColumnSpec("rate", "decimal"),  # no precision → float64 (back-compat)
    ]
    t = pa.table(
        {"id": ["1", "2"], "amount": ["1234.56", "0.01"], "rate": ["0.5", "1.25"]}
    )
    out = SchemaValidator(specs)(t)
    assert out.column("amount").type == pa.decimal128(12, 2)
    assert [str(v) for v in out.column("amount").to_pylist()] == ["1234.56", "0.01"]
    assert out.column("rate").type == pa.float64()
    bad = pa.table({"id": ["1"], "amount": ["not-a-number"], "rate": ["1"]})
    with pytest.raises(ValueError):
        SchemaValidator(specs)(bad)


def test_sql_keyset_pagination(tmp_path):
    """Keyset-paginated SQL read: small pages, full coverage, stable order,
    constant driver memory (pages spill to parquet)."""
    import sqlite3

    from tinyetl_ray.sources.sql import read_table_keyset, write_table

    db = str(tmp_path / "k.db")

    def factory():
        return sqlite3.connect(db, check_same_thread=False)

    src = pd.DataFrame({"id": range(1, 2501), "val": [f"v{i}" for i in range(1, 2501)]})
    write_table(ray.data.from_pandas(src), "items", factory)
    ds = read_table_keyset("items", "id", factory, batch_size=300)
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 2500
    assert got["id"].tolist() == list(range(1, 2501))
    assert got["val"].iloc[-1] == "v2500"
    # column projection
    just_ids = read_table_keyset("items", "id", factory, batch_size=1000, columns=["id"])
    assert just_ids.schema().names == ["id"]


def test_sql_keyset_duplicate_keys(tmp_path):
    """Non-unique key columns must not lose rows across page boundaries
    (pages advance over DISTINCT keys, fetching full key ranges)."""
    import sqlite3

    from tinyetl_ray.sources.sql import read_table_keyset, write_table

    db = str(tmp_path / "dup.db")

    def factory():
        return sqlite3.connect(db, check_same_thread=False)

    # 10 rows at k=1, interleaved with unique keys; page size smaller than
    # the duplicate run
    rows = [{"k": 1, "v": f"a{i}"} for i in range(10)]
    rows += [{"k": i, "v": f"b{i}"} for i in range(2, 8)]
    src = pd.DataFrame(rows)
    write_table(ray.data.from_pandas(src), "dups", factory)
    got = read_table_keyset("dups", "k", factory, batch_size=4).to_pandas()
    assert len(got) == len(src)
    assert sorted(got["v"]) == sorted(src["v"])


def test_sql_dialect_type_maps():
    """DDL type maps mirror the reference connectors exactly
    (postgres.rs:377-383, mysql.rs:390-399, mssql.rs:357-367)."""
    from tinyetl_ray.sources.sql import create_table_sql

    df = pd.DataFrame(
        {
            "i": pd.array([1], dtype="int64"),
            "f": [1.5],
            "b": [True],
            "t": pd.to_datetime(["2024-01-01"]),
            "s": ["x"],
        }
    )
    ddl = {d: create_table_sql("tbl", df, d) for d in
           ("generic", "sqlite", "postgres", "mysql", "mssql")}
    assert "f DECIMAL," in ddl["postgres"] and "TIMESTAMP WITH TIME ZONE" in ddl["postgres"]
    assert "f DECIMAL(65,30)" in ddl["mysql"] and "t DATETIME," in ddl["mysql"]
    assert "f DECIMAL(18,6)" in ddl["mssql"] and "b BIT" in ddl["mssql"] \
        and "s NVARCHAR(MAX)" in ddl["mssql"] and "t DATETIME2" in ddl["mssql"]
    assert "f REAL" in ddl["sqlite"]
    assert "f DOUBLE PRECISION" in ddl["generic"]


def test_sql_keyset_sharded(tmp_path):
    """shards>1 splits the numeric key space into ranges paged by concurrent
    Ray tasks over separate connections — same result set as one shard
    (incl. NULL keys and duplicate keys spanning a shard boundary), with
    pages written by more than one shard."""
    import glob
    import sqlite3

    from tinyetl_ray.sources.sql import read_table_keyset, write_table

    db = str(tmp_path / "s.db")

    def factory():
        return sqlite3.connect(db, check_same_thread=False)

    rows = [{"k": 1, "v": f"a{i}"} for i in range(10)]  # dup run
    rows += [{"k": i, "v": f"b{i}"} for i in range(2, 800)]
    src = pd.DataFrame(rows)
    write_table(ray.data.from_pandas(src), "dups", factory)
    conn = sqlite3.connect(db)
    conn.execute("INSERT INTO dups VALUES (NULL, 'nullrow')")
    conn.commit()
    conn.close()

    seq = read_table_keyset("dups", "k", factory, batch_size=64).to_pandas()
    sh = read_table_keyset("dups", "k", factory, batch_size=64, shards=4)
    files = sh.input_files()
    got = sh.to_pandas()
    assert sorted(got["v"]) == sorted(seq["v"])
    assert len(got) == len(src) + 1
    shard_ids = {f.split("shard-")[1][:4] for f in files if "shard-" in f}
    assert len(shard_ids) > 1  # parallel ingestion actually happened
    # identifier validation rejects injection-shaped names
    with pytest.raises(ValueError):
        read_table_keyset("dups; DROP TABLE dups", "k", factory)
    with pytest.raises(ValueError):
        read_table_keyset("dups", "k OR 1=1", factory)
    # float keys (incl. negatives) shard correctly too
    fsrc = pd.DataFrame({"k": [(-50 + i) / 7.0 for i in range(300)],
                         "v": [f"f{i}" for i in range(300)]})
    write_table(ray.data.from_pandas(fsrc), "fk", factory)
    fgot = read_table_keyset("fk", "k", factory, batch_size=32, shards=3).to_pandas()
    assert sorted(fgot["v"]) == sorted(fsrc["v"])


def test_sql_keyset_null_keys(tmp_path):
    """NULL keys must be returned (range predicates never match NULL) and an
    all-NULL key column must terminate."""
    import sqlite3

    from tinyetl_ray.sources.sql import read_table_keyset

    db = str(tmp_path / "n.db")

    def factory():
        return sqlite3.connect(db, check_same_thread=False)

    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER, v TEXT)")
    conn.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(None, "null1"), (None, "null2"), (1, "a"), (2, "b"), (3, "c")],
    )
    conn.commit()
    conn.close()
    got = read_table_keyset("t", "k", factory, batch_size=2).to_pandas()
    assert sorted(got["v"]) == ["a", "b", "c", "null1", "null2"]
    # all-NULL key column terminates with just the null page
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t2 (k INTEGER, v TEXT)")
    conn.executemany("INSERT INTO t2 VALUES (?, ?)", [(None, "x"), (None, "y")])
    conn.commit()
    conn.close()
    got2 = read_table_keyset("t2", "k", factory, batch_size=2).to_pandas()
    assert sorted(got2["v"]) == ["x", "y"]
