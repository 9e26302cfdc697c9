"""Non-sqlite DBAPI matrix (round-3 verdict item 4): drive write_table /
read_table_keyset through the in-repo fake server driver across
format/pyformat paramstyles and the postgres/mysql/mssql dialect DDL +
bind-limit budgets — the reference behaviors at postgres.rs:431-492,
mysql.rs:523-537, mssql.rs:563-620. Plus decimal fidelity (item 5):
DECIMAL(p,s) DDL + exact Decimal binds preserve cents (mysql.rs:390)."""

from __future__ import annotations

import os
import sqlite3
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest
import ray.data

from tinyetl_ray.sources import dbapi_fake, sql as sqlsrc

N_ROWS = 2500
N_COLS = 4  # int, float, datetime, string

# dialect → (DDL fragments that MUST appear, expected executemany chunk rows)
DIALECTS = {
    "postgres": (["BIGINT", "DECIMAL", "TIMESTAMP WITH TIME ZONE", "TEXT"],
                 1000),  # 65535 params / 4 cols = 16383, capped at 1000 rows
    "mysql": (["BIGINT", "DECIMAL(65,30)", "DATETIME", "TEXT"],
              1000),  # row cap 1000
    "mssql": (["BIGINT", "DECIMAL(18,6)", "DATETIME2", "NVARCHAR(MAX)"],
              525),  # 2100 params / 4 cols
}


def _frame() -> pd.DataFrame:
    rng = np.random.RandomState(5)
    return pd.DataFrame(
        {
            "k": np.arange(N_ROWS, dtype=np.int64),
            "x": rng.rand(N_ROWS).round(6),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
                np.arange(N_ROWS), unit="m"
            ),
            "name": [f"row-{i}" for i in range(N_ROWS)],
        }
    )


@pytest.mark.parametrize("style", ["format", "pyformat"])
@pytest.mark.parametrize("dialect", sorted(DIALECTS))
def test_write_matrix(ray_session, tmp_path, style, dialect):
    db = str(tmp_path / f"{dialect}-{style}.db")
    df = _frame()

    def connect(path=db, s=style):
        from tinyetl_ray.sources import dbapi_fake

        return dbapi_fake.connect(path, s)

    written = sqlsrc.write_table(
        ray.data.from_pandas(df), "t", connect, dialect=dialect
    )
    assert written == N_ROWS

    log = dbapi_fake.statement_log(db)
    ddl = [s for s, _, _ in log if s.upper().startswith("CREATE TABLE IF")]
    assert len(ddl) == 1
    for frag in DIALECTS[dialect][0]:
        assert frag in ddl[0], (dialect, ddl[0])

    inserts = [(s, n, st) for s, n, st in log if s.startswith("INSERT INTO t ")]
    assert all(st == style for _, _, st in inserts)
    assert all("%s" in s for s, _, _ in inserts)  # server placeholder, not ?
    chunk = DIALECTS[dialect][1]
    sizes = [n for _, n, _ in inserts]
    assert sum(sizes) == N_ROWS
    assert max(sizes) == chunk  # chunking obeys the dialect budget
    assert all(n <= chunk for n in sizes)

    # round-trip through the keyset reader over the SAME fake driver
    back = (
        sqlsrc.read_table_keyset("t", "k", connect, batch_size=700)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(back) == N_ROWS
    assert back["name"].tolist() == df["name"].tolist()
    # TEXT-affinity dialect columns (DECIMAL(p,s)→TEXT rewrite) return
    # strings from sqlite; compare numerically
    np.testing.assert_allclose(
        back["x"].astype(float).to_numpy(), df["x"].to_numpy()
    )


def test_sharded_keyset_through_fake_driver(ray_session, tmp_path):
    db = str(tmp_path / "sharded.db")
    df = _frame()

    def connect(path=db):
        from tinyetl_ray.sources import dbapi_fake

        return dbapi_fake.connect(path, "format")

    sqlsrc.write_table(ray.data.from_pandas(df), "t", connect, dialect="postgres")
    back = (
        sqlsrc.read_table_keyset("t", "k", connect, batch_size=300, shards=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert back["k"].tolist() == df["k"].tolist()


def test_decimal_fidelity(ray_session, tmp_path):
    """Money columns survive to-the-cent: DECIMAL(p,s) DDL + Decimal binds
    quantized to scale; the stored text is exact digits, no float repr."""
    db = str(tmp_path / "money.db")
    cents = [Decimal("0.01"), Decimal("123.45"), Decimal("99999999.99"),
             Decimal("-0.10"), Decimal("10.00")]
    df = pd.DataFrame(
        {"k": np.arange(5, dtype=np.int64),
         "bal": [float(c) for c in cents]}
    )

    def connect(path=db):
        from tinyetl_ray.sources import dbapi_fake

        return dbapi_fake.connect(path, "format")

    sqlsrc.write_table(
        ray.data.from_pandas(df), "money", connect,
        dialect="mysql", decimal_cols={"bal": (18, 2)},
    )
    log = dbapi_fake.statement_log(db)
    ddl = next(s for s, _, _ in log if s.upper().startswith("CREATE TABLE IF"))
    assert "bal DECIMAL(18,2)" in ddl

    raw = sqlite3.connect(db).execute("SELECT k, bal FROM money ORDER BY k").fetchall()
    for (_, stored), want in zip(raw, cents):
        assert isinstance(stored, str)  # Decimal bound as exact string
        assert Decimal(stored) == want.quantize(Decimal("0.01"))


def test_detect_paramstyle_matrix(tmp_path):
    db = str(tmp_path / "d.db")
    assert sqlsrc._detect_paramstyle(dbapi_fake.connect(db, "format")) == "format"
    assert sqlsrc._detect_paramstyle(dbapi_fake.connect(db, "pyformat")) == "pyformat"
    assert sqlsrc._detect_paramstyle(sqlite3.connect(":memory:")) == "qmark"

def test_yaml_job_decimal_money_through_fake_mysql(ray_session, tmp_path, capsys):
    """decimal_cols end-to-end through the CLI job config (round-4 verdict
    item 6): a YAML job writes a money column as DECIMAL(18,2) via the
    fake-pyformat (MySQL-shaped) driver, and the stored values are exact
    cent strings — never float reprs."""
    import csv

    from tinyetl_ray.cli import main

    src = tmp_path / "money.csv"
    cents = ["0.01", "123.45", "99999999.99", "-0.10", "10.00"]
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["k", "bal"])
        for i, v in enumerate(cents):
            w.writerow([i, v])
    db = tmp_path / "money.db"
    job = tmp_path / "job.yaml"
    job.write_text(
        f'source: "{src}"\n'
        f'target: "fake-mysql://{db}#accounts"\n'
        "decimal_cols:\n"
        '  bal: "18,2"\n'
    )
    assert main(["run", str(job)]) == 0
    out = capsys.readouterr().out
    assert "transferred 5 rows" in out

    log = dbapi_fake.statement_log(str(db))
    ddl = next(s for s, _, _ in log if s.upper().startswith("CREATE TABLE IF"))
    assert "bal DECIMAL(18,2)" in ddl
    assert {st for _, _, st in log} == {"pyformat"}
    raw = sqlite3.connect(str(db)).execute(
        "SELECT k, bal FROM accounts ORDER BY k"
    ).fetchall()
    assert [b for _, b in raw] == cents  # exact digit strings, to the cent


def test_cli_transfer_to_sqlite_url(ray_session, tmp_path, capsys):
    """The sqlite:// target URL routes the generic file transfer into the
    SQL sink (scheme + #table, qmark binds, stdlib driver)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tinyetl_ray.cli import main

    src = tmp_path / "s.parquet"
    pq.write_table(pa.table({"k": list(range(7)), "v": ["x"] * 7}), src)
    db = tmp_path / "t.db"
    assert main(["transfer", str(src), f"sqlite://{db}#stuff"]) == 0
    rows = sqlite3.connect(str(db)).execute("SELECT COUNT(*) FROM stuff").fetchone()
    assert rows[0] == 7


def test_sql_url_relative_path_stays_relative(tmp_path, monkeypatch):
    """sqlite://out/data.db means ./out/data.db, NOT /data.db: a relative
    path with directories must not have its first segment eaten as a host.
    Explicit host forms (localhost, host:port) still strip the host."""
    paths = {
        "sqlite://out/data.db#t": "out/data.db",
        "sqlite://plain.db#t": "plain.db",
        "sqlite:///abs/p.db#t": "/abs/p.db",
        "fake-mysql://localhost/tmp/x.db#t": "/tmp/x.db",
        "fake-mysql://db:3306/tmp/x.db#t": "/tmp/x.db",
    }
    for url, want in paths.items():
        connect, _dialect, _table = sqlsrc.sql_target_from_url(url)
        assert connect.__defaults__[0] == want, (url, connect.__defaults__)
    # end-to-end: the relative URL lands in cwd-relative out/, not /
    monkeypatch.chdir(tmp_path)
    connect, _, table = sqlsrc.sql_target_from_url("sqlite://out/data.db#t")
    os.makedirs("out", exist_ok=True)
    con = connect()
    con.execute("CREATE TABLE t (x INTEGER)")
    con.commit()
    con.close()
    assert (tmp_path / "out" / "data.db").exists()


def test_parse_decimal_cols_friendly_errors():
    assert sqlsrc.parse_decimal_cols(["bal=18,2"]) == {"bal": (18, 2)}
    assert sqlsrc.parse_decimal_cols({"bal": "18,2"}) == {"bal": (18, 2)}
    with pytest.raises(ValueError, match="col=precision,scale"):
        sqlsrc.parse_decimal_cols(["bal18,2"])  # missing '='
    with pytest.raises(ValueError, match="precision,scale"):
        sqlsrc.parse_decimal_cols(["bal=18"])  # missing scale
