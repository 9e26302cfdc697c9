"""Generic DBAPI source/sink — the reference's database connector shape.

All of TinyETL's DB connectors share one pattern (SURVEY.md §2.2): schema
from catalog or sample, paginated reads, CREATE TABLE IF NOT EXISTS +
chunked multi-row INSERT sized to engine bind-parameter limits (SQLite ≤900
params sqlite.rs:355-402, Postgres 65535→1000 rows postgres.rs:431-492,
MSSQL ≤1000 rows mssql.rs:563-620). This module reproduces that pattern once
over any DBAPI connection factory:

- ``read_table``: ``ray.data.read_sql`` (Ray parallelizes via sharded
  queries where supported; the reference's OFFSET pagination is O(n²) —
  odbc.rs keyset pagination was its only fix).
- ``write_table``: per-Ray-block INSERT chunks through an actor pool — one
  connection per actor (setup once), chunk size = max_bind_params /
  n_columns, executemany per chunk.

Only sqlite ships in this environment; postgres/mysql drivers would plug in
through the same ``connection_factory``.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import ray
import ray.data

_TYPE_SQL = {
    "int64": "BIGINT",
    "int32": "BIGINT",
    "float64": "DOUBLE PRECISION",
    "float32": "DOUBLE PRECISION",
    "bool": "BOOLEAN",
    "object": "TEXT",
    "string": "TEXT",
}


def read_table(
    query: str, connection_factory: Callable, **kwargs
) -> ray.data.Dataset:
    return ray.data.read_sql(query, connection_factory, **kwargs)


def read_table_keyset(
    table: str,
    key_col: str,
    connection_factory: Callable,
    batch_size: int = 10_000,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """KEYSET-paginated read (the reference's odbc.rs:233-256 fix for O(n²)
    OFFSET pagination, generalized to any DBAPI source): pages advance over
    DISTINCT key values and each page fetches its full closed key range, so
    duplicate keys are never split/dropped across pages — O(n log n) total
    with an index on ``key_col``, bounded client memory, and a stable
    resume cursor (the last key IS the checkpoint, exactly like the
    engine's LSN watermark)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    sel = ", ".join(columns) if columns else "*"
    # Pages are keyed on DISTINCT key values, then each page fetches the
    # closed key range (key > last AND key <= hi): a plain `key > last`
    # cursor over rows SILENTLY DROPS the remaining duplicates of a
    # boundary key when key_col is non-unique. Page row count is
    # batch_size × (max duplicates per key) — document key cardinality
    # accordingly. Pages spill to parquet as they arrive (driver memory =
    # ONE page), then the distributed read takes over — also makes the
    # ingest resumable at page granularity.
    spill = tempfile.mkdtemp(prefix="tinyetl-keyset-")
    n_pages = 0

    def write_page(rows, description) -> None:
        nonlocal n_pages
        if not rows:
            return
        names = [d[0] for d in description]
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=names), preserve_index=False
            ),
            os.path.join(spill, f"page-{n_pages:06d}.parquet"),
        )
        n_pages += 1

    with _closing(connection_factory()) as conn:
        cur = conn.cursor()
        # NULL keys compare false to everything, so the range pages below
        # would silently drop them (and an all-NULL key column would loop
        # forever) — fetch them once up front
        cur.execute(f"SELECT {sel} FROM {table} WHERE {key_col} IS NULL")
        write_page(cur.fetchall(), cur.description)
        last = None
        while True:
            if last is None:
                cur.execute(
                    f"SELECT DISTINCT {key_col} FROM {table} "
                    f"WHERE {key_col} IS NOT NULL ORDER BY {key_col} LIMIT ?",
                    (batch_size,),
                )
            else:
                cur.execute(
                    f"SELECT DISTINCT {key_col} FROM {table} WHERE {key_col} > ? "
                    f"ORDER BY {key_col} LIMIT ?",
                    (last, batch_size),
                )
            keys = cur.fetchall()
            if not keys:
                break
            # NATIVE python scalar: numpy types bind as blobs in sqlite3
            # and silently match nothing
            hi = keys[-1][0]
            if last is None:
                cur.execute(
                    f"SELECT {sel} FROM {table} WHERE {key_col} <= ? "
                    f"ORDER BY {key_col}",
                    (hi,),
                )
            else:
                cur.execute(
                    f"SELECT {sel} FROM {table} WHERE {key_col} > ? "
                    f"AND {key_col} <= ? ORDER BY {key_col}",
                    (last, hi),
                )
            write_page(cur.fetchall(), cur.description)
            last = hi
    if n_pages == 0:
        return ray.data.from_pandas(pd.DataFrame())
    return ray.data.read_parquet(spill)


def create_table_sql(table: str, df: pd.DataFrame, dialect: str = "generic") -> str:
    cols = []
    for name, dtype in df.dtypes.items():
        sql_t = _TYPE_SQL.get(str(dtype), "TEXT")
        if str(dtype).startswith("datetime"):
            sql_t = "TIMESTAMP"
        if dialect == "sqlite" and sql_t in ("DOUBLE PRECISION",):
            sql_t = "REAL"
        cols.append(f"{name} {sql_t}")
    return f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)})"


def write_table(
    ds: ray.data.Dataset,
    table: str,
    connection_factory: Callable,
    max_bind_params: int = 900,
    dialect: str = "generic",
    truncate: bool = False,
    concurrency: int = 1,  # sqlite is single-writer; raise for server DBs
) -> int:
    """Distributed chunked INSERT (append-first; truncate on request —
    transfer.rs:92-118 semantics). Returns rows written."""
    probe = ds.limit(1).to_pandas()
    with _closing(connection_factory()) as conn:
        cur = conn.cursor()
        cur.execute(create_table_sql(table, probe, dialect))
        if truncate:
            cur.execute(f"DELETE FROM {table}")
        conn.commit()

    ncols = max(1, len(probe.columns))
    chunk_rows = max(1, max_bind_params // ncols)
    cols = list(probe.columns)
    placeholders = ",".join(["?"] * ncols)
    insert = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})"

    class Writer:
        def __init__(self):
            self.conn = connection_factory()  # once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols]
            cur = self.conn.cursor()
            rows = list(df.itertuples(index=False, name=None))
            for i in range(0, len(rows), chunk_rows):
                cur.executemany(insert, rows[i : i + chunk_rows])
            self.conn.commit()
            return pd.DataFrame({"rows": [len(df)]})

    written = ds.map_batches(
        Writer, batch_format="pandas", concurrency=concurrency, num_cpus=0.5
    ).to_pandas()
    return int(written["rows"].sum()) if len(written) else 0


class _closing:
    def __init__(self, conn):
        self.conn = conn

    def __enter__(self):
        return self.conn

    def __exit__(self, *a):
        try:
            self.conn.close()
        except Exception:
            pass
