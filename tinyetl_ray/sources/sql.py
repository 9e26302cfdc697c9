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

import os
from collections.abc import Callable

import pandas as pd
import ray
import ray.data

# Per-dialect DDL type maps, mirrored from the reference connectors:
# postgres.rs:377-383, mysql.rs:390-399 (map_data_type_to_mysql),
# mssql.rs:357-367 (sql_type_from_data_type). Logical types: int / float /
# bool / datetime / string (pandas dtypes collapse onto these).
_DIALECT_TYPES: dict[str, dict[str, str]] = {
    "generic": {
        "int": "BIGINT", "float": "DOUBLE PRECISION", "bool": "BOOLEAN",
        "datetime": "TIMESTAMP", "string": "TEXT",
    },
    "sqlite": {
        "int": "BIGINT", "float": "REAL", "bool": "BOOLEAN",
        "datetime": "TIMESTAMP", "string": "TEXT",
    },
    "postgres": {
        "int": "BIGINT", "float": "DECIMAL", "bool": "BOOLEAN",
        "datetime": "TIMESTAMP WITH TIME ZONE", "string": "TEXT",
    },
    "mysql": {
        "int": "BIGINT", "float": "DECIMAL(65,30)", "bool": "BOOLEAN",
        "datetime": "DATETIME", "string": "TEXT",
    },
    "mssql": {
        "int": "BIGINT", "float": "DECIMAL(18,6)", "bool": "BIT",
        "datetime": "DATETIME2", "string": "NVARCHAR(MAX)",
    },
}

# Engine bind-parameter budgets (sqlite.rs:355-402 ≤900 params;
# postgres.rs:431-492 65535 params chunked to ≤1000 rows;
# mssql.rs:563-620 2100 params / ≤1000 rows; mysql: effectively
# max_allowed_packet-bound, use the postgres budget).
_DIALECT_MAX_BIND_PARAMS = {
    "generic": 900, "sqlite": 900, "postgres": 65_535,
    "mysql": 65_535, "mssql": 2_100,
}
_DIALECT_MAX_ROWS_PER_INSERT = {"postgres": 1_000, "mssql": 1_000, "mysql": 1_000}


# CLI-facing SQL target URLs: scheme -> (dialect, fake-driver paramstyle;
# None = stdlib sqlite3). The fake-* schemes route to the in-repo DBAPI
# double (sources/dbapi_fake) declaring the paramstyle the matching real
# driver would (psycopg2 -> format, MySQLdb -> pyformat, pymssql -> format)
# — the sandbox's server-DB surface (reference src/connectors/postgres.rs /
# mysql.rs / mssql.rs; the real wire protocols need servers this
# environment doesn't have, README "Server databases").
_SQL_URL_SCHEMES = {
    "sqlite": ("sqlite", None),
    "fake-postgres": ("postgres", "format"),
    "fake-mysql": ("mysql", "pyformat"),
    "fake-mssql": ("mssql", "format"),
}


def is_sql_url(url: str) -> bool:
    return "://" in url and url.split("://", 1)[0].lower() in _SQL_URL_SCHEMES


def sql_target_from_url(url: str) -> tuple[Callable, str, str]:
    """Parse ``scheme://[host]/path/db[#table]`` into (connection_factory,
    dialect, table). The database is the URL path; the ``#fragment`` names
    the table (the same #table convention sources/urls.py uses for file
    sources, reference src/cli.rs table-name resolution), defaulting to the
    db file's stem. The factory is picklable (Ray write actors call it)."""
    scheme, rest = url.split("://", 1)
    dialect, style = _SQL_URL_SCHEMES[scheme.lower()]
    frag = None
    if "#" in rest:
        rest, frag = rest.split("#", 1)
    if rest.startswith("/"):
        path = rest
    elif "/" in rest:
        head, tail = rest.split("/", 1)
        # tolerate an EXPLICIT host segment (fake-mysql://localhost/tmp/x.db,
        # host:port) — but a plain first directory is a RELATIVE path
        # (sqlite://out/data.db means ./out/data.db, not /data.db)
        if head in ("localhost", "127.0.0.1") or ":" in head:
            path = "/" + tail
        else:
            path = rest  # relative path with directories
    else:
        path = rest  # bare relative filename
    table = frag or os.path.splitext(os.path.basename(path))[0]
    _check_ident(table)
    if style is None:

        def connect(p=path):
            import sqlite3
            from decimal import Decimal

            # exact-digit Decimal binds (write_table's decimal_cols path);
            # server drivers accept Decimal natively, sqlite3 needs this
            sqlite3.register_adapter(Decimal, str)
            return sqlite3.connect(p, check_same_thread=False)

    else:

        def connect(p=path, s=style):
            from . import dbapi_fake

            return dbapi_fake.connect(p, s)

    return connect, dialect, table


def parse_decimal_cols(spec) -> dict[str, tuple[int, int]] | None:
    """Normalize the CLI/YAML decimal-column forms into write_table's
    ``{col: (precision, scale)}``: accepts a mapping ``{col: "18,2"}``
    (job-config block) or an iterable of ``"col=18,2"`` strings
    (repeatable --decimal-col flags)."""
    if not spec:
        return None
    if isinstance(spec, dict):
        items: list[tuple[str, str]] = list(spec.items())
    else:
        items = []
        for s in spec:
            if "=" not in str(s):
                raise ValueError(
                    f"decimal column spec {s!r}: want 'col=precision,scale'"
                )
            col, _, ps = str(s).partition("=")
            items.append((col, ps))
    out: dict[str, tuple[int, int]] = {}
    for col, ps in items:
        try:
            p, s = (int(x) for x in str(ps).split(","))
        except ValueError as e:
            raise ValueError(
                f"decimal column {col!r}: want 'precision,scale', got {ps!r}"
            ) from e
        out[_check_ident(col.strip())] = (p, s)
    return out


def _logical_type(dtype) -> str:
    s = str(dtype)
    if s.startswith("datetime"):
        return "datetime"
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith("float"):
        return "float"
    if s == "bool":
        return "bool"
    return "string"


def _logical_type_arrow(t) -> str:
    import pyarrow as pa

    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    return "string"


def read_table(
    query: str, connection_factory: Callable, **kwargs
) -> ray.data.Dataset:
    return ray.data.read_sql(query, connection_factory, **kwargs)


_IDENT_RE = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_.$]*$")


def _check_ident(name: str) -> str:
    """Table/column names are interpolated into SQL (DBAPI cannot bind
    identifiers), so validate them against a strict identifier grammar
    instead of trusting callers (round-2 advice)."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def _detect_paramstyle(conn) -> str:
    """DBAPI paramstyle is a MODULE attribute; infer it from the connection.
    Checks (most→least specific): a ``paramstyle`` attribute on the
    connection itself (a real DBAPI conn has none — lets test doubles and
    wrappers carry their style), then each module on the connection class's
    dotted path from leaf to top package (psycopg2 connections live in
    ``psycopg2.extensions`` but the attribute sits on ``psycopg2``)."""
    import sys

    style = getattr(conn, "paramstyle", None)
    if isinstance(style, str):
        return style
    parts = type(conn).__module__.split(".")
    for i in range(len(parts), 0, -1):
        mod = sys.modules.get(".".join(parts[:i]))
        style = getattr(mod, "paramstyle", None) if mod else None
        if isinstance(style, str):
            return style
    return "qmark"


def _placeholder(style: str) -> str:
    if style == "qmark":
        return "?"
    if style in ("format", "pyformat"):
        return "%s"
    raise ValueError(
        f"unsupported DBAPI paramstyle {style!r} (qmark/format/pyformat only)"
    )


def _keyset_pages(
    connection_factory: Callable,
    table: str,
    key_col: str,
    sel: str,
    batch_size: int,
    lo,
    hi,
    spill: str,
    shard: int,
    paramstyle: str | None = None,
) -> int:
    """Page the ``(lo, hi]`` key range of ``table`` into parquet files under
    ``spill`` (lo/hi None → unbounded). Runs either inline (single shard) or
    as a Ray task — each shard opens its OWN connection and pages a disjoint
    key range, so N workers ingest in parallel (the ray.data.read_sql
    sharding pattern applied to keyset pagination). Returns pages written."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n_pages = 0
    with _closing(connection_factory()) as conn:
        style = paramstyle or _detect_paramstyle(conn)
        p = _placeholder(style)
        cur = conn.cursor()

        def write_page(rows, description) -> None:
            nonlocal n_pages
            if not rows:
                return
            names = [d[0] for d in description]
            pq.write_table(
                pa.Table.from_pandas(
                    pd.DataFrame(rows, columns=names), preserve_index=False
                ),
                os.path.join(spill, f"shard-{shard:04d}-page-{n_pages:06d}.parquet"),
            )
            n_pages += 1

        last = lo
        while True:
            # Pages advance over DISTINCT key values, then each page fetches
            # its full closed key range (key > last AND key <= page_hi): a
            # plain `key > last` row cursor SILENTLY DROPS the remaining
            # duplicates of a boundary key when key_col is non-unique.
            conds, params = [f"{key_col} IS NOT NULL"], []
            if last is not None:
                conds.append(f"{key_col} > {p}")
                params.append(last)
            if hi is not None:
                conds.append(f"{key_col} <= {p}")
                params.append(hi)
            cur.execute(
                f"SELECT DISTINCT {key_col} FROM {table} "
                f"WHERE {' AND '.join(conds)} ORDER BY {key_col} LIMIT {p}",
                (*params, batch_size),
            )
            keys = cur.fetchall()
            if not keys:
                break
            # NATIVE python scalar: numpy types bind as blobs in sqlite3
            # and silently match nothing
            page_hi = keys[-1][0]
            if last is None:
                cur.execute(
                    f"SELECT {sel} FROM {table} WHERE {key_col} <= {p} "
                    f"ORDER BY {key_col}",
                    (page_hi,),
                )
            else:
                cur.execute(
                    f"SELECT {sel} FROM {table} WHERE {key_col} > {p} "
                    f"AND {key_col} <= {p} ORDER BY {key_col}",
                    (last, page_hi),
                )
            write_page(cur.fetchall(), cur.description)
            last = page_hi
    return n_pages


def read_table_keyset(
    table: str,
    key_col: str,
    connection_factory: Callable,
    batch_size: int = 10_000,
    columns: list[str] | None = None,
    shards: int = 1,
    paramstyle: str | None = None,
) -> ray.data.Dataset:
    """KEYSET-paginated read (the reference's odbc.rs:233-256 fix for O(n²)
    OFFSET pagination, generalized to any DBAPI source): pages advance over
    DISTINCT key values and each page fetches its full closed key range, so
    duplicate keys are never split/dropped across pages — O(n log n) total
    with an index on ``key_col``, bounded client memory, and a stable
    resume cursor (the last key IS the checkpoint, exactly like the
    engine's LSN watermark). Pages spill to parquet as they arrive (memory =
    ONE page per worker), then the distributed read takes over — also makes
    the ingest resumable at page granularity.

    ``shards > 1`` splits a NUMERIC key space at min/max into equal ranges
    paged by concurrent Ray tasks, each over its own connection (the
    ray.data.read_sql sharding shape); non-numeric keys fall back to one
    sequential shard. The spill dir must be on storage all workers share —
    the same assumption the table root already makes.

    ``paramstyle`` overrides DBAPI placeholder detection (sqlite3 → '?',
    psycopg2/MySQLdb → '%s'); identifiers are validated, never trusted."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    _check_ident(table)
    _check_ident(key_col)
    for c in columns or ():
        _check_ident(c)
    sel = ", ".join(columns) if columns else "*"
    spill = tempfile.mkdtemp(prefix="tinyetl-keyset-")
    bounds = None
    with _closing(connection_factory()) as conn:
        style = paramstyle or _detect_paramstyle(conn)
        _placeholder(style)  # fail fast on unsupported styles
        cur = conn.cursor()
        # NULL keys compare false to everything, so the range pages would
        # silently drop them (and an all-NULL key column would loop
        # forever) — fetch them once up front
        cur.execute(f"SELECT {sel} FROM {table} WHERE {key_col} IS NULL")
        rows = cur.fetchall()
        if rows:
            names = [d[0] for d in cur.description]
            pq.write_table(
                pa.Table.from_pandas(
                    pd.DataFrame(rows, columns=names), preserve_index=False
                ),
                os.path.join(spill, "null-keys.parquet"),
            )
        if shards > 1:
            cur.execute(f"SELECT MIN({key_col}), MAX({key_col}) FROM {table}")
            mn, mx = cur.fetchone()
            if (
                isinstance(mn, (int, float))
                and isinstance(mx, (int, float))
                and mx > mn
            ):
                bounds = [
                    mn + (mx - mn) * s / shards for s in range(1, shards)
                ]
    if bounds is not None:
        remote_pages = ray.remote(_keyset_pages)
        edges = [None, *bounds, None]
        ray.get(
            [
                remote_pages.remote(
                    connection_factory,
                    table,
                    key_col,
                    sel,
                    batch_size,
                    edges[s],
                    edges[s + 1],
                    spill,
                    s,
                    style,
                )
                for s in range(shards)
            ]
        )
    else:
        _keyset_pages(
            connection_factory, table, key_col, sel, batch_size, None, None,
            spill, 0, style,
        )
    if not os.listdir(spill):
        return ray.data.from_pandas(pd.DataFrame())
    return ray.data.read_parquet(spill)


def create_table_sql(
    table: str,
    df: pd.DataFrame,
    dialect: str = "generic",
    decimal_cols: dict[str, tuple[int, int]] | None = None,
) -> str:
    """``decimal_cols`` maps column → (precision, scale) for exact DECIMAL
    DDL — the reference keeps Decimal as a first-class internal type
    (schema.rs:376-386) and its MySQL target maps it to DECIMAL(65,30)
    (mysql.rs:390); this engine is float64 end-to-end (the reference's own
    Arrow boundary, schema.rs:29) EXCEPT where a caller opts a money column
    into fixed-point fidelity here."""
    import pyarrow as pa

    types = _DIALECT_TYPES.get(dialect, _DIALECT_TYPES["generic"])
    if isinstance(df, pa.Schema):
        # Arrow schema path: typing is declared, not sniffed — a NULL in
        # a sampled first row cannot silently demote a numeric column to
        # TEXT the way a pandas-dtype probe would.
        items = [(f.name, _logical_type_arrow(f.type)) for f in df]
    else:
        items = [(str(n), _logical_type(d)) for n, d in df.dtypes.items()]
    cols = []
    for name, lt in items:
        _check_ident(name)
        if decimal_cols and name in decimal_cols:
            p, s = decimal_cols[name]
            cols.append(f"{name} DECIMAL({int(p)},{int(s)})")
        else:
            cols.append(f"{name} {types[lt]}")
    return f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)})"


def write_table(
    ds: ray.data.Dataset,
    table: str,
    connection_factory: Callable,
    max_bind_params: int | None = None,
    dialect: str = "generic",
    truncate: bool = False,
    concurrency: int = 1,  # sqlite is single-writer; raise for server DBs
    decimal_cols: dict[str, tuple[int, int]] | None = None,
) -> int:
    """Distributed chunked INSERT (append-first; truncate on request —
    transfer.rs:92-118 semantics). Placeholders follow the connection's
    DBAPI paramstyle; identifiers are validated; chunk sizing follows the
    dialect's bind-parameter budget and per-INSERT row caps (sqlite ≤900
    params, postgres 65535 params / ≤1000 rows, mssql 2100 params / ≤1000
    rows — the reference's limits). Returns rows written.

    ``decimal_cols`` opts columns into fixed-point fidelity: DDL becomes
    DECIMAL(p,s) and values are bound as ``decimal.Decimal`` quantized to
    ``s`` digits (no float repr ever reaches the wire — cents stay exact).
    The driver must accept Decimal binds (server DBs do natively; sqlite3
    needs an adapter, e.g. ``sqlite3.register_adapter(Decimal, str)``)."""
    import pyarrow as pa

    _check_ident(table)
    if max_bind_params is None:
        max_bind_params = _DIALECT_MAX_BIND_PARAMS.get(dialect, 900)
    # DDL comes from the dataset's declared schema, not a sampled first
    # row: a NULL in row 0 would type the column TEXT, and ds.limit(1)
    # would execute the upstream (lazy) pipeline a second time.
    sch = ds.schema()
    names = list(sch.names)
    try:
        ddl_schema = pa.schema(list(zip(names, sch.types)))
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        ddl_schema = None  # non-Arrow block types: fall back to a probe
    with _closing(connection_factory()) as conn:
        style = _detect_paramstyle(conn)
        cur = conn.cursor()
        cur.execute(
            create_table_sql(
                table,
                ddl_schema if ddl_schema is not None else ds.limit(1).to_pandas(),
                dialect,
                decimal_cols,
            )
        )
        if truncate:
            cur.execute(f"DELETE FROM {table}")
        conn.commit()

    ncols = max(1, len(names))
    chunk_rows = max(1, max_bind_params // ncols)
    chunk_rows = min(chunk_rows, _DIALECT_MAX_ROWS_PER_INSERT.get(dialect, chunk_rows))
    cols = [_check_ident(c) for c in names]
    placeholders = ",".join([_placeholder(style)] * ncols)
    insert = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})"

    dec_idx = (
        {cols.index(c): s for c, (_, s) in decimal_cols.items() if c in cols}
        if decimal_cols
        else {}
    )

    class Writer:
        def __init__(self):
            self.conn = connection_factory()  # once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from decimal import Decimal

            df = df[cols]
            cur = self.conn.cursor()
            rows = list(df.itertuples(index=False, name=None))
            if dec_idx:
                quant = {i: Decimal(1).scaleb(-s) for i, s in dec_idx.items()}

                def _dec(v, q):
                    # a nullable money column binds NULL as None —
                    # Decimal(str(None)) raises InvalidOperation
                    if v is None or pd.isna(v):
                        return None
                    return Decimal(str(v)).quantize(q)

                rows = [
                    tuple(
                        _dec(v, quant[i]) if i in quant else v
                        for i, v in enumerate(r)
                    )
                    for r in rows
                ]
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
