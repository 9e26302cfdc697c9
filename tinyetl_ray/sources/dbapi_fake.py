"""In-repo fake DBAPI driver: the server-DB test double.

The reference ships real Postgres/MySQL/MSSQL connectors
(/root/reference/src/connectors/postgres.rs:431-492, mysql.rs:523-537,
mssql.rs:563-620); this sandbox has no servers or drivers, so the generic
DBAPI path in ``sources/sql.py`` (paramstyle detection, dialect DDL maps,
bind-limit chunking, keyset pagination) had only ever run against sqlite's
qmark style. This module is a DBAPI-2.0-shaped driver that

- declares a configurable ``paramstyle`` (``format`` like psycopg2 or
  ``pyformat`` like MySQLdb) on each connection,
- translates ``%s`` placeholders to sqlite's ``?`` and exotic dialect type
  names (``DECIMAL(65,30)``, ``TIMESTAMP WITH TIME ZONE``,
  ``NVARCHAR(MAX)``, ``DATETIME2``, ``BIT``) to sqlite-storable ones while
  RECORDING the original SQL verbatim,
- logs every statement (and each ``executemany`` batch size) into a
  ``_fake_dbapi_log`` table inside the same database file, so assertions
  work across Ray worker processes,
- stores ``decimal.Decimal`` binds as exact strings (never float reprs).

It is NOT a SQL engine — sqlite executes everything; the fake only shapes
the wire protocol the way a server driver would.
"""

from __future__ import annotations

import re
import sqlite3
from decimal import Decimal

apilevel = "2.0"
threadsafety = 1
paramstyle = "format"  # module default; each connection carries its own

_TYPE_REWRITES = [
    (re.compile(r"DECIMAL\(\s*\d+\s*,\s*\d+\s*\)", re.I), "TEXT"),
    (re.compile(r"TIMESTAMP WITH TIME ZONE", re.I), "TEXT"),
    (re.compile(r"NVARCHAR\(MAX\)", re.I), "TEXT"),
    (re.compile(r"DATETIME2", re.I), "TEXT"),
    (re.compile(r"\bDATETIME\b", re.I), "TEXT"),
    (re.compile(r"\bBIT\b", re.I), "INTEGER"),
    (re.compile(r"DOUBLE PRECISION", re.I), "REAL"),
]

_CREATE_RE = re.compile(r"^(\s*CREATE TABLE[^(]*\()(.*)(\)\s*)$", re.I | re.S)
_ALTER_ADD_RE = re.compile(r"^(.*\bADD(?:\s+COLUMN)?\s+\S+\s+)(.*)$", re.I | re.S)


def _rewrite_ddl_types(sql: str) -> str:
    """Rewrite dialect type names in TYPE position only — a bare word-bound
    substitution would also rename a column NAMED ``datetime`` or ``bit``
    (create_table_sql emits unquoted identifiers), breaking every
    subsequent INSERT against the renamed column."""

    def _types_only(coldef: str) -> str:
        stripped = coldef.lstrip()
        lead = coldef[: len(coldef) - len(stripped)]
        name, sep, typ = stripped.partition(" ")
        for pat, repl in _TYPE_REWRITES:
            typ = pat.sub(repl, typ)
        return lead + name + sep + typ

    m = _CREATE_RE.match(sql)
    if m:
        head, body, tail = m.groups()
        parts, cur, depth = [], [], 0
        for ch in body:  # split on TOP-LEVEL commas only (DECIMAL(18,2))
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        return head + ",".join(_types_only(p) for p in parts) + tail
    m = _ALTER_ADD_RE.match(sql)
    if m:
        head, typ = m.groups()
        for pat, repl in _TYPE_REWRITES:
            typ = pat.sub(repl, typ)
        return head + typ
    return sql


_LOG_DDL = (
    "CREATE TABLE IF NOT EXISTS _fake_dbapi_log "
    "(sql TEXT, n_rows INTEGER, style TEXT)"
)


def _adapt(v):
    if isinstance(v, Decimal):
        return str(v)  # exact digits, never float repr
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    if v.__class__.__name__ == "Timestamp":
        return str(v)
    return v


class FakeCursor:
    def __init__(self, conn: "FakeConnection"):
        self._conn = conn
        self._cur = conn._db.cursor()

    @property
    def description(self):
        return self._cur.description

    def _translate(self, sql: str) -> str:
        if self._conn.paramstyle in ("format", "pyformat"):
            sql = sql.replace("%s", "?")
        if sql.lstrip().upper().startswith(("CREATE TABLE", "ALTER TABLE")):
            sql = _rewrite_ddl_types(sql)
        return sql

    def _log(self, sql: str, n_rows: int) -> None:
        if sql.startswith("SELECT") or "_fake_dbapi_log" in sql:
            return  # reads aren't protocol-shaping; don't recurse
        self._cur.execute(_LOG_DDL)
        self._cur.execute(
            "INSERT INTO _fake_dbapi_log VALUES (?, ?, ?)",
            (sql, n_rows, self._conn.paramstyle),
        )

    def execute(self, sql: str, params=()):
        # log AFTER success — a raising statement must not appear in the
        # protocol log as having reached the wire
        self._cur.execute(self._translate(sql), tuple(_adapt(p) for p in params))
        self._log(sql, 1 if params else 0)
        return self

    def executemany(self, sql: str, rows):
        rows = [tuple(_adapt(v) for v in r) for r in rows]
        self._cur.executemany(self._translate(sql), rows)
        self._log(sql, len(rows))
        return self

    def fetchall(self):
        return self._cur.fetchall()

    def fetchone(self):
        return self._cur.fetchone()

    def close(self):
        self._cur.close()


class FakeConnection:
    def __init__(self, path: str, style: str):
        if style not in ("format", "pyformat"):
            raise ValueError(f"fake driver styles: format/pyformat, got {style!r}")
        self.paramstyle = style  # _detect_paramstyle reads this first
        self._db = sqlite3.connect(path, check_same_thread=False)

    def cursor(self) -> FakeCursor:
        return FakeCursor(self)

    def commit(self):
        self._db.commit()

    def rollback(self):
        self._db.rollback()

    def close(self):
        self._db.close()


def connect(path: str, style: str = "format") -> FakeConnection:
    return FakeConnection(path, style)


def statement_log(path: str) -> list[tuple[str, int, str]]:
    """All protocol-shaping statements recorded in ``path``'s database, in
    execution order: (original SQL, rows bound, paramstyle)."""
    db = sqlite3.connect(path)
    try:
        try:
            return db.execute(
                "SELECT sql, n_rows, style FROM _fake_dbapi_log"
            ).fetchall()
        except sqlite3.OperationalError:
            return []
    finally:
        db.close()
