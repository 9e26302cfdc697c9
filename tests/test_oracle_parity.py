"""Driver-style correctness gate: every queries() entry vs its oracle_sql()
on the real testdata (sf0.001 for speed; the driver runs sf0.01).

Mirrors the driver's compare: row count, column names, and order-insensitive
value equality after sorting columns by name.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
# oracle artifact globs (simhash sigs, LSH edges) are sf-keyed; point them at
# the same corpus this test evaluates (driver default is sf0.01)
os.environ["TINYETL_ORACLE_SF_DIR"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _queries():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    return [(name, q[name], o.get(name)) for name in q]


@pytest.mark.parametrize("name", [n for n, _, _ in _queries()])
def test_query_matches_oracle(name, con):
    import __ray_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    got = _to_pandas(fn(SF_DIR))
    assert len(got) >= 0
    if sql is None:
        assert len(got) > 0  # rows-only check for non-SQL-expressible ops
        return
    want = con.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-9)


def test_entry_smoke():
    import __ray_entry__ as e

    out = _to_pandas(e.entry())
    assert len(out) >= 0
    assert "conv_id" in out.columns
