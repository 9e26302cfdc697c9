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


# ---------------------------------------------------------------------------
# degenerate-corpus parity: the real fixtures contain zero exact-duplicate
# texts, zero NULL texts, and no text shorter than the probe offset, so the
# canonical-copy marking and the probe-filter semantics are vacuous above.
# A planted corpus exercises them for real on BOTH sides.
# ---------------------------------------------------------------------------


def _planted_docs_dir(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_planted"
    d.mkdir()
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


LONG_A = "the quick brown fox jumps over the lazy dog again and again " * 3
LONG_B = "a completely different document body with plenty of words here " * 3


@pytest.mark.parametrize("case,rows", [
    # exact duplicates (incl. a triple) + NULL texts + an empty text: the
    # canonical copy is min-doc_id per text group, NULLs form ONE group
    # distinct from ''
    ("dups_nulls", [
        (1, LONG_A), (2, LONG_B), (3, LONG_A), (4, None), (5, None),
        (6, ""), (7, LONG_A), (8, LONG_B + " tail"),
    ]),
    # every probe-source text shorter than the probe offset: all probe
    # slices are empty -> no document is contaminated (and the oracle must
    # still emit one row per doc)
    ("short_probes", [
        (1, "tiny"), (2, "also tiny"), (3, None),
        (4, LONG_A), (5, LONG_A), (6, LONG_B),
    ]),
])
def test_corpus_clean_planted_corpus(case, rows, tmp_path):
    import __ray_entry__ as e

    sf = _planted_docs_dir(tmp_path, rows)
    c2 = duckdb.connect()
    c2.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}')"
    )
    for name in ("contamination_flag", "corpus_clean"):
        got = _to_pandas(e.queries()[name](sf))
        want = c2.sql(e.oracle_sql()[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert len(got) == len(want) == len(rows), name
        pd.testing.assert_frame_equal(
            _normalize(got), _normalize(want),
            check_dtype=False, check_exact=False, rtol=1e-9,
        )
    if case == "dups_nulls":
        clean = _to_pandas(e.queries()["corpus_clean"](sf)).set_index("doc_id")
        # min-doc_id per duplicate group is canonical; NULLs group together
        assert clean.loc[1, "is_canonical"] and not clean.loc[3, "is_canonical"]
        assert not clean.loc[7, "is_canonical"]
        assert clean.loc[4, "is_canonical"] and not clean.loc[5, "is_canonical"]
        assert clean.loc[6, "is_canonical"]  # '' is NOT the NULL group


def test_rolling_1h_range_frame_tie_semantics(tmp_path):
    """SQL RANGE frames include ALL peer rows sharing the current ORDER BY
    value — planted duplicate (user, ts) rows must each see the other's
    value in their window (the collapse-and-merge-back path)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    d = tmp_path / "sf_ties"
    d.mkdir()
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([t0, t0, t0 + pd.Timedelta("30min"),
                        t0 + pd.Timedelta("75min"), t0 + pd.Timedelta("30min"),
                        t0 + pd.Timedelta("150min")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a"] * 6, pa.string()),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0], pa.float64()),
        "props": pa.array(["{}"] * 6, pa.string()),
    })
    pq.write_table(t, str(d / "events.parquet"))
    con2 = duckdb.connect()
    con2.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d / 'events.parquet'}')"
    )
    got = _to_pandas(e.queries()["events_rolling_1h"](str(d)))
    want = con2.sql(e.oracle_sql()["events_rolling_1h"]).df()
    pd.testing.assert_frame_equal(_normalize(got), _normalize(want), check_dtype=False)
    by_id = got.set_index("event_id")["rolling_value"]
    # the two ts-tied rows (ids 2 and 4) are peers: both windows contain both
    assert by_id[2] == by_id[4] == 1.0 + 2.0 + 4.0 + 16.0
