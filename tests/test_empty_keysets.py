"""Empty-broadcast-keyset edges (round-3 advice): queries whose vectorized
probe indexes into a broadcast sorted-key array must return EMPTY results —
not IndexError — when the keyset is empty (no BUILDING customers, empty
customer table, empty orders side)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from tinyetl_ray.pipelines import parity as p


@pytest.fixture(scope="module")
def sparse_sf(tmp_path_factory):
    """A minimal sf dir: customers with NO 'BUILDING' segment, an EMPTY
    customer variant, orders/lineitem/events present."""
    d = tmp_path_factory.mktemp("sparse_sf")
    cust = pd.DataFrame(
        {"c_custkey": np.arange(5, dtype=np.int64),
         "c_mktsegment": ["MACHINERY"] * 5,
         "c_name": [f"c{i}" for i in range(5)]}
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(10, dtype=np.int64),
            "o_custkey": np.arange(10, dtype=np.int64) % 5,
            "o_orderdate": pd.to_datetime(["1997-01-01"] * 10),
            "o_totalprice": np.linspace(10, 100, 10),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(10, dtype=np.int64),
            "l_extendedprice": np.linspace(100, 1000, 10),
            "l_discount": np.full(10, 0.05),
            "l_shipdate": pd.to_datetime(["1998-07-01"] * 10),
        }
    )
    ev = pd.DataFrame(
        {
            "event_id": np.arange(8, dtype=np.int64),
            "user_id": np.arange(8, dtype=np.int64) % 4,
            "ts": pd.to_datetime(["2024-01-01"] * 8),
            "event_type": ["click"] * 8,
            "value": np.ones(8),
        }
    )
    cust.to_parquet(os.path.join(d, "customer.parquet"), index=False)
    orders.to_parquet(os.path.join(d, "orders.parquet"), index=False)
    li.to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    ev.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def empty_cust_sf(sparse_sf, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_cust_sf")
    for t in ("orders", "lineitem", "events"):
        os.link(os.path.join(sparse_sf, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    pd.DataFrame(
        {"c_custkey": pd.Series([], dtype="int64"),
         "c_mktsegment": pd.Series([], dtype="object"),
         "c_name": pd.Series([], dtype="object")}
    ).to_parquet(os.path.join(d, "customer.parquet"), index=False)
    return str(d)


def test_q3_no_building_customers(ray_session, sparse_sf):
    out = p.q3_shipping_priority(sparse_sf).to_pandas()
    assert len(out) == 0
    # Ray drops the schema of a fully-empty dataset in to_pandas(); the
    # guarantee here is NO IndexError and zero rows, not column names
    assert list(out.columns) in ([], ["l_orderkey", "o_orderdate", "revenue"])


def test_q3_empty_customer_table(ray_session, empty_cust_sf):
    assert len(p.q3_shipping_priority(empty_cust_sf).to_pandas()) == 0


def test_set_ops_empty_customer_table(ray_session, empty_cust_sf):
    out = p.set_ops_users(empty_cust_sf).to_pandas()
    assert len(out) == 4  # every distinct user_id is 'except'
    assert set(out["op"]) == {"except"}


def test_asof_empty_orders(ray_session, tmp_path):
    d = tmp_path / "asof_empty"
    d.mkdir()
    pd.DataFrame(
        {
            "o_custkey": pd.Series([], dtype="int64"),
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        }
    ).to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "user_id": np.zeros(3, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
        }
    ).to_parquet(d / "events.parquet", index=False)
    out = p.asof_join_events_orders(str(d)).to_pandas()
    assert len(out) == 3
    assert out["last_order_date"].isna().all()


def test_asof_selects_partitioned_past_limit(ray_session, sparse_sf, monkeypatch):
    # force the gate: with limit 0 the broadcast variant must delegate
    monkeypatch.setattr(p, "ASOF_BROADCAST_ROW_LIMIT", 0)
    small = p.asof_join_partitioned(sparse_sf).to_pandas()
    gated = p.asof_join_events_orders(sparse_sf).to_pandas()
    key = ["event_id", "user_id"]
    pd.testing.assert_frame_equal(
        gated.sort_values(key).reset_index(drop=True),
        small.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
