"""TinyETL-parity pipelines over the driver's TPC-H-ish tables.

Each function takes ``sf_dir`` and returns a Dataset whose DuckDB oracle
lives in __ray_entry__.oracle_sql(). These exercise the operator surface the
reference exposes (transform / validate / IO round-trip / preview / append)
plus the wide-operation patterns the reference lacks but a real engine needs
(pre-aggregated groupby, broadcast join).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.io import clean_read_parquet, sniffed_read_csv, write_any
from ..stages.transform import ExpressionTransform
from ..stages.validate import ColumnSpec, SchemaValidator


def _wide_parts() -> int:
    """Shuffle-partition count for key-partitioned operators (hash keys are
    routed MOD this, then each partition is processed vectorized — never a
    Python callback per key)."""
    from ..hashing import shuffle_blocks

    return shuffle_blocks(floor=16, divisor=1)


def _with_part(df, key_col: str, P: int):
    """Append the int32 `_part` routing column = key % P (shared by every
    key-partitioned parity operator)."""
    from ..hashing import mod_partition

    df = df.copy(deep=False)
    df["_part"] = mod_partition(df[key_col].to_numpy(), P)
    return df


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    # clean_read strips the testdata's pandas schema metadata (unhashable →
    # Ray re-ships schemas per shuffle task otherwise)
    return clean_read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _keyset(ds: ray.data.Dataset, col: str):
    """Gather one int64 column to a SORTED numpy array for a ray.put
    broadcast. Empty-safe: Ray's to_pandas() on a fully-empty dataset drops
    the schema (0×0 frame), so an absent column means zero keys — return an
    empty array instead of KeyError (round-3 advice)."""
    import numpy as np

    df = ds.to_pandas()
    if col not in df.columns or not len(df):
        return np.empty(0, np.int64)
    return np.sort(df[col].to_numpy(np.int64))


def transform_derive(sf_dir: str) -> ray.data.Dataset:
    """Inline-expression transform (Lua inline-mode parity): derived columns
    over customer — reference README:855-860 employees example shape."""
    t = ExpressionTransform(
        "name_upper = upper(c_name);"
        "acctbal_annual = c_acctbal * 12;"
        "segment_tag = concat(c_mktsegment, ':', c_nationkey)"
    )
    return _read(sf_dir, "customer").map_batches(t, batch_format="pandas")


def transform_filter(sf_dir: str) -> ray.data.Dataset:
    """Filter semantics (Lua nil-return parity) + derive."""
    t = ExpressionTransform(
        "price_k = o_totalprice / 1000",
        filter_expr="(o_totalprice > 150000) & (o_orderstatus == 'O')",
    )
    return _read(sf_dir, "orders").map_batches(t, batch_format="pandas")


def transform_project(sf_dir: str) -> ray.data.Dataset:
    """Projection semantics (Lua file-mode: only returned keys kept) — via
    column pruning AT THE READ, the scale-correct version."""
    return _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity", "l_extendedprice"])


def schema_validate(sf_dir: str) -> ray.data.Dataset:
    """Declared-schema validation with pattern + drop (dead-letter) semantics
    over part: keep only parts whose p_name matches an anchored word pattern
    and whose p_size parses as integer."""
    specs = [
        ColumnSpec("p_partkey", "integer", nullable=False),
        ColumnSpec("p_name", "string", pattern=r"[a-z ]+"),
        ColumnSpec("p_size", "integer", nullable=False),
    ]
    v = SchemaValidator(specs, on_error="drop")

    def to_strings(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("p_partkey").cast(pa.string()),
                "p_name": t.column("p_name"),
                "p_size": t.column("p_size").cast(pa.string()),
            }
        )

    return (
        _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_size"])
        .map_batches(to_strings, batch_format="pyarrow")
        .map_batches(v, batch_format="pyarrow")
    )


def csv_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """CSV target → sniffed CSV source round trip (reference CSV connector
    pair, csv.rs:15-357): values survive with types re-sniffed."""
    tmp = tempfile.mkdtemp(prefix="tinyetl-csv-")
    out = os.path.join(tmp, "customer_csv")
    write_any(_read(sf_dir, "customer"), out, fmt="csv")
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".csv")
    )
    return sniffed_read_csv(files)


def json_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """JSON target → JSON source round trip (json.rs connector pair)."""
    tmp = tempfile.mkdtemp(prefix="tinyetl-json-")
    out = os.path.join(tmp, "supplier_json")
    write_any(_read(sf_dir, "supplier"), out, fmt="json")
    return ray.data.read_json(out)


def preview(sf_dir: str) -> ray.data.Dataset:
    """--preview N parity (transfer.rs:201-240) made deterministic: first 20
    lineitems under (l_orderkey, l_linenumber) order."""
    return (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
        .sort(["l_orderkey", "l_linenumber"])
        .limit(20)
    )


def append_union(sf_dir: str) -> ray.data.Dataset:
    """Append-mode parity (transfer.rs:92-118): two sources into one target
    = Dataset.union, here re-splitting orders by status."""
    open_o = _read(sf_dir, "orders").filter(
        expr="o_orderstatus == 'O'"
    )
    rest = _read(sf_dir, "orders").filter(expr="o_orderstatus != 'O'")
    return open_o.union(rest)


def distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """DISTINCT parity (Dataset.unique is driver-side for one column; use the
    shuffle-native groupby-count so the result stays a Dataset)."""
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def events_tumbling_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour event-time window per user: count + sum(value).

    Ray Data has no native event-time windows (ray_guide 'Streaming-shaped
    workloads'); the window id is just a derived grouping column —
    floor(epoch_us / 3600e6) — so a windowed aggregate IS a groupby."""
    from ray.data.aggregate import Count, Sum

    def add_window(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        # numpy FLOOR division: pc.divide truncates toward zero, which puts
        # a pre-epoch event in the window AFTER it — the hopping twin and
        # the DuckDB oracle (`//`) both floor
        win = (us // 3_600_000_000) * 3_600_000_000
        t = t.append_column(
            "window_start", pa.array(win).cast(pa.timestamp("us"))
        )
        # the value column is exact 2-dp decimals: sum int64 CENTS so the
        # aggregate is order-independent and bit-identical to the oracle's
        # integer sum at ANY scale (float accumulation hit 4-dp rounding
        # boundaries on ~0.03% of sf0.1 groups)
        cents = pc.round(pc.multiply(t.column("value"), 100)).cast(pa.int64())
        return t.append_column("_cents", cents)

    def finish(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(t.column("sum_cents"), pa.float64()), 100)
        return t.drop_columns(["sum_cents"]).append_column("sum_value", s)

    return (
        _read(sf_dir, "events", columns=["ts", "user_id", "value"])
        .map_batches(add_window, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("_cents", alias_name="sum_cents"))
        .map_batches(finish, batch_format="pyarrow")
    )


def events_hopping_window(sf_dir: str) -> ray.data.Dataset:
    """HOPPING window (1 h size, 30 min hop): each event lands in exactly 2
    overlapping windows, materialized by flat-mapping the event into one row
    per containing window BEFORE a plain groupby — windows-as-derived-rows,
    the same groupby trick as tumbling, with fan-out = size/hop (2)."""
    from ray.data.aggregate import Count, Sum

    SIZE_US, HOP_US = 3_600_000_000, 1_800_000_000

    def explode_windows(t: pa.Table) -> pa.Table:
        import numpy as np

        us = t.column("ts").cast(pa.int64()).to_numpy()
        uid = t.column("user_id").to_numpy()
        val = t.column("value").to_numpy()
        # windows containing ts: starts in (ts-size, ts] stepped by hop
        last = (us // HOP_US) * HOP_US
        starts = [last, last - HOP_US]  # size/hop = 2 containing windows
        cents = np.rint(val * 100).astype(np.int64)  # exact: 2-dp values
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([uid, uid])),
                "window_start": pa.array(
                    np.concatenate(starts), pa.int64()
                ).cast(pa.timestamp("us")),
                "_cents": pa.array(np.concatenate([cents, cents])),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(t.column("sum_cents"), pa.float64()), 100)
        return t.drop_columns(["sum_cents"]).append_column("sum_value", s)

    return (
        _read(sf_dir, "events", columns=["ts", "user_id", "value"])
        .map_batches(explode_windows, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        # int64-cents sum: order-independent, bit-identical to the oracle
        .aggregate(Count(alias_name="n_events"), Sum("_cents", alias_name="sum_cents"))
        .map_batches(finish, batch_format="pyarrow")
    )


def events_running_total(sf_dir: str) -> ray.data.Dataset:
    """Cumulative per-user running sum ordered by event time — the
    window-frame ROWS UNBOUNDED PRECEDING pattern: hash-partition by user,
    ONE sort + pandas groupby.cumsum per partition (vectorized)."""
    import numpy as np
    import pandas as pd

    P = _wide_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        return _with_part(df, "user_id", P)

    def running_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # int64-cents cumsum (values are exact 2-dp): association-order
        # independent, bit-identical to the oracle's window sum at any
        # history length
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        run = pd.Series(cents, index=g.index).groupby(g["user_id"], sort=False).cumsum()
        g = g.assign(running_value=(run / 100.0).round(4))
        return g[["event_id", "user_id", "running_value"]]

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(running_part, batch_format="pandas")
    )


def events_sessionize(sf_dir: str) -> ray.data.Dataset:
    """Session windows (30-min inactivity gap) per user — the canonical
    partition-by-key + ordered scan, vectorized over each HASH PARTITION:
    one sort by (user, ts), session breaks by vectorized diff (a new user
    always breaks), one pandas groupby-agg per partition (C-speed; a
    map_groups per user would pay a Python callback per key)."""
    import numpy as np
    import pandas as pd

    GAP_US = 30 * 60 * 1_000_000
    P = _wide_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        return _with_part(df, "user_id", P)

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()  # pin µs
        uid = g["user_id"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > GAP_US)
        sess = np.cumsum(brk)
        out = g.groupby(sess, sort=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        return out.reset_index(drop=True)

    return (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(sessions_part, batch_format="pandas")
    )


def avro_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Avro target → Avro source round trip (reference avro.rs connector
    pair; pure-python OCF codec, deflate blocks, nullable unions)."""
    import tempfile

    from ..sources.avro import read_avro, write_avro

    tmp = tempfile.mkdtemp(prefix="tinyetl-avro-")
    out = os.path.join(tmp, "nation_avro")
    write_avro(_read(sf_dir, "nation"), out)
    files = sorted(os.path.join(out, f) for f in os.listdir(out))
    ds = read_avro(files)
    return ds.map_batches(
        lambda t: pa.table(
            {
                "n_nationkey": t.column("n_nationkey").cast(pa.int32()),
                "n_name": t.column("n_name"),
                "n_regionkey": t.column("n_regionkey").cast(pa.int32()),
            }
        ),
        batch_format="pyarrow",
    )


def sqlite_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """SQLite connector parity (reference src/connectors/sqlite.rs): write
    supplier through the generic DBAPI sink (chunked executemany under the
    ≤900-bind-param limit, connection per actor), read it back with
    ray.data.read_sql."""
    import sqlite3
    import tempfile

    from ..sources import sql as sqlsrc

    db = os.path.join(tempfile.mkdtemp(prefix="tinyetl-sqlite-"), "t.db")

    def connect(path=db):
        return sqlite3.connect(path, check_same_thread=False)

    sqlsrc.write_table(
        _read(sf_dir, "supplier"), "supplier", connect,
        max_bind_params=900, dialect="sqlite",
    )
    ds = sqlsrc.read_table("SELECT * FROM supplier", connect)
    return ds.map_batches(
        lambda t: t.set_column(
            t.column_names.index("s_nationkey"),
            "s_nationkey",
            t.column("s_nationkey").cast(pa.int32()),
        ),
        batch_format="pyarrow",
    )


def hash_join_native(sf_dir: str) -> ray.data.Dataset:
    """Large-side ⋈ large-side via Ray's native hash-partitioned join
    (Dataset.join, hash-shuffle both sides on the key). Use when neither
    side fits a broadcast; the broadcast variant (join_orders_customer)
    remains the right call for dimension tables."""
    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    c = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    j = o.join(c, "inner", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",))
    return j.select_columns(["o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"])


ASOF_BROADCAST_ROW_LIMIT = int(
    os.environ.get("TINYETL_ASOF_BROADCAST_ROWS", 5_000_000)
)
"""Build-side row cap for the broadcast as-of variant: 5M (key, date)
int64 pairs ≈ 80 MB in the object store — comfortably one-`ray.put`
territory. Past it, asof_join_events_orders self-selects the
hash-co-partitioned variant (same semantics, same oracle). Mirrors the
BROADCAST_PAIR_LIMIT gate in functions/dedup.py."""


def asof_join_events_orders(sf_dir: str) -> ray.data.Dataset:
    """AS-OF JOIN (custom operator — Ray Data has none): for every event,
    the latest order date of the matching customer at-or-before the event
    time.

    SELF-SELECTING strategy: a cheap metadata count of the build (orders)
    side picks the mode. Under ASOF_BROADCAST_ROW_LIMIT rows the {custkey →
    sorted order-date} frame is broadcast ONCE via ray.put and each batch
    answers with one C-speed pd.merge_asof — zero shuffle. Past the limit
    it delegates to asof_join_partitioned (both sides hash-co-partitioned
    on the key); both modes are oracle-checked against the same SQL."""
    import numpy as np
    import pandas as pd

    import pyarrow.parquet as pq

    n_orders = pq.ParquetFile(
        os.path.join(sf_dir, "orders.parquet")
    ).metadata.num_rows  # footer-only, no scan
    if n_orders > ASOF_BROADCAST_ROW_LIMIT:
        return asof_join_partitioned(sf_dir)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).to_pandas()
    if "o_custkey" not in orders.columns:  # empty dataset loses its schema
        orders = pd.DataFrame(
            {"o_custkey": pd.Series([], dtype="int64"),
             "o_orderdate": pd.Series([], dtype="datetime64[us]")}
        )
    od = pd.DataFrame(
        {
            "key": orders["o_custkey"].to_numpy(np.int64),
            "d": orders["o_orderdate"].astype("datetime64[us]").astype("int64"),
        }
    ).sort_values("d", kind="mergesort")
    ref = ray.put(od)

    class AsOf:
        def __init__(self):
            self.od = ray.get(ref)  # once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            # one C-speed merge_asof per batch against the broadcast orders
            # frame (a per-distinct-key Python loop was the old hot path)
            left = pd.DataFrame(
                {
                    "key": df["user_id"].to_numpy(np.int64),
                    "event_id": df["event_id"].to_numpy(np.int64),
                    "ts": df["ts"].astype("datetime64[us]").astype("int64"),
                }
            ).sort_values("ts", kind="mergesort")
            joined = pd.merge_asof(
                left, self.od, by="key", left_on="ts", right_on="d",
                direction="backward",
            )
            return pd.DataFrame(
                {
                    "event_id": joined["event_id"].to_numpy(),
                    "user_id": joined["key"].to_numpy(),
                    "last_order_date": pd.to_datetime(joined["d"], unit="us"),
                }
            )

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
        .map_batches(AsOf, batch_format="pandas", concurrency=2, num_cpus=0.5)
    )


def asof_join_partitioned(sf_dir: str) -> ray.data.Dataset:
    """AS-OF JOIN, large-large variant: both sides hash-co-partitioned on
    the key, then ONE pd.merge_asof(by=key) per partition — the in-group
    backward scan fully vectorized in C (a map_groups per key would pay a
    Python callback per customer). Use when the orders side outgrows a
    broadcast; same oracle as the broadcast variant. Partitioning
    assumption: all rows of one key share a partition (key % P does)."""
    import numpy as np
    import pandas as pd

    P = _wide_parts()

    def tag(df: pd.DataFrame, key: str, is_order: bool) -> pd.DataFrame:
        k = df[key].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": k,
                "_part": (k.astype(np.uint64) % np.uint64(P)).astype(np.int32),
                "event_id": df["event_id"].to_numpy(np.int64)
                if not is_order
                else np.full(len(df), -1, np.int64),
                "ts": df["ts" if not is_order else "o_orderdate"]
                .astype("datetime64[us]")
                .astype("int64"),
                "is_order": np.full(len(df), is_order),
            }
        )

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]).map_batches(
        lambda df: tag(df, "user_id", False), batch_format="pandas"
    )
    od = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).map_batches(
        lambda df: tag(df, "o_custkey", True), batch_format="pandas"
    )

    def resolve_part(g: pd.DataFrame) -> pd.DataFrame:
        evs = g[~g["is_order"]].sort_values("ts", kind="mergesort")
        ods = g[g["is_order"]].sort_values("ts", kind="mergesort")
        if not len(evs):
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "last_order_date": pd.Series([], dtype="datetime64[ns]"),
                }
            )
        joined = pd.merge_asof(
            evs[["key", "event_id", "ts"]],
            ods[["key", "ts"]].rename(columns={"ts": "od"}),
            by="key",
            left_on="ts",
            right_on="od",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": joined["event_id"].to_numpy(),
                "user_id": joined["key"].to_numpy(),
                "last_order_date": pd.to_datetime(joined["od"], unit="us"),
            }
        )

    return ev.union(od).groupby("_part").map_groups(resolve_part, batch_format="pandas")


def range_join_events_parts(sf_dir: str) -> ray.data.Dataset:
    """RANGE JOIN (custom operator): per event, how many parts have
    p_retailprice in [value*10, value*10 + 50].

    Broadcast the sorted price array once; each batch answers every row with
    two vectorized searchsorted calls — O(log n) per row, zero shuffle."""
    import numpy as np
    import pandas as pd

    prices = np.sort(
        _read(sf_dir, "part", columns=["p_retailprice"]).to_pandas()[
            "p_retailprice"
        ].to_numpy()
    )
    ref = ray.put(prices)

    class RangeCount:
        def __init__(self):
            self.prices = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            lo = df["value"].to_numpy() * 10
            hi = lo + 50
            n = np.searchsorted(self.prices, hi, side="right") - np.searchsorted(
                self.prices, lo, side="left"
            )
            out = df[["event_id"]].copy()
            out["n_parts_in_range"] = n.astype("int64")
            return out

    return (
        _read(sf_dir, "events", columns=["event_id", "value"])
        .map_batches(RangeCount, batch_format="pandas", concurrency=2, num_cpus=0.5)
    )


def topk_per_group(sf_dir: str) -> ray.data.Dataset:
    """Top-3 orders per customer by price (the window-function row_number
    pattern Ray Data lacks natively): hash-partition by customer, then ONE
    vectorized sort + pandas groupby.head per partition (C-speed — a
    map_groups per customer would pay a Python callback per key)."""
    import numpy as np
    import pandas as pd

    P = _wide_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        return _with_part(df, "o_custkey", P)

    def top3_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.groupby("o_custkey", sort=False).head(3).copy()
        g["rn"] = g.groupby("o_custkey", sort=False).cumcount() + 1
        return g.drop(columns=["_part"])

    return (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(top3_part, batch_format="pandas")
    )


def agg_quantiles(sf_dir: str) -> ray.data.Dataset:
    """EXACT distributed quantile_cont per group with NO per-group
    full-vector task (round-2 verdict: the old map_groups held a whole
    group's values in one task — a straggler/OOM on a skewed giant group).

    o_totalprice is fixed-precision money, so the per-group state is a
    MERGEABLE sparse histogram over integer cents: per-batch
    (status, cents, n) partials, one groupby-sum over (status, cents), then
    quantiles interpolated from each group's (value → count) histogram.
    State is bounded by the PRICE DOMAIN (≤ range·100 non-empty bins —
    ~5e7 worst case), not the group's row count: a 10^10-row group still
    reduces to the same bins. Exactness (unlike a t-digest): every stored
    double is nearest(2-dp decimal), so cents = round(v·100) → cents/100.0
    round-trips bit-exactly and the rank interpolation below reproduces
    np.percentile / SQL quantile_cont to the last bit (round 4 on both
    sides absorbs nothing but is kept for parity with the oracle)."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        out = (
            pd.DataFrame({"o_orderstatus": df["o_orderstatus"], "cents": cents})
            .groupby(["o_orderstatus", "cents"], as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n"})

    hist = (
        _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["o_orderstatus", "cents"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def q(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy(np.int64) / 100.0
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        n = cum[-1]

        def qc(p: float) -> float:
            h = (n - 1) * p  # 0-based fractional rank, like percentile linear
            lo = vals[np.searchsorted(cum, int(np.floor(h)), side="right")]
            hi = vals[np.searchsorted(cum, int(np.ceil(h)), side="right")]
            return float(lo + (hi - lo) * (h - np.floor(h)))

        return pd.DataFrame(
            {
                "o_orderstatus": [g["o_orderstatus"].iloc[0]],
                "p50": [round(qc(0.5), 4)],
                "p95": [round(qc(0.95), 4)],
            }
        )

    return hist.groupby("o_orderstatus").map_groups(q, batch_format="pandas")


def heavy_users(sf_dir: str) -> ray.data.Dataset:
    """Heavy hitters: top-10 users by event count. Pre-aggregated batch
    counts → tiny groupby-sum → sort+limit over the (small) per-user
    aggregate — raw events never sort."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["user_id"].value_counts()
        return pd.DataFrame({"user_id": vc.index, "n": vc.to_numpy()})

    agg = (
        _read(sf_dir, "events", columns=["user_id"])
        .map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n_events"))
    )
    return agg.sort(["n_events", "user_id"], descending=[True, False]).limit(10)


def approx_distinct_users(sf_dir: str):
    """HyperLogLog distinct-user count (functions.sketch): fixed-size
    registers folded per batch, merged by max.

    The contract row is NOT self-certified (round-2 advice): exact_distinct
    is computed by the engine's distributed distinct count and value-checked
    against the oracle's independent COUNT(DISTINCT); the sketch claim is
    quantized as round(estimate / exact, 1), which the oracle asserts equals
    the sf-independent constant 1.0 — true iff the estimate is within
    [-5%, +5%) of the oracle-verified exact count. The sketch is
    deterministic (splitmix64, no RNG), so the ratio is reproducible."""
    import pandas as pd

    from ..functions.sketch import approx_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    exact = (
        _read(sf_dir, "events", columns=["user_id"])
        .groupby("user_id")
        .count()
        .count()
    )
    return pd.DataFrame(
        {
            "exact_distinct": [int(exact)],
            "est_over_exact_1dp": [round(est / max(1, exact), 1)],
        }
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_counts(sf_dir: str) -> ray.data.Dataset:
    """Pivot: per-user event-type counts as columns. Partial pivot inside
    map_batches (vectorized crosstab per batch) + one small groupby-sum of
    the partials — the pre-aggregation pattern; the shuffle moves one row
    per (user, batch), never raw events."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for t in EVENT_TYPES:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[EVENT_TYPES].reset_index()
        ct.columns = ["user_id"] + [f"n_{t}" for t in EVENT_TYPES]
        return ct

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES])
    )


def q1_lineitem(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 shape: pricing summary over lineitem — pre-computed revenue
    column + grouped aggregate (column-pruned read).

    All money/quantity aggregates run in INTEGER quantized space (cents;
    revenue = price_cents · (100 − disc_cents), exact ten-thousandths) so
    sums are order-independent and bit-identical to the oracle's integer
    SQL at any scale — float accumulation hit N-dp rounding boundaries on
    large groups (round-4 sf0.1 sweep finding on the window sums)."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    def quantize(t: pa.Table) -> pa.Table:
        price_c = np.rint(t.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_c = np.rint(t.column("l_discount").to_numpy() * 100).astype(np.int64)
        qty_c = np.rint(t.column("l_quantity").to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "_qty_c": pa.array(qty_c),
                "_rev_e4": pa.array(price_c * (100 - disc_c)),
                "_disc_c": pa.array(disc_c),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        out = t.select(["l_returnflag", "l_linestatus"])
        out = out.append_column(
            "sum_qty", pc.divide(pc.cast(t.column("_sq"), pa.float64()), 100)
        )
        out = out.append_column(
            "sum_revenue", pc.divide(pc.cast(t.column("_sr"), pa.float64()), 10_000)
        )
        out = out.append_column(
            "avg_disc",
            pc.divide(
                pc.divide(pc.cast(t.column("_sd"), pa.float64()), 100),
                pc.cast(t.column("count_order"), pa.float64()),
            ),
        )
        return out.append_column("count_order", t.column("count_order"))

    return (
        _read(
            sf_dir,
            "lineitem",
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(quantize, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("_qty_c", alias_name="_sq"),
            Sum("_rev_e4", alias_name="_sr"),
            Sum("_disc_c", alias_name="_sd"),
            Count(alias_name="count_order"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def anti_join_events_customers(sf_dir: str) -> ray.data.Dataset:
    """ANTI JOIN via broadcast key set (ray_guide 'Semi / anti join'): events
    whose user has no BUILDING-segment customer record — the key set ships
    once via ray.put, each batch filters with a vectorized isin; no
    shuffle."""
    import numpy as np

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = np.unique(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy())
    ref = ray.put(keys)

    class AntiFilter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            uid = t.column("user_id").to_numpy()
            mask = ~np.isin(uid, self.keys)
            return t.filter(pa.array(mask))

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
        .map_batches(AntiFilter, batch_format="pyarrow", concurrency=2, num_cpus=0.5)
    )


def agg_orders_by_status(sf_dir: str) -> ray.data.Dataset:
    """Grouped aggregate (Ray partial-agg shuffle): count + sum per status.
    Sums run in int64 cents (exact 2-dp money) — order-independent,
    bit-identical to the oracle at any group size."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    def quantize(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"o_orderstatus": t.column("o_orderstatus"), "_cents": pa.array(cents)}
        )

    def finish(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(t.column("_sc"), pa.float64()), 100)
        return (
            t.select(["o_orderstatus", "n_orders"])
            .append_column("sum_price", s)
            .append_column(
                "avg_price", pc.divide(s, pc.cast(t.column("n_orders"), pa.float64()))
            )
        )

    return (
        _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
        .map_batches(quantize, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n_orders"), Sum("_cents", alias_name="_sc"))
        .map_batches(finish, batch_format="pyarrow")
    )


def join_orders_customer(sf_dir: str) -> ray.data.Dataset:
    """Broadcast hash join: customer (small side) shipped once via ray.put,
    looked up inside map_batches — no shuffle of the big side (ray_guide
    'Joins and lookups'). Revenue per market segment."""
    import numpy as np

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
        .sort_values("c_custkey")
    )
    # sorted-array probe state: np.searchsorted beats a per-row dict lookup
    # by orders of magnitude in the hot path
    lookup_ref = ray.put(
        (
            cust["c_custkey"].to_numpy(dtype=np.int64),
            cust["c_mktsegment"].to_numpy(dtype=object),
        )
    )

    class SegmentJoin:
        def __init__(self):
            self.keys_sorted, self.segs = ray.get(lookup_ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t.column("o_custkey").to_numpy()
            idx = np.searchsorted(self.keys_sorted, keys)
            idx_c = np.clip(idx, 0, len(self.keys_sorted) - 1)
            hit = self.keys_sorted[idx_c] == keys
            seg = np.where(hit, self.segs[idx_c], None)
            cents = np.rint(t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
            return pa.table(
                {
                    "c_mktsegment": pa.array(seg, pa.string()),
                    "_cents": pa.array(cents),  # exact 2-dp money
                }
            )

    from ray.data.aggregate import Count, Sum

    def finish(t: pa.Table) -> pa.Table:
        return t.select(["c_mktsegment", "n_orders"]).append_column(
            "revenue", pc.divide(pc.cast(t.column("_sc"), pa.float64()), 100)
        )

    # Pool sizing: fractional num_cpus so the actor pool can NEVER reserve
    # the whole session and starve the read/aggregate stages (observed
    # deadlock with concurrency=4 × num_cpus=1 on a 4-CPU session).
    return (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(
            SegmentJoin, batch_format="pyarrow", concurrency=2, num_cpus=0.5
        )
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("_cents", alias_name="_sc"))
        .map_batches(finish, batch_format="pyarrow")
    )


def events_lead_lag(sf_dir: str) -> ray.data.Dataset:
    """LAG/LEAD offset window frames: hash-partition by user, ONE sort +
    vectorized pandas groupby.shift per partition (same partitioned-window
    machinery as events_running_total; never a callback per key)."""
    import pandas as pd

    P = _wide_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        return _with_part(df, "user_id", P)

    def shift_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)["value"]
        g = g.assign(
            prev_value=grp.shift(1).round(4), next_value=grp.shift(-1).round(4)
        )
        return g[["event_id", "user_id", "prev_value", "next_value"]]

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(shift_part, batch_format="pandas")
    )


def rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(status, priority): the heavy pass is ONE distributed
    groupby over both keys; the subtotal levels are re-aggregated from the
    resulting fine-grained cell grid (|status| x |priority| rows — tiny by
    construction), never from the raw rows. NULL rollup markers are the
    'ALL' sentinel on both engine and oracle sides."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    def to_cents(t):
        # prices are exact 2-dp decimals: sum int64 CENTS so the aggregate
        # is order-independent and bit-identical to the oracle at any scale
        # (same convention as q1_lineitem / events_tumbling_window; a float
        # sum over ~1e6-row cells drifts past the 2-dp rounding boundary
        # and varies with block merge order)
        cents = pc.round(pc.multiply(t.column("o_totalprice"), 100)).cast(pa.int64())
        return t.drop_columns(["o_totalprice"]).append_column("_cents", cents)

    fine = (
        _read(
            sf_dir,
            "orders",
            columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
        )
        .map_batches(to_cents, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Count(alias_name="n_orders"), Sum("_cents", alias_name="sum_price")
        )
        .to_pandas()  # small result: one row per (status, priority) cell
    )
    l1 = fine.groupby("o_orderstatus", as_index=False).agg(
        n_orders=("n_orders", "sum"), sum_price=("sum_price", "sum")
    )
    l1["o_orderpriority"] = "ALL"
    l0 = pd.DataFrame(
        {
            "o_orderstatus": ["ALL"],
            "o_orderpriority": ["ALL"],
            "n_orders": [fine["n_orders"].sum()],
            "sum_price": [fine["sum_price"].sum()],
        }
    )
    out = pd.concat([fine, l1, l0], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    # cents → currency at the very end (subtotals summed exactly as int64)
    out["sum_price"] = (out["sum_price"].astype("int64") / 100).round(2)
    return out[["o_orderstatus", "o_orderpriority", "n_orders", "sum_price"]]


def unpivot_lineitem(sf_dir: str) -> ray.data.Dataset:
    """UNPIVOT / melt wide metric columns into long (metric, value) form —
    a pure per-batch explode (pandas melt, C-speed), no shuffle at all."""
    import pandas as pd

    METRICS = ["l_quantity", "l_discount", "l_tax"]

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(
            id_vars=["l_orderkey", "l_linenumber"],
            value_vars=METRICS,
            var_name="metric",
            value_name="value",
        )

    return _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"] + METRICS
    ).map_batches(melt, batch_format="pandas")


def corr_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Distributed Pearson correlation: ONE streaming pass of per-batch
    moment partials (n, Σx, Σy, Σxx, Σyy, Σxy) + a tiny global reduce —
    the canonical two-variable streaming aggregate (no driver row loop,
    nothing materialized but the 6-number partials)."""
    import numpy as np
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy()
        y = df["l_extendedprice"].to_numpy()
        return pd.DataFrame(
            {
                "_g": [0],
                "n": [float(len(x))],
                "sx": [x.sum()],
                "sy": [y.sum()],
                "sxx": [(x * x).sum()],
                "syy": [(y * y).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].sum()
        sx, sy = g["sx"].sum(), g["sy"].sum()
        cov = g["sxy"].sum() - sx * sy / n
        vx = g["sxx"].sum() - sx * sx / n
        vy = g["syy"].sum() - sy * sy / n
        corr = cov / np.sqrt(vx * vy)
        return pd.DataFrame(
            {"n": [np.int64(n)], "corr_qty_price": [round(float(corr), 6)]}
        )

    return (
        _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pandas")
        .groupby("_g")
        .map_groups(finalize, batch_format="pandas")
    )


def set_ops_users(sf_dir: str) -> ray.data.Dataset:
    """INTERSECT / EXCEPT in one pipeline: the small customer keyset is
    broadcast once (ray.put, read per actor), each events batch is
    pre-distincted and membership-tagged inside map_batches, and only slim
    (user_id, op) pairs reach the final distinct groupby — the big side
    never shuffles raw rows. `op` is a pure function of user_id, so the
    (user_id, op) distinct equals DISTINCT user_id with its set-op label."""
    import numpy as np
    from ray.data.aggregate import Count

    cust = _keyset(_read(sf_dir, "customer", columns=["c_custkey"]), "c_custkey")
    ref = ray.put(cust)

    class Tag:
        def __init__(self):
            self.keys = ray.get(ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            u = np.unique(t.column("user_id").to_numpy())  # partial distinct
            if len(self.keys):
                idx = np.clip(np.searchsorted(self.keys, u), 0, len(self.keys) - 1)
                hit = self.keys[idx] == u
            else:  # empty customer table → everything is 'except'
                hit = np.zeros(len(u), bool)
            op = np.where(hit, "intersect", "except")
            return pa.table(
                {"user_id": pa.array(u, pa.int64()), "op": pa.array(op, pa.string())}
            )

    return (
        _read(sf_dir, "events", columns=["user_id"])
        .map_batches(Tag, batch_format="pyarrow", concurrency=2, num_cpus=0.5)
        .groupby(["user_id", "op"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["user_id", "op"]), batch_format="pyarrow")
    )


def string_agg_event_types(sf_dir: str) -> ray.data.Dataset:
    """Ordered-distinct string aggregation per group (string_agg DISTINCT
    ... ORDER BY): hash-partition by user, ONE vectorized pass per
    partition — drop_duplicates + sort + groupby.join, no per-key callback."""
    import pandas as pd

    P = _wide_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        return _with_part(df, "user_id", P)

    def agg_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"]).sort_values(
            ["user_id", "event_type"], kind="mergesort"
        )
        out = g.groupby("user_id", sort=False)["event_type"].agg(",".join)
        return out.rename("event_types").reset_index()

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(agg_part, batch_format="pandas")
    )


def mode_event_type(sf_dir: str) -> ray.data.Dataset:
    """Per-group mode (most frequent value, lexicographic tie-break): the
    heavy pass is the distributed (user, type) count groupby; the argmax is
    one vectorized sort + drop_duplicates over the reduced count table."""
    import pandas as pd
    from ray.data.aggregate import Count

    def argmax_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id")
        return g.rename(columns={"event_type": "mode_event_type"})[
            ["user_id", "mode_event_type", "n"]
        ]

    P = _wide_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        return _with_part(df, "user_id", P)

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(argmax_part, batch_format="pandas")
    )


def events_rolling_1h(sf_dir: str) -> ray.data.Dataset:
    """RANGE-frame rolling time-window aggregate (SUM over the trailing
    closed hour [t-1h, t] per user): hash-partition by user, then per
    partition ONE sort + pandas time-based groupby.rolling (Cython).
    SQL RANGE frames include ALL peer rows sharing the current ORDER BY
    value, so equal-(user, ts) rows are collapsed first (the window sum is
    a pure function of (user, ts)) and the result mapped back by merge —
    tie semantics then match the oracle exactly."""
    import numpy as np
    import pandas as pd

    P = _wide_parts()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        return _with_part(df, "user_id", P)

    def rolling_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        # int64-cents rolling sums (values exact 2-dp): no float
        # accumulation, bit-identical to the oracle's RANGE-frame window
        g = g.assign(_cents=np.rint(g["value"].to_numpy() * 100).astype(np.int64))
        col = (
            g.groupby(["user_id", "ts"], sort=False)["_cents"]
            .sum()
            .reset_index()
        )
        r = (
            col.groupby("user_id", sort=False)
            .rolling("3600s", on="ts", closed="both")["_cents"]
            .sum()
        )
        col["rolling_value"] = (r.to_numpy() / 100.0).round(4)
        out = g.merge(col[["user_id", "ts", "rolling_value"]], on=["user_id", "ts"])
        return out[["event_id", "user_id", "rolling_value"]]

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(rolling_part, batch_format="pandas")
    )


def q3_shipping_priority(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q3-style three-table composition: BUILDING customers ⋈ orders
    ⋈ lineitem, revenue per order, top 10.

    Scale shape: the ONLY broadcast is the (tiny) BUILDING custkey set —
    reduced distributedly, only int64 keys reach the driver. Both fact
    tables stream: orders is filtered (date + keyset membership) and
    slimmed to (o_orderkey, o_orderdate) inside map_batches; lineitem is
    filtered on l_shipdate and PRE-AGGREGATED to partial per-orderkey
    revenue sums inside each batch. The two slim streams then meet in a
    co-partitioned hash join on l_orderkey (key % P — all rows of one
    orderkey share a partition), each partition resolved with one
    vectorized pandas merge + groupby-sum and cut to its local top 10;
    only P×10 candidate rows reach the final global sort. No driver-side
    materialization of any fact table at any scale."""
    import numpy as np
    import pandas as pd

    CUTOFF = np.datetime64("1998-06-01T00:00:00", "us")
    P = _wide_parts()

    # distributed reduction to the BUILDING keyset; only keys hit the driver
    def building_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("c_mktsegment"), "BUILDING")
        return t.filter(m).select(["c_custkey"])

    bkeys = _keyset(
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(building_keys, batch_format="pyarrow"),
        "c_custkey",
    )
    bref = ray.put(bkeys)

    class OrderFilter:
        """orders → slim (key, _part, od, rev=NaN, is_order=True) stream."""

        def __init__(self):
            self.bkeys = ray.get(bref)  # once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ok = df["o_custkey"].to_numpy(np.int64)
            if len(self.bkeys):
                i = np.searchsorted(self.bkeys, ok)
                i = np.clip(i, 0, len(self.bkeys) - 1)
                hit = self.bkeys[i] == ok
            else:
                hit = np.zeros(len(ok), bool)
            keep = hit & (df["o_orderdate"].to_numpy("datetime64[us]") < CUTOFF)
            key = df["o_orderkey"].to_numpy(np.int64)[keep]
            return pd.DataFrame(
                {
                    "key": key,
                    "_part": (key.astype(np.uint64) % np.uint64(P)).astype(np.int32),
                    "od": df["o_orderdate"].to_numpy("datetime64[us]")[keep]
                    .astype("int64"),
                    "rev": np.full(int(keep.sum()), -1, np.int64),
                    "is_order": np.ones(int(keep.sum()), bool),
                }
            )

    def lineitem_partial(df: pd.DataFrame) -> pd.DataFrame:
        # filter + combine: partial revenue sum per orderkey within the
        # batch — in int64 ten-thousandths (price/discount are exact 2-dp)
        # so partial-sum association order can never shift the final cents
        keep = df["l_shipdate"].to_numpy("datetime64[us]") > CUTOFF
        key = df["l_orderkey"].to_numpy(np.int64)[keep]
        price_c = np.rint(df["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        disc_c = np.rint(df["l_discount"].to_numpy()[keep] * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        part = pd.DataFrame({"key": key, "rev": rev}).groupby("key", as_index=False)[
            "rev"
        ].sum()
        k = part["key"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": k,
                "_part": (k.astype(np.uint64) % np.uint64(P)).astype(np.int32),
                "od": np.full(len(k), -1, np.int64),
                "rev": part["rev"].to_numpy(),
                "is_order": np.zeros(len(k), bool),
            }
        )

    od = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(OrderFilter, batch_format="pandas", concurrency=2, num_cpus=0.5)
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(lineitem_partial, batch_format="pandas")

    EMPTY = pd.DataFrame(
        {
            "l_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[ns]"),
            "revenue": pd.Series([], dtype="float64"),
        }
    )

    def resolve_part(g: pd.DataFrame) -> pd.DataFrame:
        ords = g[g["is_order"]]
        lps = g[~g["is_order"]]
        if not len(ords) or not len(lps):
            return EMPTY
        rev = lps.groupby("key", as_index=False)["rev"].sum()
        j = ords[["key", "od"]].merge(rev, on="key", how="inner")
        if not len(j):
            return EMPTY
        out = pd.DataFrame(
            {
                "l_orderkey": j["key"].to_numpy(np.int64),
                "o_orderdate": pd.to_datetime(j["od"], unit="us"),
                "revenue": (j["rev"].to_numpy(np.int64) / 10_000.0).round(2),
            }
        )
        # local top-10 under the SAME total order as the global cut — any
        # global top-10 row is necessarily in its partition's top-10
        out = out.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(10)
        return out

    return (
        od.union(li)
        .groupby("_part")
        .map_groups(resolve_part, batch_format="pandas")
        .sort(["revenue", "o_orderdate", "l_orderkey"], descending=[True, False, False])
        .limit(10)
    )
