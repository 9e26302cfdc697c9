"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in tinyetl_ray) calls ray.init()/ray.shutdown().

The CDC queries derive a transcript change log from the driver's ``events``
table with pure column arithmetic (see tinyetl_ray.synth.derive_changes_batch
— kept in lockstep with DERIVE_SQL below), replay it through the Ray engine,
and are verified value-exactly against DuckDB window-function replays.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.schema import CHANGE_SCHEMA
from tinyetl_ray.synth import EVOLVE_LSN_THRESHOLD, derive_changes_batch

# ---------------------------------------------------------------------------
# Derivation SQL — the DuckDB twin of synth.derive_changes_batch
# ---------------------------------------------------------------------------

_DERIVE_COLS = """
    event_id AS lsn,
    CASE WHEN event_id % 11 = 0 THEN 'delete' ELSE 'upsert' END AS op,
    'conv-' || CAST(user_id % 199 AS VARCHAR) AS conv_id,
    CAST(event_id % 37 AS INTEGER) AS turn_idx,
    CASE WHEN event_id % 11 = 0 THEN NULL ELSE
      CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
           WHEN 2 THEN 'system' ELSE 'tool' END END AS role,
    CASE WHEN event_id % 11 = 0 THEN NULL
         ELSE 'msg:' || CAST(event_id AS VARCHAR) || ':' || event_type || ':' || props
         END AS text,
    CASE WHEN event_id % 11 = 0 OR event_id % 4 <> 3 THEN NULL
         ELSE event_type END AS tool,
    make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS ts
"""

_MODEL_COL = f""",
    CASE WHEN event_id >= {EVOLVE_LSN_THRESHOLD} AND event_id % 11 <> 0
         THEN 'm' || CAST(event_id % 3 AS VARCHAR) ELSE NULL END AS model
"""

DERIVE_SQL = f"SELECT {_DERIVE_COLS} FROM events"
DERIVE_SQL_MODEL = f"SELECT {_DERIVE_COLS} {_MODEL_COL} FROM events"

_LWW_SQL = """
WITH ch AS ({derive}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ch
)
SELECT {cols} FROM ranked WHERE rn = 1 AND op = 'upsert'
"""


def _events(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _changes(sf_dir: str, with_model: bool = False) -> ray.data.Dataset:
    return _events(sf_dir).map_batches(
        lambda t, m=with_model: derive_changes_batch(t, with_model=m),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# CDC query callables
# ---------------------------------------------------------------------------


def q_cdc_decode(sf_dir: str) -> ray.data.Dataset:
    """The decode/validate stage alone: events → canonical change log."""
    from tinyetl_ray.stages.decode import DecodeValidate

    return _changes(sf_dir).map_batches(DecodeValidate(), batch_format="pyarrow")


def q_cdc_replay(sf_dir: str) -> ray.data.Dataset:
    """Full LWW replay from empty base → final transcript table."""
    return cdc.replay(_changes(sf_dir), num_partitions=64)


def _epoch_files(sf_dir: str, tmp: str) -> list[list[str]]:
    """Write the derived log as two epoch parquet dirs where epoch 0
    physically LACKS the `model` column — exercising real file-level
    additive schema evolution through the committed pipeline. Streaming
    writes (no driver-side materialization)."""
    import glob

    d0, d1 = os.path.join(tmp, "epoch0"), os.path.join(tmp, "epoch1")
    ds = _changes(sf_dir, with_model=True)
    ds.map_batches(
        lambda t: t.filter(pc.less(t.column("lsn"), EVOLVE_LSN_THRESHOLD)).drop_columns(
            ["model"]
        ),
        batch_format="pyarrow",
    ).write_parquet(d0)
    ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("lsn"), EVOLVE_LSN_THRESHOLD)),
        batch_format="pyarrow",
    ).write_parquet(d1)
    return [sorted(glob.glob(os.path.join(d0, "*.parquet"))),
            sorted(glob.glob(os.path.join(d1, "*.parquet")))]


def q_cdc_replay_evolved(sf_dir: str) -> ray.data.Dataset:
    """Committed COW replay across two epochs with file-level schema
    evolution (epoch 0 has no `model` column → nulls backfilled)."""
    tmp = tempfile.mkdtemp(prefix="tinyetl-evolved-")
    files = _epoch_files(sf_dir, tmp)
    cdc.replay_commit(os.path.join(tmp, "table"), files, num_partitions=64)
    return cdc.read_table(os.path.join(tmp, "table"))


def q_cdc_replay_resume(sf_dir: str) -> ray.data.Dataset:
    """Checkpoint-resume path: commit epoch 0, then resume with both epochs,
    then re-apply (no-op). Final state must equal the one-shot replay —
    verified by the same oracle SQL."""
    tmp = tempfile.mkdtemp(prefix="tinyetl-resume-")
    files = _epoch_files(sf_dir, tmp)
    root = os.path.join(tmp, "table")
    cdc.replay_commit(root, files[:1], num_partitions=64)
    cdc.replay_commit(root, files, num_partitions=64)
    assert cdc.replay_commit(root, files, num_partitions=64) == []  # idempotent
    return cdc.read_table(root)


def q_cdc_events_per_conv(sf_dir: str) -> ray.data.Dataset:
    """Per-conversation change metrics (groupby aggregate with Ray's
    partial-aggregation shuffle)."""
    from ray.data.aggregate import Count, Sum

    ds = _changes(sf_dir).map_batches(
        lambda t: t.append_column(
            "is_upsert", pc.cast(pc.equal(t.column("op"), "upsert"), pa.int64())
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("conv_id").aggregate(
        Count(alias_name="n_events"), Sum("is_upsert", alias_name="n_upserts")
    )


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001: committed evolved replay + table read."""
    return q_cdc_replay_evolved("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "cdc_decode": q_cdc_decode,
        "cdc_replay": q_cdc_replay,
        "cdc_replay_evolved": q_cdc_replay_evolved,
        "cdc_replay_resume": q_cdc_replay_resume,
        "cdc_events_per_conv": q_cdc_events_per_conv,
    }


def oracle_sql() -> dict[str, str]:
    payload = "conv_id, turn_idx, role, text, tool, ts"
    evolved_cols = payload + ", model"
    lww = _LWW_SQL.format(derive=DERIVE_SQL, cols=payload)
    lww_evolved = _LWW_SQL.format(derive=DERIVE_SQL_MODEL, cols=evolved_cols)
    return {
        "cdc_decode": DERIVE_SQL,
        "cdc_replay": lww,
        "cdc_replay_evolved": lww_evolved,
        "cdc_replay_resume": lww_evolved,
        "cdc_events_per_conv": f"""
            WITH ch AS ({DERIVE_SQL})
            SELECT conv_id,
                   COUNT(*) AS n_events,
                   SUM(CASE WHEN op = 'upsert' THEN 1 ELSE 0 END) AS n_upserts
            FROM ch GROUP BY conv_id
        """,
    }
