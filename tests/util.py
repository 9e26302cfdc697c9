"""Shared test helpers: the sequential oracle reducer (FIXTURES.md A3)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from tinyetl_ray.schema import KEY_COLS


def sequential_lww(
    changes: pa.Table, base: pa.Table | None = None, payload_cols: list[str] | None = None
) -> pd.DataFrame:
    """Trivial pure-pandas LWW reducer: the exact-state oracle.

    Applies base rows (lsn=-1) then all change events, winner per key by
    (ts, lsn); delete winners remove the key. Deliberately simple/sequential —
    this is the thing the Ray engine must match, not how it should compute.
    """
    frames = []
    if base is not None:
        b = base.to_pandas()
        b["lsn"] = -1
        b["op"] = "upsert"
        frames.append(b)
    c = changes.to_pandas()
    frames.append(c)
    df = pd.concat(frames, ignore_index=True, sort=False)
    df = df.sort_values(["ts", "lsn"], kind="mergesort")
    winners: dict[tuple, pd.Series] = {}
    for _, row in df.iterrows():
        winners[(row["conv_id"], row["turn_idx"])] = row
    out = pd.DataFrame([r for r in winners.values() if r["op"] == "upsert"])
    if out.empty:
        return out
    drop = [c for c in ("lsn", "op") if c in out.columns]
    out = out.drop(columns=drop)
    if payload_cols:
        out = out[payload_cols]
    return out.sort_values(KEY_COLS).reset_index(drop=True)


def assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    got = got.sort_values(KEY_COLS).reset_index(drop=True)[list(want.columns)]
    want = want.sort_values(KEY_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
