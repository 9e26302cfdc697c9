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


def union_find_lsh_clusters(
    df: pd.DataFrame,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.7,
    verify: bool = True,
) -> pd.DataFrame:
    """Driver-side union-find LSH clustering — the TEST ORACLE for
    lsh_clusters_distributed, demoted here from the package in round 3: it
    materializes all texts and edges on the driver, the exact anti-pattern
    the distributed min-label propagation exists to avoid, and existed only
    to cross-check it. Full in-bucket candidate pairs (matching the
    distributed verified path's edge generation) + optional python-jaccard
    verify + union-find over the edge list."""
    import itertools

    import numpy as np

    from tinyetl_ray.functions.dedup import MinHasher, _band_rows, jaccard

    sigs = MinHasher(num_perm=num_perm, shingle_k=shingle_k)(
        df[["doc_id", "text"]].copy()
    )
    banded = _band_rows(sigs, bands, num_perm // bands)
    text = dict(zip(df["doc_id"].astype(int), df["text"]))
    edges: set[tuple[int, int]] = set()
    for _, g in banded.groupby(["band", "band_hash"]):
        ids = sorted(int(x) for x in g["doc_id"].unique())
        edges.update(itertools.combinations(ids, 2))
    if verify:
        edges = {
            (a, b) for a, b in edges if jaccard(text[a], text[b], k=shingle_k) >= threshold
        }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ids = df["doc_id"].astype(int)
    return pd.DataFrame(
        {"doc_id": ids, "cluster_id": np.array([find(d) for d in ids], np.int64)}
    )


def assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    got = got.sort_values(KEY_COLS).reset_index(drop=True)[list(want.columns)]
    want = want.sort_values(KEY_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
