"""Round-5 whole-file-review hardening of the dedup/simsearch/parity
modules: top-k tie contracts, SimHash banding completeness beyond
distance 3, label-propagation convergence on long chains, empty-corpus
guards, surrogate degradation, IVF probe normalization, and window
floor-division semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tinyetl_ray.functions import dedup
from tinyetl_ray.functions.dedup import (
    char_gram_hashes,
    embedding_neardup_pairs,
    lsh_candidate_pairs,
    lsh_clusters_distributed,
    simhash_pairs,
)
from tinyetl_ray.functions.simsearch import ivf_topk, topk_cosine


def _emb_table(ids: np.ndarray, mat: np.ndarray) -> pa.Table:
    n, dim = mat.shape
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * dim, pa.int32())
    lst = pa.ListArray.from_arrays(
        offsets, pa.array(mat.ravel().astype(np.float64), pa.float64())
    )
    return pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": lst})


# --- top-k tie contract ----------------------------------------------------


def test_topk_cosine_ties_keep_smallest_vec_ids():
    """30 vectors IDENTICAL to the query spread over many blocks: the
    contract says rank ties break by vec_id, so the answer must be the k
    smallest ids regardless of block layout (a raw-float local cut used to
    evict boundary ties arbitrarily)."""
    rng = np.random.RandomState(4)
    dim, n_dup = 8, 30
    q = rng.randn(1, dim)
    ids = np.arange(100, 100 + n_dup, dtype=np.int64)
    perm = rng.permutation(n_dup)  # ids deliberately NOT in block order
    mat = np.tile(q, (n_dup, 1))
    ds = ray.data.from_arrow(_emb_table(ids[perm], mat)).repartition(10)
    out = (
        topk_cosine(ds, q, np.array([0]), k=10)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert out["vec_id"].tolist() == list(range(100, 110))
    assert (out["sim"] == 1.0).all()


# --- SimHash banding completeness past distance 3 --------------------------


class _FixedSigs:
    """SimHasher stand-in: text IS the signature (decimal int64)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "simhash": df["text"].astype(np.int64),
            }
        )


def test_simhash_pairs_complete_at_distance_4(monkeypatch):
    """A pair differing by exactly ONE bit in each of the classic four
    16-bit chunks (distance 4): the fixed 4-chunk layout has no equal chunk
    and silently missed it; banding must widen to max_distance+1 chunks."""
    monkeypatch.setattr(dedup, "SimHasher", _FixedSigs)
    sig_a = 0
    sig_b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)  # d(a,b) = 4
    sig_c = -(1 << 63)  # bit 63 as int64: d(a,c) = 1, d(b,c) = 5
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": str(sig_a)},
            {"doc_id": 2, "text": str(sig_b)},
            {"doc_id": 3, "text": str(sig_c)},
        ]
    )
    out = (
        simhash_pairs(ds, max_distance=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    got = set(zip(out["a"], out["b"], out["distance"]))
    assert got == {(1, 2, 4), (1, 3, 1)}, got


def test_simhash_pairs_rejects_bad_distance():
    ds = ray.data.from_items([{"doc_id": 1, "text": "x"}])
    with pytest.raises(ValueError):
        simhash_pairs(ds, max_distance=64)


# --- label propagation converges on long chains ----------------------------


def test_lsh_clusters_long_chain_converges():
    """A 28-doc PATH component (only adjacent docs are near-dups, diameter
    27 > the old fixed 8-iteration cap): min-label propagation must run to
    the fixpoint — with the old cap the chain silently split into several
    clusters."""
    rng = np.random.RandomState(9)
    blocks = [
        "".join(chr(97 + c) for c in rng.randint(0, 26, size=12))
        for _ in range(40)
    ]
    n = 28
    docs = [
        {"doc_id": i + 1, "text": "".join(blocks[i : i + 8])} for i in range(n)
    ]
    # adjacent docs share 7 of 8 blocks (J≈0.77 ≥ 0.7); distance-2 share 6
    # (J≈0.59 < 0.7) — the verified edge set is exactly the path
    out = (
        lsh_clusters_distributed(
            ray.data.from_items(docs), verify_threshold=0.7, max_iters=8
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == n
    assert set(out["cluster_id"]) == {1}, (
        f"chain split into {out['cluster_id'].nunique()} clusters"
    )


# --- empty-corpus / empty-batch guards -------------------------------------


def _empty_docs():
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )


def test_lsh_candidate_pairs_empty_corpus():
    assert lsh_candidate_pairs(_empty_docs()).count() == 0


def test_embedding_neardup_pairs_empty_corpus():
    ds = ray.data.from_arrow(_emb_table(np.array([], np.int64), np.zeros((0, 4))))
    out = embedding_neardup_pairs(ds).to_pandas()
    assert len(out) == 0


def test_char_gram_hashes_lone_surrogate_degrades():
    # parquet text can never hold one, but in-process strings can: drop it
    # instead of crashing the verify stage
    with_sur = char_gram_hashes("abc\ud800defgh")
    assert np.array_equal(with_sur, char_gram_hashes("abcdefgh"))


# --- IVF probe metric matches assignment metric ----------------------------


def test_ivf_topk_probes_with_normalized_centroids():
    """Centroids with wildly different norms: probe ranking must use the
    SAME normalized centroids as bucket assignment, else the query probes
    the large-norm centroid's bucket and misses its true neighbors."""
    centroids = np.array([[0.001, 0.0], [0.0, 1000.0]])
    q = np.array([[1.0, 0.1]])
    ids = np.array([10, 20], np.int64)
    mat = np.array([[1.0, 0.0], [0.0, 1.0]])  # buckets: c0, c1
    ds = ray.data.from_arrow(_emb_table(ids, mat))
    out = ivf_topk(ds, q, np.array([0]), centroids, k=1, nprobe=1).to_pandas()
    assert out["vec_id"].tolist() == [10], out


# --- event-time windows floor (not truncate) pre-epoch timestamps ----------


def test_events_tumbling_window_floors_negative_ts(tmp_path):
    from tinyetl_ray.pipelines.parity import events_tumbling_window

    hour_us = 3_600_000_000
    t = pa.table(
        {
            "ts": pa.array([-1_800_000_000, 1_800_000_000], pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = events_tumbling_window(str(tmp_path)).to_pandas()
    starts_us = sorted(v.value // 1000 for v in pd.to_datetime(out["window_start"]))
    # pre-epoch event floors to the -1h window (truncation would say 0h)
    assert starts_us == [-hour_us, 0], starts_us
