"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix ships ONCE per actor
as plain constructor kwargs (KB-sized, inlined into the restart-safe actor
creation spec — ray#53727 made captured ray.put refs a restart hazard),
every batch does one float64 matmul, emits per-batch local top-k, and a
final tiny groupby takes the global top-k. Compute O(n·q), shuffle
O(batches·q·k) — the shuffle never moves embeddings.

Scale path: IVF — a seeded k-means (driver-side on a bounded sample, few
iterations) assigns every vector to a coarse centroid; queries probe only
the nprobe nearest centroid buckets. Recall<1 by design; exactness is the
brute-force baseline's job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _local_topk_rows(
    qids: np.ndarray, ids: np.ndarray, sims: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-query local top-k on ROUNDED sims, keeping ALL ties at the kth
    value. The global rank orders by (rounded sim desc, vec_id asc) — a
    local cut on raw floats (or one that drops boundary ties arbitrarily)
    could evict a tied candidate with a smaller vec_id than a survivor,
    making the output wrong vs the contract and block-layout-dependent.
    Keeping every row tied with the kth rounded sim makes the local cut
    exact for the global order; -inf-masked entries are dropped here."""
    from .dedup import round_half_away

    # half-away rounding matches DuckDB ROUND (np.round is half-to-even
    # and diverges on exactly-representable ties); -inf passes through
    with np.errstate(invalid="ignore"):
        rs = np.where(np.isfinite(sims), round_half_away(sims), sims)
    n = rs.shape[1]
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.float64)
    kk = min(k, n)
    # kth largest rounded sim per query row
    th = -np.partition(-rs, kk - 1, axis=1)[:, kk - 1]
    # isfinite: fully -inf-masked rows have th = -inf and would otherwise
    # emit every masked entry just to drop it downstream
    qi, ci = np.nonzero((rs >= th[:, None]) & np.isfinite(rs))
    return qids[qi], ids[ci], rs[qi, ci]


def _emb_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t.column(col).combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = arr.offsets.to_numpy()
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(len(t), dim)


def topk_cosine(
    ds: ray.data.Dataset,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact top-k by cosine for each query row. Output: (query_id, vec_id,
    sim) — sim rounded to 6 decimals; global rank ties broken by vec_id."""
    q = _normalize(np.asarray(query_mat, dtype=np.float64))

    class LocalTopK:
        # query state rides fn_constructor_kwargs as PLAIN values: KB-sized,
        # inlined into the actor creation spec, so a restarted actor can
        # always reconstruct (no driver-put ObjectRef to lose — ray#53727)
        def __init__(self, qids: np.ndarray, q: np.ndarray):
            self.qids, self.q = qids, q  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy()
            vecs = _normalize(_emb_matrix(t, emb_col))
            sims = self.q @ vecs.T  # (nq, nbatch)
            rows, cand, s = _local_topk_rows(self.qids, ids, sims, k)
            return pa.table(
                {
                    "query_id": pa.array(rows, pa.int64()),
                    id_col: pa.array(cand, pa.int64()),
                    "sim": pa.array(s),
                }
            )

    local = ds.map_batches(
        LocalTopK,
        batch_format="pyarrow",
        fn_constructor_kwargs={"qids": np.asarray(query_ids), "q": q},
        concurrency=(2, 8),
        num_cpus=0.5,
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 3) -> np.ndarray:
    """Tiny seeded k-means on a driver-side SAMPLE (bounded memory)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample.astype(np.float64))
    cent = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_build(
    ds: ray.data.Dataset,
    n_clusters: int = 16,
    sample_limit: int = 10_000,
    emb_col: str = "embedding",
    seed: int = 3,
) -> np.ndarray:
    """Fit coarse centroids on a bounded REPRESENTATIVE sample: every block
    contributes a deterministic evenly-strided slice of its rows. A plain
    ``limit(sample_limit)`` would take the HEAD of the dataset — on input
    written sorted/clustered by some key (the common partitioned layout) all
    centroids then land inside the first cluster and IVF recall collapses
    into one hot bucket. Stride sampling stays a streaming pass (no shuffle,
    no full materialization)."""
    n = ds.count()  # parquet: metadata-only
    if n == 0:
        # pa.concat_tables([]) below would raise a cryptic 'Must pass at
        # least one table'; every other operator in this module handles
        # the empty corpus gracefully, so fail with the real reason
        raise ValueError("ivf_build: embeddings dataset is empty")
    frac = min(1.0, sample_limit / max(1, n))

    def strided(t: pa.Table) -> pa.Table:
        m = max(1, int(round(len(t) * frac))) if len(t) else 0
        if m >= len(t):
            return t.select([emb_col])
        idx = np.round(np.linspace(0, len(t) - 1, m)).astype(np.int64)
        return t.select([emb_col]).take(pa.array(idx))

    sample_tbl = pa.concat_tables(
        ds.map_batches(strided, batch_format="pyarrow")
        .limit(sample_limit)
        .iter_batches(batch_format="pyarrow"),
        promote_options="default",
    )
    return kmeans_fit(_emb_matrix(sample_tbl, emb_col), n_clusters, seed=seed)


def ivf_write(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    out_dir: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> int:
    """Write the embedding table PARTITIONED BY coarse centroid bucket
    (``out_dir/bucket=K/...parquet``). This is the storage layout that makes
    IVF probing an I/O saving, not just a compute mask: a probe reads only
    nprobe/nlist of the files. Returns the number of buckets written."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cent_arr = _normalize(np.asarray(centroids, dtype=np.float64))

    class AssignBucket:
        def __init__(self, cent: np.ndarray):
            self.cent = cent  # plain kwarg: inlined, restart-safe

        def __call__(self, t: pa.Table) -> pa.Table:
            vecs = _normalize(_emb_matrix(t, emb_col))
            buckets = np.argmax(vecs @ self.cent.T, axis=1).astype(np.int32)
            # hive partitioning strips the partition column from the data
            # files, so carry a duplicate in-file copy for per-row masking
            t = t.append_column("bucket", pa.array(buckets, pa.int32()))
            return t.append_column("bucket_id", pa.array(buckets, pa.int32()))

    ds.map_batches(
        AssignBucket,
        batch_format="pyarrow",
        fn_constructor_kwargs={"cent": cent_arr},
        concurrency=(2, 8),
        num_cpus=0.5,
    ).write_parquet(out_dir, partition_cols=["bucket"])
    return len(cent_arr)


def ivf_topk_store(
    store_dir: str,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF top-k over a bucket-partitioned store: ONLY the union of the
    queries' nprobe nearest buckets is read from disk (directory pruning at
    the parquet read — the rest of the table is never deserialized). Inside
    the read, each query further masks to its own probe list."""
    import os

    q = _normalize(np.asarray(query_mat, dtype=np.float64))
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    import glob

    wanted = sorted(set(int(b) for b in probe.ravel()))
    dirs: list[str] = []
    for b in wanted:
        dirs.extend(
            sorted(glob.glob(os.path.join(store_dir, f"bucket={b}", "*.parquet")))
        )
    if not dirs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        )
    ds = ray.data.read_parquet(dirs)

    class ProbeTopK:
        def __init__(self, qids, q, cent, probe):
            # plain kwargs: inlined into the actor spec, restart-safe
            self.qids, self.q, self.cent, self.probe = qids, q, cent, probe

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy()
            vecs = _normalize(_emb_matrix(t, emb_col))
            buckets = t.column("bucket_id").to_numpy().astype(np.int64)
            sims = self.q @ vecs.T
            allowed = np.zeros_like(sims, dtype=bool)
            for qi in range(len(self.qids)):
                allowed[qi] = np.isin(buckets, self.probe[qi])
            sims = np.where(allowed, sims, -np.inf)
            rows, cand, s = _local_topk_rows(self.qids, ids, sims, k)
            return pa.table(
                {
                    "query_id": pa.array(rows, pa.int64()),
                    id_col: pa.array(cand, pa.int64()),
                    "sim": pa.array(s),
                }
            )

    local = ds.map_batches(
        ProbeTopK,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "qids": np.asarray(query_ids), "q": q, "cent": cent, "probe": probe
        },
        concurrency=(2, 8),
        num_cpus=0.5,
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


def ivf_topk(
    ds: ray.data.Dataset,
    query_mat: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF-bucketed approximate top-k: vectors outside each query's nprobe
    nearest centroid buckets are skipped (mask, still one matmul per batch).

    At 10^9-vector scale the bucket id becomes the PARTITION key of the
    stored table so probing reads only nprobe/nlist of the data; here the
    masking demonstrates the same pruning within batches.
    """
    q = _normalize(np.asarray(query_mat, dtype=np.float64))
    # probe ranking must use the SAME normalized centroids as the bucket
    # assignment below — raw centroids would bias probes toward large-norm
    # centroids and can miss a query's true nearest bucket entirely
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)

    class IVFTopK:
        def __init__(self, qids, q, cent, probe):
            # plain kwargs: inlined into the actor spec, restart-safe
            self.qids, self.q, self.cent, self.probe = qids, q, cent, probe

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy()
            vecs = _normalize(_emb_matrix(t, emb_col))
            buckets = np.argmax(vecs @ self.cent.T, axis=1)  # (nbatch,)
            sims = self.q @ vecs.T
            allowed = np.zeros_like(sims, dtype=bool)
            for qi in range(len(self.qids)):
                allowed[qi] = np.isin(buckets, self.probe[qi])
            sims = np.where(allowed, sims, -np.inf)
            rows, cand, s = _local_topk_rows(self.qids, ids, sims, k)
            return pa.table(
                {
                    "query_id": pa.array(rows, pa.int64()),
                    id_col: pa.array(cand, pa.int64()),
                    "sim": pa.array(s),
                }
            )

    local = ds.map_batches(
        IVFTopK,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "qids": np.asarray(query_ids),
            "q": q,
            "cent": cent,
            "probe": probe,
        },
        concurrency=(2, 8),
        num_cpus=0.5,
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")
