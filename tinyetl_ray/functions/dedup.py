"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the part that matters at 100 TB):
- exact: hash-partition by content hash, first-wins per group — ONE shuffle
  keyed on a 64-bit hash, never on raw text.
- MinHash-LSH: signatures per batch (vectorized) → explode to
  (band, band_hash, doc_id) rows → groupby bands (shuffle of slim rows) →
  candidate pairs → verify Jaccard → min-label propagation for clusters.
- SimHash: 64-bit signature, banded into 4×16-bit chunks for candidate
  generation (hamming ≤ 3 ⇒ some chunk equal by pigeonhole... with 4 chunks
  any distance ≤ 3 leaves ≥1 chunk intact), verify by popcount.
- embedding cosine: per-batch float64 matmul against a broadcast matrix
  (ray.put once); IVF-bucketed variant in simsearch.py for the scale path.

All signature computation is numpy-vectorized per document batch; shuffles
move only (id, hash) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..hashing import hash_strings

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the min-id row per distinct text. Shuffle key = 64-bit content
    hash (slim); full equality re-checked inside the group so a hash
    collision can never merge distinct texts."""

    def add_hash(t: pa.Table) -> pa.Table:
        # pd.util.hash_array: vectorized siphash with a FIXED key —
        # deterministic across processes, and O(total bytes) for long
        # documents (hashing.hash_strings is built for SHORT keys: it sweeps
        # one numpy pass per character position). A collision only co-groups
        # two texts; in-group equality keeps the result exact.
        s = t.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
        h = pd.util.hash_array(s).astype(np.int64)
        return t.append_column("_h", pa.array(h))

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        return g.drop_duplicates(subset=[text_col], keep="first").drop(columns=["_h"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(first_per_text, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Vectorized MinHash signatures over character shingles.

    __init__ draws the universal-hash coefficients once (seeded) — run as an
    actor pool so this happens once per actor, not per batch.
    """

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def shingle_hashes(self, text: str) -> np.ndarray:
        b = text.encode("utf-8", "ignore")
        if len(b) < self.k:
            b = b + b"\x00" * (self.k - len(b))
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        base = np.uint64(257)
        powers = base ** np.arange(self.k - 1, -1, -1, dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(arr, self.k)
        with np.errstate(over="ignore"):
            return np.unique((windows * powers).sum(axis=1))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hashes, min over shingles
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """Batch signatures: shingle hashes per doc (C-speed per doc), then
        each of the num_perm universal hashes runs ONCE over the concatenated
        shingle array with a segmented min (np.minimum.reduceat) — the
        permutation loop is 128 vectorized passes over all docs at once, not
        a Python loop per document."""
        texts = df["text"].fillna("")
        per_doc = [self.shingle_hashes(t) for t in texts]
        lens = np.array([len(x) for x in per_doc], dtype=np.int64)
        all_sh = (
            np.concatenate(per_doc) if len(per_doc) else np.empty(0, np.uint64)
        )
        starts = np.zeros(len(per_doc), dtype=np.int64)
        if len(per_doc) > 1:
            starts[1:] = np.cumsum(lens)[:-1]
        sigs = np.empty((len(df), self.num_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.num_perm):
                vals = (self.a[i] * all_sh + self.b[i]) % _MERSENNE
                sigs[:, i] = np.minimum.reduceat(vals, starts)
        out = df[["doc_id"]].copy()
        out["sig"] = list(sigs)
        return out


def _band_rows(
    sig_df: pd.DataFrame, bands: int, rows_per_band: int
) -> pd.DataFrame:
    """Explode signatures to slim (band, band_hash, doc_id) rows — the ONLY
    thing the LSH shuffle moves."""
    sigs = np.stack(sig_df["sig"].to_numpy())
    n = len(sig_df)
    out_band, out_hash, out_doc = [], [], []
    doc = sig_df["doc_id"].to_numpy()
    for b in range(bands):
        chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        with np.errstate(over="ignore"):
            h = chunk.astype(np.uint64)
            acc = np.full(n, np.uint64(1469598103934665603))
            for c in range(h.shape[1]):
                acc = (acc ^ h[:, c]) * np.uint64(1099511628211)
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append(acc.astype(np.int64))
        out_doc.append(doc)
    return pd.DataFrame(
        {
            "band": np.concatenate(out_band),
            "band_hash": np.concatenate(out_hash),
            "doc_id": np.concatenate(out_doc),
        }
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    shingle_k: int = 5,
    text_lookup: dict | None = None,
) -> pd.DataFrame:
    """Exact n-gram Jaccard near-dup pairs, LSH-pruned: candidate pairs come
    from MinHash banding (never all-pairs), then the EXACT character-k-gram
    Jaccard is computed for candidates only; pairs >= threshold survive.

    ``text_lookup`` supplies candidate texts (broadcast once at test scale;
    at corpus scale the exact-verify step joins candidates back to the
    documents table by id within buckets)."""
    rows_per_band = 128 // 32
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas",
        fn_constructor_kwargs={"num_perm": 128, "shingle_k": shingle_k},
        concurrency=2, num_cpus=0.5,
    )
    banded = sigs.map_batches(
        lambda df: _band_rows(df, 32, rows_per_band), batch_format="pandas"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ia], "b": ids[ib]})

    cand = (
        banded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if text_lookup is None:
        texts = ds.select_columns(["doc_id", "text"]).to_pandas()
        text_lookup = dict(zip(texts["doc_id"], texts["text"]))
    sims = [
        jaccard(text_lookup[a], text_lookup[b], k=shingle_k)
        for a, b in zip(cand["a"], cand["b"])
    ]
    cand = cand.assign(jaccard=np.round(sims, 6))
    out = cand[cand["jaccard"] >= threshold].reset_index(drop=True)
    if not len(out):
        out = pd.DataFrame({"a": [-1], "b": [-1], "jaccard": [-1.0]})
    return out


def jaccard(a: str, b: str, k: int = 5) -> float:
    def sh(s):
        return {s[i : i + k] for i in range(max(1, len(s) - k + 1))}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_clusters(
    ds: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.7,
    verify: bool = True,
    text_lookup: dict | None = None,
) -> pd.DataFrame:
    """MinHash→LSH candidate pairs → (optionally) Jaccard-verified →
    connected components via union-find over the candidate edge list.

    Returns a pandas DataFrame (doc_id, cluster_id). The edge list after
    banding is tiny relative to the corpus (only same-bucket pairs), so the
    driver-side union-find is safe — documented assumption: candidate pairs
    ≪ corpus size; for adversarial corpora switch to the iterative min-label
    groupby propagation (same building blocks, no driver state).
    """
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher, batch_format="pandas",
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        concurrency=2, num_cpus=0.5,
    )
    banded = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band), batch_format="pandas"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        # pair every member with the bucket minimum — enough for connectivity
        return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0]), "b": ids[1:]})

    edges = (
        banded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )

    if verify and text_lookup is not None and len(edges):
        keep = [
            jaccard(text_lookup[a], text_lookup[b], k=shingle_k) >= threshold
            for a, b in zip(edges["a"], edges["b"])
        ]
        edges = edges[pd.Series(keep, index=edges.index)]

    # union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["a"], edges["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = ds.select_columns(["doc_id"]).to_pandas()["doc_id"]
    return pd.DataFrame(
        {"doc_id": all_ids, "cluster_id": [find(int(d)) for d in all_ids]}
    )


def lsh_clusters_distributed(
    ds: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    max_iters: int = 5,
) -> ray.data.Dataset:
    """Scale-path LSH clustering: candidate edges from banding, then
    connected components via MIN-LABEL PROPAGATION expressed purely as
    Dataset joins + groupby — no driver-side union-find, no broadcast label
    map, so it works when the candidate set itself is huge.

    Per iteration: every edge forwards its dst's current label to its src;
    labels = min over (own label ∪ received). Near-dup clusters have tiny
    diameter, so a handful of iterations reaches the fixpoint. Shuffles move
    only (node, label) and (src, dst) int pairs.

    The per-iteration lookup (label[dst] for each edge) is expressed as a
    groupby-co-partitioned hash join — union the label rows and the edge
    rows keyed on the same column, groupby(key).map_groups resolves each
    bucket locally (ray_guide 'Joins and lookups': the portable partitioned
    join). Ray 2.49's native Dataset.join mis-resolves key fields when a
    participant's lineage already contains a join, so it is avoided here.
    """
    from ray.data.aggregate import Min

    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        batch_format="pandas",
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        concurrency=2,
        num_cpus=0.5,
    )
    banded = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band), batch_format="pandas"
    )

    def bucket_edges(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            # typed empty frame: untyped [] columns become object-dtype blocks
            # and break the hash join's schema resolution
            return pd.DataFrame(
                {"src": pd.Series([], dtype="int64"), "dst": pd.Series([], dtype="int64")}
            )
        # star edges to the bucket min keep connectivity with O(n) edges
        both = np.concatenate([ids[1:], np.full(len(ids) - 1, ids[0])])
        other = np.concatenate([np.full(len(ids) - 1, ids[0]), ids[1:]])
        return pd.DataFrame({"src": both.astype(np.int64), "dst": other.astype(np.int64)})

    edges = (
        banded.groupby(["band", "band_hash"])
        .map_groups(bucket_edges, batch_format="pandas")
        .map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas"
        )
    ).materialize()  # reused every iteration — small (band buckets only)

    labels = ds.select_columns(["doc_id"]).map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64), "label": df["doc_id"].astype(np.int64)}
        ),
        batch_format="pandas",
    )

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        # one co-partitioned bucket: exactly one label row (src == -1) plus
        # the edges whose dst is this key; forward the label to each src and
        # keep the node's own label
        lab = int(g.loc[g["src"] == -1, "label"].min())
        key = int(g["key"].iloc[0])
        srcs = g.loc[g["src"] >= 0, "src"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([[key], srcs]),
                "label": np.full(1 + len(srcs), lab, dtype=np.int64),
            }
        )

    for _ in range(max_iters):
        l_rows = labels.map_batches(
            lambda df: pd.DataFrame(
                {"key": df["doc_id"], "src": np.int64(-1), "label": df["label"]}
            ),
            batch_format="pandas",
        )
        e_rows = edges.map_batches(
            lambda df: pd.DataFrame(
                {"key": df["dst"], "src": df["src"], "label": np.int64(-1)}
            ),
            batch_format="pandas",
        )
        labels = (
            l_rows.union(e_rows)
            .groupby("key")
            .map_groups(_resolve, batch_format="pandas")
            .groupby("doc_id")
            .aggregate(Min("label", alias_name="label"))
        ).materialize()  # bound the lineage per iteration
    return labels.map_batches(
        lambda df: df.rename(columns={"label": "cluster_id"}), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word tokens (vectorized bit-vote accumulation)."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    def signature(self, text: str) -> np.uint64:
        words = pa.array(text.lower().split() or [""])
        h = hash_strings(words)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(i)
        return sig

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"]].copy()
        out["simhash"] = [int(self.signature(t)) for t in df["text"].fillna("")]
        return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_pairs(
    ds: ray.data.Dataset, max_distance: int = 3
) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4 chunks of
    16 bits (pigeonhole: distance ≤ 3 ⇒ at least one chunk identical),
    groupby chunk value for candidates, verify exact hamming distance."""
    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=2, num_cpus=0.5)

    def chunk_rows(df: pd.DataFrame) -> pd.DataFrame:
        s = df["simhash"].to_numpy(dtype=np.uint64)
        parts = []
        for c in range(4):
            chunk = (s >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            parts.append(
                pd.DataFrame(
                    {
                        "chunk": np.full(len(df), c, dtype=np.int32),
                        "value": chunk.astype(np.int64),
                        "doc_id": df["doc_id"].to_numpy(),
                        "simhash": s.astype(np.int64),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "distance": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        d = hamming64(hs[ia], hs[ib])
        return pd.DataFrame({"a": ids[ia], "b": ids[ib], "distance": d})

    pairs = (
        sigs.map_batches(chunk_rows, batch_format="pandas")
        .groupby(["chunk", "value"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if not len(pairs):
        return pd.DataFrame({"a": [], "b": [], "distance": []})
    pairs = pairs[pairs["distance"] <= max_distance]
    return pairs.drop_duplicates(subset=["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: ray.data.Dataset, threshold: float = 0.9, id_col: str = "vec_id"
) -> ray.data.Dataset:
    """All pairs (a < b) with cosine similarity > threshold.

    Full embedding matrix is broadcast ONCE via ray.put; each batch does one
    float64 matmul against it (never a per-row loop, never reshipped per
    batch). O(n²) compute but O(n) shuffle — the brute-force baseline; the
    LSH/IVF-bucketed variant in simsearch.py is the 10^9-vector path.
    """
    all_df = ds.to_pandas()
    ids_all = all_df[id_col].to_numpy()
    mat = np.stack(all_df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy()
            vecs = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vecs @ self.mat.T
            ri, ci = np.nonzero(sims > threshold)
            a, b = ids[ri], self.ids_all[ci]
            keep = a < b
            return pa.table(
                {
                    "id_a": pa.array(a[keep], pa.int64()),
                    "id_b": pa.array(b[keep], pa.int64()),
                    "sim": pa.array(np.round(sims[ri, ci][keep], 6)),
                }
            )

    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=2, num_cpus=0.5)
