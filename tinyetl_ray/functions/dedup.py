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
import pyarrow.compute as pc
import ray
import ray.data

from ..hashing import hash_strings


def round_half_away(a: np.ndarray, decimals: int = 6) -> np.ndarray:
    """DuckDB-compatible ROUND: half away from zero. ``np.round`` is
    half-to-EVEN and diverges from the SQL oracle on exactly-representable
    ties (e.g. 65/128 = 0.5078125 → np 0.507812, SQL 0.507813)."""
    scale = 10.0 ** decimals
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def _shuffle_blocks() -> int:
    """Block count for slim intermediate tables between shuffle stages.
    groupby().map_groups() emits one tiny block per group; feeding those
    straight into the next shuffle makes task count — not data — the cost
    (measured: label blocks grew 192→320 per propagation iteration and each
    iteration doubled in wall time). Coalesce to ~cores/2, floor 8."""
    from ..hashing import shuffle_blocks

    return shuffle_blocks(floor=8, divisor=2)


def _mix_band_hash(band: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """Routing hash over (band, band_hash) — a MIXED hash, never a packed
    key: a structured combine (band << k ^ hash) admits cross-band bucket
    collisions. Segmentation must still use BOTH raw columns."""
    with np.errstate(over="ignore"):
        return band_hash.astype(np.uint64) ^ (
            (band.astype(np.uint64) + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
        )


# Full-pair generation cap for CONNECTIVITY consumers (clustering): buckets
# larger than FULL_PAIR_CAP would emit O(m²) candidate pairs — a single
# degenerate hot bucket (shared boilerplate, empty docs) at 10^10 scale
# could emit 10^11+ pairs and kill the job. Past the cap every member
# instead connects to the N_ANCHORS smallest ids (O(m·K) edges): losing a
# genuine near-dup CONNECTION then requires ALL K anchors to be
# verification false positives — and giant buckets are in practice
# exact-dup explosions where every anchor edge verifies anyway. The cap is
# ONLY valid where connectivity suffices (lsh_clusters_distributed); the
# pair-LIST ops (ngram_jaccard_pairs, embedding_neardup_lsh) contractually
# emit the COMPLETE pair set and therefore pass full_pair_cap=None — for
# them a dup-explosion's O(m²) output IS the answer, not overhead.
FULL_PAIR_CAP = 128
N_ANCHORS = 4

# Above this many members a SimHash bucket's O(m²) triu scan is SKEW:
# signature bits are correlated across real corpora, so a few hot 16-bit
# buckets concentrate thousands of docs into one straggler task (measured:
# one 2.5 s task while the partition mean was 0.2 s at 100k docs). Such
# buckets sub-split EXACTLY by pigeonhole over the remaining 48 bits — no
# recall loss, unlike FULL_PAIR_CAP's connectivity-only degradation.
SIMHASH_SUB_BUCKET_THRESHOLD = 256


def _segmented_bucket_pairs(
    g: pd.DataFrame, star_only: bool, full_pair_cap: int | None = None
) -> pd.DataFrame:
    """Per-bucket pair generation over a whole hash partition: one sort,
    bucket boundaries detected on BOTH (band, band_hash) columns, numpy
    triu/star/anchor expansion per segment — no Python callback per bucket.
    Shared by the MinHash and random-projection LSH paths.
    ``full_pair_cap=None`` → complete pairs always (pair-list contract)."""
    g = g.sort_values(["band", "band_hash", "doc_id"], kind="mergesort")
    band = g["band"].to_numpy()
    bh = g["band_hash"].to_numpy()
    ids = g["doc_id"].to_numpy(np.int64)
    new_bucket = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        new_bucket[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.nonzero(new_bucket)[0]
    bounds = np.append(starts, len(g))
    out_a, out_b = [], []
    for s0, s1 in zip(bounds[:-1], bounds[1:]):
        seg = np.unique(ids[s0:s1])
        if len(seg) < 2:
            continue
        if star_only:
            out_a.append(np.full(len(seg) - 1, seg[0]))
            out_b.append(seg[1:])
        elif full_pair_cap is None or len(seg) <= full_pair_cap:
            ia, ib = np.triu_indices(len(seg), k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        else:  # degenerate giant bucket, connectivity consumer: K anchors
            for k in range(min(N_ANCHORS, len(seg) - 1)):
                out_a.append(np.full(len(seg) - 1 - k, seg[k]))
                out_b.append(seg[k + 1 :])
    if not out_a:
        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )
    return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


def _dedup_pairs(
    pairs: ray.data.Dataset, extra_cols: list[str] | None = None
) -> ray.data.Dataset:
    """Drop duplicate (a, b) pairs (e.g. the same candidate from several LSH
    bands): hash-partition on the pair key, then ONE vectorized
    drop_duplicates per partition — never a Python callback per pair."""
    P = _shuffle_blocks() * 4

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df["a"].to_numpy(np.int64).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ df["b"].to_numpy(np.int64).astype(np.uint64)
        )
        df = df.copy(deep=False)
        df["_part"] = (h % np.uint64(P)).astype(np.int32)
        return df

    keep = ["a", "b"] + (extra_cols or [])

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"])[keep]

    return (
        pairs.map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(uniq, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def route_by_text_hash(
    ds: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Append `_part` = content-hash(text) MOD a bounded partition count —
    the shuffle key that co-locates ALL copies of a text in one partition,
    so partition-local dedup / canonical-copy marking is globally correct.
    Shared by exact_dedup and pipelines.corpus.corpus_clean (one routing
    semantics: NULL hashes like '', partition count sized to the pool)."""
    P = num_partitions or _shuffle_blocks() * 4

    def add_keys(t: pa.Table) -> pa.Table:
        # pd.util.hash_array: vectorized siphash with a FIXED key —
        # deterministic across processes, and O(total bytes) for long
        # documents.
        s = t.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
        h = pd.util.hash_array(s)
        t = t.replace_schema_metadata(None)  # unhashable-schema guard
        return t.append_column(
            "_part", pa.array((h % np.uint64(P)).astype(np.int32))
        )

    return ds.map_batches(add_keys, batch_format="pyarrow")


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Keep the min-id row per distinct text. Shuffle key = content-hash
    MOD a bounded partition count, and the winner scan is VECTORIZED over
    each whole partition (one sort + drop_duplicates), not per hash group
    — groupby on the raw hash would invoke a Python callback per DISTINCT
    TEXT (measured 19 s for 100k docs; partition-level processing is ~3 s).
    Full-text equality decides inside the partition, so a hash collision
    can never merge distinct texts."""

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        return g.drop_duplicates(subset=[text_col], keep="first").drop(
            columns=["_part"]
        )

    return (
        route_by_text_hash(ds, text_col=text_col, num_partitions=num_partitions)
        .groupby("_part")
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
        a Python loop per document.

        NULL-text docs are EXCLUDED (no signature → never a candidate): the
        SQL oracle's ``length(NULL)`` generates zero grams so NULL docs
        never pair there; fillna('') would instead pair every NULL doc with
        every empty doc at jaccard 1.0. Short non-null docs keep their
        single padded gram (= the oracle's short ``substr`` gram)."""
        df = df[df["text"].notna()]
        ids = df["doc_id"].to_numpy(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError(
                "doc_id must be non-negative: negative ids collide with the "
                "-1 label/edge sentinel used by the pair and cluster stages"
            )
        texts = df["text"]
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
    if not len(sig_df):  # np.stack needs >=1 array; empty block/corpus
        return pd.DataFrame(
            {
                "band": pd.Series([], dtype="int32"),
                "band_hash": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
            }
        )
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


def jaccard(a: str, b: str, k: int = 5) -> float:
    def sh(s):
        return {s[i : i + k] for i in range(max(1, len(s) - k + 1))}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------------------------
# distributed exact-Jaccard verification (the scale path: no driver text)
# ---------------------------------------------------------------------------

_GRAM_BASE = np.uint64(1099511628211)  # FNV prime, odd → bijective multiplier


def char_gram_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 64-bit hashes of the CHARACTER k-grams of ``text`` —
    codepoint windows (UTF-32 view), matching python ``s[i:i+k]`` slicing and
    SQL ``substr`` semantics for non-ASCII text (byte windows would not).
    A doc shorter than k yields its single short gram, like ``s[0:k]``.

    ``errors="ignore"``: a lone surrogate (possible only in strings built
    in-process — parquet text is valid UTF-8 and cannot carry one) is
    dropped rather than crashing the verify stage, matching the MinHash
    shingle path's utf-8/ignore encoding."""
    cps = np.frombuffer(
        text.encode("utf-32-le", "ignore"), dtype=np.uint32
    ).astype(np.uint64)
    if len(cps) < k:
        # pad with NUL (never in real text): one gram, equal iff texts equal
        cps = np.concatenate([cps, np.zeros(k - len(cps), np.uint64)])
    powers = _GRAM_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(cps, k)
    with np.errstate(over="ignore"):
        return np.unique((windows * powers).sum(axis=1))


class GramSigs:
    """map_batches stage: (doc_id, text) → (doc_id, grams list<uint64>).

    Per-doc gram hashing is one numpy pass over the doc's codepoints; the
    list column ships as a zero-copy Arrow ListArray."""

    def __init__(self, k: int = 5):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        # NULL-text docs excluded, same contract as MinHasher (they are
        # never candidates, so dropping them here only skips dead work)
        t = t.filter(pc.is_valid(t.column("text")))
        ids_np = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(ids_np) and ids_np.min() < 0:
            raise ValueError(
                "doc_id must be non-negative: negative ids collide with the "
                "-1 label/edge sentinel used by the pair and cluster stages"
            )
        texts = t.column("text").to_pylist()
        per = [char_gram_hashes(x, self.k) for x in texts]
        lens = np.fromiter((len(p) for p in per), dtype=np.int64, count=len(per))
        offsets = np.zeros(len(per) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        values = np.concatenate(per) if per else np.empty(0, np.uint64)
        grams = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values, pa.uint64())
        )
        return pa.table(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()), "grams": grams}
        )


def _candidate_ids(pairs: ray.data.Dataset) -> np.ndarray:
    """Sorted distinct ids appearing in the candidate pair list. Materializes
    ONLY slim int64 ids on the driver (≤ 2·|pairs| ≪ corpus)."""
    ids: set[int] = set()
    for b in pairs.select_columns(["a", "b"]).iter_batches(batch_format="pyarrow"):
        ids.update(b.column("a").to_pylist())
        ids.update(b.column("b").to_pylist())
    return np.sort(np.fromiter(ids, dtype=np.int64, count=len(ids)))


def _candidate_id_set(pairs: ray.data.Dataset):
    """_candidate_ids broadcast once via ray.put."""
    return ray.put(_candidate_ids(pairs))


def _semi_join_ids(
    ds: ray.data.Dataset, ids_ref, id_col: str, invert: bool = False
) -> ray.data.Dataset:
    """Keep only rows whose ``id_col`` is in the broadcast sorted id array
    (``invert=True`` → anti-join: keep rows NOT in it) — vectorized
    searchsorted probe per batch, no shuffle.

    The ray.put ref is deliberately kept for this MB-scale broadcast (plasma
    shares one copy per node; plain kwargs would copy per actor). Restart
    hazard (ray#53727) is bounded: the driver owns the primary copy for the
    query's lifetime, so a restarted actor can always re-fetch unless the
    driver itself died — which ends the job anyway. KB-scale broadcasts use
    plain constructor kwargs instead (see functions/simsearch.py)."""

    class Prune:
        def __init__(self):
            self.ids = ray.get(ids_ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = pc.cast(t.column(id_col), pa.int64()).to_numpy()
            if len(self.ids) == 0:
                hit = np.zeros(len(keys), dtype=bool)
            else:
                idx = np.clip(np.searchsorted(self.ids, keys), 0, len(self.ids) - 1)
                hit = self.ids[idx] == keys
            return t.filter(pa.array(~hit if invert else hit))

    return ds.map_batches(Prune, batch_format="pyarrow", concurrency=(2, 8), num_cpus=0.5)


def _touched_label_rows(cand: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (doc_id, label=doc_id) rows for every id appearing in the
    candidate pair list, computed DISTRIBUTED (one slim-int groupby) — the
    broadcast-free label init for candidate sets too large for
    _candidate_ids' driver gather."""
    from ray.data.aggregate import Min

    def explode(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("b"), pa.int64()).to_numpy()
        ids = np.concatenate([a, b])
        return pa.table({"doc_id": pa.array(ids), "label": pa.array(ids)})

    return (
        cand.map_batches(explode, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("label", alias_name="label"))
    )


def _anti_join_ids_bucketed(
    ids_ds: ray.data.Dataset, cand: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(doc_id, cluster_id=doc_id) rows for ids NOT appearing in any
    candidate pair — the broadcast-free anti-join: both sides route on
    id % P (a slim int-only shuffle) and each hash bucket resolves its
    members locally with one searchsorted. No driver-side id gather."""
    P = _shuffle_blocks() * 4

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df[id_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": k,
                "_part": (k.astype(np.uint64) % np.uint64(P)).astype(np.int32),
                "is_doc": True,
            }
        )

    def cand_rows(t: pa.Table) -> pd.DataFrame:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("b"), pa.int64()).to_numpy()
        k = np.concatenate([a, b])
        return pd.DataFrame(
            {
                "key": k,
                "_part": (k.astype(np.uint64) % np.uint64(P)).astype(np.int32),
                "is_doc": False,
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        docs = g.loc[g["is_doc"], "key"].to_numpy(np.int64)
        cands = np.unique(g.loc[~g["is_doc"], "key"].to_numpy(np.int64))
        if len(cands) and len(docs):
            idx = np.clip(np.searchsorted(cands, docs), 0, len(cands) - 1)
            keep = cands[idx] != docs
        else:
            keep = np.ones(len(docs), dtype=bool)
        kept = docs[keep]
        return pd.DataFrame({"doc_id": kept, "cluster_id": kept})

    return (
        ids_ds.map_batches(doc_rows, batch_format="pandas")
        .union(cand.map_batches(cand_rows, batch_format="pyarrow"))
        .groupby("_part")
        .map_groups(resolve, batch_format="pandas")
    )


# Above this many candidate PAIRS the sorted-id broadcast (≤ 2·|pairs|
# int64s via ray.put) stops being "small": at 10^10-doc scale a degenerate
# threshold can make the candidate set corpus-sized, and an O(corpus)
# driver gather + per-actor copy is exactly the anti-pattern the broadcast
# exists to avoid. Past the limit the prune is skipped entirely — the
# id%P co-partitioned join performs the same semi-join INSIDE each hash
# bucket (non-candidate rows are dropped at the first map_groups), so no
# driver-side id materialization ever happens on the scale path.
BROADCAST_PAIR_LIMIT = 2_000_000


def _broadcast_prune_ok(pairs: ray.data.Dataset) -> tuple[ray.data.Dataset, bool]:
    """Returns (pairs, small_enough_to_broadcast). Materializes defensively
    first — a no-op for every in-repo caller (all pass materialized pair
    sets) but guarantees an external caller passing a LAZY dataset pays the
    candidate pipeline ONCE, not once for this count and again for the
    verify join."""
    pairs = pairs.materialize()
    return pairs, pairs.count() <= BROADCAST_PAIR_LIMIT


def verify_jaccard_pairs(
    pairs: ray.data.Dataset, docs: ray.data.Dataset, shingle_k: int = 5
) -> ray.data.Dataset:
    """Exact char-k-gram Jaccard for candidate pairs (a < b), computed fully
    distributed: no driver-side text or edge materialization.

    Two co-partitioned groupby joins (ray_guide 'union on common key +
    map_groups' — Ray 2.49's native join is avoided, see
    lsh_clusters_distributed):
      1. key = doc_id: one gram row per doc meets every pair-membership row
         of that doc → each pair side picks up its gram set;
      2. key = (a, b): the two sides meet → |A∩B| / |A∪B| via sorted-array
         intersection. Duplicate candidates (same pair from several LSH
         bands) collapse here: first row per side wins.
    Shuffles move only (ints + gram-hash lists of CANDIDATE docs). For
    small candidate sets the doc side is semi-join pruned first with a
    broadcast sorted-id set (ray.put once) so non-candidate documents never
    compute or ship their gram lists; past BROADCAST_PAIR_LIMIT the
    broadcast is skipped and join (1) itself drops non-candidate gram rows
    in-bucket — correct either way, never a driver-side id gather at scale."""
    P = _shuffle_blocks() * 4
    pairs, small = _broadcast_prune_ok(pairs)
    if small:
        docs = _semi_join_ids(docs, _candidate_id_set(pairs), "doc_id")
    grams = docs.map_batches(GramSigs(shingle_k), batch_format="pyarrow")

    def side_rows(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("b"), pa.int64()).to_numpy()
        key = np.concatenate([a, b])
        return pa.table(
            {
                "key": pa.array(key),
                "_part": pa.array((key.astype(np.uint64) % np.uint64(P)).astype(np.int32)),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
                "grams": pa.nulls(2 * len(t), pa.list_(pa.uint64())),
            }
        )

    def gram_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        key = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
        return pa.table(
            {
                "key": pa.array(key),
                "_part": pa.array((key.astype(np.uint64) % np.uint64(P)).astype(np.int32)),
                "a": pa.array(np.full(n, -1, np.int64)),
                "b": pa.array(np.full(n, -1, np.int64)),
                "grams": t.column("grams"),
            }
        )

    unioned = pairs.map_batches(side_rows, batch_format="pyarrow").union(
        grams.map_batches(gram_rows, batch_format="pyarrow")
    )

    _EMPTY_SIDED = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "grams": pa.array([], pa.list_(pa.uint64())),
        }
    )

    def attach_part(g: pa.Table) -> pa.Table:
        # VECTORIZED hash-join within the partition: searchsorted probe of
        # pair keys into the sorted doc keys + one ListArray.take gather —
        # a groupby on the raw key would cost a Python callback per doc
        is_doc = pc.equal(g.column("a"), -1)
        doc = g.filter(is_doc)
        pair = g.filter(pc.invert(is_doc))
        if doc.num_rows == 0 or pair.num_rows == 0:
            return _EMPTY_SIDED
        dk = doc.column("key").to_numpy()
        order = np.argsort(dk, kind="stable")
        dks = dk[order]
        pk = pair.column("key").to_numpy()
        idx = np.clip(np.searchsorted(dks, pk), 0, len(dks) - 1)
        hit = dks[idx] == pk
        if not hit.any():
            return _EMPTY_SIDED
        pair = pair.filter(pa.array(hit))
        gathered = doc.column("grams").combine_chunks().take(
            pa.array(order[idx[hit]], pa.int64())
        )
        side = pc.cast(
            pc.equal(pair.column("b"), pair.column("key")), pa.int8()
        )
        return pa.table(
            {
                "a": pair.column("a"),
                "b": pair.column("b"),
                "side": side,
                "grams": gathered,
            }
        )

    sided = (
        unioned.groupby("_part")
        .map_groups(attach_part, batch_format="pyarrow")
        .repartition(_shuffle_blocks())
    )

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ b.astype(np.uint64)
        return t.append_column("_p2", pa.array((h % np.uint64(P)).astype(np.int32)))

    def jac_part(g: pa.Table) -> pa.Table:
        # pair rows meet here; per-pair set intersection over raw
        # offsets/values numpy slices (no pandas frame per pair)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
                "jaccard_raw": pa.array([], pa.float64()),
            }
        )
        n = g.num_rows
        if n == 0:
            return empty
        a = g.column("a").to_numpy()
        b = g.column("b").to_numpy()
        side = g.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, b, a))
        a, b, side = a[order], b[order], side[order]
        grams = g.column("grams").combine_chunks().take(pa.array(order, pa.int64()))
        offs = grams.offsets.to_numpy()
        vals = grams.values.to_numpy(zero_copy_only=False)
        # drop duplicate (a, b, side) rows (same pair from several bands)
        dup = np.zeros(n, dtype=bool)
        if n > 1:
            dup[1:] = (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (side[1:] == side[:-1])
        keep_idx = np.nonzero(~dup)[0]
        a, b, side = a[keep_idx], b[keep_idx], side[keep_idx]
        m = len(keep_idx)
        new_pair = np.ones(m, dtype=bool)
        if m > 1:
            new_pair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(new_pair)[0]
        lens = np.diff(np.append(starts, m))
        good = starts[lens == 2]  # pairs whose BOTH docs arrived
        if not len(good):
            return empty
        i0 = keep_idx[good]  # side-0 row per pair
        i1 = keep_idx[good + 1]  # side-1 row per pair
        # int64: ListArray offsets are int32 and the flattened per-pair gram
        # stream can pass 2^31 entries in a degenerate partition
        la = (offs[i0 + 1] - offs[i0]).astype(np.int64)
        lb = (offs[i1 + 1] - offs[i1]).astype(np.int64)

        # VECTORIZED intersection counts: per-doc gram lists are unique &
        # sorted, so a (pair, gram) value occurs at most twice in the
        # concatenated two-side stream — sort by (pair, gram) and count
        # adjacent duplicates per pair. One lexsort over the partition's
        # gram stream replaces a Python loop + intersect1d per pair (a
        # degenerate exact-dup bucket emits ~m²/2 pairs; the loop was the
        # straggler there).
        def take_ranges(range_starts: np.ndarray, range_lens: np.ndarray) -> np.ndarray:
            total = int(range_lens.sum())
            if total == 0:
                return np.empty(0, vals.dtype)
            flat = np.repeat(range_starts, range_lens) + (
                np.arange(total) - np.repeat(np.cumsum(range_lens) - range_lens, range_lens)
            )
            return vals[flat]

        n_pairs = len(good)
        pid = np.concatenate(
            [np.repeat(np.arange(n_pairs), la), np.repeat(np.arange(n_pairs), lb)]
        )
        gv = np.concatenate([take_ranges(offs[i0], la), take_ranges(offs[i1], lb)])
        order2 = np.lexsort((gv, pid))
        pid_s, gv_s = pid[order2], gv[order2]
        dup2 = (pid_s[1:] == pid_s[:-1]) & (gv_s[1:] == gv_s[:-1])
        inter = np.bincount(pid_s[1:][dup2], minlength=n_pairs)
        union = la + lb - inter
        raw = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
        return pa.table(
            {
                "a": pa.array(a[good], pa.int64()),
                "b": pa.array(b[good], pa.int64()),
                "jaccard": pa.array(round_half_away(raw), pa.float64()),
                "jaccard_raw": pa.array(raw, pa.float64()),
            }
        )

    return (
        sided.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(jac_part, batch_format="pyarrow")
    )


def lsh_candidate_pairs(
    ds: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    star_only: bool = False,
    full_pair_cap: int | None = None,
) -> ray.data.Dataset:
    """MinHash→LSH candidate pairs (a < b), deduplicated across bands.
    ``star_only`` pairs every bucket member with the bucket minimum
    (enough for connectivity/clustering, O(n) edges per bucket);
    otherwise all in-bucket pairs (needed for complete pair listings).
    ``full_pair_cap`` (connectivity consumers only) degrades giant buckets
    to K-anchor edges — see FULL_PAIR_CAP."""
    if bands <= 0 or bands > num_perm or num_perm % bands:
        # bands > num_perm would give rows_per_band=0 (every doc in ONE
        # constant bucket per band — an O(n²) all-pairs blowup), and a
        # non-divisible split would silently discard trailing permutations
        raise ValueError(
            f"bands must divide num_perm with bands <= num_perm "
            f"(got bands={bands}, num_perm={num_perm})"
        )
    rows_per_band = num_perm // bands
    P = _shuffle_blocks() * 4
    sigs = ds.map_batches(
        MinHasher,
        batch_format="pandas",
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        concurrency=(2, 8),
        num_cpus=0.5,
    )

    def banded(df: pd.DataFrame) -> pd.DataFrame:
        out = _band_rows(df, bands, rows_per_band)
        h = _mix_band_hash(
            out["band"].to_numpy(np.int64), out["band_hash"].to_numpy(np.int64)
        )
        out["_part"] = (h % np.uint64(P)).astype(np.int32)
        return out[["band", "band_hash", "_part", "doc_id"]]

    pairs = (
        sigs.map_batches(banded, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g, s=star_only, c=full_pair_cap: _segmented_bucket_pairs(g, s, c),
            batch_format="pandas",
        )
    )
    return _dedup_pairs(pairs).repartition(_shuffle_blocks())


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    shingle_k: int = 5,
    num_perm: int = 128,
    bands: int = 16,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard near-dup pairs, LSH-pruned, fully distributed:
    candidates from MinHash banding (never all-pairs), exact char-k-gram
    Jaccard via the co-partitioned verify — no driver-side text, no Python
    per-pair loop.

    Banding choice vs threshold: with bands=16 × rows=8 a pair at similarity
    s survives with P = 1-(1-s^8)^16 — ≈1 for s ≥ 0.8, ≈6% at s = 0.5. Pick
    bands/rows for the similarity band you must not miss (the engineered
    near-dups in the test corpus sit at ≥0.92 with background ≤0.33, so the
    default is sharp there)."""
    cand = lsh_candidate_pairs(
        ds, num_perm=num_perm, bands=bands, shingle_k=shingle_k, star_only=False
    ).materialize()  # verify reads it twice (id set + pair sides)
    verified = verify_jaccard_pairs(cand, ds, shingle_k=shingle_k)
    # threshold applies to the RAW value (like the SQL oracle); the rounded
    # column is the reported one
    return verified.map_batches(
        lambda t, th=threshold: t.filter(
            pc.greater_equal(t.column("jaccard_raw"), th)
        ).drop_columns(["jaccard_raw"]),
        batch_format="pyarrow",
    )


def lsh_clusters_distributed(
    ds: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    max_iters: int = 8,
    verify_threshold: float | None = None,
    edges_out: str | None = None,
) -> ray.data.Dataset:
    """Scale-path LSH clustering: candidate edges from banding, optionally
    Jaccard-verified (distributed, exact char-k-gram — see
    verify_jaccard_pairs), then connected components via MIN-LABEL
    PROPAGATION expressed purely as Dataset unions + groupby — no
    driver-side union-find, no broadcast label map, no driver text.

    Per iteration: every edge forwards its dst's current label to its src,
    and every node additionally receives label[label[i]] (pointer-jump /
    shortcutting rows — hop distance ~doubles per round, so rounds ≈
    log2(component diameter) instead of diameter); labels = min over (own
    label ∪ received). The loop runs TO THE FIXPOINT — detected when the
    label sum is unchanged (labels only decrease, so an unchanged sum IS
    the fixpoint); ``max_iters`` only floors the far-out-of-reach bug-guard
    cap, it can no longer silently split long-diameter components. Shuffles
    move only (node, label) and (src, dst) int pairs.

    The per-iteration lookup (label[dst] for each edge) is expressed as a
    groupby-co-partitioned hash join — union the label rows and the edge
    rows keyed on the same column, groupby(key).map_groups resolves each
    bucket locally (ray_guide 'Joins and lookups': the portable partitioned
    join). Ray 2.49's native Dataset.join mis-resolves key fields when a
    participant's lineage already contains a join, so it is avoided here.

    ``edges_out``: optional parquet path for the (verified, undirected)
    edge list — the independent-oracle hook (DuckDB recursive-CTE connected
    components over the same edges must reproduce the cluster ids).
    """
    from ray.data.aggregate import Min, Sum

    # Star edges (member↔bucket-min) give connectivity only when they survive
    # unfiltered: under verification a false-positive bucket min kills BOTH
    # its star edges, disconnecting true near-dup pairs among the remaining
    # members (round-2 advice: under-clustering the oracle can't catch since
    # it re-clusters the engine's own edges). The verified path therefore
    # generates full in-bucket pairs; the unverified path keeps the O(n)
    # star shape.
    cand = lsh_candidate_pairs(
        ds,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        star_only=verify_threshold is None,
        # clustering needs CONNECTIVITY, not the complete pair list, so the
        # K-anchor degradation for degenerate giant buckets is safe here
        full_pair_cap=FULL_PAIR_CAP,
    ).materialize()  # consumed by verify AND mirrored below — never re-derive
    if verify_threshold is not None:
        verified = verify_jaccard_pairs(cand, ds, shingle_k=shingle_k)
        cand = verified.map_batches(
            lambda t, th=verify_threshold: t.filter(
                pc.greater_equal(t.column("jaccard_raw"), th)
            ).select(["a", "b"]),
            batch_format="pyarrow",
        ).materialize()
    if edges_out is not None:
        cand.write_parquet(edges_out)

    # mirror to both directions for propagation
    def mirror(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("b"), pa.int64()).to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = cand.map_batches(mirror, batch_format="pyarrow").materialize()
    # reused every iteration — small (band buckets only)

    # Propagate over EDGE-TOUCHED nodes only: at corpus scale most documents
    # are in no candidate pair and trivially label themselves, so iterating
    # the full label table would shuffle the whole corpus per round for
    # nothing. Small candidate sets broadcast the sorted touched-id array
    # (≤ 2·|edges| int64s); past BROADCAST_PAIR_LIMIT both the label init
    # and the final untouched anti-join run as id%P-bucketed slim-int
    # shuffles with no driver-side id gather (the 10^10-doc shape).
    n_pairs = cand.count()
    if n_pairs == 0:  # no candidates at all: every doc is its own cluster
        return ds.select_columns(["doc_id"]).map_batches(
            lambda df: pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype(np.int64),
                    "cluster_id": df["doc_id"].astype(np.int64),
                }
            ),
            batch_format="pandas",
        )
    broadcast_ok = n_pairs <= BROADCAST_PAIR_LIMIT
    if broadcast_ok:
        touched = _candidate_ids(cand)
        touched_ref = ray.put(touched)
        labels = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(touched), "label": pa.array(touched)})
        ).repartition(max(1, min(_shuffle_blocks(), len(touched) // 10_000 + 1)))
    else:
        labels = _touched_label_rows(cand).repartition(
            max(1, min(_shuffle_blocks(), 2 * n_pairs // 10_000 + 1))
        )

    P = _shuffle_blocks() * 4

    def _resolve_part(g: pd.DataFrame) -> pd.DataFrame:
        # VECTORIZED within the hash partition: label rows sorted by key,
        # edge rows probe them with one searchsorted — forwards label[dst]
        # to every src and keeps each node's own label (a groupby on the
        # raw key would cost a Python callback per node)
        lab = g[g["src"] == -1]
        ed = g[g["src"] >= 0]
        lk = lab["key"].to_numpy(np.int64)
        lv = lab["label"].to_numpy(np.int64)
        order = np.argsort(lk, kind="stable")
        lks, lvs = lk[order], lv[order]
        if len(ed) and len(lks):
            ek = ed["key"].to_numpy(np.int64)
            idx = np.clip(np.searchsorted(lks, ek), 0, len(lks) - 1)
            hit = lks[idx] == ek
            fwd_doc = ed["src"].to_numpy(np.int64)[hit]
            fwd_lab = lvs[idx[hit]]
        else:
            fwd_doc = np.empty(0, np.int64)
            fwd_lab = np.empty(0, np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([lk, fwd_doc]),
                "label": np.concatenate([lv, fwd_lab]),
            }
        )

    prev_sum: int | None = None
    # termination: the label sum strictly decreases every non-fixpoint
    # iteration (labels only shrink), so the loop ALWAYS reaches the
    # fixpoint — a fixed iteration cap without a convergence check would
    # silently SPLIT components whose diameter exceeds it. The
    # pointer-jump rows below make the hop distance roughly double per
    # round (shortcutting), so rounds ≈ log2(component diameter); the cap
    # is only a bug-guard, far above log2 of any possible corpus.
    hard_cap = max(max_iters, 64)
    for it in range(hard_cap + 1):
        l_rows = labels.map_batches(
            lambda df: pd.DataFrame(
                {
                    "key": df["doc_id"].to_numpy(np.int64),
                    "_part": (
                        df["doc_id"].to_numpy(np.int64).astype(np.uint64) % np.uint64(P)
                    ).astype(np.int32),
                    "src": np.int64(-1),
                    "label": df["label"],
                }
            ),
            batch_format="pandas",
        )
        e_rows = edges.map_batches(
            lambda df: pd.DataFrame(
                {
                    "key": df["dst"].to_numpy(np.int64),
                    "_part": (
                        df["dst"].to_numpy(np.int64).astype(np.uint64) % np.uint64(P)
                    ).astype(np.int32),
                    "src": df["src"],
                    "label": np.int64(-1),
                }
            ),
            batch_format="pandas",
        )

        # POINTER-JUMP rows: the label table itself as extra edges
        # (src=doc, dst=its current label), so node i also receives
        # label[label[i]] this round — one-hop-per-round propagation alone
        # needs diameter iterations on chain-shaped components
        def _jump_rows(df: pd.DataFrame) -> pd.DataFrame:
            doc = df["doc_id"].to_numpy(np.int64)
            lab = df["label"].to_numpy(np.int64)
            m = lab != doc  # self-labeled rows jump nowhere
            doc, lab = doc[m], lab[m]
            return pd.DataFrame(
                {
                    "key": lab,
                    "_part": (lab.astype(np.uint64) % np.uint64(P)).astype(np.int32),
                    "src": doc,
                    "label": np.int64(-1),
                }
            )

        # jump rows engage from iteration 2: at it=0 labels are all
        # self-labels (the jump is provably a no-op) and the common
        # small-diameter corpus (cliques/stars from in-bucket full pairs)
        # reaches its fixpoint by it=1 — so the typical run pays ZERO jump
        # overhead (measured ~20% of this loop's wall-time per A/B), while
        # a long chain gets 2 one-hop rounds then doubling: rounds ≈
        # 2 + log2(diameter/2)
        streams = l_rows.union(e_rows)
        if it >= 2:
            streams = streams.union(
                labels.map_batches(_jump_rows, batch_format="pandas")
            )
        labels = (
            streams.groupby("_part")
            .map_groups(_resolve_part, batch_format="pandas")
            .groupby("doc_id")
            .aggregate(Min("label", alias_name="label"))
            .repartition(_shuffle_blocks())  # keep next iteration's task count flat
        ).materialize()  # bound the lineage per iteration
        # labels only decrease → unchanged sum == fixpoint. The checksum is
        # an EXACT arbitrary-precision sum: int64 hi/lo split per block
        # (each half's per-block sum cannot wrap for any block under ~2^21
        # rows of any non-negative ids), combined as Python ints on the
        # driver — a raw int64 Sum could wrap and terminate early with
        # split components when per-round decrease ≡ 0 mod 2^64.
        def _psum(df: pd.DataFrame) -> pd.DataFrame:
            a = df["label"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "hi": [int((a >> np.int64(32)).sum(dtype=np.int64))],
                    "lo": [int((a & np.int64(0xFFFFFFFF)).sum(dtype=np.int64))],
                }
            )

        parts = labels.map_batches(_psum, batch_format="pandas").to_pandas()
        cur = (int(parts["hi"].astype(object).sum()) << 32) + int(
            parts["lo"].astype(object).sum()
        )
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(
            f"label propagation did not converge in {hard_cap + 1} rounds — "
            "impossible for any real component (shortcutting converges in "
            "~log2(diameter)); this indicates a bug, not a data property"
        )
    clustered = labels.map_batches(
        lambda df: df.rename(columns={"label": "cluster_id"}), batch_format="pandas"
    )
    # untouched docs (no candidate edge) label themselves — broadcast
    # anti-join (no shuffle) when the id set is small, else the bucketed
    # anti-join (slim int-only shuffle, no driver gather)
    if broadcast_ok:
        untouched = _semi_join_ids(
            ds.select_columns(["doc_id"]), touched_ref, "doc_id", invert=True
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype(np.int64),
                    "cluster_id": df["doc_id"].astype(np.int64),
                }
            ),
            batch_format="pandas",
        )
    else:
        untouched = _anti_join_ids_bucketed(ds.select_columns(["doc_id"]), cand)
    return clustered.union(untouched)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word tokens, batch-vectorized: ALL documents'
    tokens are hashed in one ``hash_strings`` call, the 64 bit-votes are
    accumulated with a single segmented ``np.add.reduceat`` over the
    concatenated token stream (the MinHasher pattern), and signatures are
    bit-packed with one matmul-style reduction — no per-document Python."""

    def __init__(self, seed: int = 11):
        self.seed = seed
        self._bit_idx = np.arange(64, dtype=np.uint64)

    def signature(self, text: str) -> np.uint64:
        return np.uint64(
            self(pd.DataFrame({"doc_id": [0], "text": [text]}))["simhash"].iloc[0]
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [t.split() or [""] for t in df["text"].fillna("").str.lower()]
        lens = np.fromiter(
            (len(x) for x in toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
        )
        starts = np.zeros(len(toks_per_doc), dtype=np.int64)
        if len(toks_per_doc) > 1:
            starts[1:] = np.cumsum(lens)[:-1]
        flat = pa.array(
            [tok for doc in toks_per_doc for tok in doc], pa.string()
        )
        h = hash_strings(flat)  # (total_tokens,) uint64 — ONE call
        # (total_tokens, 64) bit matrix → per-doc one-counts via reduceat
        bits = ((h[:, None] >> self._bit_idx) & np.uint64(1)).astype(np.int32)
        ones = (
            np.add.reduceat(bits, starts, axis=0)
            if len(flat)
            else np.zeros((0, 64), np.int32)
        )
        votes = 2 * ones - lens[:, None]  # ones minus zeros
        sig = ((votes > 0).astype(np.uint64) << self._bit_idx).sum(
            axis=1, dtype=np.uint64
        )
        out = df[["doc_id"]].copy()
        out["simhash"] = sig.astype(np.int64)
        return out


# 256-entry popcount table: hamming64 = table-gather over the 8 bytes of the
# xor, vectorized (numpy 1.26 lacks np.bitwise_count)
_POPCOUNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64)))
    return (
        _POPCOUNT8[x.view(np.uint8).reshape(x.shape + (8,))]
        .sum(axis=-1)
        .astype(np.int64)
    )


def simhash_pairs(
    ds: ray.data.Dataset, max_distance: int = 3, sigs_out: str | None = None
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    ``max(4, max_distance + 1)`` balanced chunks (pigeonhole: with c chunks
    and ≤ max_distance differing bits, c ≥ max_distance + 1 chunks means at
    least one chunk is identical, so the banded candidate set provably
    contains EVERY pair within max_distance — for the default 3 this is the
    classic 4×16-bit layout), groupby chunk value for candidates, verify
    exact hamming distance, dedupe across bands with a slim groupby — fully
    distributed, nothing on the driver.

    ``sigs_out``: optional parquet path for (doc_id, simhash) — the
    independent-oracle hook: DuckDB's bit_count(xor(a, b)) over the same
    signatures must reproduce the pair list exactly (banding is exact here,
    not probabilistic)."""
    if not 0 <= max_distance < 64:
        raise ValueError(f"max_distance must be in [0, 64), got {max_distance}")
    # chunk layout: enough chunks for pigeonhole completeness at ANY
    # max_distance (a fixed 4×16 layout silently DROPS qualifying pairs for
    # max_distance ≥ 4 — no chunk need be equal when ≥1 bit differs in each)
    n_chunks = max(4, max_distance + 1)
    widths = [64 // n_chunks + (1 if j < 64 % n_chunks else 0) for j in range(n_chunks)]
    offsets = np.concatenate([[0], np.cumsum(widths[:-1])]).astype(np.int64)
    P = _shuffle_blocks() * 4
    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=(2, 8), num_cpus=0.5)
    if sigs_out is not None:
        sigs = sigs.materialize()
        sigs.write_parquet(sigs_out)

    def chunk_rows(df: pd.DataFrame) -> pd.DataFrame:
        s = df["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        parts = []
        for c in range(n_chunks):
            chunk = (s >> np.uint64(offsets[c])) & np.uint64((1 << widths[c]) - 1)
            # widths ≤ 16 bits (n_chunks ≥ 4), so the value packs under c<<16
            bucket = (np.int64(c) << np.int64(16)) | chunk.astype(np.int64)
            parts.append(
                pd.DataFrame(
                    {
                        "bucket": bucket,
                        "_part": (bucket % P).astype(np.int32),
                        "doc_id": df["doc_id"].to_numpy(),
                        "simhash": s.astype(np.int64),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def _sub_bucket_pairs(ids_seg, hs_seg, c, maxd):
        """Pairs within one giant (chunk c)-bucket, exactly: the members
        agree on chunk c, so a pair at hamming ≤ maxd differs only in the
        remaining 64 - widths[c] bits; partition those into maxd+1
        sub-chunks and by pigeonhole every qualifying pair has ≥1 sub-chunk
        identical — mine runs per sub-chunk (each far smaller than the
        bucket), then de-dup pairs found by several sub-chunks."""
        rem_bits = 64 - widths[c]
        rem = np.zeros(len(hs_seg), np.uint64)
        shift = 0
        for k in range(n_chunks):
            if k == c:
                continue
            rem |= (
                (hs_seg >> np.uint64(offsets[k])) & np.uint64((1 << widths[k]) - 1)
            ) << np.uint64(shift)
            shift += widths[k]
        n_sub = maxd + 1
        sub_widths = [
            rem_bits // n_sub + (1 if j < rem_bits % n_sub else 0)
            for j in range(n_sub)
        ]
        pa_, pb_, pd_ = [], [], []
        shift = 0
        for w in sub_widths:
            sub = (rem >> np.uint64(shift)) & np.uint64((1 << w) - 1)
            shift += w
            order = np.argsort(sub, kind="stable")
            ss = sub[order]
            run_start = np.ones(len(ss), bool)
            run_start[1:] = ss[1:] != ss[:-1]
            rs = np.nonzero(run_start)[0]
            rb = np.append(rs, len(ss))
            for r0, r1 in zip(rb[:-1], rb[1:]):
                if r1 - r0 < 2:
                    continue
                sel = order[r0:r1]
                ia, ib = np.triu_indices(r1 - r0, k=1)
                d = hamming64(hs_seg[sel][ia], hs_seg[sel][ib])
                keep = d <= maxd
                if keep.any():
                    a_, b_ = ids_seg[sel][ia[keep]], ids_seg[sel][ib[keep]]
                    lo = np.minimum(a_, b_)
                    hi = np.maximum(a_, b_)
                    pa_.append(lo)
                    pb_.append(hi)
                    pd_.append(d[keep])
        if not pa_:
            return None
        a_ = np.concatenate(pa_)
        b_ = np.concatenate(pb_)
        d_ = np.concatenate(pd_)
        # a pair can surface from several sub-chunks: keep one copy
        pairs2 = np.stack([a_, b_], axis=1)
        _, first = np.unique(pairs2, axis=0, return_index=True)
        return a_[first], b_[first], d_[first]

    def part_pairs(g: pd.DataFrame, maxd: int = max_distance) -> pd.DataFrame:
        # SEGMENTED bucket scan over the whole hash partition: one sort,
        # then numpy slices per bucket run — a groupby on the raw bucket
        # value would pay a Python/pandas callback per DISTINCT BUCKET
        # (up to 4·2^16 of them)
        g = g.sort_values(["bucket", "doc_id"], kind="mergesort")
        bk = g["bucket"].to_numpy()
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        _, starts = np.unique(bk, return_index=True)
        bounds = np.append(starts, len(bk))
        out_a, out_b, out_d = [], [], []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            if s1 - s0 < 2:
                continue
            c_idx = int(bk[s0]) >> 16
            # sub-split needs ≥1 bit per sub-chunk over the remaining bits
            if (
                s1 - s0 > SIMHASH_SUB_BUCKET_THRESHOLD
                and 0 < maxd < 64 - widths[c_idx]
            ):
                sub = _sub_bucket_pairs(ids[s0:s1], hs[s0:s1], c_idx, maxd)
                if sub is not None:
                    out_a.append(sub[0])
                    out_b.append(sub[1])
                    out_d.append(sub[2])
                continue
            ia, ib = np.triu_indices(s1 - s0, k=1)
            d = hamming64(hs[s0:s1][ia], hs[s0:s1][ib])
            keep = d <= maxd  # filter inside the bucket
            if keep.any():
                out_a.append(ids[s0:s1][ia[keep]])
                out_b.append(ids[s0:s1][ib[keep]])
                out_d.append(d[keep])
        if not out_a:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "distance": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "distance": np.concatenate(out_d),
            }
        )

    pairs = (
        sigs.map_batches(chunk_rows, batch_format="pandas")
        .groupby("_part")
        .map_groups(part_pairs, batch_format="pandas")
    )
    return _dedup_pairs(pairs, extra_cols=["distance"])


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def rp_lsh_candidate_pairs(
    ds: ray.data.Dataset,
    n_tables: int = 16,
    n_bits: int = 4,
    seed: int = 23,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Random-hyperplane LSH candidate pairs for cosine near-dup: each of
    ``n_tables`` bands hashes a vector to the sign pattern of ``n_bits``
    projections; same-bucket vectors pair up. The shuffle moves only
    (table, bucket, vec_id) int rows — never embeddings. P(candidate) for a
    pair at cosine s is 1-(1-p^b)^L with p = 1-arccos(s)/π.

    PARAMETER RULE (matters!): hyperplane LSH only PRUNES when the target
    threshold is high — at s=0.9, p≈0.86, so n_bits=12 keeps signal recall
    ≈1 over a handful of tables while random pairs (p≈0.5) collide w.p.
    2^-12. Near the random baseline (s≈0.45, p≈0.65) no (b, L) separates
    signal from noise, and small b floods the verify stage with ~n²·2^-b
    candidates. The defaults (b=4, L=16) are the catch-everything setting
    for SMALL correctness corpora; production near-dup at 0.8-0.95 should
    use n_bits≈12, n_tables≈8 (see test_rp_lsh_production_regime)."""
    planes: np.ndarray | None = None  # lazily sized to the embedding dim

    def band_rows(t: pa.Table) -> pa.Table:
        nonlocal planes
        from .simsearch import _emb_matrix, _normalize

        if len(t) == 0:
            # must not fall through: an empty FIRST batch would lazily size
            # `planes` to dim 0 and poison every later batch in this worker
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        vecs = _normalize(_emb_matrix(t, emb_col))
        if planes is None:
            r = np.random.RandomState(seed)
            planes = r.randn(n_tables * n_bits, vecs.shape[1])
        bits = (vecs @ planes.T) > 0  # (n, L*b)
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy()
        tables, hashes, out_ids = [], [], []
        for ti in range(n_tables):
            chunk = bits[:, ti * n_bits : (ti + 1) * n_bits]
            hashes.append(chunk @ weights)
            tables.append(np.full(len(ids), ti, np.int32))
            out_ids.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(tables)),
                "band_hash": pa.array(np.concatenate(hashes)),
                "doc_id": pa.array(np.concatenate(out_ids)),
            }
        )

    P = _shuffle_blocks() * 4

    def banded(t: pa.Table) -> pa.Table:
        out = band_rows(t)
        h = _mix_band_hash(
            out.column("band").to_numpy(), out.column("band_hash").to_numpy()
        )
        return out.append_column(
            "_part", pa.array((h % np.uint64(P)).astype(np.int32))
        )

    pairs = (
        ds.map_batches(banded, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: _segmented_bucket_pairs(g, star_only=False),
            batch_format="pandas",
        )
    )
    # coalesce the per-group mini-blocks like the MinHash twin does — the
    # downstream cosine verify pays per-task overhead per block otherwise
    return _dedup_pairs(pairs).repartition(_shuffle_blocks())


def verify_cosine_pairs(
    pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine for candidate pairs, fully distributed: the same
    two-stage co-partitioned vectorized join as verify_jaccard_pairs, with
    the same size-gated broadcast semi-join prune (skipped past
    BROADCAST_PAIR_LIMIT — the in-bucket join then drops non-candidate
    vectors itself, no driver id gather); the fixed vector dimension makes
    the final per-pair dot product ONE einsum over the whole partition."""
    P = _shuffle_blocks() * 4
    pairs, small = _broadcast_prune_ok(pairs)
    if small:
        ds = _semi_join_ids(ds, _candidate_id_set(pairs), id_col)

    def side_rows(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("b"), pa.int64()).to_numpy()
        key = np.concatenate([a, b])
        return pa.table(
            {
                "key": pa.array(key),
                "_part": pa.array((key.astype(np.uint64) % np.uint64(P)).astype(np.int32)),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
                "vec": pa.nulls(2 * len(t), pa.list_(pa.float64())),
            }
        )

    def vec_rows(t: pa.Table) -> pa.Table:
        from .simsearch import _emb_matrix, _normalize

        vecs = _normalize(_emb_matrix(t, emb_col))
        n, dim = vecs.shape
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * dim, pa.int32())
        lst = pa.ListArray.from_arrays(offsets, pa.array(vecs.ravel(), pa.float64()))
        key = pc.cast(t.column(id_col), pa.int64()).to_numpy()
        return pa.table(
            {
                "key": pa.array(key),
                "_part": pa.array((key.astype(np.uint64) % np.uint64(P)).astype(np.int32)),
                "a": pa.array(np.full(n, -1, np.int64)),
                "b": pa.array(np.full(n, -1, np.int64)),
                "vec": lst,
            }
        )

    unioned = pairs.map_batches(side_rows, batch_format="pyarrow").union(
        ds.map_batches(vec_rows, batch_format="pyarrow")
    )

    _EMPTY_VSIDED = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "vec": pa.array([], pa.list_(pa.float64())),
        }
    )

    def attach_part(g: pa.Table) -> pa.Table:
        is_vec = pc.equal(g.column("a"), -1)
        vec = g.filter(is_vec)
        pair = g.filter(pc.invert(is_vec))
        if vec.num_rows == 0 or pair.num_rows == 0:
            return _EMPTY_VSIDED
        dk = vec.column("key").to_numpy()
        order = np.argsort(dk, kind="stable")
        dks = dk[order]
        pk = pair.column("key").to_numpy()
        idx = np.clip(np.searchsorted(dks, pk), 0, len(dks) - 1)
        hit = dks[idx] == pk
        if not hit.any():
            return _EMPTY_VSIDED
        pair = pair.filter(pa.array(hit))
        gathered = vec.column("vec").combine_chunks().take(
            pa.array(order[idx[hit]], pa.int64())
        )
        side = pc.cast(pc.equal(pair.column("b"), pair.column("key")), pa.int8())
        return pa.table(
            {"a": pair.column("a"), "b": pair.column("b"), "side": side, "vec": gathered}
        )

    sided = (
        unioned.groupby("_part")
        .map_groups(attach_part, batch_format="pyarrow")
        .repartition(_shuffle_blocks())
    )

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        h = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) ^ b.astype(np.uint64)
        return t.append_column("_p2", pa.array((h % np.uint64(P)).astype(np.int32)))

    def cos_part(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
                "sim_raw": pa.array([], pa.float64()),
            }
        )
        n = g.num_rows
        if n == 0:
            return empty
        a = g.column("a").to_numpy()
        b = g.column("b").to_numpy()
        side = g.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, b, a))
        a, b, side = a[order], b[order], side[order]
        vecs = g.column("vec").combine_chunks().take(pa.array(order, pa.int64()))
        offs = vecs.offsets.to_numpy()
        vals = vecs.values.to_numpy(zero_copy_only=False)
        dup = np.zeros(n, dtype=bool)
        if n > 1:
            dup[1:] = (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (side[1:] == side[:-1])
        keep_idx = np.nonzero(~dup)[0]
        a, b = a[keep_idx], b[keep_idx]
        m = len(keep_idx)
        new_pair = np.ones(m, dtype=bool)
        if m > 1:
            new_pair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(new_pair)[0]
        lens = np.diff(np.append(starts, m))
        good = starts[lens == 2]
        if not len(good):
            return empty
        dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        i0 = keep_idx[good]
        i1 = keep_idx[good + 1]
        va = vals[offs[i0][:, None] + np.arange(dim)]
        vb = vals[offs[i1][:, None] + np.arange(dim)]
        raw = np.einsum("ij,ij->i", va, vb)
        return pa.table(
            {
                "id_a": pa.array(a[good], pa.int64()),
                "id_b": pa.array(b[good], pa.int64()),
                "sim": pa.array(round_half_away(raw), pa.float64()),
                "sim_raw": pa.array(raw, pa.float64()),
            }
        )

    return (
        sided.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(cos_part, batch_format="pyarrow")
    )


def embedding_neardup_lsh(
    ds: ray.data.Dataset,
    threshold: float = 0.45,
    n_tables: int = 16,
    n_bits: int = 4,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Scale-path cosine near-dup: random-hyperplane LSH candidates (slim
    shuffle) → distributed exact-cosine verify → threshold filter. Nothing
    materializes on the driver and no full-matrix broadcast — this is the
    10^9-vector shape; embedding_neardup_pairs stays as the exactness
    baseline."""
    cand = rp_lsh_candidate_pairs(
        ds, n_tables=n_tables, n_bits=n_bits, id_col=id_col
    ).materialize()  # verify reads it twice (id set + pair sides)
    verified = verify_cosine_pairs(cand, ds, id_col=id_col)
    # threshold on the RAW cosine (matching the SQL oracle and the exact
    # broadcast baseline); rounded column is the reported one
    return verified.map_batches(
        lambda t, th=threshold: t.filter(
            pc.greater(t.column("sim_raw"), th)
        ).drop_columns(["sim_raw"]),
        batch_format="pyarrow",
    )


def embedding_neardup_pairs(
    ds: ray.data.Dataset, threshold: float = 0.9, id_col: str = "vec_id"
) -> ray.data.Dataset:
    """All pairs (a < b) with cosine similarity > threshold.

    Full embedding matrix is broadcast ONCE via ray.put; each batch does one
    float64 matmul against it (never a per-row loop, never reshipped per
    batch). O(n²) compute but O(n) shuffle — the labeled EXACTNESS BASELINE
    (building the broadcast matrix inherently gathers all embeddings);
    embedding_neardup_lsh above is the 10^9-vector path.
    """
    _empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )
    all_df = ds.to_pandas()
    if not len(all_df):  # np.stack needs >=1 array
        return ray.data.from_arrow(_empty)
    ids_all = all_df[id_col].to_numpy()
    mat = np.stack(all_df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _empty
            from .simsearch import _emb_matrix

            ids = t.column(id_col).to_numpy()
            vecs = _emb_matrix(t, "embedding")  # zero-copy, not to_pylist
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vecs @ self.mat.T
            ri, ci = np.nonzero(sims > threshold)
            a, b = ids[ri], self.ids_all[ci]
            keep = a < b
            return pa.table(
                {
                    "id_a": pa.array(a[keep], pa.int64()),
                    "id_b": pa.array(b[keep], pa.int64()),
                    "sim": pa.array(round_half_away(sims[ri, ci][keep])),
                }
            )

    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=(2, 8), num_cpus=0.5)
