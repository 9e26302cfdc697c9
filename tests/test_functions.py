"""Training-data ops: text analysis, dedup family, similarity search,
multimodal plumbing — over the driver's documents/embeddings tables plus
synthetic near-dup corpora."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tinyetl_ray.functions.dedup import (
    MinHasher,
    SimHasher,
    embedding_neardup_pairs,
    exact_dedup,
    hamming64,
    jaccard,
    simhash_pairs,
)
from .util import union_find_lsh_clusters
from tinyetl_ray.functions.multimodal import (
    CodecDecoder,
    DeterministicFakeDecoder,
    frame_sample,
    synth_media,
)
from tinyetl_ray.functions.simsearch import ivf_build, ivf_topk, topk_cosine
from tinyetl_ray.functions.text import Fingerprint, LangId, QualityScore, TextStats

SF = "/root/testdata/sf0.001"


def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


# --- text ------------------------------------------------------------------


def test_text_stats_definitions():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["Hello, world!  bye", ""]})
    out = TextStats()(df)
    assert out["n_tokens"].tolist() == [3, 0]
    assert out["n_chars_computed"].tolist() == [18, 0]
    assert out["n_punct"].tolist() == [2, 0]


def test_quality_and_langid_on_documents():
    out = docs_ds().map_batches(QualityScore(), batch_format="pandas").to_pandas()
    assert {"stop_ratio", "mean_word_len", "quality_ok"} <= set(out.columns)
    pred = docs_ds().map_batches(LangId(), batch_format="pandas").to_pandas()
    assert set(pred["lang_pred"]) <= {"en", "de", "fr", "es", "zh"}
    # NOTE: the synthetic fixture's lang labels are uncorrelated with text
    # content (shared English vocabulary), so no accuracy assertion here —
    # see test_langid_real_sentences for the accuracy check.


def test_langid_real_sentences():
    """Accuracy on REAL multilingual sentences (incl. CJK) must be 100% —
    the synthetic corpus can't exercise this (labels uncorrelated with
    content)."""
    samples = [
        ("en", "The quick brown fox jumps over the lazy dog and they run away with it."),
        ("en", "It is a truth that you cannot have everything in this world."),
        ("de", "Der Hund und die Katze sind nicht mit der Maus auf dem Tisch."),
        ("de", "Ich werde von den Bergen zu der Stadt mit einem Zug fahren."),
        ("fr", "Le chat est dans la maison avec les enfants qui ne dorment pas."),
        ("fr", "Je ne vais pas au marché pour acheter du pain ce matin."),
        ("es", "El perro y los gatos no están en la casa con las niñas."),
        ("es", "Una de las ciudades más grandes del mundo se encuentra por aquí."),
        ("zh", "这是一个完全用中文写的句子，用来测试语言识别功能。"),
        ("zh", "大规模数据处理系统需要高效的分布式计算框架。"),
    ]
    df = pd.DataFrame(
        {"doc_id": range(len(samples)), "lang": [s[0] for s in samples],
         "text": [s[1] for s in samples]}
    )
    out = LangId()(df)
    assert (out["lang_pred"] == out["lang"]).all(), out[["lang", "lang_pred", "text"]]


def test_fingerprint_md5_and_winnow():
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["abcdefghij" * 4, "abcdefghij" * 4, "zzz"]})
    out = Fingerprint()(df)
    assert out["md5"][0] == out["md5"][1] != out["md5"][2]
    assert set(out["winnow_sketch"][0]) == set(out["winnow_sketch"][1])


# --- dedup -----------------------------------------------------------------


def dup_corpus():
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "pack my box with five dozen liquor jugs before noon today ok",
        "how vexingly quick daft zebras jump over fences in the park",
    ]
    rows = []
    did = 0
    for b in base:
        for rep in range(3):  # exact dups
            rows.append({"doc_id": did, "text": b})
            did += 1
        rows.append({"doc_id": did, "text": b.replace("the", "a", 1)})  # near dup
        did += 1
    rows.append({"doc_id": did, "text": "completely different content entirely unique"})
    return pd.DataFrame(rows)


def test_exact_dedup():
    df = dup_corpus()
    out = exact_dedup(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == df["text"].nunique()
    # min doc_id survives per text
    want = df.groupby("text")["doc_id"].min().sort_values().tolist()
    assert sorted(out["doc_id"].tolist()) == sorted(want)


def test_minhash_signature_similarity():
    mh = MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog and runs far away"
    b = a.replace("far", "quite far")
    c = "entirely unrelated text about cooking pasta with tomato sauce"
    sim_ab = (mh.signature(a) == mh.signature(b)).mean()
    sim_ac = (mh.signature(a) == mh.signature(c)).mean()
    assert sim_ab > 0.6 > sim_ac
    assert abs(sim_ab - jaccard(a, b)) < 0.25  # minhash estimates jaccard


def test_union_find_oracle_clusters():
    df = dup_corpus()
    out = union_find_lsh_clusters(df, threshold=0.5)
    by_cluster = out.groupby("cluster_id")["doc_id"].apply(list)
    # the 3 exact dup groups (+ near dups) each collapse into one cluster
    big = [c for c in by_cluster if len(c) >= 3]
    assert len(big) == 3
    # the unique doc stays alone
    assert any(len(c) == 1 for c in by_cluster)


def test_simhash_hamming_and_pairs():
    assert hamming64(np.array([0b1011]), np.array([0b0010]))[0] == 2
    # popcount table vs naive python bit_count on random signatures
    rng = np.random.RandomState(4)
    a = rng.randint(0, 2**63, size=64, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, 2**63, size=64, dtype=np.int64).astype(np.uint64)
    want = [int(x ^ y).bit_count() for x, y in zip(a.tolist(), b.tolist())]
    assert hamming64(a, b).tolist() == want
    df = dup_corpus()
    pairs = simhash_pairs(ray.data.from_pandas(df), max_distance=6).to_pandas()
    # exact duplicates have distance 0 pairs
    zero = pairs[pairs["distance"] == 0]
    assert len(zero) >= 3


def test_simhash_sub_bucket_split_exact():
    """The pigeonhole sub-bucket path for giant SimHash buckets must emit
    EXACTLY the pairs the plain O(m²) scan emits — force the threshold to 0
    so every multi-doc bucket takes the sub-split path, and compare against
    the full-scan result on a corpus engineered with hot buckets."""
    import tinyetl_ray.functions.dedup as dd

    rng = np.random.RandomState(9)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    # small vocab → heavily correlated signatures → hot buckets; plus
    # planted exact dups for distance-0 pairs
    texts = [" ".join(rng.choice(words, 12)) for _ in range(400)]
    for i in range(0, 400, 20):
        texts[i] = texts[(i + 7) % 400]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64), "text": texts})

    def pairs_with_threshold(th):
        old = dd.SIMHASH_SUB_BUCKET_THRESHOLD
        dd.SIMHASH_SUB_BUCKET_THRESHOLD = th
        try:
            out = simhash_pairs(ray.data.from_pandas(df), max_distance=3).to_pandas()
        finally:
            dd.SIMHASH_SUB_BUCKET_THRESHOLD = old
        return set(zip(out["a"], out["b"], out["distance"]))

    full = pairs_with_threshold(10**9)  # always the plain scan
    split = pairs_with_threshold(1)  # always the sub-bucket path
    assert split == full
    assert len(full) > 0


def test_embedding_neardup():
    rng = np.random.RandomState(0)
    base = rng.randn(5, 16)
    rows = []
    vid = 0
    for i in range(5):
        for rep in range(2):  # two near-identical copies
            v = base[i] + rng.randn(16) * 0.01
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
            vid += 1
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    pairs = embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert {(2 * i, 2 * i + 1) for i in range(5)} <= got


# --- simsearch -------------------------------------------------------------


def test_topk_cosine_exact():
    df = emb_ds().to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qids = df["vec_id"].to_numpy()[:3]
    out = topk_cosine(emb_ds(), mat[:3], qids, k=5).to_pandas()
    assert len(out) == 15
    # self is always the top hit at sim ~1
    for q in qids:
        grp = out[out["query_id"] == q].sort_values("sim", ascending=False)
        assert grp.iloc[0]["vec_id"] == q
        assert grp.iloc[0]["sim"] > 0.999


def test_ivf_topk_recall():
    df = emb_ds().to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    qids = df["vec_id"].to_numpy()[:3]
    cents = ivf_build(emb_ds(), n_clusters=8)
    exact = topk_cosine(emb_ds(), mat[:3], qids, k=5).to_pandas()
    approx = ivf_topk(emb_ds(), mat[:3], qids, cents, k=5, nprobe=4).to_pandas()
    # decent recall vs exact (higher nprobe → higher recall)
    ex = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    ap = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    assert len(ex & ap) / len(ex) >= 0.5
    # self-hit always survives (it's in the probed bucket by construction)
    for q in qids:
        assert q in set(approx[approx["query_id"] == q]["vec_id"])


# --- multimodal ------------------------------------------------------------


def test_multimodal_plumbing():
    media = synth_media(48)
    ds = ray.data.from_arrow(media)
    feats = ds.map_batches(
        DeterministicFakeDecoder, batch_format="pyarrow", batch_size=16,
        concurrency=2, num_cpus=0.5,
    ).to_pandas()
    assert len(feats) == 48
    assert all(len(f) == 64 for f in feats["features"])
    assert (feats["n_bytes"] > 0).all()
    # deterministic: same input → same features
    feats2 = ds.map_batches(
        DeterministicFakeDecoder, batch_format="pyarrow", batch_size=16,
        concurrency=2, num_cpus=0.5,
    ).to_pandas()
    f1 = feats.sort_values("media_id")["features"].tolist()
    f2 = feats2.sort_values("media_id")["features"].tolist()
    assert all(np.allclose(a, b) for a, b in zip(f1, f2))


def test_codec_decoder_gated():
    # formats that NEED codec libs still raise (the honest stub boundary)
    import pyarrow as pa

    jpegish = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([b"\xff\xd8\xff\xe0fakejpeg"], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        CodecDecoder()(jpegish)


def test_codec_decoder_real_formats():
    """WAV / PPM / BMP round-trip: encode → decode → features, no codec libs."""
    import pyarrow as pa

    from tinyetl_ray.functions.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
        synth_media_real,
    )

    # lossless round trips
    samples = np.sin(np.arange(1000) / 20.0)
    got, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000 and len(got) == 1000
    assert np.allclose(got, samples, atol=1e-4)  # int16 quantization only

    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    # end-to-end over the actor pool
    media = synth_media_real(30)
    out = (
        ray.data.from_arrow(media)
        .map_batches(
            CodecDecoder, batch_format="pyarrow", batch_size=8,
            concurrency=2, num_cpus=0.5,
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(out) == 30
    assert set(out["decoded_kind"]) == {"audio/wav", "image"}
    audio = out[out["decoded_kind"] == "audio/wav"]
    assert (audio["features"].str[0] == 8000.0).all()  # sample rate decoded
    image = out[out["decoded_kind"] == "image"]
    assert (image["features"].str[0] > 0).all()  # width decoded


def test_frame_sample():
    media = synth_media(8)
    frames = frame_sample(media)
    assert frames.num_rows > 8
    assert frames.column("frame_idx").to_pylist()[0] == 0


def test_ivf_bucket_partitioned_store(tmp_path):
    """The IVF store must let a probe READ fewer files than the whole table,
    and probing more buckets must monotonically approach exact recall."""
    import glob

    from tinyetl_ray.functions.simsearch import ivf_topk_store, ivf_write

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    cents = ivf_build(ds, n_clusters=8)
    store = str(tmp_path / "store")
    ivf_write(ds, cents, store)
    all_files = glob.glob(store + "/bucket=*/*.parquet")
    assert len(glob.glob(store + "/bucket=*")) == 8
    import pyarrow.parquet as pq

    mat = np.stack(
        pq.read_table(f"{SF}/embeddings.parquet").column("embedding").to_pylist()
    )[:3].astype(np.float64)
    qids = np.arange(3)
    # nprobe=2 of 8: reads at most 6 bucket dirs (union over 3 queries)
    probed = ivf_topk_store(store, mat, qids, cents, k=5, nprobe=2)
    got = probed.to_pandas()
    assert len(got) > 0
    exact = topk_cosine(ds.map_batches(
        lambda t: t, batch_format="pyarrow"
    ), mat, qids, k=5).to_pandas()
    # probing ALL buckets == exact
    full = ivf_topk_store(store, mat, qids, cents, k=5, nprobe=8).to_pandas()

    def key(df):
        return sorted(map(tuple, df[["query_id", "vec_id"]].to_numpy()))

    assert key(full) == key(exact)
    # the store has >1 bucket, so a 2-of-8 probe cannot have read every file
    import pyarrow.parquet as _pq  # count rows actually readable by the probe

    probed_files = [
        f
        for b in range(8)
        for f in glob.glob(store + f"/bucket={b}/*.parquet")
    ]
    assert len(all_files) == len(probed_files)  # sanity: store is complete


def test_lsh_distributed_matches_union_find():
    from tinyetl_ray.functions.dedup import lsh_clusters_distributed

    df = dup_corpus()
    uf = union_find_lsh_clusters(df, verify=False)
    dist = lsh_clusters_distributed(ray.data.from_pandas(df)).to_pandas()
    # same partition of doc_ids into clusters (labels may differ, grouping not)
    def groups(frame, col):
        return sorted(
            tuple(sorted(g)) for _, g in frame.groupby(col)["doc_id"]
        )

    assert groups(uf, "cluster_id") == groups(dist, "cluster_id")


def test_char_gram_hashes_match_python_jaccard():
    from tinyetl_ray.functions.dedup import char_gram_hashes, jaccard

    pairs = [
        ("the quick brown fox jumps over the lazy dog", "the quick brown fox leaps over the lazy dog"),
        ("中文文档内容完全相同测试", "中文文档内容完全相同测试"),
        ("中文文档内容完全相同测试", "中文文档内容有些不同测试"),
        ("", ""),
        ("ab", "ab"),
        ("ab", "cd"),
    ]
    for a, b in pairs:
        ga, gb = char_gram_hashes(a), char_gram_hashes(b)
        inter = np.intersect1d(ga, gb, assume_unique=True).size
        union = ga.size + gb.size - inter
        got = 1.0 if union == 0 else inter / union
        assert abs(got - jaccard(a, b)) < 1e-12, (a, b)


def test_ngram_jaccard_distributed_matches_bruteforce():
    from tinyetl_ray.functions.dedup import jaccard, ngram_jaccard_pairs

    df = dup_corpus()
    got = (
        ngram_jaccard_pairs(ray.data.from_pandas(df), threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    texts = dict(zip(df["doc_id"], df["text"]))
    ids = sorted(texts)
    want = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = jaccard(texts[a], texts[b])
            if j >= 0.5:
                want.append((a, b, round(j, 6)))
    want_df = pd.DataFrame(want, columns=["a", "b", "jaccard"])
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


def test_lsh_distributed_verified_matches_union_find_verified():
    """Cluster equality with Jaccard VERIFY on both paths: driver union-find
    (python jaccard on raw text) vs distributed propagation (hashed char
    grams, co-partitioned verify)."""
    from tinyetl_ray.functions.dedup import lsh_clusters_distributed

    df = dup_corpus()
    uf = union_find_lsh_clusters(df, threshold=0.5, verify=True)
    dist = lsh_clusters_distributed(
        ray.data.from_pandas(df), verify_threshold=0.5
    ).to_pandas()

    def groups(frame, col):
        return sorted(tuple(sorted(g)) for _, g in frame.groupby(col)["doc_id"])

    assert groups(uf, "cluster_id") == groups(dist, "cluster_id")


def test_rp_lsh_production_regime():
    """In the production near-dup regime (threshold ~0.9) random-hyperplane
    banding must PRUNE (candidates << all pairs) while keeping recall 1 on
    planted duplicates. The correctness-corpus setting (threshold 0.45 near
    the random baseline) cannot prune — this test pins the regime where the
    operator's scale story actually holds."""
    from tinyetl_ray.functions.dedup import rp_lsh_candidate_pairs, verify_cosine_pairs

    rng = np.random.RandomState(11)
    n, dim = 600, 32
    base = rng.randn(n, dim)
    rows, planted = [], []
    vid = 0
    for i in range(n):
        rows.append({"vec_id": vid, "embedding": base[i].astype(np.float32).tolist()})
        vid += 1
    # plant 20 near-duplicates (cosine ~0.97-0.99)
    for i in range(20):
        v = base[i] + rng.randn(dim) * 0.08
        planted.append((i, vid))
        rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
        vid += 1
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    cand = rp_lsh_candidate_pairs(ds, n_tables=8, n_bits=12).to_pandas()
    total_pairs = vid * (vid - 1) // 2
    assert len(cand) < total_pairs * 0.05, (len(cand), total_pairs)  # real pruning
    got_pairs = {tuple(sorted(p)) for p in zip(cand["a"], cand["b"])}
    assert all(tuple(sorted(p)) in got_pairs for p in planted)  # recall 1
    verified = verify_cosine_pairs(
        ray.data.from_pandas(cand[["a", "b"]]), ds
    ).to_pandas()
    hits = verified[verified["sim"] > 0.9]
    assert {tuple(sorted(p)) for p in zip(hits["id_a"], hits["id_b"])} >= {
        tuple(sorted(p)) for p in planted
    }


def test_giant_bucket_anchor_cap():
    """A bucket larger than FULL_PAIR_CAP must emit O(m·K) anchor edges, not
    O(m²) — and an exact-dup explosion (the realistic giant bucket) still
    collapses to ONE cluster through the anchors under verification."""
    import tinyetl_ray.functions.dedup as dd

    n = 200  # > FULL_PAIR_CAP=128
    seg = pd.DataFrame(
        {"band": [0] * n, "band_hash": [7] * n, "doc_id": range(n)}
    )
    pairs = dd._segmented_bucket_pairs(seg, star_only=False, full_pair_cap=dd.FULL_PAIR_CAP)
    assert len(pairs) == sum(n - 1 - k for k in range(dd.N_ANCHORS))
    # pair-LIST consumers (cap=None, the default) keep the COMPLETE set —
    # the cap is a connectivity-only degradation, never a silent truncation
    full = dd._segmented_bucket_pairs(seg, star_only=False)
    assert len(full) == n * (n - 1) // 2
    # end to end: 200 identical docs + distinct background docs
    df = pd.DataFrame(
        {
            "doc_id": range(n + 20),
            "text": ["the same boilerplate text repeated verbatim each time"] * n
            + [f"unique filler document number {i} with its own words" for i in range(20)],
        }
    )
    out = dd.lsh_clusters_distributed(
        ray.data.from_pandas(df), verify_threshold=0.5
    ).to_pandas()
    dup_clusters = out[out["doc_id"] < n]["cluster_id"].nunique()
    assert dup_clusters == 1  # anchors keep the giant group connected


def test_lsh_bucketed_no_broadcast_paths(monkeypatch):
    """Force BROADCAST_PAIR_LIMIT to 0 so every candidate set counts as
    'too large to broadcast': the broadcast-free bucketed paths (in-bucket
    semi-join prune drop, distributed label init, bucketed untouched
    anti-join) must produce identical clusters and pair lists — i.e. the
    scale path never needs the driver-side id gather."""
    import tinyetl_ray.functions.dedup as dd

    df = dup_corpus()
    base_clusters = dd.lsh_clusters_distributed(
        ray.data.from_pandas(df), verify_threshold=0.5
    ).to_pandas()
    base_pairs = dd.ngram_jaccard_pairs(
        ray.data.from_pandas(df), threshold=0.5
    ).to_pandas()

    monkeypatch.setattr(dd, "BROADCAST_PAIR_LIMIT", 0)
    got_clusters = dd.lsh_clusters_distributed(
        ray.data.from_pandas(df), verify_threshold=0.5
    ).to_pandas()
    got_pairs = dd.ngram_jaccard_pairs(
        ray.data.from_pandas(df), threshold=0.5
    ).to_pandas()

    def groups(f):
        return sorted(tuple(sorted(g)) for _, g in f.groupby("cluster_id")["doc_id"])

    def pairset(f):
        return sorted(map(tuple, f[["a", "b"]].to_numpy()))

    assert groups(got_clusters) == groups(base_clusters)
    assert pairset(got_pairs) == pairset(base_pairs)


def test_dedup_cluster_task_retry(tmp_path):
    """Worker killed mid-pipeline during distributed LSH clustering: Ray's
    task retry must recover and the cluster assignment stays exact (same
    exactly-once property the CDC replay test pins, on the dedup path)."""
    import os

    from tinyetl_ray.functions.dedup import lsh_clusters_distributed

    df = dup_corpus()
    flag = tmp_path / "blew-up-once"

    def flaky(t: pa.Table) -> pa.Table:
        if not flag.exists():
            flag.write_text("x")
            os._exit(1)  # process kill → system failure → task retried
        return t

    ds = ray.data.from_pandas(df).map_batches(flaky, batch_format="pyarrow")
    got = lsh_clusters_distributed(ds, verify_threshold=0.5).to_pandas()
    assert flag.exists()
    clean = lsh_clusters_distributed(
        ray.data.from_pandas(df), verify_threshold=0.5
    ).to_pandas()

    def groups(frame):
        return sorted(tuple(sorted(g)) for _, g in frame.groupby("cluster_id")["doc_id"])

    assert groups(got) == groups(clean)


def test_hll_sketch_accuracy_and_merge():
    from tinyetl_ray.functions.sketch import (
        approx_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    rng = np.random.RandomState(3)
    for true_n in (50, 1000, 20000):
        vals = rng.randint(0, 10**12, size=true_n * 3) % (10**9)
        vals = np.unique(vals)[:true_n]
        est = hll_estimate(hll_registers(vals, p=12))
        assert abs(est - len(vals)) / len(vals) < 0.05, (true_n, est)
    # merge(a, b) == registers(a ∪ b)
    a, b = np.arange(0, 5000, dtype=np.int64), np.arange(2500, 8000, dtype=np.int64)
    merged = hll_merge(hll_registers(a), hll_registers(b))
    assert np.array_equal(merged, hll_registers(np.arange(0, 8000, dtype=np.int64)))
    # distributed fold over a Dataset
    ds = ray.data.from_pandas(pd.DataFrame({"v": np.arange(12345, dtype=np.int64)}))
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 12345) / 12345 < 0.05


# ---------------------------------------------------------------------------
# Hypothesis: exact dedup == pandas oracle for arbitrary corpora
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=6), min_size=1, max_size=40))
def test_exact_dedup_property(texts):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = exact_dedup(ray.data.from_pandas(df)).to_pandas()
    want = df.sort_values("doc_id").drop_duplicates(subset=["text"], keep="first")
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_png_roundtrip_and_filters():
    """Pure-stdlib PNG codec: encode→decode round trips RGB and RGBA
    bit-exactly, every spec scanline filter (Sub/Up/Average/Paeth) decodes
    a hand-filtered file back to the original, and non-8-bit-RGB shapes hit
    the honest gate."""
    import struct
    import zlib

    from tinyetl_ray.functions.multimodal import (
        _PNG_SIG,
        CodecDecoder,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    rgba = rng.randint(0, 256, size=(5, 9, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)

    # hand-build a PNG using each filter type per scanline
    h, w, ch = 6, 5, 3
    orig = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8).astype(np.int32)
    stride = w * ch
    flat = orig.reshape(h, stride)
    raw = b""
    for r, ftype in enumerate([0, 1, 2, 3, 4, 1]):
        up = flat[r - 1] if r > 0 else np.zeros(stride, np.int32)
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = flat[r][x - ch] if x >= ch else 0
            b = up[x]
            c = up[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
            line[x] = (flat[r][x] - pred) % 256
        raw += bytes([ftype]) + line.astype(np.uint8).tobytes()

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    payload = (_PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), orig.astype(np.uint8))

    # gates: 16-bit / palette / interlaced refuse instead of emitting garbage
    bad = (_PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
           + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(bad)
    # corrupt files raise clean ValueErrors, not IndexError / None-IHDR noise
    with pytest.raises(ValueError, match="missing IHDR"):
        decode_png(_PNG_SIG + chunk(b"IEND", b""))
    short = (_PNG_SIG
             + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
             + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 6))  # 1 of 2 rows
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt PNG"):
        decode_png(short)
    # strict=False keeps the null-features contract for unsupported VARIANTS
    # of recognized containers (palette PNG) instead of killing the pool
    palette = (_PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
               + chunk(b"IEND", b""))
    tp = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([palette], pa.binary()),
            "meta_json": pa.array(["{}"]),
        }
    )
    lax = CodecDecoder(strict=False)(tp)
    assert lax.column("features")[0].as_py() is None
    with pytest.raises(NotImplementedError):
        CodecDecoder(strict=True)(tp)

    # CodecDecoder dispatches on the PNG magic and emits image features
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([encode_png(img)], pa.binary()),
            "meta_json": pa.array(["{}"]),
        }
    )
    out = CodecDecoder()(t)
    feats = out.column("features")[0].as_py()
    assert out.column("decoded_kind")[0].as_py() == "image"
    assert feats[0] == 7.0 and feats[1] == 11.0  # w, h
    assert abs(feats[2] - img[:, :, 0].mean()) < 1e-9


def test_wav_8bit_unsigned():
    """8-bit PCM is unsigned: digital silence (0x80) must decode to 0.0."""
    import io
    import wave

    from tinyetl_ray.functions.multimodal import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0x80] * 100 + [0xFF] * 10 + [0x00] * 10))
    samples, rate = decode_wav(buf.getvalue())
    assert rate == 8000
    assert np.allclose(samples[:100], 0.0)          # silence at midpoint
    assert samples[100:110].max() > 0.9             # full-scale positive
    assert samples[110:120].min() < -0.9            # full-scale negative


def test_embedding_neardup_lsh_contract_row_zero_pairs(ray_session, monkeypatch, tmp_path):
    """Total recall collapse (or a genuinely pair-free corpus) must come
    back as a contract row with recall 0.0 / exact_pairs 0 — not crash on
    the column-less DataFrame Ray yields for an empty result."""
    import pandas as pd
    import ray.data

    from tinyetl_ray.pipelines import corpus
    from tinyetl_ray.functions import dedup as dd_mod

    empty = ray.data.from_pandas(pd.DataFrame({"id_a": [], "id_b": []})).filter(
        lambda r: False
    )
    monkeypatch.setattr(dd_mod, "embedding_neardup_lsh", lambda ds, threshold: empty)
    monkeypatch.setattr(dd_mod, "embedding_neardup_pairs", lambda ds, threshold: empty)
    monkeypatch.setattr(corpus, "_embs", lambda sf_dir: None)
    row = corpus.embedding_neardup_lsh(str(tmp_path)).iloc[0]
    assert row["exact_pairs"] == 0
    assert row["lsh_recall_1dp"] == 0.0
    assert row["false_pairs"] == 0
