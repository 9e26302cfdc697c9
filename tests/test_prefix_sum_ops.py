"""Edge coverage for the distributed-prefix-sum corpus ops: sparse /
non-contiguous doc_ids and single-range degenerate inputs must still match
a sequential pandas reference exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from tinyetl_ray.pipelines.corpus import (
    PACK_TOKEN_BUDGET,
    dedup_incremental_ds,
    pack_sequences_ds,
    sample_ds,
    shuffle_rank_ds,
    SAMPLE_MOD,
    SHUFFLE_MULT,
)


def _docs(ids, texts):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.asarray(ids, np.int64), "text": texts})
    )


@pytest.mark.parametrize(
    "ids",
    [
        [0, 1, 2, 3, 4, 5, 6, 7],
        [3, 17, 4096, 4097, 99999],  # sparse, straddles range partitions
        [12345],  # single doc, single range
    ],
)
def test_pack_sequences_matches_sequential(ray_session, ids):
    texts = [f"tok {' x' * (i % 7)}" for i in range(len(ids))]
    out = (
        pack_sequences_ds(_docs(ids, texts), budget=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = pd.DataFrame(
        {"doc_id": np.asarray(ids, np.int64), "n_tokens": [len(t.split()) for t in texts]}
    ).sort_values("doc_id").reset_index(drop=True)
    ref["pack_id"] = (ref["n_tokens"].cumsum() - ref["n_tokens"]) // 5
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


@pytest.mark.parametrize("ids", [[0, 1, 2, 3], [7, 70, 700, 7000, 70000]])
def test_shuffle_rank_matches_sequential(ray_session, ids):
    out = (
        shuffle_rank_ds(_docs(ids, ["t"] * len(ids)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    key = (np.asarray(ids, np.uint64) * np.uint64(SHUFFLE_MULT)) % np.uint64(SAMPLE_MOD)
    ref = pd.DataFrame({"doc_id": np.asarray(ids, np.int64), "_key": key.astype(np.int64)})
    ref = ref.sort_values(["_key", "doc_id"], kind="mergesort").reset_index(drop=True)
    ref["shuffle_rank"] = np.arange(len(ref), dtype=np.int64)
    ref = ref[["doc_id", "shuffle_rank"]].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # ranks are a permutation
    assert sorted(out["shuffle_rank"]) == list(range(len(ids)))


def test_sample_without_lang_column(ray_session):
    out = sample_ds(_docs(range(1000), ["t"] * 1000)).to_pandas()
    # default 20% gate: deterministic, roughly a fifth, doc_id only
    assert list(out.columns) == ["doc_id"]
    assert 100 < len(out) < 320
    again = sample_ds(_docs(range(1000), ["t"] * 1000)).to_pandas()
    assert out["doc_id"].tolist() == again["doc_id"].tolist()  # reproducible


def test_dedup_incremental_all_new(ray_session):
    new = _docs([1, 2], ["aa", "bb"])
    old = _docs([9], ["zz"])
    got = sorted(dedup_incremental_ds(new, old).to_pandas()["doc_id"])
    assert got == [1, 2]
