"""Round-5 review hardening of cli/schema/dbapi_fake/multimodal/entry:
YAML same-indent lists and inline comments, type-position-only DDL
rewrites, post-success statement logging, symmetric null schema
evolution, PPM maxval gate, frame_sample zero-frame contract, and
scoped oracle-artifact wipes."""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# --- _mini_yaml ---------------------------------------------------------------


def test_mini_yaml_same_indent_list_items():
    from tinyetl_ray.cli import _mini_yaml

    spec = _mini_yaml("columns:\n- name: id\n  type: int64\n- name: v\n  type: float64\n")
    assert spec == {
        "columns": [
            {"name": "id", "type": "int64"},
            {"name": "v", "type": "float64"},
        ]
    }


def test_mini_yaml_indented_list_still_works():
    from tinyetl_ray.cli import _mini_yaml

    spec = _mini_yaml("columns:\n  - name: id\n    type: int64\n")
    assert spec == {"columns": [{"name": "id", "type": "int64"}]}


def test_mini_yaml_inline_comments():
    from tinyetl_ray.cli import _mini_yaml

    spec = _mini_yaml(
        "truncate: false  # do not wipe\npreview: 10  # rows\nname: 'a # keep'\n"
    )
    assert spec["truncate"] is False  # was the truthy string 'false  # ...'
    assert spec["preview"] == 10
    assert spec["name"] == "a # keep"


def test_mini_yaml_key_after_same_indent_list():
    from tinyetl_ray.cli import _mini_yaml

    spec = _mini_yaml("files:\n- a.csv\n- b.csv\ntruncate: true\n")
    assert spec == {"files": ["a.csv", "b.csv"], "truncate": True}


# --- fake DBAPI: type-position rewrites, post-success logging ----------------


def test_fake_dbapi_column_named_datetime_survives(tmp_path):
    from tinyetl_ray.sources import dbapi_fake

    db = str(tmp_path / "f.db")
    conn = dbapi_fake.connect(db, "format")
    cur = conn.cursor()
    cur.execute("CREATE TABLE t (datetime DATETIME, bit BIT, v DOUBLE PRECISION)")
    cur.execute("INSERT INTO t (datetime, bit, v) VALUES (%s, %s, %s)", ("x", 1, 2.5))
    conn.commit()
    assert cur.execute("SELECT datetime, bit, v FROM t").fetchall() == [("x", 1, 2.5)]
    conn.close()


def test_fake_dbapi_decimal_type_still_rewritten(tmp_path):
    from tinyetl_ray.sources import dbapi_fake

    db = str(tmp_path / "g.db")
    conn = dbapi_fake.connect(db, "format")
    cur = conn.cursor()
    cur.execute("CREATE TABLE m (bal DECIMAL(18,2), ts TIMESTAMP WITH TIME ZONE)")
    cur.execute("INSERT INTO m (bal, ts) VALUES (%s, %s)", ("1.25", "2021"))
    conn.commit()
    ddl = sqlite3.connect(db).execute(
        "SELECT sql FROM sqlite_master WHERE name='m'"
    ).fetchone()[0]
    assert "DECIMAL" not in ddl and "TEXT" in ddl
    conn.close()


def test_fake_dbapi_failed_statement_not_logged(tmp_path):
    from tinyetl_ray.sources import dbapi_fake

    db = str(tmp_path / "h.db")
    conn = dbapi_fake.connect(db, "format")
    cur = conn.cursor()
    cur.execute("CREATE TABLE t (id INTEGER PRIMARY KEY)")
    with pytest.raises(Exception):
        cur.executemany("INSERT INTO missing_table VALUES (%s)", [(1,), (2,)])
    conn.commit()
    logged = [sql for sql, _, _ in dbapi_fake.statement_log(db)]
    assert not any("missing_table" in s for s in logged)
    conn.close()


# --- schema.evolve: symmetric null exemption ---------------------------------


def test_evolve_null_first_adopts_later_type():
    from tinyetl_ray.schema import evolve

    base = pa.schema([("conv_id", pa.string()), ("model", pa.null())])
    extra = pa.schema([("conv_id", pa.string()), ("model", pa.string())])
    out = evolve(base, extra)
    assert out.field("model").type == pa.string()
    # and the established direction still holds
    out2 = evolve(extra, base)
    assert out2.field("model").type == pa.string()


def test_evolve_still_rejects_real_type_change():
    from tinyetl_ray.schema import evolve

    base = pa.schema([("x", pa.int64())])
    extra = pa.schema([("x", pa.string())])
    with pytest.raises(TypeError):
        evolve(base, extra)


# --- multimodal: maxval gate, zero-frame contract ----------------------------


def test_decode_ppm_16bit_maxval_raises():
    from tinyetl_ray.functions.multimodal import decode_ppm

    payload = b"P6\n4 4\n65535\n" + b"\x00" * (4 * 4 * 6)
    with pytest.raises(NotImplementedError):
        decode_ppm(payload)


def test_frame_sample_small_payload_zero_frames():
    from tinyetl_ray.functions.multimodal import frame_sample

    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([b"", b"x" * 16, b"y" * 17], pa.binary()),
        }
    )
    out = frame_sample(t, every=32, frame=16)
    # oracle formula (n_bytes-17)//32+1: 0, 0, 1 frames — and the one
    # emitted frame is a FULL 16 bytes
    assert out.column("media_id").to_pylist() == [3]
    assert len(out.column("frame").to_pylist()[0]) == 16


# --- oracle artifacts: scoped wipe preserves the ivf_store --------------------


def test_artifact_wipe_preserves_ivf_store(tmp_path, ray_session):
    import __ray_entry__ as e
    from tinyetl_ray.pipelines.corpus import oracle_art_dir

    sf = str(tmp_path / "sfx")
    os.makedirs(sf)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(30, dtype=np.int64)),
            "text": pa.array(
                ["the quick brown fox %d jumps over the lazy dog" % (i % 7)
                 for i in range(30)]
            ),
            "lang": pa.array(["en"] * 30),
            "source": pa.array(["s"] * 30),
        }
    )
    pq.write_table(docs, os.path.join(sf, "documents.parquet"))

    ivf = oracle_art_dir(sf, "ivf_store")
    os.makedirs(ivf, exist_ok=True)
    sentinel = os.path.join(ivf, "bucket-000.parquet")
    open(sentinel, "w").write("keep me")
    # stale sigs with NO vouching marker: the wipe must clear them but
    # leave the self-validating ivf_store alone
    sigs = oracle_art_dir(sf, "simhash_sigs")
    os.makedirs(sigs, exist_ok=True)
    open(os.path.join(sigs, "stale.parquet"), "w").write("stale")

    key = f"{sf}|{e._corpus_fingerprint(sf)}"
    e._ART_ATTEMPTED.discard(key)
    e._ensure_oracle_artifacts(sf)

    assert os.path.exists(sentinel) and open(sentinel).read() == "keep me"
    import glob as g

    # stale file regenerated (name differs), and the marker now vouches
    assert not os.path.exists(os.path.join(sigs, "stale.parquet"))
    assert g.glob(os.path.join(sigs, "*.parquet"))
    assert g.glob(os.path.join(oracle_art_dir(sf, "lsh_edges"), "*.parquet"))
    marker = os.path.join(oracle_art_dir(sf, ""), "_fingerprint")
    assert open(marker).read() == e._corpus_fingerprint(sf)


# --- third-pass review: dedup/simsearch/text oracle-fidelity fixes -----------


def test_round_half_away_matches_duckdb():
    import duckdb

    from tinyetl_ray.functions.dedup import round_half_away

    vals = [65 / 128, -65 / 128, 3 / 256, 0.0, 1.0]
    got = round_half_away(np.array(vals)).tolist()
    # CAST AS DOUBLE: the oracle rounds float64 COLUMNS (a bare literal
    # would be parsed as DECIMAL and rounded decimal-exact instead)
    want = [
        float(duckdb.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6)").fetchone()[0])
        for v in vals
    ]
    assert got == want  # np.round would give 0.507812 for 65/128


def test_ngram_jaccard_null_text_never_pairs(ray_session):
    import ray.data

    from tinyetl_ray.functions.dedup import ngram_jaccard_pairs

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [None, None, "", "", "abcdefghij", "abcdefghij"],
        }
    )
    out = ngram_jaccard_pairs(
        ray.data.from_pandas(df), threshold=0.5
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    # NULL docs (0,1) never pair — matches the SQL oracle where
    # length(NULL) yields zero grams; empty-string docs (2,3) DO pair
    # (both sides generate the single short gram), as do the twins (4,5)
    assert pairs == {(2, 3), (4, 5)}


def test_minhash_negative_doc_id_rejected(ray_session):
    import ray.data

    from tinyetl_ray.functions.dedup import lsh_candidate_pairs

    df = pd.DataFrame({"doc_id": [-1, 2], "text": ["abcdef", "abcdef"]})
    with pytest.raises(Exception, match="non-negative"):
        lsh_candidate_pairs(ray.data.from_pandas(df)).materialize()


def test_lsh_bands_validated():
    import ray.data

    from tinyetl_ray.functions.dedup import lsh_candidate_pairs

    df = pd.DataFrame({"doc_id": [1], "text": ["abc"]})
    with pytest.raises(ValueError, match="bands"):
        lsh_candidate_pairs(ray.data.from_pandas(df), num_perm=128, bands=256)
    with pytest.raises(ValueError, match="bands"):
        lsh_candidate_pairs(ray.data.from_pandas(df), num_perm=128, bands=48)


def test_ivf_build_empty_raises(ray_session):
    import ray.data

    from tinyetl_ray.functions.simsearch import ivf_build

    empty = ray.data.from_pandas(
        pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                      "embedding": pd.Series([], dtype="object")})
    )
    with pytest.raises(ValueError, match="empty"):
        ivf_build(empty)


def test_text_stats_ascii_whitespace_tokens():
    from tinyetl_ray.functions.text import TextStats

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b"]})
    out = TextStats()(df)
    # NBSP is NOT a token separator under the oracle's ASCII \s — one token
    assert out["n_tokens"].tolist() == [1, 2]


def test_quality_score_ascii_words():
    from tinyetl_ray.functions.text import QualityScore

    assert QualityScore().word_re.findall("café über ok") == ["caf", "ber", "ok"]


# --- property tests pinning the third-pass fixes ------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.sampled_from(list('ab,"\n x')), max_size=8
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=0,
        max_size=6,
    )
)
def test_csv_count_matches_csv_module(tmp_path_factory, rows):
    """Quote-parity record counting == what csv.writer/csv.reader agree on,
    for arbitrary content including embedded quotes/newlines/commas."""
    import csv as _csv

    from tinyetl_ray.sources.io import count_written_rows

    d = tmp_path_factory.mktemp("csvprop")
    p = str(d / "t.csv")
    width = max((len(r) for r in rows), default=1)
    norm = [r + [""] * (width - len(r)) for r in rows]
    with open(p, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow([f"c{i}" for i in range(width)])
        w.writerows(norm)
    assert count_written_rows(p, "csv") == len(norm)


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False
    )
)
def test_round_half_away_property(x):
    import duckdb

    from tinyetl_ray.functions.dedup import round_half_away

    got = float(round_half_away(np.array([x]))[0])
    want = float(
        duckdb.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE), 6)").fetchone()[0]
    )
    assert got == want
