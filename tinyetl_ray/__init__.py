"""tinyetl_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-imagination (NOT a port) of mjdescy/TinyETL's
zero-config source→transform→sink pipeline as a binlog/WAL-tail →
lake upserter over Parquet tables of multi-turn conversation
transcripts, built on ``ray.data.Dataset`` + ``map_batches`` over
zero-copy Arrow batches.

Reference behavior studied at /root/reference (TinyETL v0.10.0, Rust);
file:line citations in docstrings point there for parity checks.

Layout
------
schema.py           canonical transcript/change schemas + additive evolution
hashing.py          deterministic vectorized hashing (partitioning, dedup)
synth.py            deterministic generators (base table + change log)
stages/decode.py    change-batch decode/validate (cast, backfill, dead-letter)
stages/partition.py hash partitioner with turn-range salting for hot convs
stages/merge.py     vectorized LWW reduce + per-partition merge
stages/transform.py expression transform engine (TinyETL Lua parity)
stages/validate.py  declared-schema validator (pattern/default/required)
sources/io.py       extension-dispatched read/write (csv/json/parquet)
functions/text.py   token count, quality, lang-id, fingerprinting
functions/dedup.py  exact / minhash-LSH / simhash / ngram-jaccard / embedding
functions/simsearch.py  brute-force + LSH-bucketed cosine top-k
functions/multimodal.py binary-column plumbing with stubbed decoders
pipelines/cdc.py    the flagship replay pipeline (decode→partition→merge→COW sink)
state/manifest.py   idempotent per-partition commit manifests + LSN watermarks
"""

__version__ = "0.1.0"
