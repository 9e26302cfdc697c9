"""Benchmark harness: headline CDC replay throughput + scaling evidence.

Usage:
    python bench.py               # one JSON line, num_cpus=$RAY_GRAFT_CPUS (32)
    python bench.py --scaling     # same job at num_cpus=8 and 32 in fresh
                                  # processes; reports throughputs + efficiency

Input: $GRAFT_SF_DIR (default /root/testdata/sf0.1). The change log is
derived from the events table (same pure arithmetic the oracle checks) and
AMPLIFIED x{AMPLIFY} inside map_batches with lsn strides — deterministic,
streaming, no driver-side materialization. The headline pipeline is the
committed copy-on-write replay (decode → combiner → salted partition
shuffle → per-partition LWW merge → atomic snapshot + manifest commit).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

AMPLIFY = int(os.environ.get("TINYETL_BENCH_AMPLIFY", "20"))
WIDE_MULT = int(os.environ.get("TINYETL_BENCH_WIDE_MULT", "160"))
LSN_STRIDE = 100_000_000
# fixed across parallelism levels (SURVEY.md §4.3); the soak profile
# overrides to 256 so one partition's merge state stays worker-heap-sized
NUM_PARTITIONS = int(os.environ.get("TINYETL_BENCH_PARTITIONS", "64"))
WIDE_CHUNKS = 64  # input files ≥ max parallelism so the read never caps the pool


def _amplified_changes(sf_dir: str):
    import pyarrow as pa
    import ray.data

    from tinyetl_ray.synth import derive_changes_batch

    def amp(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(AMPLIFY):
            t = batch
            eid = t.column("event_id")
            import pyarrow.compute as pc

            t = t.set_column(
                t.column_names.index("event_id"),
                "event_id",
                pc.add(eid, i * LSN_STRIDE),
            )
            ts = t.column("ts").cast(pa.int64())
            t = t.set_column(
                t.column_names.index("ts"),
                "ts",
                pc.add(ts, i * 1_000_000).cast(pa.timestamp("us")),
            )
            out.append(derive_changes_batch(t))
        return pa.concat_tables(out)

    from tinyetl_ray.sources.io import clean_read_parquet

    return clean_read_parquet(os.path.join(sf_dir, "events.parquet")).map_batches(
        amp, batch_format="pyarrow"
    )


def run_once(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from tinyetl_ray.pipelines import cdc

    # warm the FULL worker pool before timing (worker spawn is session cost,
    # not pipeline cost) and the page cache
    ray.data.range(
        100_000, override_num_blocks=num_cpus * 2
    ).map_batches(lambda b: b).count()
    n_events_base = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet")).count()
    n_events_churn = n_events_base * AMPLIFY
    n_events = n_events_base * WIDE_MULT

    queries: dict[str, float] = {}

    # --- wide-key change log: ~n_events/10 conversations (the shape a
    # 10^10-event lake tail actually has) — deterministic, cached on disk so
    # the 8-cpu and 32-cpu scaling runs replay the IDENTICAL input
    wide_dir = os.path.join(
        tempfile.gettempdir(), f"tinyetl-widelog-{os.path.basename(sf_dir)}-{n_events}"
    )
    if not os.path.isdir(wide_dir):
        from tinyetl_ray.synth import make_changes

        os.makedirs(wide_dir + ".tmp", exist_ok=True)
        import pyarrow.parquet as pq

        for i, t in enumerate(
            make_changes(
                n_events=n_events,
                n_convs=max(1000, n_events // 10),
                max_turn=20,
                seed=1234,
                n_epochs=WIDE_CHUNKS,
            )
        ):
            pq.write_table(t, os.path.join(wide_dir + ".tmp", f"chunk-{i:03d}.parquet"))
        os.replace(wide_dir + ".tmp", wide_dir)
    wide_files = sorted(glob.glob(os.path.join(wide_dir, "*.parquet")))
    # the ACTUAL replayed event count from the footers — make_changes
    # emits ~1% duplicate events beyond n_events, so reporting the
    # requested count understated throughput and mislabeled BENCH rows
    import pyarrow.parquet as _pq

    n_wide_events = sum(_pq.ParquetFile(f).metadata.num_rows for f in wide_files)

    # TINYETL_BENCH_ONLY=headline skips everything but the wide replay —
    # used by the scaling legs so median-of-N pairs stays affordable
    only_headline = os.environ.get("TINYETL_BENCH_ONLY") == "headline"

    # --- headline: committed COW replay of the wide-key log -------------
    work = tempfile.mkdtemp(prefix="tinyetl-bench-")
    try:
        # untimed warm pass first: faults the input into page cache and
        # exercises every worker's code path, so the timed pass measures
        # steady-state compute+shuffle, not first-touch effects (observed
        # 1.7x run-to-run variance otherwise)
        cdc.replay_commit(
            os.path.join(work, "warm"), [wide_files], num_partitions=NUM_PARTITIONS
        )
        shutil.rmtree(os.path.join(work, "warm"), ignore_errors=True)
        # shared-host CPU noise swings single measurements by ±50%; the
        # headline is always the MEDIAN of 3 timed replays so the recorded
        # number is a stable statistic, not one sample (~7 s extra)
        times = []
        for r in range(3):
            tdir = os.path.join(work, "table")
            if r:
                shutil.rmtree(tdir, ignore_errors=True)
            t0 = time.perf_counter()
            cdc.replay_commit(tdir, [wide_files], num_partitions=NUM_PARTITIONS)
            times.append(time.perf_counter() - t0)
        import statistics

        headline = statistics.median(times)
        queries["cdc_replay_commit_wide"] = round(headline, 3)
        queries["cdc_replay_commit_wide_all"] = [round(t, 3) for t in times]

        t0 = time.perf_counter()
        n_final = cdc.read_table(os.path.join(work, "table")).count()
        queries["read_table"] = round(time.perf_counter() - t0, 3)

        # transcript export over the committed table (one slim conv_id
        # shuffle + vectorized per-bucket assembly)
        t0 = time.perf_counter()
        n_convs = cdc.assemble_conversations(
            cdc.read_table(os.path.join(work, "table"))
        ).count()
        secs = time.perf_counter() - t0
        queries["assemble_conversations"] = round(secs, 3)
        queries["assemble_turns_per_sec"] = round(n_final / max(secs, 1e-9))

        if only_headline:
            return {
                "metric": "cdc_replay_commit_wide_sec",
                "value": round(headline, 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf_dir,
                "num_cpus": num_cpus,
                "n_change_events": n_wide_events,
                "events_per_sec": round(n_wide_events / headline),
                "final_rows": n_final,
                "num_partitions": NUM_PARTITIONS,
            }

        # incremental epoch: a 1/64th-sized change slice applied on the
        # committed table — merge tasks load ONLY touched partitions' state
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # median of 3 successive incremental epochs (round-4's single-sample
        # cell swung 1.1s → 2.6s on host noise alone; the round-5 same-machine
        # A/B vs the round-3 commit showed no real regression — see
        # BASELINE.md)
        inc = pq.read_table(wide_files[0])
        inc_epochs: list[list[str]] = [wide_files]
        inc_times: list[float] = []
        for k in range(3):
            shifted = inc.set_column(
                inc.column_names.index("lsn"),
                "lsn",
                pc.add(inc.column("lsn"), (k + 1) * 10_000_000_000),
            )
            inc_path = os.path.join(work, f"inc{k}.parquet")
            pq.write_table(shifted, inc_path)
            inc_epochs.append([inc_path])
            t0 = time.perf_counter()
            cdc.replay_commit(
                os.path.join(work, "table"), inc_epochs,
                num_partitions=NUM_PARTITIONS,
            )
            inc_times.append(round(time.perf_counter() - t0, 3))
        queries["cdc_incremental_epoch"] = statistics.median(inc_times)
        queries["cdc_incremental_epoch_all"] = inc_times
        queries["incremental_events_per_sec"] = round(
            len(inc) / queries["cdc_incremental_epoch"]
        )

        # --- materialized view: full build vs manifest-pruned refresh ----
        from tinyetl_ray.pipelines.views import refresh_conv_stats

        view_root = os.path.join(work, "view")
        t0 = time.perf_counter()
        refresh_conv_stats(os.path.join(work, "table"), view_root)
        queries["view_build_full"] = round(time.perf_counter() - t0, 3)
        # narrow tail epoch — one conversation gains turns (the realistic
        # CDC-tail shape); the refresh rebuilds only the partitions whose
        # base watermark advanced, everything else carries forward
        one_conv = inc.column("conv_id")[0]
        narrow = inc.filter(pc.equal(inc.column("conv_id"), one_conv))
        narrow = narrow.set_column(
            narrow.column_names.index("lsn"),
            "lsn",
            # past every incremental epoch's lsn range, so the narrow
            # events survive the watermark prune
            pc.add(narrow.column("lsn"), 40_000_000_000),
        )
        # bump ts past the WHOLE log's event-time span (footer stats only —
        # the span grows with n_events) so the late events WIN the
        # last-writer-wins merge: events that lose LWW leave the surviving
        # rows (and therefore the partition watermark and the view)
        # correctly untouched
        def _max_ts_us(paths: list[str]) -> int:
            hi = None
            for f in paths:
                md = pq.ParquetFile(f).metadata
                idx = md.schema.to_arrow_schema().names.index("ts")
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is not None and st.has_min_max:
                        v = st.max
                        hi = v if hi is None or v > hi else hi
            return int(pa.scalar(hi, pa.timestamp("us")).cast(pa.int64()).as_py())

        late_ts = _max_ts_us(wide_files) + 3_600_000_000  # global max + 1h
        narrow = narrow.set_column(
            narrow.column_names.index("ts"),
            "ts",
            pa.array([late_ts] * len(narrow), pa.int64()).cast(pa.timestamp("us")),
        )
        narrow_path = os.path.join(work, "narrow.parquet")
        pq.write_table(narrow, narrow_path)
        cdc.replay_commit(
            os.path.join(work, "table"), inc_epochs + [[narrow_path]],
            num_partitions=NUM_PARTITIONS,
        )
        t0 = time.perf_counter()
        c_inc = refresh_conv_stats(os.path.join(work, "table"), view_root)
        queries["view_refresh_incremental"] = round(time.perf_counter() - t0, 3)
        queries["view_partitions_rebuilt"] = c_inc["stats"]["partitions_rebuilt"]

        # --- churn profile: events-table-derived log, ~7k hot keys ------
        changes_dir = os.path.join(work, "changes")
        t0 = time.perf_counter()
        _amplified_changes(sf_dir).write_parquet(changes_dir)
        queries["derive_write_log"] = round(time.perf_counter() - t0, 3)
        files = sorted(glob.glob(os.path.join(changes_dir, "*.parquet")))
        t0 = time.perf_counter()
        cdc.replay_commit(
            os.path.join(work, "table2"), [files], num_partitions=NUM_PARTITIONS
        )
        queries["cdc_replay_commit_churn"] = round(time.perf_counter() - t0, 3)
        queries["churn_events_per_sec"] = round(
            n_events_churn / queries["cdc_replay_commit_churn"]
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # --- secondary: pure in-stream replay (no sink) --------------------
    t0 = time.perf_counter()
    cdc.replay(_amplified_changes(sf_dir), num_partitions=NUM_PARTITIONS).count()
    queries["cdc_replay_stream"] = round(time.perf_counter() - t0, 3)

    # --- corpus-op breadth timings over the sf tables -------------------
    from tinyetl_ray.functions.dedup import exact_dedup
    from tinyetl_ray.functions.text import TextStats
    from tinyetl_ray.sources.io import clean_read_parquet

    docs = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs):
        t0 = time.perf_counter()
        clean_read_parquet(docs).map_batches(TextStats(), batch_format="pandas").count()
        queries["text_stats"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        exact_dedup(clean_read_parquet(docs)).count()
        queries["dedup_exact"] = round(time.perf_counter() - t0, 3)

        from tinyetl_ray.functions.dedup import (
            lsh_clusters_distributed,
            ngram_jaccard_pairs,
            simhash_pairs,
        )

        t0 = time.perf_counter()
        simhash_pairs(clean_read_parquet(docs), max_distance=3).count()
        queries["dedup_simhash"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        ngram_jaccard_pairs(clean_read_parquet(docs), threshold=0.5).count()
        queries["dedup_ngram_jaccard"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        lsh_clusters_distributed(
            clean_read_parquet(docs), bands=16, verify_threshold=0.5, max_iters=16
        ).count()
        queries["dedup_minhash_clusters"] = round(time.perf_counter() - t0, 3)

    # --- corpus at scale: 100k docs with planted near-dups (the 5k-doc sf
    # table only measures fixed overhead; this measures actual doc/s) -----
    big_docs = os.path.join(
        tempfile.gettempdir(), "tinyetl-bigcorpus-100000.parquet"
    )
    if not os.path.exists(big_docs):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.RandomState(6)
        vocab = np.array(
            "the of and data table row batch key hash sort merge scan filter "
            "group window join stream vector value slow fast big small query "
            "column part order line agg spark customer".split()
        )
        n = 100_000
        texts = []
        for i in range(n):
            words = vocab[rng.randint(0, len(vocab), size=40)]
            texts.append(" ".join(words))
        # plant 2% near-duplicates (one-word edits of earlier docs)
        for i in range(0, n, 50):
            j = rng.randint(0, n)
            texts[i] = texts[j].replace(" the ", " a ", 1)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            big_docs,
        )
    from tinyetl_ray.functions.dedup import MinHasher, simhash_pairs as _sp

    t0 = time.perf_counter()
    exact_dedup(clean_read_parquet(big_docs)).count()
    queries["dedup_exact_100k"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    clean_read_parquet(big_docs).map_batches(
        MinHasher, batch_format="pandas",
        fn_constructor_kwargs={"num_perm": 128},
        concurrency=(2, 8), num_cpus=0.5,
    ).count()
    minhash_secs = time.perf_counter() - t0
    queries["minhash_signatures_100k"] = round(minhash_secs, 3)
    queries["minhash_docs_per_sec"] = round(100_000 / minhash_secs)
    t0 = time.perf_counter()
    _sp(clean_read_parquet(big_docs), max_distance=3).count()
    queries["dedup_simhash_100k"] = round(time.perf_counter() - t0, 3)
    from tinyetl_ray.functions.dedup import lsh_clusters_distributed as _lcd

    t0 = time.perf_counter()
    _lcd(
        clean_read_parquet(big_docs), bands=16, verify_threshold=0.5, max_iters=16
    ).count()
    secs = time.perf_counter() - t0
    queries["dedup_minhash_clusters_100k"] = round(secs, 3)
    queries["cluster_docs_per_sec"] = round(100_000 / secs)

    return {
        "metric": "cdc_replay_commit_wide_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_change_events": n_wide_events,
        "events_per_sec": round(n_wide_events / headline),
        "final_rows": n_final,
        "num_partitions": NUM_PARTITIONS,
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32, pairs: int | None = None) -> dict:
    """Scaling evidence needs a compute-dominated job: fixed session costs
    (~1.5 s: driver setup, first-task latencies) would otherwise cap the
    measurable speedup. Default the wide log to 640× the events table
    (64M change events at sf0.1) unless the caller overrides.

    Runs ``pairs`` (default 3, $TINYETL_SCALING_PAIRS) alternating lo/hi
    legs in fresh processes and reports the MEDIAN per-pair efficiency plus
    the full spread — single-pair readings over-reported (1.30-1.36 in
    round 2) purely from lo-leg run-to-run variance. Legs run headline-only
    (TINYETL_BENCH_ONLY) so the medians stay affordable."""
    import statistics

    pairs = pairs or int(os.environ.get("TINYETL_SCALING_PAIRS", "3"))

    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), TINYETL_BENCH_ONLY="headline")
        env.setdefault("TINYETL_BENCH_WIDE_MULT", "640")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_secs, hi_secs, effs = [], [], []
    n_change_events = None
    for _ in range(pairs):
        r_lo, r_hi = sub(lo), sub(hi)
        n_change_events = r_lo["n_change_events"]
        lo_secs.append(r_lo["value"])
        hi_secs.append(r_hi["value"])
        effs.append((r_lo["value"] / r_hi["value"]) / (hi / lo))
    med_lo, med_hi = statistics.median(lo_secs), statistics.median(hi_secs)
    return {
        "metric": "scaling_efficiency",
        "value": round(statistics.median(effs), 3),  # median of per-pair effs
        "unit": "ratio",
        "sf": sf_dir,
        "pairs": pairs,
        "eff_all": [round(e, 3) for e in effs],
        f"sec_{lo}": med_lo,
        f"sec_{hi}": med_hi,
        f"sec_{lo}_all": lo_secs,
        f"sec_{hi}_all": hi_secs,
        f"events_per_sec_{lo}": round(n_change_events / med_lo),
        f"events_per_sec_{hi}": round(n_change_events / med_hi),
        "n_change_events": n_change_events,
    }


def run_stats(sf_dir: str, num_cpus: int) -> str:
    """Per-operator Ray Data stats for the headline replay (the 'is wall
    time dominated by useful compute?' evidence)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from tinyetl_ray.pipelines import cdc

    wide_dir = os.path.join(
        tempfile.gettempdir(),
        f"tinyetl-widelog-{os.path.basename(sf_dir)}-16000000",
    )
    files = sorted(glob.glob(os.path.join(wide_dir, "*.parquet")))
    if not files:
        return "no cached wide log; run `python bench.py` first"
    ds = cdc.replay(ray.data.read_parquet(files), num_partitions=NUM_PARTITIONS)
    m = ds.materialize()
    stats = m.stats()
    ray.shutdown()
    return stats


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--stats" in sys.argv:
        print(run_stats(sf_dir, int(os.environ.get("RAY_GRAFT_CPUS", "32"))))
        sys.exit(0)
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        result = run_once(sf_dir, ncpu)
        import ray

        ray.shutdown()
        print(json.dumps(result))
