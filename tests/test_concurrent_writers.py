"""Real multi-process OCC race: one process ingests change waves while a
second compacts in a loop. Each side retries on ConcurrentCommitError (the
documented recovery: re-enter, the entry point re-reads table state). The
parent then asserts no commit was lost, epochs are contiguous, and the final
state equals the sequential oracle."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pyarrow as pa
import pyarrow.parquet as pq

from tinyetl_ray.pipelines import cdc
from tinyetl_ray.state import manifest as mf
from tinyetl_ray.synth import make_changes

from .util import assert_frames_equal, sequential_lww

_INGEST = textwrap.dedent(
    """
    import json, sys, time
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from tinyetl_ray.pipelines import cdc
    from tinyetl_ray.state.manifest import ConcurrentCommitError

    root, *waves = sys.argv[1:]
    files, retries = [], 0
    for w in waves:
        files.append([w])
        for attempt in range(20):
            try:
                cdc.replay_commit(root, files, num_partitions=4)
                break
            except ConcurrentCommitError:
                retries += 1
                time.sleep(0.05)
        else:
            sys.exit(3)
    print(json.dumps({"retries": retries}))
    ray.shutdown()
    """
)

_COMPACTOR = textwrap.dedent(
    """
    import json, sys, time
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from tinyetl_ray.pipelines import cdc
    from tinyetl_ray.state.manifest import ConcurrentCommitError

    root, n_rounds = sys.argv[1], int(sys.argv[2])
    done, retries = 0, 0
    deadline = time.monotonic() + 120
    while done < n_rounds and time.monotonic() < deadline:
        try:
            cdc.compact(root, drop_tombstones=False)
            done += 1
        except FileNotFoundError:
            time.sleep(0.05)  # ingester hasn't published epoch 0 yet
        except ConcurrentCommitError:
            retries += 1
            time.sleep(0.05)
    print(json.dumps({"compactions": done, "retries": retries}))
    ray.shutdown()
    """
)


def test_ingest_races_compaction(tmp_path):
    epochs = make_changes(n_events=3000, n_convs=25, seed=77, n_epochs=3)
    waves = []
    for i, t in enumerate(epochs):
        p = str(tmp_path / f"w{i}.parquet")
        pq.write_table(t, p)
        waves.append(p)
    root = str(tmp_path / "t")

    env = dict(os.environ, PYTHONPATH=os.getcwd(), RAY_ADDRESS="local")
    a = subprocess.Popen(
        [sys.executable, "-c", _INGEST, root, *waves],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    b = subprocess.Popen(
        [sys.executable, "-c", _COMPACTOR, root, "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    out_a, err_a = a.communicate(timeout=300)
    out_b, err_b = b.communicate(timeout=300)
    assert a.returncode == 0, err_a[-2000:]
    assert b.returncode == 0, err_b[-2000:]
    stats_b = json.loads(out_b.strip().splitlines()[-1])
    assert stats_b["compactions"] == 2

    commits = mf.list_commits(root)
    # no lost or duplicated epoch numbers: contiguous from 0
    assert [c["epoch"] for c in commits] == list(range(len(commits)))
    # all three change waves landed exactly once despite the races
    assert mf.latest_commit(root)["last_change_epoch"] == 2
    n_compactions = sum(1 for c in commits if c["stats"].get("compaction"))
    assert n_compactions == 2 and len(commits) == 5

    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs))
    assert_frames_equal(got, want)


_TAILER = textwrap.dedent(
    """
    import json, sys
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from tinyetl_ray.pipelines import cdc

    root, watch = sys.argv[1], sys.argv[2]
    applied = cdc.tail(root, watch, num_partitions=4, poll_secs=0.05,
                       max_idle_polls=6)
    print(json.dumps({"applied": [c["epoch"] for c in applied]}))
    ray.shutdown()
    """
)


def test_two_tailers_race(tmp_path):
    """Two tail processes watching the same directory and committing to the
    same table: whoever loses a commit race retries (possibly re-applying a
    batch the winner already applied as a NEW change epoch — a no-op under
    LWW idempotence). Final state must equal the sequential oracle with no
    lost or duplicated rows."""
    epochs = make_changes(n_events=2500, n_convs=20, seed=55, n_epochs=3)
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    for i, t in enumerate(epochs):
        pq.write_table(t, watch / f"{i:04d}.parquet")
    root = str(tmp_path / "t")

    env = dict(os.environ, PYTHONPATH=os.getcwd(), RAY_ADDRESS="local")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TAILER, root, str(watch)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for _ in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]

    commits = mf.list_commits(root)
    assert [c["epoch"] for c in commits] == list(range(len(commits)))
    state = json.load(open(os.path.join(root, "_commits", "TAIL_STATE")))
    assert len(state["applied"]) == 3  # every file fingerprinted exactly once

    got = cdc.read_table(root).to_pandas()
    want = sequential_lww(pa.concat_tables(epochs))
    assert_frames_equal(got, want)
