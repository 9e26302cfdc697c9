"""CLI surface — the reference's example-suite style E2E, in-process.

Models examples/run_all_examples.sh: run the real user-facing command,
assert on outputs."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tinyetl_ray.cli import expand_env, load_schema_file, main


@pytest.fixture()
def emp_csv(tmp_path):
    p = tmp_path / "emp.csv"
    pd.DataFrame(
        {
            "id": [1, 2, 3],
            "first_name": ["Ada", "Alan", "Grace"],
            "monthly_salary": ["9000", "8000.5", "9500.25"],
            "active": ["true", "false", "true"],
        }
    ).to_csv(p, index=False)
    return str(p)


def test_transfer_with_transform(emp_csv, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main(
        [
            "transfer", emp_csv, out,
            "--sniff-types",
            "--transform", "annual = monthly_salary * 12",
            "--target-format", "parquet",
        ]
    )
    assert rc == 0
    assert "transferred 3 rows" in capsys.readouterr().out
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    t = pq.read_table(os.path.join(out, files[0]))
    assert "annual" in t.column_names


def test_transfer_progress_flag(emp_csv, tmp_path, capsys):
    """--progress prints the pre-transfer row estimate (csv line count /
    parquet footer — the reference's estimated_row_count surface) and turns
    Ray's live progress bars on for the run."""
    import ray.data

    out = str(tmp_path / "outp")
    rc = main(["transfer", emp_csv, out, "--progress", "--target-format", "parquet"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "estimated 3 source rows" in captured.err
    assert "transferred 3 rows" in captured.out
    # leave the session the way the other tests expect it
    ray.data.DataContext.get_current().enable_progress_bars = False


def test_preview_and_dry_run(emp_csv, tmp_path, capsys):
    assert main(["transfer", emp_csv, str(tmp_path / "x"), "--preview", "2"]) == 0
    out = capsys.readouterr().out
    assert out.count('"id"') == 2 or out.count("id") >= 2
    assert main(["transfer", emp_csv, str(tmp_path / "x"), "--dry-run"]) == 0
    assert "dry-run ok" in capsys.readouterr().out
    assert not os.path.exists(tmp_path / "x")


def test_yaml_job_env_expansion(emp_csv, tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("EMP_SRC", emp_csv)
    job = tmp_path / "job.yaml"
    job.write_text(
        "source: ${EMP_SRC}\n"
        f"target: {tmp_path}/out_json\n"
        "filter: 'id > 1'\n"
        "sniff_types: true\n"
        "target_format: json\n"
    )
    assert main(["run", str(job)]) == 0
    assert "transferred 2 rows" in capsys.readouterr().out


def test_expand_env_default_and_missing(monkeypatch):
    monkeypatch.delenv("NOPE_VAR", raising=False)
    assert expand_env("x=${NOPE_VAR:-42}") == "x=42"
    with pytest.raises(KeyError):
        expand_env("x=${NOPE_VAR}")


def test_schema_file_yaml_and_json(tmp_path):
    y = tmp_path / "s.yaml"
    y.write_text(
        "columns:\n"
        "  - name: id\n"
        "    type: integer\n"
        "    nullable: false\n"
        "  - name: email\n"
        "    type: string\n"
        "    pattern: '[^@]+@[^@]+'\n"
    )
    specs = load_schema_file(str(y))
    assert specs[0].name == "id" and specs[0].nullable is False
    assert specs[1].pattern == "[^@]+@[^@]+"
    j = tmp_path / "s.json"
    j.write_text(json.dumps({"columns": [{"name": "id", "type": "integer"}]}))
    assert load_schema_file(str(j))[0].name == "id"


def test_generate_config(capsys):
    assert main(["generate-config", "a.csv", "b.parquet", "--transform", "x = 1"]) == 0
    out = capsys.readouterr().out
    assert "source: a.csv" in out and "transform:" in out


def test_cdc_cli_flow(tmp_path, capsys):
    import pyarrow.parquet as pq

    from tinyetl_ray.synth import make_changes

    ch = tmp_path / "changes"
    os.makedirs(ch)
    for i, t in enumerate(make_changes(n_events=800, n_convs=10, seed=2, n_epochs=2)):
        pq.write_table(t, ch / f"e{i}.parquet")
    root = str(tmp_path / "table")
    assert main(
        ["cdc", "replay", root, str(ch / "e0.parquet"), str(ch / "e1.parquet")]
    ) == 0
    captured = capsys.readouterr()
    assert json.loads(captured.out.strip().splitlines()[-1]) == {
        "applied_epochs": [0, 1]
    }
    # incremental per-epoch progress ticker on stderr (transfer.rs:121-134
    # parity): one line per committed epoch with events + partitions
    ticks = [ln for ln in captured.err.splitlines() if ln.startswith("epoch ")]
    assert len(ticks) == 2
    assert "epoch 1/2:" in ticks[0] and "epoch 2/2:" in ticks[1]
    assert "events/sec" in ticks[0] and "partitions" in ticks[0]
    assert main(["cdc", "lineage", root]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert main(["cdc", "compact", root]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["epoch"] == 2
    assert main(["cdc", "show", root]) == 0
    assert "rows:" in capsys.readouterr().out
    # materialized view: refresh builds every partial, second refresh no-ops
    view = str(tmp_path / "view")
    assert main(["cdc", "view-refresh", root, view]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["partitions_rebuilt"] > 0
    assert main(["cdc", "view-refresh", root, view]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["epoch"] == first["epoch"]
    assert main(["cdc", "view-show", view]) == 0
    out = capsys.readouterr().out
    assert "rows: 10" in out and "conv_id" in out
    # clone then restore the clone's SOURCE back to epoch 0
    dst = str(tmp_path / "clone")
    assert main(["cdc", "clone", root, dst]) == 0
    cl = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cl["epoch"] == 0 and cl["cloned_from"]["epoch"] == 2
    assert main(["cdc", "restore", root, "0"]) == 0
    rs = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rs["restored_from_epoch"] == 0 and rs["epoch"] == 3
    assert main(["cdc", "fsck", root]) == 0
    fsck = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fsck["ok"] and fsck["checked"] > 0
    # training-shape exports from the committed table
    assert main(["cdc", "export", root, str(tmp_path / "tx")]) == 0
    ex = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ex["shape"] == "transcripts" and ex["rows"] == 10  # one per conv
    assert main(
        ["cdc", "export", root, str(tmp_path / "wx"), "--shape", "windows"]
    ) == 0
    ex2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ex2["rows"] > 10  # one row per TURN
    # re-exporting into a dest that already holds parquet must refuse:
    # mixing runs would corrupt the corpus and the reported row count
    assert main(["cdc", "export", root, str(tmp_path / "tx")]) == 1
    capsys.readouterr()


# ---------------------------------------------------------------------------
# HTTP(S) protocol — loopback server, like the reference's test_env/http-server
# ---------------------------------------------------------------------------


class _LoopbackHandler:
    """Factory for a handler that records auth/headers and serves a CSV."""

    def __new__(cls, records):
        import http.server

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                records.append(
                    {
                        "path": self.path,
                        "auth": self.headers.get("Authorization"),
                        "x_custom": self.headers.get("X-Custom"),
                    }
                )
                if self.path == "/secure.csv" and self.headers.get(
                    "Authorization"
                ) != "Bearer tok123":
                    self.send_response(401)
                    self.end_headers()
                    return
                if self.path.endswith(".csv") or self.path == "/data":
                    body = b"id,name\n1,ada\n2,grace\n"
                    self.send_response(200)
                    self.send_header("Content-Type", "text/csv")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def log_message(self, *a):  # silence
                pass

        return H


@pytest.fixture()
def loopback_http():
    import http.server
    import threading

    records: list[dict] = []
    srv = http.server.HTTPServer(("127.0.0.1", 0), _LoopbackHandler(records))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", records
    srv.shutdown()


def test_http_download_and_transfer(tmp_path, loopback_http):
    base, records = loopback_http
    from tinyetl_ray.sources.urls import http_download, parse_target

    # plain download keeps the extension and the URL-derived table name
    path, table = parse_target(f"{base}/data.csv")
    assert path.endswith(".csv") and table == "data"
    with open(path) as f:
        assert f.read().startswith("id,name")

    # custom header + basic auth reach the server
    http_download(
        f"{base}/data.csv",
        {
            "header.X-Custom": "yes",
            "auth.basic.username": "u",
            "auth.basic.password": "p",
        },
    )
    assert records[-1]["x_custom"] == "yes"
    assert records[-1]["auth"].startswith("Basic ")

    # bearer token gates /secure.csv
    with pytest.raises(ConnectionError):
        http_download(f"{base}/secure.csv")
    http_download(f"{base}/secure.csv", {"auth.bearer": "tok123"})

    # 404 raises
    with pytest.raises(ConnectionError):
        http_download(f"{base}/missing.bin")

    # full CLI transfer: http source → parquet target
    out = str(tmp_path / "out_parquet")
    assert (
        main(
            [
                "transfer",
                f"{base}/data.csv",
                out,
                "--target-format",
                "parquet",
                "--option",
                "header.X-Custom=cli",
            ]
        )
        == 0
    )
    got = pq.read_table(out).to_pandas()
    assert sorted(got["name"].tolist()) == ["ada", "grace"]
    assert records[-1]["x_custom"] == "cli"


def test_generate_default_config(capsys):
    assert main(["generate-default-config"]) == 0
    out = capsys.readouterr().out
    assert "version: 1" in out and "source:" in out and "auth.bearer" in out


def test_source_type_override_extensionless_http(tmp_path, loopback_http):
    """--source-type forces the connector for an extensionless HTTP endpoint
    (cli.rs:63 / http.rs:33,93): /data has no extension, so dispatch must
    come from the override, not the URL."""
    base, records = loopback_http
    out = str(tmp_path / "out_pq")
    assert (
        main(
            ["transfer", f"{base}/data", out, "--source-type", "csv",
             "--target-format", "parquet"]
        )
        == 0
    )
    got = pq.read_table(out).to_pandas()
    assert sorted(got["name"].tolist()) == ["ada", "grace"]
    # without the override, the extensionless endpoint is rejected clearly
    with pytest.raises(ValueError, match="unsupported source extension"):
        main(["transfer", f"{base}/data", out, "--target-format", "parquet"])
    # local extensionless file works through the same override
    p = tmp_path / "noext"
    p.write_text("id,name\n7,tuck\n")
    out2 = str(tmp_path / "out2")
    assert main(["transfer", str(p), out2, "--source-type", "csv",
                 "--target-format", "parquet"]) == 0
    assert pq.read_table(out2).to_pandas()["name"].tolist() == ["tuck"]


def test_corpus_cli_ops(tmp_path):
    """Corpus subcommands run the training-data ops end to end over a
    documents parquet and write parquet results."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the quick brown fox jumps over the lazy dog today",
                "the quick brown fox jumps over the lazy dog today",  # exact dup
                "contact me at a.b@example.com or +1 555-123-4567 ok",
                "totally different text about cooking pasta with sauce",
                "the the the the the the the the the the",  # repetitive
                "pack my box with five dozen liquor jugs right now",
            ],
            "lang": ["en"] * 6,
        }
    )
    src = str(tmp_path / "docs.parquet")
    docs.to_parquet(src, index=False)

    out = str(tmp_path / "dedup")
    assert main(["corpus", "dedup-exact", src, out]) == 0
    assert pq.read_table(out).num_rows == 5  # one exact dup removed

    out2 = str(tmp_path / "scrub")
    assert main(["corpus", "scrub", src, out2]) == 0
    s = pq.read_table(out2).to_pandas().set_index("doc_id")
    assert s.loc[2, "n_emails"] == 1 and s.loc[2, "n_phones"] == 1

    out3 = str(tmp_path / "rep")
    assert main(["corpus", "repetition", src, out3]) == 0
    r = pq.read_table(out3).to_pandas().set_index("doc_id")
    assert r.loc[4, "dup_word_ratio"] == 0.9  # 10 tokens, 1 distinct

    out4 = str(tmp_path / "split")
    assert main(["corpus", "split", src, out4]) == 0
    sp = pq.read_table(out4).to_pandas().set_index("doc_id")
    assert sp.loc[0, "split"] == sp.loc[1, "split"]  # dups co-locate

    out5 = str(tmp_path / "pack")
    assert main(["corpus", "pack", src, out5, "--budget", "15"]) == 0
    pk = pq.read_table(out5).to_pandas().sort_values("doc_id")
    # budget 15: cumulative-bucket rule, deterministic
    prior = pk["n_tokens"].cumsum() - pk["n_tokens"]
    assert (pk["pack_id"].to_numpy() == (prior // 15).to_numpy()).all()

    out6 = str(tmp_path / "rank")
    assert main(["corpus", "shuffle-rank", src, out6]) == 0
    rk = pq.read_table(out6).to_pandas()
    assert sorted(rk["shuffle_rank"]) == list(range(6))  # a permutation

    out7 = str(tmp_path / "sample")
    assert main(["corpus", "sample", src, out7]) == 0  # deterministic subset

    # incremental: docs 0-2 incoming vs existing {1,3,4,5} → doc 1's text
    # (the exact dup of docs 0 AND 1) blocks both; only doc 2's text is new
    inc = str(tmp_path / "inc.parquet")
    exist = str(tmp_path / "exist.parquet")
    docs.iloc[:3].to_parquet(inc, index=False)
    docs.iloc[[1, 3, 4, 5]].to_parquet(exist, index=False)
    out8 = str(tmp_path / "incdedup")
    assert main(
        ["corpus", "dedup-incremental", inc, out8, "--existing", exist]
    ) == 0
    got = pq.read_table(out8).to_pandas()["doc_id"].tolist()
    assert got == [2]

    out10 = str(tmp_path / "lq")
    assert main(["corpus", "length-quantiles", src, out10]) == 0
    lq = pq.read_table(out10).to_pandas()
    assert set(lq.columns) == {"lang", "p50", "p95"} and len(lq) == 1

    # fully-duplicated incoming batch → EMPTY result must not crash the CLI
    out9 = str(tmp_path / "incdedup-empty")
    assert main(
        ["corpus", "dedup-incremental", exist, out9, "--existing", exist]
    ) == 0


def test_ssh_transport_mock_scp(tmp_path, monkeypatch):
    """ssh:// downloads via the system scp client (ssh.rs:28-96). No sshd in
    the sandbox, so a mock scp on PATH verifies the exact command contract:
    -P port, user@host:remote_path source, temp target, extension kept."""
    remote = tmp_path / "remote.csv"
    remote.write_text("id,name\n5,lin\n")
    scp = tmp_path / "bin" / "scp"
    scp.parent.mkdir()
    scp.write_text(
        "#!/bin/sh\n"
        '# mock scp: record argv, then copy the local file named in "user@host:path"\n'
        f'echo "$@" > {tmp_path}/scp_argv\n'
        'src=""; dst=""\n'
        "for a in \"$@\"; do\n"
        '  case "$a" in\n'
        "    *@*:*) src=${a#*:};;\n"
        "    -*|22|2222) ;;\n"
        '    *) dst="$a";;\n'
        "  esac\n"
        "done\n"
        'cp "$src" "$dst"\n'
    )
    scp.chmod(0o755)
    monkeypatch.setenv("PATH", f"{scp.parent}:{os.environ['PATH']}")

    from tinyetl_ray.sources.urls import parse_target, ssh_download

    path, table = parse_target(f"ssh://alice@example.com:2222{remote}")
    assert table == "remote"
    assert path.endswith(".csv")
    with open(path) as f:
        assert f.read() == "id,name\n5,lin\n"
    argv = (tmp_path / "scp_argv").read_text()
    assert "-P 2222" in argv and f"alice@example.com:{remote}" in argv

    # full transfer through the CLI
    out = str(tmp_path / "out_pq")
    assert main(["transfer", f"ssh://alice@example.com{remote}", out,
                 "--target-format", "parquet"]) == 0
    assert pq.read_table(out).to_pandas()["name"].tolist() == ["lin"]

    # option-injection guard: a '-'-leading username would make scp parse
    # the source operand as an option (CVE-2017-1000117 pattern); both the
    # identifier check and the '--' terminator block it
    with pytest.raises(ValueError, match="must not start with"):
        ssh_download("ssh://-oProxyCommand=evil@example.com/x.csv")
    assert " -- " in argv  # option parsing terminated before the operand

    # contract errors, matching the reference's config validation
    with pytest.raises(ValueError, match="username"):
        ssh_download("ssh://example.com/x.csv")
    with pytest.raises(ValueError, match="file path"):
        ssh_download("ssh://u@example.com/")
    # a failing scp surfaces as a connection error
    scp.write_text("#!/bin/sh\nexit 1\n")
    with pytest.raises(ConnectionError, match="SCP download failed"):
        ssh_download(f"ssh://alice@example.com{remote}")


def test_yaml_job_with_http_options(tmp_path, loopback_http):
    """YAML jobs must pass protocol options (the review-found gap: the
    options mapping never reached build_pipeline)."""
    base, records = loopback_http
    job = tmp_path / "job.yaml"
    job.write_text(
        f"source: {base}/secure.csv\n"
        f"target: {tmp_path}/out\n"
        "target_format: parquet\n"
        "options:\n"
        "  auth.bearer: tok123\n"
        "  header.X-Custom: from-yaml\n"
    )
    assert main(["run", str(job)]) == 0
    assert records[-1]["auth"] == "Bearer tok123"
    assert records[-1]["x_custom"] == "from-yaml"
    total = sum(
        pq.read_table(os.path.join(f"{tmp_path}/out", f)).num_rows
        for f in os.listdir(f"{tmp_path}/out")
        if f.endswith(".parquet")
    )
    assert total == 2


def test_default_config_template_parses(tmp_path, capsys):
    """The canned template (comments stripped, one option uncommented) must
    be accepted by the engine's own YAML subset parser."""
    from tinyetl_ray.cli import _DEFAULT_CONFIG_TEMPLATE, _mini_yaml

    cfg = _mini_yaml(_DEFAULT_CONFIG_TEMPLATE)
    assert cfg["source"] and cfg["target"] and cfg["version"] == 1
    # uncomment every template option and re-parse
    uncommented = "\n".join(
        line[2:] if line.startswith("# ") and ":" in line else line
        for line in _DEFAULT_CONFIG_TEMPLATE.splitlines()
        if not line.strip().startswith("#") or (line.startswith("# ") and ":" in line)
    )
    cfg2 = _mini_yaml(uncommented)
    assert "transform" in cfg2 and "options" in cfg2


def test_transfer_append_counts_only_new_rows(emp_csv, tmp_path, capsys):
    """Append mode must report THIS run's rows, not the directory total."""
    out = str(tmp_path / "out")
    assert main(["transfer", emp_csv, out, "--target-format", "parquet"]) == 0
    assert "transferred 3 rows" in capsys.readouterr().out
    assert main(["transfer", emp_csv, out, "--target-format", "parquet"]) == 0
    assert "transferred 3 rows" in capsys.readouterr().out  # not 6
