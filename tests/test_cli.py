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
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "applied_epochs": [0, 1]
    }
    assert main(["cdc", "lineage", root]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert main(["cdc", "compact", root]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["epoch"] == 2
    assert main(["cdc", "show", root]) == 0
    assert "rows:" in capsys.readouterr().out
