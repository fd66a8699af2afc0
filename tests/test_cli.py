"""CLI entry points (sync / drift / rules) — in-process invocations."""

import json
import os

import pyarrow.parquet as pq

from cartography_ray.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_sync_kg_and_docs(ray_session, tmp_path, capsys):
    from cartography_ray.sources.transcripts import synth_transcripts_table

    inp = tmp_path / "transcripts.parquet"
    pq.write_table(synth_transcripts_table(300), str(inp))
    rc = main(
        [
            "sync",
            "--input", str(inp),
            "--store", str(tmp_path / "store"),
            "--documents", f"{SF}/documents.parquet",
            "--modules", "kg,docs",
            "--update-tag", "777",
            "--work-dir", str(tmp_path / "work"),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["update_tag"] == 777
    assert out["modules"]["kg"]["nodes"]["Turn"] > 0
    assert out["modules"]["docs"]["nodes"]["Document"] == 500
    # the store really exists on disk with bucketed node tables
    assert os.path.isdir(tmp_path / "store" / "nodes" / "Turn")


def test_cli_drift_lifecycle(ray_session, tmp_path, capsys):
    d = str(tmp_path / "drift")
    assert main(["drift", "--dir", d, "register",
                 "--query", "customers_without_orders",
                 "--properties", "c_custkey,c_name"]) == 0
    assert main(["drift", "--dir", d, "get-states", "--sf-dir", SF]) == 0
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    first = captured["captured"]["customers_without_orders"]
    assert main(["drift", "--dir", d, "add-shortcut",
                 "--query", "customers_without_orders",
                 "--alias", "baseline", "--file", first]) == 0
    assert main(["drift", "--dir", d, "get-states", "--sf-dir", SF]) == 0
    capsys.readouterr()
    assert main(["drift", "--dir", d, "detect",
                 "--query", "customers_without_orders",
                 "--start", "baseline"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["new"] == [] and report["missing"] == []  # same input twice
    assert main(["drift", "--dir", d, "archive",
                 "--query", "customers_without_orders",
                 "--state", "baseline"]) == 0


def test_cli_rules_framework_filter(ray_session, capsys):
    rc = main(
        [
            "rules", "--sf-dir", SF,
            "--framework", "dqb", "--scope", "relational",
            "--format", "json", "--findings",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    # scope filter selects exactly the relational-integrity rule
    assert [r["rule"] for r in out] == ["orphan-customers"]
    fact = out[0]["facts"][0]
    assert fact["fact"] == "customers-without-orders"
    assert fact["rows"] > 0
    assert "findings" in fact and len(fact["findings"]) == fact["rows"]
