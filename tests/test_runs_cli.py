"""jobs/runs_cli.py — the file-backed twin of the reference's run-polling
REST surface (``api/routers/runs.py``: list_runs :98, get_run_status :964,
get_candidate_keys :1534, confirm_keys :1628)."""

from __future__ import annotations

import json
import os

import pytest

from jobs import runs_cli


@pytest.fixture()
def workspace(tmp_path):
    """Two hand-built run dirs shaped exactly like the pipeline's
    manifest.json + audit.jsonl, plus one junk dir the lister must skip."""
    for rid, state, prog, when in (
        ("r-old", "completed", 1.0, "2026-01-01T00:00:00Z"),
        ("r-new", "processing", 0.33, "2026-02-02T00:00:00Z"),
    ):
        d = tmp_path / rid
        d.mkdir()
        (d / "manifest.json").write_text(
            json.dumps(
                {
                    "run_id": rid,
                    "state": state,
                    "progress": prog,
                    # one month pipeline-shaped (counters under "metrics"),
                    # one flat — the lister must read both
                    "completed_batches": {
                        "2024-01": {"metrics": {"rows": 4}},
                        "2024-02": {"rows": 3},
                    },
                    "stages": [
                        {
                            "stage": "validate",
                            "state": "completed",
                            "started_at": when,
                            "finished_at": when,
                        }
                    ],
                }
            )
        )
        (d / "audit.jsonl").write_text(
            "\n".join(json.dumps({"event": f"e{i}"}) for i in range(20)) + "\n"
        )
    (tmp_path / "not_a_run").mkdir()
    return tmp_path


def test_list_runs(workspace, capsys):
    runs_cli.main(["list", str(workspace)])
    out = json.loads(capsys.readouterr().out)
    assert [r["run_id"] for r in out["runs"]] == ["r-new", "r-old"]  # newest first
    assert out["runs"][0]["state"] == "processing"
    assert out["runs"][0]["rows"] == 7
    assert out["runs"][0]["months_committed"] == 2


def test_status_with_audit_tail(workspace, capsys):
    runs_cli.main(["status", str(workspace / "r-new"), "--audit-tail", "3"])
    out = json.loads(capsys.readouterr().out)
    assert out["manifest"]["run_id"] == "r-new"
    assert [e["event"] for e in out["audit_tail"]] == ["e17", "e18", "e19"]


def test_candidate_and_confirm_keys(spark, tmp_path, capsys, monkeypatch):
    """candidate-keys must rank the unique id first; confirm-keys on a
    non-key column must surface its duplicate groups and skip-and-count
    null key rows — same semantics as the underlying A19/A20 operators."""
    monkeypatch.setattr(runs_cli, "_session", lambda cores: spark)
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "id long, grp string"
    ).write.parquet(p)

    runs_cli.main(["candidate-keys", p, "--cols", "id,grp"])
    out = json.loads(capsys.readouterr().out)
    assert out["candidates"][0]["columns"] == ["id"]
    assert out["candidates"][0]["score"] == 1.0

    runs_cli.main(["confirm-keys", p, "--keys", "grp", "--id-col", "id"])
    out = json.loads(capsys.readouterr().out)
    assert out["null_key_rows_skipped"] == 1
    assert out["duplicate_groups"] == [
        {"grp": "a", "dup_count": 2, "example_ids": [1, 2]}
    ]
