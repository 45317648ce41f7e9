"""CLI end-to-end: definitions dir → dry-run, backfill + CDC drain
(offline in-memory sink), driving python -m sinker_spark the way a
sinker user would drive the reference's console script."""

from __future__ import annotations

import json
import subprocess
import sys

from tests import school_fixtures as fx

REPO = __file__.rsplit("/tests/", 1)[0]


def _write_definitions(defs_dir):
    defs_dir.mkdir()
    (defs_dir / "person_mv.sql").write_text(fx.PERSON_MV_SQL)
    (defs_dir / "course_mv.sql").write_text(fx.COURSE_MV_SQL)
    (defs_dir / "views_to_indices.json").write_text(
        json.dumps({"person_mv": "people", "course_mv": "courses"})
    )


def _write_tables(spark, tables_dir):
    fx.register(spark, str(tables_dir))


def _run_cli(tmp_path, *args: str) -> subprocess.CompletedProcess:
    import os

    return subprocess.run(
        [sys.executable, "-m", "sinker_spark", *args],
        capture_output=True, text=True, cwd=REPO, timeout=420,
        env={
            **os.environ,
            "SPARK_GRAFT_CPUS": "4",
            "SINKER_SPARK_SNAPSHOT_ROOT": str(tmp_path / "snap"),
            "SINKER_SPARK_CHECKPOINT_ROOT": str(tmp_path / "ckpt"),
        },
    )


def test_cli_dry_run_and_backfill(spark, tmp_path):
    _write_definitions(tmp_path / "defs")
    _write_tables(spark, tmp_path / "tables")

    dry = _run_cli(tmp_path, "--definitions", str(tmp_path / "defs"),
                   "--source-parquet", str(tmp_path / "tables"), "--dry-run")
    assert dry.returncode == 0, dry.stderr[-2000:]
    assert "view person_mv -> index people" in dry.stdout
    assert "rows:   4" in dry.stdout
    assert "view course_mv -> index courses" in dry.stdout

    cdc = tmp_path / "cdc"
    cdc.mkdir()
    (cdc / "b1.txt").write_text("1\ttable public.person: UPDATE: id[text]:'p-1' name[text]:'John'\n")
    run = _run_cli(tmp_path, "--definitions", str(tmp_path / "defs"),
                   "--source-parquet", str(tmp_path / "tables"),
                   "--cdc-dir", str(cdc), "--once")
    assert run.returncode == 0, run.stderr[-2000:]
    assert "backfilled 2 view(s)" in run.stdout
    assert "index people: 4 docs" in run.stdout
    assert "index courses: 3 docs" in run.stdout
    assert "in-memory sink (offline mode)" in run.stderr


def test_cli_manifest_store_backfill(spark, tmp_path):
    _write_definitions(tmp_path / "defs")
    _write_tables(spark, tmp_path / "tables")

    run = _run_cli(tmp_path, "--definitions", str(tmp_path / "defs"),
                   "--source-parquet", str(tmp_path / "tables"),
                   "--store", "manifest")
    assert run.returncode == 0, run.stderr[-2000:]
    assert "backfilled 2 view(s)" in run.stdout
    # manifest layout on disk: _CURRENT pointer + versioned manifest
    snap = tmp_path / "snap" / "person_mv"
    assert (snap / "_CURRENT").exists()
    assert (snap / "_manifests" / "v_1.json").exists()
