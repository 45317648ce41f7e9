"""bench_ivm smoke: the per-round bench artifact's "ivm" section must
come from the real engine lanes — doc-tree fold for the mixed batch,
auto-derived correlation-tree targeting for the 10-key batch. A silent
fall-through to full recompute would keep producing numbers while
measuring the wrong thing."""

from __future__ import annotations

import os

from sinker_spark import bench_ivm

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_bench_ivm_runs_and_uses_the_real_lanes(spark):
    out = bench_ivm.run(spark, SF_DIR)
    assert out["fold_lane"] == "doc_tree"
    assert out["targeted_lane"] == "targeted"
    assert out["fold_batch_rows"] == 1000
    for k in ("seed_s", "fold_batch_s", "sql_seed_s", "targeted_10key_s"):
        assert out[k] > 0
    # the mixed batch must actually reach the sink with work to do
    assert out["fold_upserts"] > 0
    assert out["fold_deletes"] >= 0
