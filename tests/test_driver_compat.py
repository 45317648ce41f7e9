"""The grading driver constructs its OWN SparkSession (not via
session.get_spark), so the engine must work on a vanilla session: the
catalog applies required runtime confs defensively. This test runs
entry() + a timestamp-dependent query on a bare session in a clean
subprocess."""

from __future__ import annotations

import subprocess
import sys

REPO = __file__.rsplit("/tests/", 1)[0]

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .getOrCreate())  # deliberately NONE of the engine confs

import __spark_entry__ as e
df = e.entry(spark)
assert df.count() == 1500, "entry rows"

qs = e.queries()
# timestamp-heavy query must survive the nanos parquet on a bare session
rows = qs["battery_datetime"](spark, "/root/testdata/sf0.001").collect()
assert len(rows) == 1500
assert all(1990 < r["yr"] < 2005 for r in rows[:10])
oracles = e.oracle_sql()
assert set(oracles) <= set(qs) and len(qs) >= 70
print("DRIVER-COMPAT-OK")
"""


def test_entry_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DRIVER-COMPAT-OK" in proc.stdout
