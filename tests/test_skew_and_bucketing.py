"""Skew mitigation (salted join / salted aggregate correctness) and
bucketed snapshot tables (shuffle-free co-located joins) — the two
explicit scale techniques the engine documents beyond AQE."""

from __future__ import annotations

from pyspark.sql import functions as F

from sinker_spark.operators.skew import salted_aggregate, salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed fact: 90% of rows on key 1
    fact = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(2, i) for i in range(50)] + [(3, i) for i in range(50)],
        "k bigint, v bigint",
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (3, "cold"), (4, "unused")], "k bigint, name string")
    plain = {(r["k"], r["v"], r["name"]) for r in fact.join(dim, "k").collect()}
    salted = {(r["k"], r["v"], r["name"]) for r in salted_join(fact, dim, "k", salt_buckets=4).collect()}
    assert salted == plain
    assert len(salted) == 1000


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [(1, float(i)) for i in range(1000)] + [(2, 1.0), (2, 2.0)], "k bigint, v double"
    )
    got = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in salted_aggregate(
            df, "k", {"n": ("count", "v"), "total": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")}
        ).collect()
    }
    assert got[1] == (1000, sum(float(i) for i in range(1000)), 0.0, 999.0)
    assert got[2] == (2, 3.0, 1.0, 2.0)


def test_bucketed_snapshot_join_has_no_shuffle(spark, tmp_path):
    """Snapshots saved bucketed by key join WITHOUT an Exchange on either
    side — the co-located-join strategy for repeated diffs at scale."""
    # warehouse dir is a static conf — use the session default with
    # throwaway table names, dropped (incl. files) in finally
    a = spark.range(0, 10000).select(F.col("id").cast("string").alias("k"), F.lit("a").alias("v"))
    b = spark.range(5000, 15000).select(F.col("id").cast("string").alias("k"), F.lit("b").alias("v"))
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("snap_a")
        b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("snap_b")

        # force the non-broadcast path: the point is that two tables
        # bucketed on the join key sort-merge WITHOUT a shuffle exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("snap_a").join(spark.table("snap_b"), "k")
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS snap_a")
        spark.sql("DROP TABLE IF EXISTS snap_b")
