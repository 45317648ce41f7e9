"""UDF layer: the pandas grouped-map z-score must agree with its
decimal-exact SQL twin (the oracle-checked query) within float tolerance,
and registered pandas UDFs must be callable from SQL."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sinker_spark.queries import REGISTRY, _load
from tests.conftest import SF_SMALL

_load()


def test_pandas_zscore_matches_sql_twin(spark):
    sql_rows = {r["orderkey"]: r["zscore"] for r in REGISTRY["zscore_orders_sql"].fn(spark, SF_SMALL).collect()}
    udf_rows = {r["orderkey"]: r["zscore"] for r in REGISTRY["udaf_zscore_pandas"].fn(spark, SF_SMALL).collect()}
    assert set(sql_rows) == set(udf_rows)
    worst = max(abs(sql_rows[k] - udf_rows[k]) for k in sql_rows)
    assert worst < 1e-5, worst


def test_registered_udf_from_sql(spark):
    from sinker_spark.functions import register_engine_functions

    register_engine_functions(spark)
    row = spark.sql(
        "SELECT norm_l2(ARRAY(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS n, clamp01(1.5) AS c"
    ).collect()[0]
    assert math.isclose(row["n"], 5.0) and row["c"] == 1.0


def test_bpe_ish_token_count(spark):
    from sinker_spark.operators.text import bpe_ish_token_count

    df = spark.createDataFrame([("spark2024 rocks", 3), ("abc", 1), ("a1b2", 4)], "text string, want int")
    rows = df.select(bpe_ish_token_count("text").alias("n"), "want").collect()
    for r in rows:
        assert r["n"] == r["want"]


def test_hll_merged_estimate_within_bound(spark):
    """Native DataSketches path (the gate lane now uses the cross-engine
    manual registers): hll_union_agg over daily hll_sketch_agg partials
    must estimate the true distinct user count within HLL's error
    envelope (lgK=12 → ~1.6% rse; allow 5%)."""
    from sinker_spark.catalog import register_views
    from sinker_spark.queries import _load
    from tests.conftest import SF_SMALL as sf_dir_small

    _load()
    register_views(spark, sf_dir_small)
    got = {
        r["event_type"]: r["approx_distinct_users"]
        for r in spark.sql(
            """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                     hll_sketch_agg(user_id) AS sk
              FROM events GROUP BY event_type, date_trunc('day', ts))
            SELECT event_type,
                   CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)
                     AS approx_distinct_users
            FROM daily GROUP BY event_type"""
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1"
        ).collect()
    }
    assert set(got) == set(exact)
    for et, est in got.items():
        assert abs(est - exact[et]) <= max(2, 0.05 * exact[et]), (et, est, exact[et])
