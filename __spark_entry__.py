"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship nested-document query (the reference's
course_mv pattern, /root/reference/tests/fixtures/course_mv.sql:1-26,
transplanted to the star schema) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 via
the sinker_spark registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sinker_spark.queries import flagship

    return flagship.flagship_order_document(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sinker_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each query (omitted → driver does rows-only check)."""
    from sinker_spark.queries import all_oracles

    return all_oracles()
