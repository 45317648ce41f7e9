"""User-defined function registration — pandas (Arrow-vectorized) UDFs,
grouped-map UDAF-style transforms, and a Python UDTF.

The reference has no UDF machinery (users get whatever Postgres has,
README.md:84-85); Spark's registration surface is exposed here so SQL
view definitions can call engine-registered functions. Everything is
Arrow-batched — row-at-a-time Python UDFs are banned in this codebase
(they serialize per row; pandas UDFs move columnar batches, ~10-100×
faster — the difference between feasible and not at 100 TB).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def norm_l2(v: pd.Series) -> pd.Series:
    """Vectorized L2 norm of an array<float|double> column (numpy batch)."""
    import numpy as np

    return v.map(lambda a: float(np.sqrt(np.dot(a, a))) if a is not None else None)


@pandas_udf("double")
def clamp01(x: pd.Series) -> pd.Series:
    """Vectorized clamp to [0, 1]."""
    return x.clip(0.0, 1.0)


def _tokenize_udtf_class():
    """Build the Tokenize UDTF lazily (pyspark.sql.functions.udtf decorates
    at definition time, which needs no session but does import the UDTF
    machinery — keep it off the module-import hot path)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        """Table function: one (position, token) row per single-space-split
        token. Split semantics are exactly ``text.split(' ')`` so the DuckDB
        oracle (``string_split(text, ' ')``) sees the identical multiset."""

        def eval(self, text: str):  # noqa: D401 - UDTF contract
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                if tok:
                    yield i, tok

    return Tokenize


def register_engine_functions(spark: SparkSession) -> None:
    """Make the engine's functions callable from SQL view definitions."""
    spark.udf.register("norm_l2", norm_l2)
    spark.udf.register("clamp01", clamp01)
    spark.udtf.register("tokenize", _tokenize_udtf_class())


def zscore_by_group(df: DataFrame, group_col: str, value_col: str, id_col: str) -> DataFrame:
    """Grouped-map (UDAF-style) transform: per-group z-score via
    applyInPandas. One shuffle on the group key; each group is a pandas
    frame in a single Arrow batch — groups must fit in memory, so at
    scale choose group keys with bounded cardinality per key (or salt).
    """
    out_schema = f"{id_col} bigint, {group_col} string, zscore double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[value_col].to_numpy(dtype="float64")
        mu = x.mean() if len(x) else 0.0
        sd = x.std(ddof=1) if len(x) > 1 else 0.0
        z = (x - mu) / sd if sd > 0 else np.zeros_like(x)
        return pd.DataFrame({id_col: pdf[id_col], group_col: pdf[group_col], "zscore": z.round(6)})

    return df.groupBy(group_col).applyInPandas(_z, schema=out_schema)
