"""View definitions — the user-facing declaration unit.

Reference model: one ``{view}.sql`` SELECT producing exactly (id, doc)
per view (sinker.py:96-98, query_templates.py:11), mapped to one sink
index via views_to_indices.json (runner.py:30-31). Here a view is:

    ViewDef(name, sql=..., key="id", index=...)   # SQL text (transpiled)
    ViewDef(name, fn=lambda spark: df, ...)       # or a DataFrame program

Dependencies (which source tables dirty this view) are auto-extracted
from the SQL via compiler.lineage (the reference's parse_schema_tables,
utils.py:7-20); DataFrame-program views pass ``deps`` explicitly.

``compile()`` returns the canonical 2-column (id, doc) DataFrame with
decimals cast to double inside the doc struct — the reference's JSON
documents render numeric(p,s) as floats (test_e2e.py:79: 3.50 → 3.5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sinker_spark.compiler.lineage import parse_schema_tables
from sinker_spark.compiler.transpile import transpile


def _decimals_to_double(dt: T.DataType, col: Column) -> tuple[T.DataType, Column, bool]:
    """Recursively rebuild ``col`` with every DecimalType cast to double."""
    if isinstance(dt, T.DecimalType):
        return T.DoubleType(), col.cast("double"), True
    if isinstance(dt, T.StructType):
        changed = False
        fields, cols = [], []
        for f_ in dt.fields:
            ndt, ncol, ch = _decimals_to_double(f_.dataType, col.getField(f_.name))
            changed |= ch
            fields.append(T.StructField(f_.name, ndt, f_.nullable))
            cols.append(ncol.alias(f_.name))
        if not changed:
            return dt, col, False
        rebuilt = F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*cols))
        return T.StructType(fields), rebuilt, True
    if isinstance(dt, T.ArrayType):
        ndt, _, ch = _decimals_to_double(dt.elementType, F.lit(None))
        if not ch:
            return dt, col, False
        new_dt = T.ArrayType(ndt, dt.containsNull)
        return new_dt, col.cast(new_dt), True
    return dt, col, False


@dataclass
class ViewDef:
    name: str
    sql: str | None = None
    fn: Callable[[SparkSession], DataFrame] | None = None
    key: str = "id"
    index: str | None = None  # sink index name; defaults to view name
    deps: set[str] = field(default_factory=set)
    parent_table: str | None = None
    # Optional targeted-refresh hook: (spark, {table: {changed ids}}) →
    # one-column DataFrame of affected VIEW keys, or None for "unknown →
    # full refresh". Enables SnapshotStore.refresh_partial: the engine
    # filters the compiled view by these keys (Catalyst pushes the IN
    # down to the parent-table scan) instead of recomputing the world.
    affected_keys: Callable[[SparkSession, dict[str, set[str]]], DataFrame | None] | None = None

    def __post_init__(self) -> None:
        if (self.sql is None) == (self.fn is None):
            raise ValueError("ViewDef needs exactly one of sql= or fn=")
        if self.sql is not None and not self.deps:
            parent, tables = parse_schema_tables(self.sql)
            self.deps = tables
            self.parent_table = self.parent_table or parent
        if self.index is None:
            self.index = self.name
        if self.affected_keys is None and self.parent_table and self.deps == {self.parent_table}:
            # single-table view (person_mv shape): by the id-from-parent
            # convention (reference person_mv.sql:1, sinker.py:110-120)
            # changed parent ids ARE the affected view keys — targeted
            # refresh is derivable with no user hook.
            parent = self.parent_table

            def _parent_ids(spark: SparkSession, changed: dict[str, set[str]]) -> DataFrame | None:
                ids = changed.get(parent, set())
                if set(changed) - {parent}:
                    return None  # unexpected table → full refresh
                return spark.createDataFrame([(i,) for i in sorted(ids)], f"{self.key} string")

            self.affected_keys = _parent_ids

    def compile_scoped(self, spark: SparkSession, scope_keys: DataFrame) -> DataFrame:
        """Compile restricted to the given view keys: a left-semi join on
        the key column, which Catalyst pushes through the view's joins to
        the parent-table scan (the key IS the parent key by the engine's
        id-from-parent convention) — partial recompute costs ∝ |scope|."""
        full = self.compile(spark)
        scope = scope_keys.select(
            F.col(scope_keys.columns[0]).cast("string").alias(self.key)
        ).distinct()
        return full.join(scope, self.key, "left_semi")

    def compile(self, spark: SparkSession) -> DataFrame:
        """→ canonical (key, doc) DataFrame; decimals inside doc → double."""
        if self.sql is not None:
            df = spark.sql(transpile(self.sql))
        else:
            df = self.fn(spark)
        cols = df.columns
        if len(cols) != 2:
            raise ValueError(
                f"view {self.name!r} must produce exactly 2 columns (id, doc); got {cols}"
            )
        id_col, doc_col = cols
        doc_dt = df.schema[doc_col].dataType
        _, doc_cast, changed = _decimals_to_double(doc_dt, F.col(doc_col))
        out = df.select(
            F.col(id_col).cast("string").alias(self.key),
            (doc_cast if changed else F.col(doc_col)).alias("doc"),
        )
        return out
