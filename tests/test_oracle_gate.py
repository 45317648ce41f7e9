"""Local replica of the driver's correctness gate: every registered query
must hash-match its DuckDB oracle at sf0.001 (fast) — the driver runs the
same comparison at sf0.01."""

from __future__ import annotations

import pytest

from sinker_spark.oracle import compare_query
from sinker_spark.queries import REGISTRY, _load

from tests.conftest import SF_SMALL

_load()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    rep = compare_query(spark, SF_SMALL, name)
    assert rep["ok"], {k: v for k, v in rep.items() if k != "sample_diffs"} | {
        "sample_diffs": rep.get("sample_diffs", [])[:1]
    }


@pytest.mark.parametrize("name", sorted(n for n in REGISTRY if REGISTRY[n].oracle))
def test_no_unhashable_output_columns(spark, name):
    """The driver canonicalizer hashes result values with pandas — a
    top-level array/map column arrives as numpy.ndarray/dict and crashes
    it (`TypeError: unhashable type`), red-flagging a correct query.
    Serialize collections to strings (or explode to rows) before
    returning. Guards the round-2 regression class
    (embedding_centroids_by_label / embedding_quantize_int8)."""
    from pyspark.sql.types import ArrayType, MapType

    df = REGISTRY[name].fn(spark, SF_SMALL)
    offenders = [
        f.name for f in df.schema.fields if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not offenders, (
        f"{name} returns unhashable top-level column(s) {offenders}; "
        "serialize with array_join/to_json or explode to rows"
    )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 1
