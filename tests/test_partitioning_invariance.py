"""Partitioning invariance: registry results must be BIT-IDENTICAL at any
parallelism.

This is the engine's central 100 TB determinism claim (README
"Cross-engine determinism rules"): exact DECIMAL accumulation for double
aggregates, explicitly sorted arrays, rounded-before-ranking scores. If
any lane leaked a raw float sum or an unsorted collect, its result would
depend on partition count / merge order — correct-looking at one
parallelism, flapping at another. We run a representative lane sample at
sf0.001 under three execution shapes:

- shuffle.partitions = 1  (single-reducer: one accumulation order)
- shuffle.partitions = 7, AQE off (odd fan-out, no runtime coalescing)
- shuffle.partitions = 32, AQE on  (the production config)

and assert the driver's canonical value hash is identical across all
three. Catching a flap here is strictly stronger than the DuckDB oracle
gate, which runs at one fixed parallelism.
"""

from __future__ import annotations

import pytest

from sinker_spark.oracle import _hash_rows

SF_DIR = "/root/testdata/sf0.001"

# a slice through every determinism-sensitive mechanism:
LANES = [
    "flagship_order_document",      # nested doc build + json rendering
    "q1_pricing_summary",           # decimal money sums (long accumulator)
    "q5_local_supplier_volume",     # star join + revenue product sums
    "string_agg_region_nations",    # ordered string aggregation
    "array_agg_order_parts",        # sorted array_agg policy
    "w1_running_total",             # window running decimal sum
    "top_orders_per_customer",      # rank with tiebreaks
    "dedup_exact_documents",        # min-id canonical assignment
    "ann_cosine_topk",              # float scores rounded before ranking
    "tfidf_top_terms",              # idf floats + per-doc ranking
    "minhash_near_dup_pairs",       # hash signatures + banded join
    "exact_percentiles_by_status",  # exact percentile (order statistics)
]

CONFIGS = [
    {"spark.sql.shuffle.partitions": "1", "spark.sql.adaptive.enabled": "true"},
    {"spark.sql.shuffle.partitions": "7", "spark.sql.adaptive.enabled": "false"},
    {"spark.sql.shuffle.partitions": "32", "spark.sql.adaptive.enabled": "true"},
]


def _run_hash(spark, name: str) -> tuple[str, int]:
    from sinker_spark.queries import REGISTRY, _load

    _load()
    df = REGISTRY[name].fn(spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    return _hash_rows(df.columns, rows), len(rows)


@pytest.mark.parametrize("name", LANES)
def test_result_invariant_under_parallelism(spark, name):
    saved = {k: spark.conf.get(k) for c in CONFIGS for k in c}
    results = []
    try:
        for conf in CONFIGS:
            for k, v in conf.items():
                spark.conf.set(k, v)
            results.append(_run_hash(spark, name))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    hashes = {h for h, _ in results}
    counts = {n for _, n in results}
    assert len(counts) == 1, f"{name}: row counts differ across parallelism: {results}"
    assert len(hashes) == 1, f"{name}: values differ across parallelism: {results}"
