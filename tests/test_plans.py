"""Physical-plan assertions: the scale properties the engine promises
(predicate pushdown into parquet, column pruning, broadcast dimension
joins, whole-stage codegen, no Python evaluation in JVM-only queries)
hold in the actual executed plans — not just in docstrings."""

from __future__ import annotations

from sinker_spark.queries import REGISTRY, _load
from tests.conftest import SF_SMALL

_load()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMALL)
    # full formatted explain (plan toString truncates long scan attributes)
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _optimized(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    plan = _plan(spark, "filter_compound_predicate")
    assert "PushedFilters: [" in plan
    # the returnflag equality must be pushed, not evaluated post-scan
    assert "EqualTo(l_returnflag,R)" in plan.replace(" ", "")


def test_column_pruning_in_scan(spark):
    plan = _plan(spark, "scan_project_alias")
    scan = plan[plan.index("ReadSchema") :][:300]
    assert "o_orderkey" in scan and "o_totalprice" in scan
    assert "o_custkey" not in scan, "unprojected column must be pruned from the scan"


def test_dimension_joins_broadcast_no_smj(spark):
    plan = _plan(spark, "flagship_order_document")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "all flagship joins should broadcast at this scale"


def test_q5_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3


def test_whole_stage_codegen_present(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_SMALL)
    df.collect()  # finalize the adaptive plan so codegen ids materialize
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "[codegen id :" in plan


def test_no_python_eval_in_jvm_queries(spark):
    """Dedup/text/similarity hot paths are Catalyst-only — a Python UDF
    would show up as BatchEvalPython / ArrowEvalPython / FlatMapGroupsInPandas."""
    for name in ("minhash_near_dup_pairs", "text_quality_scores", "ann_cosine_topk", "simhash_signatures"):
        plan = _plan(spark, name)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in plan, f"{name} leaked Python into the plan: {marker}"


def test_topk_uses_take_ordered_not_full_sort(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_decorrelated_view_has_no_nested_loops(spark, tmp_path):
    """The transpiled course_mv must plan as joins+aggregate — no
    per-row subquery execution operators."""
    from tests import school_fixtures as fx
    from sinker_spark.views import ViewDef

    fx.register(spark, str(tmp_path / "t"))
    df = ViewDef("course_mv", sql=fx.COURSE_MV_SQL).compile(spark)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "scalar-subquery" not in plan.lower()


def test_money_sums_use_long_accumulator(spark):
    """q1's money sums must ride Catalyst's decimal-aggregates rewrite
    (sum over UnscaledValue longs, not byte-array decimals) — the 2x fast
    path queries/helpers.py buys by narrowing to DECIMAL(8,2)."""
    plan = _plan(spark, "q1_pricing_summary")
    assert "UnscaledValue" in plan, "narrow-decimal sum fell off the long-backed fast path"


def test_q4_exists_decorrelates_to_semi_join(spark):
    """Correlated EXISTS must become a left-semi join on l_orderkey — no
    per-row subquery re-execution."""
    opt = _optimized(spark, "q4_order_priority")
    assert "LeftSemi" in opt
    assert "InSubquery" not in opt and "Exists" not in opt


def test_q21_double_correlation_semi_plus_anti(spark):
    """EXISTS + NOT EXISTS with a two-table outer correlation decorrelate
    into one semi and one anti join."""
    opt = _optimized(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in opt
    assert "LeftAnti" in opt
    assert "Exists" not in opt


def test_q22_scalar_subquery_stays_scalar(spark):
    """The uncorrelated AVG subquery is a one-row scalar-subquery node
    (a broadcast at runtime), and the NOT EXISTS is an anti join."""
    opt = _optimized(spark, "q22_idle_rich_customers")
    assert "scalar-subquery" in opt
    assert "LeftAnti" in opt


def test_hof_battery_is_single_stage_no_shuffle(spark):
    """Higher-order function batteries are pure per-row projections:
    no Exchange anywhere in the plan."""
    for name in ("battery_array_hof", "battery_map_functions", "regexp_extract_all_words"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} unexpectedly shuffles"


def test_salted_join_has_no_broadcast_of_fact(spark):
    """The salted join must join on (key, salt) — the join condition in
    the plan carries the salt column."""
    plan = _plan(spark, "salted_join_supplier_volume")
    assert "__salt" in plan


def test_q16_not_in_is_null_aware_anti_join(spark):
    """NOT IN over a subquery must plan as a null-aware anti join, not a
    per-row subquery re-execution."""
    plan = _plan(spark, "q16_supplier_diversity")
    assert "LeftAnti" in plan
    assert "SubqueryExec" not in plan


def test_q17_correlated_avg_decorrelates(spark):
    """The correlated AVG threshold must become an aggregate + join on
    partkey (decorrelation), never a nested-loop re-evaluation."""
    opt = _optimized(spark, "q17_small_qty_revenue")
    assert "Join" in opt and "Aggregate" in opt
    plan = _plan(spark, "q17_small_qty_revenue")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q19_single_side_conjuncts_pushed_below_join(spark):
    """From the OR of conjunct groups, Catalyst must extract the
    single-side envelopes (brand/size on part, quantity on lineitem) and
    push them below the join into the scans."""
    plan = _plan(spark, "q19_disjunctive_revenue").replace(" ", "")
    # part scan: brand IN-envelope pushed; lineitem scan: quantity envelope
    assert "PushedFilters" in plan
    assert "p_brand" in plan.split("PushedFilters")[1][:2000] or \
           "l_quantity" in plan.split("PushedFilters")[1][:2000]


def test_q6_all_predicates_pushed(spark):
    plan = _plan(spark, "q6_forecast_revenue").replace(" ", "")
    pushed = plan.split("PushedFilters:[")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_udtf_query_contains_generator(spark):
    """The UDTF lane must plan as a Python-evaluated generator (the one
    deliberately-Python query shape) — and the tokenizer's base scan must
    still prune to the two referenced columns."""
    plan = _plan(spark, "udtf_tokenize_lateral")
    assert "BatchEvalPythonUDTF" in plan or "ArrowEvalPythonUDTF" in plan or "PythonUDTF" in plan


def test_decontaminate_shingle_join_no_cartesian(spark):
    plan = _plan(spark, "decontaminate_ngram_overlap")
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_gapfill_single_user_shuffle_for_window(spark):
    """LOCF window runs per user_id — the plan must partition the window
    by user_id, not collapse to a single partition."""
    plan = _plan(spark, "gapfill_locf_hourly")
    assert "Window" in plan
    assert "SinglePartition" not in plan.split("Window")[0][-600:]


def test_map_only_training_lanes_no_shuffle(spark):
    """PII scrub, split assignment, and the parsing/URL/array batteries
    are pure per-row maps — no Exchange anywhere; at 100 TB they pipeline
    with the scan that feeds them."""
    for name in (
        "pii_scrub_battery",
        "split_train_val_test",
        "battery_array_setops",
        "battery_url_parse",
        "battery_csv_str_to_map",
        "battery_datetime_calendar",
    ):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} unexpectedly shuffles"


def test_shuffle_export_single_partitioned_window(spark):
    """The deterministic-shuffle export is ONE hash-partitioned window —
    exactly one shuffle (on shard), and no SinglePartition global sort."""
    import re

    plan = _plan(spark, "shuffle_export_shards")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning" in plan and "SinglePartition" not in plan


def test_seqpack_single_partitioned_window(spark):
    import re

    plan = _plan(spark, "seqpack_token_bins")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning" in plan and "SinglePartition" not in plan


def test_curation_and_chunk_dedup_shuffle_budgets(spark):
    """The new curation/dedup lanes honor their documented shuffle
    budgets: resample is a pure map (0 exchanges), token budget is one
    windowed shuffle, chunk dedup is exactly two (chunk window +
    reassembly), and the CMS probe joins a broadcast sketch."""
    import re

    def n_exchanges(name: str) -> int:
        # formatted explain lists operators as "(N) Exchange"; count nodes,
        # not the Arguments detail lines
        return len(re.findall(r"\(\d+\) Exchange", _plan(spark, name)))

    assert n_exchanges("domain_mix_resample") == 0
    assert n_exchanges("token_budget_per_source") == 1
    assert n_exchanges("chunk_dedup_clean") == 2
    plan = _plan(spark, "cms_manual_estimates")
    assert "BroadcastHashJoin" in plan, "sketch probe must broadcast the 256-row sketch"


def test_no_unbounded_join_strategies_anywhere(spark):
    """Global plan hygiene over the ENTIRE registry: no CartesianProduct
    ever, and BroadcastNestedLoopJoin only where a bounded side is
    broadcast by design (ANN query batches, the band dimension of the
    range join, the tiny×tiny cross join). A new query that trips this
    either broadcasts a bounded side deliberately (add it here with the
    reason) or gets rewritten."""
    allowed_bnlj = {
        "ann_cosine_topk",          # broadcast query batch × corpus scan
        "ann_quantized_rerank_topk",  # same, int8 prefilter stage
        "range_join_price_bands",   # broadcast band dimension, range predicate
        "cross_join_region_status",  # both sides bounded dims
        "bm25_relevance_scores",    # one-row corpus-stats (N, avgdl) broadcast
        "hll_manual_distinct_customers",  # groups × 64-bucket register spine, both bounded
        "sketch_hll_mergeable",     # groups × 64-bucket register spine, both bounded
        "basket_pair_mining",       # one-row total-baskets broadcast
        "token_drift_by_source",    # one-row (vocab-size, corpus-size) broadcast
        "hybrid_search_rrf",        # broadcast 1-query vector batch (ann pattern)
        "doc_cross_entropy",        # one-row corpus-token-total broadcast
        "chi_square_source_lang",   # one-row corpus-total broadcast
        "benford_first_digit_qa",   # one-row digit-total broadcast
        "mmr_diversified_topk",     # broadcast 1-query vector batch (ann pattern)
        "ks_two_sample_order_totals",  # one-row totals / one-row max-D broadcasts
        "bpe_train_merges",         # one-row best-pair broadcast per merge round
        "logreg_gd_orders",         # one-row weight/gradient broadcasts per GD step
        "token_pmi_pairs",          # one-row corpus-doc-count broadcast
        "hard_negative_mining",     # broadcast bounded anchor batch (ann pattern)
        "bootstrap_mean_total_replicas",  # B-row replica spine + one-row CI broadcasts
        "event_path_trigrams",      # one-row path-total broadcast
        "ctfidf_cluster_terms",     # one-row avg-class-tokens broadcast
        "trimmed_winsorized_means",  # one-row rank-bounds broadcast
        "ann_recall_mrr_eval",      # broadcast bounded query batch (ann pattern, exact stage)
        "ann_ndcg_eval",            # broadcast bounded query batch (ann pattern, exact stage)
        "acf_daily_orders",         # 3-row lag-spine broadcast
        "cusum_order_volume_drift",  # one-row target/threshold broadcasts
        "runs_test_daily_orders",   # one-row mean-level broadcast
        "mann_kendall_trend",       # calendar-bounded day-pair theta join + one-row broadcasts
        "theil_index_decomposition",  # one-row corpus-totals broadcasts
        "ann_ivf_multiprobe_topk",  # broadcast query×centroid batch (ann pattern)
        "doc_bigram_perplexity",    # one-row vocabulary-size broadcast
        "dau_wau_stickiness",       # calendar-bounded day-spine range join
        "qq_deciles_open_vs_filled",  # 9-row decile-spine broadcast
        "cluster_silhouette_lite",  # k-row centroid-relation broadcast
        "dow_profile_uniformity",   # one-row total broadcast
    }
    offenders = {}
    for name, spec in sorted(REGISTRY.items()):
        plan = spec.fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in allowed_bnlj:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_broadcast_degrades_to_sort_merge_not_bnlj(spark):
    """100 TB safety proof: at sf0.1 AQE broadcasts the flagship's
    orders⋈customer and q5's star joins because the fact side happens to
    fit; at cluster scale those sides won't. Force the degradation by
    zeroing both broadcast thresholds and assert (a) the plans fall back
    to SortMergeJoin — never BroadcastNestedLoop/CartesianProduct — and
    (b) both queries still hash-match their DuckDB oracle. Explicit
    F.broadcast() hints on true dimensions (nation/region) survive the
    threshold, which is exactly the intended split: hinted dims stay
    broadcast at any scale, size-based fact broadcasts degrade safely."""
    from sinker_spark.oracle import compare_query

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        for name in ("flagship_order_document", "q5_local_supplier_volume"):
            df = REGISTRY[name].fn(spark, SF_SMALL)
            df.collect()  # finalize adaptive plan
            plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            assert "SortMergeJoin" in plan, f"{name}: expected SMJ fallback"
            assert "BroadcastNestedLoop" not in plan, name
            assert "CartesianProduct" not in plan, name
            rep = compare_query(spark, SF_SMALL, name)
            assert rep["ok"], f"{name} under SMJ: {rep.get('status')} {rep.get('sample_diffs')}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_null_safe_join_is_equi_join_not_bnlj(spark):
    """The lane serve/dirty joins all go through ivm_delta.null_safe_join
    (``<=>`` on the group keys, so NULL-keyed groups address their own
    state). ``EqualNullSafe`` is an equi-join key for Spark's planner
    (ExtractEquiJoinKeys), so this MUST stay a hash/sort-merge join —
    if it ever degraded to BroadcastNestedLoopJoin the per-batch serve
    would be O(state × touched), a scale killer at 100 TB state sizes.
    Asserted for every join type the lanes use, with both broadcast
    thresholds zeroed so nothing hides behind a small-side broadcast."""
    from sinker_spark.ivm_delta import null_safe_join

    left = spark.range(0, 1000).selectExpr(
        "CASE WHEN id % 7 = 0 THEN NULL ELSE CAST(id % 13 AS STRING) END AS k1",
        "CAST(id % 3 AS STRING) AS k2",
        "id AS v",
    )
    right = spark.range(0, 200).selectExpr(
        "CASE WHEN id % 5 = 0 THEN NULL ELSE CAST(id % 13 AS STRING) END AS k1",
        "CAST(id % 3 AS STRING) AS k2",
    ).distinct()
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        for how in ("inner", "left", "semi", "anti"):
            df = null_safe_join(left, right, ["k1", "k2"], how)
            df.collect()
            plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, f"{how}: {plan[:400]}"
            assert "BroadcastNestedLoop" not in plan, how
            assert "CartesianProduct" not in plan, how
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
