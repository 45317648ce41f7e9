"""Collection-type surface: higher-order array functions, map functions,
regexp extraction — the nested-data manipulation layer a training-data
pipeline leans on (reference README.md:84-85 promises full SQL; Postgres
array/jsonb operators map onto Spark's HOFs + map functions).

Scale notes: every query here is a narrow per-row projection — no
shuffle at all (verified: single WholeStageCodegen scan stage). HOFs run
inside codegen on the JVM; this is the fast path the SNIPPETS §UDF
guidance says to prefer over Python UDFs. At 100 TB these queries are
pure map tasks bounded by parquet scan throughput.
"""

from __future__ import annotations

from sinker_spark.queries.relational import _sql

# --- higher-order functions over token arrays ----------------------------
# Spark: transform/filter/aggregate/exists/forall + array_* utilities.
# DuckDB twins: list_transform/list_filter/list_sum/list_contains + len.
_sql(
    "battery_array_hof",
    spark_sql="""
    SELECT doc_id,
           size(toks) AS n_toks,
           size(filter(toks, x -> length(x) > 4)) AS n_long,
           aggregate(transform(toks, x -> CAST(length(x) AS BIGINT)),
                     CAST(0 AS BIGINT), (a, x) -> a + x) AS total_len,
           array_contains(toks, 'spark') AS has_spark,
           forall(toks, x -> length(x) < 10) AS all_short,
           array_join(slice(array_sort(array_distinct(toks)), 1, 3), ',') AS first3_distinct
    FROM (SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS toks
          FROM documents)""",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len,
           list_contains(toks, 'spark') AS has_spark,
           len(list_filter(toks, x -> length(x) >= 10)) = 0 AS all_short,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_distinct
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents)""",
    doc=(
        "higher-order array function battery: transform/filter/aggregate/"
        "exists-forall/slice/sort/distinct over token arrays — all inside "
        "whole-stage codegen, zero shuffle"
    ),
    tags=("functions-array", "hof"),
)

# --- zip_with / element-wise vector arithmetic ---------------------------
# Spark zip_with has no DuckDB twin; the oracle re-expresses it as an
# index-driven list_transform (1-based on both sides). Sequential
# left-fold on a fixed 4-element prefix + round(4) pins the float math.
_sql(
    "battery_array_zip",
    spark_sql="""
    SELECT vec_id,
           ROUND(aggregate(
                   zip_with(a, reverse(a),
                            (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 4) + 0.0 AS dot_rev,
           ROUND(CAST(array_max(a) AS DOUBLE), 4) + 0.0 AS amax,
           ROUND(CAST(array_min(a) AS DOUBLE), 4) + 0.0 AS amin,
           size(a) AS n
    FROM (SELECT vec_id, slice(embedding, 1, 4) AS a FROM embeddings)""",
    oracle="""
    SELECT vec_id,
           ROUND(list_sum(list_transform(range(1, 5),
                 i -> CAST(a[i] AS DOUBLE) * CAST(r[i] AS DOUBLE))), 4) + 0.0 AS dot_rev,
           ROUND(CAST(list_max(a) AS DOUBLE), 4) + 0.0 AS amax,
           ROUND(CAST(list_min(a) AS DOUBLE), 4) + 0.0 AS amin,
           CAST(len(a) AS INT) AS n
    FROM (SELECT vec_id, embedding[1:4] AS a, list_reverse(embedding[1:4]) AS r
          FROM embeddings)""",
    doc=(
        "zip_with element-wise vector arithmetic + array_max/min: Spark "
        "zip_with vs index-driven list_transform oracle; float32→double "
        "casts are exact, 4-element left-fold order identical; +0.0 "
        "normalizes ROUND's -0.0 (value-equal but hash-distinct)"
    ),
    tags=("functions-array", "hof", "vectors"),
)

# --- map functions over JSON props ---------------------------------------
_sql(
    "battery_map_functions",
    spark_sql="""
    SELECT event_id,
           size(m) AS n_keys,
           array_join(array_sort(map_keys(m)), ',') AS keys_sorted,
           CAST(element_at(m, 'k') AS INT) AS k_val
    FROM (SELECT event_id, from_json(props, 'map<string,string>') AS m
          FROM events)""",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events""",
    doc=(
        "map function battery (B11 sibling): from_json→map, map_keys/"
        "element_at/size — jsonb operator surface as Spark map functions"
    ),
    tags=("functions-map", "B11"),
)

# --- regexp_extract_all ---------------------------------------------------
_sql(
    "regexp_extract_all_words",
    spark_sql="""
    SELECT doc_id,
           size(regexp_extract_all(text, '[a-z]{5,}', 0)) AS n_words5,
           array_join(slice(array_sort(array_distinct(regexp_extract_all(text, '[a-z]{5,}', 0))), 1, 5), ',')
             AS top5_alpha
    FROM documents""",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS INT) AS n_words5,
           array_to_string(list_sort(list_distinct(regexp_extract_all(text, '[a-z]{5,}')))[1:5], ',') AS top5_alpha
    FROM documents""",
    doc="regexp_extract_all: all-match extraction into arrays (string battery sibling)",
    tags=("functions-string", "regexp"),
)

# --- array set operations -------------------------------------------------
# Both engines normalize set-op results to sorted-distinct before compare
# (Spark's array_intersect/union/except already dedup but preserve
# first-occurrence order, which is not cross-engine stable).
_STOP10 = "'the','of','and','to','in','is','that','for','with','as'"
_sql(
    "battery_array_setops",
    spark_sql=f"""
    WITH base AS (
      SELECT doc_id, filter(split(lower(text), ' '), t -> t <> '') AS toks
      FROM documents)
    SELECT doc_id,
           array_join(array_sort(array_distinct(array_intersect(toks, array({_STOP10})))), ',') AS stop_overlap,
           arrays_overlap(toks, array({_STOP10})) AS has_stop,
           size(array_distinct(array_except(toks, array({_STOP10})))) AS n_content,
           array_join(slice(array_sort(array_distinct(array_except(toks, array({_STOP10})))), 1, 5), ',') AS content_head,
           size(array_distinct(array_union(toks, array({_STOP10})))) AS n_union_stop
    FROM base""",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
      FROM documents)
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_distinct(list_intersect(toks, [{_STOP10}]))), ','), '') AS stop_overlap,
           list_has_any(toks, [{_STOP10}]) AS has_stop,
           CAST(len(list_distinct(list_filter(toks, t -> NOT list_contains([{_STOP10}], t)))) AS INT) AS n_content,
           coalesce(array_to_string(list_sort(list_distinct(list_filter(toks, t -> NOT list_contains([{_STOP10}], t))))[1:5], ','), '') AS content_head,
           CAST(len(list_distinct(list_concat(toks, [{_STOP10}]))) AS INT) AS n_union_stop
    FROM base""",
    doc=(
        "array set-operation battery: array_intersect/except/union/"
        "arrays_overlap of token arrays against a stopword list — per-row "
        "JVM array ops, sorted-distinct normalization on both engines"
    ),
    tags=("functions-array", "set-ops-array"),
)
