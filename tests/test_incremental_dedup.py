"""Incremental MinHash index: delta-only signature refresh, new-pair
detection, delete semantics, and agreement with the batch pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from sinker_spark.operators.dedup_incremental import IncrementalMinHashIndex

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing in the garden all morning "
    "then the afternoon light falls across the wooden floor and the dog "
    "sleeps by the door until the children come home from school laughing "
    "and the kettle whistles softly in the kitchen as evening settles in"
)
VARIANT = BASE.replace("lazy dog", "sleepy dog")  # near-dup of BASE
DISTINCT = (
    "completely unrelated text about distributed query engines shuffling "
    "partitions across executors with adaptive execution and broadcasting"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_incremental_minhash_index(spark, tmp_path):
    idx = IncrementalMinHashIndex(spark, str(tmp_path / "sig"), bands=8, min_est_jaccard=0.5)

    # bootstrap: A + C (no near-dups yet)
    idx.bootstrap(_docs(spark, [("a", BASE), ("c", DISTINCT)]))
    assert {r["doc_id"] for r in idx.signatures().collect()} == {"a", "c"}

    # add B (near-dup of A): only the new pair comes back
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in idx.update(_docs(spark, [("b", VARIANT)])).collect()}
    assert set(pairs) == {("a", "b")}
    assert pairs[("a", "b")] >= 0.5
    assert {r["doc_id"] for r in idx.signatures().collect()} == {"a", "b", "c"}

    # change C into a near-dup of A: pairs with BOTH existing members,
    # but the untouched (a, b) pair is not re-derived
    pairs2 = {(r["id_a"], r["id_b"]) for r in
              idx.update(_docs(spark, [("c", BASE + " extra")])).collect()}
    assert ("a", "c") in pairs2 and ("b", "c") in pairs2
    assert ("a", "b") not in pairs2

    # delete B: index forgets it; later updates can never pair against it
    none = idx.update(deleted_ids=["b"])
    assert none.count() == 0
    assert {r["doc_id"] for r in idx.signatures().collect()} == {"a", "c"}
    pairs3 = {(r["id_a"], r["id_b"]) for r in
              idx.update(_docs(spark, [("d", VARIANT)])).collect()}
    assert all("b" not in p for p in pairs3)
    assert ("a", "d") in pairs3


def test_incremental_agrees_with_batch(spark, tmp_path):
    """Accumulated incremental pairs == batch LSH+estimate over the final
    corpus (same k/bands/threshold), restricted to pairs whose later
    member was in some delta — here, all of them."""
    from sinker_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from sinker_spark.operators.dedup_incremental import estimated_jaccard

    corpus = [("a", BASE), ("b", VARIANT), ("c", DISTINCT), ("d", BASE + " tail")]

    idx = IncrementalMinHashIndex(spark, str(tmp_path / "sig"), bands=8, min_est_jaccard=0.5)
    idx.bootstrap(_docs(spark, corpus[:1]))
    seen = set()
    for doc in corpus[1:]:
        for r in idx.update(_docs(spark, [doc])).collect():
            seen.add((r["id_a"], r["id_b"]))

    sigs = minhash_signatures(_docs(spark, corpus), "doc_id", "text")
    cand = lsh_candidate_pairs(sigs, "doc_id", bands=8)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    batch = {
        (r["id_a"], r["id_b"])
        for r in cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", estimated_jaccard("sig_a", "sig_b").alias("j"))
        .where(F.col("j") >= 0.5)
        .collect()
    }
    assert seen == batch


def test_large_delta_merge_is_dataframe_native(spark, tmp_path):
    """A backfill-sized delta (100k changed ids) must flow through
    update() as DataFrame joins — no driver-side id set, no literal-IN
    plan. Guarded two ways: (a) the module source contains no collect()
    and no isin() (the old driver-materializing merge), and (b) a 100k-id
    delta actually runs and leaves the index in the exact expected state."""
    import inspect

    from sinker_spark.operators import dedup_incremental

    src = inspect.getsource(dedup_incremental)
    assert ".collect()" not in src
    assert ".isin(" not in src

    idx = IncrementalMinHashIndex(spark, str(tmp_path / "bigsig"), k=4, bands=2)
    base = spark.range(0, 120_000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("stable shared prefix words here token "), F.col("id")).alias("text"),
    )
    idx.bootstrap(base)
    assert idx.signatures().count() == 120_000

    # delta: re-text 100k existing ids and delete 5k others
    delta = spark.range(0, 100_000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("rewritten body entirely new tokens "), F.col("id")).alias("text"),
    )
    deleted = [f"doc{i}" for i in range(100_000, 105_000)]
    pairs = idx.update(delta, deleted_ids=deleted)
    # merge result: 120k - 5k deleted, with the 100k superseded in place
    assert idx.signatures().count() == 115_000
    assert idx.signatures().select("doc_id").distinct().count() == 115_000
    # the pairs plan is a join pipeline, not a literal IN over batch ids
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert " IN (" not in plan
