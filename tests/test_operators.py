"""Operator-level tests beyond the oracle gate: SimHash vs a pure-Python
reference, MinHash LSH recall on injected near-duplicates, the as-of join
edge cases, and the multimodal mapInPandas pipeline."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sinker_spark.operators import dedup, multimodal, similarity
from sinker_spark.operators.asof import asof_join


# ---- SimHash ------------------------------------------------------------
def _py_simhash60(text: str) -> int:
    votes = [0] * 60
    for tok in set(t for t in text.split(" ") if t):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for b in range(60):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(60):
        if votes[b] > 0:
            sig |= 1 << b
    return sig


def test_simhash_matches_python_reference(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}
    for doc_id, text in docs:
        assert got[doc_id] == _py_simhash60(text), doc_id


def test_simhash_near_dups_finds_close_pairs(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # 1-token diff
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.simhash_near_dups(df, max_hamming=20).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


# ---- MinHash LSH --------------------------------------------------------
def test_minhash_lsh_recalls_injected_near_dups(spark):
    base = "spark catalyst tungsten shuffle partition broadcast join aggregate window stream batch codegen"
    docs = [
        (1, base),
        (2, base.replace("codegen", "pipeline")),  # high-jaccard near-dup
        (3, "entirely different vocabulary with no shared shingles at all whatsoever in this document"),
        (4, base),  # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.minhash_near_dups(df, threshold=0.3).collect()}
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.3
    assert not any(3 in p for p in pairs)


def test_exact_dedup_canonical_choice(spark):
    df = spark.createDataFrame(
        [(5, "same text"), (2, "same text"), (9, "other")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in dedup.exact_dedup(df).collect()}
    assert rows[2]["is_canonical"] and rows[2]["canonical_id"] == 2
    assert not rows[5]["is_canonical"] and rows[5]["canonical_id"] == 2
    assert rows[9]["is_canonical"]


# ---- as-of join ---------------------------------------------------------
def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 09:00:00"), (3, 20, "2024-01-01 12:00:00")],
        "event_id bigint, user_id bigint, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 09:30:00", "a"), (10, "2024-01-01 10:00:00", "b"), (30, "2024-01-01 00:00:00", "z")],
        "user_id bigint, ts string, tag string",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "tag")

    out = {r["event_id"]: r for r in
           asof_join(left, right, key="user_id", left_ts="ts", right_ts="ts",
                     payload={"tag": "tag"}).collect()}
    # inclusive: ts == left_ts matches (event 1 sees the 10:00 'b' row)
    assert out[1]["tag"] == "b"
    # event 2 at 09:00 predates all right rows for user 10 → null
    assert out[2]["asof_ts"] is None and out[2]["tag"] is None
    # user 20 has no right rows at all → null, row still present
    assert out[3]["asof_ts"] is None
    assert len(out) == 3


# ---- multimodal ---------------------------------------------------------
def test_multimodal_pipeline(spark):
    docs = spark.createDataFrame(
        [(1, "hello world payload"), (2, "another binary payload body")],
        "doc_id bigint, text string",
    )
    mm = multimodal.attach_binary_payload(docs, "doc_id", "text", "image/fake")
    assert dict(mm.dtypes)["payload"] == "binary"

    feats = multimodal.decode_image_features(mm, fake=True)
    rows = {r["id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert r["n_bytes"] > 0 and r["media_type"] == "image/fake"
    # deterministic: same payload → same fake decode
    again = {r["id"]: r for r in multimodal.decode_image_features(mm, fake=True).collect()}
    assert {k: (v["width"], v["height"], v["mean_intensity"]) for k, v in rows.items()} == {
        k: (v["width"], v["height"], v["mean_intensity"]) for k, v in again.items()
    }

    frames = multimodal.frame_sample(mm).collect()
    assert all(f_["byte_offset"] % 64 == 0 for f_ in frames)
    assert {f_["id"] for f_ in frames} == {1, 2}

    resized = {r["id"]: r for r in multimodal.resize_images(mm, max_side=8, fake=True).collect()}
    assert set(resized) == {1, 2}
    for rid, r in resized.items():
        assert max(r["width"], r["height"]) <= 8 and min(r["width"], r["height"]) >= 1
        assert 0 < len(bytes(r["payload"])) <= rows[rid]["n_bytes"]
    # aspect ratio preserved within integer truncation
    for rid, r in resized.items():
        w0, h0 = rows[rid]["width"], rows[rid]["height"]
        assert abs(r["width"] / r["height"] - w0 / h0) < 0.5


def test_multimodal_real_codec_gated(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    mm = multimodal.attach_binary_payload(docs, "doc_id", "text", "image/png")
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; gate not exercised")
    except ImportError:
        with pytest.raises(NotImplementedError, match="image codec not available"):
            multimodal.decode_image_features(mm, fake=False)


def test_int8_quantization_error_bound(spark):
    """Round-trip error of int8 scalar quantization ≤ scale/254 per dim
    (half a code step) — the property PLANS/SCALING claim for the 4x
    memory saving."""
    from sinker_spark.queries import REGISTRY, _load
    from sinker_spark.catalog import load_tables
    from tests.conftest import SF_SMALL

    _load()
    rows = REGISTRY["embedding_quantize_int8"].fn(spark, SF_SMALL).collect()
    emb = {r["vec_id"]: r["embedding"] for r in load_tables(spark, SF_SMALL)["embeddings"].collect()}
    assert len(rows) == len(emb)
    for r in rows[:50]:
        scale = r["scale"]
        codes = [int(c) for c in r["q"].split(",")]
        assert len(codes) == len(emb[r["vec_id"]])
        for code, orig in zip(codes, emb[r["vec_id"]]):
            assert -127 <= code <= 127
            assert abs(code / 127.0 * scale - orig) <= scale / 254.0 + 1e-9


# ---- similarity sanity beyond the oracle --------------------------------
def test_cosine_self_similarity(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0]), (2, [-1.0, -2.0, -3.0])],
                               "vec_id bigint, embedding array<float>")
    top = similarity.brute_force_topk(df, df, k=1).collect()
    by_q = {r["qid"]: r for r in top}
    assert by_q[1]["nid"] == 2 and by_q[1]["sim"] == -1.0  # antiparallel


def test_repetition_signals_edge_cases(spark):
    from sinker_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # degenerate repetition
            (2, "one two three four"),  # all unique
            (3, "solo"),              # < 2 tokens: no bigrams
            (4, ""),                  # empty text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in T.repetition_signals(df).collect()}
    # doc 1: bigrams = [a b, b a, a b, b a, a b] → top 'a b' 3/5, all dup
    assert out[1]["top_bigram_frac"] == 0.6 and out[1]["dup_bigram_frac"] == 1.0
    assert out[1]["uniq_token_ratio"] == round(2 / 6, 6)
    # doc 2: three distinct bigrams, no repeats
    assert out[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_bigram_frac"] == 0.0 and out[2]["uniq_token_ratio"] == 1.0
    # docs without bigrams keep zeroed fractions
    for d in (3, 4):
        assert out[d]["top_bigram_frac"] == 0.0 and out[d]["dup_bigram_frac"] == 0.0
    assert out[3]["n_tokens"] == 1 and out[4]["n_tokens"] == 0


def test_ngram_decontaminate_flags_only_overlaps(spark):
    from sinker_spark.operators import text as T

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta zeta")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_overlap_shingles"] for r in T.ngram_decontaminate(corpus, bench, n=4).collect()}
    # doc 1 shares exactly one 4-gram ('alpha beta gamma delta'); doc 2 none
    assert out == {1: 1}


def test_kmeans_matches_numpy_lloyds(spark):
    import numpy as np

    from sinker_spark.operators.similarity import kmeans

    rng = np.random.RandomState(7)
    # 3 well-separated blobs in 4-d
    blobs = np.vstack(
        [rng.randn(20, 4) * 0.1 + center for center in ([0, 0, 0, 0], [5, 5, 5, 5], [-5, 5, -5, 5])]
    )
    rows = [(i, [float(x) for x in blobs[i]]) for i in range(len(blobs))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assigned, centroids = kmeans(df, k=3, iterations=4)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    # numpy replica: same deterministic init (k lowest-id vectors, which the
    # float32 round-trip makes float32-precision), same update rule
    x = blobs.astype(np.float32).astype(np.float64)
    cents = x[:3].copy()
    for _ in range(4):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for c in range(3):
            if (lab == c).any():
                cents[c] = x[lab == c].mean(axis=0)
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    assert [got[i] for i in range(len(blobs))] == list(want)
    # each blob lands in one cluster
    assert len({got[i] for i in range(20)}) == 1
    assert len({got[i] for i in range(20, 40)}) == 1
    assert len({got[i] for i in range(40, 60)}) == 1


def test_trained_ivf_recall_vs_brute_force(spark):
    """IVF over learned k-means cells must recover most of brute-force's
    true top-k: on well-separated blobs, recall should be perfect (each
    blob is one cell); nprobe=1 misses only cross-cell neighbors."""
    import numpy as np

    from sinker_spark.operators.similarity import brute_force_topk, ivf_topk, kmeans

    rng = np.random.RandomState(3)
    blobs = np.vstack([rng.randn(15, 8) * 0.05 + c for c in (np.ones(8), -np.ones(8))])
    rows = [(i, [float(x) for x in blobs[i]]) for i in range(len(blobs))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    assigned, _ = kmeans(df, k=2, iterations=3)
    with_cell = df.join(assigned.select("vec_id", "cluster"), "vec_id")
    qs = with_cell.where(F.col("vec_id") % 10 == 0)

    ivf = {(r["qid"], r["nid"]) for r in ivf_topk(with_cell, qs, k=3, cell_col="cluster").collect()}
    bf = {
        (r["qid"], r["nid"])
        for r in brute_force_topk(df, qs.drop("cluster"), k=3).collect()
    }
    recall = len(ivf & bf) / len(bf)
    assert recall == 1.0, (recall, sorted(bf - ivf))


def test_kmeans_clamps_k_to_distinct_rows(spark):
    from sinker_spark.operators.similarity import kmeans

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0])], "vec_id long, embedding array<double>"
    )
    assigned, centroids = kmeans(df, k=8, iterations=3)
    assert len(centroids) == 2  # clamped from 8
    rows = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert rows[1] != rows[2]

    import pytest

    with pytest.raises(ValueError, match="no rows"):
        kmeans(df.where("vec_id < 0"), k=4)


def test_sliding_znorm_rejects_constant_pattern(spark):
    import pytest

    from sinker_spark.operators.timeseries import sliding_znorm_match

    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0)], "user_id long, ts long, value double"
    )
    with pytest.raises(ValueError, match="non-zero variance"):
        sliding_znorm_match(df, [3.0, 3.0, 3.0], order_cols=("ts",))
    with pytest.raises(ValueError, match="non-zero variance"):
        sliding_znorm_match(df, [3.0], order_cols=("ts",))


def test_banded_sign_lsh_balances_skewed_corpus(spark):
    """Post-LayerNorm-style corpus: every dimension strictly positive.
    Raw axis-sign LSH collapses ALL vectors into the single all-ones
    bucket (O(n²) verify); difference-hyperplane bands stay balanced."""
    import random

    from sinker_spark.operators import similarity

    rng = random.Random(7)
    n, dim = 400, 32
    rows = [(i, [rng.uniform(0.1, 1.0) for _ in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # old axis-sign scheme: one mega-bucket
    from pyspark.sql import functions as F

    axis = df.select(similarity.sign_signature(F.col("embedding"), 16).alias("sig"))
    assert axis.distinct().count() == 1

    # banded difference hyperplanes: worst bucket is a small fraction of n
    keyed = similarity.banded_sign_keys(df, bits=6, bands=4)
    sizes = keyed.groupBy("band", "key").count()
    worst = sizes.agg(F.max("count")).first()[0]
    n_buckets = sizes.count()
    assert n_buckets > 20          # real spread, not a handful of buckets
    assert worst < n * 0.2         # no mega-bucket (axis-sign gives worst == n)


def test_bucket_cap_salt_split_bounds_join_size(spark):
    """Adversarial corpus where even hyperplane buckets collide (all
    vectors identical up to tiny noise): bucket_cap splits each oversized
    bucket into salt groups no larger than ~cap, and the pair join still
    returns near-dup pairs (within-salt survivors)."""
    import random

    from pyspark.sql import functions as F

    from sinker_spark.operators import similarity

    rng = random.Random(11)
    base = [rng.uniform(0.5, 1.0) for _ in range(16)]
    rows = [(i, [x + rng.uniform(-1e-6, 1e-6) for x in base]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cap = 20
    keyed = similarity.banded_sign_keys(df, bits=6, bands=2)
    sizes = keyed.groupBy("band", "key").agg(F.count("*").alias("_n"))
    salted = keyed.join(sizes, ["band", "key"]).withColumn(
        "salt",
        F.when(
            F.col("_n") > cap,
            F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.ceil(F.col("_n") / cap)),
        ).otherwise(F.lit(0)),
    )
    worst_salted = salted.groupBy("band", "key", "salt").count().agg(F.max("count")).first()[0]
    assert worst_salted < 200  # split actually happened
    assert worst_salted <= cap * 3  # hash split is approximate, but bounded

    out = similarity.sign_banded_near_dups(df, threshold=0.99, bits=6, bands=2, bucket_cap=cap)
    got = out.limit(5).collect()
    assert got and all(r["sim"] >= 0.99 for r in got)


def test_multimodal_stages_add_no_exchange_or_extra_scan(spark):
    """decode/resize insert NO repartition (no Exchange) and trigger no
    eager job at plan-build time: Arrow batches bound Python memory, so
    the old count()+repartition pass over the binary column is gone."""
    from pyspark.sql import functions as F

    from sinker_spark.operators import multimodal

    base = spark.range(8).select(
        F.col("id"), F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias("raw")
    )
    mm = multimodal.attach_binary_payload(base, "id", "raw", "image/png")
    for stage in (
        multimodal.decode_image_features(mm, fake=True),
        multimodal.resize_images(mm, max_side=8, fake=True),
    ):
        plan = stage._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    # explicit opt-in still reshuffles
    forced = multimodal.decode_image_features(mm, fake=True, num_partitions=4)
    assert "Exchange" in forced._jdf.queryExecution().executedPlan().toString()


# ---- chunk-level dedup (substring-dedup shape) --------------------------
def test_chunk_dedup_removes_cross_doc_repeats(spark):
    from sinker_spark.operators.text import chunk_dedup

    a = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"          # one exact 10-token chunk
    df = spark.createDataFrame(
        [(1, a + " unique tail tokens here"),      # first occurrence wins
         (2, a + " different suffix entirely"),    # shares chunk 0 with doc 1
         (3, "totally fresh content nothing shared")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_tokens=10).collect()}
    assert out[1]["n_dup_chunks"] == 0
    assert out[1]["clean_text"].startswith(a)
    assert out[2]["n_dup_chunks"] == 1            # chunk 0 seen in doc 1 first
    assert a not in out[2]["clean_text"]
    assert out[2]["clean_text"] == "different suffix entirely"
    assert out[3]["n_dup_chunks"] == 0
    assert out[3]["clean_text"] == "totally fresh content nothing shared"


def test_chunk_dedup_intra_doc_repeat(spark):
    from sinker_spark.operators.text import chunk_dedup

    rep = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(7, rep + " " + rep)], "doc_id bigint, text string")
    row = chunk_dedup(df, chunk_tokens=10).collect()[0]
    assert row["n_chunks"] == 2 and row["n_dup_chunks"] == 1
    assert row["clean_text"] == rep


def test_cms_estimates_never_undercount(spark):
    from sinker_spark.queries import REGISTRY, _load
    from tests.conftest import SF_SMALL

    _load()
    rows = REGISTRY["cms_manual_estimates"].fn(spark, SF_SMALL).collect()
    assert rows
    assert all(r["est"] >= r["true_cnt"] for r in rows)


def test_native_cms_estimates_within_bounds(spark):
    """Probe the NATIVE count_min_sketch bytes (the gate lane hash-checks
    only the header): deserialize via the JVM sketch API and assert the
    CMS contract per token — estimate >= exact always, and estimate <=
    exact + ceil(eps * totalCount) for the heavy hitters (eps=0.01,
    conf=0.99; deterministic here since data and seed are fixed)."""
    import math

    from sinker_spark.catalog import load_tables
    from sinker_spark.queries import _load
    from tests.conftest import SF_SMALL

    _load()
    from pyspark.sql import functions as F

    toks = (
        load_tables(spark, SF_SMALL)["documents"]
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    sk_bytes = toks.agg(
        F.expr("count_min_sketch(token, CAST(0.01 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").alias("s")
    ).collect()[0]["s"]
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        spark._jvm.java.io.ByteArrayInputStream(bytes(sk_bytes))
    )
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
        .collect()
    )
    assert top and cms.totalCount() == toks.count()
    slack = math.ceil(0.01 * cms.totalCount())
    for r in top:
        est = cms.estimateCount(r["token"])
        assert r["n"] <= est <= r["n"] + slack, (r["token"], r["n"], est)


def test_weighted_resample_multiplicities(spark):
    from sinker_spark.operators.curation import weighted_resample

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", "x") for i in range(200)], "doc_id bigint, source string, text string"
    )
    out = weighted_resample(df, {"s0": 3.0, "s1": 0.0}).collect()
    # s0: exactly 3 replicas per doc (integer weight, no Bernoulli part)
    per_doc = {}
    for r in out:
        assert r["source"] == "s0"
        per_doc.setdefault(r["doc_id"], []).append(r["replica"])
    assert len(per_doc) == 100
    assert all(sorted(v) == [1, 2, 3] for v in per_doc.values())
    # fractional weight: expected count ~ w * n, deterministic across reruns
    out2 = weighted_resample(df, {"s0": 1.5, "s1": 1.0})
    n1 = out2.count()
    assert n1 == weighted_resample(df, {"s0": 1.5, "s1": 1.0}).count()
    assert 200 < n1 < 300  # 100*1.5 + 100*1.0 in expectation = 250


def test_token_budget_cap_inclusive_boundary(spark):
    from sinker_spark.operators.curation import token_budget_cap

    df = spark.createDataFrame(
        [(i, "only", "a b c d e") for i in range(10)],  # 5 tokens each
        "doc_id bigint, source string, text string",
    )
    kept = token_budget_cap(df, budget_tokens=25).collect()
    assert len(kept) == 5  # 5 docs * 5 tokens fill the budget exactly
    assert max(r["cum_tokens"] for r in kept) == 25
    # determinism: same keep-set on rerun
    again = token_budget_cap(df, budget_tokens=25).collect()
    assert {r["doc_id"] for r in kept} == {r["doc_id"] for r in again}


def test_quantized_rerank_recall_vs_brute_force(spark):
    from sinker_spark.catalog import load_tables
    from tests.conftest import SF_SMALL

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r["qid"], r["nid"]) for r in similarity.brute_force_topk(emb, queries, k=5).collect()}
    two_stage = {(r["qid"], r["nid"])
                 for r in similarity.quantized_rerank_topk(emb, queries, k=5, prefilter=25).collect()}
    # int8 prefilter at 25 candidates should recover most exact neighbors
    assert len(two_stage & exact) / len(exact) >= 0.8
    # every rank list is exactly k long
    from collections import Counter
    per_q = Counter(q for q, _ in two_stage)
    assert all(v == 5 for v in per_q.values())


def test_bm25_ranking_properties(spark):
    """BM25 sanity on a controlled corpus: rarer terms score higher (idf),
    higher tf scores higher, and longer docs are penalized (length norm)."""
    from sinker_spark.operators.relevance import bm25_scores

    docs = [
        (1, "rare common filler filler"),
        (2, "common filler filler filler"),
        (3, "rare rare common filler"),
        (4, "rare " + "filler " * 40),  # long doc, one hit
        (5, "common words everywhere common"),
        (6, "no query words at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["id"]: r for r in bm25_scores(df, ["rare", "common"]).collect()}
    assert 6 not in out                      # no hits → no row
    assert out[3]["score"] > out[1]["score"]  # extra rare hit raises the score
    assert out[1]["score"] > out[2]["score"]  # rare term (higher idf) outranks common-only
    # length normalization: same tf of 'rare', much longer doc scores lower
    one_rare_short = bm25_scores(df, ["rare"]).collect()
    scores = {r["id"]: r["score"] for r in one_rare_short}
    assert scores[1] > scores[4]


def test_hll_manual_error_bound(spark):
    """The 64-register HLL estimate must land within ~3 standard errors
    (1.04/sqrt(64) ≈ 13% → 39%) of the exact distinct count per group."""
    from sinker_spark.queries import REGISTRY, _load
    from tests.conftest import SF_SMALL

    _load()
    rows = REGISTRY["hll_manual_distinct_customers"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        exact = r["exact_distinct"]
        assert exact > 0
        assert abs(r["hll_estimate"] - exact) / exact <= 0.39, r


def test_hll_linear_counting_branch_engine_parity(spark):
    """The small-range (linear counting) branch is float math — assert
    Spark and DuckDB produce bit-identical estimates for every possible
    zero-register count v in 1..63 under the shared floor-rounding."""
    import duckdb

    expr = (
        "CAST(FLOOR((CAST(64.0 AS DOUBLE) * ln(CAST(64.0 AS DOUBLE) / CAST(v AS DOUBLE)))"
        " * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        " / CAST(10000.0 AS DOUBLE)"
    )
    sp = {
        r["v"]: r["e"]
        for r in spark.sql(
            f"SELECT v, {expr} AS e FROM (SELECT explode(sequence(1, 63)) AS v)"
        ).collect()
    }
    du = dict(
        duckdb.sql(
            f"SELECT v, {expr} AS e FROM (SELECT unnest(range(1, 64)) AS v)"
        ).fetchall()
    )
    assert sp == du


def test_approx_percentile_exactness_regime_boundaries(spark):
    """approx_percentile with accuracy >> n must return the identical
    discrete order statistic as DuckDB's quantile_disc — including the
    integral-rank boundary cases that could expose definition drift."""
    import duckdb

    for n in (4, 5, 6, 10, 101):
        vals = [float(i + 1) for i in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        sp = df.agg(
            F.percentile_approx("x", [0.25, 0.5, 0.75, 0.95], 1000000).alias("p")
        ).collect()[0]["p"]
        du = duckdb.sql(
            "SELECT [quantile_disc(x,0.25),quantile_disc(x,0.5),"
            "quantile_disc(x,0.75),quantile_disc(x,0.95)] "
            f"FROM (SELECT unnest({vals}) AS x)"
        ).fetchall()[0][0]
        assert list(sp) == [float(v) for v in du], n


def test_pq_encode_shape_and_reconstruction_monotonicity(spark):
    """PQ codes: one code per (vector, subspace); codebook members encode
    to themselves with zero error; qerr is the exact per-subspace argmin
    (never beaten by any other centroid)."""
    from sinker_spark.catalog import load_tables
    from tests.conftest import SF_SMALL

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    codes = similarity.pq_encode(emb, m=8, sub_dim=8, codebook_k=16)
    n = emb.count()
    assert codes.count() == n * 8
    # codebook vectors are their own nearest centroid, dist 0
    own = codes.where((F.col("vec_id") < 16)).collect()
    assert all(r["code"] == r["vec_id"] and r["dist"] == 0.0 for r in own)
    # argmin property: stored dist <= every candidate distance
    cb = similarity.pq_codebook(emb, m=8, sub_dim=8, codebook_k=16)
    d = similarity.pq_distances(emb, cb, m=8, sub_dim=8)
    joined = codes.alias("k").join(
        d.alias("d"), ["vec_id", "m"]
    ).where(F.col("d.dist") < F.col("k.dist"))
    assert joined.count() == 0


def test_pq_adc_recall_vs_exact_l2(spark):
    """ADC approximates EXACT L2 top-k (same metric it quantizes — cosine
    is a different ranking unless vectors are normalized): with a
    16-entry sampled codebook over the 500-vector gate corpus it should
    place a solid fraction of the true top-5, and every rank list stays
    exactly k long."""
    from collections import Counter

    from pyspark.sql.window import Window

    from sinker_spark.catalog import load_tables
    from sinker_spark.operators.similarity import _sq_dist
    from tests.conftest import SF_SMALL

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").cast("array<double>").alias("qv"))
    c = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").cast("array<double>").alias("nv"))
    w = Window.partitionBy("qid").orderBy("d", "nid")
    exact_df = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(_sq_dist(F.col("qv"), F.col("nv")), 6).alias("d"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    exact = {(r["qid"], r["nid"]) for r in exact_df.collect()}
    adc_rows = similarity.pq_adc_topk(emb, queries, k=5).collect()
    adc = {(r["qid"], r["nid"]) for r in adc_rows}
    per_q = Counter(q_ for q_, _ in adc)
    assert sorted(per_q) == sorted({q_ for q_, _ in exact})
    assert all(v == 5 for v in per_q.values())
    # random 64-dim gate vectors have no cluster structure, so a 16-entry
    # sampled codebook is maximally unfavorable — demand only a weak edge
    # over the ~1% random-pair baseline
    assert len(adc & exact) / len(exact) >= 0.1

    # the ADC identity (Jégou et al. 2011 Eq. 13): adist IS the exact
    # squared L2 between the query and the neighbor's RECONSTRUCTION
    # (codebook centroids concatenated per stored code) — up to the
    # per-subspace 1e-6 rounding, i.e. ≤ 8e-6 total
    cb = similarity.pq_codebook(emb)
    codes = similarity.pq_encode(emb)
    recon = (
        codes.join(cb, (codes["m"] == cb["m"]) & (codes["code"] == cb["cid"]))
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(codes["m"], F.col("c")))),
                    lambda s: s["c"],
                )
            ).alias("rv")
        )
    )
    rmap = {r["vec_id"]: r["rv"] for r in recon.collect()}
    qmap = {r["qid"]: r["qv"] for r in q.collect()}
    for r in adc_rows:
        qv, rv = qmap[r["qid"]], rmap[r["nid"]]
        exact_d = sum((a - b) * (a - b) for a, b in zip(qv, rv))
        assert abs(exact_d - r["adist"]) < 1e-4, (r["qid"], r["nid"], exact_d, r["adist"])


def test_gopher_rules_each_rule_fires(spark):
    """Crafted docs trip each Gopher gate independently; a good doc
    passes all of them."""
    from sinker_spark.operators.text import gopher_rules

    good = "the quick brown fox jumps over lazy dogs " * 4  # 36 words, has 'the'
    docs = [
        (1, good.strip()),
        (2, "too short text"),                                   # word count low
        (3, ("word " * 100).strip()),                            # word count high
        (4, ("the " + "ab " * 30).strip()),                      # mean word len < 3
        (5, ("the " + "extraordinarily-hyphenated-compound " * 30).strip()),  # mean/max len high
        (6, ("the " + "1234 " * 30).strip()),                    # alpha ratio low
        (7, ("fox " * 30).strip()),                              # no function words
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["passes"]
    assert not out[2]["ok_word_count"] and not out[2]["passes"]
    assert not out[3]["ok_word_count"]
    assert not out[4]["ok_mean_word_len"]
    assert not out[5]["ok_mean_word_len"] and not out[5]["ok_max_word_len"]
    assert not out[6]["ok_alpha_ratio"]
    assert not out[7]["ok_stopwords"]


def test_bpe_train_learns_expected_merges(spark):
    """Hand-checkable corpus: 'low' x4 + 'lower' x2 + 'new' x3. First
    merge must be the most frequent adjacent pair with lexicographic
    tiebreak, and merges compose (learned symbols join later pairs)."""
    from sinker_spark.operators.text import bpe_train

    docs = [(1, "low low lower new"), (2, "low lower new new"), (3, "low")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [(r["step"], r["a"], r["b"], r["merged"], r["pair_count"]) for r in
           bpe_train(df, merges=3).orderBy("step").collect()]

    # python reference implementation of the same greedy algorithm
    vocab = {"low": 4, "lower": 2, "new": 3}
    words = {w: [*w, "</w>"] for w in vocab}
    expect = []
    for step in range(1, 4):
        counts: dict[tuple, int] = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + vocab[w]
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((step, a, b, a + b, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    assert got == expect


def test_logreg_gd_learns_separable_data(spark):
    """GD on linearly separable data: loss far below the 0-weight
    baseline (ln 2), accuracy near 1, and sign of the learned slope
    matches the generating rule."""
    from sinker_spark.operators.ml import logreg_gd

    rows = [(x / 10.0, 0.0, 1.0 if x >= 0 else 0.0) for x in range(-50, 50)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    out = logreg_gd(df, ["x1", "x2"], "y", iterations=10, lr=1.0).collect()[0]
    assert out["n"] == 100
    assert out["w1"] > 0.5          # positive slope on the separating feature
    assert out["log_loss"] < 0.45   # well under ln2 ≈ 0.693
    assert out["accuracy"] >= 0.95
    # determinism: identical rerun
    again = logreg_gd(df, ["x1", "x2"], "y", iterations=10, lr=1.0).collect()[0]
    assert out == again


def test_ivfpq_residual_beats_raw_pq_reconstruction(spark):
    """Residual encoding is the point of IVF-PQ: with the same codebook
    budget, quantization error on residuals (vectors centered on their
    cell centroid) must be lower on average than raw-vector PQ error;
    rank lists stay exactly k long and stay within the query's cell."""
    from sinker_spark.catalog import load_tables
    from tests.conftest import SF_SMALL

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)

    out = similarity.ivfpq_residual_topk(emb, queries, k=5).collect()
    from collections import Counter
    per_q = Counter(r["qid"] for r in out)
    assert all(v == 5 for v in per_q.values()) and len(per_q) == 10
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in out:
        assert labels[r["nid"]] == labels[r["qid"]]  # nprobe=1: same cell only

    # mean quantization error: residual PQ < raw PQ (same codebook size)
    cents = similarity.cell_centroids(emb)
    resid = (
        emb.join(F.broadcast(cents), F.col("label") == F.col("cell"))
        .select(
            "vec_id",
            F.zip_with(
                F.col("embedding").cast("array<double>"), F.col("cvec"), lambda a, b: a - b
            ).alias("rvec"),
        )
    )
    raw_err = (
        similarity.pq_encode(emb).agg(F.avg("dist")).collect()[0][0]
    )
    res_err = (
        similarity.pq_encode(resid, vec_col="rvec").agg(F.avg("dist")).collect()[0][0]
    )
    assert res_err < raw_err, (res_err, raw_err)


def test_multiprobe_recall_dominates_single_probe(spark):
    """nprobe=2 must recover at least as much of the exact top-5 as
    nprobe=1 (its candidate set is a superset), and both rank lists stay
    exactly k long."""
    from collections import Counter

    from sinker_spark.catalog import load_tables
    from tests.conftest import SF_SMALL

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r["qid"], r["nid"]) for r in similarity.brute_force_topk(emb, queries, k=5).collect()}
    p1 = {(r["qid"], r["nid"]) for r in similarity.ivf_topk(emb, queries, k=5).collect()}
    p2 = {(r["qid"], r["nid"]) for r in similarity.ivf_multiprobe_topk(emb, queries, k=5, nprobe=2).collect()}
    assert len(p2 & exact) >= len(p1 & exact)
    per_q = Counter(q for q, _ in p2)
    assert all(v == 5 for v in per_q.values())
