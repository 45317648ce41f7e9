"""Operator-level tests for the round-4 scale-pattern lanes: Bloom
filter semantics (no false negatives, equivalence with the exact lane),
SemDeDup greedy keep rule vs a numpy reference, duplicated-span
extraction on handcrafted documents, grid spatial join vs brute force,
JL projection distance preservation, and plan-shape assertions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sinker_spark.operators import bloom, dedup, similarity, spatial, text
from tests.conftest import SF_SMALL


# ---- Bloom filter -------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    keys = spark.createDataFrame([(f"key-{i}",) for i in range(200)], "key string")
    bits = bloom.build_bits(keys, "key", m_bits=4096)
    probed = bloom.probe(keys, "key", bits, m_bits=4096)
    assert probed.where(~F.col("bloom_hit")).count() == 0, "a member key must always hit"


def test_bloom_filters_most_non_members(spark):
    members = spark.createDataFrame([(f"key-{i}",) for i in range(100)], "key string")
    others = spark.createDataFrame([(f"other-{i}",) for i in range(1000)], "key string")
    bits = bloom.build_bits(members, "key", m_bits=65536)
    fp = bloom.probe(others, "key", bits, m_bits=65536).where(F.col("bloom_hit")).count()
    # 100 keys * 4 slices in 65536 bits -> fp rate ~ (1-e^-0.006)^4 ~ 1e-9
    assert fp <= 5, f"false-positive count {fp} far above design rate"


def test_bloom_probe_adds_no_shuffle(spark):
    rows = spark.createDataFrame([(f"k{i}",) for i in range(50)], "key string")
    bits = bloom.build_bits(rows, "key", m_bits=4096)
    plan = (
        bloom.probe(rows, "key", bits, m_bits=4096)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the probe side must reach the output through broadcast joins only;
    # the single exchange allowed is the word-relation build aggregation
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bloom_decontaminate_matches_exact_lane(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    got = {
        r["doc_id"]: r["n_overlap_shingles"]
        for r in bloom.bloom_decontaminate(corpus, bench, n=4, m_bits=65536)
        .where(F.col("is_contaminated"))
        .collect()
    }
    want = {
        r["doc_id"]: r["n_overlap_shingles"]
        for r in text.ngram_decontaminate(corpus, bench, n=4).collect()
    }
    assert got == want, "bloom pre-filter must not change the exact answer"


# ---- SemDeDup -----------------------------------------------------------


def test_semantic_dedup_greedy_rule(spark):
    import numpy as np

    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),   # dup of 1
        (3, [0.0, 1.0, 0.0], 0),      # kept (orthogonal)
        (4, [0.998, 0.02, 0.0], 0),   # dup of 1 (greedy: min lower id)
        (5, [1.0, 0.0, 0.0], 1),      # other cluster: kept
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    out = {r["vec_id"]: (r["is_kept"], r["dup_of"]) for r in similarity.semantic_dedup(df, threshold=0.9).collect()}
    assert out[1] == (True, None)
    assert out[2] == (False, 1)
    assert out[3] == (True, None)
    assert out[4] == (False, 1)
    assert out[5] == (True, None)
    # cross-check every decision against numpy cosine
    vecs = {i: np.array(v) for i, v, _ in rows}
    for i, v, c in rows:
        lower = [
            j for j, w, cj in rows
            if cj == c and j < i
            and round(float(vecs[i] @ vecs[j] / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))), 6) >= 0.9
        ]
        assert out[i][0] == (not lower)


# ---- duplicated spans ---------------------------------------------------


def test_duplicated_spans_handcrafted(spark):
    shared = " ".join(f"s{i}" for i in range(20))  # 20-token shared span
    docs = [
        (1, "a1 a2 a3 " + shared + " z1 z2"),
        (2, "b1 " + shared + " y1 y2 y3"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    spans = dedup.duplicated_spans(df, n=8, min_span=16, df_cap=50).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s["id_a"], s["id_b"]) == (1, 2)
    assert s["span_tokens"] == 20
    assert s["start_a"] == 3 and s["start_b"] == 1


def test_duplicated_spans_df_cap_drops_boilerplate(spark):
    # the same 8-token phrase in many docs is dropped by the df cap
    phrase = " ".join(f"p{i}" for i in range(8))
    docs = [(i, f"u{i} " + phrase + f" v{i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    assert dedup.duplicated_spans(df, n=8, min_span=8, df_cap=5).count() == 0
    assert dedup.duplicated_spans(df, n=8, min_span=8, df_cap=50).count() == 45


# ---- spatial grid join --------------------------------------------------


def test_spatial_grid_matches_brute_force(spark):
    import itertools

    pts = [(i, (i * 37 % 100) / 10.0 - 5.0, (i * 53 % 100) / 5.0 - 10.0) for i in range(80)]
    df = spark.createDataFrame(pts, "id bigint, lat double, lon double")
    got = {
        (r["id_a"], r["id_b"]) for r in spatial.radius_pairs_deg(df, radius_deg=1.5).collect()
    }
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 1.5**2
    }
    assert got == want


def test_spatial_no_cartesian(spark):
    pts = spark.createDataFrame([(1, 0.0, 0.0), (2, 1.0, 1.0)], "id bigint, lat double, lon double")
    plan = spatial.radius_pairs_deg(pts, 1.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) to London (51.5074, -0.1278) ~ 343.5 km
    df = spark.createDataFrame([(48.8566, 2.3522, 51.5074, -0.1278)], "la double, lo double, lb double, lob double")
    km = df.select(
        spatial.haversine_km(F.col("la"), F.col("lo"), F.col("lb"), F.col("lob")).alias("km")
    ).collect()[0]["km"]
    assert abs(km - 343.5) < 1.0


# ---- KL drift -----------------------------------------------------------


def test_kl_zero_for_single_group(spark):
    # one group == the corpus -> p == q for every token -> KL == 0
    docs = [(i, "alpha beta gamma delta", "only") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    rows = text.token_kl_divergence(df, group_col="source").collect()
    assert len(rows) == 1 and abs(rows[0]["kl"]) < 1e-9


def test_kl_positive_for_skewed_group(spark):
    docs = [(i, "alpha alpha alpha alpha", "skew") for i in range(5)] + [
        (100 + i, "beta gamma delta epsilon", "rest") for i in range(5)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    kl = {r["source"]: r["kl"] for r in text.token_kl_divergence(df, group_col="source").collect()}
    assert kl["skew"] > 0.1 and kl["rest"] > 0.1


# ---- JL projection ------------------------------------------------------


def test_jl_projection_preserves_distances_roughly(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    out = similarity.random_projection(df, in_dim=64, out_dim=16).collect()
    proj = np.zeros((40, 16))
    for r in out:
        proj[r["vec_id"], r["j"]] = r["p"]
    # check the projection equals numpy's with the same sign matrix
    signs = np.array(similarity.random_projection_signs(64, 16))
    want = (vecs @ signs.T) / math.sqrt(16)
    assert np.allclose(proj, want, atol=1e-6)
    # JL property: pairwise distance ratios concentrate near 1
    ratios = []
    for i in range(0, 40, 5):
        for j in range(i + 1, 40, 7):
            d_in = np.linalg.norm(vecs[i] - vecs[j])
            d_out = np.linalg.norm(proj[i] - proj[j])
            ratios.append(d_out / d_in)
    assert 0.5 < min(ratios) and max(ratios) < 1.6, (min(ratios), max(ratios))


# ---- RRF fusion ---------------------------------------------------------


def test_rrf_fuse_math(spark):
    a = spark.createDataFrame([(10, 1), (11, 2)], "id bigint, rank int")
    b = spark.createDataFrame([(11, 1), (12, 2)], "id bigint, rank int")
    from sinker_spark.operators.relevance import rrf_fuse

    out = {r["id"]: (r["n_lists"], r["rrf"]) for r in rrf_fuse([a, b]).collect()}
    assert out[11][0] == 2  # in both lists
    assert out[10][0] == 1 and out[12][0] == 1
    # 11 ranks (2,1): 1/62 + 1/61; 10 ranks (1,): 1/61
    assert abs(out[11][1] - (round(1e9 / 62) + round(1e9 / 61)) / 1e9) < 1e-12
    assert abs(out[10][1] - round(1e9 / 61) / 1e9) < 1e-12
    assert out[11][1] > out[10][1] > out[12][1]


# ---- unigram cross-entropy ----------------------------------------------


def test_cross_entropy_uniform_corpus(spark):
    import math

    # 4 docs, 4 distinct tokens each appearing once -> q = 1/4 for all;
    # every doc's cross-entropy is ln(4)
    docs = [(1, "a b"), (2, "c d")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    from sinker_spark.operators.text import unigram_cross_entropy

    rows = unigram_cross_entropy(df).collect()
    for r in rows:
        assert abs(r["cross_entropy"] - math.log(4)) < 1e-6


def test_cross_entropy_rare_tokens_score_higher(spark):
    common = " ".join(["the"] * 20)
    df = spark.createDataFrame(
        [(1, common), (2, common), (3, "xylo quux zarf blorp")],
        "doc_id bigint, text string",
    )
    from sinker_spark.operators.text import unigram_cross_entropy

    ce = {r["doc_id"]: r["cross_entropy"] for r in unigram_cross_entropy(df).collect()}
    assert ce[3] > ce[1], "rare-token doc must be more surprising"


# ---- Z-order ------------------------------------------------------------


def test_zorder_interleave_bits():
    # pure-python reference of the interleave the lane computes
    def z(x, y):
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    # locality property: nearby (x,y) share high bits / stay in-range
    assert z(0, 0) == 0
    assert z(1, 0) == 1 and z(0, 1) == 2 and z(1, 1) == 3
    assert z(0xFFFF, 0xFFFF) == (1 << 32) - 1
    # monotone block property: all points in a 256x256 tile share zval >> 16
    tile = {z(x, y) >> 16 for x in range(256, 260) for y in range(512, 516)}
    assert len(tile) == 1


# ---- MMR rerank ---------------------------------------------------------


def test_mmr_matches_python_greedy(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(12, 8))
    rels = [round(float(x), 6) for x in rng.uniform(0.2, 1.0, 12)]
    df = spark.createDataFrame(
        [(i, rels[i], [float(x) for x in vecs[i]]) for i in range(12)],
        "id bigint, rel double, e array<double>",
    )
    got = similarity.mmr_rerank(df, k=4, lam=0.7)

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    selected, remaining = [], list(range(12))
    for _ in range(4):
        best = None
        for i in remaining:
            ms = max((cos(vecs[i], vecs[j]) for j in selected), default=0.0)
            mmr = round(0.7 * rels[i] - 0.3 * ms, 6)
            cand = (-mmr, i)
            if best is None or cand < best:
                best = cand
        selected.append(best[1])
        remaining.remove(best[1])
    assert [r[1] for r in got] == selected
    # diversity: MMR must not pick two near-identical vectors early when
    # a diverse alternative exists
    dup = np.array(vecs[selected[0]])
    df2 = spark.createDataFrame(
        [(1, 0.9, [float(x) for x in dup]),
         (2, 0.89, [float(x) for x in dup * 1.001]),
         (3, 0.5, [float(x) for x in rng.normal(size=8)])],
        "id bigint, rel double, e array<double>",
    )
    picked = [r[1] for r in similarity.mmr_rerank(df2, k=2, lam=0.5)]
    assert picked == [1, 3], picked
