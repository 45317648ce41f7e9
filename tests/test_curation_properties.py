"""Property-based invariants (hypothesis) for the curation/dedup lanes:

1. chunk_dedup conservation: across the whole corpus every distinct
   chunk survives exactly once, and each doc's clean_text is a
   subsequence of its original chunk list (order preserved).
2. weighted_resample multiplicity: per-row replica count is exactly
   floor(w) or ceil(w), expectation-correct and rerun-deterministic.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sinker_spark.operators.curation import weighted_resample
from sinker_spark.operators.text import chunk_dedup

# small token vocabulary forces chunk collisions across documents
token = st.sampled_from(["aa", "bb", "cc", "dd"])
doc_texts = st.lists(
    st.lists(token, min_size=0, max_size=9).map(" ".join), min_size=1, max_size=5
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_texts)
def test_chunk_dedup_conservation_and_order(spark, texts):
    chunk_n = 3
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_tokens=chunk_n).collect()}

    def chunks_of(text: str) -> list[str]:
        toks = [t for t in text.split(" ") if t]
        return [" ".join(toks[i : i + chunk_n]) for i in range(0, len(toks), chunk_n)]

    # survivors across the corpus = exactly the distinct chunk set
    survivors: list[str] = []
    for i, text in enumerate(texts):
        if not chunks_of(text):
            assert i not in out
            continue
        row = out[i]
        kept = row["clean_text"].split(" ") if row["clean_text"] else []
        orig = chunks_of(text)
        assert row["n_chunks"] == len(orig)
        assert row["n_chunks"] - row["n_dup_chunks"] == len(chunks_of(row["clean_text"])) or (
            row["clean_text"] == "" and row["n_dup_chunks"] == row["n_chunks"]
        )
        # order preservation: kept chunks appear in original order
        oi = 0
        for ch in chunks_of(row["clean_text"]):
            while oi < len(orig) and orig[oi] != ch:
                oi += 1
            assert oi < len(orig), f"chunk {ch!r} out of order for doc {i}"
            oi += 1
        survivors.extend(chunks_of(row["clean_text"]))
    all_chunks = [c for t in texts for c in chunks_of(t)]
    assert sorted(set(all_chunks)) == sorted(survivors), "each distinct chunk survives exactly once"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=30),
    w=st.sampled_from([0.0, 0.25, 0.5, 1.0, 1.5, 2.0, 2.75]),
)
def test_weighted_resample_multiplicity_bounds(spark, n, w):
    df = spark.createDataFrame(
        [(i, "s", "t") for i in range(n)], "doc_id bigint, source string, text string"
    )
    out = weighted_resample(df, {"s": w}).collect()
    per_doc: dict[int, int] = {}
    for r in out:
        per_doc[r["doc_id"]] = max(per_doc.get(r["doc_id"], 0), r["replica"])
    lo, hi = math.floor(w), math.ceil(w)
    for copies in per_doc.values():
        assert copies in (lo, hi) and copies > 0
    assert len(out) == sum(per_doc.values())
    # deterministic on rerun
    again = weighted_resample(df, {"s": w}).count()
    assert again == len(out)
