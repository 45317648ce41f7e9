"""Incremental maintenance of MEMBERSHIP views via a mergeable Bloom
word relation — the runtime-filter lane (operators/bloom) joined to the
IVM lane, the same way ivm_hll joins the HLL sketch to it.

Use case: a continuously-maintained "seen set" the rest of the pipeline
probes cheaply — content hashes already ingested (streaming dedup
pre-check), benchmark shingles (decontamination), revoked ids. The view
materializes as ``(word_idx, word)`` rows: at most ``m_bits/32`` of
them regardless of fact size, so the sink-side index is KBs and any
consumer can broadcast it.

Merge rule: bit_or — commutative, associative, idempotent. That makes
per-batch maintenance O(batch) with no fact scan AND replay-safe under
at-least-once delivery (folding the same batch twice is a no-op),
the same monotonicity contract as the HLL register lane. Deletes
cannot clear bits (a bit may be shared); a batch containing DELETE or
UPDATE rows falls back to the authoritative rebuild, exactly like
ivm_hll. Probe-side semantics are unchanged by false positives as long
as consumers treat a hit as "maybe present, verify exact" (the
operators/bloom contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sinker_spark.ivm_delta import DELETE, INSERT, OP_COL
from sinker_spark.operators import bloom


def initial_bloom_state(fact: DataFrame, value_col: str, m_bits: int) -> DataFrame:
    """One-time word-relation build over the fact table:
    ``(word_idx int, word bigint)``."""
    return bloom.build_bits(fact.select(F.col(value_col).alias("key")), "key", m_bits)


def apply_bloom_delta(
    state: DataFrame,
    changes: DataFrame,
    value_col: str,
    m_bits: int,
    op_col: str = OP_COL,
) -> DataFrame:
    """Fold a CDC batch's INSERT rows into the word state (bit_or merge;
    DELETE rows are ignored by contract — see module docstring)."""
    batch = bloom.build_bits(
        changes.where(F.col(op_col) == INSERT).select(F.col(value_col).alias("key")),
        "key",
        m_bits,
    )
    return (
        state.unionByName(batch)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def dirty_membership(changes: DataFrame, op_col: str = OP_COL) -> DataFrame:
    """Rows whose removal may have invalidated set bits (deletes seen) —
    non-empty means the caller must rebuild, mirroring
    ``ivm_hll.dirty_distinct_groups``."""
    return changes.where(F.col(op_col) == DELETE)


def membership_probe(rows: DataFrame, key_col: str, state: DataFrame, m_bits: int) -> DataFrame:
    """Probe arbitrary rows against the maintained filter (broadcast word
    lookups — the probed relation is never shuffled)."""
    return bloom.probe(rows, key_col, state, m_bits)
