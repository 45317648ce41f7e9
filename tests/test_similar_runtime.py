"""Non-literal SIMILAR TO: the runtime similar_escape fold
(transpile._similar_runtime_regex_sql — a pure Spark-SQL ``aggregate``
higher-order fold, no UDF) must translate every pattern exactly as the
compile-time literal translator (_similar_to_java_regex) does, and the
transpiler must rewrite expression patterns (column refs, calls, ``||``
chains, NOT, ESCAPE) instead of rejecting them.

Reference parity: PG accepts any expression as the SIMILAR TO pattern
(similar_escape is an ordinary function); the reference promises full
SQL view bodies (README.md:84-85)."""

from __future__ import annotations

import random
import re

import pytest

from sinker_spark.compiler.transpile import (
    _similar_runtime_regex_sql,
    _similar_to_java_regex,
    transpile,
)

ALPHABET = list("ab%_|*+?(){}[].^$\\xy0#")


def _pattern_corpus(n: int, seed: int, escape: str = "\\") -> list[str]:
    """Random SIMILAR TO patterns whose translation compiles in BOTH
    regex engines (Python for the oracle, Java for RLIKE). Filtered out:
    brace quantifiers (validity rules differ between engines) and a
    ``[`` inside a class body (Java nests classes, Python does not) —
    on those the two paths emit the SAME text, so equality holds
    trivially; they just can't be evaluated by both engines."""
    rng = random.Random(seed)
    out: list[str] = []
    while len(out) < n:
        p = "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 8)))
        if escape != "\\" and (escape in p or "[" in p):
            continue
        try:
            body = _similar_to_java_regex(p, escape)
            re.compile("^(?:" + body + ")$")
        except re.error:
            continue
        if any(ch in body for ch in "{}") or re.search(r"\[[^\]]*\[", body):
            continue
        out.append(p)
    return out


def _oracle(p: str, s: str, escape: str = "\\") -> bool:
    # the same wrapping both the literal and runtime paths emit —
    # including the top-level-alternation anchor leak PG shares
    return re.search("^(?:" + _similar_to_java_regex(p, escape) + ")$", s) is not None


@pytest.mark.parametrize("escape", ["\\", "#"])
def test_runtime_fold_matches_literal_translator(spark, escape):
    pats = _pattern_corpus(300, seed=7, escape=escape)
    rng = random.Random(11)
    samples = ["".join(rng.choice("abxy0.%#") for _ in range(rng.randint(0, 6)))
               for _ in range(15)]
    df = spark.createDataFrame(
        [(p, s) for p in pats for s in samples], "p string, s string"
    )
    rows = df.selectExpr(
        "p", "s", f"s RLIKE {_similar_runtime_regex_sql('p', escape)} AS m"
    ).collect()
    bad = [(r["p"], r["s"], r["m"]) for r in rows
           if r["m"] != _oracle(r["p"], r["s"], escape)]
    assert not bad, bad[:5]


def test_transpile_rewrites_expression_patterns(spark):
    spark.createDataFrame(
        [("abc", "ab"), ("abc", "b"), ("a.c", "a."), ("adc", "a.")],
        "x string, p string",
    ).createOrReplaceTempView("simt")
    out = transpile("SELECT x FROM simt WHERE x SIMILAR TO p || '%'")
    assert "similar" not in out.lower() and "RLIKE" in out
    got = sorted(r["x"] for r in spark.sql(out).collect())
    # 'ab%' matches abc; 'a.%' matches a.c literally (dot is literal in
    # SIMILAR TO) — 'b%' and the a./adc pairing do not match
    assert got == ["a.c", "abc"]

    out2 = transpile(
        "SELECT x FROM simt WHERE x NOT SIMILAR TO upper(p) || '%' ESCAPE '#'"
    )
    assert len(spark.sql(out2).collect()) == 4  # no uppercase prefixes match


def test_transpile_literal_patterns_still_compile_time():
    out = transpile("SELECT x FROM simt WHERE x SIMILAR TO 'a%'")
    assert "aggregate(" not in out  # literal path: compile-time regex
    assert "RLIKE" in out


def test_non_literal_escape_still_rejected():
    with pytest.raises(ValueError):
        transpile("SELECT x FROM simt WHERE x SIMILAR TO p ESCAPE e")
