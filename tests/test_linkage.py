"""Fuzzy-join / record-linkage operator tests.

The catalog gate proves blocking completeness against the brute-force
DuckDB oracle at sf0.01; these tests pin the operator's semantics on
adversarial micro-cases (every edit kind, unicode, caps, value-space
multiplicities) and the no-Python-in-plan invariant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqltask_spark.operators.linkage import (
    deletion_neighborhood,
    fuzzy_join,
    fuzzy_self_join,
    fuzzy_value_pairs,
)


def _brute_pairs(rows, k):
    """Reference: naive quadratic levenshtein (python)."""
    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(
                    prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (cs != ct),
                ))
            prev = cur
        return prev[-1]

    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            d = lev(sa, sb)
            if d <= k:
                out.add((lo, hi, d))
    return out


CASES = [
    # every edit kind at distance 1 from 'kitten'
    (1, "kitten"), (2, "kitte"), (3, "kittens"), (4, "mitten"),
    # distance-2 relatives
    (5, "kit"), (6, "sitting"), (7, "mittens"),
    # unrelated
    (8, "banana"), (9, ""), (10, "k"),
    # unicode + case sensitivity
    (11, "café"), (12, "cafe"), (13, "Café"),
]


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_self_join_exact_vs_brute(spark, k):
    df = spark.createDataFrame(CASES, ["id", "s"])
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_self_join(df, "id", "s", k=k).collect()
    }
    assert got == _brute_pairs(CASES, k)


def test_fuzzy_self_join_null_and_empty(spark):
    rows = [(1, None), (2, ""), (3, "a"), (4, "ab")]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_self_join(df, "id", "s", k=1).collect()
    }
    # null never matches; ''~'a' (1 ins), 'a'~'ab' (1 ins); ''~'ab' is 2
    assert got == {(2, 3, 1), (3, 4, 1)}


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "carol")], ["id", "s"]
    )
    right = spark.createDataFrame(
        [(10, "alicia"), (20, "bob"), (30, "dave")], ["rid", "t"]
    )
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_join(
            left, right, ("id", "s"), ("rid", "t"), k=2
        ).collect()
    }
    # alice~alicia = 2 (1 sub + 1 ins), bob~bob = 0
    assert got == {(1, 10, 2), (2, 20, 0)}


def test_fuzzy_value_pairs_multiplicities(spark):
    rows = [(i, "red widget") for i in range(5)] + [
        (10, "red widgets"), (11, "red widgets"), (12, "blue bolt"),
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r["a_s"], r["a_n"], r["b_s"], r["b_n"], r["dist"])
        for r in fuzzy_value_pairs(df, "s", k=1).collect()
    }
    # only the distinct-value pair, with multiplicities carried
    assert got == {("red widget", 5, "red widgets", 2, 1)}


def test_max_block_drops_hot_variants(spark):
    # 30 copies of the same value: with max_block=5 every variant
    # block of the hot value is dropped, so NO pairs survive —
    # documented completeness sacrifice above the cap
    rows = [(i, "hot") for i in range(30)] + [(100, "cold"), (101, "colt")]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r["a_id"], r["b_id"])
        for r in fuzzy_self_join(
            df, "id", "s", k=1, max_block=5
        ).collect()
    }
    assert got == {(100, 101)}


def test_deletion_neighborhood_sizes(spark):
    df = spark.createDataFrame([("abcd",)], ["s"])
    n1, n2 = df.select(
        F.size(deletion_neighborhood("s", 1)).alias("n1"),
        F.size(deletion_neighborhood("s", 2)).alias("n2"),
    ).first()
    # k=1: itself + 4 single deletions; k=2: + C(4,2)=6 doubles
    assert n1 == 5
    assert n2 == 11
    with pytest.raises(ValueError):
        deletion_neighborhood("s", 3)


def test_linkage_plan_stays_jvm(spark):
    """No Python evaluation anywhere — neighborhoods are higher-order
    functions, the verify is the codegen levenshtein builtin."""
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], ["id", "s"])
    plan = fuzzy_self_join(df, "id", "s", k=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_trigram_value_pairs_exact(spark):
    from sqltask_spark.operators.linkage import trigram_value_pairs

    rows = (
        [(i, "red widget") for i in range(3)]
        + [(10, "red wing"), (11, "widget red"), (12, "zzz"), (13, "ab")]
    )
    df = spark.createDataFrame(rows, ["id", "s"])

    def tgs(s):
        return {s[i:i + 3] for i in range(len(s) - 2)}

    def jm(a, b):
        c = len(tgs(a) & tgs(b))
        return (1000 * c) // len(tgs(a) | tgs(b)) if c else 0

    got = {
        (r["a_s"], r["a_n"], r["b_s"], r["b_n"], r["jacc_milli"])
        for r in trigram_value_pairs(df, "s", min_jaccard_milli=1).collect()
    }
    names = {"red widget": 3, "red wing": 1, "widget red": 1, "zzz": 1}
    want = set()
    for a in names:
        for b in names:
            if a < b and jm(a, b) >= 1:
                want.add((a, names[a], b, names[b], jm(a, b)))
    assert got == want
    # word-swap pair ranks HIGH by trigram jaccard (shared content)
    # while its edit distance is large — the complementary signal
    swap = next(
        r for r in got if {r[0], r[2]} == {"red widget", "widget red"}
    )
    assert swap[4] >= 400  # 5 shared of 11 union trigrams = 454
    # <3-char values have no trigrams and never pair
    assert not any("ab" in (r[0], r[2]) for r in got)


def test_trigram_max_block_stop_grams(spark):
    from sqltask_spark.operators.linkage import trigram_value_pairs

    # the four filler values share ONLY the grams from their 'xxxx '
    # prefix (each in 4 values > cap 3 → dropped), so capping kills
    # every filler pair, while the near-identical pair sharing rare
    # grams (count 2 <= cap) survives
    rows = [
        (1, "xxxx abc"), (2, "xxxx def"), (3, "xxxx ghi"),
        (4, "xxxx jkl"), (5, "qrstu aax"), (6, "qrstu aay"),
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r["a_s"], r["b_s"])
        for r in trigram_value_pairs(
            df, "s", min_jaccard_milli=1, max_block=3
        ).collect()
    }
    assert got == {("qrstu aax", "qrstu aay")}
