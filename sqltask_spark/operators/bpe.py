"""Distributed BPE merge learning — train a byte-pair-encoding
tokenizer's merge table on a Spark corpus.

The classic Sennrich et al. (2016) algorithm, re-expressed for the
cluster: the corpus collapses to a (word, freq) table (vocabulary-
sized, tiny next to the corpus), each word becomes its symbol
sequence, and every merge round is

  1. one distributed pair census — adjacent-symbol pairs exploded
     JVM-side and summed with map-side combine, weighted by word
     freq;
  2. a 1-row driver collect of the argmax pair (deterministic
     tie-break: freq desc, then pair lexicographic);
  3. one JVM-side fold (``F.aggregate``) that rewrites every word's
     symbol sequence left-to-right, exactly the greedy merge order
     reference BPE uses.

Nothing corpus-sized ever reaches the driver: the census is the only
shuffle per round and the collect is a single row. The returned merge
table itself is ``n_merges`` rows. No reference-counterpart: the
reference engine (villebro/sqltask) has no tokenizer surface; this
belongs to the training-data-pipeline extension.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqltask_spark.operators.text import tokenize

_MERGE_SCHEMA = (
    "rank int, left string, right string, merged string, pair_freq bigint"
)


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the one corpus-sized pass of BPE
    training; everything after runs on the vocabulary."""
    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Rewrite a symbol array with one merge, left-to-right greedy.

    A JVM-side fold: append each symbol unless it completes the
    (left, right) pair with the accumulator's tail, in which case the
    tail is replaced by the merged symbol. ``try_element_at`` (NULL on
    the empty accumulator) keeps the condition ANSI-safe. Greedy
    left-to-right matches reference BPE on overlaps ("aaa" + merge
    a,a → ["aa", "a"]).
    """
    merged = F.array(F.lit(left + right))
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges from a document corpus.

    Returns the merge table (rank, left, right, merged, pair_freq) —
    the artifact a tokenizer loads. Stops early when no pair reaches
    ``min_pair_freq``. Deterministic for a given corpus (ties broken
    by pair lexicographic order), so the output is reproducible
    across partitionings and cluster sizes.
    """
    spark = docs.sparkSession
    cur = (
        word_freq_table(docs, text_col)
        .select("freq", F.split(F.col("word"), "").alias("symbols"))
        .persist()
    )
    cur.count()
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = cur.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("symbols") >= 2,
                        F.zip_with(
                            F.slice(
                                "symbols", F.lit(1), F.size("symbols") - 1
                            ),
                            F.slice(
                                "symbols", F.lit(2), F.size("symbols") - 1
                            ),
                            lambda l, r: F.struct(
                                l.alias("l"), r.alias("r")
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<l:string,r:string>>")
                    )
                ).alias("pair"),
            )
            top = (
                pairs.groupBy(
                    F.col("pair.l").alias("l"), F.col("pair.r").alias("r")
                )
                .agg(F.sum("freq").alias("pair_freq"))
                .orderBy(F.desc("pair_freq"), "l", "r")
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_freq"] < min_pair_freq:
                break
            left, right = top[0]["l"], top[0]["r"]
            merges.append(
                (rank, left, right, left + right, int(top[0]["pair_freq"]))
            )
            nxt = cur.select(
                "freq", apply_merge(F.col("symbols"), left, right).alias(
                    "symbols"
                )
            ).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to a corpus → (id, tokens).

    Pure chained JVM folds (one per merge, applied in rank order —
    BPE inference is priority-ordered replay of training). For the
    handful-to-thousands of merges a real tokenizer has, prefer a
    Pandas-UDF encoder; this form is for small merge tables and for
    oracle-style verification of the training output.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    sym = F.split(F.col("word"), "")
    for left, right in merges:
        sym = apply_merge(sym, left, right)
    return toks.select("id", sym.alias("tokens"))


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-vectorized BPE encoder for a FULL merge table →
    ``array<string>`` of subword tokens per input word.

    :func:`encode_with_merges` replays merges as chained JVM folds —
    fine for tens of merges, but a production tokenizer has 30k+ and
    a 30k-deep expression tree is unplannable. This is the documented
    Pandas-UDF exception to the JVM-first rule: the merge table
    broadcasts once as a rank dict (task-side constant, ~MBs), and
    each Arrow batch of words is encoded with the reference
    algorithm — repeatedly merge the lowest-rank adjacent pair — in
    Python at O(word_len · merges_applied) with a per-batch memo for
    repeated words (Zipf makes the memo hit rate high). Identical
    output to ``encode_with_merges`` for any prefix of the table
    (property-tested).
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best_i, best_rank = -1, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]), len(ranks))
                if r < best_rank:
                    best_i, best_rank = i, r
            if best_i < 0:
                break
            # merge ALL occurrences of the chosen pair left-to-right,
            # matching one fold of apply_merge
            left, right = merges[best_rank]
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return syms

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        res = []
        for w in words:
            got = memo.get(w)
            if got is None:
                got = memo[w] = _encode(w)
            res.append(got)
        return pd.Series(res)

    return encode


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus → (id, word, tokens) with the Pandas-UDF encoder —
    the scale path for real merge-table sizes."""
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    ).filter(F.col("word") != "")
    return words.withColumn("tokens", bpe_encode_udf(merges)(F.col("word")))
