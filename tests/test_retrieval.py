"""BM25 search, hashed TF-IDF, and topic clustering semantics."""

from __future__ import annotations

import hashlib
import math

import pytest

from sqltask_spark.operators.retrieval import (
    _query_frame,
    bm25_search,
    hashed_tfidf,
    tfidf_near_pairs,
    topic_clusters,
)

_K1, _B = 1.2, 0.75


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _ref_bm25(corpus, queries, k=10, max_term_df=None):
    """Pure-python BM25 reference mirroring the operator's exact
    fixed-point arithmetic (HALF_UP micro rounding)."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for qid, qtext in queries:
        scores = {}
        matched = {}
        for term in dict.fromkeys(qtext.lower().split()):
            if term not in df:
                continue
            if max_term_df is not None and df[term] > max_term_df:
                continue
            idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            for d, t in toks.items():
                tf = t.count(term)
                if not tf:
                    continue
                tfn = (tf * (_K1 + 1.0)) / (
                    tf + _K1 * (1.0 - _B + _B * len(t) / avgdl)
                )
                micro = math.floor(idf * tfn * 1e6 + 0.5)
                scores[d] = scores.get(d, 0) + micro
                matched[d] = matched.get(d, 0) + 1
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, micro) in enumerate(ranked[:k], start=1):
            out.append((qid, rank, d, matched[d], micro / 1e6))
    return out


_CORPUS = [
    (1, "apple banana"),
    (2, "apple apple banana banana banana"),
    (3, "cherry cherry cherry"),
    (4, "apple cherry plum"),
    (5, "plum fig date"),
    (6, "fig fig date date quince quince"),
    (7, "the the the apple"),
    (8, "the plum"),
]


def test_bm25_matches_python_reference(spark):
    docs = _docs(spark, _CORPUS)
    queries = [(1, "apple banana"), (2, "cherry"), (3, "fig date quince")]
    got = [
        (r.query_id, r.rank, r.doc_id, r.n_matched, r.score)
        for r in bm25_search(docs, _query_frame(spark, queries), k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = _ref_bm25(_CORPUS, queries)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        assert g[4] == pytest.approx(w[4], abs=1e-9)


def test_bm25_rarer_terms_and_tf_dominate(spark):
    docs = _docs(spark, _CORPUS)
    res = bm25_search(
        docs, _query_frame(spark, [(1, "cherry")]), k=3
    ).collect()
    # highest-tf doc for the query term ranks first
    assert res[0].doc_id == 3 and res[0].rank == 1


def test_bm25_max_term_df_drops_stopword_terms(spark):
    docs = _docs(spark, _CORPUS)
    q = _query_frame(spark, [(1, "the apple")])
    uncapped = bm25_search(docs, q, k=10).collect()
    capped = bm25_search(docs, q, k=10, max_term_df=2).collect()
    # 'the' (df=2) survives the cap; 'apple' (df=4) is dropped, so
    # capped results only match on 'the'
    assert {r.doc_id for r in capped} == {7, 8}
    assert all(r.n_matched == 1 for r in capped)
    assert {r.doc_id for r in uncapped} > {7, 8}


def test_bm25_fallback_path_matches_inline(spark):
    """>256 distinct query terms forces the broadcast-semi-join
    fallback branch; padding one query with unknown terms must not
    change its results vs the inline (IN-list) branch."""
    docs = _docs(spark, _CORPUS)
    queries = [(1, "apple banana"), (2, "cherry")]
    inline = [
        (r.query_id, r.rank, r.doc_id, r.n_matched, r.score)
        for r in bm25_search(docs, _query_frame(spark, queries), k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    pad = " ".join(f"zz{i}" for i in range(300))  # 300 unknown terms
    padded = [(1, "apple banana " + pad), (2, "cherry")]
    fb = [
        (r.query_id, r.rank, r.doc_id, r.n_matched, r.score)
        for r in bm25_search(docs, _query_frame(spark, padded), k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert fb == inline


def test_bm25_empty_and_unknown_query_terms(spark):
    docs = _docs(spark, _CORPUS)
    # whitespace-only query → no terms → no rows; unknown terms → no rows
    q = _query_frame(spark, [(1, "   "), (2, "zzzz qqqq")])
    assert bm25_search(docs, q, k=5).count() == 0


def _ref_tfidf(corpus, n_buckets=64):
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for d, t in toks.items():
        tf = {}
        for term in t:
            tf[term] = tf.get(term, 0) + 1
        for term, f in tf.items():
            b = int(hashlib.md5(term.encode()).hexdigest()[:4], 16) % n_buckets
            idf = math.log((n + 1.0) / (df[term] + 1.0)) + 1.0
            micro = math.floor(f * idf * 1e6 + 0.5)
            cnt, tot = out.get((d, b), (0, 0))
            out[(d, b)] = (cnt + 1, tot + micro)
    return {
        (d, b): (cnt, tot / 1e6) for (d, b), (cnt, tot) in out.items()
    }


def test_hashed_tfidf_matches_python_reference(spark):
    docs = _docs(spark, _CORPUS)
    got = {
        (r.doc_id, r.bucket): (r.n_terms, r.weight)
        for r in hashed_tfidf(docs, n_buckets=64).collect()
    }
    want = _ref_tfidf(_CORPUS, n_buckets=64)
    assert set(got) == set(want)
    for key, (cnt, w) in want.items():
        assert got[key][0] == cnt
        assert got[key][1] == pytest.approx(w, abs=1e-9)


def test_topic_clusters_separate_planted_topics(spark):
    animals = "cat dog pet fur paw whisker"
    finance = "stock bond market trade price index"
    rows = []
    for i in range(20):
        words = animals.split()
        rows.append((i, " ".join(words * (1 + i % 3)) + " " + words[i % 6]))
    for i in range(20):
        words = finance.split()
        rows.append(
            (100 + i, " ".join(words * (1 + i % 3)) + " " + words[i % 6])
        )
    docs = _docs(spark, rows)
    out = topic_clusters(docs, n_clusters=4, top_terms=3).collect()
    assert sum(r.n_docs for r in out) == 40
    a_vocab, f_vocab = set(animals.split()), set(finance.split())
    a_docs = f_docs = 0
    for r in out:
        terms = set(r.top_terms.split())
        # every cluster is PURE: its summary vocabulary comes from
        # exactly one planted topic (topics are orthogonal in the
        # hashed space, so k-means must not mix them even if it
        # splits one topic across cells)
        assert terms <= a_vocab or terms <= f_vocab
        if terms <= a_vocab:
            a_docs += r.n_docs
        else:
            f_docs += r.n_docs
    assert a_docs == 20 and f_docs == 20


def _ref_tfidf_cosine(corpus, shingle_n=3, max_df=None):
    """Python reference for tfidf_near_pairs' exact fixed-point math."""

    def shingles(text):
        t = text.lower().split()
        if len(t) < shingle_n:
            return [" ".join(t)] if t else [""]
        return [
            " ".join(t[i : i + shingle_n])
            for i in range(len(t) - shingle_n + 1)
        ]

    tf = {}
    for d, text in corpus:
        for s in shingles(text):
            key = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            tf[(d, key)] = tf.get((d, key), 0) + 1
    df = {}
    for (_, key) in tf:
        df[key] = df.get(key, 0) + 1
    n = len(corpus)
    w = {}
    for (d, key), f in tf.items():
        if max_df is not None and df[key] > max_df:
            continue
        idf = math.log((n + 1.0) / (df[key] + 1.0)) + 1.0
        w[(d, key)] = math.floor(f * idf * 100.0 + 0.5)
    norms = {}
    for (d, _), x in w.items():
        norms[d] = norms.get(d, 0) + x * x
    dots = {}
    for (da, key), xa in w.items():
        for (db, k2), xb in w.items():
            if k2 == key and da < db:
                p = (da, db)
                dots[p] = dots.get(p, 0) + xa * xb
    return {
        p: dot / (math.sqrt(norms[p[0]]) * math.sqrt(norms[p[1]]))
        for p, dot in dots.items()
    }


_COSINE_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "a completely different document about finance markets today"),
    (4, "a completely different document about finance markets yesterday"),
    (5, "unrelated words entirely separate topic matter here now"),
]


def test_tfidf_cosine_matches_python_reference(spark):
    docs = _docs(spark, _COSINE_CORPUS)
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_near_pairs(docs, threshold=0.0).collect()
    }
    want = {
        p: c for p, c in _ref_tfidf_cosine(_COSINE_CORPUS).items()
    }
    assert set(got) == set(want)
    for p, c in want.items():
        assert got[p] == pytest.approx(c, abs=1e-6)
    # near-dup pairs score far above cross-topic pairs
    assert got[(1, 2)] > 0.5 and got[(3, 4)] > 0.5


def test_tfidf_cosine_df_cap_removes_hot_shingles(spark):
    # docs 10/11 share ONLY the boilerplate preamble every doc carries;
    # with the df cap the boilerplate features vanish and so does the
    # (10, 11) pair, while the genuine near-dup pair (12, 13) survives
    boiler = "standard legal disclaimer applies to all content"
    rows = [
        (10, boiler + " alpha beta gamma delta epsilon"),
        (11, boiler + " one two three four five"),
        (12, boiler + " same story told once more here"),
        (13, boiler + " same story told once more there"),
        (14, boiler + " noise filler words nothing shared"),
    ]
    docs = _docs(spark, rows)
    # idf already discounts boilerplate (df=5 shingles get idf=1.0 vs
    # ~2.1 for unique ones), so the boiler-only pair scores low —
    # threshold 0.05 keeps it visible in the uncapped run
    uncapped = {
        (r.id_a, r.id_b)
        for r in tfidf_near_pairs(docs, threshold=0.05).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in tfidf_near_pairs(
            docs, threshold=0.05, max_shingle_df=3
        ).collect()
    }
    assert (10, 11) in uncapped
    assert (10, 11) not in capped
    assert (12, 13) in capped


def test_tfidf_cosine_plan_no_cartesian(spark, sf_dir):
    from sqltask_spark.plans import plan_report
    from sqltask_spark.queries import QUERIES

    r = plan_report(QUERIES["dedup_tfidf_cosine"](spark, sf_dir))
    assert "CartesianProduct" not in r.join_strategies


def test_bm25_plan_no_cartesian_broadcast_hash(spark, sf_dir):
    from sqltask_spark.plans import plan_report
    from sqltask_spark.queries import QUERIES

    r = plan_report(QUERIES["search_bm25"](spark, sf_dir))
    # the only nested-loop is the 1-row corpus-stats broadcast; term
    # joins are broadcast hash joins (query terms are tiny)
    assert "CartesianProduct" not in r.join_strategies
    assert "BroadcastHashJoin" in r.join_strategies
    assert r.has_codegen


def _ref_hybrid_rrf(corpus, queries, *, k=10, leg_k=20, rrf_k=60,
                    n_buckets=1024):
    """Python reference for hybrid_rrf_search's exact arithmetic."""
    # --- BM25 leg ranks ---
    bm = {}
    for qid, rank, d, _, _ in _ref_bm25(corpus, queries, k=leg_k):
        bm[(qid, d)] = rank
    # --- dense leg: hashed-TF-IDF cosine, centi fixed point ---
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:4], 16) % n_buckets

    def weights(terms):
        tf = {}
        for term in terms:
            tf[term] = tf.get(term, 0) + 1
        w = {}
        for term, f in tf.items():
            if term not in df:
                continue
            idf = math.log((n + 1.0) / (df[term] + 1.0)) + 1.0
            b = bucket(term)
            w[b] = w.get(b, 0) + math.floor(f * idf * 100.0 + 0.5)
        return w

    dw = {d: weights(t) for d, t in toks.items()}
    dense = {}
    for qid, qtext in queries:
        qw = weights(qtext.lower().split())
        if not qw:
            continue
        n2q = sum(x * x for x in qw.values())
        cands = []
        for d, w in dw.items():
            dot = sum(qw[b] * w[b] for b in qw if b in w)
            if not dot:
                continue
            n2d = sum(x * x for x in w.values())
            cos = dot / (math.sqrt(n2q) * math.sqrt(n2d))
            cands.append((round(cos, 9), d))
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, d) in enumerate(cands[:leg_k], start=1):
            dense[(qid, d)] = rank
    # --- RRF fusion ---
    out = []
    for qid, _ in queries:
        fused = []
        for (q, d) in set(bm) | set(dense):
            if q != qid:
                continue
            micro = 0
            for leg in (bm, dense):
                r = leg.get((qid, d))
                if r is not None:
                    micro += math.floor(1e6 / (rrf_k + r) + 0.5)
            fused.append((micro, d))
        fused.sort(key=lambda t: (-t[0], t[1]))
        for rank, (micro, d) in enumerate(fused[:k], start=1):
            out.append(
                (qid, rank, d, bm.get((qid, d)), dense.get((qid, d)),
                 micro / 1e6)
            )
    return out


def test_hybrid_rrf_matches_python_reference(spark):
    from sqltask_spark.operators.retrieval import hybrid_rrf_search

    docs = _docs(spark, _CORPUS)
    queries = [(1, "apple banana"), (2, "cherry plum"), (3, "fig date")]
    got = [
        (r.query_id, r.rank, r.doc_id, r.bm25_rank, r.dense_rank, r.score)
        for r in hybrid_rrf_search(
            docs, _query_frame(spark, queries), k=5, leg_k=4
        ).orderBy("query_id", "rank").collect()
    ]
    want = _ref_hybrid_rrf(_CORPUS, queries, k=5, leg_k=4)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        assert g[5] == pytest.approx(w[5], abs=1e-9)


def test_hybrid_rrf_both_legs_beat_single_leg(spark):
    """A document ranked #1 by both legs must outrank a document
    ranked #1 by only one leg; single-leg docs carry a null rank for
    the missing leg."""
    from sqltask_spark.operators.retrieval import hybrid_rrf_search

    docs = _docs(spark, _CORPUS)
    res = hybrid_rrf_search(
        docs, _query_frame(spark, [(1, "apple banana")]), k=10
    ).orderBy("rank").collect()
    assert res, "no results"
    top = res[0]
    # doc 2 has max tf for both query terms → top of both legs
    assert top.bm25_rank is not None and top.dense_rank is not None
    # rrf score strictly decreases with rank position (ties broken)
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)
