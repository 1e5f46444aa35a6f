"""TF-IDF / BM25 vs a pure-python replay of the published formulas."""

import math
import re

import pytest

from arkouda_njit_spark.functions import (
    bm25,
    bm25_batch,
    normalize_query,
    term_postings,
    tf_idf,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog."),
    (1, "Pack my box with five dozen liquor jugs!"),
    (2, "the quick onyx goblin jumps over the lazy dwarf"),
    (3, "Foxes are quick; dogs are lazy. Quick, quick!"),
    (4, ""),
    (5, "   \t  "),
    (6, "UPPER lower MiXeD 42 4-2 four2"),
]


def _norm(text):
    out = []
    for p in text.lower().split():
        t = re.sub(r"[^a-z0-9]", "", p)
        if t:
            out.append(t)
    return out


def _python_postings():
    post = {}
    for doc_id, text in DOCS:
        for t in _norm(text):
            post[(doc_id, t)] = post.get((doc_id, t), 0) + 1
    return post


def _python_bm25(query_terms, k1=1.2, b=0.75):
    post = _python_postings()
    dl = {}
    for (d, _), tf in post.items():
        dl[d] = dl.get(d, 0) + tf
    n = len(dl)  # docs with at least one term
    avgdl = sum(dl.values()) / n
    dfreq = {}
    for (_, t) in post:
        dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    for t in set(query_terms):
        if t not in dfreq:
            continue
        idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
        for (d, pt), tf in post.items():
            if pt != t:
                continue
            scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl[d] / avgdl)
            )
    return scores


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_match_python(spark):
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_postings(_df(spark)).collect()
    }
    assert got == _python_postings()
    # empty / whitespace-only docs contribute no postings
    assert not any(d in (4, 5) for d, _ in got)


def test_tfidf_matches_python(spark):
    post = _python_postings()
    n = 7  # countDistinct(doc_id) counts empty docs too
    dfreq = {}
    for (_, t) in post:
        dfreq[t] = dfreq.get(t, 0) + 1
    rows = tf_idf(_df(spark)).collect()
    assert len(rows) == len(post)
    for r in rows:
        tf = post[(r["doc_id"], r["term"])]
        assert r["tf"] == tf
        want = tf * math.log(n / dfreq[r["term"]])
        assert r["tfidf"] == pytest.approx(want, abs=1e-12), (r["doc_id"], r["term"])


def test_bm25_matches_python(spark):
    q = "quick lazy foxes"
    want = _python_bm25(normalize_query(q))
    got = {r["doc_id"]: r["score"] for r in bm25(_df(spark), q).collect()}
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12), d
    # the doc repeating "quick" three times must outrank single mentions
    assert got[3] == max(got.values())


def test_bm25_normalization_and_guards(spark):
    # punctuation/case-insensitive: "QUICK!!!" == "quick"
    a = {r["doc_id"]: r["score"] for r in bm25(_df(spark), "QUICK!!!").collect()}
    b_ = {r["doc_id"]: r["score"] for r in bm25(_df(spark), "quick").collect()}
    assert a == b_
    with pytest.raises(ValueError):
        bm25(_df(spark), "!!! ???")
    # unmatched query scores nothing rather than erroring
    assert bm25(_df(spark), "zzznope").count() == 0


def test_unigram_logprob_matches_python(spark):
    from arkouda_njit_spark.functions import unigram_logprob

    post = _python_postings()
    ctf, total = {}, 0
    for (_, t), tf in post.items():
        ctf[t] = ctf.get(t, 0) + tf
        total += tf
    want = {}
    for (d, t), tf in post.items():
        s, n = want.get(d, (0.0, 0))
        want[d] = (s + tf * math.log(ctf[t] / total), n + tf)
    want = {d: (n, s / n) for d, (s, n) in want.items()}
    rows = unigram_logprob(_df(spark)).collect()
    got = {r["doc_id"]: (r["dl"], r["logprob"]) for r in rows}
    assert got.keys() == want.keys()  # token-less docs omitted
    for d, (dl, lp) in want.items():
        assert got[d][0] == dl
        assert got[d][1] == pytest.approx(lp, abs=1e-12), d
    # every score is a mean of log-probs: strictly negative here
    assert all(lp < 0 for _, lp in got.values())


def test_bm25_batch_reuses_a_persisted_index(spark):
    df = _df(spark)
    idx = term_postings(df).persist()
    try:
        qt = spark.createDataFrame([(0, "quick")], "query_id int, term string")
        with_idx = {
            r["doc_id"]: r["score"]
            for r in bm25_batch(df, qt, postings=idx).collect()
        }
        fresh = {r["doc_id"]: r["score"] for r in bm25_batch(df, qt).collect()}
        assert with_idx == fresh
    finally:
        idx.unpersist()


def test_bm25_batch_scores_queries_independently(spark):
    qt = spark.createDataFrame(
        [(1, "quick"), (1, "lazy"), (2, "liquor"), (2, "jugs")],
        "query_id int, term string",
    )
    rows = bm25_batch(_df(spark), qt).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    w1 = _python_bm25(["quick", "lazy"])
    w2 = _python_bm25(["liquor", "jugs"])
    assert by_q[1].keys() == w1.keys() and by_q[2].keys() == w2.keys()
    for d, s in w1.items():
        assert by_q[1][d] == pytest.approx(s, abs=1e-12)
    for d, s in w2.items():
        assert by_q[2][d] == pytest.approx(s, abs=1e-12)
