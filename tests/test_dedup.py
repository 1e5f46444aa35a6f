"""Dedup suite: exact, MinHash+LSH, SimHash, n-gram Jaccard — with
pure-python oracles on small corpora."""

import itertools

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river shore"),  # near-dup of 0
    (2, "completely unrelated text about spark dataframes and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (4, "another unrelated document mentioning parquet and arrow batches"),
    (5, "the quick brown fox jumps over the lazy dog near the river bank today"),  # near-dup
]


def _shingles(text, n=3):
    t = text.split()
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)} if len(t) >= n else {text.strip()}


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").persist()


def test_exact_duplicates(corpus):
    groups = exact_duplicates(corpus).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 3]
    assert groups[0]["n_docs"] == 2


def test_ngram_jaccard_matches_python(corpus):
    got = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(corpus).collect()}
    texts = dict(DOCS)
    for (a, ta), (b, tb) in itertools.combinations(DOCS, 2):
        expected = _jaccard(ta, tb)
        if expected > 0:
            assert got[(a, b)] == pytest.approx(expected), (a, b)
        else:
            assert (a, b) not in got


def test_ngram_jaccard_fanout_guard(spark):
    """No-candidates path on a corpus with a universal shingle: refuses
    (fanout_limit) instead of exploding; max_shingle_df caps generation but
    keeps exact jaccard values for surviving pairs (VERDICT r1 #3)."""
    common = "shared shingle everywhere"
    docs = [(i, f"{common} unique{i} tail{i} extra{i}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with pytest.raises(ValueError, match="fanout_limit"):
        ngram_jaccard_pairs(df, fanout_limit=10)
    # df-cap path: the universal shingle never generates pairs; docs share
    # ONLY it, so no pairs survive — and it completes instead of exploding
    out = ngram_jaccard_pairs(df, max_shingle_df=1, fanout_limit=10)
    assert out.count() == 0
    # pairs that also share a rare shingle keep their EXACT jaccard
    docs2 = docs + [(100, f"{common} unique0 tail0 different end")]
    df2 = spark.createDataFrame(docs2, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df2, max_shingle_df=2, fanout_limit=10).collect()
    }
    texts = dict(docs2)
    assert (0, 100) in got
    assert got[(0, 100)] == pytest.approx(_jaccard(texts[0], texts[100]))


def test_minhash_lsh_finds_near_dups(corpus):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_near_duplicates(
            corpus, num_hashes=16, bands=8, threshold=0.5
        ).collect()
    }
    # exact dup must always be found, and jaccard verified == 1.0
    assert pairs[(0, 3)] == pytest.approx(1.0)
    # high-overlap near dups
    assert (0, 5) in pairs and pairs[(0, 5)] > 0.5
    # unrelated docs never pass verification
    assert all(a not in (2, 4) and b not in (2, 4) for a, b in pairs)


def test_minhash_signature_determinism(corpus, spark):
    s1 = sorted(map(tuple, minhash_signatures(corpus, num_hashes=4).collect()))
    s2 = sorted(map(tuple, minhash_signatures(corpus.repartition(5), num_hashes=4).collect()))
    assert s1 == s2


def test_minhash_identical_signatures_for_exact_dups(corpus):
    sigs = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16)) for r in minhash_signatures(corpus).collect()}
    assert sigs[0] == sigs[3]
    # candidates include the exact pair
    cands = {
        (r["a"], r["b"])
        for r in minhash_lsh_candidates(
            minhash_signatures(corpus), num_hashes=16, bands=4
        ).collect()
    }
    assert (0, 3) in cands


def test_simhash_near_duplicates(corpus):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    assert sigs[0] == sigs[3]  # identical text -> identical simhash
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_duplicates(corpus, max_hamming=4).collect()
    }
    assert pairs[(0, 3)] == 0
    assert (0, 1) in pairs  # one-word swap stays within hamming 4
    assert (2, 4) not in pairs


def test_minhash_near_duplicates_short_docs_verify_with_fallback(spark):
    """Identical docs shorter than the shingle width must come out as
    near-duplicates: the verify stage scores the same whole-text-fallback
    shingle sets the signatures hashed (fallback_whole_text)."""
    docs = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny doc"), (2, "something else entirely")],
        "doc_id long, text string",
    )
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_near_duplicates(docs, threshold=0.7).collect()
    }
    assert pairs == {(0, 1): 1.0}


class TestParagraphDedup:
    """C4-style corpus-wide paragraph dedup: remove any paragraph that
    repeats across the corpus, keeping (by default) its first occurrence."""

    def _docs(self, spark):
        boiler = "Subscribe to our newsletter"
        rows = [
            (0, f"unique intro zero\n\n{boiler}\n\nunique body zero"),
            (1, f"{boiler}\n\nunique body one"),
            (2, "all original content here\n\nnothing repeated"),
            (3, f"unique three\n\n{boiler}"),
            (4, boiler),  # document that is ONLY boilerplate
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @staticmethod
    def _oracle(rows, min_repeats=2, keep="first"):
        """Pure-python replay: normalized-paragraph counts, then rebuild."""
        import re
        from collections import Counter

        def norm(p):
            return re.sub(r"\s+", " ", p).strip()

        paras = [(d, i, p) for d, t in rows for i, p in enumerate(t.split("\n\n"))]
        counts = Counter(norm(p) for _, _, p in paras)
        first = {}
        for d, i, p in sorted(paras):
            first.setdefault(norm(p), (d, i))
        out = {}
        for d, t in rows:
            kept = [
                p
                for i, p in enumerate(t.split("\n\n"))
                if counts[norm(p)] < min_repeats
                or (keep == "first" and first[norm(p)] == (d, i))
            ]
            out[d] = "\n\n".join(kept)
        return out

    def test_keep_first_matches_oracle(self, spark):
        from arkouda_njit_spark.functions import paragraph_dedup

        rows = [(r["doc_id"], r["text"]) for r in self._docs(spark).collect()]
        got = {
            r["doc_id"]: r["text_dedup"]
            for r in paragraph_dedup(self._docs(spark)).collect()
        }
        assert got == self._oracle(rows)
        # the first occurrence (doc 0) kept its boilerplate, later docs lost it
        assert "Subscribe" in got[0]
        assert "Subscribe" not in got[1]
        assert got[4] == ""  # boilerplate-only doc survives as empty text

    def test_keep_none_drops_all_occurrences(self, spark):
        from arkouda_njit_spark.functions import paragraph_dedup

        rows = [(r["doc_id"], r["text"]) for r in self._docs(spark).collect()]
        got = {
            r["doc_id"]: r["text_dedup"]
            for r in paragraph_dedup(self._docs(spark), keep="none").collect()
        }
        assert got == self._oracle(rows, keep="none")
        assert all("Subscribe" not in t for t in got.values())

    def test_removed_counts_and_row_preservation(self, spark):
        from arkouda_njit_spark.functions import paragraph_dedup

        out = paragraph_dedup(self._docs(spark))
        removed = {r["doc_id"]: r["n_paras_removed"] for r in out.collect()}
        assert removed == {0: 0, 1: 1, 2: 0, 3: 1, 4: 1}
        assert out.count() == 5  # no document row is ever dropped

    def test_whitespace_normalization_joins_groups(self, spark):
        from arkouda_njit_spark.functions import paragraph_dedup

        docs = spark.createDataFrame(
            [(0, "hello   world"), (1, "hello world"), (2, " hello\tworld ")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["text_dedup"] for r in paragraph_dedup(docs).collect()
        }
        # all three normalize to the same paragraph -> only doc 0 keeps it
        assert out[0] == "hello   world" and out[1] == "" and out[2] == ""

    def test_partition_invariance(self, spark):
        from arkouda_njit_spark.functions import paragraph_dedup

        docs = self._docs(spark)
        a = {r["doc_id"]: r["text_dedup"] for r in paragraph_dedup(docs).collect()}
        b = {
            r["doc_id"]: r["text_dedup"]
            for r in paragraph_dedup(docs.repartition(7)).collect()
        }
        assert a == b
