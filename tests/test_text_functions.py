"""Text analysis over the driver's documents table, with pure-python oracles."""

import re

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def test_token_count(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    for r in docs.collect():
        expected = len(r["text"].split()) if r["text"].strip() else 0
        assert got[r["doc_id"]] == expected, r["doc_id"]


def test_bpe_ish_token_count_monotone(docs):
    joined = token_count(bpe_ish_token_count(docs))
    bad = joined.filter(F.col("n_bpe_tokens") < F.col("n_tokens")).count()
    assert bad == 0  # sub-word count never below word count


def test_quality_score_range(docs):
    rows = quality_score(docs).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    # the synthetic docs are sane text: most should score above 0.5
    assert sum(r["quality"] > 0.5 for r in rows) > len(rows) * 0.5


def test_language_id_deterministic_and_sane(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and this is for a test"),
            (2, "der Hund ist nicht mit der Katze und das ist ein"),
            (3, "le chat est dans la maison pour les vacances et des"),
            (4, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_matches_python(docs):
    import hashlib

    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    for r in docs.limit(50).collect():
        toks = r["text"].split()
        if len(toks) >= 3:
            sh = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            expected = min(hashlib.md5(s.encode()).hexdigest() for s in sh)
        else:
            expected = hashlib.md5(r["text"].strip().encode()).hexdigest()
        assert got[r["doc_id"]] == expected, r["doc_id"]


def test_fingerprint_detects_shared_prefix(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),  # shares 4 shingles
            (3, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    # same min-shingle iff the minimum md5 shingle is in the shared prefix —
    # deterministic; just assert stability and type
    assert all(len(v) == 32 for v in fps.values())


def test_clean_corpus_pipeline(spark):
    from arkouda_njit_spark.functions import clean_corpus

    rows = [
        (0, "the quick brown fox jumps over the lazy dog and this is fine for the test"),
        (1, "the quick brown fox jumps over the lazy dog and this is fine for the test"),  # exact dup
        (2, "the quick brown fox jumps over the lazy dog and this is fine for the exam"),  # near dup
        (3, "der Hund ist nicht mit der Katze und das ist ein gutes Beispiel"),  # de
        (4, "zz"),  # low quality (too short)
        (5, "an entirely different english document with the required level of quality in this text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = clean_corpus(docs, min_quality=0.5, keep_langs=("en",), near_dup_threshold=0.6)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1 drops (exact dup of 0), 2 drops (near dup of 0), 3 drops (de),
    # 4 drops (quality), 0 and 5 stay
    assert ids == [0, 5]
    assert set(kept.columns) >= {"doc_id", "text", "quality", "lang_pred"}


def test_gopher_quality_flags_each_rule(spark):
    from arkouda_njit_spark.functions import gopher_quality_flags

    good = "word " * 60  # 60 normal words
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "short doc"),                                # word count
            (2, ("a " * 60)),                                # mean word length < 3
            (3, ("word " * 30 + "# " * 30)),                 # symbol ratio (and alpha)
            (4, "\n".join("- item %d word" % i for i in range(20))),  # bullets
            (5, ("123 " * 60)),                              # alpha words
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert rows[0]["gopher_keep"]
    assert not rows[1]["flag_word_count"]
    assert not rows[2]["flag_mean_word"]
    assert not rows[3]["flag_symbol_ratio"]
    assert not rows[4]["flag_bullet_lines"]
    assert not rows[5]["flag_alpha_words"]
    for i in range(1, 6):
        assert not rows[i]["gopher_keep"]
