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


class TestRepetitionSignals:
    """Gopher within-doc repetition rules vs a pure-python replay."""

    @staticmethod
    def _oracle(text, ngram_sizes=(2, 3, 4)):
        from collections import Counter

        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        lc = Counter(lines)
        n_lines = len(lines)
        dup_lines = sum(v - 1 for v in lc.values())
        line_chars = sum(len(ln) for ln in lines)
        dup_chars = sum(len(k) * v for k, v in lc.items() if v >= 2)
        out = {
            "dup_line_frac": dup_lines / n_lines if n_lines else 0.0,
            "dup_line_char_frac": dup_chars / line_chars if line_chars else 0.0,
        }
        toks = text.split()
        for n in ngram_sizes:
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            gc = Counter(grams)
            top, cnt = max(gc.items(), key=lambda kv: kv[1]) if gc else ("", 0)
            # ties: spark's fold keeps the FIRST max in sorted order; for the
            # oracle, any max has the same (count, len) only when lengths tie,
            # so compare covered chars of the best-by-(count, then sorted())
            best = sorted(g for g, c in gc.items() if c == cnt)
            covered = cnt * len(best[0]) if cnt >= 2 else 0
            # overlap overcounting is clamped engine-side (round-4 ADVICE #4)
            out[f"top_{n}gram_char_frac"] = (
                min(covered / len(text), 1.0) if text else 0.0
            )
        return out

    def _check(self, spark, text, keys=("dup_line_frac", "dup_line_char_frac")):
        from arkouda_njit_spark.functions import repetition_signals

        row = repetition_signals(
            spark.createDataFrame([(0, text)], "doc_id long, text string")
        ).collect()[0]
        want = self._oracle(text)
        for k in keys:
            assert abs(row[k] - want[k]) < 1e-9, (k, row[k], want[k])
        return row, want

    def test_no_repetition(self, spark):
        row, _ = self._check(spark, "alpha beta\ngamma delta\nepsilon zeta")
        assert row["dup_line_frac"] == 0.0
        assert row["top_2gram_char_frac"] == 0.0

    def test_duplicate_lines(self, spark):
        text = "buy now\ncontent one\nbuy now\ncontent two\nbuy now\n\n"
        row, want = self._check(spark, text)
        assert abs(row["dup_line_frac"] - 2 / 5) < 1e-9
        # 3 occurrences x 7 chars of "buy now" over total line chars
        assert abs(row["dup_line_char_frac"] - want["dup_line_char_frac"]) < 1e-9

    def test_spam_ngram(self, spark):
        text = "spam ham " * 50 + "real content at last"
        row, want = self._check(spark, text)
        for n in (2, 3, 4):
            k = f"top_{n}gram_char_frac"
            assert abs(row[k] - want[k]) < 1e-9, k
        assert row["top_2gram_char_frac"] > 0.5  # the page is mostly one 2-gram

    def test_short_and_empty_docs(self, spark):
        for text in ("", "one", "one two"):
            row, want = self._check(spark, text)
            for n in (2, 3, 4):
                k = f"top_{n}gram_char_frac"
                assert abs(row[k] - want[k]) < 1e-9, (text, k)

    def test_blank_lines_ignored(self, spark):
        row, _ = self._check(spark, "a\n\n\n\na\n\n")
        assert row["dup_line_frac"] == 0.5  # two non-blank 'a' lines


def test_top_ngram_char_frac_clamped(spark):
    """Overlapping shingles multi-count shared characters; the reported
    fraction is clamped to 1.0 (round-4 ADVICE #4: 'a a a a a' with n=2
    would otherwise report 12/9)."""
    from arkouda_njit_spark.functions.text import repetition_signals

    df = spark.createDataFrame([(1, "a a a a a")], "doc_id long, text string")
    row = repetition_signals(df, ngram_sizes=(2,)).collect()[0]
    assert row["top_2gram_char_frac"] == 1.0
