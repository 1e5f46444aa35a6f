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


class TestC4Filters:
    """C4 line/document rules (Raffel et al. 2020 §2.2) with a pure-python
    replay of the line filter."""

    DOCS = [
        (1, "This is a fine full sentence here.\nshort line.\n"
            "Another good long sentence follows right here!\n"
            "Enable javascript to view this page properly okay.\n"
            "And a third proper sentence closes the document."),
        (2, "lorem ipsum dolor sit amet something something here.\n"
            "A perfectly good second sentence right here okay.\n"
            "A perfectly good third sentence right here okay.\n"
            "A perfectly good fourth sentence right here okay."),
        (3, "function f() { return 1; } is not prose and has no terminal\n"
            "Still we keep this line because it ends properly okay.\n"
            "Still we keep this other line since it ends properly.\n"
            "Still we keep one more line because it ends properly."),
        (4, "Too few sentences survive this one.\nno punct line here\n"
            "trailing words without any terminal"),
        (5, ""),
    ]

    @staticmethod
    def _replay_lines(text, min_words=5):
        import re
        kept = []
        for ln in text.split("\n"):
            ln = ln.strip()
            if not re.search(r'[.!?]["’”]?$', ln):
                continue
            if len(ln.split()) < min_words:
                continue
            if "javascript" in ln.lower():
                continue
            kept.append(ln)
        return "\n".join(kept)

    def test_line_filter_matches_replay(self, spark):
        from arkouda_njit_spark.functions import c4_filters

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {r["doc_id"]: r for r in c4_filters(df).collect()}
        for doc_id, text in self.DOCS:
            assert got[doc_id]["c4_text"] == self._replay_lines(text), doc_id

    def test_document_flags(self, spark):
        from arkouda_njit_spark.functions import c4_filters

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {r["doc_id"]: r for r in c4_filters(df).collect()}
        assert got[1]["c4_keep"]  # javascript LINE removed, doc survives
        assert "javascript" not in got[1]["c4_text"]
        assert not got[2]["flag_c4_lorem"] and not got[2]["c4_keep"]
        assert got[3]["flag_c4_brace"]  # the brace line had no terminal punct
        assert not got[4]["flag_c4_sentences"] and not got[4]["c4_keep"]
        assert got[5]["c4_text"] == "" and not got[5]["c4_keep"]

    def test_bad_words_boundary(self, spark):
        from arkouda_njit_spark.functions import c4_filters

        df = spark.createDataFrame(
            [(1, "The badword1 appears in this long enough sentence here.\n"
                 "Second good long sentence keeps the document alive okay.\n"
                 "Third good long sentence keeps the document alive okay."),
             (2, "Notbadword1ish is a different longer token entirely here.\n"
                 "Second good long sentence keeps the document alive okay.\n"
                 "Third good long sentence keeps the document alive okay.")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in c4_filters(df).collect()}
        assert not got[1]["flag_c4_badwords"]
        assert got[2]["flag_c4_badwords"]  # word-boundary match only


class TestC4SpanDedup:
    """Corpus-wide duplicate three-sentence-span removal vs a pure-python
    replay of the exact semantics."""

    @staticmethod
    def _replay(docs, span=3):
        import hashlib
        import re
        from collections import defaultdict

        sent_re = re.compile(r"(?<=[.!?])[\s\n]+")
        sents = {
            d: (sent_re.split(t.strip()) if t.strip() else [])
            for d, t in docs
        }
        groups = defaultdict(list)
        for d, ss in sents.items():
            for i in range(len(ss) - span + 1):
                dig = hashlib.md5(
                    "\x1f".join(ss[i:i + span]).encode()
                ).hexdigest()
                groups[dig].append((d, i))
        kill = defaultdict(set)
        for occ in groups.values():
            if len(occ) >= 2:
                first = min(occ)
                for d, i in occ:
                    if (d, i) != first:
                        kill[d].update(range(i, i + span))
        out = {}
        for d, ss in sents.items():
            kept = [s for j, s in enumerate(ss) if j not in kill[d]]
            out[d] = (" ".join(kept), len(ss) - len(kept))
        return out

    DOCS = [
        (1, "Alpha one. Beta two. Gamma three. Delta four. Epsilon five."),
        (2, "Intro line. Beta two. Gamma three. Delta four. Outro line."),
        (3, "Beta two. Gamma three. Delta four."),
        (4, "Unique stuff here. Totally different. Nothing shared at all."),
        (5, "Short doc."),
        (6, ""),
    ]

    def _check(self, spark, docs, span=3):
        from arkouda_njit_spark.functions import c4_span_dedup

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text_dedup"], r["n_sents_removed"])
            for r in c4_span_dedup(df, span=span).collect()
        }
        want = self._replay(docs, span=span)
        for d, _ in docs:
            assert got[d] == want[d], (d, got[d], want[d])
        return got

    def test_matches_replay(self, spark):
        got = self._check(spark, self.DOCS)
        # doc 1 is the earliest occurrence of the shared span: untouched
        assert got[1][1] == 0
        # docs 2 and 3 lose the shared three sentences
        assert got[2][1] == 3 and got[3][1] == 3
        assert got[4][1] == 0 and got[5][1] == 0 and got[6] == ("", 0)

    def test_within_doc_repeat(self, spark):
        docs = [(1, "A one. B two. C three. Filler x. A one. B two. C three. Tail y.")]
        self._check(spark, docs)

    def test_overlapping_spans(self, spark):
        # two overlapping duplicated spans: kills must union, not double
        docs = [
            (1, "S1 a. S2 b. S3 c. S4 d. S5 e."),
            (2, "S1 a. S2 b. S3 c. S4 d. Different tail here."),
        ]
        self._check(spark, docs)

    def test_partition_invariance(self, spark):
        from arkouda_njit_spark.functions import c4_span_dedup

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = sorted(
            (r["doc_id"], r["text_dedup"], r["n_sents_removed"])
            for r in c4_span_dedup(df.repartition(1)).collect()
        )
        b = sorted(
            (r["doc_id"], r["text_dedup"], r["n_sents_removed"])
            for r in c4_span_dedup(df.repartition(13)).collect()
        )
        assert a == b
