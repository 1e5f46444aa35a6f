"""BPE vocabulary training + tokenization vs a pure-python Sennrich replay.

The replay implements the original algorithm (Sennrich et al. 2016) on a
word-frequency dict with the SAME deterministic tie-break as the Spark
trainer (max count, then lexicographically smallest pair) and the same
left-to-right non-overlapping merge application — exact merge-list
equality is the assertion, not a statistic.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions import (
    bpe_encode,
    bpe_token_count,
    encode_word,
    train_bpe,
    word_frequencies,
)
from arkouda_njit_spark.functions.bpe import EOW


# ---------------------------------------------------------------------------
# pure-python reference (the oracle)
# ---------------------------------------------------------------------------


def _apply_merge_py(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_py(
    texts: list[str], num_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    vocab: dict[tuple[str, ...], int] = collections.Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(w) + (EOW,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = collections.Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        eligible = {p: c for p, c in pairs.items() if c >= min_pair_freq}
        if not eligible:
            break
        # max count, ties to lexicographically smallest (a, b)
        best = min(eligible.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = collections.Counter(
            {
                tuple(_apply_merge_py(list(syms), *best)): freq
                for syms, freq in vocab.items()
            }
        )
    return merges


CORPUS = [
    "the lower lowest newer newest wider widest",
    "the newer the better the wider the lower",
    "low low low lower lower newest newest newest newest",
    "widest widest widest wider wider new new new newer",
    "est est estimate lowland newland wideland the the the",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    ).repartition(5)


def test_word_frequencies(spark, corpus_df):
    got = {
        r["word"]: r["freq"] for r in word_frequencies(corpus_df).collect()
    }
    want = collections.Counter(w for t in CORPUS for w in t.split())
    assert got == dict(want)


@pytest.fixture(scope="module")
def spark_merges(corpus_df):
    return train_bpe(corpus_df, 40)


def test_merge_list_matches_python_reference(spark, spark_merges):
    want = train_bpe_py(CORPUS, 40)
    assert spark_merges == want
    assert len(spark_merges) > 10  # the corpus genuinely supports deep merges


def test_training_deterministic_under_partitioning(spark, corpus_df, spark_merges):
    b = train_bpe(corpus_df.repartition(7), 8)
    assert spark_merges[:8] == b


def test_min_pair_freq_early_stop(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    # every adjacent pair occurs once: nothing reaches min_pair_freq=2
    assert train_bpe(df, 10) == []


def test_encode_word_roundtrip_and_vocab_hits():
    merges = train_bpe_py(CORPUS, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in CORPUS:
        for w in t.split():
            pieces = encode_word(w, ranks)
            assert "".join(pieces) == w + EOW  # lossless
    # a frequent word compresses to few pieces under its own vocab
    assert len(encode_word("newest", ranks)) <= 2


def test_bpe_encode_matches_serial(spark, corpus_df):
    merges = train_bpe_py(CORPUS, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(corpus_df, merges).collect()
    }
    for i, t in enumerate(CORPUS):
        want = [p for w in t.split() for p in encode_word(w, ranks)]
        assert got[i] == want, f"doc {i}"


def test_bpe_token_count_matches_encode(spark, corpus_df):
    merges = train_bpe_py(CORPUS, 40)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(corpus_df, merges).collect()
    }
    pieces = {
        r["doc_id"]: len(r["pieces"])
        for r in bpe_encode(corpus_df, merges).collect()
    }
    assert counts == pieces


def test_trained_vocab_compresses_held_in_domain_text(spark, corpus_df):
    """End-to-end sanity: training on the corpus then encoding it yields
    fewer pieces than the character baseline."""
    merges = train_bpe_py(CORPUS, 40)
    n_bpe = (
        bpe_token_count(corpus_df, merges)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    n_chars = sum(len(w) + 1 for t in CORPUS for w in t.split())
    assert n_bpe < 0.6 * n_chars


def test_tokenless_documents_preserved(spark):
    merges = train_bpe_py(CORPUS, 10)
    df = spark.createDataFrame(
        [(0, "the lower"), (1, ""), (2, "   ")], ["doc_id", "text"]
    )
    enc = {r["doc_id"]: r["pieces"] for r in bpe_encode(df, merges).collect()}
    cnt = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(df, merges).collect()
    }
    assert set(enc) == {0, 1, 2} and enc[1] == [] and enc[2] == []
    assert cnt[1] == 0 and cnt[2] == 0 and cnt[0] == len(enc[0])
