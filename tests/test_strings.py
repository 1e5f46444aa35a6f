"""Suffix array + LCS vs pure-python oracles."""

from arkouda_njit_spark.functions.strings import (
    longest_common_substring,
    suffix_array,
)


def _naive_sa(s):
    return sorted(range(len(s)), key=lambda i: s[i:])


def test_suffix_array(spark):
    rows = [(0, "banana"), (1, "abracadabra"), (2, ""), (3, "aaaa"), (4, "mississippi")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["suffix_array"] for r in suffix_array(df).collect()}
    for i, s in rows:
        assert got[i] == _naive_sa(s), s


def test_lcs(spark):
    rows = [
        (0, "the quick brown fox", "a quick brown dog"),
        (1, "abcdef", "zabcyy"),
        (2, "xyz", "pqr"),
        (3, "", "abc"),
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    got = {r["id"]: r["lcs"] for r in longest_common_substring(df, "a", "b").collect()}
    assert got[0] == " quick brown "
    assert got[1] == "abc"
    assert got[2] == ""
    assert got[3] == ""
