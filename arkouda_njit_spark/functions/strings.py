"""String-processing ops from the reference dev tree: suffix arrays and
longest-common-substring.

Reference: arachne_development/server/SuffixArrayMsg.chpl:749-756 (per-
string suffix array construction) and LCSMsg.chpl:634 (longest common
substring via suffix structures). Both operate on *individual strings* of
a segmented-string column — embarrassingly parallel per document — so the
Spark mapping is an Arrow-batched pandas UDF over the string column
(per-partition batches; the per-string algorithm is the published
prefix-doubling suffix-array construction and the classic DP band for
LCS). No shuffle is involved; scale comes from partitioning the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _suffix_array_one(s: str) -> list[int]:
    """O(n log n) prefix-doubling suffix array."""
    n = len(s)
    if n == 0:
        return []
    rank = [ord(c) for c in s]
    sa = list(range(n))
    tmp = [0] * n
    k = 1
    while True:
        def key(i):
            return (rank[i], rank[i + k] if i + k < n else -1)

        sa.sort(key=key)
        tmp[sa[0]] = 0
        for j in range(1, n):
            tmp[sa[j]] = tmp[sa[j - 1]] + (1 if key(sa[j]) != key(sa[j - 1]) else 0)
        rank = tmp[:]
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def _lcs_one(a: str, b: str) -> str:
    """Longest common substring via the rolling DP row."""
    if not a or not b:
        return ""
    best_len, best_end = 0, 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        ai = a[i - 1]
        for j in range(1, len(b) + 1):
            if ai == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best_len:
                    best_len, best_end = cur[j], i
        prev = cur
    return a[best_end - best_len : best_end]


def suffix_array(df: DataFrame, col: str = "text", out: str = "suffix_array") -> DataFrame:
    @pandas_udf("array<int>")
    def sa_udf(texts: pd.Series) -> pd.Series:
        return texts.apply(lambda s: _suffix_array_one(s or ""))

    return df.withColumn(out, sa_udf(F.col(col)))


def longest_common_substring(
    df: DataFrame, col_a: str, col_b: str, out: str = "lcs"
) -> DataFrame:
    @pandas_udf("string")
    def lcs_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_lcs_one(x or "", y or "") for x, y in zip(a, b)])

    return df.withColumn(out, lcs_udf(F.col(col_a), F.col(col_b)))
