"""Composed corpus-cleaning pipeline: the canonical pre-training flow a
100 TB web-text corpus goes through, as one declarative plan:

    quality filter → language filter → exact dedup (keep first)
        → near-dup removal (MinHash-LSH, keep lowest id per pair)

Every stage is a column expression or hash-aggregation from this package's
operators — the composition stays one Catalyst plan up to the LSH join, so
filters push into the scan and nothing materializes between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import minhash_near_duplicates
from .text import language_id, quality_score


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.85,
    with_near_dup: bool = True,
) -> DataFrame:
    """Return the cleaned corpus (original columns + quality + lang_pred).

    Exact duplicates keep the smallest id of each content group; near-dup
    pairs above the Jaccard threshold drop the larger id (union-by-min is
    enough at the pair level because pairs are verified transitively
    downward by id order)."""
    scored = quality_score(language_id(docs, text_col), text_col)
    kept = scored.filter(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(list(keep_langs))
    )
    # exact dedup: first (smallest id) per content hash
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    kept = kept.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    if with_near_dup:
        # kept feeds three independent subtrees (signatures, shingle
        # explode, final anti-join left side) — cache it so the scoring
        # expressions and the dedup window shuffle execute once
        kept = kept.persist()
        pairs = minhash_near_duplicates(
            kept, id_col=id_col, text_col=text_col, threshold=near_dup_threshold
        )
        losers = pairs.select(F.greatest("a", "b").alias(id_col)).distinct()
        kept = kept.join(losers, id_col, "left_anti")
    return kept


def corpus_stats(cleaned: DataFrame, docs: DataFrame) -> DataFrame:
    """One-row summary: kept/total counts and mean quality."""
    total = docs.count()
    return cleaned.agg(
        F.count("*").alias("kept_docs"),
        F.lit(total).alias("total_docs"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
    )
