"""Corpus vocabulary statistics for tokenizer training and IDF weighting.

The canonical 100 TB map-side-combine workload: term frequency and
document frequency over every whitespace token in the corpus. Computed in
two hash aggregations — first keyed ``(token, doc)`` (partial aggregation
collapses within-document repeats before the exchange, and the compound
key spreads hot tokens like "the" across partitions), then keyed
``token`` (tiny: one row per distinct (token, doc)). A single
``groupBy(token).agg(count, countDistinct(doc))`` would instead expand
every row twice and shuffle hot tokens onto single reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_vocab"]


def token_vocab(
    df: DataFrame, id_col: str, text_col: str, min_occurrences: int = 1
) -> DataFrame:
    """``(token, n_occurrences, n_docs)`` per distinct whitespace token
    (same tokenization as ``functions.text.token_count_expr``: trimmed,
    split on ``\\s+``, blank text yields no tokens)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.when(
                F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
            ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("token"),
    )
    per_doc = toks.groupBy("token", "doc").agg(F.count("*").alias("n"))
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("n").alias("n_occurrences"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_occurrences)
    )
