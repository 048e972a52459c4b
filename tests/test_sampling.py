"""Deterministic hash sampling/splitting: stability under repartitioning,
full coverage, nesting, and weight validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doonop_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 5000).select(F.col("id").alias("doc_id"))


def test_split_covers_every_row_once(spark, docs):
    lab = hash_split(docs, "doc_id", {"train": 80, "valid": 10, "test": 10})
    assert lab.filter(F.col("split").isNull()).count() == 0
    assert lab.count() == 5000
    counts = {r.split: r.n for r in lab.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    # hash buckets approximate the weights
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.06 < counts["valid"] / 5000 < 0.14


def test_split_stable_under_repartition(spark, docs):
    a = hash_split(docs, "doc_id", {"train": 80, "valid": 10, "test": 10})
    b = hash_split(
        docs.repartition(17), "doc_id", {"train": 80, "valid": 10, "test": 10}
    )
    assert sorted((r.doc_id, r.split) for r in a.collect()) == sorted(
        (r.doc_id, r.split) for r in b.collect()
    )


def test_sample_nested_and_deterministic(spark, docs):
    s10 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 10).collect()}
    s20 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 20).collect()}
    assert s10 <= s20  # selections nest by construction
    assert s10 == {
        r.doc_id for r in deterministic_sample(docs.repartition(7), "doc_id", 10).collect()
    }
    assert 0.05 < len(s10) / 5000 < 0.15


def test_bad_weights_raise(spark, docs):
    with pytest.raises(ValueError, match="must sum"):
        hash_split(docs, "doc_id", {"train": 80, "valid": 10})


def test_int_and_string_keys_bucket_identically(spark):
    ints = spark.range(0, 100).select(F.col("id").alias("k"))
    strs = ints.select(F.col("k").cast("string").alias("k"))
    a = [r.b for r in ints.select(hash_bucket(F.col("k")).alias("b")).collect()]
    b = [r.b for r in strs.select(hash_bucket(F.col("k")).alias("b")).collect()]
    assert a == b


def test_plan_is_shuffle_free(spark, docs):
    plan = (
        deterministic_sample(docs, "doc_id", 20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection+filter: scales trivially
