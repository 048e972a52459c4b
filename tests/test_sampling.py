"""Deterministic hash sampling/splitting: stability under repartitioning,
full coverage, nesting, and weight validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doonop_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
    stratified_sample,
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


def test_stratified_sample_per_stratum_thresholds(spark):
    from pyspark.sql import functions as _F

    df = spark.range(0, 3000).select(
        _F.col("id").alias("doc_id"),
        _F.element_at(
            _F.array(_F.lit("en"), _F.lit("de"), _F.lit("zh")),
            (_F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 100, "de": 30})
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == 1000          # 100% stratum keeps everything
    assert 200 < counts.get("de", 0) < 400  # ~30%
    assert "zh" not in counts            # default_pct=0 drops unlisted strata
    # per-stratum selection is the same hash selection: nested vs global
    g = {r.doc_id for r in deterministic_sample(df, "doc_id", 30).collect()}
    d = {r.doc_id for r in out.filter(F.col("lang") == "de").collect()}
    assert d == {i for i in g if i % 3 == 1}


def test_pack_sequences_contiguous_fill(spark):
    from doonop_spark.operators.sampling import pack_sequences

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("tok")
    )
    out = pack_sequences(df, "doc_id", "tok", budget=300, n_shards=4)
    rows = sorted(
        ((r.shard, r.doc_id, r.tok, r.bin, r.offset_in_bin) for r in out.collect())
    )
    # replay the contiguous fill per shard in doc_id order
    cum = {}
    for shard, doc, tok, b, off in rows:
        prev = cum.get(shard, 0)
        assert b == prev // 300, (shard, doc)
        assert off == prev % 300
        cum[shard] = prev + tok
    # deterministic at any parallelism
    out2 = pack_sequences(df.repartition(13), "doc_id", "tok", budget=300, n_shards=4)
    assert rows == sorted(
        ((r.shard, r.doc_id, r.tok, r.bin, r.offset_in_bin) for r in out2.collect())
    )
    # no global sort in the plan: the only sort is within-shard
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
