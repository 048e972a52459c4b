"""Partitioned bloom sidecar: no false negatives ever, FP rate near
target, anti-join equivalence with and without the probe."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from doonop_spark.operators.bloom import (
    BloomBank,
    bloom_probe,
    build_bloom,
    merge_bloom,
)
from doonop_spark.operators.dedup import anti_join_seen


@pytest.fixture(scope="module")
def seen(spark):
    return (
        spark.range(0, 5000)
        .select(F.concat(F.lit("http://x.example/p"), F.col("id")).alias("ukey"))
        .withColumn("url_hash", F.xxhash64("ukey"))
    )


def test_no_false_negatives(spark, seen):
    bloom = build_bloom(seen, n_partitions=8, expected_per_partition=1000)
    bank = BloomBank.collect(bloom)
    hashes = np.array([r.url_hash for r in seen.collect()], dtype=np.int64)
    assert bank.maybe_seen(hashes).all()  # every seen key must hit


def test_fp_rate_bounded(spark, seen):
    bloom = build_bloom(seen, n_partitions=8, expected_per_partition=1000, fp_rate=0.01)
    bank = BloomBank.collect(bloom)
    fresh = (
        spark.range(100000, 110000)
        .select(F.xxhash64(F.concat(F.lit("http://y.example/q"), F.col("id"))).alias("h"))
        .collect()
    )
    hits = bank.maybe_seen(np.array([r.h for r in fresh], dtype=np.int64))
    assert hits.mean() < 0.05  # ~1% target, generous bound


def test_anti_join_equivalence(spark, seen):
    links = (
        spark.range(2500, 7500)
        .select(F.concat(F.lit("http://x.example/p"), F.col("id")).alias("ukey"))
        .withColumn("url_hash", F.xxhash64("ukey"))
        .withColumn("url", F.col("ukey"))
    )
    exact = sorted(r.ukey for r in anti_join_seen(links, seen).collect())
    bloom = build_bloom(seen, n_partitions=8, expected_per_partition=1000)
    probe = bloom_probe(spark, bloom)
    with_bloom = sorted(r.ukey for r in anti_join_seen(links, seen, probe).collect())
    assert exact == with_bloom  # FP only costs an exact probe, never drops
    assert len(exact) == 2500


def test_sparse_bank_no_false_negatives(spark):
    """Regression: with far fewer seen keys than partitions, the highest
    pids hold no rows. The bank must still probe with the BUILD-time
    modulus (explicit ``p`` column), not max(pid)+1 — the old inference
    marked actually-seen keys 'definitely new' (dropped-dup admission)."""
    seen = (
        spark.range(0, 50)
        .select(F.concat(F.lit("http://s.example/"), F.col("id")).alias("ukey"))
        .withColumn("url_hash", F.xxhash64("ukey"))
    )
    bloom = build_bloom(seen, n_partitions=64, expected_per_partition=64)
    rows = bloom.collect()
    assert len(rows) < 64  # precondition: some partitions really are empty
    bank = BloomBank.collect(bloom)
    assert bank.p == 64
    hashes = np.array([r.url_hash for r in seen.collect()], dtype=np.int64)
    assert bank.maybe_seen(hashes).all()


def test_merge_bloom(spark):
    a = (
        spark.range(0, 1000)
        .select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    )
    b = (
        spark.range(1000, 2000)
        .select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    )
    ba = build_bloom(a, n_partitions=4, expected_per_partition=500)
    bb = build_bloom(b, n_partitions=4, expected_per_partition=500)
    merged = BloomBank.collect(merge_bloom(ba, bb))
    all_h = np.array(
        [r.url_hash for r in a.unionByName(b).collect()], dtype=np.int64
    )
    assert merged.maybe_seen(all_h).all()
