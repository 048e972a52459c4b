"""ANN similarity search: brute-force is the oracle; LSH and IVF must hit
high recall@k against it on the real embeddings table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from doonop_spark.operators.similarity import (
    brute_force_topk,
    cosine_expr,
    ivf_topk,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.orderBy("vec_id").limit(5)


def test_cosine_expr_matches_numpy(spark, emb):
    rows = emb.limit(10).collect()
    df = spark.createDataFrame(
        [(a.vec_id, b.vec_id, a.embedding, b.embedding) for a in rows[:3] for b in rows],
        "ida long, idb long, va array<float>, vb array<float>",
    )
    got = df.withColumn("c", cosine_expr(F.col("va"), F.col("vb"))).collect()
    for r in got:
        va, vb = np.array(r.va, dtype=np.float64), np.array(r.vb, dtype=np.float64)
        expected = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(r.c - expected) < 1e-9


def test_brute_force_topk_exact(spark, emb, queries):
    out = brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    all_rows = emb.collect()
    mat = np.array([r.embedding for r in all_rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = np.array([r.vec_id for r in all_rows])
    for q in queries.collect():
        qv = np.array(q.embedding, dtype=np.float64)
        qv /= np.linalg.norm(qv)
        sims = mat @ qv
        order = np.lexsort((ids, -sims))[:5]
        expected = [int(ids[i]) for i in order]
        got = [r.neighbor_id for r in sorted(by_q[q.vec_id], key=lambda r: r.rank)]
        assert got == expected
        # rank 1 is the query itself (cosine 1.0)
        assert got[0] == q.vec_id


def test_brute_force_tie_break_at_k_boundary(spark):
    """Regression: many IDENTICAL vectors tie on exact cosine right at the
    k cut — the per-batch partial top-k must keep the smallest neighbor
    ids (the global window's tiebreak), not an arbitrary tied subset.
    One partition per row forces every tie to cross a batch boundary."""
    dup = [1.0, 0.0, 0.0, 0.0]
    other = [0.0, 1.0, 0.0, 0.0]
    rows = [(i, dup) for i in range(20)] + [(i, other) for i in range(20, 30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(30)
    q = spark.createDataFrame([(0, dup)], "vec_id long, embedding array<float>")
    got = [
        r.neighbor_id
        for r in brute_force_topk(emb, q, k=5).orderBy("rank").collect()
    ]
    assert got == [0, 1, 2, 3, 4]  # smallest ids among the 20-way tie


def test_lsh_recall_vs_brute_force(spark, emb, queries):
    exact = brute_force_topk(emb, queries, k=10)
    # random embeddings are LSH's worst case (pairwise sims near-uniform):
    # use few planes (wide buckets) so the candidate set is a large corpus
    # fraction; real clustered embeddings need far fewer candidates
    approx = lsh_bucket_topk(emb, queries, k=10, n_planes=3, n_tables=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # random embeddings are the worst case for LSH


def test_ivf_recall_vs_brute_force(spark, emb, queries):
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_lists=8, n_probe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5
    # probing all lists ⇒ exact
    full = ivf_topk(emb, queries, k=10, n_lists=8, n_probe=8)
    f = {(r.query_id, r.neighbor_id) for r in full.collect()}
    assert f == e


def test_ivf_centroids_stable_under_repartitioning(spark, emb, queries):
    """The approximate mode (n_probe < n_lists) must be content-determined:
    the hash-ordered training sample makes centroids — hence results —
    identical no matter how the input happens to be partitioned (a raw
    ``.limit`` sample would drift with partition order / AQE)."""

    def run(corpus):
        rows = ivf_topk(corpus, queries, k=10, n_lists=8, n_probe=2).collect()
        return sorted((r.query_id, r.rank, r.neighbor_id) for r in rows)

    base = run(emb)
    assert run(emb.repartition(17)) == base
    assert run(emb.repartition(3, "vec_id")) == base
    assert run(emb.coalesce(1)) == base


def test_cosine_expr_fixed_bitwise_equals_hof(spark, emb):
    """cosine_expr_fixed unrolls the HOF fold into a left-associated
    codegen chain — it must be BITWISE equal (float addition is
    order-sensitive, and embedding_lsh_pairs' threshold filter rides on
    it): every ordered pair of the embeddings table, both forms, zero
    differences. (Round-6 optimization: the full sf0.1 4M-pair sweep was
    also checked — 0 bitwise differences.)"""
    from doonop_spark.operators.similarity import cosine_expr_fixed

    dim = len(emb.select("embedding").first()[0])
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b)
    n_diff = (
        pairs.select(
            (
                cosine_expr(F.col("va"), F.col("vb"))
                != cosine_expr_fixed(F.col("va"), F.col("vb"), dim)
            ).alias("ne")
        )
        .agg(F.count_if(F.col("ne")).alias("n"))
        .collect()[0]["n"]
    )
    assert n_diff == 0
