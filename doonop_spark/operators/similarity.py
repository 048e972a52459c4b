"""Similarity search over an embedding column (``array<float>``):
brute-force cosine top-k as the exactness baseline, plus two scale paths —
random-hyperplane LSH bucketing and an IVF (inverted-file) coarse
quantizer.

Scale design: the query set is small and broadcast; the corpus side never
collects. Brute force is one pass over the corpus with a numpy
matrix-multiply per Arrow batch (``mapInPandas``), emitting per-partition
partial top-k, then a global window trims to k — shuffle volume is
``O(partitions × k)``, not corpus-sized. LSH/IVF shrink the *scanned*
fraction instead, for when even one full pass is too much.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_expr",
    "cosine_expr_fixed",
    "brute_force_topk",
    "signature_frame",
    "lsh_bucket_topk",
    "ivf_topk",
]


def cosine_expr(a: Column, b: Column) -> Column:
    """JVM-side cosine similarity of two array<float/double> columns:
    zip_with product + aggregate sums. NOTE: higher-order functions are
    INTERPRETED expressions (no codegen); when the vector dimension is
    known use :func:`cosine_expr_fixed` — bit-identical result, whole-
    stage codegen."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_expr_fixed(a: Column, b: Column, dim: int) -> Column:
    """:func:`cosine_expr` for vectors of KNOWN dimension, unrolled into a
    left-associated addition chain — ``((0.0 + p1) + p2) + …`` is exactly
    the fold order ``F.aggregate`` evaluates, so every intermediate double
    is bit-identical to the HOF form (float addition is order-sensitive;
    the order is preserved, only the evaluation engine changes from
    interpreted HigherOrderFunction to whole-stage codegen — guide §4.1).
    Verified element-wise equal to :func:`cosine_expr` over the full
    candidate set in tests."""

    def chain(term):
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + term(i)
        return acc

    dot = chain(
        lambda i: F.element_at(a, i).cast("double")
        * F.element_at(b, i).cast("double")
    )
    na = F.sqrt(
        chain(lambda i: F.element_at(a, i).cast("double") * F.element_at(a, i).cast("double"))
    )
    nb = F.sqrt(
        chain(lambda i: F.element_at(b, i).cast("double") * F.element_at(b, i).cast("double"))
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    q = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in q], dtype=np.int64)
    qm = np.array([r[1] for r in q], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    return qids, qm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    One ``mapInPandas`` pass: each Arrow batch is a (batch × dim) numpy
    matrix multiplied against the broadcast (dim × n_queries) query matrix;
    only the per-batch top-k survive, then a global row_number window
    finalizes. Returns (query_id, neighbor_id, rank, cosine). Ties broken
    by neighbor id for determinism.
    """
    spark = corpus.sparkSession
    qids, qm = _collect_queries(queries, id_col, vec_col)
    bq = spark.sparkContext.broadcast((qids, qm))

    def scan(batches):
        q_ids, q_mat = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = m @ q_mat.T  # (batch, n_queries)
            kk = min(k, len(ids))
            out_q, out_n, out_s = [], [], []
            for j in range(len(q_ids)):
                # per-query partial top-k, TIE-AWARE: lexsort by
                # (-cosine, id) so an exact-cosine tie at the kk boundary
                # keeps the smaller neighbor_id — the same tiebreak the
                # global window applies; argpartition alone kept an
                # arbitrary tied row and could diverge from the oracle
                sel = np.lexsort((ids, -sims[:, j]))[:kk]
                out_q.extend([q_ids[j]] * len(sel))
                out_n.extend(ids[sel].tolist())
                out_s.extend(sims[sel, j].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        scan, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(0x51A)  # fixed: signatures reproducible
    return rng.standard_normal((n_planes, dim))


def signature_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Random-hyperplane LSH signatures: one row per input row with columns
    ``id, b0..b{n_tables-1}`` — per-table bucket keys (sign-bit codes of
    ``n_planes`` fixed-seed hyperplanes, table index folded into the key).
    Shared by :func:`lsh_bucket_topk` (top-k search) and
    ``operators.textdedup.embedding_lsh_pairs`` (pair dedup) so both bucket
    identically. One numpy matmul per Arrow batch."""
    spark = df.sparkSession
    planes = _hyperplanes(dim, n_planes * n_tables)
    bp = spark.sparkContext.broadcast(planes)

    def signer(batches):
        pl = bp.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (m @ pl.T) > 0  # (batch, n_planes*n_tables)
            weights = (1 << np.arange(n_planes, dtype=np.int64))
            rows = {"id": pdf[id_col].to_numpy(dtype=np.int64)}
            for t in range(n_tables):
                chunk = bits[:, t * n_planes : (t + 1) * n_planes]
                rows[f"b{t}"] = (chunk @ weights) + (t << n_planes)
            yield pd.DataFrame(rows)

    bschema = "id long, " + ", ".join(f"b{t} long" for t in range(n_tables))
    return df.select(id_col, vec_col).mapInPandas(signer, schema=bschema)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures over
    ``n_tables`` independent tables; a corpus row is scanned only when it
    shares a bucket with the query in at least one table. Recall grows
    with n_tables; scanned fraction ≈ n_tables / 2^n_planes of the corpus.
    """
    dim = len(queries.select(vec_col).first()[0])
    c_sig = signature_frame(corpus, id_col, vec_col, dim, n_planes, n_tables)
    q_sig = signature_frame(queries, id_col, vec_col, dim, n_planes, n_tables)

    stack = ", ".join(f"b{t}" for t in range(n_tables))
    c_b = c_sig.selectExpr("id", f"explode(array({stack})) as bucket").withColumnRenamed("id", "cid")
    q_b = q_sig.selectExpr("id", f"explode(array({stack})) as bucket").withColumnRenamed("id", "qid")

    cand = q_b.join(c_b, "bucket").select("qid", "cid").distinct()
    c_vec = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    q_vec = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    scored = (
        cand.join(c_vec, "cid")
        .join(F.broadcast(q_vec), "qid")
        .withColumn("cosine", cosine_expr(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
) -> DataFrame:
    """IVF coarse quantizer: k-means centroids trained on a deterministic
    corpus sample (driver-side numpy Lloyd iterations), corpus assigned to
    its nearest list, queries probe the ``n_probe`` nearest lists. The
    scan touches ~n_probe/n_lists of the corpus.

    The training sample is the ``train_sample`` rows with the smallest
    ``xxhash64(id)`` — the same content-keyed selection as
    ``operators/sampling.hash_bucket`` but with an exact row budget: a
    hash-ordered top-k (per-partition top-k + driver merge, never a global
    sort), so the trained centroids — and therefore ``ann_topk_ivf``
    output at n_probe < n_lists — are identical at any partitioning,
    parallelism, or AQE plan, and unbiased w.r.t. id order (an
    ``orderBy(id).limit`` sample would train only on the lowest ids)."""
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(train_sample)
        .collect()
    )
    m = np.array([r[1] for r in sample], dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(0x1BF)
    cents = m[rng.choice(len(m), size=min(n_lists, len(m)), replace=False)]
    for _ in range(8):  # Lloyd
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            pts = m[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-30)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(cents)

    def assigner(batches):
        cs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-30)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "list_id": np.argmax(mm @ cs.T, axis=1).astype(np.int64),
                }
            )

    c_assign = corpus.select(id_col, vec_col).mapInPandas(
        assigner, schema="id long, list_id long"
    ).withColumnRenamed("id", "cid")

    def prober(batches):
        cs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-30)
            sims = mm @ cs.T
            probe = np.argsort(-sims, axis=1)[:, :n_probe]
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "qid": np.repeat(ids, probe.shape[1]),
                    "list_id": probe.ravel().astype(np.int64),
                }
            )

    q_probe = queries.select(id_col, vec_col).mapInPandas(
        prober, schema="qid long, list_id long"
    )
    c_vec = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    q_vec = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    scored = (
        F.broadcast(q_probe)
        .join(c_assign, "list_id")
        .join(c_vec, "cid")
        .join(F.broadcast(q_vec), "qid")
        .withColumn("cosine", cosine_expr(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )
