"""Corpus deduplication suite for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (the point of each variant at 100 TB):

- **exact**: one hash-groupBy shuffle on ``xxhash64(text)`` — map-side
  partial aggregation collapses most duplicates before the exchange.
- **n-gram Jaccard (exact near-dup)**: explode word shingles → self-join
  on shingle → pair-count — quadratic in worst case, the *oracle* for the
  approximate variants at test scale.
- **MinHash+LSH**: per-doc signature of ``n_hashes`` permutation minima
  (numpy over Arrow batches; shingle hashing stays JVM ``xxhash64``),
  banded into ``n_bands`` buckets; only same-bucket pairs are candidates
  (the shuffle carries band keys, not shingles), then verified by exact
  signature similarity. Linear shuffle volume — the 100 TB path.
- **SimHash**: 64-bit weighted-bit fingerprint; near-dup = small Hamming
  distance, bucketed by 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ one of
  four chunks equal).
- **embedding cosine**: see operators/similarity.py; here wrapped as a
  pair-producing dedup.

All pair outputs are canonical ``(id_a < id_b)`` and deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from doonop_spark.functions.text import content_hash_expr, word_shingles_expr

__all__ = [
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_signature_udf",
    "minhash_lsh_pairs",
    "simhash_udf",
    "simhash_pairs",
    "embedding_cosine_pairs",
    "embedding_lsh_pairs",
    "dedup_components",
    "dedup_keep",
    "contamination_flags",
    "decontaminate",
]

_MERSENNE = np.uint64((1 << 61) - 1)


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: keeper = min id per identical text. Returns
    ``(keeper_id, n_dups)`` per distinct text — pure hash aggregate, one
    shuffle, map-side combine free from Catalyst."""
    return (
        df.groupBy(content_hash_expr(F.col(text_col)).alias("text_hash"), F.col(text_col))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
        .select("keeper_id", "n_dups")
    )


def line_dedup_groups(
    df: DataFrame, id_col: str, text_col: str, min_occurrences: int = 2
) -> DataFrame:
    """Line-level exact dedup (RefinedWeb/CCNet-style boilerplate
    detection): explode trimmed non-empty lines, key by ``xxhash64(line)``
    and aggregate occurrence/document counts per distinct line. Returns
    ``(line_hash, n_occurrences, n_docs)`` for lines appearing at least
    ``min_occurrences`` times. One hash-agg shuffle whose rows carry only
    ``(hash, id)`` — line text never shuffles, so the plan is the same at
    100 TB with map-side partial aggregation for the hot boilerplate
    lines."""
    lines = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), r"\n")).alias("line"),
        )
        .withColumn("line", F.trim(F.col("line")))
        .filter(F.col("line") != "")
    )
    return (
        lines.select(content_hash_expr(F.col("line")).alias("line_hash"), "doc")
        .groupBy("line_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_occurrences)
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode distinct word k-gram
    shingles, self-join on shingle, count shared, test
    ``shared / (n_a + n_b - shared) >= threshold`` via integer cross-
    multiplication (no float drift, oracle-reproducible)."""
    shingled = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(word_shingles_expr(F.col(text_col), k)).alias("sh"),
    ).filter(F.size("sh") > 0)
    # three consumers below (counts, both self-join sides): materialize the
    # shingling once instead of recomputing the split/transform chain per
    # branch (guide §5: reuse; blocks released when the frame is GC'd)
    shingled = shingled.localCheckpoint(eager=True)
    counts = shingled.select("doc", F.size("sh").alias("n_sh"))
    ex = shingled.select("doc", F.explode("sh").alias("shingle"))
    a = ex.select(F.col("doc").alias("id_a"), "shingle")
    b = ex.select(F.col("doc").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    ca = counts.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    num = int(round(threshold * 1_000_000))
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(
            F.col("shared") * 1_000_000
            >= F.lit(num) * (F.col("n_a") + F.col("n_b") - F.col("shared"))
        )
        .select("id_a", "id_b", "shared", "n_a", "n_b")
    )


def _minhash_params(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic affine permutation parameters over the Mersenne prime
    2^61-1 (fixed seed: reproducible signatures across runs/executors)."""
    rng = np.random.default_rng(0xD00)
    a = rng.integers(1, int(_MERSENNE), size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=n_hashes, dtype=np.uint64)
    return a, b


def minhash_signature_udf(n_hashes: int = 128):
    """Arrow UDF: array<long> shingle hashes (JVM xxhash64) → array<long>
    MinHash signature via ``min((a_i * h + b_i) mod (2^61-1))`` computed as
    one numpy matrix op per batch."""
    a, b = _minhash_params(n_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(None)
                continue
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64) % _MERSENNE
            # (n_hashes, n_shingles) affine transform, wraparound-safe
            m = (np.outer(a, hv) + b[:, None]) % _MERSENNE
            out.append(m.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return _sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    n_hashes: int = 128,
    n_bands: int = 32,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs.

    Pipeline: JVM shingling → JVM xxhash64 per shingle → numpy MinHash
    signature → explode ``n_bands`` band keys (xxhash64 of the band slice)
    → self-join on (band, key) → candidate pairs → verified by estimated
    Jaccard = fraction of agreeing signature components ≥ threshold.
    The shuffle carries only (band_key, id) pairs — never shingles.
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature_udf(n_hashes)
    shingle_hashes = F.transform(
        F.array_distinct(word_shingles_expr(F.col(text_col), k)),
        lambda s: F.xxhash64(s),
    )
    signed = df.select(
        F.col(id_col).alias("doc"), sig(shingle_hashes).alias("sig")
    ).filter(F.col("sig").isNotNull())
    # three branches (bands, sig_a, sig_b) reuse the signatures; an eager
    # localCheckpoint materializes them ONCE and — unlike persist(), which
    # pinned blocks for the session's lifetime — its blocks are released by
    # the ContextCleaner as soon as the frame goes out of scope
    signed = signed.localCheckpoint(eager=True)

    bands = signed.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.xxhash64(
                    F.array_join(F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band), ",")
                ),
            )
        ).alias("band", "key"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "key"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )
    sa = signed.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signed.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda p, q: p == q),
            lambda eq: eq,
        )
    )
    out = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", agree / F.lit(n_hashes))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return out


def simhash_udf(n_bits: int = 64):
    """Arrow UDF: array<long> token hashes → 64-bit SimHash (weighted bit
    voting, numpy-vectorized per batch)."""

    @F.pandas_udf(T.LongType())
    def _sim(hashes: pd.Series) -> pd.Series:
        out = []
        masks = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(None)
                continue
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64)
            bits = (hv[:, None] & masks[None, :]) != 0  # (n_tokens, 64)
            votes = bits.sum(axis=0) * 2 - len(hv)  # +1/-1 voting
            val = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                val |= masks[i]
            out.append(np.int64(val))
        return pd.Series(out, dtype="object")

    return _sim


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: bucket by each of the four 16-bit chunks
    (pigeonhole guarantees distance ≤ 3 pairs share a chunk), verify
    Hamming distance JVM-side via bit_count(xor)."""
    sim = simhash_udf()
    tokens = F.transform(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: F.xxhash64(w)
    )
    hashed = df.select(F.col(id_col).alias("doc"), sim(tokens).alias("sh")).filter(
        F.col("sh").isNotNull()
    )
    # the chunk self-join reads `chunks` twice — without a checkpoint the
    # SimHash Arrow UDF would run once per side (guide §5: reuse)
    hashed = hashed.localCheckpoint(eager=True)
    chunks = hashed.select(
        "doc",
        "sh",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("sh"), i * 16).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("chunk", "key"),
    )
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "key"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            F.col("x.sh").alias("sh_a"),
            F.col("y.sh").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_cosine_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding near-dup pairs via brute-force cosine ≥ threshold — the
    all-pairs TEST ORACLE (quadratic by design, like ngram_jaccard_pairs);
    the scale path is :func:`embedding_lsh_pairs`."""
    from doonop_spark.operators.similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_lsh_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 12,
) -> DataFrame:
    """Embedding near-dup pairs at scale: random-hyperplane LSH bucketing
    (fixed-seed planes shared with ``similarity.signature_frame``) —
    candidate pairs share a bucket in ≥1 of ``n_tables`` tables; every
    candidate is then VERIFIED JVM-side by exact cosine ≥ threshold, so
    the output has no false positives; recall per true pair is
    ``1 - (1 - p^n_planes)^n_tables`` with ``p = 1 - angle/π``. The shuffle
    carries (bucket_key, id) pairs — vectors are only joined back for the
    verified candidate set, never all-pairs crossed."""
    from doonop_spark.operators.similarity import cosine_expr_fixed, signature_frame

    dim = len(emb.select(vec_col).first()[0])
    # the bucket self-join reads the signatures twice — checkpoint so the
    # hyperplane mapInPandas pass runs once (guide §5: reuse)
    sig = signature_frame(
        emb, id_col, vec_col, dim, n_planes, n_tables
    ).localCheckpoint(eager=True)
    stack = ", ".join(f"b{t}" for t in range(n_tables))
    buckets = sig.selectExpr("id", f"explode(array({stack})) as bucket")
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), "bucket")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        # dim is known here: the codegen'd unrolled form is bit-identical
        # to cosine_expr (same fold order) and ~3x faster per candidate
        .withColumn("cosine", cosine_expr_fixed(F.col("va"), F.col("vb"), dim))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def dedup_components(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair list: ``(doc_id,
    component_id)`` where component_id = the minimum doc id reachable
    through pair edges — the canonical "keeper" of each duplicate cluster.

    Iterative min-label propagation: each round every vertex takes the min
    of its own label and its neighbors' labels (one join + one min-agg per
    round, lineage cut by an eager localCheckpoint so the plan stays flat).
    Converges in graph-diameter rounds — near-dup clusters are shallow
    (stars/chains of a few hops), so this is 2-4 rounds in practice; the
    driver stops as soon as a round changes nothing. Shuffle volume per
    round is O(edges), never materializing the transitive closure.

    ``vertices`` (optional, one ``doc_id``-compatible column named by
    ``id_a``) adds isolated documents as singleton components.
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)

    labels = sym.select(F.col("a").alias("v")).distinct()
    if vertices is not None:
        labels = labels.unionByName(
            vertices.select(F.col(vertices.columns[0]).cast("long").alias("v"))
        ).distinct()
    labels = labels.withColumn("label", F.col("v")).localCheckpoint(eager=True)

    from pyspark.sql import Observation

    changed = 0
    for it in range(max_iter):
        # carry each vertex's previous label through the min-agg (every v
        # has exactly ONE labels row, so max(old) recovers it) and observe
        # the changed-count on the checkpoint that runs anyway — the old
        # convergence check paid a dedicated join+count job per round.
        neigh = (
            sym.join(labels, sym["a"] == labels["v"])
            .select(
                F.col("b").alias("v"),
                "label",
                F.lit(None).cast("long").alias("old"),
            )
        )
        merged = (
            labels.select("v", "label", F.col("label").alias("old"))
            .unionByName(neigh)
            .groupBy("v")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        obs = Observation(f"cc_changed_{it}")
        merged = merged.observe(
            obs, F.count_if(F.col("label") != F.col("old")).alias("chg")
        )
        new_labels = merged.select("v", "label").localCheckpoint(eager=True)
        changed = int(obs.get["chg"])
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # never ship silently-wrong labels: a chain deeper than max_iter
        # hops would split one duplicate cluster into several "keepers"
        raise RuntimeError(
            f"dedup_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter — min-label "
            "propagation needs one round per hop of the deepest chain"
        )
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component_id"))


def dedup_keep(
    df: DataFrame, pairs: DataFrame, id_col: str, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """The end-to-end dedup deliverable: drop every row whose id belongs to
    a near-dup cluster but is not that cluster's keeper (minimum id).
    Rows in no pair survive untouched."""
    comp = dedup_components(pairs, id_a=id_a, id_b=id_b)
    losers = comp.filter(F.col("doc_id") != F.col("component_id")).select(
        F.col("doc_id").alias("__loser")
    )
    return df.join(losers, df[id_col] == F.col("__loser"), "left_anti")


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Benchmark decontamination (training-data hygiene): append a
    ``contaminated`` boolean — True iff the document shares ANY word
    ``k``-gram with the benchmark corpus (the standard n-gram-overlap
    test used to strip eval-set leakage from pretraining data).

    Scale shape: the benchmark side (small by construction — eval sets
    are thousands of documents) collapses to a distinct shingle set and
    broadcasts; the doc side explodes its distinct shingles and
    LEFT SEMI joins against the broadcast — no shuffle of the corpus, one
    hash-agg on the hit ids. Matching is on the exact shingle STRING
    (never a 64-bit hash), so there are no collision false-positives and
    the operator is exactly SQL-replayable. Docs with no shingles (empty
    text) are clean by definition.
    """
    bench_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_shingles_expr(F.col(bench_text_col), k))
            ).alias("__sh")
        )
        .distinct()
    )
    doc_sh = docs.select(
        F.col(id_col).alias("__did"),
        F.explode(F.array_distinct(word_shingles_expr(F.col(text_col), k))).alias(
            "__sh"
        ),
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "__sh", "left_semi")
        .select("__did")
        .distinct()
        .withColumn("__contaminated", F.lit(True))
    )
    return (
        docs.join(hits, docs[id_col] == hits["__did"], "left")
        .drop("__did")
        .withColumn("contaminated", F.coalesce(F.col("__contaminated"), F.lit(False)))
        .drop("__contaminated")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Keep only documents with NO word-``k``-gram overlap with the
    benchmark corpus (see :func:`contamination_flags`)."""
    return contamination_flags(
        docs, benchmark, id_col, text_col, bench_text_col, k
    ).filter(~F.col("contaminated")).drop("contaminated")
