"""Dedup suite: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
cosine — LSH variants validated against the exact oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doonop_spark.operators.textdedup import (
    dedup_exact,
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun light"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("afternoon", "morning")),  # near-dup of 0
        (3, "completely different text about databases and query engines"),
        (4, "another unrelated document mentioning spark partitions and shuffles"),
        (5, BASE + " extra trailing words appended here"),  # near-dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark, docs):
    out = dedup_exact(docs, "doc_id", "text").collect()
    groups = {r.keeper_id: r.n_dups for r in out}
    assert groups[0] == 2  # docs 0,1 collapse
    assert len(out) == 5  # 6 docs, one pair merged


def test_line_dedup_groups(spark):
    from doonop_spark.operators.textdedup import line_dedup_groups

    rows = [
        (0, "shared header\nunique zero\nshared footer"),
        (1, "shared header\nunique one\n\n  shared footer  "),  # trim+blank
        (2, "shared header\nshared header\nsolo line"),  # within-doc dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.line_hash: (r.n_occurrences, r.n_docs)
        for r in line_dedup_groups(df, "doc_id", "text").collect()
    }
    # two boilerplate groups survive min_occurrences=2
    assert sorted(out.values()) == [(2, 2), (4, 3)]
    # header: 4 occurrences over 3 docs; footer: 2 over 2
    hashes = {
        r["line"]: r["h"]
        for r in spark.createDataFrame(
            [("shared header",), ("shared footer",)], "line string"
        )
        .select("line", F.xxhash64("line").alias("h"))
        .collect()
    }
    assert out[hashes["shared header"]] == (4, 3)
    assert out[hashes["shared footer"]] == (2, 2)


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    assert (0, 1) in pairs  # exact dup
    assert (0, 2) in pairs and (1, 2) in pairs  # one-word edit
    assert not any(3 in p or 4 in p for p in pairs)  # unrelated never pair


def test_minhash_lsh_matches_exact_oracle(spark, docs):
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.7).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, n_hashes=128, n_bands=32, threshold=0.6
        ).collect()
    }
    # high-similarity pairs must be recalled; unrelated docs must not appear
    assert exact <= approx
    assert not any(3 in p or 4 in p for p in approx)


def test_simhash_pairs(spark, docs):
    pairs = {
        (r.id_a, r.id_b) for r in simhash_pairs(docs, "doc_id", "text", max_hamming=6).collect()
    }
    assert (0, 1) in pairs
    assert not any({3, 4} & set(p) for p in pairs)


def test_embedding_cosine_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in embedding_cosine_pairs(emb, "vec_id", "embedding", 0.99).collect()}
    assert pairs == {(0, 1)}


def test_embedding_lsh_pairs_vs_brute_force(spark):
    """Scale path equivalence on clustered vectors: LSH-bucketed pairs are
    a SUBSET of brute force (exact-cosine verify ⇒ zero false positives)
    and, for genuinely-near duplicates (cosine ≥ 0.95 ⇒ per-plane agree
    p ≈ 0.9, miss prob ≈ (1-0.9^8)^12 ≈ 1e-3 per pair — and the planes are
    FIXED-seed, so the outcome is deterministic), recall is total here."""
    import numpy as np

    from doonop_spark.operators.textdedup import embedding_lsh_pairs

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(12):  # 12 clusters of 3 near-dup vectors
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + rng.standard_normal(16) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    brute = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(emb, "vec_id", "embedding", 0.95).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_lsh_pairs(emb, "vec_id", "embedding", 0.95).collect()
    }
    assert len(brute) >= 30  # sanity: the clusters really are near-dups
    assert lsh <= brute  # verify step ⇒ no false positives
    assert lsh == brute  # all true pairs recovered (fixed planes, det.)


def test_dedup_components_vs_union_find(spark):
    """Distributed min-label propagation == driver union-find on the same
    edges (chain, triangle, singleton-with-vertices, isolated)."""
    from doonop_spark.operators.textdedup import dedup_components, dedup_keep

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21, 99]], "doc_id long")

    # driver-side union-find oracle
    parent = {v: v for v, in verts.collect()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    # canonicalize: representative = min of component
    comp_min = {}
    for v, r in want.items():
        comp_min.setdefault(find(r), []).append(v)
    want = {v: min(ms) for r, ms in comp_min.items() for v in ms}

    got = {
        r.doc_id: r.component_id
        for r in dedup_components(pairs, vertices=verts).collect()
    }
    assert got == want
    assert got[99] == 99  # isolated vertex is its own singleton

    # dedup_keep drops non-keepers only
    df = verts.withColumn("payload", F.col("doc_id") * 10)
    kept = sorted(r.doc_id for r in dedup_keep(df, pairs, "doc_id").collect())
    assert kept == [1, 10, 20, 99]


def test_minhash_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
    approx_pairs = {(r.id_a, r.id_b) for r in out.collect()}
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    # recall on the driver-generated corpus: every exact near-dup found
    missed = exact_pairs - approx_pairs
    assert len(missed) <= max(1, len(exact_pairs) // 10)  # ≥90% recall


def test_dedup_components_nonconvergence_raises(spark):
    """A duplicate chain deeper than max_iter must raise, not silently
    return split components (multiple keepers for one cluster)."""
    import pytest as _pytest

    from doonop_spark.operators.textdedup import dedup_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge in 2 rounds"):
        dedup_components(chain, max_iter=2)
    # with enough rounds the same chain converges to one component
    comp = dedup_components(chain, max_iter=25)
    assert {r.component_id for r in comp.collect()} == {0}


def test_contamination_flags_exact_overlap(spark):
    """A doc is contaminated iff it shares a word-8-gram with the
    benchmark; short docs fall back to the whole-text shingle; empty
    text is clean; decontaminate drops exactly the flagged docs."""
    from doonop_spark.operators.textdedup import (
        contamination_flags,
        decontaminate,
    )

    bench_sentence = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            # shares the 8-gram "quick brown fox jumps over the lazy dog"
            (1, "a b c quick brown fox jumps over the lazy dog x y z"),
            # same words, order broken — no shared 8-gram
            (2, "dog lazy the over jumps fox brown quick a b c d e f"),
            (3, ""),  # empty: clean
            (4, "short text"),  # < 8 words, no match with bench shingles
            (5, bench_sentence),  # literally a benchmark doc's text
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_sentence)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.contaminated
        for r in contamination_flags(docs, bench, k=8).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False, 5: True}
    clean = sorted(r.doc_id for r in decontaminate(docs, bench, k=8).collect())
    assert clean == [2, 3, 4]

    # the benchmark side must be a broadcast join (no corpus shuffle)
    plan = contamination_flags(docs, bench, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
