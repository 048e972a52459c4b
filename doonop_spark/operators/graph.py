"""Link-graph analytics over the crawl corpus: degrees and PageRank.

The reference engine crawls breadth-first and prioritizes only by frontier
order + retry class (``src/cfg.rs:73``); a production crawl at Common-Crawl
scale prioritizes hosts/pages by link-graph importance (OPIC / PageRank
style) and a training-data pipeline reuses the same ranks as document
quality priors. These operators are the extension family for that: built
on the ``(src, dst)`` edge table that link extraction
(:mod:`doonop_spark.functions.extract`) already produces.

Scale shapes:

- **degrees**: two hash aggregates (one shuffle each on ``src`` / ``dst``),
  map-side combine — linear, the cheapest possible plan.
- **pagerank_fixed_point**: classic join-agg iteration. Per iteration: one
  shuffle of the edge contributions keyed by ``dst`` plus one bounded
  scalar aggregate (the dangling-mass sum — a single number to the driver,
  like the wave-loop stats). The ranks frame carries ``(node, outdeg,
  rank_fp)`` only — never text/html — so shuffle volume per iteration is
  O(|E|) longs. Edges are re-read each iteration: persist them (the caller
  controls storage) and pre-``repartition`` by ``src`` so every
  iteration's ranks⋈edges join reuses one partitioning. Each iteration's
  ranks are persisted and the previous unpersisted, so lineage stays O(1)
  deep (no recursive re-computation at iteration k).

**Why fixed-point integer arithmetic**: ranks are BIGINTs scaled by
``scale`` (default 10^12) and every step uses integer div — sums of longs
are exact and order-independent, so the result is bit-identical across
partitionings, engines, and run order. That makes PageRank *exactly*
oracle-able in ANSI SQL (an unrolled CTE chain computes the same
integers), where float PageRank would drift in the last ulp per
accumulation order. Precision: with scale=10^12 the quantization error
per node per iteration is < 2^-39 of total mass — far below any ranking
decision threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degree_stats", "pagerank_fixed_point"]


def degree_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node ``(node, out_deg, in_deg)`` over ``edges(src, dst)``.

    ``nodes`` must be one row per node id in column ``node`` (isolated
    nodes get 0/0). ONE pass over the edge list: each edge explodes into
    an (src, +out) and a (dst, +in) contribution, summed in a single
    map-side-combinable hash aggregate, then one left join against
    ``nodes``. (Round 6: the previous two-aggregate form consumed
    ``edges`` twice — when edges come off an extraction pipeline the
    whole Arrow kernel re-ran per branch — and paid two shuffles + two
    joins; the exploded single agg is equivalent exact long arithmetic,
    one shuffle, one join.)
    """
    both = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("node"),
                    F.lit(1).alias("o"),
                    F.lit(0).alias("i"),
                ),
                F.struct(
                    F.col("dst").alias("node"),
                    F.lit(0).alias("o"),
                    F.lit(1).alias("i"),
                ),
            )
        ).alias("e")
    ).select("e.node", "e.o", "e.i")
    deg = both.groupBy("node").agg(
        F.sum("o").alias("out_deg"), F.sum("i").alias("in_deg")
    )
    return nodes.join(deg, "node", "left").select(
        "node",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
    )


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 4,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Deterministic integer-fixed-point PageRank.

    ``nodes``: one row per node (column ``node``); ``edges``: ``(src,
    dst)``. Returns ``(node, rank_fp)`` with ``rank_fp`` a BIGINT rank
    scaled by ``scale``.

    Recurrence (all ops integer; ``div`` truncates, every quantity ≥ 0 so
    truncation == floor):

    - ``r0 = scale div n`` for every node
    - per iteration::

        contrib(s→d) = r(s) div out_deg(s)
        dangling     = Σ r(i) over nodes with out_deg 0   (scalar)
        r'(i) = (15·(scale div n)) div 100
                + (85·(Σ_in contrib + dangling div n)) div 100

    The dangling sum is a bounded one-scalar collect per iteration (the
    same shape as the crawl loop's per-wave stats); everything else stays
    distributed. Each new ranks frame is persisted and materialized by
    that scalar action, then the previous iteration is unpersisted.
    """
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fp"))
    init = scale // n
    base = ((damping_den - damping_num) * init) // damping_den

    from pyspark.sql import Observation

    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (node, outdeg|null) — outdeg rides along so neither the per-iteration
    # contribution join nor the dangling filter needs deg again
    nodes_deg = nodes.join(
        deg.withColumnRenamed("src", "node"), "node", "left"
    ).persist()

    # the dangling-mass scalar each iteration needs is a pure aggregate of
    # the PREVIOUS ranks frame — observe it on the materialize action that
    # pins that frame anyway (same shape as the crawl loop's per-wave
    # stats), halving the per-iteration driver actions (2 jobs → 1).
    def _observe_dangling(df, tag):
        obs = Observation(f"pagerank_dangling_{tag}")
        out = df.observe(
            obs,
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), F.col("rank_fp"))),
                F.lit(0),
            ).alias("d"),
        )
        return out, obs

    ranks, obs = _observe_dangling(
        nodes_deg.withColumn("rank_fp", F.lit(init).cast("long")), "init"
    )
    ranks = ranks.persist()
    ranks.count()  # materialize + fire the observation
    for it in range(iterations):
        dang_share = int(obs.get["d"]) // n
        inc = (
            edges.join(
                ranks.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("src"), "outdeg", "rank_fp"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        new_ranks = nodes_deg.join(inc, "node", "left").select(
            "node",
            "outdeg",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * (coalesce(m, 0L) + {dang_share}L))"
                    f" div {damping_den}"
                )
            ).cast("long").alias("rank_fp"),
        )
        new_ranks, obs = _observe_dangling(new_ranks, it)
        new_ranks = new_ranks.persist()
        new_ranks.count()  # materialize BEFORE dropping the input cache,
        ranks.unpersist()  # else iteration k would recompute from scratch
        ranks = new_ranks
    out = ranks.select("node", "rank_fp")
    nodes_deg.unpersist()
    return out
