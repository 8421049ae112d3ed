"""Distributed connected components over duplicate-pair edges.

Why this exists: every pairwise near-dup path in the engine (MinHash bands,
SimHash bands, LSH cosine pairs, PPJoin Jaccard pairs) emits *edges*, and
per-bucket min-id survivor marking is deliberately non-transitive — if A~B
and B~C but A and C never share a bucket, survivor marking keeps A and C.
That is the right cheap default for drop-the-copies dedup, but duplicate
CLUSTER analyses (cluster sizes, one-canonical-doc-per-group exports,
SlimPajama-style cluster statistics) need the transitive closure. This
operator turns an edge list into (node, component) where component is the
MINIMUM node id of the connected component — a deterministic canonical
label under any partitioning.

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond"), restated on DataFrames:

  large-star(u): m = min(Γ(u) ∪ {u}); for every neighbor v > u emit (v, m)
  small-star(u): m = min({v ∈ Γ(u): v < u} ∪ {u}); emit (v, m) for every
                 neighbor v < u, plus (u, m)

Each round is one groupBy-min plus one equi-join on node ids — longs only,
partial-aggregated, AQE-coalesced. The pair converges to a forest of stars
rooted at component minima in O(log n) rounds even on path graphs (naive
min-label propagation needs O(diameter) rounds — 10⁶ rounds on a 10⁶-chain;
the star moves are why this is the MapReduce-canonical algorithm). Rounds
are lineage-truncated through operators/barrier.py, so iteration never
stacks query plans.

Convergence detection: per-round 128-bit edge-set fingerprint
(count + two independent xxhash64 xors over canonical (u,v) rows) — one
map-side-combined aggregate per round instead of an exceptAll anti-join
shuffle. Collision odds of a false "converged" are ~2⁻¹²⁸ per round, the
same bound the dedup exact keys carry. A fixpoint of large∘small is a
star forest (proof in the paper), so equal consecutive fingerprints mean
the answer is final.

ref≈ the reference's UniqueValueChecker "value unique across entities"
(ref≈includes/ConstraintCheck/Checker/UniqueValueChecker.php:~30-80)
lifted from pair detection to equivalence-class construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.operators.barrier import barrier


def _fingerprint(edges: DataFrame) -> tuple:
    """(count, hashsum1, hashsum2) over canonical (u, v) rows."""
    # bit_xor, not sum: ANSI mode makes a long sum of 2^63-range hashes
    # overflow-error; xor is order-independent and overflow-free, and the
    # edge set is distinct so no xor self-cancellation is possible
    row = edges.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h1"),
        F.bit_xor(F.xxhash64(F.lit("cc-fp2"), "u", "v")).alias("h2"),
    ).collect()[0]
    return (row["n"], row["h1"], row["h2"])


def _neighborhood_min(directed: DataFrame) -> DataFrame:
    """(u, m) with m = min(Γ(u) ∪ {u}) over a directed edge list."""
    return directed.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )


def _large_star(directed: DataFrame) -> DataFrame:
    m = _neighborhood_min(directed)
    return (
        directed.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(directed: DataFrame) -> DataFrame:
    smaller = directed.filter(F.col("v") < F.col("u"))
    m = smaller.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    moved = smaller.join(m, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_link = m.select("u", F.col("m").alias("v"))
    return moved.union(self_link).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component is
    the minimum node id in the connected component. Self-loops are ignored;
    edges are treated as undirected. Callers wanting singleton rows union
    the node universe back with component = id (left join + coalesce).

    max_rounds is a runaway backstop, not a tuning knob: the algorithm
    needs O(log n) rounds, so 50 covers any graph that fits on hardware;
    hitting the cap raises instead of returning a wrong (unconverged)
    answer."""
    raw = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # node universe from the RAW edges: a self-loop-only node still
    # "appears in edges" and must come back as its own singleton component
    nodes = raw.select(F.col("u").alias("node")).union(
        raw.select(F.col("v").alias("node"))
    ).distinct()
    e = raw.filter(F.col("u") != F.col("v")).distinct()

    e = barrier(e)
    fp = _fingerprint(e)
    for _ in range(max_rounds):
        directed = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e = barrier(_small_star(_large_star(directed)))
        new_fp = _fingerprint(e)
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds — "
            "O(log n) is expected; this indicates a bug, not a big graph"
        )

    # fixpoint edges form a star forest: (member -> root). Roots and
    # singleton-after-contraction nodes map to themselves.
    membership = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(membership, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )


def neardup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Transitive duplicate clusters from any pair-operator output:
    (node, component, cluster_size, is_cluster_survivor) — survivor is the
    component minimum (the same deterministic total order every dedup
    survivor in this engine uses)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "component").select(
        "node",
        "component",
        "cluster_size",
        (F.col("node") == F.col("component")).alias("is_cluster_survivor"),
    )


def best_copy_survivors(
    pairs: DataFrame,
    scores: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware cluster survivors: keep each duplicate cluster's
    HIGHEST-scoring copy instead of its smallest id. Min-id survivors are
    deterministic but arbitrary; with a quality signal on hand
    (quality_score_docs' logit, a CCNet bucket, negative perplexity) the
    curation team wants the BEST copy kept — this is the standard refinement
    over transitive near-dup clusters.

    Semantics: survivor = argmax(score) per component, ties and unscored
    nodes resolved by the engine's deterministic total order (smallest id;
    a NULL/missing score never beats any scored copy). Returns
    (node, component, cluster_size, survivor, is_survivor). Plan shape: the
    components contraction plus one broadcast-friendly score join and one
    per-component max(struct) partial agg — scores never shuffle wide."""
    cc = neardup_clusters(pairs, id_a, id_b)
    # defective scores (NULL or NaN) must never beat a real score: Spark
    # orders NaN ABOVE every double, so an un-normalized NaN would win the
    # argmax (r04 session review). Duplicate score rows per id are collapsed
    # to the id's best known score pre-join — the same one-row-per-id guard
    # curate.py applies to its marks joins (conservation invariant).
    raw = F.col(score_col).cast("double")
    sc = (
        scores.select(
            F.col(id_col).cast("long").alias("node"),
            F.when(F.isnan(raw) | raw.isNull(), F.lit(None)).otherwise(raw).alias(
                "_score"
            ),
        )
        .groupBy("node")
        .agg(F.max("_score").alias("_score"))
    )
    joined = cc.join(sc, "node", "left")
    # argmax with min-id tie-break in ONE agg: max(struct(score, -1-node)) —
    # struct ordering compares score first, then (-1-node), whose max is the
    # min node ((-1 - x) is the ANSI-safe decreasing bijection on longs:
    # plain negation overflows on Long.MIN_VALUE, a value xxhash64 ids can
    # take, and aborts the job under default ANSI mode). NULL scores
    # coalesce to -inf so they never beat a scored copy.
    best = joined.groupBy("component").agg(
        F.max(
            F.struct(
                F.coalesce("_score", F.lit(float("-inf"))).alias("s"),
                (F.lit(-1) - F.col("node")).alias("negid"),
            )
        ).alias("_b")
    ).select("component", (F.lit(-1) - F.col("_b")["negid"]).alias("survivor"))
    return (
        joined.join(best, "component")
        .select(
            "node",
            "component",
            "cluster_size",
            "survivor",
            (F.col("node") == F.col("survivor")).alias("is_survivor"),
        )
    )


def connected_components_sql(
    pairs_table: str, id_a: str = "id_a", id_b: str = "id_b"
) -> str:
    """DuckDB twin: min-label closure via a recursive CTE (exponentially
    growing reach set — fine at test scale, the point is semantic parity,
    not the distributed plan). Returns (node, component)."""
    return f"""
WITH RECURSIVE e AS (
  SELECT CAST({id_a} AS BIGINT) AS u, CAST({id_b} AS BIGINT) AS v
  FROM {pairs_table} WHERE {id_a} <> {id_b}
  UNION
  SELECT CAST({id_b} AS BIGINT) AS u, CAST({id_a} AS BIGINT) AS v
  FROM {pairs_table} WHERE {id_a} <> {id_b}
),
reach (node, lab) AS (
  SELECT u AS node, u AS lab FROM e
  UNION
  SELECT e.u AS node, reach.lab
  FROM e JOIN reach ON reach.node = e.v
)
SELECT node, MIN(lab) AS component FROM reach GROUP BY node
"""
