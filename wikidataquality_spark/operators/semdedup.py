"""SemDeDup — semantic (embedding-space) deduplication.

Implements the SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the corpus
embeddings with k-means, then inside each cluster mark as semantic duplicates
every document whose cosine similarity to another cluster member exceeds a
threshold, keeping ONE representative per near-dup neighborhood — the member
with the LOWEST cosine similarity to its cluster centroid (the paper's
diversity-preserving choice: edge-of-cluster examples survive, the redundant
core is dropped). Fills the dedup-family slot between exact/MinHash (lexical)
and LSH cosine pairs (pairwise): SemDeDup is the *corpus-pruning* form — a
per-document keep/drop mark, not a pair list.

Survivor semantics, made deterministic and one-pass (same design as the
min-survivor order in operators/dedup.py dup_marks): a row r is marked
`is_semdup` iff SOME same-cluster neighbor n has cos(n, r) ≥ threshold and
strictly higher keep-priority, where priority orders by (centroid_sim ASC,
id ASC) — lowest centroid similarity survives, id breaks exact float ties.
This is the closure of the paper's greedy "keep one per duplicate group"
under a fixed priority order; unlike the iterative greedy it never
resurrects a row whose nearer neighbors were themselves dropped, which makes
the output independent of visit order (and therefore oracle-comparable).

Scale shape (the reason this composes the IVF machinery instead of a global
pair join):
  - cluster assignment is `assign_cells` — a literal-centroid-bank HOF
    argmax, ZERO shuffle, no matter how many rows (simsearch.py);
  - the only quadratic work is the within-cell self-equi-join on `cell`,
    which is the algorithm's intrinsic cost: |cell|² pairs per cell, never
    N². n_lists is the knob — the paper runs 50k clusters over LAION so
    cells stay ~10³-10⁴ rows; cells skewed by dense regions split under
    AQE skew-join. Only (cell, id, vec, csim) rows enter that exchange.
  - the final mark join runs on narrow (id) pairs — vectors never shuffle
    a second time.

Centroids are a train-once artifact (train_centroids in simsearch.py —
deterministic sampled spherical k-means), loaded from a versioned JSON next
to the other model artifacts (models/), exactly like the lang-id .npz: the
index is built once per corpus version and every later run re-reads it, so
the DuckDB oracle can inline the identical centroid constants and replay the
full assignment + pair + survivor algebra bit-for-bit.

ref≈ the reference's UniqueValueChecker family (corpus-level duplicate
marking) extended to embedding space; cites: Abbas et al. 2023
(arXiv:2303.09540).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.operators.simsearch import (
    _cell_scores,
    dot,
    dot_sql,
    l2_norm,
)

SEMDEDUP_CENTROIDS_V1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models",
    "semdedup_centroids_v1.json",
)


def load_semdedup_centroids(path: str = SEMDEDUP_CENTROIDS_V1) -> list[list[float]]:
    """Load the versioned train-once centroid artifact (tools/train_semdedup.py
    writes it; spherical k-means over the sf0.01 corpus, seed 13). JSON keeps
    full repr-precision doubles, so Spark literals and the oracle's E-notation
    literals decode to the same IEEE values."""
    with open(path) as f:
        art = json.load(f)
    return art["centroids"]


def _valid_vectors(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Rows whose vector is fully usable for cosine math: non-NULL, exactly
    `dim` long, no NULL entries, no NaN entries, positive norm. Mirrors the
    guard set the LSH pair oracle documents (simsearch.py) — each condition
    exists because one engine would otherwise diverge from the other on
    degenerate input (NaN sorts greatest in DuckDB, NULL entries are ignored
    by list_aggregate, zero norms make cosine NaN)."""
    v = F.col(vec_col)
    return df.filter(
        v.isNotNull()
        & (F.size(v) == dim)
        & ~F.exists(v, lambda x: x.isNull())
        & ~F.exists(v, lambda x: F.isnan(x.cast("double")))
        & (dot(v, v) > 0)
    )


def _best_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """struct<score,cell> of the argmax centroid — the same strict-`>` fold
    as assign_cells n_keep=1 (first max wins ties ⇒ lowest cell id), but
    keeping the winning score so the caller can derive centroid_sim without
    a second pass: score = dot(v,c)/‖c‖, so score/‖v‖ IS cosine(v, c)."""
    return F.aggregate(
        _cell_scores(vec, centroids),
        F.struct(F.lit(float("-inf")).alias("score"), F.lit(0).alias("cell")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )


def semdedup_marks(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-document semantic-duplicate marks: (id, cell, centroid_sim,
    is_semdup). Invalid vectors (NULL/ragged/NaN/zero-norm) are dropped —
    they can't participate in cosine math; upstream quality gates own them.

    is_semdup=false rows are the survivors a corpus-pruning pass keeps;
    filtering `NOT is_semdup` yields the SemDeDup'd corpus."""
    best = _best_cell(F.col(vec_col), centroids)
    nrm = l2_norm(F.col(vec_col))
    # the pairwise verify is the quadratic stage, so per-PAIR work must be
    # ONE dot fold: precompute each row's norm scalar once (a projected
    # column that crosses the self-join Exchange materialized, so the pair
    # filter reads it instead of re-folding ‖v‖ twice per pair — the naive
    # cosine() spelling cost three 64-term folds per pair). NOT a per-row
    # unit-vector array: transform(v, x -> x/‖v‖) inlines the norm fold
    # INSIDE the lambda (verified on the optimized plan), re-evaluating it
    # per ELEMENT — 64 folds/row in the linear stage. The scalar carry has
    # no such hazard and keeps the oracle's dot/(n.nrm·r.nrm) spelling
    # bit-for-bit.
    # two-step projection: the argmax struct and the norm fold are aliased
    # ONCE, then fields are extracted from the attributes — referencing the
    # fold expressions directly in one select evaluated each of them twice
    # per row (HOF lambdas carry LambdaVariable, so codegen subexpression
    # elimination skips them; CollapseProject declines to re-inline a
    # non-cheap alias referenced twice, verified on the optimized plan)
    pre = _valid_vectors(embeddings, vec_col, dim).select(
        F.col(id_col), F.col(vec_col), best.alias("_best"), nrm.alias("_nrm")
    )
    # No `cell != 0` filter: after _valid_vectors every score is a finite
    # double, so the strict-> fold always leaves the -inf/0 seed — cell is
    # provably 1..n_lists (a filter here would be dead code, and filter
    # pushdown inlines the whole argmax fold into it, re-evaluating 10 folds
    # per row on both join branches — observed on the optimized plan). The
    # SQL twin relies on the same invariant: its row_number always assigns,
    # and NaN scores (which DuckDB sorts greatest) are impossible for the
    # same reason. Anyone relaxing _valid_vectors must restore BOTH sides'
    # unassignable handling together (assign_cells documents the cell-0
    # contract for callers that do accept degenerate rows).
    base = pre.select(
        F.col(id_col),
        F.col(vec_col),
        "_nrm",
        F.col("_best")["cell"].cast("long").alias("cell"),
        (F.col("_best")["score"] / F.col("_nrm")).alias("_csim"),
    )
    neighbors = base.select(
        F.col(id_col).alias("_nid"),
        F.col(vec_col).alias("_nvec"),
        F.col("_nrm").alias("_nnrm"),
        "cell",
        F.col("_csim").alias("_ncsim"),
    )
    # a row loses iff a strictly-higher-priority in-cell neighbor is within
    # the threshold; priority = (centroid_sim ASC, id ASC). The priority
    # filter runs before the cosine fold so most candidate pairs die on two
    # double compares, not a 64-term fold.
    cos = dot(F.col("_nvec"), F.col(vec_col)) / (F.col("_nnrm") * F.col("_nrm"))
    # Parallelize the quadratic stage when cells << cores. A plain equi-join
    # on `cell` has at most n_lists distinct keys, and its shuffle INPUT is
    # tiny (id+vec+2 doubles per row) while the join OUTPUT explodes |cell|²
    # — so AQE coalesces the exchange to ONE partition (observed: the whole
    # sf0.1 verify serialized onto one core, 6.6s vs ~1s spread). Salt: base
    # rows get a deterministic block in [0,S); neighbors replicate to every
    # block; join on (cell, block) → each in-cell pair matches exactly once
    # (at the base row's block), pair set provably unchanged. The explicit
    # repartition(P, cell, blk) on both sides is a REPARTITION_BY_NUM AQE
    # will not coalesce, and it satisfies the join's distribution so no
    # further exchange follows. S = ceil(4P / n_lists): at production
    # cluster counts (paper: 50k cells ≥ 4·cores) S=1 and the salt — and
    # its S× neighbor replication — vanishes, leaving AQE's skew-join to
    # split the rare giant cell.
    sc = embeddings.sparkSession.sparkContext
    par = max(1, sc.defaultParallelism)
    s_blocks = max(1, -(-4 * par // len(centroids)))
    if s_blocks > 1:
        base_j = base.withColumn(
            "_sd_blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(s_blocks)).cast("int")
        ).repartition(par, "cell", "_sd_blk")
        nbr_j = neighbors.withColumn(
            "_sd_blk", F.explode(F.array(*[F.lit(i) for i in range(s_blocks)]))
        ).repartition(par, "cell", "_sd_blk")
        candidates = base_j.join(nbr_j, ["cell", "_sd_blk"])
    else:
        candidates = base.join(neighbors, "cell")
    losers = (
        candidates
        .filter(
            (F.col("_ncsim") < F.col("_csim"))
            | ((F.col("_ncsim") == F.col("_csim")) & (F.col("_nid") < F.col(id_col)))
        )
        .filter(cos >= threshold)  # valid vectors: norms > 0, no NaN
        .select(F.col(id_col).alias("_dup_id"))
        .distinct()
    )
    marks = base.select(id_col, "cell", "_csim")  # vectors exit before join
    return (
        marks.join(losers, marks[id_col] == losers["_dup_id"], "left")
        .select(
            id_col,
            "cell",
            F.round("_csim", 4).alias("centroid_sim"),
            F.col("_dup_id").isNotNull().alias("is_semdup"),
        )
    )


def semdedup_marks_sql(
    centroids: list[list[float]],
    threshold: float = 0.4,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of semdedup_marks: identical centroid constants inlined as
    E-notation literals (full double round-trip precision), identical
    sequential-fold dot products via the shared dot_sql builder, identical
    argmax tie-break (score DESC, cell ASC = Spark's strict-> first-max
    fold), identical survivor-priority comparison at FULL precision (the
    ROUND(…,4) happens only on the emitted column, never in a comparison, on
    both sides)."""

    def lit(c: list[float]) -> str:
        return "[" + ", ".join(f"{x:.17e}" for x in c) + "]"

    d = dot_sql("embedding", "embedding")
    score_exprs = []
    for c in centroids:
        cn = float(np.sqrt(np.dot(c, c))) or 1.0  # same norm as _cell_scores
        score_exprs.append(f"{dot_sql('embedding', lit(c))} / {cn:.17e}")
    scores = ", ".join(score_exprs)
    cells = ", ".join(str(i + 1) for i in range(len(centroids)))
    return f"""
WITH v AS (
  SELECT {id_col}, embedding, sqrt({d}) AS nrm
  FROM {table}
  WHERE embedding IS NOT NULL AND len(embedding) = {dim}
    AND len(list_filter(embedding, x -> x IS NOT NULL)) = {dim}
    AND NOT isnan({d}) AND {d} > 0
),
sc AS (
  SELECT {id_col}, embedding, nrm,
         unnest([{scores}]) AS score,
         unnest([{cells}]) AS cell
  FROM v
),
asg AS (
  SELECT {id_col}, embedding, nrm, CAST(cell AS BIGINT) AS cell,
         score / nrm AS csim
  FROM (SELECT *, row_number() OVER (PARTITION BY {id_col}
                                     ORDER BY score DESC, cell) AS rn
        FROM sc)
  WHERE rn = 1
),
losers AS (
  SELECT DISTINCT r.{id_col} AS dup_id
  FROM asg r JOIN asg n ON r.cell = n.cell
  WHERE (n.csim < r.csim OR (n.csim = r.csim AND n.{id_col} < r.{id_col}))
    AND ({dot_sql('n.embedding', 'r.embedding')} / (n.nrm * r.nrm)) >= {threshold}
)
SELECT a.{id_col}, a.cell, ROUND(a.csim, 4) AS centroid_sim,
       (l.dup_id IS NOT NULL) AS is_semdup
FROM asg a LEFT JOIN losers l ON a.{id_col} = l.dup_id
"""
