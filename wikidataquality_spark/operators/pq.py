"""Product quantization (PQ): embedding compression + ADC similarity search.

At 10¹² documents, a 64-dim float32 embedding column is ~256 TB — too big
to shuffle, too big to keep hot. PQ (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search") splits each vector into m
subvectors and replaces every subvector with the id of its nearest
codebook centroid: m small integers (m·log₂(k) bits ≈ 4-8 bytes) instead
of d floats, with approximate distances computed straight on the codes via
a per-query lookup table (ADC — asymmetric distance computation). This is
the storage/scan path that complements the IVF routing path
(simsearch.ivf_topk): IVF prunes WHICH rows to score, PQ shrinks WHAT is
stored and scored.

Spark-first shape, same discipline as the IVF assign fix (r03 VERDICT #1):

  - encoding is m static argmin folds over LITERAL codebook banks — one
    codegen'd projection, NO Exchange, NO Window, no Python. The codebook
    is a train-once versioned artifact (models/pq_codebooks_v1.json,
    tools/train_pq.py), so the DuckDB oracle inlines identical constants
    and the integer codes are gated bit-for-bit;
  - ADC scan: the query's subvector-to-centroid distance table (m×k
    doubles) is computed DRIVER-side in numpy — the query is a literal —
    and unrolled into a fixed-order sum of element_at lookups; top-k is
    orderBy+limit (TakeOrderedAndProject, no global sort materialization);
  - distances are pure +,-,* folds in frozen order, so Spark and DuckDB
    agree to the last ulp (the dot_sql precedent), and argmin ties resolve
    to the FIRST minimal centroid in both engines.

Codes are array<int> here rather than packed binary: the honest 100 TB
deployment packs m 4-bit codes into a BinaryType column (16× smaller than
this representation); the unpacked form keeps every gate DuckDB-comparable
and the packing is a bijective cast, not an algorithmic change.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PQ_CODEBOOKS_V1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models",
    "pq_codebooks_v1.json",
)


def load_pq_codebooks(path: str = PQ_CODEBOOKS_V1) -> dict:
    """{dim, m, k, codebooks: [m][k][dim/m]} with repr-precision doubles
    (identical IEEE values as Spark literals and DuckDB literals)."""
    with open(path) as f:
        art = json.load(f)
    cb = art["codebooks"]
    if len(cb) != art["m"] or any(len(sub) != art["k"] for sub in cb):
        raise ValueError("pq artifact shape mismatch — retrain, never hand-edit")
    return art


def train_pq_codebooks(
    vectors: np.ndarray, m: int = 8, k: int = 16, iters: int = 12, seed: int = 13
) -> list[list[list[float]]]:
    """Deterministic per-subspace Euclidean k-means (k-means++ init, Lloyd).

    Pure numpy float64 over a caller-provided (bounded, deterministic)
    sample — same training posture as simsearch.train_centroids: the
    artifact is built once per corpus version from a driver-side sample;
    corpus passes never retrain. Empty clusters re-seed to the farthest
    point (totality: a degenerate sample still yields k distinct rows
    wherever possible)."""
    n, d = vectors.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m {m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    out = []
    for j in range(m):
        x = vectors[:, j * dsub : (j + 1) * dsub].astype(np.float64)
        # k-means++ init
        cents = [x[rng.randint(n)]]
        d2 = np.full(n, np.inf)
        for _ in range(1, k):
            d2 = np.minimum(d2, ((x - cents[-1]) ** 2).sum(axis=1))
            total = d2.sum()
            if total <= 0:
                cents.append(x[rng.randint(n)])
                continue
            r = rng.rand() * total
            cents.append(x[np.searchsorted(np.cumsum(d2), r).clip(0, n - 1)])
        c = np.stack(cents)
        for _ in range(iters):
            dist = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for ci in range(k):
                mask = assign == ci
                if mask.any():
                    c[ci] = x[mask].mean(axis=0)
                else:
                    c[ci] = x[dist.min(axis=1).argmax()]
        out.append([[float(v) for v in row] for row in c])
    return out


def _sub(vec: Column, j: int, dsub: int) -> Column:
    return F.slice(vec, j * dsub + 1, dsub)


def _sq_dist(a: Column, lit_c: list[float]) -> Column:
    """Squared L2 distance to a literal centroid — sequential fold, the
    same bit-deterministic order as simsearch.dot."""
    c = F.array(*[F.lit(float(v)) for v in lit_c])
    return F.aggregate(
        F.zip_with(a, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame, art: dict, vcol: str = "embedding", out: str = "pq_code"
) -> DataFrame:
    """Append `out`: array<int> of length m — per-subspace argmin centroid
    ids (0-based). NULL, wrong-length, or degenerate vectors (any NULL /
    NaN / ±Inf element) encode to NULL (the caller exempts them, the house
    dedup convention). The degenerate guard is what keeps the downstream
    ADC scan TOTAL: a NaN distance makes every strict-< comparison false,
    the argmin fold would return its -1 seed, and `element_at(lut, 0)`
    aborts the whole job with INVALID_INDEX_OF_ZERO under ANSI — one bad
    crawled embedding must not kill a 100 TB scan. ZERO shuffle, zero
    Python."""
    m, k, dim = art["m"], art["k"], art["dim"]
    dsub = dim // m
    vec = F.col(vcol)
    codes = []
    for j in range(m):
        entries = F.array(
            *[
                F.struct(
                    _sq_dist(_sub(vec, j, dsub), art["codebooks"][j][c]).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(k)
            ]
        )
        # first-minimal argmin: strict < keeps the earlier centroid on ties,
        # matching DuckDB's list_indexof(first occurrence) in the twin
        best = F.aggregate(
            entries,
            F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("c")),
            lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
        )
        codes.append(best["c"])
    # x.isNull() first: it is never NULL itself, so `exists` is TRUE/FALSE
    # (never NULL) and the ~ below cannot leak a NULL condition
    degenerate = F.exists(
        vec,
        lambda x: x.isNull()
        | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == F.lit(float("inf"))),
    )
    code_arr = F.when(
        vec.isNotNull() & (F.size(vec) == dim) & ~degenerate, F.array(*codes)
    )
    return df.withColumn(out, code_arr)


def adc_lut(query: list[float], art: dict) -> list[list[float]]:
    """Driver-side m×k table: lut[j][c] = ‖q_j − codebook[j][c]‖² in
    float64, summed in index order (bit-stable across engines)."""
    m, k, dim = art["m"], art["k"], art["dim"]
    dsub = dim // m
    lut = []
    for j in range(m):
        q = query[j * dsub : (j + 1) * dsub]
        row = []
        for c in range(k):
            acc = 0.0
            for x, y in zip(q, art["codebooks"][j][c], strict=True):
                acc += (float(x) - float(y)) * (float(x) - float(y))
            row.append(acc)
        lut.append(row)
    return lut


def adc_distance_col(code_col: Column, lut: list[list[float]]) -> Column:
    """Approximate squared distance Σ_j lut[j][code[j]] — a statically
    unrolled fixed-order sum of element_at lookups into literal arrays."""
    acc: Column = F.lit(0.0)
    for j, row in enumerate(lut):
        table = F.array(*[F.lit(float(v)) for v in row])
        acc = acc + F.element_at(table, F.element_at(code_col, j + 1) + 1)
    return acc


def pq_adc_topk(
    encoded: DataFrame,
    query: list[float],
    art: dict,
    k_results: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id_col, adc_dist) of the k_results nearest codes to `query` by ADC.
    orderBy+limit compiles to TakeOrderedAndProject — per-partition heaps,
    no global sort. Ties break on id (deterministic, oracle-comparable)."""
    lut = adc_lut(query, art)
    return (
        encoded.filter(F.col(code_col).isNotNull())
        .select(id_col, adc_distance_col(F.col(code_col), lut).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k_results)
    )


def pq_adc_rerank_topk(
    embeddings: DataFrame,
    query: list[float],
    art: dict,
    k_results: int = 10,
    n_candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production two-stage scan: ADC shortlist of n_candidates over
    the compressed codes, then EXACT L2 re-rank of just those rows —
    (id_col, exact_dist) top-k.

    Final recall equals shortlist recall (measured on the worst-case
    near-uniform sf0.01 corpus: ~0.59 @ C=30, ~0.72 @ C=50, ~0.90 @ C=100
    for k=10 — see PLANS.md §PQ recall), while the full-precision column is
    touched for only n_candidates rows: the shortlist (≤ C ids) broadcasts
    into a BroadcastHashJoin against the vector table, so the 100 TB float
    column is point-read, never scanned, never shuffled."""
    shortlist = pq_adc_topk(
        pq_encode(embeddings, art), query, art, n_candidates, id_col
    ).select(id_col)
    exact = F.broadcast(shortlist).join(
        embeddings.select(id_col, vec_col), id_col
    )
    return (
        exact.select(
            id_col,
            _sq_dist(F.col(vec_col), [float(x) for x in query]).alias("exact_dist"),
        )
        .orderBy("exact_dist", id_col)
        .limit(k_results)
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _list_sql(vals: list[float]) -> str:
    return "[" + ",".join(repr(float(v)) for v in vals) + "]"


def pq_encode_sql(art: dict, vcol: str = "embedding") -> str:
    """SQL expression: the m-int code list for `vcol` (NULL when NULL,
    wrong length, or any element is NULL/NaN/±Inf — the same degenerate
    guard as pq_encode). list_indexof(l, list_min(l)) is the first-minimal
    argmin, matching the Spark fold's strict-< tie policy."""
    m, k, dim = art["m"], art["k"], art["dim"]
    dsub = dim // m
    parts = []
    for j in range(m):
        sub = f"{vcol}[{j * dsub + 1}:{j * dsub + dsub}]"
        dists = ",".join(
            "list_aggregate(list_transform(list_zip("
            f"{sub}, {_list_sql(art['codebooks'][j][c])}), "
            "p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])"
            "), 'sum')"
            for c in range(k)
        )
        parts.append(f"(list_indexof([{dists}], list_min([{dists}])) - 1)")
    degenerate = (
        f"len(list_filter({vcol}, x -> x IS NULL OR "
        f"NOT isfinite(CAST(x AS DOUBLE)))) > 0"
    )
    return (
        f"(CASE WHEN {vcol} IS NULL OR len({vcol}) != {dim} OR {degenerate} "
        f"THEN NULL ELSE [{','.join(parts)}] END)"
    )


def adc_distance_sql(code_expr: str, lut: list[list[float]]) -> str:
    """DuckDB twin of adc_distance_col — same literals, same left-to-right
    addition order."""
    acc = "0.0"
    for j, row in enumerate(lut):
        acc = f"({acc} + {_list_sql(row)}[{code_expr}[{j + 1}] + 1])"
    return acc
