"""Similarity search over embedding columns (SURVEY.md §2C + training-data ops).

Two tiers, as mandated by the task brief:
  - brute-force cosine top-k: exact baseline, broadcast the query side;
    O(N·d) per query — correct at any N, bounded by scan speed.
  - LSH-bucketed ANN (random hyperplanes / SimHash): the 100 TB path —
    candidates meet only inside matching sign-pattern buckets, so the
    cross join never materializes. Recall tunable via n_tables × n_bits.

All vector math is pure Column HOFs (zip_with/aggregate, double-cast before
multiply) so results are bit-deterministic and oracle-comparable; the
hyperplane projection is a deterministic seeded matrix built driver-side and
broadcast as literal arrays.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of dot() — the ONE SQL-fold builder every oracle uses
    (a second copy could drift and silently break the documented
    bit-identical parity).

    NULL/ragged parity guard: Spark's zip_with pads the short side with NULL,
    the product is NULL, and the aggregate fold propagates it — so a NULL or
    length-mismatched pair yields NULL. DuckDB's list_zip also pads with NULL
    but list_aggregate('sum') IGNORES NULLs, silently computing a partial dot
    over the overlapping prefix; the CASE restores Spark's semantics."""
    fold = (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    )
    return (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL OR len({a}) != len({b}) "
        f"THEN NULL ELSE {fold} END)"
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def finite_vectors(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Rows whose vector supports cosine/k-means math: non-NULL, exactly
    `dim` long, finite entries, positive norm. dot(v,v) folds every
    pathology into one scalar — NULL entries → NULL, NaN entries → NaN,
    ±Inf entries or overflow → +Inf, the zero vector → 0 — so one four-way
    predicate rejects them all (crawled-corpus embeddings contain each;
    an unguarded NaN poisons any mean/argmax downstream because Spark
    compares NaN greater than every number)."""
    v = F.col(vec_col)
    d2 = dot(v, v)
    return df.filter(
        v.isNotNull()
        & (F.size(v) == dim)
        & d2.isNotNull()
        & ~F.isnan(d2)
        & (d2 > 0)
        & (d2 < F.lit(float("inf")))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, NULL (never NaN) for degenerate inputs. A
    zero-norm vector gives 0/0 = NaN under IEEE doubles, and Spark both
    sorts NaN FIRST under desc() and evaluates NaN >= t as TRUE — so one
    all-zeros embedding in a crawled corpus would rank as every query's #1
    neighbor AND pass every threshold filter (r04 review). NULL instead
    sorts last and fails filters. nanvl catches NaN-ENTRY vectors the same
    way (their dot is NaN even with a positive norm); NULL/ragged inputs
    already propagate NULL through the zip_with fold."""
    den = l2_norm(a) * l2_norm(b)
    return F.when(
        den > 0, F.nanvl(dot(a, b) / den, F.lit(None).cast("double"))
    )


def guarded_cosine(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """cosine() for the precomputed-norm verify path: one dot fold per pair,
    norms are scalar columns computed once per vector. Same NULL-never-NaN
    degenerate policy as cosine() — the SINGLE definition both
    lsh_neardup_pairs and lsh_neardup_marks_incremental verify with, so the
    incremental marks can never diverge from the full-recompute semantics
    by a one-sided policy edit (r04 review)."""
    return F.when(
        (na > 0) & (nb > 0),
        F.nanvl(dot(va, vb) / (na * nb), F.lit(None).cast("double")),
    )


def earlier_collision_expr(n_tables: int, a_buckets: str, b_buckets: str) -> Column:
    """Emit-once predicate over per-row LSH bucket arrays: TRUE when the
    joined pair already collided in a table EARLIER than the current
    posexploded `_table` (positions 0-based). UNROLLED as a flat OR of
    element_at comparisons — the natural slice/zip_with/exists HOF spelling
    is interpreted (not codegen'd) and measured 2.6× slower on the full
    pair query at sf0.1; the unrolled form is n_tables simple predicates
    inside WholeStageCodegen. Shared by the batch and incremental pair
    generators (r04 review: keep one copy of the collision policy)."""
    expr = F.lit(False)
    for s in range(n_tables):
        expr = expr | (
            (F.col("_table") > s)
            & (F.element_at(a_buckets, s + 1) == F.element_at(b_buckets, s + 1))
        )
    return expr


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k per query: broadcast queries × scan embeddings → window.
    Ties broken by candidate id (deterministic total order). exclude_self
    drops candidate==query rows BEFORE ranking so they don't eat a rank slot."""
    from pyspark.sql import Window as W

    joined = embeddings.crossJoin(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim"),
    ).filter(F.col("cos_sim").isNotNull())  # degenerate vectors rank nowhere
    w = W.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplanes(dim: int, n_bits: int, seed: int = 13) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def simhash_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each hyperplane, packed into a long."""
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in planes
    ]
    acc = F.lit(0).cast("long")
    for b in bits:
        acc = acc * 2 + b
    return acc


def lsh_ann(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: candidates share a SimHash bucket in ≥1 of n_tables
    hash tables; exact cosine re-rank inside the candidate set.

    Per-table collision probability for angle θ is (1-θ/π)^n_bits — pick
    n_bits by the similarity regime: clustered embeddings (θ small) tolerate
    8-16 bits; near-uniform data (θ≈60-90°, like the synthetic test vectors)
    needs 4 bits or recall collapses. Defaults favor recall.

    Scale shape: the bucket join is an equi-join on (table, bucket) — shuffle
    or broadcast by size, never a cross join. Bucket skew (dense regions)
    is AQE-splittable because re-rank cost is per-candidate-pair."""
    from pyspark.sql import Window as W

    tables = [hyperplanes(dim, n_bits, seed=13 + t) for t in range(n_tables)]

    def bucketed(df: DataFrame, vcol: str, icol: str) -> DataFrame:
        rows = [
            df.select(
                F.col(icol),
                F.col(vcol),
                F.lit(t).alias("_table"),
                simhash_bucket(F.col(vcol), planes).alias("_bucket"),
            )
            for t, planes in enumerate(tables)
        ]
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    cand = bucketed(embeddings, vec_col, id_col).join(
        bucketed(queries, query_vec_col, query_id_col), on=["_table", "_bucket"]
    )
    scored = (
        cand.select(
            query_id_col, id_col, cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim")
        )
        .filter(F.col("cos_sim").isNotNull())  # degenerate vectors rank nowhere
        .groupBy(query_id_col, id_col)
        .agg(F.first("cos_sim").alias("cos_sim"))
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def train_centroids(
    embeddings: DataFrame,
    n_lists: int = 8,
    dim: int = 64,
    sample_n: int = 2048,
    iters: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic sampled k-means centroids for IVF (r03 VERDICT #2 —
    replaces the lowest-id-vectors stand-in, which had no recall story).

    Scale shape: the sample is the hash-lowest `sample_n` rows —
    orderBy(xxhash64)+limit compiles to TakeOrderedAndProject (per-partition
    top-n heap + driver merge, NO global sort, no shuffle of the corpus), so
    driver memory is O(sample_n·dim) regardless of N: at 10^12 vectors this
    is still 2048 rows (~1 MB). Training then runs driver-side in numpy —
    spherical k-means (rows L2-normalized, matching the cosine probe metric)
    with seeded k-means++ init and Lloyd iterations; empty clusters reseed
    from the point farthest from its centroid. Fixed seed + hash order ⇒
    same corpus, same centroids, every run.
    """
    rows = (
        # finite_vectors, not just NULL/size: a NaN/Inf-entry or zero row in
        # the sample turns the k-means++ distance vector NaN (silently
        # degrading seeding to uniform) and Lloyd means to NaN (r04 review).
        # On a clean corpus the guard excludes nothing, so existing frozen
        # artifacts are unchanged; CENTROID_CACHE_VERSION bumped anyway so
        # any cache trained on a dirty corpus re-trains.
        finite_vectors(embeddings.select(id_col, vec_col), vec_col, dim)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("train_centroids: no valid vectors to sample")
    X = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(nrm == 0, 1.0, nrm)  # spherical: unit rows (zero rows stay zero)
    k = min(n_lists, len(X))
    rng = np.random.default_rng(seed)

    cents = np.empty((k, dim))
    cents[0] = X[int(rng.integers(len(X)))]
    d2 = np.sum((X - cents[0]) ** 2, axis=1)
    for j in range(1, k):  # k-means++: sample ∝ squared distance to nearest seed
        tot = d2.sum()
        p = d2 / tot if tot > 0 else np.full(len(X), 1.0 / len(X))
        cents[j] = X[int(rng.choice(len(X), p=p))]
        d2 = np.minimum(d2, np.sum((X - cents[j]) ** 2, axis=1))

    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        lab = d.argmin(axis=1)
        # reseed order for empty clusters: farthest-from-assigned-centroid
        # first, DISTINCT point per empty cluster — reseeding every empty
        # cluster to the same argmax point made them duplicate centroids,
        # and the strictly-greater probe router then starved the higher
        # cell id forever (effective n_lists silently shrank — r04 review)
        far = np.argsort(-d.min(axis=1), kind="stable")
        n_empty = 0
        for j in range(k):
            pts = X[lab == j]
            if len(pts):
                c = pts.mean(axis=0)
                cn = np.linalg.norm(c)
                cents[j] = c / cn if cn > 0 else c
            else:
                cents[j] = X[int(far[n_empty % len(far)])]
                n_empty += 1
    return cents.tolist()


CENTROID_CACHE_VERSION = "v2"  # v2: finite_vectors sample guard (identical
# output on clean corpora; invalidates any cache trained on a dirty one)


def train_centroids_cached(
    embeddings: DataFrame,
    source_path: str,
    n_lists: int = 8,
    dim: int = 64,
    sample_n: int = 2048,
    iters: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train-once IVF index build: centroids are trained at most once per
    (data version, training params) and republished from a JSON cache after
    that — the production ANN shape, where the index artifact lives beside
    the table snapshot and probes never retrain (retraining per query would
    re-scan the corpus sample on every call at 100 TB).

    The data version is a fingerprint of the source parquet's file listing —
    (relative name, size, mtime_ns) per data file — so appending, rewriting,
    or compacting the table invalidates the cache, while a byte-identical
    re-read hits it. On a real deployment this key is the Iceberg/Delta
    snapshot id; here the listing is its filesystem stand-in. Publication
    goes through io/locking.publish_file (flock + staged rename), the same
    seam every other cross-process cache in the repo uses, so concurrent
    first-callers train once, not N times. json.dump round-trips Python
    floats exactly, so cached centroids are bit-identical to fresh ones
    (train_centroids is deterministic for a fixed corpus + seed)."""
    import hashlib
    import json
    import os

    ents: list[tuple[str, int, int]] = []
    if os.path.isfile(source_path):
        st = os.stat(source_path)
        ents.append((os.path.basename(source_path), st.st_size, st.st_mtime_ns))
    else:
        for root, _, files in os.walk(source_path):
            for fn in sorted(files):
                if fn.startswith((".", "_")) or fn.endswith(".crc"):
                    continue
                p = os.path.join(root, fn)
                st = os.stat(p)
                ents.append(
                    (os.path.relpath(p, source_path), st.st_size, st.st_mtime_ns)
                )
    if not ents:
        # a typo'd/moved path would otherwise hash a CONSTANT key — every
        # corpus with a bad path silently shares one stale centroid bank and
        # data-version invalidation (the fingerprint's whole point) is
        # defeated (r04 review)
        raise ValueError(
            f"train_centroids_cached: no data files under {source_path!r}"
        )
    params = [n_lists, dim, sample_n, iters, seed, id_col, vec_col]
    key = hashlib.sha256(
        json.dumps([CENTROID_CACHE_VERSION, sorted(ents), params]).encode()
    ).hexdigest()[:24]
    from wikidataquality_spark.io.locking import publish_file, user_cache_root

    target = os.path.join(user_cache_root("wdq_ivf_cache"), f"centroids_{key}.json")

    def write(staging: str) -> None:
        cents = train_centroids(
            embeddings,
            n_lists=n_lists,
            dim=dim,
            sample_n=sample_n,
            iters=iters,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        )
        with open(staging, "w") as f:
            json.dump(cents, f)

    with open(publish_file(target, write)) as f:
        return json.load(f)


def train_centroids_distributed(
    embeddings: DataFrame,
    n_lists: int = 8,
    dim: int = 64,
    iters: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[list[float]] | None = None,
) -> list[list[float]]:
    """Full-corpus spherical k-means — the 100 TB trainer, for when a
    driver-side sample (train_centroids) is not representative enough.

    Each Lloyd iteration is one Spark job shaped for scale:
      - assignment is the zero-shuffle literal-centroid argmax
        (assign_cells) — no join, no exchange on the corpus;
      - the mean update is posexplode(vec) → groupBy(cell, pos).sum —
        partial aggregation combines map-side to ≤ n_lists×dim rows PER
        PARTITION, so the only exchange moves O(partitions·k·d) tiny rows
        no matter how big the corpus is; the driver collects k·d sums
        (a few KB) and renormalizes.
    Total cost: iters × (one corpus scan + one k·d-row shuffle). Nothing
    quadratic, nothing driver-resident beyond the centroid bank itself.

    Init defaults to the deterministic sampled k-means++ seeds
    (train_centroids with iters=0), so the distributed refinement starts
    from the same reproducible geometry. Empty cells keep their previous
    centroid (the zero-shuffle analogue of the sampled trainer's
    farthest-point reseed, which would need a global argmax pass here).

    Determinism: exact for a fixed partitioning; across DIFFERENT
    partitionings the per-cell double sums may differ in final ulps
    (floating addition is non-associative and partial aggregation order
    follows the data layout). That is inherent to any distributed mean and
    is why the ORACLE-grade artifact path stays the sampled trainer — this
    trainer targets recall quality at scale, and its tests assert geometry
    (inertia, assignment agreement), not bit equality."""
    # Totality guard (r04 review — verified failure mode): one NaN-entry
    # embedding poisons the whole bank. Spark compares NaN GREATER than any
    # number, so a NaN norm passes `_nrm > 0`, sum(v/_nrm) goes NaN, and in
    # the next iteration the NaN centroid's NaN score wins every strict->
    # argmax — the entire corpus collapses into one cell. The shared
    # finite_vectors guard rejects every pathology BEFORE both the seed
    # sample and the Lloyd assignment.
    valid = finite_vectors(
        embeddings.select(F.col(id_col), F.col(vec_col)), vec_col, dim
    )
    if init is None:
        # raw embeddings, not `valid`: train_centroids applies the same
        # finite_vectors guard internally, so passing the pre-filtered frame
        # would stack a second identical dot-fold filter in the seed plan
        init = train_centroids(
            embeddings,
            n_lists=n_lists,
            dim=dim,
            iters=0,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        )
    cents = [list(map(float, c)) for c in init]
    k = len(cents)  # acc/cnt sized by the ACTUAL bank (a caller-supplied
    # init longer than n_lists would otherwise emit cells past n_lists and
    # IndexError the accumulator — r04 review)
    for _ in range(iters):
        assigned = assign_cells(valid, cents, vec_col, id_col, 1)
        # spherical objective: average UNIT rows (the sampled trainer
        # normalizes its sample the same way). The norm is a scalar column
        # computed once per row and carried through the Generate, so the
        # per-exploded-element work is one divide — not the per-element
        # norm-fold inlining hazard transform(v, x -> x/‖v‖) has.
        # `_cell != 0` is belt-and-braces: valid rows always assign 1..k
        # (finite positive-norm vectors have finite scores), so the filter
        # is a no-op that only matters if the validity guard is relaxed.
        sums = (
            assigned.select(
                "_cell",
                l2_norm(F.col(vec_col)).alias("_nrm"),
                F.col(vec_col),
            )
            .filter(F.col("_cell") != 0)
            .select("_cell", "_nrm", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("_cell", "pos")
            .agg(
                F.sum(F.col("v").cast("double") / F.col("_nrm")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        acc = np.zeros((k, dim))
        cnt = np.zeros(k, dtype=np.int64)
        for r in sums:
            acc[r["_cell"] - 1, r["pos"]] = r["s"]
            cnt[r["_cell"] - 1] = r["n"]
        for j in range(k):
            if cnt[j] == 0:
                continue  # empty cell: keep previous centroid
            c = acc[j] / cnt[j]
            nrm = float(np.linalg.norm(c))
            cents[j] = (c / nrm).tolist() if nrm > 0 else c.tolist()
    return cents


def _cell_scores(vec_col: Column, centroids: list[list[float]]) -> Column:
    """array<struct<score,cell>> — each centroid's dot(vec, c)/‖c‖, a pure
    Column HOF over a LITERAL centroid bank. argmax of dot/‖c‖ equals argmax
    of cosine (the row's own ‖vec‖ is a positive constant factor), so no
    per-row norm is needed for routing. Zero joins, zero shuffle."""
    entries = []
    for i, c in enumerate(centroids):
        cn = float(np.sqrt(np.dot(c, c))) or 1.0
        entries.append(
            F.struct(
                (dot(vec_col, F.array(*[F.lit(float(x)) for x in c])) / F.lit(cn)).alias(
                    "score"
                ),
                F.lit(i + 1).alias("cell"),
            )
        )
    return F.array(*entries)


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vcol: str,
    icol: str,
    n_keep: int = 1,
) -> DataFrame:
    """Attach the n_keep nearest cell ids to each row — ZERO shuffle.

    r03 VERDICT #1 (the one 100×-weak plan): the old implementation did
    crossJoin(broadcast(centroids)) then row_number() OVER (PARTITION BY id)
    — an N×n_lists row expansion PLUS a full exchange of the expanded table
    just to take an argmin. At 100 TB of embeddings that exchange is pure
    waste. Now the centroid bank is a literal array column: n_keep=1 is an
    aggregate-fold argmax, n_keep>1 sorts the (score, cell) array with a
    comparator and explodes the top slice — both stay inside the row, so the
    physical plan has NO Exchange and NO Window (gated by
    tests/test_simsearch.py::test_assign_cells_plan_has_no_exchange).

    Unassignable rows (NULL / wrong-length vector ⇒ NULL scores): the
    n_keep=1 path folds them to cell 0 — real cells are 1..n_lists, so
    callers exclude them with one `_cell != 0` filter (ivf_topk does, on
    BOTH sides: a probe assigned with n_probe=1 also folds to cell 0, and
    without the filter a bad query would equi-join the data side's cell-0
    rows and emit NULL-cosine candidates — r04 review); the n_keep>1 path
    DROPS them (the NULL-score filter empties the array and explode emits
    no row). End state is identical either way: an unassignable row
    contributes no ANN results, and neither path shuffles."""
    scores = _cell_scores(F.col(vcol), centroids)
    if n_keep == 1:
        best = F.aggregate(
            scores,
            F.struct(
                F.lit(float("-inf")).alias("score"), F.lit(0).alias("cell")
            ),
            lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
        )
        return df.withColumn("_cell", best["cell"])
    cmp = lambda l, r: (
        F.when(l["score"] > r["score"], F.lit(-1))
        .when(l["score"] < r["score"], F.lit(1))
        .when(l["cell"] < r["cell"], F.lit(-1))
        .when(l["cell"] > r["cell"], F.lit(1))
        .otherwise(F.lit(0))
    )
    topn = F.slice(F.array_sort(scores, cmp), 1, n_keep)
    return df.withColumn(
        "_cell", F.explode(F.filter(topn, lambda s: s["score"].isNotNull())["cell"])
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_vec",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition vectors into n_lists cells by
    nearest centroid; each query probes only its n_probe closest cells and
    re-ranks exactly inside them.

    Centroids come from a deterministic sampled k-means (train_centroids) —
    pass `centroids` to reuse a trained bank. Assignment is a zero-shuffle
    literal-array HOF argmax (assign_cells); the ONLY exchanges in the whole
    plan are the cell equi-join (query side broadcast — it's tiny) and the
    final per-query rank window over the candidate set, which is
    |cell|×n_probe rows, not N. That equi-join is the point at corpus scale:
    candidate work is |cell|×n_probe instead of N per query.

    Recall/cost knob: n_probe/n_lists. n_probe = n_lists degenerates to exact
    brute force (useful as a correctness check). Measured recall on the
    sf0.1 corpus is recorded in PLANS.md (tools/ivf_recall.py).
    """
    from pyspark.sql import Window as W

    if centroids is None:
        centroids = train_centroids(
            embeddings, n_lists=n_lists, dim=dim, id_col=id_col, vec_col=vec_col
        )

    # cell 0 = unassignable (NULL/ragged vector): real cells are 1..n_lists,
    # so filter it from BOTH sides — with n_probe=1 the probe side uses the
    # same fold-to-0 path as the data side, and without this filter a bad
    # query would join the data side's cell-0 rows and return NULL-cosine
    # "neighbors" (r04 review); the data-side filter also prunes dead rows
    # before the join. Narrow filters, no exchange added.
    vecs = assign_cells(embeddings, centroids, vec_col, id_col, 1).filter(
        F.col("_cell") != 0
    )
    probes = assign_cells(
        queries, centroids, query_vec_col, query_id_col, n_probe
    ).filter(F.col("_cell") != 0)
    cand = vecs.join(F.broadcast(probes), "_cell").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    # data-side rows live in exactly ONE cell and probe cells are distinct by
    # construction, so a (query, candidate) pair meets at most once — no
    # dedup groupBy needed (the old n_keep>1-both-sides shape required one)
    scored = cand.select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim")
    ).filter(F.col("cos_sim").isNotNull())  # degenerate vectors rank nowhere
    w = W.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b). Exact all-pairs
    baseline (O(N²) theta join) — use ONLY for oracle/test comparisons; the
    scale path is lsh_neardup_pairs below."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


LSH_PAIR_BITS = 4
LSH_PAIR_TABLES = 8
LSH_PAIR_SEED = 13


def lsh_pair_tables(dim: int = 64) -> list[list[list[float]]]:
    """The frozen hyperplane bank shared by lsh_neardup_pairs and its SQL
    twin (lsh_neardup_pairs_sql) — both engines bucket with the exact same
    constants, so candidate sets are identical by construction."""
    return [
        hyperplanes(dim, LSH_PAIR_BITS, seed=LSH_PAIR_SEED + t)
        for t in range(LSH_PAIR_TABLES)
    ]


def lsh_bucket_arrays(
    embeddings: DataFrame,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _buckets array<long>) — one row per vector carrying every
    table's SimHash bucket id in table order, computed in one mapInPandas
    pass. The array form (rather than exploded (id, table, bucket) rows) is
    what lets lsh_neardup_pairs emit each colliding pair exactly once with
    a map-side filter instead of a distinct shuffle of the pair stream.

    Bit-parity contract: simhash_bucket folds acc = acc + x_j·p_j in
    dimension order with double math; here acc is a numpy column vector and
    the loop adds V[:, j]·P[:, j] in the same order — identical IEEE ops per
    (row, plane), so sign patterns (and the packed bucket longs) equal the
    Column version and the DuckDB twin exactly.

    NULL / wrong-length vectors bucket to 0 in every table — the Column
    path's behavior (NULL dot ≥ 0 is NULL → otherwise(0) per bit); np.stack
    on a ragged batch would abort the task."""
    import pandas as pd

    bank = np.asarray(tables, dtype=np.float64)  # (T, B, D)
    n_tables, n_bits, dim = bank.shape
    flat = bank.reshape(n_tables * n_bits, dim)  # plane-major, table order

    out_schema = f"{id_col} long, _buckets array<long>, _pairable boolean"

    def compute(batches):
        for pdf in batches:
            ids_all = pdf[id_col].to_numpy()
            if len(ids_all) == 0:
                continue
            vecs = pdf[vec_col].to_numpy()
            valid = np.fromiter(
                (v is not None and len(v) == dim for v in vecs),
                dtype=bool,
                count=len(vecs),
            )
            packed = np.zeros((len(ids_all), n_tables), dtype=np.int64)
            # _pairable = this row could ever pass a cosine verify: right
            # length, all-finite entries, positive norm. Degenerate rows
            # (zero vectors, NaN entries) hash to CONSTANT buckets in every
            # table, so m of them meet m²/2 times in the bucket join and
            # every one of those pairs is then verify-filtered (NULL
            # cosine) — a pure-waste quadratic hub at crawl scale, where
            # zeroed embedding rows are routine. Flagging them here lets the
            # pair operator drop them before the join; the emitted pair SET
            # is unchanged by construction.
            pairable = valid.copy()
            idx = np.nonzero(valid)[0]
            if len(idx):
                v = np.stack(vecs[idx]).astype(np.float64)  # (n, D)
                finite = np.isfinite(v).all(axis=1)
                norm_pos = (v * v).sum(axis=1) > 0
                pairable[idx] = finite & norm_pos
                acc = np.zeros((len(idx), flat.shape[0]))
                for j in range(dim):
                    # same op order as the sequential fold: acc += x_j * p_j
                    acc += v[:, j : j + 1] * flat[:, j]
                bits = (acc >= 0).astype(np.int64)  # (n, T*B)
                for t in range(n_tables):
                    col = np.zeros(len(idx), dtype=np.int64)
                    for b in range(n_bits):
                        col = col * 2 + bits[:, t * n_bits + b]
                    packed[idx, t] = col
            yield pd.DataFrame(
                {id_col: ids_all, "_buckets": list(packed), "_pairable": pairable}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(compute, out_schema)


def lsh_bucket_ids(
    embeddings: DataFrame,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _table, _bucket) exploded view of lsh_bucket_arrays — same
    bit-parity and NULL/ragged contract; kept as the row-per-table surface
    tests and ad-hoc bucket inspection use."""
    return lsh_bucket_arrays(embeddings, tables, id_col=id_col, vec_col=vec_col).select(
        id_col, F.posexplode("_buckets").alias("_table", "_bucket")
    )  # _pairable dropped: the exploded view reports raw buckets for ALL rows


def lsh_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN near-dup pairs, the 100 TB shape (VERDICT r01 #5): candidates are
    pairs sharing a random-hyperplane bucket in ≥1 of LSH_PAIR_TABLES tables
    — an EQUI self-join on (table, bucket), never an `id_a < id_b`
    nested-loop — then verified by exact cosine ≥ threshold.

    Semantics are honest ANN: precision is exact (every emitted pair truly
    has cos ≥ threshold — the verify step guarantees it); recall is the LSH
    collision probability 1−(1−(1−θ/π)^bits)^tables per pair. The bucketing
    is fully deterministic (seeded planes, sequential double math), so the
    output is reproducible and oracle-comparable bit-for-bit: the DuckDB
    twin replicates the same planes as inline literals.

    Skewed buckets (dense regions) split under AQE; the per-table bucket
    join shuffles (table, bucket, id, vec) rows only."""
    tables = lsh_pair_tables(dim)
    # All n_tables × n_bits projections in ONE vectorized Arrow pass
    # (lsh_bucket_arrays) instead of an n_tables-way union of Column dot-fold
    # expressions: the union's 32 zip_with/aggregate trees with 64 literals
    # each cost ~2s of codegen+eval per call at sf0.1; the numpy path is a
    # (rows × dims) × (dims × planes) product with the same sequential-fold
    # rounding, so bucket ids are bit-identical to simhash_bucket and the
    # inlined-constant SQL twin. barrier() (checkpoint-dir-aware eager
    # materialization — operators/barrier.py) instead of persist(): both
    # self-join sides share the materialization and the blocks free on GC —
    # no cache leak (r02 VERDICT "what's wrong" #1); with a reliable
    # checkpoint dir set, executor loss recomputes instead of killing the job.
    from wikidataquality_spark.operators.barrier import barrier

    # Emit-once (below) leaves NO exchange between here and the final
    # filter: when the bucket join broadcasts its build side, the whole
    # fan-out join + cosine verify runs at THIS RDD's parallelism. The id
    # stream inherits the scan's input splits — one tiny split (or a few
    # skewed ones) would serialize the compute-dense verify onto one core
    # (measured 4.4s vs ~1.5s at sf0.1). Explicit numPartitions so AQE's
    # byte-based coalescing — blind to compute density — can't undo it;
    # the cost is one exchange of the ID stream (N·tables longs), nothing
    # next to the pair-stream shuffle emit-once removes.
    sc = embeddings.sparkSession.sparkContext
    bucketed = barrier(
        lsh_bucket_arrays(embeddings, tables, id_col=id_col, vec_col=vec_col)
        .repartition(sc.defaultParallelism)
    )
    # Emit-once: a pair colliding in several tables is emitted ONLY at its
    # first colliding table — each join row carries both sides' full bucket
    # arrays (n_tables longs, bounded) and a map-side filter rejects the
    # pair when any EARLIER table already collided. This replaces the old
    # `.distinct()` with zero shuffles: the pair stream (≫ the id stream —
    # every bucket of size m contributes m(m−1)/2 rows) never gets hash-
    # repartitioned just to dedup, which at corpus scale was the single
    # largest exchange in the query.
    # Unpairable rows (NULL/wrong-length/zero-norm/NaN-entry vectors) are
    # EXCLUDED FROM PAIRING BY CONTRACT: none of them can be LSH-hashed for
    # dim-D planes, so they all land in bucket 0 of every table — m of them
    # would meet m²/2 times in the join below (a pure-waste quadratic hub,
    # routine in crawled embeddings), and any pair they did survive into
    # (two equal-but-wrong-length vectors whose raw cosine clears the
    # threshold) would be an accident of the constant bucket, not an ANN
    # result with a recall story. Dropping them pre-join makes the contract
    # explicit; the SQL twin enforces the same len == dim bound (r04 review
    # — the twin previously accepted equal-but-wrong-length pairs Spark now
    # rejects).
    pos = bucketed.filter("_pairable").select(
        id_col, F.posexplode("_buckets").alias("_table", "_bucket"), "_buckets"
    )
    a = pos.select(
        F.col(id_col).alias("id_a"), "_table", "_bucket", F.col("_buckets").alias("_bka")
    )
    b = pos.select(
        F.col(id_col).alias("id_b"), "_table", "_bucket", F.col("_buckets").alias("_bkb")
    )
    earlier_collision = earlier_collision_expr(len(tables), "_bka", "_bkb")
    cand = (
        a.join(b, ["_table", "_bucket"])
        .filter((F.col("id_a") < F.col("id_b")) & ~earlier_collision)
        .select("id_a", "id_b")
    )
    # Precompute each vector's norm ONCE (2 folds per vector) so the
    # per-candidate verify is a single dot-product fold — the same
    # dot/(na*nb) expression shape as the SQL twin, so results stay
    # bit-identical; naive cosine() here would fold 3 aggregates per pair.
    normed = embeddings.select(
        F.col(id_col), F.col(vec_col), F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("_nrm")
    )
    va = normed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_nrm").alias("_na")
    )
    vb = normed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_nrm").alias("_nb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            # guarded_cosine: NULL, never NaN, for degenerate inputs — Spark
            # evaluates NaN >= t as TRUE, so an unguarded 0/0 from a
            # zero-norm vector would emit garbage pairs past the threshold
            # (r04 review). On valid vectors the guarded expression is
            # value-identical to the bare quotient, so SQL-twin parity holds.
            "cos_sim",
            guarded_cosine(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def lsh_neardup_pairs_sql(threshold: float = 0.5, dim: int = 64) -> str:
    """DuckDB twin of lsh_neardup_pairs: identical plane constants inlined as
    E-notation literals (DuckDB parses E-notation as DOUBLE; plain decimals
    would become DECIMAL and change the sign arithmetic), identical
    sequential-fold dot products, identical bucket packing. Dot products come
    from the shared NULL/ragged-guarded dot_sql builder (one SQL fold for
    every oracle).

    Degenerate-vector guards mirror cosine()'s NULL-never-NaN policy: DuckDB
    returns NULL for x/0.0 (zero-norm pairs already drop), but a NaN-ENTRY
    vector with positive norm yields a real NaN cosine and DuckDB evaluates
    NaN >= t as TRUE (NaN sorts greatest) — without the isnan/nrm guards the
    twin would emit pairs Spark's nanvl→NULL filter rejects. NULL-ENTRY
    arrays (legal in parquet; also what pandas→DuckDB registration turns NaN
    into) diverge the other way: Spark's zip_with fold propagates the NULL
    (pair rejected) while list_aggregate('sum') IGNORES it (real cosine,
    pair emitted) — the list_filter length guards exclude them explicitly."""
    dot = dot_sql

    def plane_lit(p: list[float]) -> str:
        return "[" + ", ".join(f"{x:.17e}" for x in p) + "]"

    tables = lsh_pair_tables(dim)
    bucket_selects = []
    for t, planes in enumerate(tables):
        bits = [
            f"(CASE WHEN {dot('embedding', plane_lit(p))} >= 0 THEN 1 ELSE 0 END)"
            for p in planes
        ]
        # same packing as simhash_bucket: acc = acc*2 + bit, in plane order
        acc = "0"
        for bexpr in bits:
            acc = f"({acc} * 2 + {bexpr})"
        # NULL / wrong-length parity with lsh_bucket_ids: those vectors
        # bucket to 0 in every table. Without the CASE, list_zip pads the
        # short side with NULL and list_aggregate('sum') IGNORES NULLs, so
        # DuckDB would compute real sign buckets where Spark emits 0 — the
        # candidate sets would diverge on any ragged input
        bucket_selects.append(
            f"SELECT vec_id, {t} AS t, "
            f"CASE WHEN embedding IS NULL OR len(embedding) != {dim} "
            f"THEN 0 ELSE {acc} END AS bucket FROM embeddings"
        )
    buckets_cte = "\nUNION ALL\n".join(bucket_selects)
    return f"""
WITH bt AS (
{buckets_cte}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bt a JOIN bt b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
n AS (
  SELECT vec_id, embedding,
         sqrt({dot('embedding', 'embedding')}) AS nrm
  FROM embeddings)
SELECT c.id_a, c.id_b,
       ROUND({dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 4) AS cos_sim
FROM cand c
JOIN n a ON a.vec_id = c.id_a
JOIN n b ON b.vec_id = c.id_b
WHERE len(a.embedding) = {dim} AND len(b.embedding) = {dim}
  AND len(list_filter(a.embedding, x -> x IS NOT NULL)) = len(a.embedding)
  AND len(list_filter(b.embedding, x -> x IS NOT NULL)) = len(b.embedding)
  AND a.nrm > 0 AND b.nrm > 0
  AND NOT isnan({dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm))
  AND {dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {threshold}
"""


def embedding_state_fingerprints(
    embeddings: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket-fingerprint rows for the incremental embedding-dedup state
    table: (id, _buckets array<long>) per PAIRABLE vector — the embedding
    analogue of dedup.dup_fingerprints. Successive crawl snapshots append
    these (~8×8 B per vector); the vectors themselves are NOT duplicated
    into the state — the corpus table already stores them, and the verify
    step point-joins only the candidate ids back to it."""
    tables = lsh_pair_tables(dim)
    return (
        lsh_bucket_arrays(embeddings, tables, id_col=id_col, vec_col=vec_col)
        .filter("_pairable")
        .select(id_col, "_buckets")
    )


def lsh_neardup_marks_incremental(
    batch: DataFrame,
    state_buckets: DataFrame | None,
    state_vectors: DataFrame | None,
    threshold: float = 0.5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental embedding near-dup flags: (id, is_near_dup) for every
    batch row, deduplicated against the WHOLE corpus seen so far without
    recomputing history — the embedding-modality twin of dup_marks'
    state-aware mode (operators/dedup.py), completing the incremental
    family across both modalities.

    state_buckets = appended embedding_state_fingerprints rows (id,
    _buckets); state_vectors = the historical corpus table (id, vec) the
    verify step point-joins candidates back to. Pass None/None for a
    first batch (pure within-batch marks).

    Semantics (same survivor order as dup_marks): a batch row is flagged
    iff a verified cosine ≥ threshold partner exists that is EITHER a
    state row (the already-written copy always survives) OR a batch row
    with smaller id. Candidates come from the same emit-once LSH bucket
    equi-joins as lsh_neardup_pairs — recall is the same collision
    probability, precision is exact (every flag is cosine-verified). A
    state id colliding with a batch id is dropped first, so a retried
    batch (exactly-once resume) never flags itself against its own
    previous write.

    Scale shape: only bucket rows (id + 8 longs) and candidate (id, id)
    pairs shuffle; state VECTORS are touched only for candidate ids — the
    norm/cosine fold sits ABOVE the candidate equi-join, so Spark reads
    (id, vec) for matching rows and never folds the historical corpus
    (an equi-join the state table's bucketing-by-id layout serves as
    point lookups — io/bucketed.py). At 10¹² docs the per-batch cost is
    the state-bucket equi-join; an Iceberg state table partitioned by
    bucket prefix turns that into a pruned read of matching buckets only
    (io/catalog.py documents the partition seam)."""
    if (state_buckets is None) != (state_vectors is None):
        # One-sided state is silently-wrong, not degraded: candidates from
        # buckets with no vectors to verify against (or vice versa) drop in
        # the inner verify join, yielding within-batch-only marks with no
        # error — near-dups of the whole written corpus would pass (r04
        # review, runtime-verified failure).
        raise ValueError(
            "state_buckets and state_vectors must be provided together "
            "(both None for a first batch)"
        )
    tables = lsh_pair_tables(dim)
    from wikidataquality_spark.operators.barrier import barrier

    sc = batch.sparkSession.sparkContext
    bucketed = barrier(
        lsh_bucket_arrays(batch, tables, id_col=id_col, vec_col=vec_col).repartition(
            sc.defaultParallelism
        )
    )
    pos = bucketed.filter("_pairable").select(
        id_col, F.posexplode("_buckets").alias("_table", "_bucket"), "_buckets"
    )
    loser = pos.select(
        F.col(id_col).alias("_id"), "_table", "_bucket", F.col("_buckets").alias("_bka")
    )
    # emit-once across tables: the SAME predicate builder as
    # lsh_neardup_pairs, so the collision policy cannot diverge
    earlier_collision = earlier_collision_expr(len(tables), "_bka", "_bkb")

    # within-batch candidates: the smaller id survives, the larger is the
    # (potential) dup — emit (loser=_id, neighbor=_nid, from_state=false)
    bb = pos.select(
        F.col(id_col).alias("_nid"), "_table", "_bucket", F.col("_buckets").alias("_bkb")
    )
    cand_bb = (
        loser.join(bb, ["_table", "_bucket"])
        .filter((F.col("_nid") < F.col("_id")) & ~earlier_collision)
        .select("_id", "_nid", F.lit(False).alias("_n_from_state"))
    )
    cands = [cand_bb]
    if state_buckets is not None:
        sb = (
            # exactly-once resume: a replayed batch must not flag itself
            # against its own previous write
            state_buckets.join(batch.select(F.col(id_col)), id_col, "left_anti")
            .select(
                F.col(id_col).alias("_nid"),
                F.posexplode("_buckets").alias("_table", "_bucket"),
                F.col("_buckets").alias("_bkb"),
            )
        )
        cand_bs = (
            loser.join(sb, ["_table", "_bucket"])
            .filter(~earlier_collision)  # state partner ALWAYS outranks
            .select("_id", "_nid", F.lit(True).alias("_n_from_state"))
        )
        cands.append(cand_bs)
    cand = cands[0] if len(cands) == 1 else cands[0].unionByName(cands[1])

    # verify: one dot fold per candidate against precomputed norms; neighbor
    # vectors come from the batch or the historical corpus table
    vbatch = batch.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("_n"),
    )
    nbatch = batch.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nv"))
    if state_vectors is not None:
        nside = nbatch.withColumn("_s", F.lit(False)).unionByName(
            state_vectors.select(
                F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nv")
            ).withColumn("_s", F.lit(True))
        )
        # a state id that equals a batch id was anti-joined out of the
        # BUCKET stream, so its vector row is never matched — no anti-join
        # needed here; the _s tag keeps same-id batch/state rows distinct
        joined = cand.join(
            nside, (cand["_nid"] == nside["_nid"]) & (cand["_n_from_state"] == nside["_s"])
        )
    else:
        joined = cand.join(nbatch, "_nid")
    # Neighbor norm ABOVE the candidate join: Catalyst evaluates a Project
    # where it is placed, so the sqrt(dot(v,v)) fold runs once per
    # CANDIDATE row, never once per historical-corpus row — this is what
    # makes the "state vectors touched only for candidate ids" contract
    # real (r04 review: a pre-join Project folded norms over the ENTIRE
    # state table on every batch). Candidates ≪ corpus, so recomputing the
    # norm per candidate row beats materializing it per state row.
    joined = joined.withColumn("_nn", F.sqrt(dot(F.col("_nv"), F.col("_nv"))))
    cos = guarded_cosine(F.col("_nv"), F.col("_v"), F.col("_nn"), F.col("_n"))
    flagged = (
        joined.join(vbatch, "_id")
        .filter(cos >= threshold)
        .select(F.col("_id").alias(id_col))
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
    return (
        batch.select(id_col)
        .join(flagged, id_col, "left")
        .select(id_col, F.coalesce("is_near_dup", F.lit(False)).alias("is_near_dup"))
    )
