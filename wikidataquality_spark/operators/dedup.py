"""Corpus-level deduplication (SURVEY.md §2A#7, §2B "Dedup").

Parity: UniqueValueChecker (ref≈includes/ConstraintCheck/Checker/
UniqueValueChecker.php:~30-80) — the one reference rule that is cross-row.
The reference answered it with per-value SQL point lookups; at 10^12 docs the
Spark-native answer is a shuffle:

  exact:   hash(text) → window(row_number) → keep first        (1 shuffle)
  near:    MinHash signatures → LSH band buckets → min-url      (1 UDF + 1 shuffle)

Survivor choice is a deterministic TOTAL order (min url, SURVEY §7 hard-#3),
so results are invariant under repartitioning — verified by property test.

Scale notes (10^12 docs / 1000 executors):
  - The exact-dedup shuffle moves (hash8B, url) pairs, never document bodies:
    dedup keys are projected before the shuffle, bodies rejoin via the kept
    urls (left_semi), which AQE plans as a broadcast when the survivor set is
    partition-local.
  - MinHash banding emits B rows per doc (B band keys); band-bucket skew is
    bounded because identical signatures collapse into the same bucket — the
    pathological case (boilerplate cluster of millions) is exactly the case
    AQE skew-split + the salted groupBy below are for.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikidataquality_spark.rules.model import sql_ident

# Fingerprint-state format tag for the EXACT kind. v1 rows carried
# k2=length(text); v2 carries the independent second hash xxhash64(1, text).
# The kind string embeds the version so a stale persisted state table is
# DETECTED (unknown kind -> loud error in incremental_validate) instead of
# silently matching nothing.
STATE_EXACT_KIND = "exact2"
# Band kind v2: the r04 dedup-correctness sweep changed band-fingerprint
# SEMANTICS (positional sub-k shingle combiner for short docs, NULL
# signature for token-less text), so pre-sweep band rows no longer match
# the keys the same text hashes to today. Embedding the version in the
# kind makes such stale state fail LOUDLY in incremental_validate's
# unknown-kind check instead of silently matching nothing (r04 review).
STATE_BAND_KIND = "band2"
STATE_KINDS = (STATE_EXACT_KIND, STATE_BAND_KIND)

# MinHash geometry: H hashes = B bands × R rows. Jaccard threshold ≈ (1/B)^(1/R)
# → B=16, R=8 ⇒ ~0.71; near-dup pairs (1 sentence changed of ~6) sit well above.
MINHASH_H = 128
MINHASH_BANDS = 16
MINHASH_ROWS = 8
SHINGLE_K = 3

# Verify stage (r04 VERDICT #2): a bucket-collided candidate pair is only
# dropped when ≥ this many of its H=128 signature components agree. The
# component-agreement fraction is the standard unbiased Jaccard estimator
# (each minhash component matches with probability exactly J), conditioned
# here on the collided band's R=8 forced-equal components, so
# E[matches] ≈ R + (H−R)·J with σ = √(J(1−J)(H−R)) ≈ 5.6 components.
# 80/128 = 0.625 sits between the low-J admissions the r04 planted sweep
# measured and the banding's design point ≈0.71:
#   J=0.45 → E≈62, 3.1σ below 80  (the 0.3–0.5 bin's 2.5% admissions → ≈0)
#   J=0.50 → E≈68, 2.0σ below 80  (~2% of collided pairs still admitted)
#   J=0.80 → E≈104, 4.5σ above 80 (recall at the design point unchanged)
# Integer-count comparison (not a fraction) so the DuckDB oracle twin is
# decision-identical with no float-literal parity concerns.
MINHASH_VERIFY_MIN_EQ = 80

_MERSENNE_P = np.uint64((1 << 61) - 1)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Keep the minimum-id row per identical text. The window partitions by
    TWO independently-seeded 64-bit hashes (xxhash64(text) and
    xxhash64(1, text) — the leading literal changes the seed of the text
    fold, so a collision in one does not imply a collision in the other), so
    the shuffle key is 16 bytes, not the document, and the false-drop
    probability per pair is ~2⁻¹²⁸ — ~10⁻¹⁵ expected false pairs even at
    10¹² docs, where a single 64-bit key would yield ~10⁴ real collisions.

    NULL text (extraction failures) is exempt from dedup: unknown content is
    not 'identical' content — without the exemption every NULL-text doc
    shares one hash partition and all but one would be silently dropped.
    Exemption happens BEFORE the window (filter + union back), not as an
    escape clause after it: xxhash64(NULL) is a constant, so a corpus with
    millions of extraction failures would otherwise sort its entire NULL
    population in one straggler window partition just to discard the rank."""
    w = W.partitionBy(
        F.xxhash64(text_col), F.xxhash64(F.lit(1), F.col(text_col))
    ).orderBy(id_col)
    nn = F.col(text_col).isNotNull()
    deduped = (
        df.filter(nn)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return deduped.unionByName(df.filter(~nn))


def has_dedupable_content(text_col: str | Column) -> Column:
    """Cheap SOUND pre-filter for near-dup participation: non-NULL text with
    at least one ASCII-visible char. Contentless docs (NULL or token-less
    text) carry no content signal — their signatures would collapse to
    constants, so byte-different contentless docs would near-dup each other
    and all but the min-id survivor would be silently dropped (r04 review).

    This predicate is deliberately only a PRE-filter: Java's '\\S' uses
    ASCII character classes, so a doc of unicode whitespace (NBSP,
    ideographic space) passes it even though Python split() — the
    signature tokenizer — yields zero tokens. The AUTHORITATIVE exemption
    is `signature IS NULL`: the UDFs emit NULL for token-less text, so the
    gate is defined by the tokenizer itself and cannot drift from it.
    Soundness (never excludes a tokenful doc) holds because Java's \\s set
    is a subset of Python's whitespace set."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return col.isNotNull() & col.rlike(r"\S")


def _hash_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_P, size=MINHASH_H, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE_P, size=MINHASH_H, dtype=np.uint64)
    return a, b


def _fnv64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# order-sensitive shingle combiner constants (odd → bijective under mod 2^64)
_SHINGLE_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9], dtype=np.uint64)


def _shingles_from_hashes(th: np.ndarray) -> np.ndarray:
    """k-gram shingle hashes from per-token hashes (rolling xor-mix)."""
    if len(th) < SHINGLE_K:
        # sub-k docs collapse to ONE shingle, combined with the SAME
        # position multipliers as the full path — a plain th.sum() was
        # order-insensitive, so 'river bank' and 'bank river' produced
        # identical signatures and near-dup'd each other (r04 review).
        # Zero-token docs keep the constant 0, but callers EXEMPT them
        # from dedup entirely (contentless ≠ duplicate content).
        if not len(th):
            return np.array([0], dtype=np.uint64)
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(len(th)):
            # array (not scalar) multiply: uint64 wraparound is the intended
            # modulus and numpy only warns on SCALAR overflow
            acc ^= th[j : j + 1] * _SHINGLE_MIX[j]
        return acc
    n_sh = len(th) - SHINGLE_K + 1
    acc = np.zeros(n_sh, dtype=np.uint64)
    for j in range(SHINGLE_K):
        acc ^= th[j : j + n_sh] * _SHINGLE_MIX[j]
    return acc


def _shingle_hashes(tokens: list[str], vocab: dict[str, int]) -> np.ndarray:
    """k-word shingle hashes: memoized per-token FNV + vectorized rolling mix.
    The token-hash cache amortizes hashing to once per distinct token per
    batch (Zipf'd corpora → tiny working set)."""
    th = np.fromiter(
        (vocab[t] if t in vocab else vocab.setdefault(t, _fnv64(t)) for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )
    return _shingles_from_hashes(th)


def _minhash_sig(base: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (a*x + b) mod 2^64 with odd a — multiply-shift hash family; uint64
    # wraparound is the modulus. min over shingles per hash function.
    vals = a[:, None] * base[None, :] + b[:, None]
    return vals.min(axis=1).astype(np.int64)


def minhash_sig_series(
    texts: pd.Series, a: np.ndarray, b: np.ndarray, vocab: dict[str, int]
) -> pd.Series:
    """Signatures for one batch (shared by minhash_udf and the fused enrich
    stage — operators/enrich.py — so the algorithm, and therefore every
    near-dup decision, is bit-identical on both paths).

    Per-token hashing is memoized in `vocab`, which the caller keeps alive
    across batches — each distinct token is FNV-hashed once per worker
    lifetime. (Two batch-vectorized variants were tried and measured SLOWER
    than this loop: a batch-wide factorize — building the flat token list
    costs more than the residual dict lookups — and a blocked
    minimum.reduceat over concatenated shingles — the non-contiguous
    per-doc column extraction eats the saving.)"""
    sigs = []
    for t in texts:
        if t is None:
            sigs.append(None)
            continue
        tokens = t.lower().split()
        if not tokens:
            # NULL signature for token-less text: the TOKENIZER itself
            # defines contentlessness, so downstream exemptions gate on
            # `signature IS NULL` and can never disagree with it. (A
            # Spark-side regex gate can: Java '\\S' uses ASCII classes, so
            # an NBSP-only doc passes rlike('\\S') while Python split()
            # yields zero tokens — r04 review.)
            sigs.append(None)
            continue
        base = _shingle_hashes(tokens, vocab)
        sigs.append(_minhash_sig(base, a, b).tolist())
    return pd.Series(sigs, index=texts.index)


def minhash_params() -> tuple[np.ndarray, np.ndarray]:
    a, b = _hash_params()
    return a | np.uint64(1), b  # odd multipliers


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    a, b = minhash_params()  # once per task
    vocab: dict[str, int] = {}
    for texts in batches:
        yield minhash_sig_series(texts, a, b, vocab)


def band_keys(sig_col: str | Column = "minhash_sig") -> Column:
    """B band keys per signature: xxhash64(band_index, signature slice)."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    keys = [
        F.xxhash64(F.lit(i), F.slice(sig, i * MINHASH_ROWS + 1, MINHASH_ROWS))
        for i in range(MINHASH_BANDS)
    ]
    return F.array(*keys)


def band_keys_sql(sig_name: str) -> str:
    """SQL-string twin of band_keys (bit-identical: int literals hash like
    F.lit(int)). String composition avoids ~3 py4j round trips per band per
    plan construction — driver-serial time (rules/model.CheckExpr)."""
    qsig = sql_ident(sig_name)
    keys = ", ".join(
        f"xxhash64({i}, slice({qsig}, {i * MINHASH_ROWS + 1}, {MINHASH_ROWS}))"
        for i in range(MINHASH_BANDS)
    )
    return f"array({keys})"


def sig_match_count(a: Column, b: Column) -> Column:
    """Number of equal components between two minhash signatures — pure JVM
    higher-order functions, no Python stage. matches/H is the classic
    unbiased Jaccard estimator (Broder '97)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    verify: bool = True,
    verify_min_eq: int = MINHASH_VERIFY_MIN_EQ,
) -> DataFrame:
    """Drop near-duplicates: a row is dropped when an LSH band bucket
    contains a row with a smaller id (deterministic min-id survivor per
    bucket) AND — with verify=True, the default — the pair's signature
    component agreement confirms the similarity (≥ verify_min_eq of H=128
    components equal; see MINHASH_VERIFY_MIN_EQ's derivation).

    Why verify is default-ON for THIS operator (r04 VERDICT #2): dropping is
    unrecoverable, and the measured planted sweep showed band collisions at
    J 0.3–0.5 admitting ~2.5% of pairs — at 10¹² docs that is wrongly
    deleted documents. SimHash (simhash_dedup) and the media hashes already
    verify inline; this closes the one dedup family that marked on bucket
    collision alone. The non-destructive flag variant (dup_marks) keeps
    collision semantics: its flags feed the rule layer (scrub-not-drop,
    recoverable) and its incremental state rows (STATE_BAND_KIND) carry
    band keys only — verified flags against state would need a
    signature-bearing state kind, the documented v3 upgrade path.

    Plan shape: one pandas-UDF projection (signatures), one explode (B
    rows/doc, key+id only), min(id) OVER (PARTITION BY band_key) — ONE
    narrow exchange, single UDF consumer (r04 review) — then, for verify,
    candidate PAIRS (id, keep_id) re-fetch their signatures through a
    broadcast-semi-joined re-run of the UDF over candidate rows only
    (candidates are the dup-ish fraction of the corpus, so the second UDF
    pass touches few docs and both sig joins broadcast; a corpus that is
    MOSTLY duplicates should pass verify=False — collision-only semantics,
    zero extra cost — or budget for candidate-scale shuffles). Greedy
    min-anchor caveat shared with simhash_dedup: verification is against
    the bucket's anchor specifically, so a chain A<B<C where C resembles B
    but not A keeps C when A anchors every shared bucket — collision-only
    dedup dropped C on B's bucket alone.
    """
    # contentless docs (NULL or token-less text) are exempt: the rlike is a
    # cheap sound pre-filter, the NULL-signature filter is the tokenizer-
    # defined authority — see has_dedupable_content
    sigs = df.filter(has_dedupable_content(text_col)).select(
        F.col(id_col), minhash_udf(F.col(text_col)).alias("_sig")
    )
    # NULL-signature (token-less) rows drop out via explode-of-NULL — a
    # filter on the UDF output would re-extract the UDF into a second
    # ArrowEvalPython stage (filter + projection each evaluate it); the
    # CASE keeps ONE consumer and explode skips NULL arrays
    bands = sigs.select(
        id_col,
        F.explode(
            F.when(F.col("_sig").isNotNull(), band_keys(F.col("_sig")))
        ).alias("_band_key"),
    )
    cand = (
        bands.withColumn("_keep_id", F.min(id_col).over(W.partitionBy("_band_key")))
        .filter(F.col(id_col) != F.col("_keep_id"))
        .select(id_col, "_keep_id")
        .distinct()
    )
    if not verify:
        dropped = cand.select(id_col).distinct()
        return df.join(dropped, id_col, "left_anti")
    # candidate ids (both pair sides) → second, candidate-only UDF pass.
    # All verify frames are candidate-scale and broadcast: the fat corpus
    # frame never shuffles for verification.
    cand_ids = (
        cand.select(id_col)
        .unionByName(cand.select(F.col("_keep_id").alias(id_col)))
        .distinct()
    )
    vsigs = (
        df.join(F.broadcast(cand_ids), id_col, "left_semi")
        .filter(has_dedupable_content(text_col))
        .select(F.col(id_col), minhash_udf(F.col(text_col)).alias("_vsig"))
    )
    dropped = (
        cand.join(
            F.broadcast(vsigs.select(F.col(id_col), F.col("_vsig").alias("_sig_a"))),
            id_col,
        )
        .join(
            F.broadcast(
                vsigs.select(
                    F.col(id_col).alias("_keep_id"), F.col("_vsig").alias("_sig_b")
                )
            ),
            "_keep_id",
        )
        .filter(
            sig_match_count(F.col("_sig_a"), F.col("_sig_b")) >= F.lit(verify_min_eq)
        )
        .select(id_col)
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def dup_marks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    broadcast_flags: bool = True,
    sig_col: str | None = None,
    state: DataFrame | None = None,
) -> DataFrame:
    """Non-destructive variant: annotate rows with is_exact_dup / is_near_dup
    flags so the rule layer can emit violation records instead of dropping.

    Shuffle hygiene: both flag computations run on a NARROW projection
    (id + 16-byte hash / 1KB signature) — document bodies never enter a
    shuffle. When the caller already carries minhash signatures (the fused
    enrich stage emits them — pass sig_col), NO python stage runs here at
    all: the keyed projection is pure JVM expressions over the cached frame.

    Plan shape: one shuffle for the exact window, one for the band window,
    one small distinct; the near flag uses min(id) OVER (PARTITION BY bucket)
    instead of groupBy+self-join (one exchange fewer, no join).

    `state` (optional) makes the operator INCREMENTAL: a fingerprint table of
    previously-processed documents (schema of `dup_fingerprints`: id, kind
    STATE_EXACT_KIND|STATE_BAND_KIND, k1, k2) is unioned into both flag windows, so a
    new batch is deduplicated against the whole corpus seen so far without
    re-reading any document body. The production analogue at 10^12 docs is an
    Iceberg fingerprint table keyed by (kind, k1) that successive crawl
    snapshots append to — state rows are ~24 bytes/doc·(1+B bands), and only
    they shuffle. Survivor precedence: a state match ALWAYS flags the batch
    copy (the already-written document survives); among batch rows the min
    id wins. Flags therefore equal the global batch computation whenever
    ingest order respects the survivor total order (every state id precedes
    every batch id — streaming/windows.py enforces this), and degrade to
    written-copy-wins otherwise (partition resume). State rows whose id
    collides with a batch id are dropped first, so a retried batch
    (exactly-once resume) never flags itself."""
    qid = sql_ident(id_col)
    qtext = sql_ident(text_col)
    # SQL-string plan construction (one selectExpr per step instead of a py4j
    # round trip per sub-expression) — dup_marks cost ~0.35s of driver-serial
    # plan-build time per invocation the Column way (rules/model.CheckExpr).
    # NULL text is exempt from both flag paths (unknown content is not
    # duplicate content): xxhash64(NULL) is a CONSTANT and band keys of a
    # NULL signature collapse to xxhash64(band_i), so without the filter
    # every extraction-failure doc would flag as a dup of unrelated pages —
    # and since every rule is NULL-inapplicable, those spurious flags would
    # be the sole keep/drop decider for exactly those docs.
    # The NEAR path additionally exempts token-less text (r04 review):
    # byte-DIFFERENT contentless docs must not near-dup each other, but
    # byte-IDENTICAL whitespace pages ARE legitimately exact dups, so the
    # exact window keeps the NULL-only exemption. The near gate is
    # `_sig IS NOT NULL` — the signature UDF emits NULL for token-less
    # text, so the exemption is defined by the tokenizer itself (a regex
    # gate diverged on unicode whitespace).
    if sig_col is not None:
        qsig = sql_ident(sig_col)
        keyed = df.where(f"{qtext} IS NOT NULL").selectExpr(
            qid,
            f"xxhash64({qtext}) AS _h",
            f"xxhash64(1, {qtext}) AS _h2",
            f"{qsig} AS _sig",
        )
    else:
        keyed = df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col),
            F.xxhash64(text_col).alias("_h"),
            F.xxhash64(F.lit(1), F.col(text_col)).alias("_h2"),
            minhash_udf(F.col(text_col)).alias("_sig"),
        )
    if state is not None:
        state = state.join(keyed.select(id_col), id_col, "left_anti")

    # exact identity = BOTH independently-seeded 64-bit hashes equal (the
    # leading literal in xxhash64(1, text) changes the seed of the text
    # fold): false-positive probability ~2⁻¹²⁸ per pair — negligible at
    # 10¹² docs, where a single 64-bit key yields ~10⁴ real collisions and
    # each one silently drops a unique document.
    exact_in = keyed.selectExpr(qid, "_h", "_h2", "FALSE AS _from_state")
    if state is not None:
        exact_in = exact_in.unionByName(
            state.filter(F.col("kind") == STATE_EXACT_KIND).select(
                F.col(id_col),
                F.col("k1").alias("_h"),
                F.col("k2").alias("_h2"),
                F.lit(True).alias("_from_state"),
            )
        )
    # id-level aggregation (bool_and): an id is an exact dup only when EVERY
    # instance is a non-survivor. With unique ids (the data-model contract)
    # this is the plain per-row flag; with a re-crawled id appearing twice,
    # the per-instance flags would otherwise rejoin onto BOTH instances and
    # drop the survivor itself.
    # Survivor order: state rows sort FIRST (`_from_state DESC` — an
    # already-written copy always wins), THEN min id. Under the streaming
    # survivor-order precondition (every state id < every batch id) this is
    # identical to plain min-id — but a partition-resume caller (run_pipeline
    # --resume) feeds state whose ids are arbitrary relative to the batch,
    # and ordering by id alone would leave BOTH copies kept whenever the
    # unwritten copy's id sorts first.
    exact = (
        exact_in.selectExpr(
            qid,
            "_from_state",
            "(row_number() OVER (PARTITION BY _h, _h2 "
            f"ORDER BY _from_state DESC, {qid})) > 1 AS _inst_dup",
        )
        .filter("NOT _from_state")
        .groupBy(id_col)
        .agg(F.expr("bool_and(_inst_dup)").alias("is_exact_dup"))
    )

    bands = keyed.selectExpr(
        qid,
        # explode of the CASE: NULL-signature (token-less) rows emit no
        # band rows — same single-UDF-consumer rationale as minhash_dedup
        f"explode(CASE WHEN _sig IS NOT NULL THEN {band_keys_sql('_sig')} END)"
        " AS _band_key",
        "FALSE AS _from_state",
    )
    if state is not None:
        bands = bands.unionByName(
            state.filter(F.col("kind") == STATE_BAND_KIND).select(
                F.col(id_col),
                F.col("k1").alias("_band_key"),
                F.lit(True).alias("_from_state"),
            )
        )
    # same state precedence as the exact window: a bucket containing ANY
    # state row flags every batch row in it (the written copy survives);
    # otherwise min-id within the batch. bool_or piggybacks on the same
    # window partitioning — no extra shuffle.
    near = (
        bands.selectExpr(
            qid,
            "_from_state",
            f"min({qid}) OVER (PARTITION BY _band_key) AS _keep_id",
            "max(CASE WHEN _from_state THEN 1 ELSE 0 END)"
            " OVER (PARTITION BY _band_key) AS _has_state",
        )
        .filter(f"(_has_state = 1 OR {qid} != _keep_id) AND (NOT _from_state)")
        .select(id_col)
        .distinct()
        .selectExpr(qid, "TRUE AS is_near_dup")
    )
    # SPARSE flags: only rows that ARE duplicates enter the broadcast — a row
    # absent from the flag set is non-dup by construction (left join + false
    # fill below). The dup set is a small fraction of the corpus, so the
    # driver-side broadcast build (the one serial step of the whole dedup
    # stage — measured ~1.5s for a dense 200k-row build) shrinks with the dup
    # rate, and the broadcast path stays feasible far deeper into the
    # 10^12-doc regime. Beyond that, broadcast_flags=False selects the
    # sort-merge rejoin riding the bucketed-by-id table layout (both sides
    # bucket-pruned, zero shuffle).
    flags = (
        exact
        .join(near, id_col, "left")
        .selectExpr(
            qid,
            "is_exact_dup",
            "coalesce(is_near_dup, FALSE) AS is_near_dup",
        )
        .filter("is_exact_dup OR is_near_dup")
    )
    if broadcast_flags:
        flags = F.broadcast(flags)
    out = df.join(flags, id_col, "left")
    return out.withColumns(
        {
            "is_exact_dup": F.expr("coalesce(is_exact_dup, FALSE)"),
            "is_near_dup": F.expr("coalesce(is_near_dup, FALSE)"),
        }
    )


def dup_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    sig_col: str | None = None,
) -> DataFrame:
    """Fingerprint rows for the incremental-dedup state table (`dup_marks`
    state= input): per doc, one 'exact' row (k1 = xxhash64(text),
    k2 = xxhash64(1, text) — the independent second hash of the exact
    window) plus one band-kind row per LSH band key (k2 = 0). ~24 bytes ×
    (1 + B) rows per document — the only thing a later batch needs to dedup
    against this one; document bodies never persist into state."""
    sig_expr = (
        F.col(sig_col) if sig_col is not None else minhash_udf(F.col(text_col))
    )
    # NULL-text docs emit no fingerprints, and token-less docs (NULL
    # signature) emit no BAND fingerprints — mirroring dup_marks' exemptions
    # exactly so state and batch stay aligned
    keyed = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.xxhash64(text_col).alias("_h"),
        F.xxhash64(F.lit(1), F.col(text_col)).alias("_h2"),
        sig_expr.alias("_sig"),
    )
    exact = keyed.select(
        id_col,
        F.lit(STATE_EXACT_KIND).alias("kind"),
        F.col("_h").alias("k1"),
        F.col("_h2").alias("k2"),
    )
    band = keyed.select(
        id_col,
        F.lit(STATE_BAND_KIND).alias("kind"),
        F.explode(
            F.when(F.col("_sig").isNotNull(), band_keys(F.col("_sig")))
        ).alias("k1"),
        F.lit(0).cast("long").alias("k2"),
    )
    return exact.unionByName(band)


# ---------------------------------------------------------------------------
# SimHash near-dup (the third dedup family: exact / MinHash-Jaccard / SimHash-
# cosine-of-token-multisets). 64-bit signature; Hamming distance ≤ k ⇒ near-dup.
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # pigeonhole: hamming ≤ SIMHASH_BANDS-1 ⇒ ≥1 identical band
SIMHASH_MAX_HAMMING = 3

_BIT_SHIFTS = np.arange(SIMHASH_BITS, dtype=np.uint64)


@F.pandas_udf(T.LongType())
def simhash_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """64-bit SimHash over the token multiset: each token votes ±1 per bit
    position by its 64-bit hash; the sign vector packs into one long.
    Memoized per-token hashing (same cache discipline as minhash_udf)."""
    vocab: dict[str, int] = {}
    for texts in batches:
        out = np.zeros(len(texts), dtype=np.int64)
        mask = np.zeros(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            if t is None:
                continue
            tokens = t.lower().split()
            if not tokens:
                # NULL signature for token-less text — same tokenizer-
                # defined exemption contract as minhash_sig_series
                continue
            mask[i] = True
            th = np.fromiter(
                (vocab[w] if w in vocab else vocab.setdefault(w, _fnv64(w)) for w in tokens),
                dtype=np.uint64,
                count=len(tokens),
            )
            bits = ((th[:, None] >> _BIT_SHIFTS) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.nonzero(votes >= 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = sig.astype(np.int64)
        # nullable Int64, NOT .where(..., None): int64→float64 promotion would
        # round 64-bit signatures to 53-bit mantissas, batch-layout-dependently
        s = pd.Series(out, index=texts.index).astype("Int64")
        s[~mask] = pd.NA
        yield s


def simhash_band_keys(sig_col: str | Column = "simhash") -> Column:
    """SIMHASH_BANDS keys of 16 bits each, tagged by band index so different
    bands never collide into the same bucket."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    width = SIMHASH_BITS // SIMHASH_BANDS
    keys = [
        F.xxhash64(F.lit(i), F.shiftrightunsigned(sig, i * width).bitwiseAND(F.lit((1 << width) - 1)))
        for i in range(SIMHASH_BANDS)
    ]
    return F.array(*keys)


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Drop SimHash near-duplicates: candidate pairs share ≥1 of 4 16-bit
    bands (pigeonhole: any pair with hamming ≤ 3 shares a band); candidates
    are VERIFIED by exact Hamming distance (bit_count(xor)) before anything
    is dropped — banding only bounds the candidate set, it never decides.

    Greedy min-anchor semantics (same as minhash_dedup, standard LSH dedup):
    each doc is verified against its buckets' MINIMUM id only. A true pair
    (B, C) sharing a bucket whose min is an unrelated A > hamming-3 from
    both is not compared, so B and C can both survive — recall is bounded by
    the anchor choice, never precision (no false drops). Full within-bucket
    pairing would be quadratic in bucket size, the wrong trade at corpus
    scale.

    Plan shape (narrow end-to-end): signatures are one pandas-UDF projection
    of (id, 8-byte sig); banding explodes to 4 key rows/doc; the anchor id
    AND its signature come from ONE min(struct(id, sig)) OVER (PARTITION BY
    bucket) — ids are unique, so the struct ordering never reaches the sig
    field and the winner is exactly the bucket's min-id row. That window
    replaces the old groupBy + verify-join-back, which (a) was a second
    exchange and (b) consumed the signature-UDF lineage from two different
    exchange subtrees, recomputing the UDF over the full corpus twice
    (r04 review). Hamming verification is inline; everything after the UDF
    moves ≤16-byte rows."""
    # contentless docs (NULL or token-less text) are exempt: simhash of no
    # tokens is the constant 0, so every such doc would share all 4 band
    # buckets, verify at hamming 0, and be dropped as a "near-dup" of
    # byte-different whitespace-only pages — see has_dedupable_content
    sigs = df.filter(has_dedupable_content(text_col)).select(
        F.col(id_col), simhash_udf(F.col(text_col)).alias("_sh")
    )
    # explode-of-NULL drops token-less rows without a UDF-output filter
    # (which would re-extract the UDF into a second Arrow stage)
    bands = sigs.select(
        id_col,
        "_sh",
        F.explode(
            F.when(F.col("_sh").isNotNull(), simhash_band_keys("_sh"))
        ).alias("_bk"),
    )
    anchor = F.min(F.struct(F.col(id_col).alias("i"), F.col("_sh").alias("s"))).over(
        W.partitionBy("_bk")
    )
    dropped = (
        bands.withColumn("_anchor", anchor)
        .filter(F.col(id_col) != F.col("_anchor")["i"])
        .filter(
            F.bit_count(F.col("_sh").bitwiseXOR(F.col("_anchor")["s"])) <= max_hamming
        )
        .select(id_col)
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Skew handling (BASELINE.json:6: hash-partition by url-host with salting)
# ---------------------------------------------------------------------------


# tracking params stripped by canonical_url: bare name or name=value, plus
# the whole utm_* family by prefix. Frozen like STOPWORDS — extending it
# changes which recrawls count as duplicates.
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$"


def canonical_url(url_col: str | Column = "url") -> Column:
    """Best-effort crawl-URL canonicalization for URL-level dedup (the CCNet/
    RefinedWeb pre-dedup step: the same page is crawled as http/https,
    with/without www, with tracking params, with a fragment — all one
    document). Pure Column regexp work, fully codegen'd:

      - scheme + authority lowercased; one leading 'www.' stripped; default
        port dropped (':80' for http, ':443' for https);
      - path kept case-sensitive, trailing '/'s stripped ('/a/' == '/a';
        root collapses to no path);
      - query params: tracking params (utm_*, gclid, fbclid, ...) dropped,
        the rest SORTED so param order never distinguishes documents;
      - fragment dropped.

    URLs with no scheme:// prefix pass through trimmed-but-unchanged
    (canonicalization is best-effort normalization, never a parser that can
    reject); NULL stays NULL. Userinfo, being part of the authority, is
    lowercased with it — vanishingly rare in crawl URLs and harmless for a
    dedup key."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    # (www\.)+ not www\.: a repeated prefix ('www.www.example.com') must
    # strip in ONE pass or canonical(canonical(u)) != canonical(u)
    # (r04 review — the idempotence invariant is load-bearing)
    auth = F.regexp_replace(auth, r"^(www\.)+", "")
    # single-colon anchor so the strip is IDEMPOTENT: a malformed authority
    # like 'host:80:80' must not lose one ':80' per canonicalization pass
    # (canonical_url(canonical_url(u)) == canonical_url(u) is load-bearing —
    # pipelines re-canonicalize already-canonical URLs routinely)
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r"^([^:]+):80$", "$1"))
        .when(scheme == "https", F.regexp_replace(auth, r"^([^:]+):443$", "$1"))
        .otherwise(auth)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    # first '?' before any '#' opens the query; a '?' inside the fragment is
    # not a query (the non-greedy [^#]*? anchor enforces it)
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    q2 = F.array_join(F.sort_array(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def canonical_url_sql(expr: str = "url") -> str:
    """DuckDB twin of canonical_url as a SQL scalar expression over `expr` —
    same RE2-compatible patterns (no backrefs, so Java regex and RE2 agree),
    same sort/filter semantics (list_sort is ascending lexicographic like
    sort_array). Used by the parity tests; reusable as an oracle fragment."""
    u = f"trim({expr})"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    auth0 = f"regexp_replace(lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)), '^(www\\.)+', '')"
    # \\1 is DuckDB's replacement backreference where Spark writes $1
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth0}, '^([^:]+):80$', '\\1') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth0}, '^([^:]+):443$', '\\1') "
        f"ELSE {auth0} END"
    )
    path = f"regexp_replace(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1), '/+$', '')"
    query = f"regexp_extract({u}, '^[^#]*?\\?([^#]*)', 1)"
    q2 = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_PARAM_RE}'))), '&')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN {u} ELSE "
        f"{scheme} || '://' || {auth} || {path} || "
        f"(CASE WHEN {q2} <> '' THEN '?' || {q2} ELSE '' END) END"
    )


def url_dup_marks(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Flag recrawls: rows sharing a canonical URL, keeping the EARLIEST
    (ts, url) row unflagged (first-crawl-wins — deterministic under retry
    whenever (ts, url) is unique per canonical group). Rows FULLY TIED on
    (canonical, ts, url) — the same URL captured twice in one crawl batch
    with coarse timestamps — get an ARBITRARY survivor, the same caveat
    Spark's dropDuplicates carries (streaming/windows.py spells it out):
    if tied rows can differ in payload, order on a finer capture id instead.
    Adds `url_canonical` and boolean `url_dup`; scrub-not-drop like dup_marks.

    Same shuffle discipline as exact_dedup: the window partitions on TWO
    independently-seeded 64-bit hashes of the canonical string (16-byte key,
    false-merge ~2⁻¹²⁸/pair), and NULL urls are exempted BEFORE the window
    (xxhash64(NULL) is a constant — a corpus of NULL urls would otherwise
    pile into one straggler partition)."""
    canon = canonical_url(url_col)
    nn = F.col(url_col).isNotNull()
    # NULLS LAST: Spark sorts NULL first ascending, so an undated capture
    # would otherwise silently beat the genuinely earliest DATED crawl as
    # the survivor — "earliest" must mean earliest known time (r04 review)
    w = W.partitionBy(
        F.xxhash64(F.col("url_canonical")),
        F.xxhash64(F.lit(1), F.col("url_canonical")),
    ).orderBy(F.col(ts_col).asc_nulls_last(), url_col)
    flagged = (
        df.filter(nn)
        .withColumn("url_canonical", canon)
        .withColumn("url_dup", F.row_number().over(w) > 1)
    )
    exempt = (
        df.filter(~nn)
        .withColumn("url_canonical", F.lit(None).cast("string"))
        .withColumn("url_dup", F.lit(False))
    )
    return flagged.unionByName(exempt)


def drop_url_dups_narrow(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    broadcast_drop_keys: bool = True,
) -> DataFrame:
    """Recrawl-dedup for FAT frames (rows carrying html payloads): drop the
    rows url_dup_marks would flag, without the payloads ever entering the
    dedup exchange. Running url_dup_marks directly on an ingest frame puts
    every decoded html blob through the row_number window's shuffle —
    contradicting io/warc.py's contract that fat payloads never shuffle and
    making the ingest path's first exchange corpus-sized (r04 ADVICE).

    Shape: marks are computed on a ~24 B (url, ts) projection; the fat frame
    then LEFT-ANTI joins the DROP-key set, broadcast by default (the hint is
    needed: a fresh aggregate has no stats, so the planner picks a
    sort-merge join that would shuffle the fat side — verified live). The
    drop side is recrawl duplicates only, a small fraction of any real
    crawl batch, so the fat side never exchanges at all. For a pathological
    corpus whose dup-key set exceeds executor memory, pass
    broadcast_drop_keys=False: the fallback sort-merge anti join costs one
    fat shuffle — exactly what the old direct-window formulation always
    cost, never more.

    Tie semantics (vs url_dup_marks' arbitrary-survivor caveat): a key whose
    captures are FULLY tied on (canonical, ts, url) appears as both survivor
    and dup, and an anti join on the key would drop the whole group — losing
    the document. Those keys are therefore excluded from the drop set
    (min(url_dup) over the key must be true): tied groups are KEPT WHOLE
    (over-keep, recoverable by text dedup downstream) rather than lost
    (unrecoverable). eqNullSafe on ts so an undated dup still matches its
    drop key."""
    narrow = df.select(url_col, ts_col)
    marks = url_dup_marks(narrow, url_col=url_col, ts_col=ts_col)
    drop_keys = (
        marks.groupBy(url_col, ts_col)
        .agg(F.min(F.col("url_dup").cast("int")).alias("_all_dup"))
        .filter(F.col("_all_dup") == 1)
        .select(F.col(url_col).alias("_du"), F.col(ts_col).alias("_dt"))
    )
    if broadcast_drop_keys:
        drop_keys = F.broadcast(drop_keys)
    cond = F.col(url_col).eqNullSafe(F.col("_du")) & F.col(ts_col).eqNullSafe(
        F.col("_dt")
    )
    return df.join(drop_keys, cond, "left_anti")


def host_of(url_col: str | Column = "url") -> Column:
    """Host of a crawl URL, NULL when unparseable. try_parse_url, not
    parse_url: under Spark 4's default ANSI mode a single malformed URL in
    the corpus would otherwise throw INVALID_URL and abort the whole job
    (verified live) — a quality filter must judge bad URLs, not die on them."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.try_parse_url(col, F.lit("HOST"))


def repartition_by_host_salted(
    df: DataFrame,
    n_partitions: int,
    url_col: str = "url",
    hot_fraction: float = 0.05,
    n_salts: int = 16,
    use_sketch: bool = True,
) -> DataFrame:
    """Hash-partition by url-host, salting hosts that exceed hot_fraction of
    rows so no partition is dominated by one domain (explicit-salting mandate
    of BASELINE.json:6; AQE skew-join remains on as the safety net).

    The DEFAULT hot-host detection is the Misra–Gries heavy-hitter pass
    (operators/heavyhitters.py) — the production-scale path: its shuffle is
    ≤ P·(k+1) rows regardless of how many DISTINCT hosts the crawl has, and
    its guarantee is one-sided the safe way: every truly hot host is
    salted, warm hosts may be over-salted harmlessly (a few extra salt
    groups — partitioning semantics are unchanged either way, so the
    scale-safe path is the right default; r04 VERDICT flagged the old
    exact-count default, whose per-host groupBy shuffles one row per
    distinct host, ~10⁹ on a full crawl). use_sketch=False swaps in that
    exact per-host count — exact hot-set membership at the threshold edge,
    for corpora whose host cardinality is known small. Either way the set
    is tiny and broadcast inside the `isin` literal."""
    host = host_of(url_col)
    if use_sketch:
        from wikidataquality_spark.operators.heavyhitters import hot_keys

        hot = hot_keys(df.select(host.alias("host")), "host", hot_fraction)
    else:
        per_host = df.groupBy(host.alias("host")).count().persist()
        try:
            total = per_host.agg(F.sum("count")).first()[0] or 0
            hot = [
                r["host"]
                for r in per_host.filter(
                    F.col("count") > hot_fraction * total
                ).collect()
            ]  # only the (tiny) hot set ever reaches the driver
        finally:
            per_host.unpersist()
    # NULL host (unparseable URL — host_of's own defence case) can itself be
    # the hottest "host": a crawl with 10% malformed URLs puts them ALL in
    # one (NULL, 0) partition unless salted. isin() is NULL for NULL input
    # (it would fall to the unsalted branch silently), so NULL-hot is
    # handled as an explicit isNull() arm (r04 review).
    hot_nn = [h for h in hot if h is not None]
    is_hot = host.isin(hot_nn) if hot_nn else F.lit(False)
    if any(h is None for h in hot):
        is_hot = is_hot | host.isNull()
    salt = F.when(
        is_hot, F.pmod(F.xxhash64(url_col), F.lit(n_salts))
    ).otherwise(F.lit(0))
    return df.repartition(n_partitions, host, salt)
