"""End-to-end training-corpus curation: one auditable funnel composing the
engine's LLM-pipeline families.

The composition a training-data team actually runs, as ONE DAG:

  eligibility → (opt-in) normalize → (opt-in) domain blocklist →
  quality score + CCNet bucket → dedup (exact + MinHash) →
  (opt-in) frozen-corpus Bloom dedup → benchmark decontamination → selection (stratified rates OR DSIR top-k) →
  trained-BPE tokenize + pack

Scale shape — flags first, count once, filter once:
  every stage emits a FLAG column over the same frame (scrub-not-drop, the
  house convention); the funnel is then ONE aggregation over a first-failing-
  stage attribution expression, and the curated output is ONE filter. No
  per-stage count() actions, no per-stage materialization — at 10¹² docs the
  whole funnel costs a single pass over the corpus plus the operators' own
  bounded shuffles (dedup's narrow key aggs, decontamination's broadcast
  gram join, selection's literal CASE or top-k).

Attribution is CASCADE-ordered (eligibility ≺ urlfilter ≺ quality ≺
dedup ≺ frozen ≺ decontaminate ≺ select): a doc that is both tail-quality and contaminated
counts against quality — each dropped doc appears in EXACTLY one funnel row,
so the rows sum to docs_in (conservation is gated in tests/test_curate.py).

Unverifiable rows fail CLOSED: contamination_marks yields NULL for NULL-id
docs ("cannot be re-attached through the NULL join key"); curate() drops
them at the decontaminate stage rather than letting a possibly-contaminated
doc into training data.

Reference analogue: the full DelegatingConstraintChecker job surface
(ref≈includes/ConstraintCheck/DelegatingConstraintChecker.php:~40-200)
driving every checker and summarizing violations — here the checkers are
corpus-curation stages and the summary is the attrition funnel.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGES = (
    "eligibility",
    "urlfilter",
    "quality",
    "dedup",
    "frozen",
    "decontaminate",
    "select",
    "kept",
)


@dataclass
class CurateConfig:
    normalize: bool = False  # ftfy-class pre-clean before any scoring/hash
    # UT1-style domain blocklist (DataFrame with a `domain` column). Runs
    # FIRST after eligibility — metadata-only, so blocked docs never pay
    # for scoring/hashing attribution-wise. Requires a url column on docs.
    blocklist: DataFrame | None = None
    # robots.txt-style (host, path_prefix) Disallow rules — the path-level
    # granularity the domain list can't express; runs in the SAME urlfilter
    # stage (one funnel attribution), fail-closed on unverifiable rows
    path_rules: DataFrame | None = None
    url_col: str = "url"
    drop_buckets: tuple[str, ...] = ("tail",)  # CCNet buckets to drop
    dedup: bool = True
    # frozen-corpus cross-batch dedup (r04 VERDICT #3 — bloom.py existed but
    # the funnel never called it): docs whose exact text PROBABLY appears in
    # this already-trained corpus (text col) drop at the `frozen` stage.
    # Bloom semantics: zero false negatives (every true re-crawl of frozen
    # text drops), ~frozen_fp_rate of clean docs drop as false positives —
    # the deliberate trade that lets a 10¹²-doc frozen corpus participate as
    # a few-GB bit table instead of a second corpus scan per batch.
    frozen_corpus: DataFrame | None = None
    frozen_fp_rate: float = 0.01
    frozen_n_keys: int | None = None  # corpus-manifest count; None = one count()
    benchmark: DataFrame | None = None  # eval-set docs (text col) to decontaminate against
    # selection: at most one of —
    rates: dict[str, float] | None = None  # stratified per-source keep rates
    # rate for sources NOT listed in `rates`. Curation default is 1.0 (keep
    # unlisted sources): the operator-level default of 0.0 silently dropped
    # every source a `--rates '{"cc": 0.5}'` invocation forgot to mention
    # (r04 review). Pass 0.0 explicitly for allowlist semantics.
    default_rate: float = 1.0
    dsir_k: int | None = None  # DSIR importance top-k
    sample_seed: int = 0
    # packing
    pack: bool = True  # trained-BPE token counts + pack assignment
    seq_len: int = 2048
    id_col: str = "doc_id"
    text_col: str = "text"
    lang_col: str = "lang"
    source_col: str = "source"
    extra: dict = field(default_factory=dict)


def results_to_documents(results: DataFrame) -> DataFrame:
    """Bridge the two DAGs: validated pipeline output (pipeline.results
    shape) → the curation funnel's documents contract. Kept docs only;
    text = the scrubbed bytes (what training should ever see), lang = the
    DETECTED language (the claimed one failed validation often enough to
    be a rule), source = url host (the natural mixture stratum for web
    text), url kept for the blocklist stage.

    doc_id = xxhash64(url) — deterministic under retry/repartition, which
    the funnel's sampling/dedup ids require. Collision note: ~n²/2⁶⁴
    birthday conflations (≈0.03 expected at 10⁹ docs — fine; at 10¹²,
    ~27k pairs would conflate funnel attribution rows, so a deployment at
    that scale passes a true unique id instead: the WARC (segment, offset)
    lineage pair io/warc.py records is the natural one). Text-level dedup
    is unaffected either way — it keys on double text hashes, never on
    doc_id."""
    from wikidataquality_spark.operators.dedup import host_of

    return results.filter(F.col("keep")).select(
        F.xxhash64("url").alias("doc_id"),
        F.col("scrubbed_text").alias("text"),
        F.col("lang_pred").alias("lang"),
        host_of("url").alias("source"),
        "url",
        "warc_ts",
    )


def curate(
    docs: DataFrame,
    cfg: CurateConfig | None = None,
    persist_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated, funnel).

    curated: surviving docs with quality columns (+ BPE token counts and
    pack assignment when cfg.pack). funnel: (stage, n) — docs dropped at
    each stage under first-failing-stage attribution, plus the final
    'kept' row; rows sum to the input count.

    The flagged frame is sealed with the house persist + noop-write barrier
    (same rationale and `persist_registry` ownership contract as
    pipeline.validate): the funnel aggregation, the curated filter, and the
    DSIR top-k are separate consumers that would otherwise each recompute
    the enrich/normalize/dedup work. At 10¹²-doc scale the equivalent is
    writing the flagged frame to a stage table."""
    cfg = cfg or CurateConfig()
    if cfg.rates is not None and cfg.dsir_k is not None:
        raise ValueError("rates and dsir_k are mutually exclusive selection modes")

    from wikidataquality_spark.operators.pplbucket import with_ppl_bucket
    from wikidataquality_spark.operators.quality_model import (
        load_quality_model,
        with_quality_score,
    )

    id_c, text_c = cfg.id_col, cfg.text_col

    if cfg.normalize:
        from wikidataquality_spark.operators.normalize import normalize_text

        docs = docs.withColumn(text_c, normalize_text(text_c))

    # --- stage flags (no actions yet) ----------------------------------
    flagged = docs.withColumn(
        "_eligible",
        F.col(id_c).isNotNull()
        & F.col(text_c).isNotNull()
        & (F.length(text_c) > 0),
    )

    if cfg.blocklist is not None or cfg.path_rules is not None:
        url_drop = F.lit(False)
        # both marks read only (id, url) from the PRE-join frame: deriving
        # the second arm from the first arm's joined lineage would drag the
        # domain explode+join into the path marks' DAG and pay that pass
        # twice before the persist seal (r04 session review)
        url_base = flagged
        if cfg.blocklist is not None:
            from wikidataquality_spark.operators.urlfilter import (
                domain_blocklist_marks,
            )

            # dropDuplicates: the marks operator emits one row per input
            # row; duplicate input ids would otherwise MULTIPLY through
            # this left join and break the funnel's conservation invariant
            # (r04 review — ids sharing a value then share one verdict,
            # the operator's documented id-keyed contract)
            marks = (
                domain_blocklist_marks(
                    flagged, cfg.blocklist, url_col=cfg.url_col, id_col=id_c
                )
                .select(id_c, "blocked")
                .dropDuplicates([id_c])
            )
            flagged = flagged.join(marks, id_c, "left")
            # NULL blocked = unparseable host → fail closed
            url_drop = url_drop | F.coalesce(F.col("blocked"), F.lit(True))
        if cfg.path_rules is not None:
            from wikidataquality_spark.operators.urlfilter import (
                path_blocklist_marks,
            )

            pmarks = (
                path_blocklist_marks(
                    url_base, cfg.path_rules, url_col=cfg.url_col, id_col=id_c
                )
                .select(id_c, "path_blocked")
                .dropDuplicates([id_c])
            )
            flagged = flagged.join(pmarks, id_c, "left")
            # NULL path verdict (unparseable/NULL url or id) → fail closed,
            # same convention as the domain arm
            url_drop = url_drop | F.coalesce(F.col("path_blocked"), F.lit(True))
        flagged = flagged.withColumn("_url_drop", url_drop)
    else:
        flagged = flagged.withColumn("_url_drop", F.lit(False))

    scored = with_quality_score(flagged, text_col=text_c, art=load_quality_model())
    scored = scored.withColumn("_ql6", F.round("quality_logit", 6))
    scored = with_ppl_bucket(
        scored, lang_col=cfg.lang_col, value_col="_ql6", out_col="quality_bucket"
    )
    # NULL bucket (NULL lang/score) is NOT a quality drop — eligibility and
    # decontamination own the NULL cases; quality drops only what it scored.
    scored = scored.withColumn(
        "_quality_drop", F.coalesce(F.col("quality_bucket").isin(*cfg.drop_buckets), F.lit(False))
    )

    if cfg.dedup:
        from wikidataquality_spark.operators.dedup import dup_marks

        scored = dup_marks(scored, text_col=text_c, id_col=id_c)
        scored = scored.withColumn(
            "_dup_drop",
            F.coalesce(F.col("is_exact_dup"), F.lit(False))
            | F.coalesce(F.col("is_near_dup"), F.lit(False)),
        )
    else:
        scored = scored.withColumn("_dup_drop", F.lit(False))

    if cfg.frozen_corpus is not None:
        from wikidataquality_spark.operators.bloom import cross_corpus_dedup_marks

        # dropDuplicates: same conservation guard as the blocklist join
        fmarks, _bloom = cross_corpus_dedup_marks(
            scored,
            cfg.frozen_corpus,
            text_col=text_c,
            id_col=id_c,
            fp_rate=cfg.frozen_fp_rate,
            n_keys_hint=cfg.frozen_n_keys,
        )
        fmarks = fmarks.select(id_c, "in_corpus_maybe").dropDuplicates([id_c])
        scored = scored.join(fmarks, id_c, "left")
        # NULL verdict (NULL text/id — membership undefined or hits can't
        # re-attach) → fail closed, the decontaminate convention; in the
        # cascade those rows are owned by eligibility anyway
        scored = scored.withColumn(
            "_frozen_drop", F.coalesce(F.col("in_corpus_maybe"), F.lit(True))
        )
    else:
        scored = scored.withColumn("_frozen_drop", F.lit(False))

    if cfg.benchmark is not None:
        from wikidataquality_spark.operators.decontaminate import contamination_marks

        # dropDuplicates: same conservation guard as the blocklist join
        marks = (
            contamination_marks(scored, cfg.benchmark, id_col=id_c, text_col=text_c)
            .select(id_c, "contaminated")
            .dropDuplicates([id_c])
        )
        scored = scored.join(marks, id_c, "left")
        # NULL contaminated = unverifiable → fail closed (drop here)
        scored = scored.withColumn(
            "_contam_drop", F.coalesce(F.col("contaminated"), F.lit(True))
        )
    else:
        scored = scored.withColumn("_contam_drop", F.lit(False))

    # Seal the heavy flags (UDF enrich + dedup shuffles + gram join) before
    # the multi-consumer tail: selection, funnel agg, and curated filter
    # all read the cache instead of racing to recompute the DAG.
    scored = scored.persist()
    scored.write.format("noop").mode("overwrite").save()
    if persist_registry is not None:
        persist_registry.append(scored)

    if cfg.rates is not None:
        from wikidataquality_spark.operators.sampling import stratified_sample_marks

        scored = stratified_sample_marks(
            scored,
            cfg.rates,
            default_rate=cfg.default_rate,
            stratum_col=cfg.source_col,
            id_col=id_c,
            seed=cfg.sample_seed,
        )
        scored = scored.withColumn("_select_drop", ~F.col("sampled"))
    elif cfg.dsir_k is not None:
        from wikidataquality_spark.operators.dsir import dsir_gumbel_topk

        # top-k over docs that SURVIVE the earlier stages — selecting from
        # already-dropped docs would waste the budget on rows the filter
        # removes. The k-row result broadcasts back as a flag.
        survivors = scored.filter(
            F.col("_eligible")
            & ~F.col("_url_drop")
            & ~F.col("_quality_drop")
            & ~F.col("_dup_drop")
            & ~F.col("_frozen_drop")
            & ~F.col("_contam_drop")
        )
        picked = dsir_gumbel_topk(
            survivors, cfg.dsir_k, id_col=id_c, text_col=text_c
        ).select(F.col(id_c), F.lit(True).alias("_picked"))
        scored = scored.join(F.broadcast(picked), id_c, "left")
        scored = scored.withColumn(
            "_select_drop", ~F.coalesce(F.col("_picked"), F.lit(False))
        ).drop("_picked")
    else:
        scored = scored.withColumn("_select_drop", F.lit(False))

    # --- funnel: ONE aggregation, first-failing-stage attribution -------
    reason = (
        F.when(~F.col("_eligible"), F.lit("eligibility"))
        .when(F.col("_url_drop"), F.lit("urlfilter"))
        .when(F.col("_quality_drop"), F.lit("quality"))
        .when(F.col("_dup_drop"), F.lit("dedup"))
        .when(F.col("_frozen_drop"), F.lit("frozen"))
        .when(F.col("_contam_drop"), F.lit("decontaminate"))
        .when(F.col("_select_drop"), F.lit("select"))
        .otherwise(F.lit("kept"))
    )
    scored = scored.withColumn("_stage", reason)
    # funnel_by adds a lineage dimension (per-source/per-lang attrition —
    # the rule-metrics-per-partition ethos applied to curation); the
    # default stays the compact (stage, n) shape
    fb = cfg.extra.get("funnel_by")
    group_cols = ([F.col(fb)] if fb else []) + [F.col("_stage").alias("stage")]
    funnel = scored.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))

    # --- curated output: ONE filter (+ optional tokenize/pack) ----------
    curated = scored.filter(F.col("_stage") == "kept").drop(
        "_eligible",
        "_url_drop",
        "_quality_drop",
        "_dup_drop",
        "_frozen_drop",
        "_contam_drop",
        "_select_drop",
        "_stage",
        "_ql6",
    )
    if cfg.pack:
        from wikidataquality_spark.operators.bpe import load_bpe, with_bpe_tokens
        from wikidataquality_spark.operators.packing import pack_sequences

        curated = with_bpe_tokens(curated, art=load_bpe(), text_col=text_c)
        # both consumers below (the pack window's narrow projection and the
        # re-attach join's wide side) would re-run the encode UDF — seal it
        curated = curated.persist()
        curated.write.format("noop").mode("overwrite").save()
        if persist_registry is not None:
            persist_registry.append(curated)
        packed = pack_sequences(
            curated,
            seq_len=cfg.seq_len,
            id_col=id_c,
            source_col=cfg.source_col,
            text_col=text_c,
            n_tokens_col=F.coalesce(
                F.col("bpe_token_count"), F.lit(0).cast("long")
            ),
        ).select(id_c, "n_tokens", "pack_id", "pack_offset")
        curated = curated.join(packed, id_c)
    return curated, funnel
