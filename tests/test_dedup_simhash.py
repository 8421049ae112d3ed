"""SimHash near-dup: signature properties + dedup semantics + determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidataquality_spark.operators.dedup import (
    SIMHASH_MAX_HAMMING,
    simhash_dedup,
    simhash_udf,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the green field while birds sing in the morning light near the river"
    )
    near = base.replace("morning", "evening")  # one token changed
    far = (
        "completely different content about spark dataframes shuffles and "
        "catalyst optimizer rules for large scale distributed query planning"
    )
    rows = [
        (0, base),
        (1, base),        # exact dup of 0
        (2, near),        # near dup of 0 (hamming small)
        (3, far),
        (4, None),        # null text must survive untouched
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_signature_properties(spark, docs):
    sigs = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", simhash_udf("text").alias("s")).collect()
    }
    assert sigs[0] == sigs[1]  # identical text → identical signature
    assert hamming(sigs[0], sigs[2]) <= SIMHASH_MAX_HAMMING  # 1-token edit → tiny distance
    assert hamming(sigs[0], sigs[3]) > SIMHASH_MAX_HAMMING  # unrelated → far
    assert sigs[4] is None


def test_dedup_drops_near_and_exact(spark, docs):
    kept = sorted(
        r["doc_id"] for r in simhash_dedup(docs, id_col="doc_id").select("doc_id").collect()
    )
    # 0 survives (min id); 1 (exact) and 2 (near) drop; 3 distinct; 4 null survives
    assert kept == [0, 3, 4]


def test_dedup_repartition_invariant(spark, docs):
    a = sorted(r["doc_id"] for r in simhash_dedup(docs, id_col="doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in simhash_dedup(docs.repartition(7, "doc_id"), id_col="doc_id").collect()
    )
    assert a == b


def test_far_pair_not_dropped_even_if_bucketed(spark):
    """Banding may collide unrelated docs; the exact hamming verify must
    reject them — survivors only shrink for true near-dups."""
    rows = [(i, f"unique document number {i} with distinct content token{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["s"] for r in df.select("doc_id", simhash_udf("text").alias("s")).collect()}
    kept = {r["doc_id"] for r in simhash_dedup(df, id_col="doc_id").collect()}
    dropped = set(sigs) - kept
    for d in dropped:
        assert any(
            hamming(sigs[d], sigs[k]) <= SIMHASH_MAX_HAMMING for k in sigs if k < d
        )


def test_null_text_exempt_from_dedup(spark):
    """Extraction-failure docs (NULL text) must not dedup against each other:
    xxhash64(NULL) is a constant and a NULL signature's band keys collapse to
    xxhash64(band_i), so before the exemption every NULL-text doc shared one
    exact partition and all 16 band buckets — silently dropped/flagged as
    'duplicates' of unrelated pages (r03 distributed-correctness review)."""
    from pyspark.sql import functions as F

    from wikidataquality_spark.operators.dedup import (
        dup_fingerprints,
        dup_marks,
        exact_dedup,
        minhash_dedup,
    )

    rows = [
        ("u1", "the quick brown fox jumps over the lazy dog today"),
        ("u2", "the quick brown fox jumps over the lazy dog today"),  # real dup
        ("u3", None),
        ("u4", None),
        ("u5", None),
    ]
    df = spark.createDataFrame(rows, "url string, text string")

    # non-destructive flags: NULL docs never flagged, the real dup is
    flags = {r["url"]: (r["is_exact_dup"], r["is_near_dup"]) for r in dup_marks(df).collect()}
    assert flags["u2"] == (True, True)
    assert flags["u1"] == (False, False)
    assert flags["u3"] == (False, False) and flags["u4"] == (False, False)

    # destructive variants: every NULL-text row survives
    assert exact_dedup(df).filter(F.col("text").isNull()).count() == 3
    assert minhash_dedup(df).filter(F.col("text").isNull()).count() == 3
    # and NULL docs emit no fingerprints into incremental state
    assert dup_fingerprints(df).filter(F.col("url").isin("u3", "u4", "u5")).count() == 0


def test_contentless_text_exempt_from_near_dup(spark):
    """Token-less (whitespace-only) docs carry no content signal: their
    minhash base and simhash both collapse to constants, so byte-DIFFERENT
    contentless docs would near-dup each other (r04 review — the NULL
    exemption existed, the token-less one did not). Byte-IDENTICAL
    whitespace pages are still legitimately EXACT dups."""
    from wikidataquality_spark.operators.dedup import (
        STATE_BAND_KIND,
        dup_fingerprints,
        dup_marks,
        minhash_dedup,
        simhash_dedup,
    )

    rows = [
        ("u1", "the quick brown fox jumps over the lazy dog today"),
        ("u2", "   "),
        ("u3", "\n\n"),
        ("u4", "\t"),
        ("u5", "   "),  # byte-identical to u2 → exact dup, not near
        # UNICODE whitespace: Java rlike('\\S') passes these (ASCII classes)
        # but Python split() yields zero tokens — the NULL-signature gate,
        # not the regex, must exempt them (r04 review)
        ("u6", " "),  # NBSP
        ("u7", "  "),
        ("u8", "　"),  # ideographic space
    ]
    df = spark.createDataFrame(rows, "url string, text string")

    # destructive near-dup variants: every contentless row survives
    assert minhash_dedup(df).count() == 8
    assert simhash_dedup(df).count() == 8

    flags = {
        r["url"]: (r["is_exact_dup"], r["is_near_dup"]) for r in dup_marks(df).collect()
    }
    assert flags["u2"] == (False, False)
    assert flags["u3"] == (False, False) and flags["u4"] == (False, False)
    assert flags["u5"] == (True, False)  # byte-identical whitespace: exact only
    assert flags["u6"] == (False, False)  # NBSP-only: no near flag
    assert flags["u7"] == (False, False) and flags["u8"] == (False, False)

    # state table: contentless docs emit an exact fingerprint but NO band rows
    fp = dup_fingerprints(df)
    assert fp.filter((F.col("url") == "u2") & (F.col("kind") == STATE_BAND_KIND)).count() == 0
    assert fp.filter((F.col("url") == "u2") & (F.col("kind") != STATE_BAND_KIND)).count() == 1


def test_short_doc_word_order_distinguishes(spark):
    """Sub-SHINGLE_K docs collapse to one shingle; the combiner must be
    position-sensitive — a plain token-hash sum made 'river bank' and
    'bank river' near-dup each other (r04 review)."""
    from wikidataquality_spark.operators.dedup import minhash_dedup

    rows = [
        ("u1", "river bank"),
        ("u2", "bank river"),
        ("u3", "river bank"),  # genuine exact/near dup of u1
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = minhash_dedup(df)
    kept = {r["url"] for r in out.collect()}
    assert "u2" in kept  # permuted doc survives
    assert kept == {"u1", "u2"}  # identical short doc still deduped


def test_null_host_population_is_salted(spark):
    """When unparseable URLs (host → NULL) exceed hot_fraction, the NULL
    'host' must salt like any hot host — isin() is NULL for NULL input, so
    the old predicate silently sent every malformed-URL row to the single
    (NULL, 0) partition (r04 review)."""
    from wikidataquality_spark.operators.dedup import (
        host_of,
        repartition_by_host_salted,
    )

    rows = [(f"http://ok{i % 7}.example.com/p{i}", i) for i in range(60)] + [
        (f"not a url at all {i}", i) for i in range(140)
    ]
    df = spark.createDataFrame(rows, "url string, v long")
    out = repartition_by_host_salted(df, n_partitions=16, hot_fraction=0.05)
    assert out.count() == 200  # no rows lost
    null_part_counts = (
        out.filter(host_of("url").isNull())
        .select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    # the 140 malformed-URL rows must spread over >1 partition
    assert len(null_part_counts) > 1
    assert max(r["count"] for r in null_part_counts) < 140


def test_duplicate_ids_do_not_drop_survivor(spark):
    """A re-crawled url (same id twice, identical text) must not lose the
    document: per-instance exact flags used to rejoin onto BOTH instances of
    the id, flagging the survivor itself. The id-level bool_and keeps an id
    unflagged when any instance is the survivor, and the rejoin must not
    multiply rows."""
    from wikidataquality_spark.operators.dedup import dup_marks

    rows = [
        ("a", "completely unique text one of a kind here", "t1"),
        ("a", "completely unique text one of a kind here", "t2"),  # re-crawl
        ("b", "another different document body goes right here", "t3"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, crawl string")
    out = dup_marks(df).collect()
    assert len(out) == 3  # no join fan-out
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r["is_exact_dup"])
    assert by_url["a"] == [False, False]  # survivor id never self-flagged
    assert by_url["b"] == [False]
