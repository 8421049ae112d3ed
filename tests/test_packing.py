"""Sequence packing: hand-computed assignment, shard bounds, oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from wikidataquality_spark.operators.packing import pack_sequences, pack_sequences_sql


@pytest.fixture(scope="module")
def docs(spark):
    # token counts by the BPE-ish counter: "aa bb" → 2 pieces, "a1!" → 3
    rows = [
        Row(doc_id=0, source="web", text="aa bb cc"),        # 3 tokens
        Row(doc_id=1, source="web", text="dd ee"),            # 2
        Row(doc_id=2, source="web", text="x y z w v"),        # 5
        Row(doc_id=3, source="web", text=None),               # 0 (NULL packs empty)
        Row(doc_id=4, source="web", text="k"),                # 1
        Row(doc_id=10, source="web", text="p q"),             # new shard (shard_docs=10)
        Row(doc_id=0, source="books", text="m n o"),          # other source stream
    ]
    return spark.createDataFrame(rows)


def test_hand_computed_assignment(docs):
    out = {
        (r["source"], r["doc_id"]): r.asDict()
        for r in pack_sequences(docs, seq_len=4, shard_docs=10).collect()
    }
    # web shard 0 stream: cum_before = 0, 3, 5, 10, 10 → packs of 4
    assert (out[("web", 0)]["pack_id"], out[("web", 0)]["pack_offset"]) == (0, 0)
    assert (out[("web", 1)]["pack_id"], out[("web", 1)]["pack_offset"]) == (0, 3)
    assert (out[("web", 2)]["pack_id"], out[("web", 2)]["pack_offset"]) == (1, 1)
    assert out[("web", 3)]["n_tokens"] == 0  # NULL text: zero-width slot
    assert (out[("web", 3)]["pack_id"], out[("web", 3)]["pack_offset"]) == (2, 2)
    assert (out[("web", 4)]["pack_id"], out[("web", 4)]["pack_offset"]) == (2, 2)
    # doc 10 opens shard 1: its own stream restarts at pack 0
    assert out[("web", 10)]["shard"] == 1
    assert (out[("web", 10)]["pack_id"], out[("web", 10)]["pack_offset"]) == (0, 0)
    # other source is an independent stream
    assert (out[("books", 0)]["pack_id"], out[("books", 0)]["pack_offset"]) == (0, 0)


def test_oracle_parity_on_planted(spark, docs):
    duckdb = pytest.importorskip("duckdb")
    got = sorted(
        tuple(r) for r in pack_sequences(docs, seq_len=4, shard_docs=10).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    ora = sorted(
        tuple(r)
        for r in con.execute(pack_sequences_sql(seq_len=4, shard_docs=10)).fetchall()
    )
    assert got == ora


def test_window_partitions_are_bounded(docs):
    """The plan's only Exchange is hashpartitioning by (source, shard) —
    a global-sort cumsum (Exchange rangepartitioning / SinglePartition)
    would serialize the corpus through one reducer at scale."""
    plan = (
        pack_sequences(docs, seq_len=4, shard_docs=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" in plan
    assert "rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_sf001_streams_are_running_sums(spark, sf001_dir):
    """Packing is an assignment, not a filter: every doc appears once, and
    within each (source, shard) stream every doc's absolute start position
    (pack_id·seq_len + pack_offset) equals the running sum of the preceding
    docs' token counts — the defining invariant of concat-then-chunk."""
    d = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = pack_sequences(d, seq_len=2048, shard_docs=200)
    rows = out.collect()
    assert len(rows) == d.count()
    streams: dict[tuple, list] = {}
    for r in rows:
        streams.setdefault((r["source"], r["shard"]), []).append(r)
    assert len(streams) > 3  # shard_docs=200 keeps several streams live
    for stream in streams.values():
        cum = 0
        for r in sorted(stream, key=lambda r: r["doc_id"]):
            assert r["pack_id"] * 2048 + r["pack_offset"] == cum
            cum += r["n_tokens"]


def test_spark_matches_python_mirror_seeded(spark):
    """Seeded random corpus (varied sources, NULL/empty texts, id gaps)
    through Spark and a driver-side mirror of the packing algebra — exact
    integer equality on every column."""
    import random
    import re

    rng = random.Random(99)
    words = ["alpha", "beta9", "x,y", "...", "Σμ", "tok"]
    rows = []
    for i in range(300):
        doc_id = i * rng.randint(1, 3) + rng.randint(0, 1)
        text = (
            None
            if rng.random() < 0.1
            else " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        )
        rows.append(
            Row(doc_id=doc_id, source=rng.choice(["web", "books"]), text=text)
        )
    # de-dupe ids per source (packing assumes unique ids within a stream)
    seen = set()
    rows = [r for r in rows if (k := (r.source, r.doc_id)) not in seen and not seen.add(k)]
    df = spark.createDataFrame(rows)
    got = sorted(
        tuple(r) for r in pack_sequences(df, seq_len=16, shard_docs=50).collect()
    )

    piece_re = re.compile(r"[^\W\d_]+|\d+|[^\w\s]", re.UNICODE)

    def n_tok(text):
        return 0 if text is None else len(piece_re.findall(text))

    streams = {}
    for r in rows:
        streams.setdefault((r.source, r.doc_id // 50), []).append(r)
    want = []
    for (source, shard), docs in streams.items():
        cum = 0
        for d in sorted(docs, key=lambda d: d.doc_id):
            nt = n_tok(d.text)
            want.append((d.doc_id, source, shard, nt, cum // 16, cum % 16))
            cum += nt
    assert got == sorted(want)
