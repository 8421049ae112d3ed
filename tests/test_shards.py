"""Training-shard export gates: deterministic dense vocab, UNK/NULL encode
totality, python-mirror reconstruction of the materialized blocks, and the
cross-operator contract with pack_sequences (same stream, block for block)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidataquality_spark.operators.shards import (
    PAD_ID,
    UNK_ID,
    encode_token_ids,
    export_token_shards,
    vocab_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, bpe_tokens array<string>"
    )


def test_vocab_dense_sorted_and_partition_invariant(spark):
    rows = [
        (1, "a", ["bb", "aa", "cc"]),
        (2, "a", ["aa", "dd"]),
        (3, "b", None),
    ]
    for parts in (1, 4):
        v = {
            r["piece"]: r["token_id"]
            for r in vocab_table(_docs(spark, rows).repartition(parts)).collect()
        }
        assert v == {"aa": 2, "bb": 3, "cc": 4, "dd": 5}  # dense, sorted, base 2


def test_encode_unk_and_null_totality(spark):
    docs = _docs(spark, [(1, "a", ["aa", "zz", "bb"]), (2, "a", None)])
    vocab = {"aa": 2, "bb": 3}
    out = {r["doc_id"]: r["token_ids"] for r in encode_token_ids(docs, vocab).collect()}
    assert out[1] == [2, UNK_ID, 3]  # unseen piece -> UNK, never a crash
    assert out[2] == []  # NULL tokens -> zero-width slot


def test_export_matches_python_mirror_and_pack_table(spark):
    from wikidataquality_spark.operators.packing import pack_sequences

    # distinct piece per (doc, pos) so every stream position is identifiable
    rows = []
    for d in range(9):
        n = (d * 7) % 5  # varied lengths incl. zero-length docs
        rows.append((d, "s1" if d < 6 else "s2", [f"p{d}_{j}" for j in range(n)]))
    rows.append((9, "s2", None))  # zero-width doc stays in the stream
    # exactly-full stream followed by a zero-width doc: the trailing doc's
    # pack_id (=1) must be MATERIALIZED as an all-PAD block
    rows.append((20, "s3", [f"q{j}" for j in range(4)]))
    rows.append((21, "s3", None))
    docs = _docs(spark, rows)
    vocab = {r["piece"]: r["token_id"] for r in vocab_table(docs).collect()}
    encoded = encode_token_ids(docs, vocab)
    seq_len = 4
    shards = export_token_shards(encoded, seq_len=seq_len).collect()

    # python mirror: per (source, shard) stream in id order
    enc_rows = sorted(
        ((r["doc_id"], r["source"], r["token_ids"]) for r in encoded.collect())
    )
    streams: dict = {}
    for doc_id, src, ids in enc_rows:
        streams.setdefault((src, doc_id // 10_000), []).extend(ids)
    got = {}
    for r in shards:
        got[(r["source"], r["shard"], r["pack_id"])] = (
            list(r["token_ids"]),
            r["n_real_tokens"],
        )
    # mirror the operator's block-count rule: cover ceil(len/L) AND every
    # doc's cum_before // L (the trailing zero-width-doc block)
    doc_blocks: dict = {}
    cums: dict = {}
    for doc_id, src, ids in enc_rows:
        key = (src, doc_id // 10_000)
        c = cums.get(key, 0)
        doc_blocks[key] = max(doc_blocks.get(key, 0), c // seq_len)
        cums[key] = c + len(ids)
    for key, stream in streams.items():
        n_blocks = max(-(-len(stream) // seq_len), 1, doc_blocks[key] + 1)
        for b in range(n_blocks):
            block = stream[b * seq_len : (b + 1) * seq_len]
            n_real = len(block)
            block = block + [PAD_ID] * (seq_len - n_real)
            assert got[(key[0], key[1], b)] == (block, n_real), (key, b)
    assert len(got) == sum(
        max(-(-len(s) // seq_len), 1, doc_blocks[k] + 1)
        for k, s in streams.items()
    )
    # the trailing-zero-width block exists, all PAD, zero real tokens
    assert got[("s3", 0, 1)] == ([PAD_ID] * seq_len, 0)

    # cross-operator contract: pack_sequences driven by the SAME id counts
    # lands each doc's first token at pack_id*seq_len + pack_offset
    packed = pack_sequences(
        encoded, seq_len=seq_len, n_tokens_col=F.size("token_ids").cast("long")
    )
    pos = {r["doc_id"]: r["pack_id"] * seq_len + r["pack_offset"] for r in packed.collect()}
    cum: dict = {}
    for doc_id, src, ids in enc_rows:
        key = (src, doc_id // 10_000)
        expect = len(cum.setdefault(key, []))
        assert pos[doc_id] == expect, (doc_id, pos[doc_id], expect)
        cum[key].extend(ids)
        # and the materialized block really holds the doc's first token
        if ids:
            blk, _ = got[(src, doc_id // 10_000, expect // seq_len)]
            assert blk[expect % seq_len] == ids[0]


def test_curated_corpus_exports_end_to_end(spark):
    """Composition: curate (BPE pieces + pack assignment) → vocab → ids →
    shards, reconstruction holding on a real curated corpus slice."""
    from wikidataquality_spark.curate import CurateConfig, curate

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    )
    registry: list = []
    curated, _f = curate(
        docs, CurateConfig(seq_len=64, drop_buckets=()), persist_registry=registry
    )
    vocab = {r["piece"]: r["token_id"] for r in vocab_table(curated).collect()}
    encoded = encode_token_ids(curated, vocab)
    shards = export_token_shards(encoded, seq_len=64).collect()
    for df in registry:
        df.unpersist()
    total_real = sum(r["n_real_tokens"] for r in shards)
    total_ids = encoded.select(F.sum(F.size("token_ids"))).first()[0]
    assert total_real == total_ids > 0  # every token lands exactly once
    assert all(len(r["token_ids"]) == 64 for r in shards)
    assert all(UNK_ID not in r["token_ids"] for r in shards)  # vocab from corpus
