"""Unigram-LM tokenizer: losslessness (incl. unseen characters), vocab
bounds, determinism, distributed==local encode, and real compression."""

from __future__ import annotations

from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators import bpe, unigram


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox sleeps"),
        (3, "lazy dogs and quick foxes over the brown field"),
        (4, "pack my box with five dozen liquor jugs"),
    ] * 5
    return spark.createDataFrame(
        [(i * 10 + j, t) for j, (i, t) in enumerate(rows)], ["doc_id", "text"]
    )


def test_round_trip_is_lossless_even_for_unseen_chars(spark):
    docs = _docs(spark)
    logp = unigram.unigram_train(docs, vocab_size=64)
    # 'Zq#7' chars never appear in training: UNK fallback must still
    # round-trip them
    probe = spark.createDataFrame(
        [(1, "the quick Zq#7 dog"), (2, "  spaced   out  ")],
        ["doc_id", "text"],
    )
    out = unigram.unigram_encode(probe, logp).withColumn(
        "back", bpe.bpe_decode(F.col("tokens"))
    )
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    assert out.filter(F.col("back") != norm).count() == 0


def test_vocab_bounds_and_single_char_floor(spark):
    docs = _docs(spark)
    logp = unigram.unigram_train(docs, vocab_size=64)
    chars = {c for (_, t) in [(0, r["text"]) for r in docs.collect()] for c in t if c != " "}
    assert chars <= set(logp)  # every seen char survives pruning
    assert len(logp) <= 64 + len(chars)


def test_training_is_deterministic(spark):
    docs = _docs(spark)
    a = unigram.unigram_train(docs, vocab_size=64)
    b = unigram.unigram_train(docs, vocab_size=64)
    assert a == b


def test_distributed_encode_matches_local_viterbi(spark):
    docs = _docs(spark)
    logp = unigram.unigram_train(docs, vocab_size=64)
    got = {
        r["doc_id"]: r["tokens"]
        for r in unigram.unigram_encode(docs, logp).collect()
    }
    for r in docs.collect():
        local = []
        for w in r["text"].split(" "):
            if w:
                local.extend(unigram.viterbi_segment(w, logp, 8))
                local.append(bpe.END)
        assert got[r["doc_id"]] == local


def test_learned_pieces_compress_below_character_grain(spark):
    docs = _docs(spark)
    logp = unigram.unigram_train(docs, vocab_size=64)
    enc = unigram.unigram_encode(docs, logp)
    stats = enc.select(
        F.sum(F.size("tokens")).alias("n_tok"),
        F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("n_chars"),
    ).collect()[0]
    # END adds one token per word; even so, learned multi-char pieces
    # must beat character-grain encoding
    assert stats["n_tok"] < stats["n_chars"]
    assert any(len(p) > 1 for p in logp)


def test_null_text_passes_through_as_null_tokens(spark):
    """Regression (r8 review): Series.map hands None to the mapped fn, so
    a NULL text row (routine in crawl corpora) crashed the whole encode
    job with TypeError instead of passing through."""
    from kusuma_metamorph_etl_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
    )

    corpus = spark.createDataFrame(
        [(1, "aba abc"), (2, "abab")], "doc_id long, text string"
    )
    logp = unigram_train(corpus, vocab_size=20)
    df = spark.createDataFrame(
        [(1, "aba"), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["tokens"] for r in unigram_encode(df, logp).collect()}
    assert rows[1]  # real text still encodes
    assert rows[2] is None
