"""BPE tokenizer tests: merge learning on a known corpus, greedy encode
semantics, lossless round-trip, and distributed==local agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators import bpe


def test_train_learns_frequent_pair_first(spark):
    # 'aaab' x10: the dominant pair is (a, a) — must be merge #1.
    df = spark.createDataFrame([("aaab " * 10,)], ["text"])
    merges = bpe.bpe_train(df, n_merges=3)
    assert merges[0] == ("a", "a")


def test_encode_uses_merge_ranks_greedily(spark):
    # a a a b ▁ --(rank 0 at leftmost)--> aa a b ▁ ; the remaining (a, b)
    # and (aa, a) have no rank, and (aa, b) is not adjacent -> stop.
    ranks = {("a", "a"): 0, ("aa", "b"): 1}
    assert bpe.encode_word("aaab", ranks) == ["aa", "a", "b", bpe.END]
    # with (aa, a) ranked, the chain continues: aa a b ▁ -> aaa b ▁ -> stop
    ranks2 = {("a", "a"): 0, ("aa", "a"): 1}
    assert bpe.encode_word("aaab", ranks2) == ["aaa", "b", bpe.END]


def test_roundtrip_lossless_on_corpus(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    merges = bpe.bpe_train(docs, n_merges=100)
    assert len(merges) > 10  # real corpus yields a real merge table
    encoded = bpe.bpe_encode(docs, merges)
    normalized = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    bad = encoded.filter(bpe.bpe_decode(F.col("tokens")) != normalized)
    assert bad.count() == 0
    # merges actually compress: fewer tokens than characters
    stats = encoded.select(
        F.avg(F.size("tokens")).alias("t"),
        F.avg(F.length("text")).alias("c"),
    ).first()
    assert stats["t"] < stats["c"]


def test_sentinel_input_rejected_and_split_is_ascii_ws(spark):
    """Text containing END must fail LOUDLY (a silent round-trip loss
    otherwise — ADVICE r6), and word splitting must use the same
    [\\t\\n\\f\\r ]+ class as training: NBSP is NOT a separator."""
    import pytest

    merges = [("a", "a")]
    poisoned = spark.createDataFrame([(f"ok {bpe.END}bad",)], ["text"])
    with pytest.raises(Exception, match="END sentinel"):
        bpe.bpe_encode(poisoned, merges).collect()

    # NBSP (U+00A0) splits under Python str.split() but not under \s+ —
    # it must stay inside one word here, matching words()/the oracle.
    nbsp = spark.createDataFrame([("aa\u00a0aa",)], ["text"])
    toks = bpe.bpe_encode(nbsp, merges).select("tokens").first()["tokens"]
    assert toks == ["aa", "\u00a0", "aa", bpe.END]


def test_distributed_encode_matches_local(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    merges = bpe.bpe_train(docs, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = bpe.bpe_encode(docs, merges).select("doc_id", "text", "tokens").collect()
    for r in rows:
        local: list[str] = []
        for w in r["text"].split():
            local.extend(bpe.encode_word(w, ranks))
        assert r["tokens"] == local, r["doc_id"]


def test_train_deterministic(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    assert bpe.bpe_train(docs, n_merges=60) == bpe.bpe_train(docs, n_merges=60)


def test_incremental_train_equals_naive_recount(spark, sf_small):
    """The indexed incremental trainer must produce the EXACT merge
    sequence of the textbook full-recount algorithm."""
    from collections import Counter

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    rows = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(5000)
        .collect()
    )
    vocab = {tuple(r["w"]) + (bpe.END,): r["c"] for r in rows}
    naive: list[tuple[str, str]] = []
    for _ in range(60):
        pairs: Counter = Counter()
        for word, count in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += count
        if not pairs:
            break
        pair, freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        naive.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple, int] = {}
        for word, count in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + count
        vocab = new_vocab
    assert bpe.bpe_train(docs, n_merges=60) == naive


def test_encode_null_text_passes_through(spark):
    """Regression (r8 review): Series.map hands None to the encode fn, so
    one NULL text row crashed the whole job with TypeError."""
    from kusuma_metamorph_etl_spark.operators.bpe import bpe_encode, bpe_train

    corpus = spark.createDataFrame(
        [(1, "aba abc"), (2, "abab")], "doc_id long, text string"
    )
    merges = bpe_train(corpus, n_merges=10)
    df = spark.createDataFrame(
        [(1, "aba"), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, merges).collect()}
    assert rows[1]
    assert rows[2] is None
