"""[EXT] Unigram-LM subword tokenizer: the SECOND real trainable
tokenizer family (Kudo 2018, "Subword Regularization" — the algorithm
behind SentencePiece's default model), complementing `bpe.py`.  Where
BPE grows a vocabulary bottom-up by merging, unigram starts from a
large seed of candidate pieces and PRUNES to the target size under an
EM-estimated piece language model; encoding is Viterbi-optimal
segmentation instead of greedy merge replay.

Scale split — identical to BPE's (and `similarity.py::ivf_build`):

* TRAIN is a bounded driver-side loop over the aggregated word-frequency
  table (corpus → ≤ ``max_words`` (word, count) rows in one shuffle;
  seeding and EM touch only that dict).
* ENCODE is distributed: the piece table ships in an Arrow-batched
  pandas UDF closure; per-word Viterbi is O(len × max_piece_len).

Simplifications, declared: hard (Viterbi) EM rather than full
forward-backward expectation — the M-step counts each word's single best
segmentation (monotone in the Viterbi objective, pinned by test); pruning
is count-ranked rather than loss-ranked.  Losslessness does NOT depend
on either choice: single characters are never pruned and unseen
characters encode as themselves under a fixed UNK penalty, so
decode(encode(text)) always restores the whitespace-normalized text —
the same gate contract as `txt_bpe_roundtrip`.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.bpe import END

# Log-prob assigned to out-of-vocabulary single characters at encode
# time: low enough that any in-vocab segmentation wins, finite so every
# string segments (UNK-free byte-fallback, the sentencepiece
# character-coverage idea).
UNK_LOGP = -100.0


def _word_counts(df: DataFrame, text_col: str, max_words: int):
    from kusuma_metamorph_etl_spark.operators.text import words

    rows = (
        df.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def viterbi_segment(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: standard
    Viterbi over cut positions.  Ties break toward the LONGER last piece
    (deterministic; fewer, longer pieces — the convention tests pin).
    Unknown single characters cost ``UNK_LOGP`` so every word segments.
    """
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = UNK_LOGP
                else:
                    continue
            cand = best[i] + lp
            # strictly-greater keeps the SMALLEST i (longest piece) on ties
            # because i ascends and we overwrite only on improvement …
            # except equal scores from different i: take the first (small
            # i = long piece) by using > against the running best.
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    max_words: int = 5000,
    max_piece_len: int = 8,
    em_iters: int = 3,
    seed_factor: int = 8,
) -> dict[str, float]:
    """Learn a unigram piece vocabulary: ``{piece: log-prob}``.

    Seed = every substring (≤ ``max_piece_len``) of the frequent words,
    count-weighted, truncated to ``seed_factor × vocab_size`` candidates
    (single characters always kept — the losslessness floor); then
    ``em_iters`` rounds of hard EM: Viterbi-segment every word under the
    current model, recount pieces from the segmentations, re-normalize,
    and prune count-ranked toward ``vocab_size`` (ties lexicographic, so
    the vocabulary is deterministic across runs/platforms).
    """
    wc = _word_counts(df, text_col, max_words)
    seed: Counter = Counter()
    chars: set[str] = set()
    for w, c in wc:
        for i in range(len(w)):
            chars.add(w[i])
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                seed[w[i:j]] += c
    keep_n = max(seed_factor * vocab_size, len(chars))
    ranked = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab_counts = dict(ranked[:keep_n])
    for ch in chars:
        vocab_counts.setdefault(ch, seed[ch])

    def normalize(counts: dict[str, int]) -> dict[str, float]:
        total = sum(counts.values())
        return {p: math.log(c / total) for p, c in counts.items() if c > 0}

    logp = normalize(vocab_counts)
    for it in range(em_iters):
        counts: Counter = Counter()
        for w, c in wc:
            for piece in viterbi_segment(w, logp, max_piece_len):
                counts[piece] += c
        # prune toward vocab_size: linear schedule, single chars immune
        target = max(
            vocab_size,
            int(len(logp) - (len(logp) - vocab_size) * (it + 1) / em_iters),
        )
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(ranked[:target])
        for ch in chars:
            kept.setdefault(ch, max(counts.get(ch, 0), 1))
        logp = normalize(kept)
    return logp


def unigram_encode(
    df: DataFrame,
    logp: dict[str, float],
    max_piece_len: int = 8,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Distributed Viterbi encode: ``array<string>`` pieces with one END
    sentinel token appended per word (so `bpe.bpe_decode` inverts both
    tokenizers identically).  Same whitespace class, END-rejection
    contract, and C-speed translate+split formulation as
    `bpe.bpe_encode` (the regex split cost ~25% of the bench row)."""
    fold_ws = str.maketrans("\t\n\f\r", "    ")

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        def one(t: str) -> list[str]:
            if t is None:
                # NULL text passes through as NULL tokens (routine in
                # crawl corpora) — Series.map hands None to the fn, it
                # is not auto-skipped
                return None
            if END in t:
                raise ValueError(
                    f"unigram_encode: input contains the END sentinel "
                    f"{END!r}; round-trip would be lossy"
                )
            out: list[str] = []
            for w in t.translate(fold_ws).split(" "):
                if w:
                    out.extend(viterbi_segment(w, logp, max_piece_len))
                    out.append(END)
            return out

        return texts.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))
