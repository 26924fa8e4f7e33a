"""[EXT] Deduplication operators for training-data pipelines
(SURVEY.md §2.10 north-star): exact, n-gram-Jaccard, MinHash+LSH, SimHash.

Scale design — the point of each variant:

* **exact**: hash-groupBy on a content fingerprint.  One shuffle of
  (fingerprint, id) pairs, never of document bodies.
* **n-gram Jaccard**: *exact* pairwise similarity via an inverted index
  (explode shingles → self-join on shingle → count common).  Quadratic in
  the worst case — correct reference semantics at test scale and the
  verifier for the approximate methods.
* **MinHash + LSH**: the 100 TB path.  Signatures are fixed-size (H mins),
  banding turns near-dup search into an equi-join on (band, band_hash) —
  candidates only, verified by exact Jaccard afterwards.  All built-in
  column expressions (sequence/transform/xxhash64/array_min); no UDFs.
* **SimHash**: 64-bit signature whose Hamming distance tracks cosine
  similarity of token sets; blocking on signature chunks gives the
  candidate join.

Cited parity: the reference has only the PK duplicate *gate*
(`/root/reference/ETL-Airflow/dags/tasks/transform_utils.py:79-92`); these
operators extend it to content-level dedup per the project north star.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.text import fingerprint, words


# ----------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    survivor_by: str | None = None,
) -> DataFrame:
    """Keep one representative per exact content fingerprint.

    Default survivor rule is lowest id.  ``survivor_by`` names a NUMERIC
    column (e.g. a quality score) to prefer instead — highest value
    wins, NULL scores lose to every scored row, lowest id breaks ties —
    the RefinedWeb/FineWeb practice of keeping the *best* copy of a
    duplicate cluster rather than an arbitrary one.  Deterministic
    either way, so the result is SQL-replayable (``row_number() OVER
    (PARTITION BY md5(text) ORDER BY q DESC NULLS LAST, id)``).

    groupBy(md5) shuffles only (hash[, score], id) tuples; the winning
    ids then semi-join the original frame, so bodies move at most once.
    """
    if survivor_by is None:
        keep = (
            df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("__fp"))
            .groupBy("__fp")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
    else:
        # min(struct(q IS NULL, -q, id)) == arg-max on (q DESC NULLS
        # LAST, then lowest id) in ONE map-side-combinable aggregate —
        # no window, no second shuffle.  The leading null flag is load-
        # bearing: Spark struct ordering sorts a NULL field FIRST, so
        # without it a NULL score would beat every scored row.
        keep = (
            df.select(
                fingerprint(F.col(text_col)).alias("__fp"),
                F.struct(
                    F.col(survivor_by).isNull().alias("__qnull"),
                    (-F.col(survivor_by)).alias("__negq"),
                    F.col(id_col).alias("__id"),
                ).alias("__key"),
            )
            .groupBy("__fp")
            .agg(F.min("__key").alias("__w"))
            .select(F.col("__w.__id").alias(id_col))
        )
    return df.join(keep, on=id_col, how="left_semi")


def incremental_dedup(
    new_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop rows of ``new_df`` whose content fingerprint already exists in
    ``history_df`` — the daily-snapshot shape of dedup: each ingest batch
    checks only against accumulated history, never all-pairs.  At scale the
    history side is a fingerprint-only table (one md5 column, precomputed
    and bucketed by fingerprint), so the anti-join shuffles 16-byte keys,
    not document bodies."""
    hist = history_df.select(fingerprint(F.col(text_col)).alias("__fp")).distinct()
    return (
        new_df.withColumn("__fp", fingerprint(F.col(text_col)))
        .join(hist, on="__fp", how="left_anti")
        .drop("__fp")
    )


# ------------------------------------------------------------ Bloom prefilter


def bloom_params_for(
    n_rows: int, fpp: float = 0.01, cap_bits: int = 1 << 27
) -> tuple[int, int]:
    """Classic Bloom sizing ``(n_bits, n_hashes)`` for ``n_rows`` keys at
    false-positive rate ``fpp``: ``m = -n·ln p / ln²2``, ``k = m/n·ln 2``
    (Bloom 1970) — the derived-parameter companion to
    :func:`sketches.bloom_sketch`'s fixed 1 M-bit default, same shape as
    :func:`lsh_planes_for` / :func:`similarity.n_cells_for`.

    ``m`` rounds up to a multiple of 64 (the sketch packs 64 bits/word)
    and clamps to ``[64, cap_bits]``.  The cap keeps
    :func:`sketches.bloom_probe`'s collected bitset bounded (2^27 bits =
    16 MB broadcast); past ~13 M history keys the FP rate degrades
    gracefully and the exact verify join in
    :func:`bloom_incremental_dedup` still guarantees correctness — it
    just prunes less.  Beyond that, shard the filter by key range."""
    import math

    if n_rows <= 0:
        return 64, 1
    m = int(-n_rows * math.log(max(1e-12, min(fpp, 0.5))) / (math.log(2) ** 2))
    m = max(64, min(cap_bits, ((m + 63) // 64) * 64))
    k = max(1, round(m / n_rows * math.log(2)))
    return m, min(k, 16)


def bloom_incremental_dedup(
    new_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 0.01,
) -> DataFrame:
    """:func:`incremental_dedup` with a Bloom prefilter — the 100 TB
    shape of the daily-ingest anti-join, composed from the mergeable
    sketch primitives (:func:`sketches.bloom_sketch` /
    :func:`sketches.bloom_probe`; :func:`sketches.bloom_prefilter_join`
    is the INNER-join twin, this is the anti-join one).

    A direct anti-join ships EVERY new-batch fingerprint into a shuffle
    against the full history fingerprint table.  Here history compresses
    into a Bloom bitset (~10 bits/doc at fpp=0.01 vs 128-bit md5 rows)
    that probes the new batch as a broadcast narrow map — NO shuffle for
    the definitely-fresh majority, which passes straight through; only
    the maybe-seen sliver (true dups + ~fpp of the rest) pays the exact
    verify anti-join.  Bloom filters have NO false negatives, so
    prefilter + exact verify returns EXACTLY the anti-join's rows — the
    output is oracle-hash-equal to :func:`incremental_dedup`, not an
    approximation.  The history count that sizes the filter is one
    count() action — the index-build step; persist the sketch table like
    ``write_ivf_index`` persists centroids to amortize across batches
    (bit-wise OR merges nightly increments without rescanning history).
    """
    from kusuma_metamorph_etl_spark.operators.sketches import (
        bloom_probe,
        bloom_sketch,
    )

    # One eager materialization of the history fingerprints serves all
    # three actions (count, sketch build, verify anti-join).  Why
    # localCheckpoint and not persist(): persist is best-effort CACHING
    # — a lost executor recomputes evicted partitions from the live
    # source, so a history that changed between the sketch action and
    # the verify action could surface a fingerprint the sketch never
    # saw, which would probe definitely-absent, bypass the verify join,
    # and break the hash-equality contract.  localCheckpoint truncates
    # the lineage: the fingerprints are a true snapshot (a lost block
    # fails LOUD instead of silently recomputing), and the blocks are
    # reclaimed by the ContextCleaner once the result is consumed —
    # persist()'s CacheManager entries would leak one cache per call
    # until session shutdown (r14 review).
    hist = (
        history_df.select(fingerprint(F.col(text_col)).alias("__fp"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_bits, n_hashes = bloom_params_for(hist.count(), fpp)
    sketch = bloom_sketch(hist, "__fp", n_bits=n_bits, n_hashes=n_hashes)
    flagged = bloom_probe(
        sketch,
        new_df.withColumn("__fp", fingerprint(F.col(text_col))),
        "__fp",
        n_bits=n_bits,
        n_hashes=n_hashes,
        out="__maybe",
    )
    fresh = flagged.filter(~F.col("__maybe"))
    verified = flagged.filter(F.col("__maybe")).join(
        hist, on="__fp", how="left_anti"
    )
    return fresh.unionByName(verified).drop("__fp", "__maybe")


# ----------------------------------------------------------------- shingles

def token_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles over an ALREADY-MATERIALIZED token array
    (0-based transform; all JVM-side).  Documents with fewer than ``n``
    tokens yield an empty set — guarded explicitly because
    ``sequence(0, -1)`` would count *down* and index 0 is invalid under
    ANSI semantics.

    Pass a materialized column, not the ``words(...)`` expression:
    higher-order-function lambdas re-evaluate captured outer expressions
    PER ELEMENT (no cross-lambda subexpression elimination), so an inline
    tokenizer would re-split the document once per gram per ``element_at``
    — measured 12.8s → 0.8s on the 5-gram decontamination sweep at sf0.1
    after materializing tokens in the projection below the explode."""
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + k + 1)) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Shingles straight from a text column — convenience form for
    single-use expressions.  Hot paths (anything exploding shingles)
    should materialize tokens first and use :func:`token_shingles`."""
    return token_shingles(words(text), n)


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) inverted-index rows.  Tokens materialize in their own
    projection under the explode Generate — see :func:`token_shingles` for
    why inlining the tokenizer into the lambda is pathological."""
    toked = df.select(F.col(id_col), words(F.col(text_col)).alias("__toks"))
    return toked.select(
        F.col(id_col), F.explode(token_shingles(F.col("__toks"), n)).alias("shingle")
    )


# ----------------------------------------------------------------- exact Jaccard

def _pair_overlap_counts(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Shared inverted-index plan behind :func:`jaccard_pairs` and
    :func:`containment_pairs`: (a, b, n_common, na, nb) for every pair
    a < b sharing ≥ 1 shingle.  Explode shingles, self-join on shingle
    (common count), join per-doc shingle counts.  The shingle join is
    the scale hazard (hot shingles fan out) — production paths prefilter
    with :func:`minhash_lsh_candidates` and verify candidates only."""
    shingles = shingle_table(df, text_col, id_col, n)
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    left = shingles.toDF("a", "shingle")
    right = shingles.toDF("b", "shingle")
    common = (
        left.join(right, on="shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.toDF("a", "na")
    sb = sizes.toDF("b", "nb")
    return common.join(sa, on="a").join(sb, on="b")


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs (a < b) with
    |A∩B| / |A∪B| ≥ threshold.

    Plan and scale hazard: :func:`_pair_overlap_counts`.
    """
    return (
        _pair_overlap_counts(df, text_col, id_col, n)
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "n_common", "na", "nb", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT join: pairs (a < b) where
    |A∩B| / min(|A|, |B|) ≥ threshold — the doc-inside-doc detector.

    Jaccard misses subset duplication (a page quoted inside a much longer
    page scores |A|/|B| ≈ 0 Jaccard but containment 1.0), which is a
    common shape in web-scale training corpora (boilerplate wrappers,
    quote farms, aggregators).  Plan and scale hazard:
    :func:`_pair_overlap_counts`.
    """
    return (
        _pair_overlap_counts(df, text_col, id_col, n)
        .withColumn(
            "containment", F.col("n_common") / F.least(F.col("na"), F.col("nb"))
        )
        .filter(F.col("containment") >= threshold)
        .select("a", "b", "n_common", "na", "nb", "containment")
    )


# ----------------------------------------------------------------- MinHash + LSH

def minhash_signature(text: Column, n_hashes: int = 16, n: int = 3) -> Column:
    """MinHash signature as a single Column expression: for seed j, min
    over shingles of xxhash64(j, shingle).

    Convenience form only — it embeds the shingle expression ``n_hashes``
    times, so Spark re-tokenizes per seed (Catalyst's CollapseProject
    inlines any aliased intermediate).  The hot path is
    :func:`minhash_signatures`, which shingles exactly once.
    """
    shingles = word_shingles(text, n)
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(j), s)))
            for j in range(n_hashes)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """(id, sig) MinHash signatures, shingling each document exactly once.

    Plan: explode shingles → one groupBy(id) with ``n_hashes``
    ``min(xxhash64(seed, shingle))`` aggregates.  min() is
    partial-aggregatable, so the shuffle carries one ``n_hashes``-long row
    per (id, map partition), not per shingle — this is the 100 TB shape.
    Documents with fewer than ``n`` tokens have no shingles and drop out
    (they cannot be shingle-near-dups of anything).
    """
    return _signatures_from_shingles(
        shingle_table(df, text_col, id_col, n), id_col, n_hashes
    )


def _signatures_from_shingles(
    shingles: DataFrame, id_col: str, n_hashes: int
) -> DataFrame:
    # Measured (sf0.1, same session, 3 reps each): this explode+groupBy
    # formulation runs the full near-dup pipeline in ~4.2-4.7s; replacing
    # it with a shuffle-free row expression
    # (array_min(transform(sh, s -> xxhash64(j, s))) per permutation)
    # is ~8.2-9.2s — 16 intermediate long-arrays per row lose to
    # codegen'd map-side partial mins despite the extra shuffle.  Don't
    # "optimize" this back to the narrow form without re-measuring.
    mins = [
        F.min(F.xxhash64(F.lit(j), F.col("shingle"))).alias(f"m{j}")
        for j in range(n_hashes)
    ]
    return (
        shingles.groupBy(id_col)
        .agg(*mins)
        .select(
            F.col(id_col).alias("id"),
            F.array(*[F.col(f"m{j}") for j in range(n_hashes)]).alias("sig"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding (a < b, distinct).

    Signature split into ``bands`` rows of ``n_hashes // bands`` values;
    docs agreeing on ANY full band collide.  The plan is: narrow signature
    projection → explode bands (fixed fan-out) → equi-join on
    (band_idx, band_hash).  Probability-of-candidacy follows the classic
    (1 - (1 - j^r)^b) S-curve.
    """
    return _lsh_candidates_from_shingles(
        shingle_table(df, text_col, id_col, n), id_col, n_hashes, bands
    )


def _band_table(sig: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(id, band_idx, band_hash) rows from an (id, sig) signature frame —
    the joinable LSH index representation (this is also the frame a
    production pipeline PERSISTS as its corpus index: append-only,
    partitionable by band_idx)."""
    if n_hashes < 1 or bands < 1:
        # fail fast: n_hashes=0 raised a bare "exprs should not be empty"
        # AssertionError and bands=0 a raw ZeroDivisionError (r17 edge sweep)
        raise ValueError(
            f"n_hashes and bands must be >= 1, got n_hashes={n_hashes}, "
            f"bands={bands}"
        )
    if n_hashes % bands != 0:
        raise ValueError(
            f"n_hashes ({n_hashes}) must be divisible by bands ({bands}) "
            "— the remainder signature values would be silently ignored, "
            "shifting the LSH S-curve away from the configured threshold"
        )
    rows = n_hashes // bands
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")


def _lsh_candidates_from_shingles(
    shingles: DataFrame, id_col: str, n_hashes: int, bands: int
) -> DataFrame:
    sig = _signatures_from_shingles(shingles, id_col, n_hashes)
    banded = _band_table(sig, n_hashes, bands)
    left = banded.toDF("a", "band_idx", "band_hash")
    right = banded.toDF("b", "band_idx", "band_hash")
    return (
        left.join(right, on=["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    prefilter_candidates: bool = False,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard — the full near-dup
    pipeline (generate cheaply, verify exactly).

    Verification intersects the two documents' distinct-shingle ARRAYS
    (``array_intersect``) instead of re-joining the exploded shingle
    table: the shingle-level join + groupBy("a","b") shuffle it replaces
    was the dominant bench cost (10.8s vs 6.9s at sf0.1, identical rows).
    Each candidate pair carries two shingle arrays through two narrow
    equi-joins; the intersection runs JVM-side inside codegen.  Persisting
    the shingle table was also measured SLOWER than recomputation
    (11.4-12.0s persisted vs 8.9-9.8s recomputed — cache materialization
    plus the extra job boundary beat cheap tokenize passes), so the plan
    recomputes.  ``prefilter_candidates`` semi-joins the array side down
    to candidate documents first — the right shape when candidates are a
    vanishing fraction of a huge corpus; at test scale the extra joins
    cost more than they save, hence opt-in.
    """
    if n_hashes < 1 or bands < 1:
        # fail fast at the public entry: a non-positive n_hashes otherwise
        # dies inside signature construction with a bare "exprs should
        # not be empty" AssertionError (r17 edge sweep); _band_table
        # carries the same guard for the incremental callers
        raise ValueError(
            f"n_hashes and bands must be >= 1, got n_hashes={n_hashes}, "
            f"bands={bands}"
        )
    shingles = shingle_table(df, text_col, id_col, n)
    candidates = _lsh_candidates_from_shingles(shingles, id_col, n_hashes, bands)
    # Shingle sets are distinct per doc, so |intersect| is the exact
    # common-shingle count and |array| the per-doc set size.  Tokens
    # materialize in their own select — token_shingles embeds its input
    # expression ~5x, and an inlined tokenizer evaluates per copy
    # (measured 4.4s -> 0.2s for this projection at sf0.1).
    sh = df.select(
        F.col(id_col), words(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), token_shingles(F.col("__toks"), n).alias("sh"))
    sa = sh.toDF("a", "sha")
    sb = sh.toDF("b", "shb")
    if prefilter_candidates:
        sa = sa.join(candidates.select("a").distinct(), on="a", how="left_semi")
        sb = sb.join(candidates.select("b").distinct(), on="b", how="left_semi")
    verified = (
        candidates.join(sa, on="a")
        .join(sb, on="b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sha", "shb")).alias("n_common"),
            F.size("sha").alias("na"),
            F.size("shb").alias("nb"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("a", "b", "jaccard")


def incremental_minhash_near_dups(
    new_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    include_new_pairs: bool = True,
) -> DataFrame:
    """Incremental near-dup detection: check a NEW batch against an
    existing corpus without ever re-pairing history against itself.

    The growing-corpus shape every crawl refresh hits: history is 100 TB
    and already internally deduped; tonight's batch is 0.1% of that.
    Recomputing all-pairs LSH over the union redoes 99.9% of yesterday's
    work — the incremental plan only joins the new batch's band table
    against the history band table (plus, with ``include_new_pairs``, the
    new batch against itself), so cost scales with |new| × collision
    rate, not |corpus|².  In production the history band table is the
    PERSISTED index (`_band_table` output, partitionable by band_idx,
    append-only: tonight's new bands become tomorrow's history).

    Returns (new_id, match_id, jaccard, against) where ``against`` is
    'history' or 'new'; pairs are exact-Jaccard-verified on candidates
    only, same verify plan as :func:`minhash_near_dups`.  The same
    id must not appear on both sides.
    """
    new_sig = _signatures_from_shingles(
        shingle_table(new_df, text_col, id_col, n), id_col, n_hashes
    )
    hist_sig = _signatures_from_shingles(
        shingle_table(history_df, text_col, id_col, n), id_col, n_hashes
    )
    new_bands = _band_table(new_sig, n_hashes, bands)
    hist_bands = _band_table(hist_sig, n_hashes, bands)

    cross = (
        new_bands.toDF("new_id", "band_idx", "band_hash")
        .join(hist_bands.toDF("match_id", "band_idx", "band_hash"),
              on=["band_idx", "band_hash"])
        .select("new_id", "match_id")
        .distinct()
        .withColumn("against", F.lit("history"))
    )
    candidates = cross
    if include_new_pairs:
        l = new_bands.toDF("new_id", "band_idx", "band_hash")
        r = new_bands.toDF("match_id", "band_idx", "band_hash")
        within = (
            l.join(r, on=["band_idx", "band_hash"])
            .filter(F.col("new_id") < F.col("match_id"))
            .select("new_id", "match_id")
            .distinct()
            .withColumn("against", F.lit("new"))
        )
        candidates = candidates.unionByName(within)

    def _sh(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), words(F.col(text_col)).alias("__toks")
        ).select(F.col(id_col), token_shingles(F.col("__toks"), n).alias("sh"))

    sa = _sh(new_df).toDF("new_id", "sha")
    sb = _sh(new_df.unionByName(history_df)).toDF("match_id", "shb")
    return (
        candidates.join(sa, on="new_id")
        .join(sb, on="match_id")
        .select(
            "new_id",
            "match_id",
            "against",
            F.size(F.array_intersect("sha", "shb")).alias("n_common"),
            F.size("sha").alias("na"),
            F.size("shb").alias("nb"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "match_id", "against", "jaccard")
    )


# ----------------------------------------------------------------- SimHash

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 48) -> DataFrame:
    """Per-document frequency-weighted SimHash signature (Charikar 2002;
    ``bits`` wide, ≤ 62 to stay in a signed long).

    Votes are weighted by term frequency — unweighted distinct-token
    SimHash degenerates when documents share a small vocabulary (every
    long doc covers the whole vocab → identical signatures), which is
    exactly the corpus shape of web-scale training data.  Plan: explode
    tokens → one (id, token) count agg → hash each distinct term once →
    one groupBy(id) with per-bit ±weight votes.  Shuffles only
    (id, term-hash, weight) triples, never document bodies.
    """
    if bits > 62:
        raise ValueError("bits must be ≤ 62 (signed-long reassembly)")
    tokens = (
        df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("w")
            ).otherwise(-F.col("w"))
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    voted = tokens.groupBy(id_col).agg(*votes)
    signature = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        signature = bit if signature is None else (signature + bit)
    return voted.select(F.col(id_col), signature.alias("simhash"))


def hamming_blocked_pairs(
    sigs: DataFrame,
    bits: int,
    max_hamming: int,
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """All (a < b, hamming) pairs within ``max_hamming`` bit flips over a
    (id, long-signature) frame — the shared scale kernel behind SimHash
    text dedup and pHash image dedup.

    Pigeonhole chunk blocking, no cross join: split the signature into
    ``max_hamming + 1`` chunks; any pair within ``max_hamming`` flips must
    agree exactly on at least one chunk, so candidates come from an
    equi-join on (chunk_idx, chunk_value) and only candidates pay the
    exact Hamming check.  Fan-out per row is the fixed chunk count, so
    the join input is O(n · (m+1)) rows.
    """
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    if chunk_bits == 0:
        raise ValueError("bits must be >= max_hamming + 1")

    def chunked(frame: DataFrame, id_out: str, sig_out: str) -> DataFrame:
        # Last chunk absorbs the remainder bits so all bits are covered.
        exprs = []
        for c in range(n_chunks):
            width = chunk_bits if c < n_chunks - 1 else bits - chunk_bits * (n_chunks - 1)
            mask = (1 << width) - 1
            exprs.append(
                F.struct(
                    F.lit(c).alias("chunk_idx"),
                    F.shiftright(F.col(sig_out), c * chunk_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("chunk_val"),
                )
            )
        return frame.select(
            id_out, sig_out, F.explode(F.array(*exprs)).alias("ch")
        ).select(id_out, sig_out, "ch.chunk_idx", "ch.chunk_val")

    base = sigs.select(F.col(id_col), F.col(sig_col))
    a = chunked(base.toDF("a", "sig_a"), "a", "sig_a")
    b = chunked(base.toDF("b", "sig_b"), "b", "sig_b")
    return (
        a.join(b, on=["chunk_idx", "chunk_val"])
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within ``max_hamming`` bit flips of each other
    (:func:`hamming_blocked_pairs` over :func:`simhash` signatures)."""
    sigs = simhash(df, text_col, id_col, bits)
    return hamming_blocked_pairs(sigs, bits, max_hamming, id_col, "simhash")


# ------------------------------------------------- embedding near-dup

def lsh_planes_for(n_rows: int, target_occupancy: int = 128) -> int:
    """Hyperplane count that keeps expected bucket occupancy near
    ``target_occupancy``: ``max(4, ceil(log2(n / target)))``.

    Why this exists (r13 scale probe): with a FIXED plane count the
    bucket count is fixed, so occupancy grows linearly with the corpus
    and candidate pairs grow QUADRATICALLY — the probe measured
    exponent 1.43 on a 10x scale-up.  Holding occupancy constant makes
    candidate generation linear in corpus size; the cost is a lower
    per-table collision probability for true pairs ((1 − θ/π)^planes),
    so recall-critical deployments should grow ``n_tables`` alongside
    (the recall bound in :func:`embedding_lsh_pairs`)."""
    import math

    if n_rows <= 0:
        return 4
    return max(4, math.ceil(math.log2(max(1.0, n_rows / target_occupancy))))


def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs (a < b, cosine ≥ threshold) via multi-table
    hyperplane LSH blocking + exact cosine verify.

    The 100 TB shape: each vector explodes to ``n_tables`` (table, bucket)
    rows; the self-join is an equi-join on (table, bucket), so comparisons
    drop from |N|² to bucket collisions.  Verification is exact, so the
    only approximation is *recall* — a true pair colliding in no table is
    missed (bound: 1 − (1 − (1 − θ/π)^planes)^tables).

    ``n_planes=None`` derives the plane count from the corpus size via
    :func:`lsh_planes_for` (one count() job), keeping bucket occupancy —
    and therefore candidate-pair volume PER ROW — constant as the corpus
    grows; a fixed plane count degrades quadratically (r13 scale probe).
    """
    if n_planes is None:
        n_planes = lsh_planes_for(df.count())
    from kusuma_metamorph_etl_spark.operators.similarity import (
        hyperplane_signatures_np,
    )

    def sig(frame: DataFrame, out: str) -> DataFrame:
        # ids only — the 64-float vectors stay OUT of the exploded frame
        # and the bucket join; they re-attach per verified candidate
        # below.  Signatures come from the broadcast-numpy path: the
        # plan-literal formulation embedded 8×4×64 plane constants and
        # paid a multi-second codegen compile per query (the same
        # finding as `ivf_build`'s Lloyd loop; measured below).
        return hyperplane_signatures_np(
            frame, out, n_planes, n_tables, dim, id_col, vec_col
        )

    # Distinct candidate id-pairs FIRST (a pair colliding in several tables
    # must cost one cosine, not several), then one vector-attach join per
    # side and one exact verify per pair.  Measured at sf0.1 (2000 vecs,
    # 8 tables x 16 buckets): 16.0s -> 5.1s vs verifying per-collision
    # with vectors riding the exploded join; -> ~2.5s warm after the
    # signature stage moved to the broadcast-numpy path (plan-literal
    # planes cost a multi-second codegen compile per query).
    # One signature pass, not two: both self-join sides read the same
    # materialized (id, tbl, bucket) frame — without sharing, each side
    # re-runs the MapInPandas hyperplane pass over the FULL vector corpus
    # (r18 before-plan: sigs() at nodes 6 and 11).  Lazy localCheckpoint,
    # ContextCleaner-released (the persist-leak lesson in substring_pairs).
    sigs = sig(df, "a").localCheckpoint(eager=False)
    cand = (
        sigs.join(sigs.withColumnRenamed("a", "b"), on=["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # Vectorized verify: candidates attach raw vectors and score in
    # numpy over Arrow batches — one fused dot+norm per batch instead of
    # an interpreted 64-element fold per pair (the cosine_topk_np lesson:
    # dense linear algebra does not belong in HOF expressions).  Measured
    # at sf0.1 (~820k candidates): scoring stage 5-6s fold → 2.0s numpy;
    # whole dedup 6.1s → 4.6-5.0s warm, identical output rows.
    import numpy as np
    import pandas as pd

    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("a_v"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("b_v"))
    attached = cand.join(va, on="a").join(vb, on="b")

    def score(batches):
        for batch in batches:
            if len(batch) == 0:
                # a 0-row Arrow batch gives a 1-D empty array whose
                # .sum(axis=1) raises AxisError (same guard as
                # semantic_pairs' score)
                continue
            av = np.array(list(batch["a_v"]), dtype=np.float64)
            bv = np.array(list(batch["b_v"]), dtype=np.float64)
            cos = (av * bv).sum(axis=1) / (
                np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
            )
            out = pd.DataFrame(
                {"a": batch["a"], "b": batch["b"], "cosine": cos}
            )
            yield out[out["cosine"] >= threshold]

    # Preserve the caller's id type (string doc ids, ints, ...) — a
    # hard-coded `long` would make Arrow reject or coerce non-bigint ids.
    id_type = df.schema[id_col].dataType.simpleString()
    return attached.mapInPandas(
        score, schema=f"a {id_type}, b {id_type}, cosine double"
    )


def embedding_dedup(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter: str | None = None,
    n_planes: int | None = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup removal: drop every row whose cosine to a
    LOWER-id row is ≥ threshold (greedy lowest-id-wins — same winner rule
    as :func:`exact_dedup`; near-duplicate is not an equivalence relation,
    so the tie rule is declared, not derived).

    ``prefilter=None`` scores all pairs exactly (test scale; the oracle
    semantics).  ``prefilter="lsh"`` blocks candidates with
    :func:`embedding_lsh_pairs` first — missed candidates mean missed
    drops, so the LSH result is always a superset of the exact survivors
    (recall asserted in tests).
    """
    from kusuma_metamorph_etl_spark.operators.similarity import cosine_pairs

    if prefilter is None:
        pairs = cosine_pairs(df, threshold, id_col, vec_col)
    elif prefilter == "lsh":
        pairs = embedding_lsh_pairs(
            df, threshold, id_col, vec_col, n_planes, n_tables, dim
        )
    else:
        raise ValueError(f"unknown prefilter {prefilter!r}")
    dups = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(dups, on=id_col, how="left_anti")


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Corpus documents sharing ANY word n-gram with a benchmark set —
    test-set decontamination for training corpora (the published
    13-gram-collision rule used for LLM training-data hygiene; lowered
    ``n`` tightens it).

    Scale shape: the benchmark side collapses to distinct grams and
    BROADCASTS (benchmarks are MB-scale; the corpus is the 100 TB side);
    corpus grams explode narrowly into the broadcast join, and only hit
    *ids* reach the one shuffle (distinct).  ``hash_grams`` joins on
    xxhash64(gram) instead of the gram text — 8 bytes instead of ~100 —
    at a vanishing false-positive risk; disable for an engine-portable
    (oracle-reproducible) exact-string join.

    Returns distinct contaminated ``id_col`` rows.
    """
    def key(col: Column) -> Column:
        return F.xxhash64(col) if hash_grams else col

    def grams_of(df: DataFrame, *cols: str) -> DataFrame:
        # Tokens materialize under the explode (token_shingles docstring),
        # and the hash applies in a projection above it — a generator
        # cannot nest inside the hash expression.
        toked = df.select(
            *cols, words(F.lower(F.col(text_col))).alias("__toks")
        )
        return toked.select(
            *cols, F.explode(token_shingles(F.col("__toks"), n)).alias("__g")
        ).select(*cols, key(F.col("__g")).alias("__gram"))

    bench_grams = grams_of(benchmark).distinct()
    corpus_grams = grams_of(corpus, id_col)
    return (
        corpus_grams.join(F.broadcast(bench_grams), on="__gram")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Drop corpus documents that collide with the benchmark
    (:func:`ngram_contamination`); anti-join on the contaminated ids."""
    hits = ngram_contamination(corpus, benchmark, n, id_col, text_col, hash_grams)
    return corpus.join(hits, on=id_col, how="left_anti")


# ------------------------------------------------- exact substring spans


def _winnow_fingerprints_udf(k: int, w: int):
    """Arrow-batched UDF: per document, the winnowed set of k-gram
    rolling-hash fingerprints as ``array<struct<h:long, pos:int>>``.

    Hashing is a degree-(k−1) polynomial over code points mod 2^64
    (numpy uint64 wrap — one vectorized multiply-sum per document, no
    per-gram digest calls); winnowing selects the first-minimum hash in
    every window of ``w`` consecutive gram positions (Schleimer,
    Wilkerson & Aiken, SIGMOD'03).  The selection rule is content-
    determined, so two documents sharing any substring of length
    ≥ w + k − 1 select at least one identical (hash, in-span offset)
    fingerprint — the recall guarantee the caller's blocking join
    relies on.  Expected density is 2/(w+1) fingerprints per position:
    the per-document sketch is sub-linear and the downstream shuffle
    carries (hash, id, pos) triples only, never text.
    """
    import numpy as np

    B = np.uint64(1099511628211)  # FNV-1a prime, odd -> full period mod 2^64
    powers = np.empty(k, dtype=np.uint64)
    p = np.uint64(1)
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash design
        for i in range(k - 1, -1, -1):
            powers[i] = p
            p = p * B
    swv = np.lib.stride_tricks.sliding_window_view

    @F.pandas_udf("array<struct<h: long, pos: int>>")
    def fp(texts: pd.Series) -> pd.Series:
        def one(t: str) -> list[dict]:
            n = len(t)
            if n < k:
                return []
            codes = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(
                np.uint64
            )
            with np.errstate(over="ignore"):
                h = (swv(codes, k) * powers).sum(axis=1)  # uint64 wrap
            m = h.shape[0]
            if m <= w:
                sel = np.array([int(h.argmin())])
            else:
                sel = np.unique(
                    swv(h, w).argmin(axis=1) + np.arange(m - w + 1)
                )
            signed = h.view(np.int64)
            return [
                {"h": int(signed[i]), "pos": int(i)} for i in sel
            ]

        return texts.map(one)

    return fp


def _extend_match_udf(k: int):
    """Arrow-batched UDF: maximal equal span around a verified k-gram
    anchor — ``struct<a_start:int, b_start:int, length:int>`` (0-based
    character offsets), or length 0 for a hash-collision false anchor
    (polynomial hashes collide; extension is the exactness check, so
    collisions cost a comparison, never a wrong pair)."""

    def common_prefix_len(x: str, y: str, chunk: int = 256) -> int:
        n = min(len(x), len(y))
        i = 0
        while i < n:
            j = min(i + chunk, n)
            if x[i:j] == y[i:j]:
                i = j
                continue
            while i < n and x[i] == y[i]:
                i += 1
            break
        return i

    @F.pandas_udf("struct<a_start: int, b_start: int, length: int>")
    def extend(
        ta: pd.Series, tb: pd.Series, pa: pd.Series, pb: pd.Series
    ) -> pd.DataFrame:
        out = {"a_start": [], "b_start": [], "length": []}
        for t_a, t_b, p_a, p_b in zip(ta, tb, pa, pb):
            p_a, p_b = int(p_a), int(p_b)
            if t_a[p_a : p_a + k] != t_b[p_b : p_b + k]:
                out["a_start"].append(0)
                out["b_start"].append(0)
                out["length"].append(0)
                continue
            # guard p==0: t[-1::-1] would wrap to the reversed WHOLE
            # string and "extend" left past the document start
            rev_a = t_a[p_a - 1 :: -1] if p_a > 0 else ""
            rev_b = t_b[p_b - 1 :: -1] if p_b > 0 else ""
            left = common_prefix_len(rev_a, rev_b)
            right = common_prefix_len(t_a[p_a + k :], t_b[p_b + k :])
            out["a_start"].append(p_a - left)
            out["b_start"].append(p_b - left)
            out["length"].append(left + k + right)
        return pd.DataFrame(out)

    # Non-deterministic marker (guide §4.4): the `length >= min_len`
    # filter on the result struct otherwise gets pushed below the
    # star-expansion projection and DUPLICATES this ArrowEvalPython node
    # — the r18 before-plan ran extend(__ta, __tb, ..) twice per
    # candidate pair (nodes 48+51), doubling the span-extension work.
    return extend.asNondeterministic()


def substring_pairs(
    df: DataFrame,
    min_len: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
    max_df: int = 50,
) -> DataFrame:
    """Cross-document EXACT repeated substrings of ≥ ``min_len``
    characters: ``(a, b, a_start, b_start, length)`` rows, one per
    maximal shared span, 0-based offsets, ``a < b`` — substring-level
    dedup in the Lee et al. style ("Deduplicating Training Data Makes
    Language Models Better", ACL'22), where document-level near-dup
    misses the paragraph copied into an otherwise-novel page.

    Spark-first shape instead of their suffix array (a global
    sequential structure Spark cannot build incrementally):

    1. per-document winnowed rolling-hash fingerprints
       (:func:`_winnow_fingerprints_udf`; k-gram size ``k`` defaults to
       ``min_len // 2``, winnow window ``w = min_len − k + 1`` — any
       shared span of ≥ ``min_len`` chars shares a fingerprint, the
       winnowing theorem);
    2. candidate anchors by fingerprint equi-join (``a < b``), after a
       stop-fingerprint cap: hashes present in > ``max_df`` documents
       are dropped as boilerplate (license headers), bounding the join
       fan-out the way stop-words bound an inverted index — spans ONLY
       shared by hyper-common blocks are the declared recall trade;
    3. candidate-only verify: texts join in by id for candidate pairs
       alone, and :func:`_extend_match_udf` grows each anchor to its
       maximal equal span (hash collisions die here).  Anchors inside
       one span all extend to the same maximum, collapsed by distinct.

    Shuffles carry fingerprints and candidate ids; document bodies move
    only for candidate pairs (the embedding-LSH verify economics).
    """
    k = k or max(8, min_len // 2)
    if k > min_len:
        raise ValueError(f"k={k} must be <= min_len={min_len}")
    w = min_len - k + 1
    fp = _winnow_fingerprints_udf(k, w)
    fps = (
        df.select(F.col(id_col), fp(F.col(text_col)).alias("f"))
        .select(id_col, F.explode("f").alias("f"))
        .select(id_col, "f.h", "f.pos")
        # The sketch feeds THREE consumers (hot-hash count, both sides
        # of the candidate self-join); without sharing, Catalyst
        # re-runs the text scan + fingerprint UDF for each.  The shared
        # frame is (id, hash, pos) triples — sketch-sized, ~2/(w+1) rows
        # per character, far smaller than the corpus.  LAZY localCheckpoint
        # rather than persist(): same one-materialization sharing, but the
        # backing RDD cache is released by the ContextCleaner when the
        # result frame is garbage-collected — persist() pins an entry in
        # the cache manager FOREVER unless the caller unpersists, leaking
        # one cached sketch per call in a per-shard pipeline.
        .localCheckpoint(eager=False)
    )
    hot = (
        fps.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") > max_df)
        .select("h")
    )
    fps = fps.join(F.broadcast(hot), on="h", how="left_anti")
    left = fps.select(
        F.col("h"), F.col(id_col).alias("a"), F.col("pos").alias("pos_a")
    )
    right = fps.select(
        F.col("h"), F.col(id_col).alias("b"), F.col("pos").alias("pos_b")
    )
    cand = (
        left.join(right, on="h")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "pos_a", "pos_b")
    )
    texts_a = df.select(
        F.col(id_col).alias("a"), F.col(text_col).alias("__ta")
    )
    texts_b = df.select(
        F.col(id_col).alias("b"), F.col(text_col).alias("__tb")
    )
    extend = _extend_match_udf(k)
    result = (
        cand.join(texts_a, on="a")
        .join(texts_b, on="b")
        .withColumn(
            "s",
            extend(
                F.col("__ta"), F.col("__tb"), F.col("pos_a"), F.col("pos_b")
            ),
        )
        .select("a", "b", "s.a_start", "s.b_start", "s.length")
        .filter(F.col("length") >= min_len)
        .distinct()
    )
    return result


def incremental_substring_pairs(
    new_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
    k: int | None = None,
    max_df: int = 50,
    include_new_pairs: bool = True,
) -> DataFrame:
    """Incremental substring-level dedup: find duplicated spans between a
    NEW batch and an existing corpus without re-pairing history against
    itself — the growing-corpus shape, same economics as
    :func:`incremental_minhash_near_dups` (cost ∝ |new| × collision
    rate, never |corpus|²).  In production the history side of the
    candidate join is the PERSISTED (id, hash, pos) fingerprint sketch
    :func:`substring_pairs` builds (append-only: tonight's new
    fingerprints become tomorrow's history); here it derives from
    ``history_df`` for a self-contained call.

    Plan: winnow-fingerprint BOTH frames (the sketch is ~2/(w+1) rows
    per character — index-sized); the stop-fingerprint cap counts
    document frequency over the union of sketches (boilerplate is
    boilerplate whichever side it sits on); candidates are new×history
    anchor matches plus, with ``include_new_pairs``, new×new (a < b);
    the verify joins text in for candidate pairs only and extends each
    anchor to its maximal literal span.  Output:
    ``(a, b, a_start, b_start, length, against)`` where ``a`` is always
    the new-batch id and ``against`` ∈ {'history', 'new'}.  The same id
    must not appear on both sides.
    """
    k = k or max(8, min_len // 2)
    if k > min_len:
        raise ValueError(f"k={k} must be <= min_len={min_len}")
    w = min_len - k + 1
    fp = _winnow_fingerprints_udf(k, w)

    def sketch(frame: DataFrame) -> DataFrame:
        return (
            frame.select(F.col(id_col), fp(F.col(text_col)).alias("f"))
            .select(id_col, F.explode("f").alias("f"))
            .select(id_col, "f.h", "f.pos")
            # shared by the hot-hash count and the candidate joins —
            # same lazy-localCheckpoint lifetime story as
            # :func:`substring_pairs`
            .localCheckpoint(eager=False)
        )

    new_fps, hist_fps = sketch(new_df), sketch(history_df)
    hot = (
        new_fps.select(id_col, "h")
        .unionByName(hist_fps.select(id_col, "h"))
        .groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") > max_df)
        .select("h")
    )
    new_f = new_fps.join(F.broadcast(hot), on="h", how="left_anti")
    hist_f = hist_fps.join(F.broadcast(hot), on="h", how="left_anti")

    left = new_f.select(
        "h", F.col(id_col).alias("a"), F.col("pos").alias("pos_a")
    )
    cross = (
        left.join(
            hist_f.select(
                "h", F.col(id_col).alias("b"), F.col("pos").alias("pos_b")
            ),
            on="h",
        )
        .select("a", "b", "pos_a", "pos_b")
        .withColumn("against", F.lit("history"))
    )
    cand = cross
    if include_new_pairs:
        within = (
            left.join(
                new_f.select(
                    "h", F.col(id_col).alias("b"), F.col("pos").alias("pos_b")
                ),
                on="h",
            )
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", "pos_a", "pos_b")
            .withColumn("against", F.lit("new"))
        )
        cand = cross.unionByName(within)

    texts_a = new_df.select(
        F.col(id_col).alias("a"), F.col(text_col).alias("__ta")
    )
    texts_b = (
        history_df.select(
            F.col(id_col).alias("b"), F.col(text_col).alias("__tb")
        ).unionByName(
            new_df.select(
                F.col(id_col).alias("b"), F.col(text_col).alias("__tb")
            )
        )
        if include_new_pairs
        else history_df.select(
            F.col(id_col).alias("b"), F.col(text_col).alias("__tb")
        )
    )
    extend = _extend_match_udf(k)
    return (
        cand.join(texts_a, on="a")
        .join(texts_b, on="b")
        .withColumn(
            "s",
            extend(
                F.col("__ta"), F.col("__tb"), F.col("pos_a"), F.col("pos_b")
            ),
        )
        .select("a", "b", "against", "s.a_start", "s.b_start", "s.length")
        .filter(F.col("length") >= min_len)
        .distinct()
    )


def remove_substring_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`substring_pairs` output: CUT each duplicated span out
    of the higher-id document of its pair (the lower id keeps the only
    copy — the same lowest-id-wins rule as ``exact_dedup``, at span
    grain).  Returns ``df`` with ``text_col`` rewritten plus
    ``n_spans_removed`` / ``chars_removed`` accounting columns.

    Per-document span lists merge overlaps before cutting (two pairs can
    claim intersecting ranges of one document; cutting them naively
    would double-delete), then splice the survivors — a bounded
    ``collect_list`` per document (span counts are candidate-bounded,
    the same economics as the pair search) feeding one Arrow-batched
    rewrite.  Documents in no pair pass through untouched.

    One pass removes every DETECTED span, but cutting joins the text on
    either side of each cut, and that new junction can itself form a
    fresh ≥ min_len repeat with another document (Lee et al.'s suffix
    array sees all repeats in one structure and doesn't have this
    seam).  Callers needing a true fixpoint iterate search → remove;
    in practice junction repeats are rare and one extra pass settles.
    """
    doc_spans = (
        spans.select(
            F.col("b").alias(id_col),
            F.struct(
                F.col("b_start").alias("start"), F.col("length").alias("length")
            ).alias("span"),
        )
        .groupBy(id_col)
        .agg(F.collect_list("span").alias("__spans"))
    )

    @F.pandas_udf("struct<text: string, n_spans: int, chars: int>")
    def cut(texts: pd.Series, span_lists: pd.Series) -> pd.DataFrame:
        out = {"text": [], "n_spans": [], "chars": []}
        for t, sl in zip(texts, span_lists):
            if sl is None or len(sl) == 0:
                # ArrowEvalPython runs the UDF for every row even under
                # F.when — no-span documents must pass through here too
                out["text"].append(t)
                out["n_spans"].append(0)
                out["chars"].append(0)
                continue
            ranges = sorted((s["start"], s["start"] + s["length"]) for s in sl)
            merged: list[list[int]] = []
            for lo, hi in ranges:
                if merged and lo <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], hi)
                else:
                    merged.append([lo, hi])
            pieces, cursor = [], 0
            for lo, hi in merged:
                pieces.append(t[cursor:lo])
                cursor = hi
            pieces.append(t[cursor:])
            out["text"].append("".join(pieces))
            out["n_spans"].append(len(merged))
            out["chars"].append(sum(hi - lo for lo, hi in merged))
        return pd.DataFrame(out)

    others = [c for c in df.columns if c != text_col]
    cleaned = (
        df.join(doc_spans, on=id_col, how="left")
        .withColumn(
            "__cut",
            F.when(
                F.col("__spans").isNotNull(),
                cut(F.col(text_col), F.col("__spans")),
            ),
        )
        .select(
            *others,
            F.coalesce(F.col("__cut.text"), F.col(text_col)).alias(text_col),
            F.coalesce(F.col("__cut.n_spans"), F.lit(0)).alias(
                "n_spans_removed"
            ),
            F.coalesce(F.col("__cut.chars"), F.lit(0)).alias("chars_removed"),
        )
    )
    return cleaned


# ------------------------------------------------------- semantic (SemDeDup)

def semantic_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = 32,
    refine_iters: int = 2,
) -> DataFrame:
    """Near-dup pairs (a < b, cosine ≥ threshold) via SemDeDup-style
    k-means cell blocking (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): cluster the
    embedding space, then score pairs ONLY within a cluster cell.

    The 100 TB shape: cell assignment is a pure map against broadcast
    centroid literals (no shuffle of vectors beyond the one cell
    equi-join); the quadratic term drops from |N|² to Σ|cell|², and
    ``n_clusters`` scales WITH the corpus so the per-cell population —
    not the cluster count — is the bounded quantity.  Versus the
    hyperplane-LSH blocking of :func:`embedding_lsh_pairs`: k-means
    cells adapt to the actual density of the embedding space (LSH cuts
    it with data-oblivious random planes), at the price of the centroid
    build pass.  Approximation is recall-only: a true pair straddling a
    cell boundary is missed; identical vectors always share an argmax
    cell (ties broken by cell index, deterministically), so EXACT
    duplicates are never missed.  Verification is exact cosine in numpy
    over Arrow batches — precision matches `embedding_lsh_pairs`.
    """
    import numpy as np

    from kusuma_metamorph_etl_spark.operators.similarity import (
        assign_cells_np,
        ivf_build,
        n_cells_for,
    )

    if n_clusters is None:
        # derived sizing (√n — similarity.n_cells_for): the docstring's
        # "n_clusters scales WITH the corpus" made concrete.  A FIXED
        # cluster count lets per-cell occupancy grow linearly and the
        # Σ|cell|² verify quadratically (the sf1.0 probe read exponent
        # 0.63 at the old fixed 32).
        n_clusters = n_cells_for(df.count())
    centroids = ivf_build(df, n_clusters, id_col, vec_col, refine_iters)
    # probes=1: every vector lives in exactly one cell, so the cell join
    # emits each candidate pair once — no distinct pass needed (unlike
    # multi-table LSH where a pair can collide in several tables).  The
    # assignment is the broadcast-numpy path (plan-literal centroids
    # cost a multi-second codegen compile at 32×64 — see
    # `assign_cells_np`).  The b side is a RENAME of the a side, but a
    # DataFrame self-join does NOT share the branch: the r18 before-plan
    # ran the cell-assignment ArrowEvalPython once per join side over
    # the full corpus.  Lazy localCheckpoint materializes the assigned
    # frame once (ContextCleaner-released); both sides read it.
    a = assign_cells_np(df, centroids, "a", id_col, vec_col).localCheckpoint(
        eager=False
    )
    b = a.select(
        F.col("a").alias("b"), F.col("a_v").alias("b_v"), "cell"
    )
    cand = a.join(b, on="cell").filter(F.col("a") < F.col("b"))

    def score(batches):
        for batch in batches:
            av = np.array(list(batch["a_v"]), dtype=np.float64)
            bv = np.array(list(batch["b_v"]), dtype=np.float64)
            if len(av) == 0:
                continue
            cos = (av * bv).sum(axis=1) / (
                np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
            )
            out = pd.DataFrame(
                {"a": batch["a"], "b": batch["b"], "cosine": cos}
            )
            yield out[out["cosine"] >= threshold]

    id_type = df.schema[id_col].dataType.simpleString()
    return cand.mapInPandas(
        score, schema=f"a {id_type}, b {id_type}, cosine double"
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = 32,
    refine_iters: int = 2,
) -> DataFrame:
    """SemDeDup: drop every row whose cosine to a LOWER-id row in the same
    k-means cell is ≥ threshold (greedy lowest-id-wins — the same declared
    winner rule as :func:`exact_dedup` / :func:`embedding_dedup`).  The
    cluster-blocked scale path of :func:`embedding_dedup`; like the LSH
    path, missed boundary pairs mean missed drops, so the result is always
    a SUPERSET of the exact survivors (gated in `dedup_semantic_err`)."""
    pairs = semantic_pairs(
        df, threshold, id_col, vec_col, n_clusters, refine_iters
    )
    dups = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(dups, on=id_col, how="left_anti")


def incremental_semantic_pairs(
    new_df: DataFrame,
    index_path: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_new_pairs: bool = True,
) -> DataFrame:
    """Incremental SemDeDup (VERDICT r8 #5 — the semantic member of the
    incremental family exact/MinHash/substring/CC already have): check a
    NEW embedding batch against a PERSISTED corpus index without ever
    re-pairing the corpus against itself.

    The index is :func:`similarity.write_ivf_index` output — the corpus
    cell-partitioned on disk plus the centroid sidecar.  Centroids stay
    FROZEN between refreshes: the new batch assigns to the frozen cells
    (broadcast-numpy map, no shuffle), and only the TOUCHED cells'
    partitions are read back (bounded by n_centroids cells, a static
    ``isin`` partition filter — at 100 TB the nightly batch touches a
    handful of cells and the scan prunes to those files).  Candidate
    pairs are (new × corpus-in-cell) plus, with ``include_new_pairs``,
    (new × new in-cell); verification is the same exact-cosine Arrow
    scorer as :func:`semantic_pairs`, so cost scales with |new| × cell
    occupancy, not |corpus|².

    Same recall seam as the batch path, plus one incremental-specific
    caveat: a drifting embedding distribution degrades frozen-centroid
    cell balance over refreshes — the lifecycle is rebuild-on-skew
    (re-run ``write_ivf_index``), exactly like re-bucketing a table.
    Identical vectors still always share an argmax cell, so exact
    duplicates of corpus rows are never missed.

    Returns (new_id, match_id, against, cosine) with ``against`` in
    {'history', 'new'}; ids must be disjoint across the two sides.
    """
    import json

    import numpy as np

    from kusuma_metamorph_etl_spark.operators.similarity import (
        as_double,
        assign_cells_np,
    )

    spark = new_df.sparkSession
    centroids = json.loads(
        spark.read.text(f"{index_path}/_ivf_centroids").first()["value"]
    )
    a = assign_cells_np(new_df, centroids, "new_id", id_col, vec_col)
    # The assignment (a Python-worker pandas UDF) feeds four consumers:
    # the touched-cell collect, the history join, and both sides of the
    # within-batch self-join.  Measured A/B at sf0.1 (5 reps, warm):
    # recompute 1.22s median vs lazy-localCheckpoint 1.88s — AQE's
    # ReusedExchange already shares the self-join's shuffle, so the UDF
    # runs ~3x on the BOUNDED nightly batch, and a checkpoint would
    # materialize the batch's full vectors to disk to save narrow
    # Python work (r9 self-review, resolved measured-not-assumed).  A
    # caller whose batch is huge enough to flip that trade persists
    # `new_df` itself.
    # Touched-cell set: bounded by n_centroids, so the collect is safe,
    # and pushing it as a static filter prunes the corpus read to the
    # touched partitions' files.
    touched = sorted(
        r["cell"] for r in a.select("cell").distinct().collect()
    )
    corpus = (
        spark.read.parquet(index_path)
        .filter(F.col("cell").isin(touched))
        .select(
            F.col(id_col).alias("match_id"),
            as_double(F.col(vec_col)).alias("match_id_v"),
            "cell",
        )
    )
    cand = (
        a.join(corpus, on="cell")
        .select("new_id", "new_id_v", "match_id", "match_id_v")
        .withColumn("against", F.lit("history"))
    )
    if include_new_pairs:
        b = a.select(
            F.col("new_id").alias("match_id"),
            F.col("new_id_v").alias("match_id_v"),
            "cell",
        )
        within = (
            a.join(b, on="cell")
            .filter(F.col("new_id") < F.col("match_id"))
            .select("new_id", "new_id_v", "match_id", "match_id_v")
            .withColumn("against", F.lit("new"))
        )
        cand = cand.unionByName(within)

    def score(batches):
        for batch in batches:
            av = np.array(list(batch["new_id_v"]), dtype=np.float64)
            bv = np.array(list(batch["match_id_v"]), dtype=np.float64)
            if len(av) == 0:
                continue
            cos = (av * bv).sum(axis=1) / (
                np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
            )
            out = pd.DataFrame(
                {
                    "new_id": batch["new_id"],
                    "match_id": batch["match_id"],
                    "against": batch["against"],
                    "cosine": cos,
                }
            )
            yield out[out["cosine"] >= threshold]

    id_type = new_df.schema[id_col].dataType.simpleString()
    return cand.mapInPandas(
        score,
        schema=(
            f"new_id {id_type}, match_id {id_type},"
            " against string, cosine double"
        ),
    )


def incremental_semantic_dedup(
    new_df: DataFrame,
    index_path: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """New-batch survivors under incremental SemDeDup: drop a new row on
    ANY corpus match (the standing corpus always wins — it is already
    deduped and published) or on a lower-id match within the batch (the
    family's lowest-id-wins rule).  The survivors are exactly what the
    refresh appends to the index — ``write_ivf_index`` over corpus ∪
    survivors, or an assignment-preserving append, both documented in
    :func:`incremental_semantic_pairs`."""
    pairs = incremental_semantic_pairs(
        new_df, index_path, threshold, id_col, vec_col
    )
    drops = (
        pairs.filter(F.col("against") == "history")
        .select(F.col("new_id").alias(id_col))
        .unionByName(
            pairs.filter(F.col("against") == "new").select(
                F.col("match_id").alias(id_col)
            )
        )
        .distinct()
    )
    return new_df.join(drops, on=id_col, how="left_anti")
