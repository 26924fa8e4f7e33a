"""Operator library (SURVEY.md §2).

Most of §2's relational surface (select/rename/filter/equi-join/hash-agg/
window/CASE) maps 1:1 onto ``pyspark.sql`` primitives — those are used
directly and exercised through the query registry.  This package hosts the
operators that need real implementation work:

* :mod:`windows` — scalable global percentile ranking, top-k per group
* :mod:`joins` — alias-disciplined disambiguated joins, backward as-of
  join (union-merge), interval range join (chunked equi-join)
* :mod:`skew` — salted joins for hot-key mitigation
* :mod:`partitioning` — deterministic range buckets, z-order clustering
* :mod:`layout` — oracle-replayable min-max z-keys, compaction planning
* :mod:`graph` — connected components, pagerank, triangles, k-core  [EXT]
* :mod:`dedup` — exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding
  near-dup  [EXT]
* :mod:`similarity` — brute-force (JVM + BLAS-vectorized), multi-table
  hyperplane LSH, and IVF cosine top-k  [EXT]
* :mod:`text` — language-ID, quality scoring, token counting, md5/sketch/
  rolling-hash fingerprinting  [EXT]
* :mod:`multimodal` — binary-column decode/feature/resize/frame-sample
  plumbing (Arrow mapInPandas)  [EXT]
"""
