"""[EXT] north-star operators — dedup, similarity search, text analysis,
multimodal plumbing, event-time windows — as oracle-checked queries
(SURVEY.md §2.10).

Split into per-domain modules in r13 (the former 7.4k-line monolith
fought review); this module re-exports every query so existing imports
(`from kusuma_metamorph_etl_spark.queries.ext import mart_rfm`) keep
working, and importing it registers the whole [EXT] surface.  The
canonical registration order is the module order below — pinned by
``registry._MODULE_RANK``, not by import order.

Oracle notes shared by the domain modules:

* DuckDB replicates word-shingling with ``list_transform(range(...))`` and
  the engine's exact token rule (any-whitespace split via
  ``regexp_split_to_array('\\s+')`` + drop empties — see ``ext_common._W``
  and ``operators/text.py::words``), so shingle sets are identical
  cross-engine.
* MinHash/SimHash/hyperplane-LSH queries hash with ``xxhash64`` — there is
  no DuckDB equivalent, so those register with ``oracle=None`` and take the
  driver's rows-only check; their *exact* counterparts (``dedup_ngram_jaccard``,
  ``sim_cosine_pairs``/``sim_cosine_topk``) are fully oracle-checked and are
  the semantics the approximate paths are validated against in tests/.
* Float policy: single divisions are bit-identical cross-engine and ship
  raw; anything summed (cosine, windowed sums) is rounded identically on
  both sides (registry.py conventions).
"""

from kusuma_metamorph_etl_spark.queries.ext_text import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_dedup import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_sim import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_mm import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_events import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_rel import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_quality import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_sql import *  # noqa: F401,F403
from kusuma_metamorph_etl_spark.queries.ext_marts import *  # noqa: F401,F403
