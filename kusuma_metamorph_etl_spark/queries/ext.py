"""[EXT] north-star operators — dedup, similarity search, text analysis,
streaming analogs — as oracle-checked queries (SURVEY.md §2.10)."""

from __future__ import annotations
