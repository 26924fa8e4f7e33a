"""Registered oracle-checked queries.

* :mod:`marts` — the three reference marts end-to-end on the TPC-H adapter
* :mod:`core` — SURVEY.md §2 relational operator inventory, one query each
* :mod:`ext` — [EXT] aggregator re-exporting the per-domain modules
  (`ext_text`, `ext_dedup`, `ext_sim`, `ext_mm`, `ext_events`,
  `ext_rel`, `ext_quality`, `ext_sql`, `ext_marts`; shared oracle
  building blocks in `ext_common`) — split from one 7.4k-line file in
  r13
"""
