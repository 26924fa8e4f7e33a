"""Registered oracle-checked queries.

* :mod:`marts` — the three reference marts end-to-end on the TPC-H adapter
* :mod:`core` — SURVEY.md §2 relational operator inventory, one query each
* :mod:`ext` — [EXT] dedup / similarity / text / streaming-analog operators
"""
