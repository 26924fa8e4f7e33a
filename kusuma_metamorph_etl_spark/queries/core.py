"""SURVEY.md §2 relational operator inventory — one oracle-checked query per
✔ row.  Filled in operator-by-operator (registry ids match §2's ID column)."""

from __future__ import annotations
