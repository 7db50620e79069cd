"""Batch/relational operator library — the SURVEY.md §2 inventory,
re-expressed as declarative DataFrame plans so Catalyst owns the physical
strategy (pushdown, pruning, join selection, partial aggregation, AQE)."""
