"""Relational operator helpers: upsert/merge, enrichment."""
