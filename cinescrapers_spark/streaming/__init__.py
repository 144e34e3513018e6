"""Incremental ingestion (batch-incremental, the reference's operational
model) + Structured Streaming bindings for the same transforms."""
