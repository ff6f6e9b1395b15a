"""Structured Streaming: bronze CDC ingest, incremental silver."""
