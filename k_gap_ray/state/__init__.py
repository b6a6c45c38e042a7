"""Mutable-state components: upsert writer, incremental ingestion."""
