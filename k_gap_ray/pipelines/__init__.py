"""Composed end-to-end pipelines built from the stage modules."""
