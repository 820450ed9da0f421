"""Checkpoint / lineage state (per-partition, resumable)."""
