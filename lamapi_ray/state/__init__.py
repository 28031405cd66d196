"""Checkpoint / lineage / manifest state."""
