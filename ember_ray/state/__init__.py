"""Checkpoint / lineage-manifest state (resume support)."""
