"""Batch transforms for ``Dataset.map_batches`` (stateless fns + actor classes)."""
