"""Readers: column-pruned parquet over shard lists."""
