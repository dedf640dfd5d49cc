"""Pure, deterministic per-row functions — the byte-identity contract."""
