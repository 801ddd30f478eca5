"""Input sources: deterministic tokenized-sequence tables (F1 shape) and
the snapshot-manifest table layer."""
