"""Query registry and end-to-end pipelines (encode job, lineage, resume)."""
