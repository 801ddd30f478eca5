"""Structured Streaming integration.

The reference has no streaming surface (SURVEY.md §1.1: batch relational
only), so nothing here is required for parity; ``incremental`` adds the
natural Spark-native extension: encode arriving micro-batches into the
same stripe-blob format with per-batch lineage.
"""
