"""Training-data pipeline operators (dedup, similarity search, text
analysis) as DataFrame compositions with paired DuckDB oracle SQL.

Each operator exports (spark_fn, oracle_sql) built from shared dialect
fragments so the two stay in lock-step (the driver hash-compares their
outputs at sf0.01).
"""
