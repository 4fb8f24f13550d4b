"""Sources/sinks: CSV TVF, parquet tables, in-memory tables."""
