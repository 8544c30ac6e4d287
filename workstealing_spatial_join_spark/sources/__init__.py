"""Sources & sinks: deterministic fixtures, parquet/Iceberg writer with
lineage + checkpointed resume."""
