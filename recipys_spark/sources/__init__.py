"""Sources & sinks: parquet/Iceberg readers, synthetic transcript generator."""
