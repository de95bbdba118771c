"""Sources & sinks: Parquet-backed tables + the engine catalog."""
