"""Sources & sinks: fixture loaders, the OHLCV ingestion pipeline, table layer."""
