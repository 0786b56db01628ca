"""Sources/sinks (SURVEY.md §2.1): materials JSON ingest, prediction
maps, generic parquet/CSV IO."""
