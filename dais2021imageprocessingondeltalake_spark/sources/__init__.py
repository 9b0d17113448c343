"""Sources & sinks: multimodal file scans, parquet/delta table IO."""
