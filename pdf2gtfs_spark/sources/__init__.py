"""Sources: transcripts table (synthetic/Iceberg-shaped) + GTFS CSV IO."""
