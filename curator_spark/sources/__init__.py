"""Sources and sinks (parquet scans, staged-commit writer)."""
