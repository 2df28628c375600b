"""Sources & sinks (SURVEY.md §2.1): CSV scan, parquet table scan, ZIP
binary source."""
