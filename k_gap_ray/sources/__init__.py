"""Sources & sinks beyond Parquet (SURVEY.md section 2.1)."""
