"""Sources & sinks (SURVEY.md §2.1): curated parquet catalog, raw log
readers (text/regex/CSV/JSON), partitioned parquet sink, streaming
file source."""
