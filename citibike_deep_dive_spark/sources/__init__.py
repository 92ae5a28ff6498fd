"""Sources/sinks: file discovery, zip/CSV ingestion, ingestion state
(SURVEY.md §2.1, §2.10)."""
