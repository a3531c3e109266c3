"""Sources & sinks: the Spark realization of the reference's bulk-I/O
surface — COPY in/out, external tables, foreign scans, reject-limit
error handling (SURVEY.md §2.1)."""
