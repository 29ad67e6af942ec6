"""Source-table builders: the pipeline input is always a table shaped
(repo, path, commit, lang, content) per BASELINE.json input_hint —
an Iceberg table in production, parquet/in-memory here."""
