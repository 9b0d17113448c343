"""Reference-parity pipelines: ingest ETL, training prep, inference
(batch + streaming) — the three lifecycles of SURVEY.md §3."""
