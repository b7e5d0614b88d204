"""Structured Streaming surface (optional — the north rule is batch-only;
SURVEY.md §2.2 documents streaming as a deliberate gap, this module is
the incremental-ingest bridge)."""
