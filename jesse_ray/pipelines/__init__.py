"""End-to-end pipelines (flagship validation run, query catalog)."""
