"""End-to-end examples — the engine's "golden" reference pipelines."""
