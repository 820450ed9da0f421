"""Dataset sources: parquet readers and the deterministic synthesizer."""
