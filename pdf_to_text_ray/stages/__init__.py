"""Per-batch transform stages (map_batches bodies and actor classes)."""
