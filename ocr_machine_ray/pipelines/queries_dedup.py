"""queries_dedup — filled in incrementally."""
