"""queries_text — filled in incrementally."""
