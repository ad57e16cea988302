"""queries_relational — filled in incrementally."""
