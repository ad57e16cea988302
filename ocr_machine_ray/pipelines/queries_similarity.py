"""queries_similarity — filled in incrementally."""
