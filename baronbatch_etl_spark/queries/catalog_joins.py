"""catalog_joins — filled in incrementally."""
