"""catalog_aggs — filled in incrementally."""
