"""catalog_windows — filled in incrementally."""
