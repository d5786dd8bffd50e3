"""catalog_streaming — filled in incrementally."""
