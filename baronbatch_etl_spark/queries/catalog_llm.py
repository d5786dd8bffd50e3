"""catalog_llm — filled in incrementally."""
