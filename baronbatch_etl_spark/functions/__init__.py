"""Column-expression catalog (SURVEY §2.8) + text/vector helpers."""

from baronbatch_etl_spark.functions.scalars import (
    build_items_array,
    coalesce_chain,
    cond_flag,
    cs_per_min,
    drop_empty_items,
    epoch_ms_to_ddmm,
    full_riot_id,
    map_lookup_with_default,
    norm_nfkc,
    safe_div_kda,
    split_name_tag,
)

__all__ = [
    "build_items_array",
    "coalesce_chain",
    "cond_flag",
    "cs_per_min",
    "drop_empty_items",
    "epoch_ms_to_ddmm",
    "full_riot_id",
    "map_lookup_with_default",
    "norm_nfkc",
    "safe_div_kda",
    "split_name_tag",
]
