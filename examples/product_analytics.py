"""Run the product-analytics battery over the event stream — the
queries a growth/ops team asks of an interaction log.

    python examples/product_analytics.py [sf_dir]

1. Ordered funnel (`w_funnel`): view → click → purchase progression.
2. Cohort retention matrix (`w_cohort_retention`).
3. Last-touch attribution (`w_attribution`): which touchpoint gets
   credit for each purchase, with decimal-exact value.
4. RFM segmentation (`w_rfm_segment`): six named customer segments.
5. Peak concurrency (`w_peak_concurrency`): sweep-line max occupancy
   per event type.
6. M4 downsampling (`w_m4_downsample`): the pixel-exact chart feed.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from baronbatch_etl_spark.io import DEFAULT_SF_DIR
from baronbatch_etl_spark.queries import load_all
from baronbatch_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    spark = get_spark("product-analytics")
    registry = load_all()

    for name, title in [
        ("w_funnel", "ordered funnel"),
        ("w_cohort_retention", "cohort retention"),
        ("w_attribution", "last-touch attribution"),
        ("w_rfm_segment", "RFM segments"),
        ("w_peak_concurrency", "peak concurrency"),
    ]:
        print(f"\n=== {title} ({name}) ===")
        registry[name].fn(spark, sf_dir).show(12, truncate=False)

    m4 = registry["w_m4_downsample"].fn(spark, sf_dir)
    print(f"=== M4 downsample: {m4.count()} buckets (sample) ===")
    m4.orderBy("user_id", "bucket_ms").show(6, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
