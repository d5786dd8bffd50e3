"""Corpus-level distribution monitoring, shared by the batch query
(queries/catalog_corpus.py) and the streaming drift monitor
(streaming/ops.py): total-variation drift from (source, token, count)
partials.

Counts are the mergeable state — they sum across micro-batches /
epochs / shards, so any holder of per-partition token counts can
compute the corpus drift without rescanning text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tv_drift_from_counts(st: DataFrame) -> DataFrame:
    """Per-source total-variation distance vs the whole corpus, from a
    ``(source, tok, c_st)`` counts frame.

    TV(s) = ½·Σ_t |c_st/C_s − c_t/C| rewritten so only tokens PRESENT
    in the source are needed (absent tokens contribute c_t·C_s and
    Σ_t c_t = C):

        TV(s) = [Σ_{t∈s}(|c_st·C − c_t·C_s| − c_t·C_s) + C_s·C]
                / (2·C_s·C)

    All sums are exact BIGINT (order-independent); ONE final IEEE
    division — bit-identical across engines and across replays, which
    is what lets the streaming monitor's fold hash-match the batch
    query. Products stay in-range through ~3·10⁹ corpus tokens per
    1 source-token; rescale counts (or cast DECIMAL(38,0)) beyond.

    Plan: corpus token counts reuse the input aggregate (no rescan);
    C is a broadcast 1-row scalar; the token-keyed join is
    vocabulary-sized (AQE-broadcast while it fits); per-source totals
    join source-keyed (tiny).
    """
    t = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    cs = st.groupBy("source").agg(
        F.sum("c_st").alias("c_s"), F.count("*").alias("vocab")
    )
    n = t.agg(F.sum("c_t").alias("c"))
    terms = (
        st.join(t, "tok")
        .join(cs, "source")
        .join(F.broadcast(n))  # 1-row scalar, same shape as t_tfidf
        .select(
            "source",
            (
                F.abs(F.col("c_st") * F.col("c") - F.col("c_t") * F.col("c_s"))
                - F.col("c_t") * F.col("c_s")
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(F.sum("term").alias("num_part"))
        .join(cs, "source")
        .join(F.broadcast(n))
        .select(
            "source",
            F.col("c_s").alias("n_tokens"),
            F.col("vocab").alias("vocab_size"),
            (
                (F.col("num_part") + F.col("c_s") * F.col("c")).cast("double")
                / (F.lit(2) * F.col("c_s") * F.col("c")).cast("double")
            ).alias("tv_dist"),
        )
    )
