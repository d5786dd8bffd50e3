"""Declarative data-quality expectations over a DataFrame — the
engine-level form of the reference's defensive parsing/validation
(transformer_loader/main.py:43-57 drops envelope rows it can't trust;
api_service validates request payloads field by field).

Three rule families, each with the cheapest distributed plan:

* **row rules** (not-null, range, regex, membership): ONE map-only
  aggregate pass computes every rule's violation count — no matter
  how many rules, the table is scanned once.
* **uniqueness**: one groupBy on the key (map-side partial count);
  violations = Σ (copies − 1) over duplicated keys.
* **referential integrity**: a left-anti join against the referenced
  key set (broadcast when the dim is bounded, shuffled otherwise).

`expectations_report` unions the three into one (rule, violations)
frame; `quarantine` splits a frame into (good, bad) on the row rules
— bad rows carry the violated rule names, the bronze-zone stance
(keep + tag, never drop silently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_rule_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, violations) for predicate rules, one scan for all rules.

    Each value is a conditional sum inside a single aggregate, so the
    physical plan is: scan → partial agg (map-side) → one exchange of
    ONE row per partition → final agg. Adding rules adds columns, not
    passes."""
    aggs = [
        # coalesce: SUM over zero rows is NULL — an empty frame must
        # report 0 violations per rule, like the uniqueness path
        F.coalesce(F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))), F.lit(0))
        .cast("long")
        .alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("rule"), F.col(name).alias("violations"))
            for name in rules
        ]
    )
    return wide.select(F.explode(pairs).alias("x")).select("x.rule", "x.violations")


def uniqueness_violations(
    df: DataFrame, key_cols: list[str], rule: str
) -> DataFrame:
    """(rule, violations) where violations = rows beyond the first per
    duplicated key — the unique-index semantics of the reference's
    idempotent ingest (extractor/main.py:413)."""
    dup = (
        df.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .agg(
            F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
            .cast("long")
            .alias("violations")
        )
    )
    return dup.select(F.lit(rule).alias("rule"), "violations")


def fk_violations(
    df: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    rule: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """(rule, violations): fact rows whose FK has no referenced row.
    The dim side reduces to its distinct key column before the anti
    join, and broadcasts when bounded (the usual case for dims)."""
    keys = dim.select(F.col(pk_col).alias(fk_col)).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    orphans = df.select(fk_col).join(keys, fk_col, "left_anti")
    return orphans.agg(
        F.lit(rule).alias("rule"),
        F.count("*").cast("long").alias("violations"),
    )


def expectations_report(parts: list[DataFrame]) -> DataFrame:
    """Union the rule-family frames into one (rule, violations) report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (good, bad) on row rules; bad rows carry the sorted
    comma-joined names of every rule they violate (`_violations`).
    Row-local — both branches stay map-only over the same scan."""
    tags = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(pred, F.lit(name)).otherwise(F.lit(None))
                    for name, pred in rules.items()
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    tagged = df.withColumn("_violations", F.array_join(tags, ","))
    good = tagged.filter(F.col("_violations") == "").drop("_violations")
    bad = tagged.filter(F.col("_violations") != "")
    return good, bad
