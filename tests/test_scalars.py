"""Unit tests for the scalar catalog (SURVEY §2.8) on inline fixtures."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from baronbatch_etl_spark.functions.scalars import (
    cs_per_min,
    drop_empty_items,
    full_riot_id,
    norm_nfkc,
    round_half_up,
    safe_div_kda,
    split_name_tag,
)


def test_safe_div_kda_zero_deaths(spark):
    # reference: (k+a)/max(1,d) — transformer_loader/main.py:152-153
    df = spark.createDataFrame(
        [Row(k=10, d=0, a=5), Row(k=3, d=2, a=1)],
    )
    out = df.select(safe_div_kda("k", "d", "a").alias("kda")).collect()
    assert [r.kda for r in out] == [15.0, 2.0]


def test_cs_per_min_zero_duration(spark):
    df = spark.createDataFrame([Row(cs=100, dur=0), Row(cs=120, dur=1200)])
    out = df.select(cs_per_min("cs", "dur").alias("cs_min")).collect()
    assert [r.cs_min for r in out] == [0.0, 6.0]


def test_round_half_up_exact_half(spark):
    # 7.125 is exactly representable; HALF_UP must give 7.13
    df = spark.createDataFrame([Row(x=7.125), Row(x=2.675)])
    out = df.select(round_half_up("x", 2).alias("r")).collect()
    assert out[0].r == 7.13


def test_split_and_recompose_name_tag(spark):
    df = spark.createDataFrame(
        [Row(n="Faker#KR1"), Row(n="NoTagName")],
    )
    gn, tag = split_name_tag("n")
    out = df.select(
        gn.alias("g"), tag.alias("t"), full_riot_id(gn, tag).alias("full")
    ).collect()
    assert (out[0].g, out[0].t, out[0].full) == ("Faker", "KR1", "Faker#KR1")
    assert (out[1].g, out[1].t, out[1].full) == ("NoTagName", "", "NoTagName")


def test_norm_nfkc_accents_and_case(spark):
    # byte-exact reference norm(): NFKC + lower() + strip(), "" on
    # falsy (transformer_loader/main.py:62-73); "ﬁ" ligature → "fi";
    # internal whitespace is PRESERVED (strip only, no collapse)
    df = spark.createDataFrame(
        [Row(s="  Ferro iLlautó "), Row(s="ﬁsh"), Row(s=None),
         Row(s="a  b")],
        "s string",
    )
    out = df.select(norm_nfkc("s").alias("n")).collect()
    assert out[0].n == "ferro illautó"
    assert out[1].n == "fish"
    assert out[2].n == ""
    assert out[3].n == "a  b"


def test_drop_empty_items(spark):
    df = spark.createDataFrame([Row(items=[1055, 0, 3006, 0, 0, 2055, 0])])
    out = df.select(drop_empty_items("items").alias("kept")).collect()
    assert out[0].kept == [1055, 3006, 2055]


def test_higher_order_transform(spark):
    df = spark.createDataFrame([Row(xs=[1.0, 2.0, 3.0])])
    out = df.select(
        F.aggregate("xs", F.lit(0.0), lambda a, x: a + x).alias("s")
    ).collect()
    assert out[0].s == 6.0
