"""Medallion pipeline tests on reference-shaped inline fixtures,
covering the edge rows called out in FIXTURES.md §A (zero deaths,
zero duration, missing riot-id fields, accented names, duplicate
matchIds, orphan puuids, empty item slots)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from baronbatch_etl_spark.pipeline import medallion as ml
from baronbatch_etl_spark.schemas import MATCHES_RAW, SUMMONERS

NOW = datetime(2025, 1, 1, tzinfo=timezone.utc)


def participant(**over):
    p = {
        "puuid": "other",
        "teamId": 100,
        "championName": "Ahri",
        "riotIdGameName": "Other",
        "riotIdTagLine": "TAG",
        "summonerName": "Other#TAG",
        "win": False,
        "kills": 1,
        "deaths": 2,
        "assists": 3,
        "totalDamageDealtToChampions": 1000,
        "goldEarned": 500,
        "totalMinionsKilled": 100,
        "neutralMinionsKilled": 10,
    }
    p.update({f"item{i}": 0 for i in range(7)})
    p.update(over)
    return p


def bronze_row(match_id, puuid, parts, duration=1800, queue=420, **info_over):
    info = {
        "queueId": queue,
        "gameDuration": duration,
        "gameCreation": 1700000000000,
        "gameEndTimestamp": 1700000100000,
        "participants": parts,
    }
    info.update(info_over)
    return {
        "matchId": match_id,
        "puuid": puuid,
        "raw": {"info": info},
        "processed": False,
        "timestamp": NOW,
    }


def summoner(puuid, name):
    return {
        "puuid": puuid,
        "summonerName": name,
        "region": "europe",
        "platform": "euw1",
        "summonerLevel": 30,
        "profileIconId": 29,
        "encryptedSummonerId": "enc",
        "solo_tier": "GOLD",
        "solo_rank": "II",
        "solo_lp": 50,
        "solo_wins": 10,
        "solo_losses": 10,
        "last_rank_update": NOW,
    }


@pytest.fixture(scope="module")
def summoners(spark):
    return spark.createDataFrame(
        [
            summoner("p-faker", "Faker#KR1"),
            summoner("p-ferro", "FerroiLlautó#EUW"),
            summoner("p-legacy", "OldName"),
        ],
        SUMMONERS,
    )


def _silver(spark, summoners, rows):
    bronze = spark.createDataFrame(rows, MATCHES_RAW)
    return ml.silver_from_bronze(bronze, summoners)


def test_stage1_puuid_and_derivations(spark, summoners):
    parts = [
        participant(),
        participant(
            puuid="p-faker",
            championName="Azir",
            win=True,
            kills=10,
            deaths=2,
            assists=5,
            totalMinionsKilled=270,
            neutralMinionsKilled=30,
            item0=1055,
            item3=3006,
        ),
    ]
    out = _silver(spark, summoners, [bronze_row("M1", "p-faker", parts)]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.puuid, r.champion, r.win) == ("p-faker", "Azir", True)
    assert r.kda == 7.5  # (10+5)/2
    assert r.cs == 300 and r.cs_min == 10.0  # 300/(1800/60)
    assert r.items == [1055, 0, 0, 3006, 0, 0, 0]
    assert r.queue_id == 420
    assert r.game_timestamp == 1700000100000  # gameEnd preferred
    assert len(r.participants) == 2
    assert r.participants[0].summonerName == "Other#TAG"


def test_zero_deaths_and_zero_duration(spark, summoners):
    parts = [
        participant(puuid="p-faker", kills=4, deaths=0, assists=2,
                    totalMinionsKilled=50, neutralMinionsKilled=0),
    ]
    r = _silver(
        spark, summoners, [bronze_row("M2", "p-faker", parts, duration=0)]
    ).collect()[0]
    assert r.kda == 6.0  # (4+2)/max(1,0)
    assert r.cs_min == 0.0  # guarded division


def test_stage2_riot_id_with_missing_tag(spark, summoners):
    parts = [
        participant(
            puuid="someone-else",
            riotIdGameName="Faker",
            riotIdTagLine=None,  # tag missing → stage-2 null-tolerant
            summonerName=None,
        )
    ]
    r = _silver(spark, summoners, [bronze_row("M3", "p-faker", parts)]).collect()[0]
    assert r.puuid == "p-faker"


def test_stage2_nfkc_accent_fold(spark, summoners):
    parts = [
        participant(
            puuid="someone-else",
            riotIdGameName="  ferroillautó ",  # case+space fold
            riotIdTagLine="euw",
            summonerName=None,
        )
    ]
    r = _silver(spark, summoners, [bronze_row("M4", "p-ferro", parts)]).collect()[0]
    assert r.puuid == "p-ferro"


def test_stage3_legacy_name_fallback(spark, summoners):
    parts = [
        participant(
            puuid="someone-else",
            riotIdGameName="Mismatch",
            riotIdTagLine="XX",
            summonerName="oldname",
        )
    ]
    r = _silver(spark, summoners, [bronze_row("M5", "p-legacy", parts)]).collect()[0]
    assert r.puuid == "p-legacy"


def test_resolution_keyed_to_bronze_puuid(spark, summoners):
    # A match fetched for p-faker whose participants include ANOTHER
    # tracked summoner (p-ferro by puuid) but not p-faker: the row
    # must NOT be attributed to p-ferro — the reference resolves only
    # against the match's own db_puuid summoner and drops the rest.
    parts = [participant(puuid="p-ferro", riotIdGameName="FerroiLlautó",
                         riotIdTagLine="EUW")]
    assert (
        _silver(spark, summoners, [bronze_row("MX1", "p-faker", parts)]).count()
        == 0
    )

    # Same participants plus a name-only match for p-faker: resolves
    # to the bronze puuid via stage 2, never to the other summoner.
    parts2 = parts + [
        participant(puuid="someone-else", riotIdGameName="Faker",
                    riotIdTagLine="KR1", summonerName=None)
    ]
    r = _silver(spark, summoners, [bronze_row("MX2", "p-faker", parts2)]).collect()
    assert len(r) == 1 and r[0].puuid == "p-faker"
    assert r[0].champion == "Ahri"


def test_cascade_delete_keeps_null_puuid_rows(spark):
    from pyspark.sql import Row

    facts = spark.createDataFrame(
        [Row(puuid="a", v=1), Row(puuid=None, v=2), Row(puuid="b", v=3)]
    )
    kept = ml.cascade_delete(facts, "a").collect()
    assert sorted(r.v for r in kept) == [2, 3]  # null row survives


def test_unresolvable_and_invalid_rows_dropped(spark, summoners):
    rows = [
        bronze_row("M6", "p-faker", [participant()]),  # nobody matches
        {
            "matchId": "M7",
            "puuid": "p-faker",
            "raw": {"info": None},  # invalid envelope (P9)
            "processed": False,
            "timestamp": NOW,
        },
    ]
    assert _silver(spark, summoners, rows).count() == 0


def test_ingest_dedup_skips_existing_and_batch_dupes(spark, summoners):
    existing = spark.createDataFrame(
        [bronze_row("M1", "p-faker", [participant()])], MATCHES_RAW
    )
    incoming = spark.createDataFrame(
        [
            bronze_row("M1", "p-faker", [participant()]),  # already stored
            bronze_row("M8", "p-faker", [participant()]),
            bronze_row("M8", "p-ferro", [participant()]),  # in-batch dupe
        ],
        MATCHES_RAW,
    )
    out = ml.ingest_dedup(incoming, existing).collect()
    assert [r.matchId for r in out] == ["M8"]
    assert out[0].puuid == "p-faker"  # deterministic first-writer


def test_gold_rollup(spark, summoners):
    rows = [
        bronze_row("G1", "p-faker", [participant(puuid="p-faker", win=True,
                   kills=10, deaths=2, assists=5, championName="Azir")]),
        bronze_row("G2", "p-faker", [participant(puuid="p-faker", win=False,
                   kills=2, deaths=4, assists=2, championName="Azir")]),
        bronze_row("G3", "p-faker", [participant(puuid="p-faker", win=True,
                   kills=1, deaths=1, assists=1, championName="Ahri")]),
    ]
    gold = {
        (r.puuid, r.champion): (r.games, r.wins, r.kda_sum)
        for r in ml.gold_from_silver(_silver(spark, summoners, rows)).collect()
    }
    assert gold[("p-faker", "Azir")] == (2, 1, 8.5)  # 7.5 + 1.0
    assert gold[("p-faker", "Ahri")] == (1, 1, 2.0)


def test_retention_upsert_purge(spark, summoners):
    rows = [
        bronze_row(f"R{i}", "p-faker",
                   [participant(puuid="p-faker")],
                   gameEndTimestamp=1700000000000 + i * 1000)
        for i in range(5)
    ]
    silver = _silver(spark, summoners, rows)
    trimmed = ml.retention_trim(silver, "game_timestamp", keep=3)
    assert sorted(r.matchId for r in trimmed.collect()) == ["R2", "R3", "R4"]

    dims = summoners
    upd = spark.createDataFrame(
        [summoner("p-faker", "Faker#T1"), summoner("p-new", "New#EU")], SUMMONERS
    )
    merged = ml.upsert_summoners(dims, upd)
    assert merged.count() == 4
    assert (
        merged.filter("puuid = 'p-faker'").collect()[0].summonerName == "Faker#T1"
    )

    kept = ml.purge_orphans(silver, dims.filter("puuid != 'p-faker'"))
    assert kept.count() == 0  # all facts were p-faker's
    assert ml.cascade_delete(silver, "p-faker").count() == 0

def test_full_reference_workflow_with_replay(spark, summoners):
    """The reference's whole loop in one flow: ingest (idempotent) →
    transform tick → retention → gold rollup → stats read — with
    batch 2 REPLAYING a batch-1 match (at-least-once delivery), which
    must not change any gold total."""
    m = [
        bronze_row(f"M{i}", "p-faker",
                   [participant(puuid="p-faker", championName=c, win=w)],
                   gameEndTimestamp=1700000000000 + i * 1000)
        for i, (c, w) in enumerate(
            [("Ahri", True), ("Ahri", False), ("Zed", True)]
        )
    ]
    empty = spark.createDataFrame([], MATCHES_RAW)

    # tick 1: matches 0,1 arrive
    b1 = ml.ingest_dedup(spark.createDataFrame(m[:2], MATCHES_RAW), empty)
    stored = b1
    # tick 2: match 1 replays alongside the new match 2
    b2 = ml.ingest_dedup(
        spark.createDataFrame([m[1], m[2]], MATCHES_RAW), stored
    )
    assert sorted(r.matchId for r in b2.collect()) == ["M2"]  # replay gone
    stored = stored.unionByName(b2)

    silver = ml.retention_trim(
        ml.silver_from_bronze(stored, summoners), "game_timestamp", keep=200
    )
    gold = {
        (r.puuid, r.champion): (r.games, r.wins)
        for r in ml.gold_from_silver(silver).collect()
    }
    # from-scratch run over all three matches gives the same totals —
    # replay-idempotence end to end
    scratch = ml.gold_from_silver(
        ml.silver_from_bronze(
            spark.createDataFrame(m, MATCHES_RAW), summoners
        )
    )
    assert gold == {
        (r.puuid, r.champion): (r.games, r.wins)
        for r in scratch.collect()
    }
    assert gold[("p-faker", "Ahri")] == (2, 1)
    assert gold[("p-faker", "Zed")] == (1, 1)


def test_snapshot_diff_three_ops(spark):
    """insert / update / delete detected from one full-outer pass;
    unchanged rows emit nothing."""
    from baronbatch_etl_spark.pipeline.medallion import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    rows = {
        r.k: (r.op, r.s, r.v)
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["s", "v"]
        ).collect()
    }
    assert rows == {
        2: ("update", "B", 20.0),
        3: ("delete", None, None),
        4: ("insert", "d", 40.0),
    }


def test_snapshot_diff_null_safe_compare(spark):
    """NULL→value and value→NULL are real updates (null-safe <=>),
    NULL→NULL is unchanged."""
    from baronbatch_etl_spark.pipeline.medallion import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, 1.0), (2, "x", None), (3, None, None)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "now", 1.0), (2, "x", 2.0), (3, None, None)],
        "k long, s string, v double",
    )
    got = snapshot_diff(
        old, new, keys=["k"], compare_cols=["s", "v"]
    ).collect()
    assert {r.k: r.op for r in got} == {1: "update", 2: "update"}


def test_apply_changelog_roundtrip(spark, sf_dir):
    """apply(old, diff(old, new)) == new — the CDC pair is a lossless
    transport, checked on the real fixture-derived snapshots."""
    from pyspark.sql import functions as F

    from baronbatch_etl_spark.io import load_table
    from baronbatch_etl_spark.pipeline.medallion import (
        apply_changelog,
        snapshot_diff,
    )

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    keys, cols = ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    log = snapshot_diff(old, new, keys=keys, compare_cols=cols)
    rebuilt = apply_changelog(old, log, keys=keys, compare_cols=cols)
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_apply_changelog_units(spark):
    from baronbatch_etl_spark.pipeline.medallion import apply_changelog

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
    )
    log = spark.createDataFrame(
        [("delete", 1, None), ("update", 2, "B"), ("insert", 4, "d")],
        "op string, k long, s string",
    )
    got = {
        r.k: r.s
        for r in apply_changelog(
            base, log, keys=["k"], compare_cols=["s"]
        ).collect()
    }
    assert got == {2: "B", 3: "c", 4: "d"}
