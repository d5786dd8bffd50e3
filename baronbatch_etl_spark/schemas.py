"""Declared schemas for the reference data model (SURVEY §1, FIXTURES.md §A).

The reference is schema-on-read everywhere (Mongo documents, every
access a ``dict.get(..., default)``). The engine inverts that: the
bronze raw zone keeps a permissive nested struct, silver/gold get
declared ``StructType`` schemas, and the ``.get()`` defaults become
nullable columns + ``coalesce`` at transform time (SURVEY §1.3).

Field sets are exactly those the reference reads/writes:
  summoners          — api_service/main.py:146-151, extractor/main.py:221-252
  matches_raw        — extractor/main.py:422-428 (unique matchId :513)
  matches_clean      — transformer_loader/main.py:159-177
  aggregated_stats   — transformer_loader/main.py:184-190
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


SUMMONERS = T.StructType(
    [
        _f("puuid", T.StringType(), False),
        _f("summonerName", T.StringType()),
        _f("region", T.StringType()),
        _f("platform", T.StringType()),
        _f("summonerLevel", T.IntegerType()),
        _f("profileIconId", T.IntegerType()),
        _f("encryptedSummonerId", T.StringType()),
        _f("solo_tier", T.StringType()),
        _f("solo_rank", T.StringType()),
        _f("solo_lp", T.IntegerType()),
        _f("solo_wins", T.IntegerType()),
        _f("solo_losses", T.IntegerType()),
        _f("last_rank_update", T.TimestampType()),
    ]
)

PARTICIPANT = T.StructType(
    [
        _f("puuid", T.StringType()),
        _f("teamId", T.IntegerType()),
        _f("championName", T.StringType()),
        _f("riotIdGameName", T.StringType()),
        _f("riotIdTagLine", T.StringType()),
        _f("summonerName", T.StringType()),
        _f("win", T.BooleanType()),
        _f("kills", T.IntegerType()),
        _f("deaths", T.IntegerType()),
        _f("assists", T.IntegerType()),
        _f("totalDamageDealtToChampions", T.IntegerType()),
        _f("goldEarned", T.IntegerType()),
        _f("totalMinionsKilled", T.IntegerType()),
        _f("neutralMinionsKilled", T.IntegerType()),
    ]
    + [_f(f"item{i}", T.IntegerType()) for i in range(7)]
)

MATCH_INFO = T.StructType(
    [
        _f("queueId", T.IntegerType()),
        _f("gameDuration", T.LongType()),
        _f("gameCreation", T.LongType()),  # epoch ms
        _f("gameEndTimestamp", T.LongType()),  # epoch ms
        _f("participants", T.ArrayType(PARTICIPANT)),
    ]
)

MATCHES_RAW = T.StructType(
    [
        _f("matchId", T.StringType(), False),
        _f("puuid", T.StringType(), False),
        _f("raw", T.StructType([_f("info", MATCH_INFO)])),
        _f("processed", T.BooleanType()),
        _f("timestamp", T.TimestampType()),
    ]
)

CLEAN_PARTICIPANT = T.StructType(
    [
        _f("champion", T.StringType()),
        _f("summonerName", T.StringType()),
        _f("teamId", T.IntegerType()),
        _f("win", T.BooleanType()),
        _f("kills", T.IntegerType()),
        _f("deaths", T.IntegerType()),
        _f("assists", T.IntegerType()),
        _f("total_damage", T.IntegerType()),
        _f("items", T.ArrayType(T.IntegerType())),
    ]
)

MATCHES_CLEAN = T.StructType(
    [
        _f("matchId", T.StringType(), False),
        _f("puuid", T.StringType(), False),
        _f("queue_id", T.IntegerType()),
        _f("champion", T.StringType()),
        _f("win", T.BooleanType()),
        _f("kills", T.IntegerType()),
        _f("deaths", T.IntegerType()),
        _f("assists", T.IntegerType()),
        _f("kda", T.DoubleType()),
        _f("cs", T.IntegerType()),
        _f("cs_min", T.DoubleType()),
        _f("total_damage", T.IntegerType()),
        _f("gold_earned", T.IntegerType()),
        _f("items", T.ArrayType(T.IntegerType())),
        _f("game_timestamp", T.LongType()),  # epoch ms
        _f("participants", T.ArrayType(CLEAN_PARTICIPANT)),
        _f("processed_at", T.TimestampType()),
    ]
)

AGGREGATED_STATS = T.StructType(
    [
        _f("puuid", T.StringType(), False),
        _f("champion", T.StringType(), False),
        _f("games", T.LongType()),
        _f("wins", T.LongType()),
        _f("kda_sum", T.DoubleType()),
    ]
)
