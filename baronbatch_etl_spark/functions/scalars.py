"""Scalar function catalog — SURVEY §2.8 F1–F21 as column expressions.

Everything is a built-in ``pyspark.sql.functions`` composition
(JVM-side, whole-stage-codegen'd) except NFKC normalization (F4),
which has no stable built-in and ships as an Arrow-vectorized pandas
UDF — the single genuine UDF the reference semantics require
(transformer_loader/main.py:62-73).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


# --- F1: split "Name#Tag" → (game_name, tag) ------------------------------
# Reference: full_name.split("#") — api_service/main.py:123-126.
def split_name_tag(name: ColumnOrName) -> tuple[Column, Column]:
    parts = F.split(_col(name), "#")
    game_name = F.element_at(parts, 1)
    tag = F.when(F.size(parts) > 1, F.element_at(parts, -1)).otherwise(F.lit(""))
    return game_name, tag


# --- F2: concat with separator, tag optional ------------------------------
# Reference: f"{name}#{tag}" if tag else name — transformer_loader/main.py:46.
def full_riot_id(name: ColumnOrName, tag: ColumnOrName) -> Column:
    name_c, tag_c = _col(name), _col(tag)
    return F.when(
        tag_c.isNotNull() & (tag_c != ""), F.concat_ws("#", name_c, tag_c)
    ).otherwise(name_c)


# --- F4: NFKC fold — the one true UDF -------------------------------------
# Byte-exact twin of the reference norm():
# `unicodedata.normalize('NFKC', s).lower().strip() if s else ""` —
# transformer_loader/main.py:62-73. lower(), not casefold() (they
# differ on ß/ſ); strip() only (internal whitespace preserved); falsy
# input → "" exactly like the reference.
@F.pandas_udf(T.StringType())
def norm_nfkc(s: pd.Series) -> pd.Series:
    import unicodedata

    def _norm(x: str | None) -> str:
        if not x:
            return ""
        return unicodedata.normalize("NFKC", x).lower().strip()

    return s.map(_norm)


# --- F11: engine-portable rounding ------------------------------------------
# Spark's round() rounds the shortest-decimal repr HALF_UP while DuckDB
# rounds the binary double — they disagree on exact-half values (e.g.
# 274818.35/2). floor(x*10^s + 0.5)/10^s is pure double arithmetic, so
# any engine computes the identical bits. Used for every rounded metric
# that feeds an oracle comparison; `sql_round` emits the DuckDB twin.
def round_half_up(c: ColumnOrName, scale: int = 2) -> Column:
    p = float(10**scale)
    return F.floor(_col(c) * p + F.lit(0.5)) / F.lit(p)


def sql_round(expr: str, scale: int = 2) -> str:
    p = float(10**scale)
    return f"floor(({expr}) * {p} + 0.5) / {p}"


# --- F8: coalesce chain ----------------------------------------------------
def coalesce_chain(*cols: ColumnOrName, default: object | None = None) -> Column:
    exprs = [_col(c) for c in cols]
    if default is not None:
        exprs.append(F.lit(default))
    return F.coalesce(*exprs)


# --- F9: safe-div KDA: (kills+assists)/max(1,deaths) -----------------------
# Reference: transformer_loader/main.py:152-153 (rounded 2dp at :168, F11).
def safe_div_kda(
    kills: ColumnOrName, deaths: ColumnOrName, assists: ColumnOrName, scale: int = 2
) -> Column:
    k, d, a = _col(kills), _col(deaths), _col(assists)
    return round_half_up((k + a) / F.greatest(F.lit(1), d), scale)


# --- F10: CS/min with zero-duration guard ----------------------------------
# Reference: cs/(duration/60) if duration>0 else 0.0 —
# transformer_loader/main.py:155-156 (rounded 1dp, F11).
def cs_per_min(cs: ColumnOrName, duration_s: ColumnOrName, scale: int = 1) -> Column:
    c, d = _col(cs), _col(duration_s)
    return F.when(d > 0, round_half_up(c / (d / F.lit(60.0)), scale)).otherwise(
        F.lit(0.0)
    )


# --- F12: boolean → 1/0 -----------------------------------------------------
def cond_flag(pred: Column) -> Column:
    return F.when(pred, F.lit(1)).otherwise(F.lit(0))


# --- F13: epoch-ms → 'dd/MM' -------------------------------------------------
# Reference: datetime.fromtimestamp(ts/1000).strftime('%d/%m') —
# dashboard/app.py:498-499 (engine pins UTC instead of server-local time).
def epoch_ms_to_ddmm(ts_ms: ColumnOrName) -> Column:
    return F.date_format(F.timestamp_millis(_col(ts_ms)), "dd/MM")


# --- F16: fixed-length item array with 0 defaults ---------------------------
# Reference: [p.get(f"item{i}", 0) for i in range(7)] —
# transformer_loader/main.py:40.
def build_items_array(prefix: str = "item", n: int = 7) -> Column:
    return F.array(*[F.coalesce(F.col(f"{prefix}{i}"), F.lit(0)) for i in range(n)])


# --- F17: drop empty slots (id 0) via higher-order filter --------------------
# Reference: [it for it in items if it] — dashboard/app.py:493.
def drop_empty_items(items: ColumnOrName) -> Column:
    return F.filter(_col(items), lambda x: x != 0)


# --- F18: map lookup with computed default -----------------------------------
# Reference: queues.get(qid, f"Queue {qid}") — dashboard/app.py:191-196.
def map_lookup_with_default(
    key: ColumnOrName, mapping: Sequence[tuple[object, object]], default: Column
) -> Column:
    kv: list[Column] = []
    for k, v in mapping:
        kv.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.create_map(*kv)[_col(key)], default)
