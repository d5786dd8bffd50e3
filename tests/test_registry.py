"""Smoke tests: every registered query runs at sf0.001 and the
flagship produces a stable schema (the driver's t1 check)."""

from __future__ import annotations

import pytest

from baronbatch_etl_spark.queries import load_all

REGISTRY = load_all()


def test_flagship_runs_and_has_rows(spark, sf_dir):
    df = REGISTRY["flagship_player_stats"].fn(spark, sf_dir)
    assert df.columns == [
        "c_custkey",
        "c_name",
        "o_orderstatus",
        "games",
        "urgent",
        "total_spend",
        "avg_spend",
        "urgent_rate",
    ]
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    # schema resolves and the plan executes
    _ = df.schema
    _ = df.limit(5).collect()


def test_every_query_has_doc():
    for name, spec in REGISTRY.items():
        assert spec.doc, f"{name} lacks a docstring"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_output_is_scalar_only(spark, sf_dir, name):
    # value-hash canonicalizers sort every column with pandas and die
    # on array/map/struct cells — queries must serialize such columns
    # (cost round 1 a green row on a1_dup_finder)
    df = REGISTRY[name].fn(spark, sf_dir)
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        assert not any(k in t for k in ("array", "map", "struct")), (
            f"{name}.{f.name} is non-scalar ({t}); "
            "serialize it (array_join / posexplode)"
        )


def test_priority_window_rotates_stale_rows():
    # the external checker verifies ~the first 50 registry entries per
    # round, front to back. Round-6 invariant, derived from the actual
    # driver records: the two r5 hash-fails lead, every design-time
    # never-checked row holds a window slot, and no slot is wasted on
    # a row refreshed in the newest record.
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    last: dict[str, int] = {}
    # derive rounds from disk so a new CORRECTNESS_r0N.json re-derives
    # the staleness classification instead of silently aging out
    records = sorted(root.glob("CORRECTNESS_r*.json"))
    latest = len(records)
    for r, f in enumerate(records, start=1):
        for name, row in json.loads(f.read_text()).items():
            # a failed check is a reason to STAY in the window, not
            # freshness: keep the prior green round (or 0 if the row
            # has never been green — capture prev BEFORE overwriting,
            # the r6 advice bug)
            prev = last.get(name)
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
            ):
                last[name] = r
            else:
                last[name] = prev if prev else 0
    if not last:  # fresh clone without driver records — nothing to pin
        return
    names = list(REGISTRY)
    window = set(names[:50])
    # this window was designed against 7 rounds of records; strict
    # staleness classes only make sense at design time. Once a newer
    # record lands, flip to the outcome check: the rotation must have
    # actually refreshed the window's rows.
    if latest == 9:
        # r10 design invariants, PRE-WRITTEN during round 9 (same
        # decay fix as the r9 branch: write the next round's strict
        # check while designing its rotation). Arms on the marker:
        # the r9-parked overflow row leads. Projection from the first
        # 9 records, r9 all-green: stale-at-r6-or-older = s_pq_codes
        # (r5, parked at slot 51 in r9) + the 49 remaining r6 rows =
        # exactly 50, no overflow, and the class carries its own
        # Arrow exercisers (mm_pixel_ahash's pandas_udf PNG lane,
        # mm_feature_store's mapInPandas+pandas_udf composed store).
        # The r8-advice fix: a deviation no longer falls through to
        # the weak generic check — it fails with the rotation order.
        assert names[0] == "s_pq_codes", (
            "r10 rotation not applied (or deviated): the r9-parked "
            "overflow row s_pq_codes must lead the window, found "
            f"{names[0]!r}. Rotate _PRIORITY FIRST: s_pq_codes + the "
            "49 remaining r6-checked rows fill all 50 slots (no "
            "overflow). If a row went RED in r09, it re-enters the "
            "window and these invariants must be re-derived."
        )
        never = {n for n in REGISTRY if n not in last}
        assert never <= window, (
            f"never-checked rows outside window: {never - window}"
        )
        fresh_in_window = {n for n in window if last.get(n) == 9}
        assert not fresh_in_window, (
            f"r09-green rows holding window slots: {fresh_in_window}"
        )
        stale_out = {n for n, r in last.items() if r <= 6} - window
        assert not stale_out, (
            f"r6-or-older rows left unrotated: {stale_out} — if a row "
            "went RED in r09 these invariants must be re-derived"
        )
    elif latest == 8:
        # r9 design invariants, PRE-WRITTEN during round 8. The r8
        # advice: when the records say round 9 but the trio does NOT
        # lead, fail with the expected order instead of silently
        # degrading to the generic refreshed>=25 outcome check.
        assert names[:3] == [
            "a7_table_counts",
            "f_url_encode",
            "h_small_qty_revenue",
        ], (
            "r9 rotation not applied (or deviated): the r8-parked trio "
            f"must lead the window, found {names[:3]!r}. Rotate "
            "_PRIORITY FIRST (trio + mm_features + 46 of the 47 r5 "
            "rows; one r5 row parks at slot 51). If a row went RED in "
            "r08 these invariants must be re-derived."
        )
        # Projection from the first 8 records, r8 all-green:
        # stale-at-r5-or-older = 3 parked r4 rows + the 47-row r5
        # class = exactly 50; but that set holds no Arrow exerciser,
        # so the rotation must seat mm_features (r6-green, the
        # stalest exerciser) and park exactly one r5 row at slot 51.
        never = {n for n in REGISTRY if n not in last}
        assert never <= window, (
            f"never-checked rows outside window: {never - window}"
        )
        fresh_in_window = {n for n in window if last.get(n) == 8}
        assert not fresh_in_window, (
            f"r08-green rows holding window slots: {fresh_in_window}"
        )
        stale_out = {n for n, r in last.items() if r <= 5} - window
        assert len(stale_out) <= 1, (
            "more than one r5-or-older row left unrotated "
            f"({stale_out}) — if a row went RED in r08, it re-enters "
            "the window and these invariants must be re-derived"
        )
        assert stale_out <= set(names[50:51]), (
            f"parked overflow {stale_out} must lead the r10 window "
            f"(slot 51), found {names[50]!r} there"
        )
    elif latest == 7:
        # never-checked rows must hold window slots so they get their
        # first driver row this round (there are none today — the
        # assertion guards future registrations)
        never = {n for n in REGISTRY if n not in last}
        missing = never - window
        assert not missing, f"never-checked rows outside window: {missing}"
        # the parked quartet (r3-green, the stalest rows on the board)
        # leads the window — the r7 verdict's top item
        assert names[:4] == [
            "set_intersect",
            "w_running_sum",
            "d_dedup_report",
            "s_dim_stats",
        ]
        # no slot wasted on a row the driver just refreshed
        fresh_in_window = {n for n in window if last.get(n) == 7}
        assert not fresh_in_window, (
            f"r07-green rows holding window slots: {fresh_in_window}"
        )
        # three r4-green rows overflow the window (53 stale candidates,
        # 50 slots); they park at 51-53 so they lead the r9 window, and
        # each is machinery-covered by an in-window relative (see the
        # _PRIORITY comments)
        parked = {
            "a7_table_counts",
            "f_url_encode",
            "h_small_qty_revenue",
        }
        assert parked == set(names[50:53])
        # with this rotation every registry row is driver-checked
        # within the last 4 rounds except the parked overflow: every
        # r1-r4-stale row must be in-window or parked
        stale_out = {
            n for n, r in last.items() if r <= 4
        } - window - parked
        assert not stale_out, f"r1-r4-stale rows left unrotated: {stale_out}"
    else:
        newest = set(json.loads(records[-1].read_text()))
        refreshed = len(window & newest)
        assert refreshed >= 25, (
            f"rotation failed: only {refreshed} of the 50-slot window "
            f"appear in {records[-1].name} — re-rotate the registry "
            "order for the new round"
        )
    # the round-3 advice: keep the mapInPandas/Arrow-worker path
    # driver-checked every round. mm_features was its only catalog
    # exerciser through r6; t_cdc_chunks (flat-row mapInPandas),
    # p11_clean_projection, f_norm_concat and j2_staged_resolution
    # (norm_nfkc pandas UDF) carry it whenever mm_features rotates out.
    arrow_exercisers = {
        "mm_features",
        "t_cdc_chunks",
        "f_norm_concat",
        "j2_staged_resolution",
        "p11_clean_projection",
        # r9 additions (verified lanes): mm_pixel_ahash decodes the
        # synth PNG through two pandas_udfs (multimodal.py:569,680);
        # mm_feature_store composes mapInPandas feature extraction
        # with the pandas_udf aHash — the r10 window's exercisers.
        "mm_pixel_ahash",
        "mm_feature_store",
    }
    assert window & arrow_exercisers, (
        "no mapInPandas/Arrow-worker exerciser in the checker window"
    )


def test_checker_window_names_resolve():
    # a typo in the priority table silently drops a query from the
    # driver's ~50-slot checker window — fail loudly instead
    from baronbatch_etl_spark import queries as Q

    for n in Q._PRIORITY:
        assert n in REGISTRY, f"unknown name in priority table: {n}"
    assert len(set(Q._PRIORITY)) == len(Q._PRIORITY), "duplicate priority name"


def test_priority_is_exhaustive():
    # _PRIORITY claims to cover the whole registry; enforce it so the
    # claim can't drift as queries are added (a new registration that
    # is missing here would land at an uncontrolled tail position)
    from baronbatch_etl_spark import queries as Q

    assert set(Q._PRIORITY) == set(REGISTRY), (
        f"priority/registry drift: only_priority="
        f"{set(Q._PRIORITY) - set(REGISTRY)} "
        f"only_registry={set(REGISTRY) - set(Q._PRIORITY)}"
    )
