"""Pure-function tests for the measurement harness logic: bench child
output parsing and the scale gate's flagging rules. No Spark needed —
these pin the noise-discipline semantics the r7/r8 verdicts hardened
(JSON-noise tolerance, null-headline children, denominator flags,
noise floors)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import parse_child_stdout  # noqa: E402
from tools.scale_gate import diff  # noqa: E402

# ---------------------------------------------------------------------------
# bench.parse_child_stdout
# ---------------------------------------------------------------------------


def test_parse_child_happy_path():
    out = "\n".join(
        [
            json.dumps({"queries_detail": {"q1": 1.5, "q2": 0.3}}),
            json.dumps(
                {"metric": "catalog_total_runtime", "headline_runtime": 12.3,
                 "canary_s": 0.87}
            ),
        ]
    )
    detail, headline, canary, meta = parse_child_stdout(out)
    assert detail == {"q1": 1.5, "q2": 0.3}
    assert headline == 12.3
    assert canary == 0.87
    assert meta == {}


def test_parse_child_tolerates_brace_noise():
    # JVM/Ivy/log lines that START with a brace but aren't JSON must
    # not abort the protocol (the r7 advice item)
    out = "\n".join(
        [
            "{{channel log: something",
            "{not json at all",
            json.dumps({"queries_detail": {"q1": 2.0}}),
            "{ another stray",
            json.dumps({"metric": "x", "headline_runtime": 5.0,
                        "canary_s": 1.2}),
        ]
    )
    detail, headline, canary, _ = parse_child_stdout(out)
    assert detail == {"q1": 2.0}
    assert headline == 5.0
    assert canary == 1.2


def test_parse_child_partial_child_yields_none_headline():
    # a crashed-late child emits a summary with headline_runtime null;
    # the orchestrator must see None, not 0.0 (the r7 advice item)
    out = json.dumps(
        {"metric": "x", "headline_runtime": None,
         "headline_missing": ["q9"]}
    )
    detail, headline, canary, _ = parse_child_stdout(out)
    assert detail == {}
    assert headline is None
    assert canary is None


def test_parse_child_empty_stdout():
    assert parse_child_stdout("") == ({}, None, None, {})


def test_parse_child_meta_stamps():
    # r11 (r10 verdict #1): the child's self-evidencing stamps —
    # fixture staging cost, effective master, defaultParallelism —
    # must survive into the orchestrator's merge
    out = json.dumps(
        {"metric": "x", "headline_runtime": 3.0, "canary_s": 0.9,
         "fixtures": {"doc_signatures": 6.8},
         "master": "local[32]", "default_parallelism": 32}
    )
    _, _, _, meta = parse_child_stdout(out)
    assert meta == {
        "fixtures": {"doc_signatures": 6.8},
        "master": "local[32]",
        "default_parallelism": 32,
    }


# ---------------------------------------------------------------------------
# bench.run_headline (the r8 chunked-run orchestrator computes the
# per-run headline itself — chunk children only ever see a slice)
# ---------------------------------------------------------------------------


def test_run_headline_complete_run_sums_frozen_set():
    from bench import HEADLINE, run_headline

    detail = {n: 0.5 for n in HEADLINE}
    detail["not_headline_q"] = 99.0  # must not leak into the sum
    assert run_headline(detail) == round(0.5 * len(HEADLINE), 3)


def test_run_headline_partial_run_yields_none():
    # a run whose chunks lost a HEADLINE member must not produce a
    # lower (better-looking) headline — same rule as _summarize
    from bench import HEADLINE, run_headline

    detail = {n: 0.5 for n in list(HEADLINE)[:-1]}
    assert run_headline(detail) is None


def test_run_headline_empty_run():
    from bench import run_headline

    assert run_headline({}) is None


# ---------------------------------------------------------------------------
# scale_gate.diff
# ---------------------------------------------------------------------------


def _row(sf01: float, sf1: float) -> dict:
    return {"sf0.1": sf01, "sf1": sf1, "ratio": round(sf1 / sf01, 2)}


def test_diff_flags_true_regression():
    prior = {"q": _row(1.0, 2.0)}  # ratio 2.0
    new = {"q": _row(1.0, 4.0)}  # ratio 4.0 — worsened 2x, sf1 up
    flags = diff(new, prior, factor=1.5, min_sf1_s=0.5)
    assert len(flags) == 1 and flags[0].startswith("q:")


def test_diff_denominator_artifact_never_flags():
    # sf0.1 improved 4x, sf1 IMPROVED too — ratio rose 2.7x but this
    # is definitionally not a scale regression (the r8 rule)
    prior = {"q": _row(2.0, 3.0)}  # ratio 1.5
    new = {"q": _row(0.5, 2.0)}  # ratio 4.0, sf1 3.0 -> 2.0
    assert diff(new, prior, factor=1.5, min_sf1_s=0.5) == []


def test_diff_noise_floor_guards_both_sides():
    # sub-floor sf1 on EITHER reading -> never flagged
    prior = {"a": _row(0.01, 0.1), "b": _row(1.0, 2.0)}
    new = {"a": _row(0.01, 0.45), "b": _row(1.0, 0.4)}
    assert diff(new, prior, factor=1.5, min_sf1_s=0.5) == []


def test_diff_unknown_query_not_flagged():
    # a newly-registered query has no prior entry -> no flag
    assert diff({"new_q": _row(1.0, 9.0)}, {}, 1.5, 0.5) == []


def test_diff_within_factor_not_flagged():
    prior = {"q": _row(1.0, 2.0)}  # ratio 2.0
    new = {"q": _row(1.0, 2.8)}  # ratio 2.8 — 1.4x, under 1.5x
    assert diff(new, prior, factor=1.5, min_sf1_s=0.5) == []
