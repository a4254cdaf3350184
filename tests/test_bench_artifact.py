"""The committed bench artifact must cover the whole query surface.

r7 VERDICT "what's wrong" #1: BENCH.json drifted three queries behind
queries() (fd_discovery, hits_scores, neyman_allocation were benched in
r6, then dropped by the r7 re-records) because nothing asserted the two
stay in lockstep — the exact failure mode test_oracle_artifact.py
already pins for ORACLE_LOCAL.json. This is its BENCH twin: every entry
in queries() has a recorded steady-state timing, no stale keys linger,
and every recorded number is a positive float (the SIGTERM partial-emit
path writes None for a query that never finished — that must not be
committed)."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH.json",
)


def test_bench_covers_every_query():
    with open(ARTIFACT) as f:
        art = json.load(f)
    recorded = set(art["queries"])
    registered = set(entry.queries())
    assert registered == recorded, (
        f"BENCH.json drift: missing={sorted(registered - recorded)} "
        f"stale={sorted(recorded - registered)} — re-run "
        f"`python bench.py --single <name>` for each and splice the rows"
    )
    bad = {
        k: v
        for k, v in art["queries"].items()
        if not isinstance(v, (int, float)) or not v > 0
    }
    assert not bad, f"non-numeric/unfinished bench entries committed: {bad}"


def test_bench_total_is_sum_of_rows():
    with open(ARTIFACT) as f:
        art = json.load(f)
    total = sum(art["queries"].values())
    assert abs(total - art["value"]) < 0.5, (
        f"BENCH.json value {art['value']} != sum of per-query rows "
        f"{total:.4f} — splice updates must adjust the total too"
    )
