"""The committed bench artifact must cover the whole query surface.

r7 VERDICT "what's wrong" #1: BENCH.json drifted three queries behind
queries() (fd_discovery, hits_scores, neyman_allocation were benched in
r6, then dropped by the r7 re-records) because nothing asserted the two
stay in lockstep — the exact failure mode test_oracle_artifact.py
already pins for ORACLE_LOCAL.json. This is its BENCH twin: every entry
in queries() has a recorded steady-state timing, no stale keys linger,
and every recorded number is a positive float (the SIGTERM partial-emit
path writes None for a query that never finished — that must not be
committed).

r9 (VERDICT r8 "what's wrong" #3): the guard reads the COMMITTED
artifact via `git show HEAD:BENCH.json`, not the working tree — the
driver's per-round bench overwrites the working-tree file with a
partial, which made the suite perpetually red in a dirty tree even
though the builder's committed artifact was complete. The commit is
the artifact of record; the working tree is the driver's scratch."""

from __future__ import annotations

import json
import os
import subprocess

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_artifact() -> dict:
    try:
        blob = subprocess.run(
            ["git", "show", "HEAD:BENCH.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout
        return json.loads(blob)
    except (subprocess.SubprocessError, OSError, json.JSONDecodeError):
        # not a git checkout (e.g. an exported tree): fall back to disk
        with open(os.path.join(REPO, "BENCH.json")) as f:
            return json.load(f)


def test_bench_covers_every_query():
    art = _load_artifact()
    recorded = set(art["queries"])
    registered = set(entry.queries())
    assert registered == recorded, (
        f"committed BENCH.json drift: missing={sorted(registered - recorded)} "
        f"stale={sorted(recorded - registered)} — re-run "
        f"`python bench.py --single <name>` for each, splice the rows, commit"
    )
    bad = {
        k: v
        for k, v in art["queries"].items()
        if not isinstance(v, (int, float)) or not v > 0
    }
    assert not bad, f"non-numeric/unfinished bench entries committed: {bad}"


def test_bench_variance_receipts():
    """r9 VERDICT ask 4: every bench row carries its steady-sample count
    and min/median spread so round-over-round deltas inside the noise
    band are dismissible without re-measuring. (Kept under a sibling
    "samples" key — the "queries" values stay plain numbers because the
    driver's contract is {"q": sec}.)"""
    art = _load_artifact()
    if "samples" not in art:
        import pytest

        pytest.skip("committed artifact predates the r10 samples protocol")
    missing = set(art["queries"]) - set(art["samples"])
    assert not missing, f"bench rows without variance receipts: {missing}"
    for name, s in art["samples"].items():
        assert set(s) >= {"n", "med", "spread"}, (name, s)
        if s["n"] > 0:
            assert s["med"] is not None and s["spread"] >= 0, (name, s)


def test_bench_total_is_sum_of_rows():
    art = _load_artifact()
    total = sum(art["queries"].values())
    assert abs(total - art["value"]) < 0.5, (
        f"committed BENCH.json value {art['value']} != sum of per-query rows "
        f"{total:.4f} — splice updates must adjust the total too"
    )
