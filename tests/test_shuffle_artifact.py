"""The committed shuffle-receipt artifact must cover the whole registry.

r8 VERDICT next-round #3: SHUFFLE.json covered 60/173 queries — partial
receipts can't catch a shuffle-shape regression in the uncovered tail
before it costs a cluster. This is BENCH.json's drift-guard twin
(test_bench_artifact.py): every queries() entry has a byte-receipt row,
no stale keys linger, and every row carries the full metric set (an
"error" row must not be committed — re-run the sweep for that query).

Reads the COMMITTED artifact via `git show HEAD:SHUFFLE.json` so a
working-tree refresh-in-progress can't fail the suite."""

from __future__ import annotations

import json
import os
import subprocess

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = {
    "n_stages",
    "input_bytes",
    "shuffle_read_bytes",
    "shuffle_write_bytes",
    "peak_stage_shuffle_write",
}


def _load_artifact() -> dict:
    try:
        blob = subprocess.run(
            ["git", "show", "HEAD:SHUFFLE.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout
        return json.loads(blob)
    except (subprocess.SubprocessError, OSError, json.JSONDecodeError):
        with open(os.path.join(REPO, "SHUFFLE.json")) as f:
            return json.load(f)


def test_shuffle_receipts_cover_every_query():
    art = _load_artifact()
    recorded = set(art["queries"])
    registered = set(entry.queries())
    assert registered == recorded, (
        f"SHUFFLE.json drift: missing={sorted(registered - recorded)} "
        f"stale={sorted(recorded - registered)} — run `python "
        f"tools/shuffle_audit.py --merge SHUFFLE.json /root/testdata/sf0.1 "
        f"<names>` and commit"
    )


def test_shuffle_receipts_are_complete_rows():
    art = _load_artifact()
    bad = {
        k: sorted(set(v) ^ METRICS)
        for k, v in art["queries"].items()
        if set(v) != METRICS
    }
    assert not bad, f"incomplete/error shuffle rows committed: {bad}"
