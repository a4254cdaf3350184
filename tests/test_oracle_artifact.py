"""The committed oracle-gate artifact must cover the whole query surface.

r5 ADVICE: ORACLE_LOCAL.json drifted one query behind queries() because
nothing asserted the two stay in lockstep. This pins it: every entry in
queries() appears in the committed artifact, every recorded run was ok,
and every query has either a DuckDB oracle or a documented rows-only
waiver (currently none)."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ORACLE_LOCAL.json",
)


def test_oracle_local_covers_every_query():
    with open(ARTIFACT) as f:
        art = json.load(f)
    recorded = set(art["results"])
    registered = set(entry.queries())
    assert registered == recorded, (
        f"ORACLE_LOCAL.json drift: missing={sorted(registered - recorded)} "
        f"stale={sorted(recorded - registered)} — re-run "
        f"tools/oracle_check.py /root/testdata/sf0.01 --out ORACLE_LOCAL.json"
    )
    bad = {k: v for k, v in art["results"].items() if v.get("status") != "ok"}
    assert not bad, f"non-ok artifact entries: {bad}"


def test_every_query_is_hash_gated():
    # bpe_tokenizer was the last rows-only entry; r6 closed it — keep the
    # surface fully hash-gated from here on (add explicit waivers here if
    # a future query is genuinely non-SQL-expressible)
    waivers: set[str] = set()
    missing = set(entry.queries()) - set(entry.oracle_sql()) - waivers
    assert not missing, f"queries without a DuckDB oracle: {sorted(missing)}"
