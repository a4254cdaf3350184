"""The driver-gate window must be explicit and stable.

r8 advice: the r8 registry interleave silently changed which queries
fall inside the driver's first-50 CORRECTNESS window — long-standing
queries dropped out of gate coverage, new ones moved in, and nothing in
the code recorded the swap. __spark_entry__.GATED is the explicit pin;
these tests make the registry's head and the pin move only together
(i.e. a reorder is a reviewable diff on the GATED literal, never a
silent side effect)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_gate_window_matches_registry_head():
    head = list(entry.queries())[:50]
    assert head == entry.GATED, (
        "queries()[:50] drifted from the GATED pin — a registry reorder "
        "changed the driver-gate scope. If intentional, update GATED in "
        "the same commit (keeping >= 15 operator families represented): "
        f"swapped_in={sorted(set(head) - set(entry.GATED))} "
        f"swapped_out={sorted(set(entry.GATED) - set(head))}"
    )


def test_gate_window_is_50_unique_registered_queries():
    assert len(entry.GATED) == 50
    assert len(set(entry.GATED)) == 50
    registered = set(entry.queries())
    missing = [n for n in entry.GATED if n not in registered]
    assert not missing, f"GATED names not in queries(): {missing}"


def test_gated_queries_all_have_value_oracles():
    """Every gate-window query must carry a DuckDB oracle — the gate's
    value-hash compare is the whole point of the window; a rows-only
    entry inside it wastes a slot."""
    oracles = entry.oracle_sql()
    weak = [n for n in entry.GATED if n not in oracles]
    assert not weak, f"gate-window queries without value oracles: {weak}"
