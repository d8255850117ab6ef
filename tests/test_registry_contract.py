"""Driver-contract regression guards: the 50-entry evaluation window
must keep covering every SURVEY.md §2 family, every entry must carry
an oracle, and names must resolve."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_priority_window_is_exactly_50_and_resolves():
    qs = entry_mod.queries()
    assert len(entry_mod.PRIORITY) == 50
    missing = [n for n in entry_mod.PRIORITY if n not in qs]
    assert not missing, f"PRIORITY names missing from registry: {missing}"
    assert list(qs)[:50] == entry_mod.PRIORITY


def test_window_covers_every_family():
    qs = entry_mod.queries()
    window = list(qs)[:50]
    families = {
        name: qs[name].__wrapped__.__module__.rsplit(".", 1)[-1]
        if hasattr(qs[name], "__wrapped__")
        else qs[name].__module__.rsplit(".", 1)[-1]
        for name in window
    }
    covered = set(families.values())
    expected = {
        "etl", "warehouse_e2e", "events_windows", "dedup", "similarity",
        "text", "curation", "sampling", "scalar", "statistics",
        "skew_plan", "multimodal_plan", "relational", "relational_extra",
    }
    assert expected <= covered, f"families missing from window: {expected - covered}"


def test_every_entry_is_oracle_backed():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) == set(osql), sorted(set(qs) - set(osql))
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    # Registry floor: entries may only be added, never silently lost.
    # Raise the floor when new operators land.
    assert len(qs) >= 231, len(qs)
