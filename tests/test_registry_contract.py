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
    assert len(qs) >= 398, len(qs)


def test_no_raw_float_reduce_over_log_terms():
    """Greppable invariant (round-6 verdict ask #5): ln-valued floats
    never enter a float ``F.avg``/``F.sum`` (or SQL ``avg``/``sum``) —
    they quantize to integer micro-nats first (the
    ``ngram_entropy_rate`` idiom), so every oracle-checked reduce over
    transcendental terms is an associative integer sum."""
    import pathlib
    import re

    plans = (
        pathlib.Path(__file__).resolve().parent.parent
        / "couchwarehouse_spark"
        / "plans"
    )
    patterns = [
        # Spark side: a log expression directly inside a float reduce.
        r"F\.(avg|sum)\(\s*-?\s*F\.log",
        # (paren-free gap: a quantizing F.round(...) wrapper between the
        # reduce and the product is exactly what makes it legal)
        r"F\.(avg|sum)\(\s*[\w.\"']{1,40}\s*\*\s*F\.log",
        # Oracle side: ln directly inside avg/sum without the
        # round(...)::BIGINT quantization wrapper.
        r"\b(avg|sum)\(\s*-?\s*ln\(",
    ]
    offenders = []
    for path in sorted(plans.glob("*.py")):
        flat = re.sub(r"\s+", " ", path.read_text())
        for pat in patterns:
            if re.search(pat, flat):
                offenders.append((path.name, pat))
    assert not offenders, offenders
