"""Regenerate BENCH_HISTORY.md from the per-round BENCH_r*.json
artifacts (r8 verdict #6): one row per round with total wall, entry
count, per-entry average, and the median round-over-round ratio on
the queries common to consecutive rounds' recorded maps — the early
drift alarm the builder checks BEFORE the driver bench runs.

Usage: python tools/bench_history.py [extra.json ...]
Extra files are builder-local full-map runs ({"queries": {...},
"value": N, "n_queries": N} or bench.py's "# full:" payload),
appended as provenance-labeled rows.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_round(path: str):
    d = json.load(open(path))
    p = d.get("parsed") or {}
    return {
        "label": os.path.basename(path).replace("BENCH_", "").replace(".json", ""),
        "total": p.get("value"),
        "n": p.get("n_queries") or len(p.get("queries") or {}),
        "queries": p.get("queries") or {},
        "provenance": "driver",
    }


def _load_extra(path: str):
    d = json.load(open(path))
    return {
        "label": os.path.basename(path).replace(".json", ""),
        "total": d.get("value") or d.get("total"),
        "n": d.get("n_queries") or len(d.get("queries") or {}),
        "queries": d.get("queries") or {},
        "provenance": "builder-local",
    }


def main() -> None:
    rows = [
        _load_round(p)
        for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    ]
    rows += [_load_extra(p) for p in sys.argv[1:]]
    lines = [
        "# Bench history (sf0.1, local[32])",
        "",
        "Per-round totals from the driver's `BENCH_r*.json` plus any",
        "builder-local full runs. `median vs prev` is the median",
        "per-query wall ratio over queries recorded in BOTH rows —",
        "a fleet-wide drift (host noise or a shared-path regression)",
        "moves this number; a single query's regression doesn't.",
        "Regenerate: `python tools/bench_history.py [local_run.json ...]`.",
        "",
        "| run | n | total (s) | s/entry | median vs prev | provenance |",
        "|---|---|---|---|---|---|",
    ]
    prev_q = None
    for r in rows:
        ratio = ""
        if prev_q and r["queries"]:
            common = set(prev_q) & set(r["queries"])
            if len(common) >= 5:
                ratio = f"{statistics.median(r['queries'][n] / prev_q[n] for n in common):.2f}× ({len(common)}q)"
        per = f"{r['total'] / r['n']:.2f}" if r["total"] and r["n"] else "—"
        total = f"{r['total']:.1f}" if r["total"] else "—"
        lines.append(
            f"| {r['label']} | {r['n'] or '—'} | {total} | {per} | {ratio or '—'} | {r['provenance']} |"
        )
        if r["queries"]:
            prev_q = r["queries"]
    lines += [
        "",
        "Notes:",
        "- r02/r03 rows recorded no parseable totals (stdout-truncation era).",
        "- r05 (2.29 s/entry) and r08 (1.61 s/entry) are transient host",
        "  spikes, not code regressions: round 9's bisect re-ran the full",
        "  suite at r8 HEAD and at r7 HEAD interleaved on the same host",
        "  and both came out at r7-era speed (median ratio 1.00 vs the r7",
        "  artifact; see README bench section for the numbers).",
        "- r10 driver adjudication (r10 verdict #2): on the 44 queries",
        "  named in both the r9 and r10 driver windows the median",
        "  per-query ratio is 1.07x — under the 1.2x threshold the r9",
        "  verdict set for treating drift as real, and consistent with",
        "  the builder's interleaved r10-vs-r9-HEAD A/B (median 0.92x).",
        "  Drift = host noise; the 655.1 s total reflects the window's",
        "  mix shift toward full-pipeline e2e entries (job-count-bound,",
        "  does not extrapolate with data volume). Standing rule: a",
        "  round landing >1.2x median vs prev on the overlap means",
        "  profile the shared scan path before adding operators.",
        "- bench_r10_full (builder-local, same code as the r10 driver",
        "  row) ran after a 27-min pytest on the same host; its",
        "  apparent 1.72x-vs-r9 was verified as host-state by the",
        "  interleaved A/B above BEFORE the driver number landed.",
        "- bench_r11_full (builder-local, end of round 11, 382 entries):",
        "  the 44-overlap median vs the r10 DRIVER row is 1.23x, which",
        "  was adjudicated the r9-mandated way BEFORE blaming code: an",
        "  interleaved best-of-2 A/B of tools/time_subset.py at r11",
        "  HEAD vs an r10-HEAD worktree over the six WORST apparent",
        "  offenders (semdedup_prune, duplicate_ngram_removal,",
        "  graph_pagerank_3iter, pricing_summary, hybrid_search_rrf,",
        "  event_debounce — all byte-identical code this round) gives",
        "  median 1.16x with SAME-CODE run-to-run swings of 1.2-1.3x on",
        "  this host (r10 HEAD against itself: 30.0s then 23.1s).",
        "  Verdict: host variance; the per-entry mean also carries the",
        "  r11 mix shift (+22 entries dominated by full streaming /",
        "  warehouse pipelines: concurrent_compact 30s, three interval",
        "  joins ~21s each — job-count-bound, not data-bound). The r11",
        "  DRIVER row remains the number to trust; standing rule: if IT",
        "  lands >1.2x median vs r10 on the overlap, profile the shared",
        "  scan path.",
        "- bench_r12_full (builder-local, end of round 12, 397 entries):",
        "  621.0 s total / 1.56 s-entry — 21% BELOW r11's 789.3 s with 15",
        "  MORE entries, zero errors; 44-overlap median vs the r11 DRIVER",
        "  row 0.96x, 382-overlap median vs bench_r11_full 0.93x — no",
        "  drift, and the r11-verdict-#2 tail cut landed as designed:",
        "  concurrent_compact 30.2 -> 11.8 s, the three interval joins",
        "  21.6/21.2/21.6 -> 5.5/4-ish/6.1 s, clone/compact/time-travel",
        "  all roughly halved (fewer trigger rounds + scoped stream/merge",
        "  shuffle partitions; every touched entry re-proven by hash at",
        "  sf0.01 AND sf0.1 before the bench ran).",
        "",
    ]
    out = os.path.join(REPO, "BENCH_HISTORY.md")
    open(out, "w").write("\n".join(lines))
    print(f"wrote {out} with {len(rows)} rows")


if __name__ == "__main__":
    main()
