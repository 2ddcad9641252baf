#!/usr/bin/env python3
"""Driver-vs-session bench drift table (BASELINE.md close rule #2,
made mechanical).

Usage:
    tools/bench_drift.py BENCH_r12.json /tmp/bench_session.out [--all]

Arg 1: a driver artifact ({"n":..,"rc":..,"tail":"..."}) whose tail
carries the compact per-query line Bench prints last
({"queries_cs":{...}} integer centiseconds, or queries_ds deciseconds).
Arg 2: a file containing a session Bench stdout (the
{"metric":"total",...,"queries":{...}} line, seconds; the compact line
also works). Either arg may be either shape — shapes are sniffed.

Prints a markdown table of every query whose driver/session ratio
falls outside [0.5, 2.0] (close rule #2's adjudication bar), plus the
common-set totals. --all prints every query.
"""
import json
import re
import sys


def _last_compact(text):
    """Last {"queries_cs":{...}} / {"queries_ds":{...}} object -> secs."""
    hits = list(re.finditer(r'\{"queries_(cs|ds)":\{([^}]*)\}\}', text))
    if not hits:
        return None
    unit, body = hits[-1].group(1), hits[-1].group(2)
    div = 100.0 if unit == "cs" else 10.0
    out = {}
    for m in re.finditer(r'"([^"]+)":(-?\d+)', body):
        out[m.group(1)] = int(m.group(2)) / div
    return out


def _full_line(text):
    """The {"metric":"total",...,"queries":{...}} line -> secs."""
    m = re.search(r'"queries":\{(.*?)\}', text)
    if not m:
        return None
    out = {}
    for kv in re.finditer(r'"([^"]+)":(-?\d+(?:\.\d+)?(?:E-?\d+)?)',
                          m.group(1)):
        out[kv.group(1)] = float(kv.group(2))
    return out


def load(path):
    with open(path) as f:
        text = f.read()
    # driver artifact? pull the tail out first so the compact line in
    # it (escaped) is what gets parsed
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except (json.JSONDecodeError, ValueError):
        pass
    q = _last_compact(text) or _full_line(text)
    if not q:
        sys.exit(f"no per-query timings found in {path}")
    # normalize to the short enumeration key ("x10_tfidf_top" -> "x10")
    return {k.split("_")[0]: v for k, v in q.items()}


def main():
    args = [a for a in sys.argv[1:] if a != "--all"]
    show_all = "--all" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    driver, session = load(args[0]), load(args[1])
    common = sorted(set(driver) & set(session))
    only_d = sorted(set(driver) - set(session))
    only_s = sorted(set(session) - set(driver))
    rows = []
    for k in common:
        d, s = driver[k], session[k]
        if d < 0 or s < 0:
            rows.append((float("inf"), k, d, s))  # DNF on either side
        elif s == 0:
            # sub-resolution session time against a real driver time is
            # the LARGEST possible drift — flag it, don't drop it
            rows.append((float("inf") if d > 0 else 1.0, k, d, s))
        else:
            rows.append((d / s, k, d, s))
    flagged = [r for r in rows
               if show_all or r[0] > 2.0 or r[0] < 0.5]
    flagged.sort(key=lambda r: -r[0])
    print("| query | driver s | session s | ratio |")
    print("|---|---|---|---|")
    for ratio, k, d, s in flagged:
        if d < 0 or s < 0:
            rs = "DNF"
        elif ratio == float("inf"):
            rs = "inf"
        else:
            rs = f"{ratio:.2f}×"
        print(f"| {k} | {d:.2f} | {s:.2f} | {rs} |")
    if not flagged:
        print("| (none outside [0.5×, 2×]) | | | |")
    dsum = sum(driver[k] for k in common if driver[k] >= 0)
    ssum = sum(session[k] for k in common if session[k] >= 0)
    ratio = f"{dsum / ssum:.2f}x" if ssum > 0 else "n/a (session sum 0)"
    print(f"\ncommon set: {len(common)} queries, driver {dsum:.1f} s, "
          f"session {ssum:.1f} s, ratio {ratio}; "
          f"{len(flagged)} outside [0.5x, 2x]")
    if only_d or only_s:
        print(f"driver-only: {', '.join(only_d) or '-'}; "
              f"session-only: {', '.join(only_s) or '-'}")


if __name__ == "__main__":
    main()
