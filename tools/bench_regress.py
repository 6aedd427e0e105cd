#!/usr/bin/env python3
"""Mechanical per-query bench regression check.

Usage: python3 tools/bench_regress.py BASELINE.json CURRENT.json [CURRENT2.json ...]
       [--threshold 2.0] [--floor 0.5]

Each file is a one-line Bench JSON ({"queries": {name: sec, ...}, ...} —
either printed by graft.Bench or the sidecar it writes, or a driver
BENCH_r*.json). A query REGRESSES when current/baseline > threshold and
current > floor seconds (sub-floor timings are jitter, not signal).

Load-variance escape hatch: pass MORE than one current-run file (i.e.
re-run Bench and give both runs) — a query is only flagged when it
regresses in EVERY current run. One noisy run (the BENCH_r05 wolf-cry:
11x on q_blockmax under machine load, steady-state on re-run) then
cannot fail the check by itself.

Exit 0: no confirmed regressions. Exit 1: confirmed regressions listed.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        text = f.read().strip()
    # tolerate a log line prefix before the JSON object
    obj = json.loads(text[text.index("{"):])
    qs = obj.get("queries", {})
    if not qs and "tail" in obj:
        # a driver BENCH_r*.json wraps TRUNCATED Bench stdout in
        # "tail" — salvage whatever "name":sec pairs survived (the
        # very reason Bench now also writes an untruncated sidecar)
        qs = {m.group(1): float(m.group(2)) for m in
              re.finditer(r'"(q[\w]*)":(-?\d+\.?\d*)', obj["tail"])}
    ok = {k: v for k, v in qs.items() if isinstance(v, (int, float)) and v >= 0}
    # queries Bench records as negative FAILED outright — the worst
    # regression class, which must not vanish from the comparison
    failed = {k for k, v in qs.items() if isinstance(v, (int, float)) and v < 0}
    return ok, failed, obj.get("load")


def external_load(load):
    """Cores of NON-bench work running alongside the timed pass, or
    None when the run carries no telemetry (pre-r8 files, or a JVM
    that could not report process CPU — bench_cores is -1 then).

    Uses the MIN of the two loadavg samples: sustained external load
    (the r05/r07 contamination signature) shows in both, while the
    bench's own transients show in at most one — warmup residue in
    the start sample (also mitigated by the settle sleep), an
    end-of-pass burst in the end sample.  max() would let either
    transient fake a contamination verdict on a quiet machine."""
    if not load:
        return None
    samples = [load.get("loadavg_start", -1), load.get("loadavg_end", -1)]
    cores = load.get("bench_cores", -1)
    if min(samples) < 0 or cores < 0:
        return None
    return max(0.0, min(samples) - cores)


def contaminated(load):
    """A run self-identifies as load-contaminated when the 1-min
    loadavg exceeds what the bench JVM itself was using by more than a
    quarter of the machine — the uniform-inflation signature of the
    r05/r07 wolf-cries (an overlapping DuckDB validation pegging
    cores the bench thought it had) — or when the hypervisor stole
    more than half a core on average (steal_cores, recorded since
    r15: a shared-host neighbor inflates every query uniformly while
    loadavg and bench_cores both read clean — the r15 run-d
    signature)."""
    steal = load.get("steal_cores", -1) if load else -1
    if steal is not None and steal > 0.5:
        return True
    ext = external_load(load)
    if ext is None:
        return False
    cpus = float(load.get("cpus", 0) or 0)
    return cpus > 0 and ext > 0.25 * cpus


def main(argv):
    threshold, floor = 2.0, 0.5
    paths = []
    it = iter(argv)
    for a in it:
        if a == "--threshold":
            threshold = float(next(it))
        elif a == "--floor":
            floor = float(next(it))
        else:
            paths.append(a)
    if len(paths) < 2:
        print(__doc__)
        return 2
    base, _, base_load = load(paths[0])
    loaded = [load(p) for p in paths[1:]]
    runs = [ok for ok, _, _ in loaded]

    # load-guard: contaminated runs self-identify up front
    dirty = []
    for p, (_, _, ld) in zip(paths[1:], loaded):
        ext = external_load(ld)
        if contaminated(ld):
            dirty.append(p)
            ext_s = "?" if ext is None else f"{ext:.1f}"
            steal = (ld or {}).get("steal_cores", -1)
            print(f"CONTAMINATED: {p} ran under ~{ext_s} external cores, "
                  f"~{steal:.2f} stolen cores "
                  f"(bench used {ld.get('bench_cores', -1):.1f} of "
                  f"{ld.get('cpus', '?')}) — "
                  "timings are inflated; regressions below are suspect")
        elif ext is not None:
            steal = (ld or {}).get("steal_cores", -1)
            tail = f", ~{steal:.2f} stolen" if steal >= 0 else ""
            print(f"load-ok: {p} (~{ext:.1f} external cores{tail})")
    if contaminated(base_load):
        print(f"note: BASELINE {paths[0]} is itself load-contaminated — "
              "speedups are suspect too")

    # a query that PASSED in the baseline and FAILS (negative time) in
    # every current run is an automatic regression — timing thresholds
    # must never launder a pass→fail transition into an OK exit
    broken = sorted(q for q in base
                    if all(q in bad for _, bad, _ in loaded))

    flagged = {}
    for q, b in sorted(base.items()):
        if b <= 0:
            continue
        in_all = [r[q] for r in runs if q in r]
        if len(in_all) != len(runs):
            continue
        if all(c / b > threshold and c > floor for c in in_all):
            flagged[q] = (b, in_all)

    cur, prev = runs[0], base
    tot_c = sum(cur.values())
    tot_b = sum(prev[q] for q in cur if q in prev)
    print(f"queries: {len(cur)} (baseline {len(base)}); "
          f"total {tot_c:.1f}s vs baseline {tot_b:.1f}s")
    missing = sorted(set(base) - set(cur))
    if missing:
        print(f"note: {len(missing)} baseline queries absent now: {missing[:8]}")
    if broken:
        print(f"FAILED queries (passed in baseline, negative time in all "
              f"current runs): {broken}")
    if not flagged and not broken:
        n = "both runs" if len(runs) > 1 else "the current run"
        print(f"OK: no query regressed >{threshold}x (floor {floor}s) in {n}")
        return 0
    if broken and not flagged:
        return 1
    if flagged and len(dirty) == len(runs):
        # every current run was captured under external load: the
        # timing flags are the load's signature, not the engine's —
        # report them as unconfirmed and exit distinctly so a driver
        # can schedule a quiet re-run instead of filing a regression
        print(f"UNCONFIRMED (all {len(runs)} current run(s) "
              f"load-contaminated — re-run on a quiet machine):")
        for q, (b, cs) in sorted(flagged.items(), key=lambda kv: -max(kv[1][1])):
            ratios = ", ".join(f"{c:.2f}s ({c / b:.1f}x)" for c in cs)
            print(f"  {q}: baseline {b:.2f}s -> {ratios}")
        return 1 if broken else 3
    print(f"REGRESSIONS (>{threshold}x in all {len(runs)} current run(s)):")
    for q, (b, cs) in sorted(flagged.items(), key=lambda kv: -max(kv[1][1])):
        ratios = ", ".join(f"{c:.2f}s ({c / b:.1f}x)" for c in cs)
        print(f"  {q}: baseline {b:.2f}s -> {ratios}")
    if len(runs) == 1:
        print("hint: re-run Bench and pass both current files — a single "
              "loaded-machine run is not a confirmed regression")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
