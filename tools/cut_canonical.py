"""Cut a canonical bench number, or refuse loudly (VERDICT r14 #1/#2).

The r14 canonical adopted a 196.2 s reading from a degraded host while
a clean 174.8 s same-code run existed — because adoption was a
narrative choice. This tool makes it mechanical: run `python bench.py`
(alone), then ACCEPT the run as canonical only if

  1. load_sec <= --load-gate (default 15.5 s — the graph-load path is
     pure parquet scan + persist whose clean-host anchor is
     11.4-11.9 s across r13/r14; 1.3x that bounds acceptable drift),
  2. every guard entry's settled re-run resolved below 2x its history
     (the bench's own mover guard found nothing it could not settle),
  3. the MEDIAN per-query ratio vs the previous canonical is <= the
     median gate (default 1.2) over queries with >= 0.3 s of history —
     a run with a degraded mid-suite window can pass 1. and 2. yet
     carry 20-30% inflation on every sub-guard-threshold query (the
     first r15 cut did exactly that: load_sec 9.7, all 12 movers
     settled, median vs the clean r14 canonical 1.28).

On reject: keep the BENCH_DETAIL.json the run wrote aside as
BENCH_DETAIL.rejected-<n>.json, restore the previous committed detail
(git checkout), and retry up to --tries times with a --cooldown sleep.
Exit 0 only when a run passes; exit 2 when every try failed — in that
case the round ships WITHOUT a new canonical and the ledger records
why (a missing number is honest; a sick number poisons the chain).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")


def true_median(sorted_vals):
    """True median — averages the two middle elements for even n.
    (The previous vals[n//2] was the UPPER median — ADVICE r15.)"""
    if not sorted_vals:
        return None
    mid = len(sorted_vals) // 2
    if len(sorted_vals) % 2:
        return sorted_vals[mid]
    return (sorted_vals[mid - 1] + sorted_vals[mid]) / 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tries", type=int, default=3)
    ap.add_argument("--cooldown", type=float, default=300.0)
    ap.add_argument("--load-gate", type=float, default=15.5)
    # Whole-suite health gate (added after the first r15 cut): a run
    # with a degraded mid-suite window can pass load_sec (clean start)
    # and settle every >1.5x guard mover, yet still carry 20-30%
    # uniform inflation on the sub-threshold rest. Reject when the
    # MEDIAN per-query ratio vs the previous canonical (queries with
    # history >= 0.3 s, post-guard-substitution numbers) exceeds this.
    # Genuine optimizations push the median DOWN; clean-to-clean round
    # variance observed on this chain is well inside +/-10%.
    ap.add_argument("--median-gate", type=float, default=1.2)
    # Comparison baseline for the median gate. Default: the canonical
    # in place before this session (same as the bench guard's history).
    # Pass an explicit file after an instance change (ADJUDICATIONS
    # r15_instance_floor): medians are only meaningful same-instance.
    ap.add_argument("--baseline", type=str, default=None)
    args = ap.parse_args()

    # History = the canonical in place before any run of this session.
    # Stash it in memory: bench.py overwrites the file, and a git
    # checkout restore would resurrect whatever happens to be committed
    # (in r15 that was itself a degraded run — the very bug this gate
    # exists to catch).
    try:
        with open(DETAIL) as f:
            hist = json.load(f)
    except Exception:
        hist = None
    if args.baseline:
        with open(args.baseline) as f:
            base = json.load(f)
    else:
        base = hist or {}
    hist_q = base.get("queries", {})
    base_boot = (base.get("provenance") or {}).get("boot_utc")
    if not hist_q:
        print(
            "[cut_canonical] WARNING: baseline has no queries — the "
            "median gate is DISABLED; check the --baseline path",
            flush=True,
        )

    for attempt in range(1, args.tries + 1):
        print(f"[cut_canonical] attempt {attempt}/{args.tries}", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        wall = round(time.time() - t0, 1)
        if proc.returncode != 0:
            print(f"  bench.py FAILED rc={proc.returncode} after {wall}s")
            print(proc.stderr[-2000:])
            return 1
        with open(DETAIL) as f:
            d = json.load(f)
        load = d["load_sec"]
        guard = d.get("guard", {})
        unresolved = {
            n: g
            for n, g in guard.items()
            if g["settled_rerun"] > 2 * g["history"]
        }
        ratios = sorted(
            d["queries"][n] / hist_q[n]
            for n in d["queries"]
            if n in hist_q and hist_q[n] >= 0.3
        )
        if ratios:
            median = round(true_median(ratios), 3)
        else:
            median = None
            print(
                "[cut_canonical] WARNING: no queries shared with the "
                "baseline (>=0.3 s history) — median gate disabled "
                "for this attempt",
                flush=True,
            )
        run_boot = (d.get("provenance") or {}).get("boot_utc")
        verdict = []
        # Canonical comparisons are only meaningful same-instance
        # (ADJUDICATIONS r15_instance_floor): refuse when the run's
        # boot time differs from the baseline's instead of silently
        # gating cross-instance (VERDICT r15 #6).
        if base_boot and run_boot and base_boot != run_boot:
            verdict.append(
                f"instance changed: run boot {run_boot} != baseline "
                f"boot {base_boot} — cross-instance medians are "
                "meaningless; re-baseline first"
            )
        elif not base_boot:
            print(
                "[cut_canonical] WARNING: baseline has no boot_utc — "
                "cannot verify same-instance comparison",
                flush=True,
            )
        if load > args.load_gate:
            verdict.append(
                f"load_sec {load} > gate {args.load_gate} (sick host)"
            )
        if unresolved:
            verdict.append(
                f"guard could not settle {sorted(unresolved)} below 2x history"
            )
        if median is not None and median > args.median_gate:
            verdict.append(
                f"median vs history {median} > gate {args.median_gate} "
                "(suite-wide degradation)"
            )
        print(
            f"  run {d['provenance']['run_utc']}: value={d['value']} "
            f"load_sec={load} median_vs_history={median} "
            f"guard={sorted(guard) or 'empty'} wall={wall}s"
        )
        if not verdict:
            print("[cut_canonical] ACCEPTED — BENCH_DETAIL.json is canonical")
            return 0
        n = 1
        while os.path.exists(
            os.path.join(REPO, f"BENCH_DETAIL.rejected-{n}.json")
        ):
            n += 1
        rej = os.path.join(REPO, f"BENCH_DETAIL.rejected-{n}.json")
        shutil.copy(DETAIL, rej)
        if hist is not None:
            with open(DETAIL, "w") as f:
                json.dump(hist, f, indent=1, sort_keys=True)
        else:
            subprocess.run(
                ["git", "checkout", "--", "BENCH_DETAIL.json"], cwd=REPO
            )
        print(f"[cut_canonical] REJECTED: {'; '.join(verdict)} -> {rej}")
        if attempt < args.tries:
            print(f"  cooling down {args.cooldown}s", flush=True)
            time.sleep(args.cooldown)
    print("[cut_canonical] no acceptable run — ship without a new canonical")
    return 2


if __name__ == "__main__":
    sys.exit(main())
