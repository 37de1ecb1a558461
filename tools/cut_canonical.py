"""Cut a canonical bench number, or refuse loudly (VERDICT r14 #1/#2).

The r14 canonical adopted a 196.2 s reading from a degraded host while
a clean 174.8 s same-code run existed — because adoption was a
narrative choice. This tool makes it mechanical: run `python bench.py`
(alone), then ACCEPT the run as canonical only if

  1. load_sec <= --load-gate (default 15.5 s — the graph-load path is
     pure parquet scan + persist whose clean-host anchor is
     11.4-11.9 s across r13/r14; 1.3x that bounds acceptable drift),
  2. every guard entry's settled re-run resolved below 2x its history
     (the bench's own mover guard found nothing it could not settle).

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tries", type=int, default=3)
    ap.add_argument("--cooldown", type=float, default=300.0)
    ap.add_argument("--load-gate", type=float, default=15.5)
    args = ap.parse_args()

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
        verdict = []
        if load > args.load_gate:
            verdict.append(
                f"load_sec {load} > gate {args.load_gate} (sick host)"
            )
        if unresolved:
            verdict.append(
                f"guard could not settle {sorted(unresolved)} below 2x history"
            )
        print(
            f"  run {d['provenance']['run_utc']}: value={d['value']} "
            f"load_sec={load} guard={sorted(guard) or 'empty'} wall={wall}s"
        )
        if not verdict:
            print("[cut_canonical] ACCEPTED — BENCH_DETAIL.json is canonical")
            return 0
        rej = os.path.join(REPO, f"BENCH_DETAIL.rejected-{attempt}.json")
        shutil.copy(DETAIL, rej)
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
