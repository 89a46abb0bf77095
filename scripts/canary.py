"""TPU default-path canary: fail loudly if training fps regresses.

Round 4 shipped a default flip (iters_per_dispatch=10) validated only by a
CPU equivalence test; the official bench collapsed ~23x.  This script is
the guard that hole calls for (VERDICT r4 item 6): a short warm-cache bench
of the DEFAULT training path, compared against the recorded last-good
value.  Run it after ANY change to runner/env/physics defaults, BEFORE
committing (CLAUDE.md "Process invariants").

Usage:
    python scripts/canary.py            # run + compare (exit 1 on >15% drop)
    python scripts/canary.py --record   # run + overwrite the last-good value

The persistent XLA compile cache (~/.cache/dtc_tpu_xla) makes the warm run
cheap (~1-2 min); a cold cache pays the one-time ~10-min remote compile.
CANARY_ITERS (default 6) and CANARY_THRESHOLD (default 0.15) override.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LASTGOOD = os.path.join(REPO, "docs", "canary_lastgood.json")


def run_bench(iters: int) -> dict:
    env = dict(os.environ, BENCH_ITERS=str(iters))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.exit(f"canary: bench.py failed (rc={out.returncode})\n"
                 f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            if "value" in rec:
                return rec
        except json.JSONDecodeError:
            continue
    sys.exit(f"canary: no JSON line in bench output\n{out.stdout[-2000:]}")


def main() -> None:
    # 6-iter windows measured 418-498k on the SAME tree that benched
    # 522.5k over 30 iters (tunnel variance); 15 iters keeps the canary
    # ~7 min warm-cache while pulling the noise inside the threshold
    iters = int(os.environ.get("CANARY_ITERS", "15"))
    threshold = float(os.environ.get("CANARY_THRESHOLD", "0.15"))
    rec = run_bench(iters)
    fps = rec["value"]

    if "--record" in sys.argv:
        os.makedirs(os.path.dirname(LASTGOOD), exist_ok=True)
        with open(LASTGOOD, "w") as f:
            json.dump({"fps": fps, "iters": iters,
                       "num_envs": int(os.environ.get(
                           "BENCH_NUM_ENVS", 4096))}, f, indent=1)
        print(f"canary: recorded last-good {fps:.1f} fps -> {LASTGOOD}")
        return

    if not os.path.exists(LASTGOOD):
        sys.exit(f"canary: no last-good file at {LASTGOOD}; "
                 "run with --record first")
    with open(LASTGOOD) as f:
        good = json.load(f)["fps"]
    ratio = fps / good
    verdict = "OK" if ratio >= 1.0 - threshold else "REGRESSION"
    print(f"canary: {fps:.1f} fps vs last-good {good:.1f} "
          f"({ratio:.2f}x) -> {verdict}")
    if verdict != "OK":
        sys.exit(1)


if __name__ == "__main__":
    main()
