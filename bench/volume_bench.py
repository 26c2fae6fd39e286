"""CDC throughput flatness across a 10x volume scale-up (round-3 VERDICT #3).

The metadata bench proves the commit path flat in batch COUNT; this
proves the full drain loop flat in events/sec as per-batch VOLUME grows
10x (2M -> 20M events, same recipe as bench.py: 4 micro-batches,
Zipf-hot repos, MoR + in-loop compaction, local[32] via spark-submit —
the exact harness of bench/scaling.py's levels).

Protocol (memory: VM drift): legs interleaved 2M,20M,2M,20M, best-of-2
per volume, the whole window bracketed by the raw sha256-burn hardware
baseline at 32 procs; the bracket ratio (after/before) qualifies the
window.

Run: python bench/volume_bench.py [low_events] [high_events]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench.scaling import (  # noqa: E402
    build_pyfiles_zip,
    generate_events,
    hardware_baseline,
    run_level,
)

CPUS = 32


def run(low: int = 2_000_000, high: int = 20_000_000) -> dict:
    workdir = tempfile.mkdtemp(prefix="volume_bench_")
    try:
        zpath = build_pyfiles_zip(workdir)  # dest dir; returns pkg.zip path
        ev_low = generate_events(os.path.join(workdir, "lo"), low)
        ev_high = generate_events(os.path.join(workdir, "hi"), high)

        hw_before = hardware_baseline(CPUS, CPUS)["low_rate"]
        legs: dict[int, list[float]] = {low: [], high: []}
        for _ in range(2):
            for n, ev in ((low, ev_low), (high, ev_high)):
                res = run_level(
                    CPUS, ev, os.path.join(workdir, f"o{n}_{_}"), zpath,
                    compact_every=2,
                )
                legs[n].append(res["events_per_sec"])
        hw_after = hardware_baseline(CPUS, CPUS)["low_rate"]

        eps_low = max(legs[low])
        eps_high = max(legs[high])
        return {
            "cpus": CPUS,
            "low_events": low,
            "high_events": high,
            "events_per_sec_low": round(eps_low, 1),
            "events_per_sec_high": round(eps_high, 1),
            "all_runs": {str(k): [round(x, 1) for x in v]
                         for k, v in legs.items()},
            "flatness_ratio": round(eps_high / eps_low, 3),
            "hw_bracket_ratio": round(hw_after / hw_before, 3),
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    print(json.dumps(run(low, high)))
