"""Round-4 volume scaling campaign (VERDICT r03 item 3).

Runs the matched-window concurrent pair (tools/bench_scaling.py
run_pair_matched) at VOLUME — 8M clips, ~25x round 3's 300k-clip pairs —
so the per-stage job-latency floors (CC rounds, band-loop setup, JVM
warm-up) amortize to noise and the multi-minute hypervisor throttle
waves average out across a ~1 h shared window. Also runs the no-Spark
kernel-pool stage-split at the same document volume.

Launch is gated on a semi-clean host probe (matched mode is robust to
*shared* throttle by construction — both sides integrate the same
window — but a 10-20x dirty start would blow the wall-clock budget).

Each attempt appends to the artifact as it completes, so a killed run
still leaves its finished attempts on disk.

Usage:
  python tools/r04_scaling_campaign.py <src_parquet> <n_clips> <artifact.json> \
      [n_cores=2] [pairs=1] [launch_probe_ceiling=0.15]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import _host_probe, run_pair_matched  # noqa: E402


def wait_semi_clean(ceiling: float, max_wait_s: float = 7200.0) -> dict:
    t0 = time.time()
    while True:
        p = _host_probe()
        p["waited_s"] = round(time.time() - t0, 0)
        if p["matmul_20x512_sec"] <= ceiling or time.time() - t0 > max_wait_s:
            return p
        print(json.dumps({"waiting": p}), file=sys.stderr, flush=True)
        time.sleep(30.0)


def main() -> None:
    src = sys.argv[1]
    n_clips = int(sys.argv[2])
    artifact = sys.argv[3]
    n_cores = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    ceiling = float(sys.argv[6]) if len(sys.argv) > 6 else 0.15

    results = []
    if os.path.exists(artifact):
        results = json.load(open(artifact)).get("attempts", [])
    for i in range(pairs):
        gate = wait_semi_clean(ceiling)
        print(json.dumps({"launching_pair": i, "gate_probe": gate}), file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            res = run_pair_matched(n_cores, n_cores * 4, src, n_clips)
        except Exception as e:  # noqa: BLE001 — record the failure, keep prior attempts
            res = {"error": str(e)[:500]}
        res["gate_probe"] = gate
        res["exit_probe"] = _host_probe()
        res["wall_s"] = round(time.time() - t0, 0)
        results.append(res)
        with open(artifact, "w") as f:
            json.dump({"n_clips": n_clips, "n_cores": n_cores, "attempts": results}, f, indent=1)
        print(json.dumps(res.get("efficiency_n_to_4n")), flush=True)


if __name__ == "__main__":
    main()
