"""Probe-gated scaling trials: fire one pinned child at a time, but only
when the host is in a clean window.

This sandbox's hypervisor throttles CPU delivery in multi-minute waves
(3-5x swings; see BENCH.md). A trial launched inside a throttle window
measures the hypervisor, not the plan. This driver polls a 1-core numpy
probe and launches the next trial only when the probe is at full speed,
alternating sizes so both collect clean-window samples. Results append
to a JSONL ledger; `summarize` picks best-of per size (the standard
noise-robust reduction, same as tools/bench_scaling.py).

Usage:
  python tools/gated_trials.py run <src_parquet> <n_clips> <ledger.jsonl> \
      [n_cores] [max_trials_per_size]
  python tools/gated_trials.py summarize <ledger.jsonl> <n_clips> [n_cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import _host_probe, run_child  # noqa: E402

CLEAN_MATMUL_SEC = float(os.environ.get("SPARK_GRAFT_CLEAN_PROBE", "0.075"))


def wait_clean_window(max_wait_s: float = 1800.0) -> dict:
    """Block until the 1-core probe runs at full speed (or give up and
    return the last probe after max_wait_s — caller records it either way)."""
    t0 = time.time()
    while True:
        p = _host_probe()
        if p["matmul_20x512_sec"] <= CLEAN_MATMUL_SEC or time.time() - t0 > max_wait_s:
            return p
        time.sleep(20.0)


def main() -> None:
    mode = sys.argv[1]
    if mode == "run":
        src, n_clips, ledger = sys.argv[2], int(sys.argv[3]), sys.argv[4]
        n_cores = int(sys.argv[5]) if len(sys.argv) > 5 else 2
        max_per = int(sys.argv[6]) if len(sys.argv) > 6 else 3
        counts = {n_cores: 0, n_cores * 4: 0}
        if os.path.exists(ledger):
            # ignore ledger entries from runs at other core counts
            # (ADVICE r03: a foreign 'cpus' value crashed the resume)
            for line in open(ledger):
                c = json.loads(line).get("cpus")
                if c in counts:
                    counts[c] += 1
        # alternate sizes, small first (shorter => more likely to fit a
        # window); a failure budget bounds the run — a persistently
        # failing child (bad src path, OOM) must terminate the driver
        # instead of looping through gate-waits forever
        failures = 0
        max_failures = int(os.environ.get("SPARK_GRAFT_GATED_MAX_FAILURES", "4"))
        while min(counts.values()) < max_per:
            if failures >= max_failures:
                print(json.dumps({"aborted": f"{failures} consecutive child failures"}),
                      file=sys.stderr, flush=True)
                sys.exit(1)
            for cpus in sorted(counts, key=lambda c: (counts[c], c)):
                if counts[cpus] >= max_per:
                    continue
                gate = wait_clean_window()
                print(json.dumps({"gate_probe": gate, "launching": cpus}),
                      file=sys.stderr, flush=True)
                try:
                    res = run_child(cpus, src, n_clips)
                    failures = 0
                except Exception as e:  # noqa: BLE001
                    failures += 1
                    print(json.dumps({"failed": str(e)[:300], "cpus": cpus}),
                          file=sys.stderr, flush=True)
                    continue
                res["gate_probe"] = gate
                with open(ledger, "a") as f:
                    f.write(json.dumps(res) + "\n")
                counts[cpus] += 1
                break
    elif mode == "summarize":
        ledger, n_clips = sys.argv[2], int(sys.argv[3])
        n_cores = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        trials: dict = {n_cores: [], n_cores * 4: []}
        for line in open(ledger):
            r = json.loads(line)
            if r.get("cpus") in trials:  # skip foreign-core-count entries
                trials[r["cpus"]].append(r)
        missing = [c for c, t in trials.items() if not t]
        if missing:
            print(json.dumps({"incomplete_ledger": True,
                              "missing_core_counts": missing,
                              "all_trials": trials}))
            return
        lo = max(trials[n_cores], key=lambda r: r["clips_per_sec"])
        hi = max(trials[n_cores * 4], key=lambda r: r["clips_per_sec"])
        eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / 4.0
        print(json.dumps({"n_clips": n_clips, f"local{n_cores}": lo,
                          f"local{n_cores * 4}": hi,
                          "efficiency_n_to_4n": round(eff, 3),
                          "all_trials": trials}))


if __name__ == "__main__":
    main()
