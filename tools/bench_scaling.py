"""Scaling-evidence runner (north rule: throughput at N vs 4N parallelism).

Generates ONE shared clips table (lite audio — the fuzzy path never decodes
audio; transcripts and planted clusters are identical to the full table),
then runs the identical fuzzy-dedup pipeline at the REFERENCE signature
config (char_ngrams=24, 20 bands x 13 rows = 260 hashes, seed 42) in fresh
JVMs at local[N] and local[4N], interleaved repeat trials, best-of per
size. Prints throughput at both sizes plus scaling efficiency.

Usage: python tools/bench_scaling.py [n_clips] [N_cores]
Env:   SPARK_GRAFT_SCALE_SRC=<existing clips parquet> to skip generation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = """
import sys, json, time, tempfile, os
sys.path.insert(0, {repo!r})
from curator_spark.session import get_spark, scratch_dir
from curator_spark.config import FuzzyDedupConfig
from curator_spark.pipeline import FuzzyDedupPipeline
from curator_spark.datagen import generate_clips

cpus = {cpus}
spark = get_spark(f"local[{{cpus}}]", shuffle_partitions=max(cpus * 2, 8))
# num_salts=1: collision metrics on this corpus show max bucket size 3
# (no hot keys) — salting is for boilerplate-heavy corpora and is
# exercised in tests/bench.py; keeping it off here removes a second
# window pass from the timing run
# checkpoint_buckets=False + num_salts=1: the band-hash UDF fuses directly
# under the edge window's exchange — no bucket materialization; resume
# granularity stays per-band-range via the Edges checkpoints
cfg = FuzzyDedupConfig(num_salts=1, bands_per_iteration=20, collision_metrics=False,
                       checkpoint_buckets=False)
tmp = tempfile.mkdtemp(prefix="scale_child_", dir=scratch_dir())
generate_clips(spark, 2000, seed=1, lite=True).write.parquet(tmp + "/warm")
FuzzyDedupPipeline(spark, cfg, tmp + "/warm_ckpt").run(spark.read.parquet(tmp + "/warm"))
clips = spark.read.parquet({src!r})
pipe = FuzzyDedupPipeline(spark, cfg, tmp + "/ckpt")
t0 = time.time()
res = pipe.run(clips)
dt = time.time() - t0
n = {n_clips}
print("RESULT" + json.dumps({{"cpus": cpus, "sec": round(dt, 2),
      "clips_per_sec": round(n / dt, 1), "num_duplicates": res["num_duplicates"],
      "phases": {{k: round(v, 1) for k, v in res.items() if k.endswith("time")}}}}))
"""


def _host_probe() -> dict:
    """Cheap host-health snapshot recorded per trial: cumulative steal
    jiffies (hypervisor CPU cap) and a 1-core numpy speed probe. On a
    shared/ballooned sandbox these explain run-to-run noise; on a real
    cluster they read ~0 and constant."""
    import time

    import numpy as np

    with open("/proc/stat") as f:
        steal = int(f.readline().split()[8])
    a = np.random.default_rng(0).random((512, 512))
    t0 = time.time()
    for _ in range(20):
        a = a @ a
        a *= 1e-300
    return {"steal_jiffies": steal, "matmul_20x512_sec": round(time.time() - t0, 3)}


def run_child(cpus: int, src: str, n_clips: int) -> dict:
    """Fresh JVM at local[cpus], CPU-PINNED to exactly ``cpus`` cores.

    Without the pin, local[N] only caps concurrent Spark tasks — python
    UDF workers are separate processes, so a "2-core" run actually
    borrows extra host cores for numpy while the JVM does IO, flattering
    the small size and understating N->4N efficiency. ``taskset`` bounds
    the whole process tree (JVM + workers) to N cores — the faithful
    model of an N-core executor allocation."""
    code = CHILD.format(repo=REPO, cpus=cpus, src=src, n_clips=n_clips)
    cmd = [sys.executable, "-c", code]
    if os.environ.get("SPARK_GRAFT_NO_PIN") != "1":
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    timeout = int(os.environ.get("SPARK_GRAFT_TRIAL_TIMEOUT", "5400"))
    last_err = ""
    # retry once: a lost python worker wedges the whole Spark job (the JVM
    # reader blocks forever on the dead worker's socket — observed on this
    # sandbox under hypervisor CPU throttling); a fresh JVM clears it
    for attempt in range(2):
        probe = _host_probe()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO)
        except subprocess.TimeoutExpired:
            last_err = f"trial timed out after {timeout}s (attempt {attempt + 1})"
            print(json.dumps({"retry": last_err, "cpus": cpus}), file=sys.stderr, flush=True)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                res = json.loads(line[len("RESULT"):])
                res["host_probe"] = probe
                return res
        last_err = out.stderr[-3000:]
    raise RuntimeError(f"child local[{cpus}] failed:\n{last_err}")


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi_cores = n_cores * 4
    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "")
    if not src or not os.path.exists(src):
        tmp = tempfile.mkdtemp(prefix="scale_src_")
        src = os.path.join(tmp, "clips")
        gen = (
            "import sys; sys.path.insert(0, %r)\n"
            "from curator_spark.session import get_spark\n"
            "from curator_spark.datagen import generate_clips\n"
            "spark = get_spark('local[32]')\n"
            "generate_clips(spark, %d, seed=42, num_partitions=256, lite=True)"
            ".write.parquet(%r)\n"
        ) % (REPO, n_clips, src)
        r = subprocess.run([sys.executable, "-c", gen], capture_output=True, text=True, timeout=3000)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-2000:])
        print(json.dumps({"generated_src": src}), file=sys.stderr, flush=True)
    # interleaved repeat trials; best-of per size guards against host noise
    trials: dict[int, list] = {n_cores: [], hi_cores: []}
    for cpus in (hi_cores, n_cores, hi_cores, n_cores):
        trials[cpus].append(run_child(cpus, src, n_clips))
        print(json.dumps({"trial": trials[cpus][-1]}), file=sys.stderr, flush=True)
    lo = max(trials[n_cores], key=lambda r: r["clips_per_sec"])
    hi = max(trials[hi_cores], key=lambda r: r["clips_per_sec"])
    eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / 4.0
    print(json.dumps({"n_clips": n_clips, f"local{n_cores}": lo, f"local{hi_cores}": hi,
                      "efficiency_n_to_4n": round(eff, 3), "all_trials": trials}))


if __name__ == "__main__":
    main()
