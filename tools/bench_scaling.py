"""Scaling-evidence runner (north rule: throughput at N vs 4N parallelism).

Generates ONE shared clips table, then runs the identical fuzzy-dedup
pipeline in fresh JVMs at local[8] and local[32] (each with an untimed
2k-clip codegen warmup), and prints throughput at both plus scaling
efficiency. Results are recorded in BENCH.md.

Usage: python tools/bench_scaling.py [n_clips]
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
from curator_spark.session import get_spark
from curator_spark.config import FuzzyDedupConfig
from curator_spark.pipeline import FuzzyDedupPipeline
from curator_spark.datagen import generate_clips

cpus = {cpus}
spark = get_spark(f"local[{{cpus}}]", shuffle_partitions=max(cpus * 2, 8))
cfg = FuzzyDedupConfig(char_ngrams=12, num_bands=20, minhashes_per_band=4,
                       num_salts=4, bands_per_iteration=20)
tmp = tempfile.mkdtemp(prefix="scale_child_")
generate_clips(spark, 2000, seed=1).write.parquet(tmp + "/warm")
FuzzyDedupPipeline(spark, cfg, tmp + "/warm_ckpt").run(spark.read.parquet(tmp + "/warm"))
clips = spark.read.parquet({src!r})
pipe = FuzzyDedupPipeline(spark, cfg, tmp + "/ckpt")
t0 = time.time()
res = pipe.run(clips)
dt = time.time() - t0
n = {n_clips}
print("RESULT" + json.dumps({{"cpus": cpus, "sec": round(dt, 2),
      "clips_per_sec": round(n / dt, 1), "num_duplicates": res["num_duplicates"]}}))
"""


def run_child(cpus: int, src: str, n_clips: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, src=src, n_clips=n_clips)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3000, cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(f"child local[{cpus}] failed:\n{out.stderr[-3000:]}")


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    tmp = tempfile.mkdtemp(prefix="scale_src_")
    src = os.path.join(tmp, "clips")
    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "from curator_spark.session import get_spark\n"
        "from curator_spark.datagen import generate_clips\n"
        "spark = get_spark('local[32]')\n"
        "generate_clips(spark, %d, seed=42, num_partitions=128).write.parquet(%r)\n"
    ) % (REPO, n_clips, src)
    r = subprocess.run([sys.executable, "-c", gen], capture_output=True, text=True, timeout=3000)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    lo = run_child(8, src, n_clips)
    hi = run_child(32, src, n_clips)
    eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / (32 / 8)
    print(json.dumps({"n_clips": n_clips, "local8": lo, "local32": hi,
                      "efficiency_8_to_32": round(eff, 3)}))


if __name__ == "__main__":
    main()
