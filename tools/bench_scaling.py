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
spark.stop()
import shutil
shutil.rmtree(tmp, ignore_errors=True)  # ~6 GB of checkpoints per child: a
# campaign of interleaved trials filled the disk when these accumulated
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


def _child_cmd(cpus: int, src: str, n_clips: int, core_lo: int = 0) -> list:
    code = CHILD.format(repo=REPO, cpus=cpus, src=src, n_clips=n_clips)
    cmd = [sys.executable, "-c", code]
    if os.environ.get("SPARK_GRAFT_NO_PIN") != "1":
        cmd = ["taskset", "-c", f"{core_lo}-{core_lo + cpus - 1}", *cmd]
    return cmd


def _parse_result(stdout: str) -> dict | None:
    for line in stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    return None


def run_child(cpus: int, src: str, n_clips: int) -> dict:
    """Fresh JVM at local[cpus], CPU-PINNED to exactly ``cpus`` cores.

    Without the pin, local[N] only caps concurrent Spark tasks — python
    UDF workers are separate processes, so a "2-core" run actually
    borrows extra host cores for numpy while the JVM does IO, flattering
    the small size and understating N->4N efficiency. ``taskset`` bounds
    the whole process tree (JVM + workers) to N cores — the faithful
    model of an N-core executor allocation."""
    cmd = _child_cmd(cpus, src, n_clips)
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
        res = _parse_result(out.stdout)
        if res is not None:
            res["host_probe"] = probe
            return res
        last_err = out.stderr[-3000:]
    raise RuntimeError(f"child local[{cpus}] failed:\n{last_err}")


def run_pair_concurrent(n_cores: int, hi_cores: int, src: str, n_clips: int) -> tuple:
    """Run BOTH sizes at the same time on DISJOINT core sets (lo on cores
    [0, n_cores), hi on [n_cores, n_cores+hi_cores)).

    Rationale: this sandbox's hypervisor throttles total CPU delivery in
    multi-minute waves (observed 3-5x swings — BENCH.md). Sequential
    trials compare a small run in one throttle window against a big run
    in a different one, which randomizes the ratio — the quantity the
    north rule actually grades. Running the two sizes in the SAME window
    gives both the identical host state; under a total-quota throttle
    each pinned core receives the same share, so the throughput ratio
    remains the honest parallel-efficiency measure. The residual bias —
    memory-bandwidth contention between the two jobs — hits the
    10-core side harder than 2-core, UNDERSTATING efficiency, so the
    mode is conservative with respect to the >=0.8 criterion."""
    probe = _host_probe()
    timeout = int(os.environ.get("SPARK_GRAFT_TRIAL_TIMEOUT", "5400"))
    p_lo = subprocess.Popen(_child_cmd(n_cores, src, n_clips, core_lo=0),
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO)
    p_hi = subprocess.Popen(_child_cmd(hi_cores, src, n_clips, core_lo=n_cores),
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO)
    try:
        hi_out = p_hi.communicate(timeout=timeout)
        lo_out = p_lo.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        p_lo.kill()
        p_hi.kill()
        raise
    lo = _parse_result(lo_out[0])
    hi = _parse_result(hi_out[0])
    if lo is None:
        raise RuntimeError(f"concurrent lo child failed:\n{lo_out[1][-3000:]}")
    if hi is None:
        raise RuntimeError(f"concurrent hi child failed:\n{hi_out[1][-3000:]}")
    lo["host_probe"] = hi["host_probe"] = probe
    lo["mode"] = hi["mode"] = "concurrent"
    return lo, hi


def _probe_core(core: int) -> float:
    """1-core matmul probe pinned to a specific core — measures the CPU
    delivery that core is actually receiving (competes fairly with the
    trial threads on it for ~0.05-1 s; ~0.2% duty cycle at 30 s sampling)."""
    code = ("import numpy as np, time\n"
            "a = np.random.default_rng(0).random((512, 512))\n"
            "t0 = time.time()\n"
            "for _ in range(20):\n"
            "    a = a @ a\n"
            "    a *= 1e-300\n"
            "print(round(time.time() - t0, 3))\n")
    out = subprocess.run(["taskset", "-c", str(core), sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120)
    try:
        return float(out.stdout.strip())
    except ValueError:
        return float("nan")


def run_pair_matched(n_cores: int, hi_cores: int, src: str, n_clips: int) -> dict:
    """MATCHED-WINDOW concurrent mode: lo runs once on cores [0, N); hi
    runs BACK-TO-BACK on cores [N, N+4N) until lo finishes, and its
    throughput is the mean over completed runs.

    Fixes the window mismatch of the plain concurrent mode (lo's wall is
    ~3-4x hi's, so most of lo's window was unshared): here every hi
    sample lies inside lo's window, so both sizes integrate the same
    host-throttle trajectory. Under a total-CPU quota with fair per-core
    delivery the ratio then measures software scaling at a uniformly
    slowed clock — and a sidecar probe pair (one core of each side,
    sampled every ~30 s) RECORDS that per-core delivery was equal rather
    than assuming it. Residual biases are conservative: hi pays a JVM
    restart + warm-up per relaunch inside the shared window (its cores
    idle, shifting quota share to lo), and memory-bandwidth contention
    hits the wider side harder.

    Child stdout/stderr go to temp FILES, not PIPEs: Spark logs overflow
    the ~64 KB pipe buffer, and an undrained-PIPE child blocks on write
    and never exits (ADVICE r03). A hi run still in flight when lo
    completes is KILLED and never counted — it would otherwise finish
    with lo's cores idle, receiving extra delivery outside the shared
    window and inflating efficiency (ADVICE r03); if no hi run completed
    inside the window the pair is returned flagged
    ``window_mismatched`` with ``efficiency_n_to_4n: None`` instead of
    silently using the biased sample."""
    import threading

    samples: list = []
    stop = threading.Event()

    def sidecar() -> None:
        while not stop.is_set():
            lo_p = _probe_core(0)
            hi_p = _probe_core(n_cores)
            samples.append({"lo_core0": lo_p, "hi_core0": hi_p})
            stop.wait(30.0)

    def spawn(cmd):
        fo = tempfile.NamedTemporaryFile("w+", delete=False, suffix=".out")
        fe = tempfile.NamedTemporaryFile("w+", delete=False, suffix=".err")
        p = subprocess.Popen(cmd, stdout=fo, stderr=fe, text=True, cwd=REPO)
        return p, fo.name, fe.name

    def finish(p, out_path, err_path):
        p.wait()
        with open(out_path) as f:
            out = f.read()
        with open(err_path) as f:
            err = f.read()
        os.unlink(out_path)
        os.unlink(err_path)
        return out, err

    timeout = int(os.environ.get("SPARK_GRAFT_TRIAL_TIMEOUT", "5400"))
    t = threading.Thread(target=sidecar, daemon=True)
    t.start()
    p_lo, lo_out_p, lo_err_p = spawn(_child_cmd(n_cores, src, n_clips, core_lo=0))
    hi_results: list = []
    hi_fail_tails: list = []
    hi = None  # (proc, out_path, err_path)
    import time as _time

    t0 = _time.time()
    try:
        while True:
            if hi is None:
                hi = spawn(_child_cmd(hi_cores, src, n_clips, core_lo=n_cores))
            lo_done = p_lo.poll() is not None
            hi_done = hi[0].poll() is not None
            if hi_done:
                out, err = finish(*hi)
                res = _parse_result(out)
                if res is not None:
                    hi_results.append(res)
                else:
                    hi_fail_tails.append(err[-1500:])
                hi = None
                if lo_done:
                    break
            elif lo_done:
                # lo's window closed: an in-flight hi would finish with
                # lo's cores idle — kill it, never count it
                hi[0].kill()
                finish(*hi)
                hi = None
                break
            if _time.time() - t0 > timeout:
                raise RuntimeError("matched pair timed out")
            _time.sleep(2.0)
    finally:
        stop.set()
        for proc, op, ep in ([hi] if hi else []):
            proc.kill()
            finish(proc, op, ep)
        # on an abnormal exit (timeout raise), reap lo too: an orphan
        # CPU-pinned JVM would keep burning N cores and skew every
        # subsequent gated trial on the host
        if p_lo.poll() is None:
            p_lo.kill()
            finish(p_lo, lo_out_p, lo_err_p)
    lo_out, lo_err = finish(p_lo, lo_out_p, lo_err_p)
    lo = _parse_result(lo_out)
    if lo is None:
        raise RuntimeError(f"matched lo child failed:\n{lo_err[-3000:]}")
    base = {"mode": "matched_window", "lo": lo, "sidecar_delivery_probes": samples}
    if not hi_results:
        return {
            **base,
            "window_mismatched": True,
            "hi_runs": [],
            "hi_mean_clips_per_sec": None,
            "efficiency_n_to_4n": None,
            "note": "no hi run completed inside lo's window; increase n_clips",
            "hi_failure_tails": hi_fail_tails[:2],
        }
    import statistics

    hi_mean = statistics.mean(r["clips_per_sec"] for r in hi_results)
    return {
        **base,
        "hi_runs": hi_results,
        "hi_mean_clips_per_sec": round(hi_mean, 1),
        "efficiency_n_to_4n": round(hi_mean / lo["clips_per_sec"] / 4.0, 3),
    }


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi_cores = n_cores * 4
    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "")
    generated_tmp = None
    if not src or not os.path.exists(src):
        import atexit
        import shutil

        generated_tmp = tempfile.mkdtemp(prefix="scale_src_")
        # a generated 8M-clip source is ~10 GB; clean it on every exit
        # path (the CONCURRENT==2 branch returns early)
        atexit.register(shutil.rmtree, generated_tmp, ignore_errors=True)
        tmp = generated_tmp
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
    trials: dict[int, list] = {n_cores: [], hi_cores: []}
    if os.environ.get("SPARK_GRAFT_SCALE_CONCURRENT") == "2":
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
        pairs = []
        for _ in range(repeats):
            pair = run_pair_matched(n_cores, hi_cores, src, n_clips)
            pairs.append(pair)
            print(json.dumps({"matched_pair_eff": pair["efficiency_n_to_4n"],
                              "lo_cps": pair["lo"]["clips_per_sec"],
                              "hi_mean_cps": pair["hi_mean_clips_per_sec"]}),
                  file=sys.stderr, flush=True)
        # headline pair: cleanest shared window = most total CPU delivered.
        # Window-mismatched repeats carry hi_mean_clips_per_sec=None —
        # exclude them rather than TypeError away the whole campaign.
        complete = [p for p in pairs if p["hi_mean_clips_per_sec"] is not None]
        if not complete:
            print(json.dumps({"n_clips": n_clips, "mode": "matched_window",
                              "window_mismatched": True, "all_pairs": pairs}))
            return
        best = max(complete, key=lambda p: p["lo"]["clips_per_sec"] + p["hi_mean_clips_per_sec"])
        print(json.dumps({"n_clips": n_clips, "mode": "matched_window",
                          f"local{n_cores}": best["lo"],
                          "hi_runs": best["hi_runs"],
                          "hi_mean_clips_per_sec": best["hi_mean_clips_per_sec"],
                          "efficiency_n_to_4n": best["efficiency_n_to_4n"],
                          "sidecar_delivery_probes": best["sidecar_delivery_probes"],
                          "all_pairs": pairs}))
        return
    if os.environ.get("SPARK_GRAFT_SCALE_CONCURRENT") == "1":
        # same-window pairs (see run_pair_concurrent); repeat, best-of by
        # the PAIR's efficiency sampled in the cleanest shared window
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
        for _ in range(repeats):
            lo_t, hi_t = run_pair_concurrent(n_cores, hi_cores, src, n_clips)
            trials[n_cores].append(lo_t)
            trials[hi_cores].append(hi_t)
            print(json.dumps({"pair": [lo_t, hi_t]}), file=sys.stderr, flush=True)
        # select the pair from the cleanest window = most total CPU
        # delivered (NOT by best ratio — that would cherry-pick the answer)
        pairs = list(zip(trials[n_cores], trials[hi_cores]))
        lo, hi = max(pairs, key=lambda p: p[0]["clips_per_sec"] + p[1]["clips_per_sec"])
    else:
        # interleaved repeat trials; best-of per size guards against host noise
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
