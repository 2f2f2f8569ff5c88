"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Two workload families:
- operator queries from __spark_entry__ (forced with a noop write so the
  whole plan executes, not just a count);
- the flagship clips fuzzy-dedup pipeline (north rule): synthesize a
  deterministic clips table, run MinHash -> LSH -> edges -> CC ->
  keep-first end-to-end, report clips/sec.

Set SPARK_GRAFT_SCALING=1 to additionally run the clips pipeline at
local[8] and local[32] in fresh subprocesses and report throughput at
both plus scaling efficiency (the sandbox stand-in for N vs 4N executors
— see BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "scan_pushdown_filter",
    "groupby_agg_pricing",
    "join_agg_regions",
    "window_keep_first_removal",
    "anti_join_survivors",
    "connected_components",
    "exact_dedup_groups",
    "topk_orders",
    "events_hourly_agg",
    "token_stats",
    "quality_score",
    "lang_id",
    "ngram_jaccard_pairs",
    "embedding_cosine_topk",
    "embedding_neardup_pairs",
    "minhash_lsh_candidates",
    "fuzzy_dedup_documents",
    "simhash_neardup_pairs",
    "ann_topk",
    # round 2 additions
    "kmeans_assign",
    "semantic_dedup_duplicates",
    "heuristic_filters_full",
    "repetition_filters",
    "code_filters",
    "jsonl_read_agg",
    "document_join_roundtrip",
    "wer_prefix_deletion",
    "lsh_high_jaccard_pairs",
    # round 3 additions
    "fuzzy_recall_check",
    "audio_features_clips",
    # round 4 additions
    "text_modifiers",
    "audio_mono_concat_clips",
    "alm_windows_pipeline",
    "alm_overlap_drop",
    "snippet_repetition_docs",
    "duration_histogram",
    "tiered_dedup_clips",
    "join_split_alignment",
    "non_speaker_gaps",
    "html_extract_docs",
    # round 5 additions
    "translation_roundtrip_docs",
    "text_quality_docs",
    "ocr_qa_docs",
    "interleaved_content_docs",
]

CLIPS_N = int(os.environ.get("SPARK_GRAFT_CLIPS_N", "50000"))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _host_probe() -> dict:
    """Host-health snapshot recorded in the bench artifact: cumulative
    hypervisor steal jiffies and a single-core numpy probe. This sandbox
    is intermittently CPU-throttled 3-5x (see BENCH.md); the probe lets a
    reader normalize cross-round comparisons instead of mistaking host
    state for plan regressions."""
    import numpy as np

    with open("/proc/stat") as f:
        steal = int(f.readline().split()[8])
    a = np.random.default_rng(0).random((512, 512))
    t0 = time.time()
    for _ in range(20):
        a = a @ a
        a *= 1e-300
    return {"steal_jiffies": steal, "matmul_20x512_sec": round(time.time() - t0, 3)}


def run_clips_pipeline(spark, n_clips: int) -> dict:
    """Materialize clips to parquet (generation untimed), warm up codegen
    with a tiny pilot run, then time the full fuzzy-dedup pipeline."""
    from curator_spark.config import FuzzyDedupConfig
    from curator_spark.datagen import generate_clips
    from curator_spark.pipeline import FuzzyDedupPipeline

    from curator_spark.session import scratch_dir

    tmp = tempfile.mkdtemp(prefix="bench_clips_", dir=scratch_dir())
    try:
        # bands_per_iteration=20: one LSH round — the per-round memory
        # bound matters on GPU-sized heaps, not here; fewer rounds = fewer
        # fixed-overhead jobs
        cfg = FuzzyDedupConfig(
            char_ngrams=12, num_bands=20, minhashes_per_band=4, num_salts=4, bands_per_iteration=20
        )
        # untimed pilot: JIT/codegen compile every stage's plan shape once
        generate_clips(spark, 2000, seed=1).write.parquet(os.path.join(tmp, "warm"))
        FuzzyDedupPipeline(spark, cfg, os.path.join(tmp, "warm_ckpt")).run(
            spark.read.parquet(os.path.join(tmp, "warm"))
        )
        src = os.path.join(tmp, "clips")
        generate_clips(spark, n_clips, seed=42).write.parquet(src)
        clips = spark.read.parquet(src)
        pipe = FuzzyDedupPipeline(spark, cfg, os.path.join(tmp, "ckpt"))
        t0 = time.time()
        res = pipe.run(clips)
        dt = time.time() - t0
        return {
            "clips": n_clips,
            "sec": round(dt, 3),
            "clips_per_sec": round(n_clips / dt, 1),
            "num_duplicates": res["num_duplicates"],
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _scaling_child(cpus: int, n_clips: int) -> dict:
    """Run the clips pipeline in a fresh JVM at local[cpus]."""
    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "from curator_spark.session import get_spark\n"
        "from bench import run_clips_pipeline\n"
        "spark = get_spark('local[%d]', shuffle_partitions=%d)\n"
        "print('RESULT' + json.dumps(run_clips_pipeline(spark, %d)))\n" % (REPO, cpus, max(cpus * 2, 8), n_clips)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(f"scaling child local[{cpus}] failed: {out.stderr[-2000:]}")


def _wait_clean_window() -> dict:
    """Probe-gate the timed run (VERDICT r03 item 8): this sandbox's
    hypervisor throttles CPU 3-20x in multi-minute waves, and a bench
    launched inside one measures the hypervisor. Poll the 1-core probe
    until it runs clean (<= SPARK_GRAFT_CLEAN_PROBE, default 0.075 s) or
    the bounded wait (SPARK_GRAFT_BENCH_GATE_WAIT, default 900 s)
    expires; either way the gate probe lands in the artifact so readers
    see which regime the numbers come from. Disable with
    SPARK_GRAFT_BENCH_GATE=0."""
    clean = float(os.environ.get("SPARK_GRAFT_CLEAN_PROBE", "0.075"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_WAIT", "900"))
    t0 = time.time()
    while True:
        p = _host_probe()
        p["gate_waited_s"] = round(time.time() - t0, 0)
        p["gate_clean"] = p["matmul_20x512_sec"] <= clean
        if p["gate_clean"] or time.time() - t0 > max_wait:
            return p
        time.sleep(20.0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    gate = None
    if os.environ.get("SPARK_GRAFT_BENCH_GATE", "1") != "0":
        gate = _wait_clean_window()
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    from curator_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(f"local[{cpus}]")
    qs = entrymod.queries()
    # untimed warmup: executor thread spin-up, parquet footer reads, and
    # the first whole-stage-codegen compile otherwise land in whichever
    # query happens to run first (scan_pushdown_filter paid ~3-4 s of
    # session fixed costs in earlier rounds' artifacts)
    try:
        _force(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1000))
    except Exception:
        pass
    times: dict[str, float] = {}
    t_all = time.time()
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        try:
            _force(qs[name](spark, sf_dir))
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failing query must not kill the harness
            errors[name] = str(e).splitlines()[0][:200]

    try:
        clips = run_clips_pipeline(spark, CLIPS_N)
        times["clips_fuzzy_dedup"] = clips["sec"]
    except Exception as e:
        errors["clips_fuzzy_dedup"] = str(e).splitlines()[0][:200]
        clips = {"clips": CLIPS_N, "clips_per_sec": None}
    total = round(time.time() - t_all, 3)

    result = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "clips_per_sec": clips["clips_per_sec"],
        "clips_n": clips["clips"],
        "cpus": int(cpus),
        "host": _host_probe(),
    }
    if gate is not None:
        result["gate_probe"] = gate
        result["steal_delta"] = result["host"]["steal_jiffies"] - gate["steal_jiffies"]
    if errors:
        result["errors"] = errors

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # same rule as the query loop: a failing scaling child must not
        # kill the harness after all the per-query measurements are done
        try:
            spark.stop()
            lo = _scaling_child(8, CLIPS_N)
            hi = _scaling_child(32, CLIPS_N)
            eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / (32 / 8)
            result["scaling"] = {
                "local8_clips_per_sec": lo["clips_per_sec"],
                "local32_clips_per_sec": hi["clips_per_sec"],
                "efficiency_8_to_32": round(eff, 3),
            }
        except Exception as e:  # noqa: BLE001
            result.setdefault("errors", {})["scaling"] = str(e).splitlines()[0][:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
