"""Phase-level scaling probe: which pipeline phase anti-scales with cores?

Runs minhash-only, lsh+edges-only, and cc-only at a given core count over
the shared clips table; prints one JSON line per phase.

Usage: python tools/scale_probe.py <cpus> <src_parquet> [extra_conf_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from curator_spark.config import FuzzyDedupConfig  # noqa: E402
from curator_spark.operators.connected_components import connected_components  # noqa: E402
from curator_spark.operators.edges import edges_from_buckets  # noqa: E402
from curator_spark.operators.ids import assign_dedup_ids  # noqa: E402
from curator_spark.operators.lsh import lsh_bucket_ids  # noqa: E402
from curator_spark.operators.minhash_stage import minhash_stage  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    src = sys.argv[2]
    extra = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 8), extra_conf=extra)
    tmp = tempfile.mkdtemp(prefix=f"probe{cpus}_")
    cfg = FuzzyDedupConfig(char_ngrams=12, num_bands=20, minhashes_per_band=4,
                           num_salts=4, bands_per_iteration=20)
    clips = spark.read.parquet(src)

    def t(name, fn):
        t0 = time.time()
        fn()
        print(json.dumps({"phase": name, "cpus": cpus, "sec": round(time.time() - t0, 2)}), flush=True)

    slim = clips.select("clip_id", "transcript")
    wi = assign_dedup_ids(slim, contiguous=False)
    # warm both python workers and codegen
    t("warmup_minhash", lambda: minhash_stage(wi.limit(2000), cfg).write.mode("overwrite").parquet(tmp + "/w"))
    t("minhash", lambda: minhash_stage(wi, cfg).write.mode("overwrite").parquet(tmp + "/sigs"))
    sigs = spark.read.parquet(tmp + "/sigs")
    t("lsh_buckets", lambda: lsh_bucket_ids(sigs, cfg, (0, 20)).write.mode("overwrite").parquet(tmp + "/b"))
    b = spark.read.parquet(tmp + "/b")
    t("warmup_edges", lambda: edges_from_buckets(b.limit(50000), num_salts=4).write.mode("overwrite").parquet(tmp + "/we"))
    t("edges", lambda: edges_from_buckets(b, num_salts=4).write.mode("overwrite").parquet(tmp + "/e"))
    e = spark.read.parquet(tmp + "/e")
    t("cc", lambda: connected_components(e).write.mode("overwrite").parquet(tmp + "/cc"))
    spark.stop()


if __name__ == "__main__":
    main()
