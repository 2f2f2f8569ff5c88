"""Per-stage checkpointing with lineage manifests.

Mirrors the reference's structural property that every dedup stage
exchanges data through files on shared storage (fuzzy/workflow.py:229-255
wires LSH to read cache_path/MinHashStage), which makes the pipeline
naturally resumable per stage — the north rule's checkpoint/lineage
requirement.

Layout per stage:

    <root>/<stage>/data/...          parquet (or Iceberg table when a
                                     catalog is configured)
    <root>/<stage>/manifest.json     {stage, config_hash, row_count,
                                      files: [{path, bytes}], metrics}

``exists(stage, config_hash)`` gates recomputation: a stage is skipped on
resume iff its manifest is present AND was written under the same config
hash (same role as the reference's persisted fuzzy_id_generator.json,
fuzzy/workflow.py:347-352).

Iceberg note: this sandbox has no iceberg-spark-runtime jar, so the
default writer is plain parquet with an identical per-stage layout; pass
``table_format='iceberg'`` + a configured catalog on a real cluster and
the same manager writes `writeTo(...)` tables instead.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str, table_format: str = "parquet", catalog: str | None = None):
        self.root = root
        self.table_format = table_format
        self.catalog = catalog
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def data_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "data")

    def manifest_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "manifest.json")

    # -- api --------------------------------------------------------------
    def exists(self, stage: str, config_hash: str) -> bool:
        mp = self.manifest_path(stage)
        if not os.path.exists(mp):
            return False
        with open(mp) as f:
            manifest = json.load(f)
        return manifest.get("config_hash") == config_hash and manifest.get("complete", False)

    def write(
        self,
        df: DataFrame,
        stage: str,
        config_hash: str,
        metrics: dict | None = None,
        partition_by: list | None = None,
    ) -> dict:
        path = self.data_path(stage)
        writer = df.write.mode("overwrite")
        if self.table_format == "iceberg" and self.catalog:
            w = df.writeTo(f"{self.catalog}.{stage}")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
        manifest = self._build_manifest(df.sparkSession, stage, config_hash, metrics)
        self._write_manifest(stage, manifest)
        return manifest

    def _write_manifest(self, stage: str, manifest: dict) -> None:
        """Atomic publish (tmp + os.replace): a crash mid-write must leave
        either the previous manifest or none — a truncated manifest.json
        would crash the resume that manifests exist to enable."""
        mp = self.manifest_path(stage)
        tmp = f"{mp}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mp)

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        if self.table_format == "iceberg" and self.catalog:
            return spark.read.format("iceberg").load(f"{self.catalog}.{stage}")
        return spark.read.parquet(self.data_path(stage))

    def add_metrics(self, stage: str, metrics: dict) -> None:
        """Merge extra metrics into an existing stage manifest."""
        m = self.manifest(stage)
        if m is None:
            return
        m.setdefault("metrics", {}).update(metrics)
        self._write_manifest(stage, m)

    def manifest(self, stage: str) -> dict | None:
        mp = self.manifest_path(stage)
        if not os.path.exists(mp):
            return None
        with open(mp) as f:
            return json.load(f)

    def _build_manifest(self, spark: SparkSession, stage: str, config_hash: str, metrics: dict | None) -> dict:
        path = self.data_path(stage)
        files = []
        for dirpath, _dirs, names in os.walk(path):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    fp = os.path.join(dirpath, n)
                    entry = {"path": os.path.relpath(fp, self.root), "bytes": os.path.getsize(fp)}
                    try:  # per-partition lineage: row count from the footer only
                        import pyarrow.parquet as pq

                        entry["rows"] = pq.ParquetFile(fp).metadata.num_rows
                    except Exception:
                        pass
                    files.append(entry)
        if files and all("rows" in f for f in files):
            row_count = sum(f["rows"] for f in files)
        elif self.table_format == "iceberg" and self.catalog:
            # catalog-managed table: no parquet dir under data_path to
            # walk or read — count through the table identifier
            row_count = spark.table(f"{self.catalog}.{stage}").count()
        else:  # remote path not walkable from the driver
            row_count = spark.read.parquet(path).count()
        return {
            "stage": stage,
            "config_hash": config_hash,
            "row_count": row_count,
            "num_files": len(files),
            "files": files,
            "metrics": metrics or {},
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "complete": True,
        }
