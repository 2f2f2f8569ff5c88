"""JSONL read/write surface + audio manifest reader/writer.

Reference counterparts:
- JsonlReaderStage (stages/text/io/reader/jsonl.py:29-50): read a group of
  JSONL files with optional column projection and id assignment.
- JsonlWriter (stages/text/io/writer/jsonl.py:24-49): pandas to_json
  lines-orient records, force_ascii=False.
- read_jsonl (stages/deduplication/io_utils.py:35-41): projection push-down
  at the reader.
- ManifestReaderStage / ManifestWriterStage (stages/audio/common.py:136-291):
  JSONL manifests with one dict per line ({"audio_filepath", "text", ...}).

Spark-first: ``spark.read.json`` is the distributed line-per-record JSONL
reader (splittable, predicate/column pruning applies after parse). At
scale ALWAYS pass ``schema`` — without it Spark runs an extra full scan
to infer types (the reference is spared this because cuDF infers per
file-group; one global inference pass over 100 TB is a real job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.ids import assign_dedup_ids


def read_jsonl(
    spark: SparkSession,
    path: str | list,
    columns: list | None = None,
    schema: str | None = None,
    assign_id: bool = False,
) -> DataFrame:
    """Read JSONL file(s) into a DataFrame.

    ``columns`` projects after parse (Spark prunes the parsed struct —
    unparsed fields of each line are skipped by the Jackson parser).
    ``assign_id`` adds the dedup id column like the reference reader's
    ``_assign_ids`` (io_utils.py:35-41).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if columns:
        df = df.select(*columns)
    if assign_id:
        df = assign_dedup_ids(df, contiguous=False)
    return df


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as JSONL (one JSON object per line, UTF-8 —
    the JsonlWriter contract: lines=True, orient=records,
    force_ascii=False; Spark's JSON sink emits unescaped UTF-8)."""
    df.write.mode(mode).json(path)


MANIFEST_SCHEMA = (
    "audio_filepath string, text string, duration double, offset double, lang string"
)


def read_audio_manifest(
    spark: SparkSession,
    path: str | list,
    schema: str | None = MANIFEST_SCHEMA,
    extra_fields: str | None = None,
) -> DataFrame:
    """Audio JSONL manifest -> DataFrame (ManifestReaderStage semantics:
    one row per manifest line; unknown keys preserved when
    ``schema=None``). The reference streams line-by-line on one worker
    (common.py:147-171); Spark's JSON source splits large manifests across
    executors instead.
    """
    if schema is not None and extra_fields:
        schema = schema + ", " + extra_fields
    return read_jsonl(spark, path, schema=schema)


def write_audio_manifest(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """DataFrame -> JSONL manifest (ManifestWriterStage, common.py:233-291).
    NULL-valued fields are omitted per line (Spark JSON sink behavior),
    matching the reference's sparse dict-per-line layout."""
    write_jsonl(df, path, mode=mode)
