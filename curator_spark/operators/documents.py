"""Document-module operators: AddId, DocumentSplitter, DocumentJoiner.

Reference counterparts:
- AddId (stages/text/modules/add_id.py:23-80): string ids
  "{prefix}_{task_uuid}_{i}" — unique across the dataset because the task
  uuid scopes the sequential index.
- DocumentSplitter (modules/splitter.py:19-70): split text on a separator
  into one row per segment + segment_id.
- DocumentJoiner (modules/joiner.py:23-140): inverse of the splitter;
  optional greedy max_length re-chunking.

Spark-first: AddId and the splitter/basic joiner are pure Column
expressions (codegen, zero Python). The max_length joiner is inherently
sequential per document, so it runs as a per-document fold inside one
JVM ``aggregate`` expression — still no Python, one shuffle on the
document id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_id(
    df: DataFrame,
    id_field: str = "id",
    prefix: str | None = None,
    overwrite: bool = False,
) -> DataFrame:
    """Add a unique STRING id "{prefix}_{partition}_{index}".

    The (partition, local index) pair plays the reference's
    (task_uuid, i) role (add_id.py:71-74): unique across the dataset, no
    shuffle, no driver round-trip — it is decoded from
    ``monotonically_increasing_id`` (pid << 33 | local index).
    """
    if id_field in df.columns and not overwrite:
        raise ValueError(f"Column '{id_field}' already exists. Set overwrite=True to replace it.")
    mono = F.monotonically_increasing_id()
    parts = [F.lit(prefix)] if prefix else []
    parts += [
        F.shiftrightunsigned(mono, 33).cast("string"),
        (mono.bitwiseAND(F.lit((1 << 33) - 1))).cast("string"),
    ]
    return df.withColumn(id_field, F.concat_ws("_", *parts))


def document_splitter(
    df: DataFrame,
    separator: str,
    text_field: str = "text",
    segment_id_field: str = "segment_id",
) -> DataFrame:
    """One row per separator-delimited segment + 0-based segment_id
    (splitter.py:19-70). ``split`` with a regex-escaped literal separator;
    posexplode preserves order as the segment id."""
    import re

    seg = F.posexplode(F.split(F.col(text_field), re.escape(separator)))
    others = [c for c in df.columns if c != text_field]
    return df.select(*others, seg.alias(segment_id_field, text_field))


def document_joiner(
    df: DataFrame,
    separator: str,
    text_field: str = "text",
    segment_id_field: str = "segment_id",
    document_id_field: str = "id",
    drop_segment_id_field: bool = True,
    max_length: int | None = None,
    length_field: str | None = None,
) -> DataFrame:
    """Rejoin split documents in segment order (joiner.py:23-140).

    Without ``max_length``: groupBy(doc) + sort_array(collect_list(struct))
    + concat_ws — pure JVM, one shuffle on the document id.

    With ``max_length``: the reference's greedy accumulation (never exceed
    ``max_length`` counting ``length_field`` + separator overhead; an
    oversize chunk starts a new output segment). Sequential per document,
    expressed as a single ``aggregate`` fold over the sorted segment
    array — still JVM-side.
    """
    if (max_length is None) != (length_field is None):
        raise ValueError("max_length and length_field must be specified together")
    segs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(segment_id_field).alias("i"),
                F.col(text_field).alias("t"),
                *( [F.col(length_field).alias("l")] if length_field else [] ),
            )
        )
    )
    grouped = df.groupBy(document_id_field).agg(segs.alias("_segs"))
    if max_length is None:
        out = grouped.select(
            document_id_field,
            F.concat_ws(separator, F.transform("_segs", lambda s: s["t"])).alias(text_field),
            *( [F.lit(0).alias(segment_id_field)] if not drop_segment_id_field else [] ),
        )
        return out

    sep_len = len(separator)
    # greedy fold: acc = (finished chunks array<struct<t,l>>, cur text, cur len)
    fold = F.aggregate(
        F.col("_segs"),
        F.struct(
            F.lit(None).cast("array<struct<t:string,l:long>>").alias("done"),
            F.lit(None).cast("string").alias("cur"),
            F.lit(0).cast("long").alias("len"),
        ),
        lambda acc, s: F.when(
            acc["cur"].isNull(),
            F.struct(
                F.coalesce(acc["done"], F.array().cast("array<struct<t:string,l:long>>")).alias("done"),
                s["t"].alias("cur"),
                s["l"].cast("long").alias("len"),
            ),
        ).otherwise(
            F.when(
                acc["len"] + s["l"] + sep_len <= max_length,
                F.struct(
                    acc["done"].alias("done"),
                    F.concat(acc["cur"], F.lit(separator), s["t"]).alias("cur"),
                    (acc["len"] + s["l"] + sep_len).alias("len"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(
                        acc["done"],
                        F.array(F.struct(acc["cur"].alias("t"), acc["len"].alias("l"))),
                    ).alias("done"),
                    s["t"].alias("cur"),
                    s["l"].cast("long").alias("len"),
                )
            )
        ),
        lambda acc: F.when(
            acc["cur"].isNull(), F.coalesce(acc["done"], F.array().cast("array<struct<t:string,l:long>>"))
        ).otherwise(
            F.concat(
                F.coalesce(acc["done"], F.array().cast("array<struct<t:string,l:long>>")),
                F.array(F.struct(acc["cur"].alias("t"), acc["len"].alias("l"))),
            )
        ),
    )
    chunks = grouped.select(document_id_field, F.posexplode(fold).alias(segment_id_field, "_c"))
    out = chunks.select(
        document_id_field,
        F.col("_c.t").alias(text_field),
        F.col("_c.l").alias(length_field),
        *( [F.col(segment_id_field)] if not drop_segment_id_field else [] ),
    )
    return out
