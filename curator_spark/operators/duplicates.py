"""Keep-first duplicate identification, removal anti-join, exact dedup.

Reference semantics:
- keep-first per group -> removal ids (fuzzy/identify_duplicates.py:94-103,
  exact/identification.py:113-122): the reference's
  ``duplicated(keep="first")`` after a shuffle is exactly
  ``row_number() OVER (PARTITION BY group ORDER BY id) > 1``.
- removal = anti-join of input against removal ids
  (text/deduplication/removal.py:61-102) — Spark broadcasts the removal
  side automatically when small; at scale it's a shuffled left-anti join
  with AQE skew handling.
- exact dedup key = md5 of the content columns
  (exact/identification.py:158); for audio we optionally hash the decoded
  canonical PCM instead of the raw container bytes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..config import GROUP_FIELD, ID_FIELD


def identify_duplicates(
    components: DataFrame,
    id_field: str = ID_FIELD,
    group_field: str = GROUP_FIELD,
) -> DataFrame:
    """(id, group) -> ids to remove (all but the min id per group)."""
    w = Window.partitionBy(group_field).orderBy(F.col(id_field))
    return (
        components.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select(id_field)
    )


def remove_duplicates(df: DataFrame, removal_ids: DataFrame, id_field: str = ID_FIELD) -> DataFrame:
    """Anti-join the removal set out of the input."""
    return df.join(removal_ids.select(id_field), on=id_field, how="left_anti")


def exact_hash_key(
    fields: tuple,
    hash_audio_content: bool = False,
    bytes_field: str = "bytes",
    codec_field: str = "codec",
):
    """Column expression: md5 over the LENGTH-PREFIXED content fields,
    optionally including the canonical decoded-PCM hash of the audio.

    Each field is encoded self-delimiting as ``len(s) ':' s`` (NULL ->
    the literal ``'n:'``) before concatenation: a plain separator would
    let field-boundary injection collide distinct rows — ('x\\x1fy','z')
    vs ('x','y\\x1fz') — and scraped/ASR text can contain any control
    character. DuckDB replay of the same encoding in oracle_sql()."""

    def _enc(c):
        s = c.cast("string")
        return F.when(s.isNull(), F.lit("n:")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    parts = [_enc(F.col(f)) for f in fields]
    if hash_audio_content:
        parts = [_enc(_pcm_hash_udf(F.col(bytes_field), F.col(codec_field))), *parts]
    return F.md5(F.concat(*parts))


@F.pandas_udf(StringType())
def _pcm_hash_udf(raw: pd.Series, codec: pd.Series) -> pd.Series:
    from ..kernels.audio import pcm_content_hash

    return pd.Series(
        [
            pcm_content_hash(b, c) if b is not None else ""
            for b, c in zip(raw, codec)
        ]
    )


def exact_duplicates(
    df: DataFrame,
    fields: tuple = ("transcript",),
    id_field: str = ID_FIELD,
    hash_audio_content: bool = False,
) -> DataFrame:
    """(id, *content) -> (id, group) for every member of an exact-dup
    group (group label = md5 key). Pair with identify/remove."""
    key = exact_hash_key(fields, hash_audio_content=hash_audio_content)
    hashed = df.select(F.col(id_field), key.alias(GROUP_FIELD))
    w = Window.partitionBy(GROUP_FIELD)
    return hashed.withColumn("_n", F.count(F.lit(1)).over(w)).where(F.col("_n") > 1).drop("_n")
