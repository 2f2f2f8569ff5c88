"""Interleaved multimodal (MINT-1T-style) filter stages, Spark-first.

The reference's interleaved pipeline (``stages/interleaved/``) flows
row-wise samples — columns ``sample_id`` (string), ``position`` (int,
-1 for metadata rows), ``modality`` ('text' | 'image' | 'metadata'),
``text_content`` (string), ``binary_content`` (binary) — through filter
stages built on one shared keep-mask contract
(``stages/interleaved/stages.py:66-131`` BaseInterleavedFilterStage):

1. basic row validity (allowed modalities; metadata at position -1,
   content at position >= 0),
2. the stage's content-specific keep mask,
3. then position re-numbering of surviving content rows per sample and
   orphan-metadata removal.

Here each piece is a declarative DataFrame transform: the validity and
ratio masks are pure Column expressions, re-numbering is ONE window
(no self-union — the shape that crashed Catalyst constraint propagation
in r03 never appears), and only the aspect-ratio probe touches Python
(Arrow-batched over the image rows' bytes, via the pure-python header
parser in ``kernels/image.py`` or an injectable opener).

The model-backed interleaved filters (CLIP score, blur, QR-code —
``stages/interleaved/filter/{clip_score,blur,qrcode}_filter.py``) need
torch/cv2 artifacts absent in this container; their data flow is the
same per-image-row scored mask as ``aspect_ratio_filter`` with a
different probe, so an injected callable drops straight into its
``opener`` seam shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

__all__ = [
    "interleaved_row_validity",
    "renumber_interleaved",
    "image_to_text_ratio_filter",
    "aspect_ratio_filter",
]

_ALLOWED_MODALITIES = ("text", "image", "metadata")


def interleaved_row_validity() -> "F.Column":
    """BaseInterleavedFilterStage._basic_row_validity_mask as a Column
    (reference ``stages/interleaved/stages.py:77-86``): modality must be
    one of text/image/metadata; metadata rows sit at position -1 and
    content rows at position >= 0."""
    is_meta = F.col("modality") == "metadata"
    return (
        F.col("modality").isin(*_ALLOWED_MODALITIES)
        & ((is_meta & (F.col("position") == -1)) | (~is_meta & (F.col("position") >= 0)))
    )


def renumber_interleaved(df: DataFrame) -> DataFrame:
    """The post-filter normalization every interleaved filter applies
    (reference ``stages.py:120-131``): re-number surviving content rows
    per sample to a dense 0..n-1 ``position`` (in prior-position order)
    and drop metadata rows whose sample no longer has any content row.

    Both steps are windows over ``sample_id`` — one hash exchange total,
    union-free, no Python."""
    is_meta = F.col("modality") == "metadata"
    renum = Window.partitionBy("sample_id", is_meta).orderBy("position")
    per_sample = Window.partitionBy("sample_id")
    return (
        df.withColumn(
            "position",
            F.when(is_meta, F.col("position"))
            .otherwise(F.row_number().over(renum) - 1)
            .cast("int"),
        )
        .withColumn("_n_content", F.sum((~is_meta).cast("int")).over(per_sample))
        .where(~is_meta | (F.col("_n_content") > 0))
        .drop("_n_content")
    )


def image_to_text_ratio_filter(
    df: DataFrame,
    min_ratio: float = 0.0,
    max_ratio: float | None = None,
    drop_invalid_rows: bool = True,
) -> DataFrame:
    """InterleavedImageToTextRatioFilterStage (reference
    ``stages/interleaved/filter/image_to_text_ratio_filter.py:38-71``):
    per sample, ratio = image_count / max(word_count, 1); samples whose
    ratio falls outside [min_ratio, max_ratio] lose ALL their rows.
    Rows with a NULL sample_id always survive (the reference's
    ``fillna(True)``), and — matching the reference's mask order — the
    ratio is computed over the sample's rows BEFORE validity filtering.

    Word counts split ``text_content`` on single spaces (the corpus
    normalization upstream guarantees single-space tokens; the
    reference's ``str.split()`` additionally folds runs of unicode
    whitespace — identical on normalized text). Entirely Column
    expressions: the per-sample stats are ONE window over sample_id, no
    join, no UDF."""
    words = F.when(
        (F.col("modality") == "text")
        & (F.length(F.coalesce(F.col("text_content"), F.lit(""))) > 0),
        F.size(F.split(F.col("text_content"), " ")),
    ).otherwise(F.lit(0))
    per_sample = Window.partitionBy("sample_id")
    n_img = F.sum((F.col("modality") == "image").cast("long")).over(per_sample)
    n_words = F.sum(words).over(per_sample)
    ratio = n_img / F.greatest(n_words, F.lit(1)).cast("double")
    in_range = ratio >= min_ratio
    if max_ratio is not None:
        in_range = in_range & (ratio <= max_ratio)
    keep = F.when(F.col("sample_id").isNull(), F.lit(True)).otherwise(in_range)
    if drop_invalid_rows:
        keep = keep & interleaved_row_validity()
    # window expressions are not allowed directly inside WHERE — project
    # the mask first (one extra column, same single exchange)
    return renumber_interleaved(
        df.withColumn("_keep", keep).where(F.col("_keep")).drop("_keep")
    )


def aspect_ratio_filter(
    df: DataFrame,
    min_aspect_ratio: float = 1.0,
    max_aspect_ratio: float = 2.0,
    opener=None,
    drop_invalid_rows: bool = True,
    bytes_field: str = "binary_content",
) -> DataFrame:
    """InterleavedAspectRatioFilterStage (reference
    ``stages/interleaved/stages.py:134-176``): drop image rows whose
    width/height falls outside [min, max] or whose bytes are missing or
    undecodable; non-image rows pass through to the shared
    re-numbering. The reference reads dimensions via
    ``PIL.Image.open(...).size``; here the default probe is the
    pure-python container-header parser (``kernels/image.py`` —
    PNG/JPEG/GIF/BMP/WEBP without touching pixel data), and ``opener``
    is the injectable seam for anything beyond those containers:
    ``opener(bytes) -> (width, height) | None``.

    Spark shape: ONE Arrow-batched boolean probe over (bytes) — image
    rows only pay it, bytes never join a shuffle key — then the same
    window-based normalization as every interleaved filter."""
    from ..kernels.image import image_dimensions

    probe = opener or image_dimensions

    @F.pandas_udf(BooleanType())
    def _ar_ok(raw: pd.Series) -> pd.Series:
        out = []
        for b in raw:
            if b is None:
                out.append(False)
                continue
            try:
                dims = probe(bytes(b))
            except Exception:  # noqa: BLE001 - poison image: drop the row
                dims = None
            if dims is None or dims[1] <= 0:
                out.append(False)
                continue
            ar = float(dims[0]) / float(dims[1])
            out.append(min_aspect_ratio <= ar <= max_aspect_ratio)
        return pd.Series(out, dtype=bool)

    keep = F.when(F.col("modality") == "image", _ar_ok(F.col(bytes_field))).otherwise(
        F.lit(True)
    )
    if drop_invalid_rows:
        keep = keep & interleaved_row_validity()
    return renumber_interleaved(df.where(keep))
