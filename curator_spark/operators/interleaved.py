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

The content filters (``stages/interleaved/filter/{blur,qrcode,
clip_score,image_to_text_ratio}_filter.py``) are all implemented below
on that shared shape. The blur score (Laplacian variance) is real
pure-numpy math; QR detection and the CLIP embedders are external-lib
capabilities exposed as injectable seams; pixel decode defaults to the
native PNG decoder with a ``decoder`` seam for other containers.
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
    "blur_filter",
    "qrcode_filter",
    "clip_score_filter",
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


def _decode_or_none(decoder, b):
    """Shared decode contract: None bytes / decoder exception / None
    result all mean 'undecodable' (the reference's cv2 decode-failure
    path — the row is dropped, never the job)."""
    if b is None:
        return None
    try:
        return decoder(bytes(b))
    except Exception:  # noqa: BLE001 - poison image: drop the row
        return None


def blur_filter(
    df: DataFrame,
    score_threshold: float = 100.0,
    decoder=None,
    drop_invalid_rows: bool = True,
    bytes_field: str = "binary_content",
) -> DataFrame:
    """InterleavedBlurFilterStage (reference
    ``stages/interleaved/filter/blur_filter.py:51-74``): drop image rows
    whose Laplacian-variance sharpness falls below ``score_threshold``
    (default 100.0), plus rows with missing/undecodable bytes; non-image
    rows pass through to the shared re-numbering.

    The score itself — ``cv2.Laplacian(img, CV_64F).var()`` — is the
    pure-numpy ``kernels/image.py laplacian_variance`` (identical 3x3
    stencil + reflect-101 borders), so only the pixel DECODE needs a
    seam: ``decoder(bytes) -> ndarray | None``. The default decodes
     8-bit PNG natively (``decode_png``); corpora carrying JPEG/WEBP
    pixels inject a cv2/PIL-backed callable (cv2.imdecode + BGR2RGB,
    the reference's ``image_bytes_to_array``).

    Spark shape: ONE Arrow-batched probe over image rows' bytes — bytes
    never key a shuffle — then the shared window normalization."""
    from ..kernels.image import decode_png, laplacian_variance

    probe_decode = decoder or decode_png

    @F.pandas_udf(BooleanType())
    def _sharp_ok(raw: pd.Series) -> pd.Series:
        out = []
        for b in raw:
            img = _decode_or_none(probe_decode, b)
            if img is None:
                out.append(False)
                continue
            try:
                score = laplacian_variance(img)
            except Exception:  # noqa: BLE001
                score = 0.0  # reference: cv2.error -> 0.0 -> dropped
            out.append(score >= score_threshold)
        return pd.Series(out, dtype=bool)

    keep = F.when(F.col("modality") == "image", _sharp_ok(F.col(bytes_field))).otherwise(
        F.lit(True)
    )
    if drop_invalid_rows:
        keep = keep & interleaved_row_validity()
    return renumber_interleaved(df.where(keep))


def qrcode_filter(
    df: DataFrame,
    score_threshold: float = 0.05,
    qr_detector=None,
    decoder=None,
    drop_invalid_rows: bool = True,
    bytes_field: str = "binary_content",
) -> DataFrame:
    """InterleavedQRCodeFilterStage (reference
    ``stages/interleaved/filter/qrcode_filter.py:63-86``): drop image
    rows where detected QR codes cover >= ``score_threshold`` of the
    image area (default 5%), plus missing/undecodable rows.

    QR DETECTION is an external-lib capability (cv2.QRCodeDetector) and
    is therefore the injectable ``qr_detector(ndarray) -> list[quad]``
    seam (each quad = 4 corner points); the coverage math around it —
    shoelace area per quad summed over detections / image area, failure
    -> 0.0 (``_qr_code_ratio``) — runs here via ``kernels/image.py
    quad_area``. Without a detector every decodable image scores 0.0
    and survives, which is the reference's own no-detection behavior,
    so the stage degrades to a decodability gate rather than stubbing.

    Same single-Arrow-probe + window-normalization shape as
    ``blur_filter``."""
    from ..kernels.image import decode_png, quad_area

    probe_decode = decoder or decode_png

    @F.pandas_udf(BooleanType())
    def _qr_ok(raw: pd.Series) -> pd.Series:
        out = []
        for b in raw:
            img = _decode_or_none(probe_decode, b)
            if img is None:
                out.append(False)
                continue
            h, w = img.shape[0], img.shape[1]
            area = float(h * w)
            if area <= 0:
                out.append(True)  # reference: ratio 0.0 -> kept
                continue
            ratio = 0.0
            if qr_detector is not None:
                try:
                    quads = qr_detector(img) or []
                    ratio = sum(quad_area(q) for q in quads) / area
                except Exception:  # noqa: BLE001
                    ratio = 0.0  # reference: cv2.error -> 0.0
            out.append(ratio < score_threshold)
        return pd.Series(out, dtype=bool)

    keep = F.when(F.col("modality") == "image", _qr_ok(F.col(bytes_field))).otherwise(
        F.lit(True)
    )
    if drop_invalid_rows:
        keep = keep & interleaved_row_validity()
    return renumber_interleaved(df.where(keep))


def clip_score_filter(
    df: DataFrame,
    min_score: float = 0.15,
    image_embedder=None,
    text_embedder=None,
    decoder=None,
    drop_invalid_rows: bool = True,
    bytes_field: str = "binary_content",
) -> DataFrame:
    """InterleavedCLIPScoreFilterStage (reference
    ``stages/interleaved/filter/clip_score_filter.py:62-116``): an image
    row survives only if its CLIP similarity against at least one of its
    sample's text rows reaches ``min_score``. Images in samples with no
    non-blank text are dropped; missing/undecodable bytes are dropped.

    The CLIP model is two injectable seams with the reference model
    class's exact surface (``models/clip.py``):
    ``image_embedder(list[ndarray]) -> ndarray[n, d]`` and
    ``text_embedder(list[str]) -> ndarray[m, d]`` (both L2-normalized,
    so ``img @ text.T`` is cosine score). Both are required — a score
    filter cannot be stubbed without silently passing everything.

    Spark shape: the sample's candidate texts ride along as ONE
    ``collect_list`` window over sample_id (the same exchange the
    mandatory re-numbering already performs; text payloads are small —
    bytes still never key a shuffle), then one Arrow-batched probe over
    the image rows embeds each batch's images in a single
    ``image_embedder`` call and caches text embeddings per distinct
    sample text-list within the batch."""
    if image_embedder is None or text_embedder is None:
        raise ValueError(
            "clip_score_filter requires image_embedder and text_embedder "
            "callables (the CLIP model seams)"
        )
    from ..kernels.image import decode_png

    probe_decode = decoder or decode_png

    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(BooleanType())
    def _clip_ok(raw: pd.Series, texts: pd.Series) -> pd.Series:
        import numpy as np

        keep = [False] * len(raw)
        # decode pass: group decodable rows for one batched embed call
        images, img_rows, text_keys = [], [], []
        cleaned_cache: dict[tuple, list] = {}
        for i, (b, tl) in enumerate(zip(raw, texts)):
            tl_key = tuple(tl) if tl is not None else ()
            if tl_key not in cleaned_cache:
                cleaned_cache[tl_key] = [
                    s.strip() for s in tl_key if s is not None and str(s).strip()
                ]
            if not cleaned_cache[tl_key]:
                continue  # no texts in sample -> image dropped (ref :105-109)
            img = _decode_or_none(probe_decode, b)
            if img is None:
                continue
            images.append(img)
            img_rows.append(i)
            text_keys.append(tl_key)
        if images:
            img_emb = np.asarray(image_embedder(images))
            emb_cache: dict[tuple, object] = {}
            for row_pos, (i, tl_key) in enumerate(zip(img_rows, text_keys)):
                if tl_key not in emb_cache:
                    emb_cache[tl_key] = np.asarray(
                        text_embedder(cleaned_cache[tl_key])
                    )
                scores = img_emb[row_pos] @ emb_cache[tl_key].T
                keep[i] = bool(scores.max() >= min_score)
        return pd.Series(keep, dtype=bool)

    per_sample = Window.partitionBy("sample_id")
    sample_texts = F.collect_list(
        F.when(F.col("modality") == "text", F.col("text_content"))
    ).over(per_sample)
    keep = F.when(
        F.col("modality") == "image",
        _clip_ok(F.col(bytes_field), sample_texts.cast(ArrayType(StringType()))),
    ).otherwise(F.lit(True))
    if drop_invalid_rows:
        keep = keep & interleaved_row_validity()
    # window expressions can't sit in WHERE — project the mask first
    return renumber_interleaved(
        df.withColumn("_keep", keep).where(F.col("_keep")).drop("_keep")
    )
