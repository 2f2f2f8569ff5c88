"""Video clipping — the model-free piece, Spark-first.

The reference's video pipeline splits source videos into clips either
with TransNetV2 shot detection (a torch model, out of scope here) or
with ``FixedStrideExtractorStage``
(``stages/video/clipping/clip_extraction_stages.py:350-416``), which is
pure arithmetic over (num_frames, framerate): stride-spaced spans
clamped to the video duration, a minimum-length gate, and a
deterministic ``uuid5(NAMESPACE_URL, f"{file}_{start_event}_{end_event}")``
clip id. The ffmpeg transcode of each span (``ClipTranscodingStage``)
needs a video decoder this container lacks — the span PLAN computed
here is exactly what that stage consumes, and the decode slot follows
the same injectable shape as ``multimodal.frame_sample_stub``.

Everything below is a single Column program (sequence -> transform ->
filter -> explode; the uuid5 is sha1 + RFC 4122 bit surgery, all
built-in functions) — zero UDF, zero shuffle: at web scale the clip
plan is a flat map over the video table.

Deliberate deviation (documented): the reference accumulates
``clip_start += stride`` in a float loop; we compute ``k * stride``,
which is drift-free for long videos. The two differ only by
accumulated float error (~1 ulp per step). The reference's
``limit_clips`` skips videos that ALREADY carry >= limit clips from an
earlier extractor; with no pre-existing clips in a relational flow, the
useful analogue implemented here caps the spans emitted per video.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fixed_stride_clips", "uuid5_column"]

# uuid.NAMESPACE_URL bytes (RFC 4122 appendix C)
_NAMESPACE_URL_HEX = "6ba7b8119dad11d180b400c04fd430c8"


def uuid5_column(name: "F.Column") -> "F.Column":
    """RFC 4122 version-5 UUID of a string Column under NAMESPACE_URL —
    bit-for-bit ``uuid.uuid5(uuid.NAMESPACE_URL, name)`` (the id scheme
    of the reference's Clip dataclass and IdGenerator batch hashes),
    from built-ins only: sha1 over namespace+name, then version/variant
    bit surgery on the hex."""
    h = F.sha1(F.concat(F.unhex(F.lit(_NAMESPACE_URL_HEX)), F.encode(name, "UTF-8")))
    variant = F.lower(
        F.lpad(
            F.hex(
                F.conv(F.substring(h, 17, 2), 16, 10)
                .cast("int")
                .bitwiseAND(F.lit(0x3F))
                .bitwiseOR(F.lit(0x80))
            ),
            2,
            "0",
        )
    )
    return F.concat(
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.lit("5"), F.substring(h, 14, 3), F.lit("-"),
        variant, F.substring(h, 19, 2), F.lit("-"),
        F.substring(h, 21, 12),
    )


def fixed_stride_clips(
    videos: DataFrame,
    clip_len_s: float,
    clip_stride_s: float,
    min_clip_length_s: float,
    limit_clips: int = 0,
    id_col: str = "video_id",
    num_frames_col: str = "num_frames",
    framerate_col: str = "framerate",
) -> DataFrame:
    """FixedStrideExtractorStage (reference clip_extraction_stages.py:
    350-416): one row per clip span — (video_id, clip_uuid, start, end,
    start_event, end_event) with ``duration = num_frames / framerate``,
    spans at ``k * clip_stride_s`` clamped to duration, spans shorter
    than ``min_clip_length_s`` dropped, and frame events truncated like
    the reference's ``int(span * framerate)``. Videos with missing or
    non-positive framerate/num_frames yield no clips (the reference
    marks them in ``video.errors`` and moves on)."""
    if clip_stride_s <= 0:
        raise ValueError("clip_stride_s must be > 0")
    fr = F.col(framerate_col).cast("double")
    dur = F.when(fr > 0, F.col(num_frames_col).cast("double") / fr).otherwise(F.lit(-1.0))
    n = F.ceil(dur / clip_stride_s).cast("int")  # k*stride < duration  =>  k < n
    ks = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    spans = F.filter(
        F.transform(
            ks,
            lambda k: F.struct(
                (k.cast("double") * clip_stride_s).alias("s"),
                F.least(k.cast("double") * clip_stride_s + clip_len_s, dur).alias("e"),
            ),
        ),
        lambda x: (x["e"] - x["s"]) >= min_clip_length_s,
    )
    if limit_clips > 0:
        spans = F.slice(spans, 1, limit_clips)
    out = (
        videos.select(
            F.col(id_col).cast("string").alias("video_id"),
            fr.alias("_fr"),
            F.explode(spans).alias("c"),
        )
        .select(
            "video_id",
            F.col("c.s").alias("start"),
            F.col("c.e").alias("end"),
            (F.col("c.s") * F.col("_fr")).cast("bigint").alias("start_event"),
            (F.col("c.e") * F.col("_fr")).cast("bigint").alias("end_event"),
        )
    )
    name = F.concat(
        F.col("video_id"), F.lit("_"),
        F.col("start_event").cast("string"), F.lit("_"),
        F.col("end_event").cast("string"),
    )
    return out.select(
        "video_id", uuid5_column(name).alias("clip_uuid"),
        "start", "end", "start_event", "end_event",
    )
