"""Multimodal (binary-column) operators: audio decode / feature extraction.

The reference loads waveforms on demand from file paths
(/root/reference/nemo_curator/stages/audio/common.py:294-301) and strips
them before tabular handoff (stages/audio/io/convert.py:37-104). Our input
table inlines clips as a ``binary`` column with typed metadata
(BASELINE.json input_hint), so the Spark-first shape is ``mapInPandas``
over Arrow batches: decode with the pure-numpy kernel, emit scalar feature
columns, and NEVER carry the binary column past this stage (project it
away immediately — at 10^12 rows the bytes must not enter any shuffle).

Codecs beyond pcm_s16le are stubbed behind NotImplementedError in
kernels/audio.py (no decoder libs in this container); the plumbing —
schema, batch shape, partitioning — is codec-agnostic and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernels.audio import decode_clip, energy_vad_segments, estimate_bandwidth, pcm_content_hash

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("n_samples", LongType(), True),
        StructField("decoded_sr_hz", LongType(), True),
        StructField("rms_micro", LongType(), True),
        StructField("peak_micro", LongType(), True),
        StructField("pcm_hash", StringType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def audio_features(
    df: DataFrame,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
) -> DataFrame:
    """(clip_id, bytes, codec, ...) -> scalar per-clip audio features.

    One pass over the binary column; undecodable rows surface in
    ``decode_error`` instead of failing the job (at 10^12 rows a poison
    clip must not kill the stage)."""
    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def extract(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
                    peak = float(np.max(np.abs(samples))) if len(samples) else 0.0
                    rows.append(
                        (cid, len(samples), sr, round(rms * 1e6), round(peak * 1e6),
                         pcm_content_hash(bytes(raw), codec), None)
                    )
                except NotImplementedError as e:
                    rows.append((cid, None, None, None, None, None, f"STUB:{e}"))
                except Exception as e:  # malformed container
                    rows.append((cid, None, None, None, None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return slim.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


RESAMPLE_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("target_sr_hz", LongType(), False),
        StructField("resampled_n_samples", LongType(), True),
        StructField("resampled_rms_micro", LongType(), True),
    ]
)


def resample_features(
    df: DataFrame,
    target_sr_hz: int,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
) -> DataFrame:
    """Linear-interpolation resample to ``target_sr_hz`` then re-extract
    features — the canonicalization step before cross-sample-rate exact
    audio dedup. numpy.interp per clip inside Arrow batches."""
    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                    if sr == target_sr_hz or len(samples) == 0:
                        out = samples
                    else:
                        n_out = max(1, int(round(len(samples) * target_sr_hz / sr)))
                        xi = np.linspace(0.0, len(samples) - 1, n_out)
                        out = np.interp(xi, np.arange(len(samples)), samples).astype(np.float32)
                    rms = float(np.sqrt(np.mean(out.astype(np.float64) ** 2))) if len(out) else 0.0
                    rows.append((cid, target_sr_hz, len(out), round(rms * 1e6)))
                except Exception:
                    rows.append((cid, target_sr_hz, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in RESAMPLE_SCHEMA.fields])

    return slim.mapInPandas(run, schema=RESAMPLE_SCHEMA)


AUDIO_METRICS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("duration_ms", LongType(), True),
        StructField("bandwidth_hz", LongType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def audio_metrics(
    df: DataFrame,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
    n_fft: int = 512,
    stride_seconds: float = 0.01,
    frequency_threshold: float = -50.0,
) -> DataFrame:
    """Per-clip duration + effective bandwidth — GetAudioDurationStage
    (stages/audio/common.py:44-76) and BandwidthEstimationStage
    (stages/audio/metrics/bandwidth.py:29-120) parity over the inline
    binary column. Same poison-row contract as ``audio_features``:
    undecodable clips land in ``decode_error``, never fail the stage."""
    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                    dur_ms = round(1000.0 * len(samples) / sr) if sr else 0
                    bw = estimate_bandwidth(
                        samples, sr, n_fft=n_fft, stride_seconds=stride_seconds,
                        frequency_threshold=frequency_threshold,
                    )
                    rows.append((cid, dur_ms, bw, None))
                except NotImplementedError as e:
                    rows.append((cid, None, None, f"STUB:{e}"))
                except Exception as e:
                    rows.append((cid, None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_METRICS_SCHEMA.fields])

    return slim.mapInPandas(run, schema=AUDIO_METRICS_SCHEMA)


VAD_SEGMENTS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("segment_num", LongType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("duration_ms", LongType(), False),
    ]
)


def vad_segments(
    df: DataFrame,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
    frame_ms: int = 30,
    threshold: float = 0.5,
    min_interval_ms: int = 500,
    min_duration_sec: float = 2.0,
    max_duration_sec: float = 60.0,
    speech_pad_ms: int = 300,
) -> DataFrame:
    """Fan-out: one row per detected speech segment — the reference's
    VADSegmentationStage shape (segmentation/vad_segmentation.py:61-340:
    one AudioTask per segment with start_ms/end_ms/segment_num/duration),
    gated by the model-free energy kernel (kernels/audio.py
    energy_vad_segments; the reference's Silero model is a torch.hub
    download unavailable here — knobs and post-processing order match).
    Undecodable/segment-free clips simply emit no rows (the reference
    returns [] for them too)."""
    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                except Exception:
                    continue
                segs = energy_vad_segments(
                    samples, sr, frame_ms=frame_ms, threshold=threshold,
                    min_interval_ms=min_interval_ms, min_duration_sec=min_duration_sec,
                    max_duration_sec=max_duration_sec, speech_pad_ms=speech_pad_ms,
                )
                rows.extend(
                    (cid, i, s, e, e - s) for i, (s, e) in enumerate(segs)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VAD_SEGMENTS_SCHEMA.fields])

    return slim.mapInPandas(run, schema=VAD_SEGMENTS_SCHEMA)


_PRESERVE_OPS = {
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "ge": lambda c, v: c >= v,
    "gt": lambda c, v: c > v,
}


def preserve_by_value(
    df: DataFrame,
    input_value_key: str,
    target_value,
    operator: str = "eq",
) -> DataFrame:
    """PreserveByValueStage (stages/audio/common.py:77-132): keep rows
    whose ``input_value_key`` compares true against ``target_value`` under
    ``operator`` in {lt, le, eq, ne, ge, gt}.

    A plain ``where`` — the predicate stays declarative so Catalyst pushes
    it into the scan (the reference filters row-dicts per task in Python;
    at 10^12 rows the pushdown is the whole point)."""
    try:
        op = _PRESERVE_OPS[operator]
    except KeyError:
        raise ValueError(f"Operator must be one of: {', '.join(_PRESERVE_OPS)}") from None
    return df.where(op(F.col(input_value_key), F.lit(target_value)))


def frame_sample_stub(df: DataFrame, every_n_ms: int = 1000) -> DataFrame:
    """Video frame sampling — STUB: no video decoder in this container.

    Kept so the multimodal API surface is complete; the real
    implementation is the same mapInPandas shape as ``audio_features``
    (decode bytes -> explode frames -> per-frame feature row)."""
    raise NotImplementedError("STUB: video decode libs not available in this environment")


MONO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("codec", StringType(), False),  # canonical: pcm_s16le
        StructField("sample_rate", LongType(), True),
        StructField("is_mono", BooleanType(), True),
        StructField("src_channels", LongType(), True),
        StructField("num_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def mono_conversion(
    df: DataFrame,
    output_sample_rate: int = 48000,
    strict_sample_rate: bool = True,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
) -> DataFrame:
    """MonoConversionStage (reference
    audio/preprocessing/mono_conversion.py:46-116): decode, mix channels
    to mono by channel mean, verify the sample rate, emit the canonical
    waveform fields (sample_rate / is_mono / duration / num_samples).
    Rows that fail decode, report an invalid rate, or (when
    ``strict_sample_rate``) mismatch ``output_sample_rate`` are DROPPED —
    the reference returns [] for them. Output carries the mono clip
    re-encoded as pcm_s16le WAV in ``bytes`` so downstream stages consume
    one uniform shape; project it away before any shuffle."""
    from ..kernels.audio import decode_clip_info, encode_wav_pcm16

    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    mono, sr, nch = decode_clip_info(bytes(raw), codec)
                except Exception:
                    continue
                if sr <= 0 or (strict_sample_rate and sr != output_sample_rate):
                    continue
                # passthrough fast path only when the source already IS
                # mono pcm_s16le; any other decodable codec re-encodes so
                # the emitted codec label is always truthful
                passthrough = nch == 1 and codec == "pcm_s16le"
                rows.append(
                    (
                        cid,
                        bytes(raw) if passthrough else encode_wav_pcm16(mono, sr),
                        "pcm_s16le",
                        sr,
                        True,
                        nch,
                        len(mono),
                        int(1000 * len(mono) / sr),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MONO_SCHEMA.fields])

    return slim.mapInPandas(run, schema=MONO_SCHEMA)


_MAPPING_STRUCT = StructType(
    [
        StructField("original_start_ms", LongType(), True),
        StructField("original_end_ms", LongType(), True),
        StructField("concat_start_ms", LongType(), True),
        StructField("concat_end_ms", LongType(), True),
        StructField("segment_index", LongType(), True),
    ]
)
CONCAT_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("num_segments", LongType(), True),
        StructField("total_duration_ms", LongType(), True),
        StructField("pcm_hash", StringType(), True),
        StructField("mappings", ArrayType(_MAPPING_STRUCT), True),
    ]
)


def concat_vad_segments(
    df: DataFrame,
    silence_duration_sec: float = 0.5,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
    **vad_kwargs,
) -> DataFrame:
    """VADSegmentationStage(nested=True) + SegmentConcatenationStage
    (reference audio/preprocessing/concatenation.py:69-231) in ONE
    mapInPandas pass: decode -> energy-gate segments -> slice -> rejoin
    with silence gaps -> concat-space->original-space mappings. The
    reference routes this through two stages exchanging per-segment
    waveforms; fusing them means the per-segment audio never leaves the
    scan task — zero shuffle at 10^12 rows. Per-clip output:
    (sample_rate, num_segments, total_duration_ms, pcm_hash of the
    combined waveform, mappings array). Clips with no speech emit no row
    (the reference returns [])."""
    import hashlib

    import numpy as np

    from ..kernels.audio import concat_segments

    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                except Exception:
                    continue
                segs = energy_vad_segments(samples, sr, **vad_kwargs)
                if not segs:
                    continue
                waves = [samples[int(s * sr / 1000) : int(e * sr / 1000)] for s, e in segs]
                combined, mappings = concat_segments(
                    waves, segs, sr, silence_duration_sec=silence_duration_sec
                )
                q = np.round(np.clip(combined, -1.0, 1.0) * 32767.0).astype("<i2")
                h = hashlib.md5(str(sr).encode() + q.tobytes()).hexdigest()
                rows.append(
                    (
                        cid,
                        sr,
                        len(mappings),
                        mappings[-1]["concat_end_ms"] if mappings else 0,
                        h,
                        [tuple(m.values()) for m in mappings],
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in CONCAT_SCHEMA.fields])

    return slim.mapInPandas(run, schema=CONCAT_SCHEMA)


def translate_concat_spans(mappings, concat_start_ms, concat_end_ms):
    """TimestampMapperStage span translation as a pure Column expression
    (reference audio/postprocessing/timestamp_mapper.py:75-103): intersect
    the concat-space span [concat_start_ms, concat_end_ms) with each
    mapping and shift the overlap into original-clip coordinates. Array
    higher-order functions — JVM-side, no UDF; returns
    array<struct<original_start_ms, original_end_ms, duration_ms>>."""
    s = F.lit(concat_start_ms) if isinstance(concat_start_ms, int) else concat_start_ms
    e = F.lit(concat_end_ms) if isinstance(concat_end_ms, int) else concat_end_ms
    hit = F.filter(
        mappings,
        lambda m: (m["concat_end_ms"] > s) & (m["concat_start_ms"] < e),
    )
    return F.transform(
        hit,
        lambda m: F.struct(
            (m["original_start_ms"] + F.greatest(s, m["concat_start_ms"]) - m["concat_start_ms"]).alias(
                "original_start_ms"
            ),
            (m["original_start_ms"] + F.least(e, m["concat_end_ms"]) - m["concat_start_ms"]).alias(
                "original_end_ms"
            ),
            (F.least(e, m["concat_end_ms"]) - F.greatest(s, m["concat_start_ms"])).alias("duration_ms"),
        ),
    )


def band_features(
    df: DataFrame,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
) -> DataFrame:
    """BandFilterStage feature extraction (reference audio/filtering/
    band_filter_module/features.py:66-119): BS.1770 integrated loudness
    (LUFS), loudness-normalize to -25 LUFS, then the 24-band relative
    energy profile in dB (1 kHz bands 0-24 kHz, 12 dB/14 kHz roll-off
    penalty above 10 kHz, above-Nyquist bands at -120). One mapInPandas
    over (id, bytes, codec) — bytes projected away before any shuffle.
    The classifier the reference feeds these into is a joblib artifact
    from HF Hub (unavailable here); see ``band_filter`` for the
    injectable-predictor plumbing."""
    from ..kernels.audio import BAND_DEFINITIONS, band_energy_features

    band_cols = [f"band_energy_{b}" for b in BAND_DEFINITIONS]
    schema = StructType(
        [
            StructField(id_field, StringType(), False),
            StructField("lufs", DoubleType(), True),
            *[StructField(c, DoubleType(), True) for c in band_cols],
            StructField("decode_error", StringType(), True),
        ]
    )
    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def run(batches):
        from ..kernels.audio import decode_clip

        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                    feats = band_energy_features(samples, sr)
                    lufs = feats.pop("lufs")
                    rows.append(
                        (cid, lufs if np.isfinite(lufs) else None,
                         *[feats[c] for c in band_cols], None)
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append((cid, None, *([None] * len(band_cols)),
                                 f"{type(exc).__name__}: {exc}"[:160]))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return slim.mapInPandas(run, schema=schema)


def band_filter(
    df: DataFrame,
    predictor,
    band_value: str = "full_band",
    id_field: str = "clip_id",
) -> DataFrame:
    """BandFilterStage analog (reference audio/filtering/band.py): keep
    rows the predictor labels ``band_value``. ``predictor`` is a
    callable ``dict[band_energy_*..] -> str`` standing in for the
    reference's HF-hosted joblib model (an honest injectable seam, the
    TokenCountFilter pattern); pass e.g. a thresholded rule or a loaded
    sklearn model where one exists. Runs on ``band_features`` output —
    features compute once, the verdict joins back by id."""
    if predictor is None:
        raise NotImplementedError(
            "STUB: the reference's band classifier is a joblib artifact on "
            "HF Hub, unavailable in this environment — inject a predictor "
            "callable (features dict -> 'full_band'|'narrow_band')"
        )
    feats = band_features(df, id_field=id_field)
    band_cols = [c for c in feats.columns if c.startswith("band_energy_")]

    @F.pandas_udf(StringType())
    def predict_udf(*cols: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*cols):
            if any(v is None or (isinstance(v, float) and np.isnan(v)) for v in vals):
                out.append(None)
            else:
                out.append(predictor(dict(zip(band_cols, vals))))
        return pd.Series(out)

    labeled = feats.where(F.col("decode_error").isNull()).select(
        id_field, predict_udf(*[F.col(c) for c in band_cols]).alias("band_label")
    )
    keep = labeled.where(F.col("band_label") == band_value).select(id_field)
    return df.join(keep, id_field, "left_semi")


def asr_inference(
    df: DataFrame,
    recognizer=None,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
    pred_text_field: str = "pred_text",
    batch_size: int = 16,
) -> DataFrame:
    """InferenceAsrNemoStage analog (reference audio/inference/asr/
    asr_nemo.py:30-130): attach a predicted transcription column.

    The reference runs a NeMo ASR checkpoint per batch; no speech model
    exists in this container, so ``recognizer`` is an injectable seam —
    a callable ``list[(float32 samples, sr)] -> list[str]`` invoked on
    Arrow-batched, decoded PCM in chunks of ``batch_size`` (mirroring
    the reference's ``process_batch`` batched-GPU shape: decode fans in
    per task, the recognizer sees contiguous batches). ``None`` raises
    the honest STUB error. Downstream this feeds ``compute_wer``
    (metrics/wer.py parity), completing the ASR->WER pipeline shape.
    """
    if recognizer is None:
        raise NotImplementedError(
            "STUB: no ASR model available in this environment — inject a "
            "recognizer callable (list[(samples, sr)] -> list[str])"
        )
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))
    schema = StructType(
        [
            StructField(id_field, StringType(), False),
            StructField(pred_text_field, StringType(), True),
            StructField("asr_error", StringType(), True),
        ]
    )

    def run(batches):
        from ..kernels.audio import decode_clip

        for pdf in batches:
            ids, pcm, errs = [], [], {}
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    pcm.append(decode_clip(bytes(raw), codec))
                    ids.append(cid)
                except Exception as exc:  # noqa: BLE001
                    errs[cid] = f"{type(exc).__name__}: {exc}"[:160]
            preds = {}
            for i in range(0, len(pcm), batch_size):
                chunk_ids = ids[i : i + batch_size]
                try:
                    texts = list(recognizer(pcm[i : i + batch_size]))
                    if len(texts) != len(chunk_ids):
                        # zip would silently truncate/misalign: mark every
                        # clip in the chunk with an auditable error instead
                        raise ValueError(
                            f"recognizer returned {len(texts)} results "
                            f"for {len(chunk_ids)} clips"
                        )
                    preds.update(dict(zip(chunk_ids, texts)))
                except Exception as exc:  # noqa: BLE001
                    for cid in chunk_ids:
                        errs[cid] = f"{type(exc).__name__}: {exc}"[:160]
            rows = []
            for cid in pdf[id_field]:
                if cid in errs:
                    rows.append((cid, None, errs[cid]))
                else:
                    rows.append((cid, preds.get(cid), None))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return slim.mapInPandas(run, schema=schema)


SPEAKER_SEGMENTS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("speaker", StringType(), False),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
    ]
)


def speaker_segment_postprocess(
    segments: DataFrame,
    exclude_overlaps: bool = False,
    buffer_time: float = 0.5,
    gap_threshold: float = 0.1,
    min_duration: float = 2.0,
    id_field: str = "clip_id",
) -> DataFrame:
    """SpeakerSeparationStage post-model chain (reference
    speaker_separation_module/speaker_sep.py:387-447) over a long-format
    (clip_id, speaker, start, end) frame: per-clip overlap policy
    (clean-cut, or exclude-with-buffer), adjacent-segment merge, short-
    segment drop. applyInPandas grouped on clip_id — the per-clip event
    timeline is bounded, the corpus parallelizes by clip."""

    def per_clip(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.diarization import postprocess_speaker_segments

        # the group frame carries the POST-rename id column, so a custom
        # id_field must not be read here (it was aliased to clip_id below)
        cid = pdf["clip_id"].iloc[0]
        by_spk: dict = {}
        for r in pdf.itertuples(index=False):
            by_spk.setdefault(r.speaker, []).append((float(r.start), float(r.end)))
        out = postprocess_speaker_segments(
            by_spk,
            exclude=exclude_overlaps,
            buffer_time=buffer_time,
            gap_threshold=gap_threshold,
            min_duration=min_duration,
        )
        rows = [
            (cid, spk, s, e)
            for spk in sorted(out)
            for s, e in out[spk]
        ]
        return pd.DataFrame(
            rows, columns=[f.name for f in SPEAKER_SEGMENTS_SCHEMA.fields]
        )

    slim = segments.select(
        F.col(id_field).alias("clip_id"),
        F.col("speaker"),
        F.col("start").cast("double"),
        F.col("end").cast("double"),
    )
    return slim.groupBy("clip_id").applyInPandas(per_clip, SPEAKER_SEGMENTS_SCHEMA)


def speaker_separation(
    clips: DataFrame,
    diarizer=None,
    exclude_overlaps: bool = False,
    buffer_time: float = 0.5,
    gap_threshold: float = 0.1,
    min_duration: float = 2.0,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
) -> DataFrame:
    """SpeakerSeparationStage analog: diarize each clip with the
    injectable ``diarizer`` callable ``(samples, sr) -> dict[speaker ->
    [(start, end), ...]]`` (the reference loads a pyannote pipeline —
    unavailable here; None raises the honest STUB), then the
    deterministic post-processing chain. Output: one row per final
    (clip, speaker, segment)."""
    if diarizer is None:
        raise NotImplementedError(
            "STUB: no diarization model in this environment — inject a "
            "diarizer callable ((samples, sr) -> {speaker: [(start, end)]})"
        )
    slim = clips.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))

    def run(batches):
        from ..kernels.audio import decode_clip
        from ..kernels.diarization import postprocess_speaker_segments

        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                    segs = postprocess_speaker_segments(
                        diarizer(samples, sr),
                        exclude=exclude_overlaps,
                        buffer_time=buffer_time,
                        gap_threshold=gap_threshold,
                        min_duration=min_duration,
                    )
                    for spk in sorted(segs):
                        rows.extend((cid, spk, s, e) for s, e in segs[spk])
                except Exception:  # noqa: BLE001 - poison clip: skip, no rows
                    continue
            yield pd.DataFrame(
                rows, columns=[f.name for f in SPEAKER_SEGMENTS_SCHEMA.fields]
            )

    return slim.mapInPandas(run, schema=SPEAKER_SEGMENTS_SCHEMA)


def audio_score_filter(
    df: DataFrame,
    scorer=None,
    threshold: float | None = None,
    keep_above: bool = True,
    score_field: str = "score",
    target_sample_rate: int | None = 16000,
    id_field: str = "clip_id",
    bytes_field: str = "bytes",
    codec_field: str = "codec",
) -> DataFrame:
    """Model-scored audio quality gate — the common shape behind the
    reference's UTMOSFilterStage (filtering/utmos.py:92-243, MOS >=
    threshold), SIGMOSFilterStage (filtering/sigmos.py) and SQUIM
    metrics (metrics/squim.py): resample to the model's rate, score each
    clip, attach the score, drop rows failing the threshold.

    ``scorer`` is the injectable model seam (the reference loads
    torch/HF checkpoints unavailable here): a callable
    ``(float32 samples, sr) -> float``. ``threshold=None`` attaches
    scores without filtering (the reference's disable mode). Scores
    land in ``score_field`` so one call per model composes —
    utmos/sigmos/squim are just three scorers."""
    if scorer is None:
        raise NotImplementedError(
            "STUB: no audio-quality model in this environment — inject a "
            "scorer callable ((samples, sr) -> float)"
        )
    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(codec_field))
    schema = StructType(
        [
            StructField(id_field, StringType(), False),
            StructField(score_field, DoubleType(), True),
        ]
    )

    def run(batches):
        from ..kernels.alm import slice_mono_resample
        from ..kernels.audio import decode_clip

        for pdf in batches:
            rows = []
            for cid, raw, codec in zip(pdf[id_field], pdf[bytes_field], pdf[codec_field]):
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                    if target_sample_rate and sr != target_sample_rate:
                        sliced = slice_mono_resample(
                            samples, sr, 0.0, len(samples) / sr, target_sample_rate
                        )
                        if sliced is None:
                            rows.append((cid, None))
                            continue
                        samples, sr = sliced[0], target_sample_rate
                    rows.append((cid, float(scorer(samples, sr))))
                except Exception:  # noqa: BLE001 - poison clip: null score
                    rows.append((cid, None))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    scored = slim.mapInPandas(run, schema=schema)
    out = df.join(scored, id_field)
    if threshold is None:
        return out
    cond = (
        F.col(score_field) >= threshold if keep_above else F.col(score_field) <= threshold
    )
    return out.where(cond)


MERGED_SEGMENTS_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("seg_idx", LongType(), False),
        StructField("speaker", StringType(), True),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
        StructField("text", StringType(), False),
        StructField(
            "words",
            ArrayType(
                StructType(
                    [
                        StructField("word", StringType(), True),
                        StructField("start", DoubleType(), True),
                        StructField("end", DoubleType(), True),
                    ]
                )
            ),
            False,
        ),
    ]
)


def merge_alignment_diarization(
    words: DataFrame,
    segments: DataFrame,
    id_field: str = "audio_id",
) -> DataFrame:
    """MergeAlignmentDiarizationStage analog (reference stages/audio/
    tagging/merge_alignment_diarization.py:63-178): fold each file's ASR
    word alignment into its diarization segments — fully-contained words
    join their segment, straddlers go to the better-overlapped neighbor,
    gap words drop. The Spark shape is a COGROUP on the file id (two
    frames, one shuffle each, kernel per group); output segments carry
    ``text`` + ``words`` and feed the ALM window builder directly.

    ``words``: (id, word, start, end). ``segments``: (id, speaker,
    start, end)."""

    def per_file(wpdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.diarization import align_words_to_segments

        if len(spdf) == 0:
            return pd.DataFrame(
                [], columns=[f.name for f in MERGED_SEGMENTS_SCHEMA.fields]
            )
        aid = spdf[id_field].iloc[0]
        alignment = [
            {"word": r.word, "start": float(r.start), "end": float(r.end)}
            for r in wpdf.itertuples(index=False)
        ]
        segs = [
            {"speaker": r.speaker, "start": float(r.start), "end": float(r.end)}
            for r in spdf.itertuples(index=False)
        ]
        merged = align_words_to_segments(alignment, segs)
        rows = [
            {
                "audio_id": aid,
                "seg_idx": i,
                "speaker": s.get("speaker"),
                "start": s["start"],
                "end": s["end"],
                "text": s["text"],
                "words": s["words"],
            }
            for i, s in enumerate(merged)
        ]
        return pd.DataFrame(
            rows, columns=[f.name for f in MERGED_SEGMENTS_SCHEMA.fields]
        )

    return (
        words.groupBy(id_field)
        .cogroup(segments.groupBy(id_field))
        .applyInPandas(per_file, MERGED_SEGMENTS_SCHEMA)
    )


def add_non_speaker_segments(
    segments: DataFrame,
    durations: DataFrame,
    max_length: float | None = None,
    id_field: str = "audio_id",
) -> DataFrame:
    """Fill diarization gaps with 'no-speaker' segments (reference
    stages/audio/tagging/utils.py:47-95 ``add_non_speaker_segments``):
    one gap per silence between consecutive segments (in start order —
    the reference tracks the PREVIOUS segment's end, not the running
    max), a leading gap from 0 and a trailing gap to the file duration,
    optionally chunked to ``max_length``.

    Fully declarative and deliberately UNION-FREE: each input row emits
    its own segment plus any gap before it (and after it, for the last
    row) through ONE ``explode`` of a filtered struct array — the
    self-union shape that crashed Catalyst's constraint propagation in
    r03 never appears. ``segments``: (id, speaker, start, end);
    ``durations``: (id, duration_sec). Output start-ordered per file.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_field).orderBy("start", "end")
    base = (
        segments.select(
            id_field,
            "speaker",
            F.col("start").cast("double"),
            F.col("end").cast("double"),
        )
        .join(durations.select(id_field, F.col("duration_sec").cast("double")), id_field)
        .withColumn("_prev_end", F.coalesce(F.lag("end").over(w), F.lit(0.0)))
        .withColumn("_is_last", F.row_number().over(
            Window.partitionBy(id_field).orderBy(F.desc("start"), F.desc("end"))
        ) == 1)
    )
    seg_struct = F.struct(
        F.col("speaker").alias("speaker"),
        F.col("start").alias("s"),
        F.col("end").alias("e"),
    )
    lead_gap = F.when(
        F.col("start") > F.col("_prev_end"),
        F.struct(
            F.lit("no-speaker").alias("speaker"),
            F.col("_prev_end").alias("s"),
            F.col("start").alias("e"),
        ),
    )
    tail_gap = F.when(
        F.col("_is_last") & (F.col("end") < F.col("duration_sec")),
        F.struct(
            F.lit("no-speaker").alias("speaker"),
            F.col("end").alias("s"),
            F.col("duration_sec").alias("e"),
        ),
    )
    pieces = F.filter(
        F.array(lead_gap, seg_struct, tail_gap), lambda x: x.isNotNull()
    )
    exploded = base.select(id_field, F.explode(pieces).alias("p")).select(
        id_field,
        F.col("p.speaker").alias("speaker"),
        F.col("p.s").alias("start"),
        F.col("p.e").alias("end"),
    )
    if max_length is None:
        return exploded.orderBy(id_field, "start")
    L = float(max_length)
    n_chunks = F.ceil((F.col("end") - F.col("start")) / L).cast("int")
    chunked = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.struct(
            (F.col("start") + i.cast("double") * L).alias("s"),
            F.least(F.col("start") + (i.cast("double") + 1) * L, F.col("end")).alias("e"),
        ),
    )
    # only silence gets chunked; real speaker segments pass through whole
    chunks = F.when(F.col("speaker") == "no-speaker", chunked).otherwise(
        F.array(F.struct(F.col("start").alias("s"), F.col("end").alias("e")))
    )
    return (
        exploded.select(id_field, "speaker", F.explode(chunks).alias("c"))
        .select(
            id_field,
            "speaker",
            F.col("c.s").alias("start"),
            F.col("c.e").alias("end"),
        )
        .where(F.col("end") > F.col("start"))
        .orderBy(id_field, "start")
    )


def audio_data_filter_pipeline(
    clips: DataFrame,
    enable_vad: bool = True,
    diarizer=None,
    scorers: dict | None = None,
    output_sample_rate: int = 16000,
    strict_sample_rate: bool = False,
    vad_min_duration_sec: float = 2.0,
    vad_min_interval_ms: int = 500,
    speaker_min_duration: float = 2.0,
    id_field: str = "clip_id",
) -> DataFrame:
    """AudioDataFilterStage composite (reference audio/advanced_pipelines/
    audio_data_filter/audio_data_filter.py:59-140): the clean-segment
    extraction topology — MonoConversion, then VAD segmentation or
    speaker separation (the reference's four combos collapse to which of
    the two segmenters runs; both model seams here), then the
    model-scored quality gates per segment, resolved to original-file
    timestamps.

    ``scorers``: ``{name: (scorer, threshold, keep_above)}`` — each is a
    ``audio_score_filter`` pass over the segment audio (the reference's
    BandFilter/UTMOS/SIGMOS slots; models are HF/torch artifacts absent
    here, so they are injectable callables). ``diarizer`` enables the
    speaker path (combo 3/4); with neither VAD nor diarizer the whole
    clip is one segment (combo 1).

    Output: (clip_id, speaker, start, end) per surviving segment in
    ORIGINAL timeline seconds, plus one score column per scorer. Plans:
    segments never leave the cluster; each scorer pass is one
    extract+score mapInPandas over the (plan join clips) exchange."""
    from ..operators.alm import extract_snippets

    mono = mono_conversion(
        clips,
        output_sample_rate=output_sample_rate,
        strict_sample_rate=strict_sample_rate,
        id_field=id_field,
    )
    if scorers:
        # mono feeds BOTH the segmenter and the snippet extraction below —
        # materialize once (lazy lineage truncation) or the full audio
        # decode + re-encode runs per consumer
        mono = mono.localCheckpoint(eager=False)
    if diarizer is not None:
        segs = speaker_separation(
            mono, diarizer=diarizer, min_duration=speaker_min_duration,
            id_field="clip_id",
        )
    elif enable_vad:
        segs = vad_segments(
            mono, min_duration_sec=vad_min_duration_sec,
            min_interval_ms=vad_min_interval_ms,
        ).select(
            "clip_id",
            F.lit(None).cast("string").alias("speaker"),
            (F.col("start_ms") / 1000.0).alias("start"),
            (F.col("end_ms") / 1000.0).alias("end"),
        )
    else:
        segs = mono.select(
            "clip_id",
            F.lit(None).cast("string").alias("speaker"),
            F.lit(0.0).alias("start"),
            (F.col("duration_ms") / 1000.0).alias("end"),
        )
    if not scorers:
        return segs.select("clip_id", "speaker", "start", "end")

    # segs feeds both the snippet plan and the final join — materialize
    # once or VAD/diarization re-runs per consumer
    segs = segs.localCheckpoint(eager=False)

    plan = segs.select(F.col("clip_id").alias("audio_id"), "start", "end")
    snippets = extract_snippets(
        mono.withColumnRenamed("clip_id", "audio_id"),
        plan,
        target_sample_rate=output_sample_rate,
    ).where(F.col("extract_error").isNull()).withColumn(
        "codec", F.lit("pcm_s16le")
    )
    kept = snippets
    for name, (scorer, threshold, keep_above) in scorers.items():
        kept = audio_score_filter(
            kept, scorer=scorer, threshold=threshold, keep_above=keep_above,
            score_field=name, target_sample_rate=None, id_field="snippet_id",
        )
    score_cols = list(scorers.keys())
    return (
        segs.join(
            kept.select(
                F.col("audio_id").alias("clip_id"), "start", "end", *score_cols
            ),
            ["clip_id", "start", "end"],
            "inner",
        ).select("clip_id", "speaker", "start", "end", *score_cols)
    )


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("mean_luma_micro", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def image_features(
    df: DataFrame,
    decoder=None,
    id_field: str = "image_id",
    bytes_field: str = "bytes",
    format_field: str = "format",
) -> DataFrame:
    """Image decode / feature extraction over an opaque binary column —
    the image analogue of ``audio_features`` (reference image stages
    ``stages/image/*`` need PIL/DALI, absent here). The Spark plumbing
    (schema, Arrow batching, poison-row contract, bytes projected away
    before any shuffle) is real and tested; the decode itself is the
    injectable seam: ``decoder(bytes, format) -> HxWxC uint8 ndarray``.
    Without a decoder, every row lands in ``decode_error`` with the
    honest STUB marker (never a job failure — at 10^12 rows a missing
    codec must degrade, not kill)."""
    import hashlib

    slim = df.select(F.col(id_field), F.col(bytes_field), F.col(format_field))

    def run(batches):
        for pdf in batches:
            rows = []
            for iid, raw, fmt in zip(pdf[id_field], pdf[bytes_field], pdf[format_field]):
                if decoder is None:
                    rows.append((iid, None, None, None, None, None,
                                 "STUB: no image decoder in this environment"))
                    continue
                try:
                    arr = np.asarray(decoder(bytes(raw), fmt))
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    h, w, c = arr.shape
                    luma = float(arr.astype(np.float64).mean()) / 255.0
                    rows.append(
                        (iid, w, h, c, round(luma * 1e6),
                         hashlib.md5(arr.tobytes()).hexdigest(), None)
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append((iid, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:160]))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return slim.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
