"""Audio kernels: pure-numpy WAV(pcm_s16le) codec, content hash, SNR.

The reference keeps audio out-of-band as file paths and loads float32
waveforms on demand (/root/reference/nemo_curator/stages/audio/
common.py:136-175,294-301). Our input table inlines the clip bytes
(BASELINE.json input_hint: ``bytes:binary, sr_hz:int32, codec:string``),
so decode runs inside Arrow UDFs.

Only ``pcm_s16le`` WAV is decodable in this container (no soundfile /
ffmpeg baked in); other codecs raise NotImplementedError behind a
clearly-marked stub — the Spark-side plumbing (schema, batching, UDF
signature) is identical regardless of codec.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

SUPPORTED_CODECS = ("pcm_s16le",)


def encode_wav_pcm16(samples: np.ndarray, sr_hz: int) -> bytes:
    """float32 [-1,1] mono -> RIFF/WAVE pcm_s16le bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    data = ints.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_pcm16(raw: bytes) -> tuple:
    """RIFF/WAVE pcm_s16le bytes -> (float32 mono samples in [-1,1], sr_hz).

    Walks RIFF chunks (fmt/data may not be adjacent); mixes channels to mono.
    """
    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos = 12
    sr_hz = None
    n_channels = 1
    bits = 16
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, sr_hz = struct.unpack("<HHI", body[0:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("STUB: only pcm_s16le WAV decodable in this environment")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr_hz is None or data is None:
        raise ValueError("missing fmt/data chunk")
    ints = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        ints = ints[: len(ints) // n_channels * n_channels].reshape(-1, n_channels).mean(axis=1)
    return (np.asarray(ints, dtype=np.float32) / 32767.0), int(sr_hz)


def decode_clip(raw: bytes, codec: str) -> tuple:
    """Dispatch on the table's codec column."""
    if codec == "pcm_s16le":
        return decode_wav_pcm16(raw)
    # STUB: non-PCM codecs (opus/mp3/flac...) need decoder libs not baked
    # into this container. Plumbing (schema/UDF/batching) is codec-agnostic.
    raise NotImplementedError(f"STUB codec decoder not available here: {codec}")


def pcm_content_hash(raw: bytes, codec: str) -> str:
    """Canonical audio content hash: md5 over the decoded int16 PCM grid.

    Invariant to container framing (header layout, chunk padding), not to
    re-sampling or gain changes — mirrors the reference's exact-dup
    hash-of-content semantics (exact/identification.py:158) applied to audio.
    """
    samples, sr = decode_clip(raw, codec)
    q = np.round(np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    h = hashlib.md5()
    h.update(str(sr).encode())
    h.update(q.tobytes())
    return h.hexdigest()


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``ref`` in dB (per-row
    invariant from input_hint: decoded-PCM allclose at SNR >= 30 dB)."""
    n = min(len(ref), len(test))
    if n == 0:
        return float("inf")
    r = ref[:n].astype(np.float64)
    t = test[:n].astype(np.float64)
    noise = float(np.sum((r - t) ** 2)) + 1e-30
    sig = float(np.sum(r**2)) + 1e-30
    return 10.0 * np.log10(sig / noise)


def _blackmanharris(n: int) -> np.ndarray:
    """Periodic (fftbins) 4-term Blackman-Harris window — what
    scipy.signal.get_window("blackmanharris", n_fft) hands librosa.stft in
    the reference's bandwidth stage (metrics/bandwidth.py:82)."""
    k = np.arange(n)
    a0, a1, a2, a3 = 0.35875, 0.48829, 0.14128, 0.01168
    w = 2.0 * np.pi * k / n
    return a0 - a1 * np.cos(w) + a2 * np.cos(2 * w) - a3 * np.cos(3 * w)


def estimate_bandwidth(
    samples: np.ndarray,
    sr_hz: int,
    n_fft: int = 512,
    stride_seconds: float = 0.01,
    top_db: float = 100.0,
    frequency_threshold: float = -50.0,
) -> int:
    """Effective audio bandwidth in Hz: highest frequency bin whose
    time-averaged power is within ``frequency_threshold`` dB of the peak.

    Reference-parity math (BandwidthEstimationStage,
    stages/audio/metrics/bandwidth.py:77-96): STFT with a Blackman-Harris
    window at hop = sr*stride_seconds, per-bin power averaged over frames,
    librosa-style power_to_db (ref=n_fft, clipped to peak - top_db), then
    a scan from Nyquist downward. Flags upsampled / band-limited audio
    (e.g. 8 kHz telephony re-encoded at 48 kHz) without any model.
    Pure numpy; the reference calls librosa (absent in this container).
    """
    x = np.asarray(samples, dtype=np.float64)
    if len(x) == 0 or sr_hz <= 0:
        return 0
    hop = max(1, int(sr_hz * stride_seconds))
    # librosa.stft(center=True): pad n_fft//2 both sides (constant zeros)
    x = np.pad(x, n_fft // 2)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop]
    spec = np.fft.rfft(frames * _blackmanharris(n_fft), axis=1)
    power = np.mean(np.abs(spec) ** 2, axis=0)
    # librosa.power_to_db(S, ref=n_fft, top_db): 10*log10(max(S,amin)/ref),
    # floor-clipped at peak - top_db
    amin = 1e-10
    db = 10.0 * np.log10(np.maximum(power, amin)) - 10.0 * np.log10(max(float(n_fft), amin))
    db = np.maximum(db, db.max() - top_db)
    peak = db.max()
    freq_width = sr_hz / n_fft
    for idx in range(len(db) - 1, -1, -1):
        if db[idx] - peak > frequency_threshold:
            return int(idx * freq_width)
    return 0


def energy_vad_segments(
    samples: np.ndarray,
    sr_hz: int,
    frame_ms: int = 30,
    threshold: float = 0.5,
    min_interval_ms: int = 500,
    min_duration_sec: float = 2.0,
    max_duration_sec: float = 60.0,
    speech_pad_ms: int = 300,
) -> list:
    """Speech segments [(start_ms, end_ms), ...] by frame-energy gating —
    a MODEL-FREE approximation of VADSegmentationStage
    (stages/audio/segmentation/vad_segmentation.py:61-340; the reference
    gates on Silero VAD probabilities, a torch.hub model unavailable
    here; we gate frame RMS at ``threshold`` x the clip's peak frame
    RMS). The segment post-processing mirrors the reference's knobs and
    order: merge gaps < min_interval_ms, drop segments <
    min_duration_sec, split segments > max_duration_sec, then pad +-
    speech_pad_ms clamped to the clip AND to half the gap toward each
    neighbor (Silero's get_speech_timestamps splits the silence gap
    silence//2 per side), so output segments never overlap — including
    max_duration split chunks, whose shared boundary has gap 0 and
    therefore pad 0 on that side.
    """
    x = np.asarray(samples, dtype=np.float64)
    if len(x) == 0 or sr_hz <= 0:
        return []
    frame = max(1, int(sr_hz * frame_ms / 1000))
    n_frames = len(x) // frame
    if n_frames == 0:
        return []
    rms = np.sqrt(np.mean(x[: n_frames * frame].reshape(n_frames, frame) ** 2, axis=1))
    peak = rms.max()
    if peak <= 0:
        return []
    speech = rms >= threshold * peak
    # runs of consecutive speech frames -> [start_frame, end_frame)
    idx = np.flatnonzero(np.diff(np.concatenate(([0], speech.view(np.int8), [0]))))
    runs = [(int(idx[i]), int(idx[i + 1])) for i in range(0, len(idx), 2)]
    to_ms = 1000.0 / sr_hz * frame
    segs = [(s * to_ms, e * to_ms) for s, e in runs]
    # merge gaps < min_interval_ms
    merged: list = []
    for s, e in segs:
        if merged and s - merged[-1][1] < min_interval_ms:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    # drop short, split long
    out: list = []
    max_ms = max_duration_sec * 1000.0
    for s, e in merged:
        if e - s < min_duration_sec * 1000.0:
            continue
        while e - s > max_ms:
            out.append((s, s + max_ms))
            s += max_ms
        if e - s >= min_duration_sec * 1000.0 or out and out[-1][1] == s:
            out.append((s, e))
    clip_ms = len(x) * 1000.0 / sr_hz
    padded = []
    for i, (s, e) in enumerate(out):
        lpad = float(speech_pad_ms)
        rpad = float(speech_pad_ms)
        if i > 0:
            lpad = min(lpad, (s - out[i - 1][1]) // 2)
        if i + 1 < len(out):
            rpad = min(rpad, (out[i + 1][0] - e) // 2)
        padded.append((int(max(0.0, s - lpad)), int(min(clip_ms, e + rpad))))
    return padded


def decode_clip_info(raw: bytes, codec: str) -> tuple:
    """Like decode_clip but also reports the SOURCE channel count:
    (mono_f32, sr_hz, n_channels). Backs MonoConversionStage parity
    (reference audio/preprocessing/mono_conversion.py:100-111: mono =
    channel mean, which decode_wav_pcm16 already performs)."""
    if codec != "pcm_s16le":
        raise NotImplementedError(f"STUB codec decoder not available here: {codec}")
    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos = 12
    n_channels = 1
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if cid == b"fmt ":
            _, n_channels, _ = struct.unpack("<HHI", raw[pos + 8 : pos + 16])
            break
        pos += 8 + size + (size & 1)
    mono, sr = decode_wav_pcm16(raw)
    return mono, sr, int(n_channels)


def encode_wav_pcm16_stereo(left: np.ndarray, right: np.ndarray, sr_hz: int) -> bytes:
    """2-channel RIFF/WAVE pcm_s16le (interleaved) — test fixture for the
    mono-conversion path."""
    pcm = np.stack([np.clip(left, -1, 1), np.clip(right, -1, 1)], axis=1)
    ints = np.round(pcm * 32767.0).astype("<i2")
    data = ints.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr_hz, sr_hz * 4, 4, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def concat_segments(
    waves: list,
    bounds_ms: list,
    sr_hz: int,
    silence_duration_sec: float = 0.5,
) -> tuple:
    """SegmentConcatenationStage math (reference
    audio/preprocessing/concatenation.py:146-231): concatenate per-segment
    waveforms in order with ``silence_duration_sec`` of zeros between
    consecutive segments (none trailing), and emit concat-space ->
    original-space mappings. ``bounds_ms`` pairs (start_ms, end_ms) in the
    ORIGINAL clip; like the reference, an end <= start is repaired to
    start + the segment's actual duration.

    Returns (combined_f32, mappings) with mappings =
    [{original_start_ms, original_end_ms, concat_start_ms, concat_end_ms,
      segment_index}, ...]; ms values are ints, duration rounding matches
    the reference's int(1000 * n / sr).
    """
    silence_ms = int(silence_duration_sec * 1000)
    silence = np.zeros(int(silence_ms * sr_hz / 1000), dtype=np.float32)
    parts: list = []
    mappings: list = []
    pos_ms = 0
    for i, (w, (s_ms, e_ms)) in enumerate(zip(waves, bounds_ms)):
        w = np.asarray(w, dtype=np.float32)
        dur_ms = int(1000 * len(w) / sr_hz)
        if e_ms <= s_ms:
            e_ms = s_ms + dur_ms
        mappings.append(
            {
                "original_start_ms": int(s_ms),
                "original_end_ms": int(e_ms),
                "concat_start_ms": pos_ms,
                "concat_end_ms": pos_ms + dur_ms,
                "segment_index": i,
            }
        )
        parts.append(w)
        pos_ms += dur_ms
        parts.append(silence)
        pos_ms += silence_ms
    if not parts:
        return np.zeros(0, dtype=np.float32), []
    return np.concatenate(parts[:-1]), mappings


def translate_to_original(mappings: list, concat_start_ms: int, concat_end_ms: int) -> list:
    """TimestampMapperStage span translation (reference
    audio/postprocessing/timestamp_mapper.py:75-103): intersect a
    concat-space span with each mapping and shift the overlap into
    original-clip coordinates. Pure-python reference for tests; the Spark
    path is the array-HOF Column in operators.multimodal.translate_concat_spans."""
    out = []
    for m in mappings:
        if m["concat_end_ms"] <= concat_start_ms or m["concat_start_ms"] >= concat_end_ms:
            continue
        overlap_start = max(concat_start_ms, m["concat_start_ms"])
        overlap_end = min(concat_end_ms, m["concat_end_ms"])
        if overlap_end - overlap_start <= 0:
            continue
        out.append(
            {
                "original_start_ms": m["original_start_ms"] + (overlap_start - m["concat_start_ms"]),
                "original_end_ms": m["original_start_ms"] + (overlap_end - m["concat_start_ms"]),
                "duration_ms": overlap_end - overlap_start,
            }
        )
    return out


def _kweight_biquad_mag2(kind: str, fs: float, fc: float, q: float, gain_db: float, freqs: np.ndarray) -> np.ndarray:
    """Squared magnitude response of one K-weighting biquad at ``freqs``
    Hz, using De Man's bilinear parametrization (the published formulas
    behind the reference's pyloudnorm dependency) — with the BS.1770
    constants these reproduce the Rec.'s 48 kHz coefficient table to
    every printed digit (checked in pytest) and generalize to any fs."""
    K = np.tan(np.pi * fc / fs)
    if kind == "high_shelf":
        Vh = 10.0 ** (gain_db / 20.0)
        Vb = Vh**0.499666774155
        a0_ = 1.0 + K / q + K * K
        b = np.array([
            (Vh + Vb * K / q + K * K) / a0_,
            2.0 * (K * K - Vh) / a0_,
            (Vh - Vb * K / q + K * K) / a0_,
        ])
        a = np.array([1.0, 2.0 * (K * K - 1.0) / a0_, (1.0 - K / q + K * K) / a0_])
    elif kind == "high_pass":
        den = 1.0 + K / q + K * K
        b = np.array([1.0, -2.0, 1.0])
        a = np.array([1.0, 2.0 * (K * K - 1.0) / den, (1.0 - K / q + K * K) / den])
    else:  # pragma: no cover - internal
        raise ValueError(kind)
    w = 2.0 * np.pi * freqs / fs
    e1 = np.exp(-1j * w)
    e2 = np.exp(-2j * w)
    num = b[0] + b[1] * e1 + b[2] * e2
    den_resp = a[0] + a[1] * e1 + a[2] * e2
    return (np.abs(num) / np.abs(den_resp)) ** 2


# ITU-R BS.1770-4 K-weighting constants (stage 1 shelf models head
# acoustics, stage 2 is the RLB high-pass) — published in the Rec. and
# reproduced by every open implementation.
_KW_SHELF = ("high_shelf", 1681.974450955533, 0.7071752369554196, 3.999843853973347)
_KW_HIPASS = ("high_pass", 38.13547087602444, 0.5003270373238773, 0.0)
_LUFS_ABS_GATE = -70.0
_LUFS_BLOCK_SEC = 0.400
_LUFS_STEP_SEC = 0.100


def integrated_loudness_lufs(x: np.ndarray, sr: int) -> float:
    """ITU-R BS.1770-4 integrated loudness of a mono signal, in LUFS.

    Gated measurement: 400 ms blocks at 75 % overlap, absolute gate at
    -70 LUFS, then a relative gate 10 LU under the absolute-gated mean
    (the algorithm behind the reference's pyloudnorm dependency,
    ``audio/filtering/band_filter_module/features.py:86-92``).

    DEVIATION (documented): K-weighting is applied in the frequency
    domain per gating block (rFFT x exact biquad magnitude response,
    Parseval energy) instead of a time-domain IIR pass — scipy is not
    in this container and a per-sample Python loop would be the exact
    row-at-a-time antipattern. Circular-convolution edge error on a
    400 ms block is well under 0.1 LU for speech/music-like signals
    (value-checked against the spec's known sine loudness in pytest).

    Returns ``-inf`` for signals shorter than one gating block or with
    every block below the absolute gate.
    """
    x = np.asarray(x, dtype=np.float64)
    block = int(round(_LUFS_BLOCK_SEC * sr))
    step = int(round(_LUFS_STEP_SEC * sr))
    if len(x) < block or block == 0:
        return float("-inf")
    n_blocks = (len(x) - block) // step + 1
    idx = np.arange(block)[None, :] + step * np.arange(n_blocks)[:, None]
    frames = x[idx]
    spec2 = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(block, d=1.0 / sr)
    kw = _kweight_biquad_mag2(_KW_SHELF[0], sr, _KW_SHELF[1], _KW_SHELF[2], _KW_SHELF[3], freqs)
    kw = kw * _kweight_biquad_mag2(_KW_HIPASS[0], sr, _KW_HIPASS[1], _KW_HIPASS[2], _KW_HIPASS[3], freqs)
    # Parseval: mean(z^2) over the block = sum(|X|^2 * |H|^2) / N^2, with
    # rfft one-sidedness doubled for the interior bins
    scale = np.full(len(freqs), 2.0)
    scale[0] = 1.0
    if block % 2 == 0:
        scale[-1] = 1.0
    power = (spec2 * kw * scale).sum(axis=1) / (block * block)
    with np.errstate(divide="ignore"):
        l_blocks = -0.691 + 10.0 * np.log10(power)
    keep = l_blocks > _LUFS_ABS_GATE
    if not keep.any():
        return float("-inf")
    rel_gate = -0.691 + 10.0 * np.log10(power[keep].mean()) - 10.0
    keep &= l_blocks > rel_gate
    if not keep.any():
        return float("-inf")
    return float(-0.691 + 10.0 * np.log10(power[keep].mean()))


BAND_DEFINITIONS = {
    **{f"low{i}": ((i - 1) * 1000, i * 1000) for i in (1, 2, 3)},
    **{f"mid{i}": ((i + 2) * 1000, (i + 3) * 1000) for i in range(1, 11)},
    "high": (13000, 14000),
    **{f"high{i}": ((i + 13) * 1000, (i + 14) * 1000) for i in range(1, 11)},
}
_HIGH_FREQ_CUTOFF = 10000


def band_energy_features(x: np.ndarray, sr: int, n_fft: int = 4096) -> dict:
    """24-band relative energy profile for band (full/narrow) classification
    (reference ``band_filter_module/features.py:66-119``): loudness-
    normalize to -25 LUFS (skipped below -100), hann STFT, per-band mean
    power in dB relative to the global max bin (librosa ``power_to_db``
    clamps at 1e-10), 12 dB/14 kHz roll-off penalty above 10 kHz, bands
    with no bins (above Nyquist) at -120. Returns the dict plus the
    measured ``lufs`` under key "lufs"."""
    x = np.asarray(x, dtype=np.float64)
    out = {f"band_energy_{b}": -120.0 for b in BAND_DEFINITIONS}
    lufs = integrated_loudness_lufs(x, sr)
    out["lufs"] = lufs
    if len(x) == 0:
        return out
    if np.isfinite(lufs) and lufs > -100.0:
        x = x * (10.0 ** ((-25.0 - lufs) / 20.0))
    # librosa.stft(center=True, pad_mode='constant'), hann, hop n_fft//4
    hop = n_fft // 4
    y = np.pad(x, n_fft // 2)
    if len(y) < n_fft:
        y = np.pad(y, (0, n_fft - len(y)))
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(n_fft + 1)[:-1]
    power = np.abs(np.fft.rfft(y[idx] * win, axis=1)) ** 2  # frames x bins
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    ref = max(float(power.max()), 1e-10)
    amin = 1e-10
    for band, (f_min, f_max) in BAND_DEFINITIONS.items():
        mask = (freqs >= f_min) & (freqs < f_max)
        if not mask.any():
            continue
        mean_power = float(power[:, mask].mean())
        db = 10.0 * np.log10(max(mean_power, amin)) - 10.0 * np.log10(max(ref, amin))
        if f_min >= _HIGH_FREQ_CUTOFF:
            db -= (f_min - _HIGH_FREQ_CUTOFF) / 14000.0 * 12.0
        out[f"band_energy_{band}"] = db
    return out
