"""Pure-python kernels for the ALM (audio-language-model) window stages.

Semantics follow the reference's model-free ALM data-prep stages
(`nemo_curator/stages/audio/alm/alm_data_builder.py:126-291` and
`alm_data_overlap.py:60-241`): greedily grow speaker-diverse training
windows of ~``target_window_duration`` seconds from a file's transcript
segments, then drop windows that overlap a neighbor by more than a
threshold, keeping whichever is closer to the target duration.

Both passes are per-audio-file and sequential by construction (each
window decision depends on the previous scan position), so the Spark
operators in ``operators/alm.py`` parallelize ACROSS files via
``applyInPandas`` and call these kernels per group. The kernels are
deliberately plain python over small per-file lists — a file's segment
list is bounded (hours of audio / seconds per segment ≈ thousands of
rows), never the corpus.

Segment dicts use keys: ``start``, ``end`` (seconds, floats),
``speaker`` (string or None), ``bandwidth`` (int Hz, the
BandwidthEstimationStage output), ``text`` (string), and optionally
``words`` (list of ``{"word": str, "start": float, "end": float}``)
which truncation consumes. Stats counters mirror the reference's
``BuilderStats`` field-for-field (minus the debug ``lost_win_full_data``
payload, which the reference only logs).
"""

from __future__ import annotations

from typing import Any

MIN_SEGMENTS_PER_WINDOW = 2

STAT_FIELDS = (
    "total_segments",
    "total_dur",
    "lost_bw",
    "dur_lost_bw",
    "lost_sr",
    "dur_lost_sr",
    "lost_spk",
    "dur_lost_spk",
    "lost_win",
    "dur_lost_win",
    "lost_no_spkr",
    "dur_lost_no_spkr",
    "lost_next_seg_bm",
    "dur_lost_next_seg_bm",
)


def _bandwidth(seg: dict[str, Any]) -> int:
    bw = seg.get("bandwidth")
    return int(bw) if bw is not None else 0


def _speaker_durations(segs: list[dict[str, Any]]) -> dict[str, float]:
    """Per-speaker summed duration; falsy speakers are skipped entirely
    (the literal string ``"no-speaker"`` is truthy and therefore lands in
    the map, where callers test for it — reference builder:66-72)."""
    out: dict[str, float] = {}
    for s in segs:
        spk = s.get("speaker")
        if spk:
            out[spk] = out.get(spk, 0.0) + (s["end"] - s["start"])
    return out


def _truncate_at(seg: dict[str, Any], cutoff: float) -> dict[str, Any]:
    """Word-boundary truncation: keep words ending by ``cutoff``; the
    segment's new end is the last kept word's end (or the segment start
    when no word fits), and text is rebuilt from the kept words
    (reference builder:75-90)."""
    kept = [w for w in seg.get("words") or [] if w["end"] <= cutoff]
    part = dict(seg)
    part["words"] = kept
    part["text"] = " ".join(w.get("word", "") for w in kept if w.get("word"))
    part["end"] = kept[-1]["end"] if kept else seg["start"]
    return part


def build_alm_windows(
    segments: list[dict[str, Any]],
    sample_rate: int,
    target_window_duration: float = 120.0,
    tolerance: float = 0.1,
    min_bandwidth: int = 8000,
    min_sample_rate: int = 16000,
    min_speakers: int = 2,
    max_speakers: int = 5,
    truncation: bool = True,
) -> tuple[list[dict[str, Any]], dict[str, float], int]:
    """Greedy window builder. Returns ``(windows, stats, truncation_events)``.

    Each window dict: ``{"segments": [seg-minus-words, ...],
    "speaker_durations": [5 floats, desc, zero-padded]}``. Every segment
    index is tried as a window start; a window is accepted when its span
    lands within ``target ± target*tolerance``, holds ≥2 segments, all
    above ``min_bandwidth``, with ``min..max`` distinct named speakers
    and no ``"no-speaker"`` label. Scans stop at the first low-bandwidth
    segment, speaker-budget overflow, or (with truncation on) a
    word-level cut at the duration ceiling.
    """
    stats = dict.fromkeys(STAT_FIELDS, 0.0)
    stats["total_segments"] = len(segments)
    total_dur = sum(s["end"] - s["start"] for s in segments)
    stats["total_dur"] = total_dur
    truncation_events = 0

    if sample_rate < min_sample_rate:
        stats["lost_sr"] = len(segments)
        stats["dur_lost_sr"] = total_dur
        return [], stats, 0

    lo = target_window_duration * (1.0 - tolerance)
    hi = target_window_duration * (1.0 + tolerance)

    def record_window_loss(start_idx: int, stop_idx: int) -> None:
        seg = segments[start_idx]
        seg_dur = seg["end"] - seg["start"]
        stats["lost_win"] += 1
        stats["dur_lost_win"] += seg_dur
        nxt = segments[min(stop_idx, len(segments) - 1)]
        # reference parity (alm_data_builder.py): next_segment.get(
        # "speaker", "no-speaker") == "no-speaker" — only a MISSING key
        # or the literal "no-speaker" counts; an explicit None/"" value
        # falls through to the bandwidth attribution
        if nxt.get("speaker", "no-speaker") == "no-speaker":
            stats["lost_no_spkr"] += 1
            stats["dur_lost_no_spkr"] += seg_dur
        elif _bandwidth(nxt) < min_bandwidth:
            stats["lost_next_seg_bm"] += 1
            stats["dur_lost_next_seg_bm"] += seg_dur

    windows: list[dict[str, Any]] = []
    for start_idx, seg in enumerate(segments):
        if _bandwidth(seg) < min_bandwidth:
            stats["lost_bw"] += 1
            stats["dur_lost_bw"] += seg["end"] - seg["start"]
            continue

        window_start = seg["start"]
        window_end = seg["end"]
        picked: list[dict[str, Any]] = []
        stop_idx = start_idx

        for stop_idx in range(start_idx, len(segments)):
            cur = segments[stop_idx]
            if _bandwidth(cur) < min_bandwidth:
                break
            if cur["end"] - window_start > hi:
                if not truncation:
                    break
                cutoff = window_start + hi
                if cur["start"] >= cutoff:
                    break
                truncation_events += 1
                part = _truncate_at(cur, cutoff)
                spk = _speaker_durations([*picked, part])
                if len(spk) > max_speakers or "no-speaker" in spk:
                    break
                part.pop("words", None)
                picked.append(part)
                window_end = part["end"]
                break
            spk = _speaker_durations([*picked, cur])
            if len(spk) > max_speakers or "no-speaker" in spk:
                break
            window_end = cur["end"]
            trimmed = {k: v for k, v in cur.items() if k != "words"}
            picked.append(trimmed)

        dur = window_end - window_start
        if not (lo <= dur <= hi):
            record_window_loss(start_idx, stop_idx)
            continue
        if len(picked) < MIN_SEGMENTS_PER_WINDOW or any(
            _bandwidth(s) < min_bandwidth for s in picked
        ):
            record_window_loss(start_idx, stop_idx)
            continue
        spk = _speaker_durations(picked)
        if not (min_speakers <= len(spk) <= max_speakers) or "no-speaker" in spk:
            stats["lost_spk"] += 1
            stats["dur_lost_spk"] += seg["end"] - seg["start"]
            continue

        top = sorted(spk.values(), reverse=True)[:5]
        top += [0.0] * (5 - len(top))
        windows.append({"segments": picked, "speaker_durations": top})

    return windows, stats, truncation_events


def overlap_ratio(
    a_start: float, a_end: float, b_start: float, b_end: float
) -> float:
    """Intersection over the SMALLER span (reference overlap:60-69)."""
    inter = max(0.0, min(a_end, b_end) - max(a_start, b_start))
    smaller = min(a_end - a_start, b_end - b_start)
    return inter / smaller if smaller else 0.0


def filter_window_overlaps(
    spans: list[tuple[float, float]],
    threshold: float,
    target_duration: float,
) -> list[int]:
    """Greedy overlap pruning over ``(start, end)`` spans; returns the
    indices (into the input list) that survive, in start order.

    Spans are scanned in ``(start, end)`` order; for each surviving span
    the forward neighbors that still overlap it (``start_j < end_i``) are
    compared: when intersection/smaller ≥ ``threshold``, the span whose
    duration is closer to ``target_duration`` wins, ties to the longer
    span, final tie to the earlier span (reference overlap:71-111).
    """
    order = sorted(range(len(spans)), key=lambda i: (spans[i][0], spans[i][1]))
    removed: set[int] = set()
    for pi, i in enumerate(order):
        if i in removed:
            continue
        s_i, e_i = spans[i]
        d_i = e_i - s_i
        for j in order[pi + 1 :]:
            if j in removed:
                continue
            s_j, e_j = spans[j]
            if s_j >= e_i:
                break
            if overlap_ratio(s_i, e_i, s_j, e_j) >= threshold:
                d_j = e_j - s_j
                gap_i = abs(d_i - target_duration)
                gap_j = abs(d_j - target_duration)
                if gap_i < gap_j or (gap_i == gap_j and d_i >= d_j):
                    removed.add(j)
                else:
                    removed.add(i)
                    break
        # i survived iff it was never removed by a later neighbor
    return [i for i in order if i not in removed]


def plan_snippets(
    segments: list[dict[str, Any]],
    max_duration_sec: float,
    min_duration_sec: float,
    max_segment_gap_sec: float,
) -> tuple[list[dict[str, Any]], dict[str, int]]:
    """Greedy contiguous snippet packing (reference
    ``alm/pretrain/planning.py:130-204`` ``plan_snippets``): walk
    start-sorted, non-overlapping segments, growing the current snippet
    while the span stays within ``max_duration_sec`` AND the silence gap
    to the next segment is at most ``max_segment_gap_sec`` (a long gap
    usually separates semantically distinct conversations). A failed
    constraint closes the snippet. Candidates are then dropped as
    ``too_long`` (a single over-long segment), ``too_short``, or
    ``no_text``. Returns ``(snippets, drop_counts)``; each snippet is
    ``{"start", "end", "segments"}``.
    """
    drops = {"too_long": 0, "too_short": 0, "no_text": 0}
    candidates: list[dict[str, Any]] = []
    cur: dict[str, Any] | None = None
    for s in segments:
        if cur is not None and (
            s["end"] - cur["start"] <= max_duration_sec
            and s["start"] - cur["end"] <= max_segment_gap_sec
        ):
            cur["end"] = s["end"]
            cur["segments"].append(s)
        else:
            if cur is not None:
                candidates.append(cur)
            cur = {"start": s["start"], "end": s["end"], "segments": [s]}
    if cur is not None:
        candidates.append(cur)

    out = []
    for c in candidates:
        dur = c["end"] - c["start"]
        if dur > max_duration_sec:
            drops["too_long"] += 1
        elif dur < min_duration_sec:
            drops["too_short"] += 1
        elif not " ".join(s.get("text") or "" for s in c["segments"]).strip():
            drops["no_text"] += 1
        else:
            out.append(c)
    return out, drops


def relativize_segments(
    segments: list[dict[str, Any]], snippet_start: float, snippet_end: float
) -> list[dict[str, Any]]:
    """Shift segment (and word) timestamps to snippet-relative, clamped
    to ``[0, duration]`` — diarization jitter can put word boundaries
    fractionally outside their parent span (reference planning:206-250)."""
    duration = max(0.0, snippet_end - snippet_start)

    def shift(t: float) -> float:
        return min(duration, max(0.0, t - snippet_start))

    out = []
    for seg in segments:
        ns = dict(seg)
        ns["start"], ns["end"] = shift(seg["start"]), shift(seg["end"])
        words = seg.get("words")
        if words:
            ns["words"] = [
                {
                    **w,
                    **({"start": shift(w["start"])} if "start" in w else {}),
                    **({"end": shift(w["end"])} if "end" in w else {}),
                }
                for w in words
            ]
        out.append(ns)
    return out


def max_ngram_count(tokens: list, n: int) -> int:
    """Highest frequency of any contiguous ``n``-gram; 0 when fewer than
    ``n`` tokens (such texts are never repetitive — reference
    planning:617-621)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if len(tokens) < n:
        return 0
    from collections import Counter

    return max(Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)).values())


_SNIPPET_ID_RESERVED = (".", "/", "\\")


def make_snippet_id(original_id: str, start_sec: float, end_sec: float) -> str:
    """WebDataset-safe snippet id ``<id>-<s>_<ms>-<e>_<ms>`` (reference
    ``alm/pretrain/utils.py:175-205``): millisecond timestamps with ``_``
    as the decimal mark, and ``.``/path separators sanitized out of the
    source id, because WebDataset splits the sample key at the FIRST
    ``.`` of the member filename and nested tar paths break the
    members-at-root contract."""
    safe = original_id
    for ch in _SNIPPET_ID_RESERVED:
        safe = safe.replace(ch, "_")
    start_str = format(start_sec, ".3f").replace(".", "_")
    end_str = format(end_sec, ".3f").replace(".", "_")
    return f"{safe}-{start_str}-{end_str}"


def slice_mono_resample(
    samples, sr: int, start_sec: float, end_sec: float, target_sr: int
):
    """Frame-exact snippet slice (reference ``pretrain/extraction.py:
    234-266``): ``[floor(start*sr), ceil(end*sr))`` clamped to the clip,
    then linear-interpolation resample to ``target_sr``. Returns
    ``(mono_float32, actual_duration_sec)`` or ``None`` for an empty
    frame range. ``samples`` must already be mono (``decode_clip``
    channel-averages)."""
    import math

    import numpy as np

    start_f = max(0, math.floor(start_sec * sr))
    end_f = min(len(samples), math.ceil(end_sec * sr))
    if end_f <= start_f:
        return None
    sl = np.asarray(samples[start_f:end_f], dtype=np.float32)
    if sr != target_sr:
        n_out = max(1, int(round(len(sl) * target_sr / sr)))
        xi = np.linspace(0.0, len(sl) - 1, n_out)
        sl = np.interp(xi, np.arange(len(sl)), sl).astype(np.float32)
    return sl, len(sl) / float(target_sr)


def histogram_30s(durations: list, bin_width: int = 30) -> dict:
    """Dense fixed-width duration histogram from 0 through the bin of
    the longest duration, zero-count leading bins included (reference
    ``pretrain/utils.py:208-228``)."""
    if not durations:
        return {}
    idxs = [int(d // bin_width) for d in durations]
    counts = [0] * (max(idxs) + 1)
    for i in idxs:
        counts[i] += 1
    return {f"{i * bin_width}-{(i + 1) * bin_width}": c for i, c in enumerate(counts)}


def long_audio_split_points(segment_ends: list, suggested_max_len: float) -> list:
    """Split points for an over-long audio file, placed at natural
    pauses: walk the (start-sorted) segment end times; whenever the span
    since the last split would exceed ``suggested_max_len``, cut at the
    PREVIOUS segment's end (reference ``stages/audio/tagging/split.py:
    67-83`` ``get_split_points``)."""
    splits = []
    split_start = 0.0
    prev_end = 0.0
    for end in segment_ends:
        if end - split_start > suggested_max_len:
            splits.append(prev_end)
            split_start = prev_end
        prev_end = end
    return splits


DEFAULT_TERMINAL_PUNCT = ".!?。？？！。"


def _segment_is_valid(seg: dict, max_duration: float) -> bool:
    """Reject a single over-long word or an empty sentence (reference
    prepare_module_segments.py:131-139)."""
    words = seg.get("words", [])
    if len(words) == 1:
        w = words[0]
        if (w.get("end", 0) - w.get("start", 0)) > max_duration:
            return False
    return bool(" ".join(w.get("word", "") for w in words).strip())


def split_segment_by_duration(
    seg: dict,
    module: str,
    min_duration: float,
    max_duration: float,
    max_pause: float,
    rng,
) -> list:
    """Word-walk splitter (reference prepare_module_segments.py:141-216):
    break on span > max duration (ASR re-draws a random ceiling in
    [min, max] after every duration break — deterministic because the
    caller seeds ``rng`` from the entry id, reference :405-407), and for
    TTS additionally on pauses > ``max_pause`` or a bandwidth change
    once the running span has reached ``min_duration``."""
    words = seg["words"]
    cur = {"speaker": seg.get("speaker"), "start": seg.get("start"),
           "end": seg.get("end"), "words": []}
    out = []
    rand_max = (
        max_duration if module == "tts"
        else rng.randint(int(min_duration), int(max_duration))
    )
    for w in words:
        if not cur["words"]:
            cur = {"speaker": w.get("speaker"), "start": w["start"],
                   "end": w["end"], "words": [w]}
            continue
        if w["end"] - cur["start"] > rand_max:
            if _segment_is_valid(cur, max_duration):
                out.append(cur)
            cur = {"speaker": seg.get("speaker"), "start": w["start"],
                   "end": w["end"], "words": [w]}
            if module == "asr":
                rand_max = rng.randint(int(min_duration), int(max_duration))
            continue
        if (
            module == "tts"
            and w["start"] - cur["end"] > max_pause
            and cur["end"] - cur["start"] >= min_duration
        ):
            if _segment_is_valid(cur, max_duration):
                out.append(cur)
            cur = {"speaker": seg.get("speaker"), "start": w["start"],
                   "end": w["end"], "words": [w]}
            continue
        if (
            module == "tts"
            and cur["words"]
            and w.get("bandwidth") != cur["words"][-1].get("bandwidth")
            and cur["end"] - cur["start"] >= min_duration
        ):
            if _segment_is_valid(cur, max_duration):
                out.append(cur)
            cur = {"speaker": w.get("speaker"), "start": w["start"],
                   "end": w["end"], "words": [w]}
            continue
        cur["words"].append(w)
        cur["end"] = w["end"]
    if cur["words"] and _segment_is_valid(cur, max_duration):
        out.append(cur)
    return out


def split_segment_by_punctuation(
    seg: dict,
    module: str,
    min_duration: float,
    max_duration: float,
    max_pause: float,
    terminal_punct_marks: str,
    full_utterance_ratio: float,
    punctuation_split_only: bool,
    rng,
) -> list:
    """Split at terminal punctuation, greedily growing under-min spans
    toward ``max_duration``; over-long or ratio-overflow spans fall back
    to the duration splitter (reference prepare_module_segments.py:
    218-321)."""
    words = seg["words"]
    pts = [
        i for i, w in enumerate(words)
        if w.get("word") and w["word"][-1] in terminal_punct_marks
    ]
    if not pts:
        if punctuation_split_only:
            return []
        return split_segment_by_duration(
            seg, module, min_duration, max_duration, max_pause, rng
        )

    chosen = []
    group_start = 0
    k = 0
    while k < len(pts):
        dur = words[pts[k]]["end"] - words[group_start]["start"]
        if dur < min_duration:
            nxt = k + 1
            while (
                nxt < len(pts)
                and words[pts[nxt]]["end"] - words[group_start]["start"] <= max_duration
            ):
                nxt += 1
            if nxt > k + 1:
                chosen.append(pts[nxt - 1])
                group_start = pts[nxt - 1] + 1
                k = nxt
            else:
                chosen.append(pts[k])
                group_start = pts[k] + 1
                k += 1
        else:
            chosen.append(pts[k])
            group_start = pts[k] + 1
            k += 1

    total = 0.0
    s = 0
    for e in chosen:
        total += words[e]["end"] - words[s]["start"]
        s = e + 1
    required = full_utterance_ratio * total

    out = []
    start = 0
    acc = 0.0
    for end in chosen:
        dur = words[end]["end"] - words[start]["start"]
        acc += dur
        reached = full_utterance_ratio < 1.0 and acc > required
        if reached:
            end = chosen[-1]
        sub = {
            "speaker": seg.get("speaker"),
            "start": words[start]["start"],
            "end": words[end]["end"],
            "words": words[start : end + 1],
        }
        if reached or dur > max_duration:
            out.extend(split_segment_by_duration(
                sub, module, min_duration, max_duration, max_pause, rng
            ))
        elif _segment_is_valid(sub, max_duration):
            out.append(sub)
        start = end + 1
        if reached:
            break

    if start < len(words):
        rem = {
            "speaker": seg.get("speaker"),
            "start": words[start]["start"],
            "end": words[-1]["end"],
            "words": words[start:],
        }
        out.extend(split_segment_by_duration(
            rem, module, min_duration, max_duration, max_pause, rng
        ))
    return out


def prepare_module_segments(
    words: list,
    audio_id: str,
    module: str = "tts",
    min_duration: float = 5.0,
    max_duration: float = 20.0,
    max_pause: float = 2.0,
    terminal_punct_marks: str = DEFAULT_TERMINAL_PUNCT,
    full_utterance_ratio: float = 1.0,
    punctuation_split_only: bool = False,
) -> list:
    """PrepareModuleSegmentsStage per-file kernel (reference
    prepare_module_segments.py:355-421): TTS mode cuts the word stream
    into single-speaker runs (dropping no-speaker runs) then
    punctuation-splits each; ASR mode punctuation-splits the whole
    stream and labels each output with its joined unique speakers.
    Deterministic: the ASR random ceiling draws from an RNG seeded by
    md5(audio_id), exactly the reference's per-entry seeding (:405-407).

    ``words``: start-ordered dicts with word/start/end/speaker and
    optional bandwidth. Returns segments with speaker/start/end/text/
    words/bandwidths."""
    import hashlib
    import random

    if module not in ("tts", "asr"):
        raise ValueError("module must be 'tts' or 'asr'")
    rng = random.Random(int(hashlib.md5(audio_id.encode()).hexdigest()[:8], 16))
    args = (module, min_duration, max_duration, max_pause,
            terminal_punct_marks, full_utterance_ratio, punctuation_split_only, rng)

    new_segments = []
    if module == "asr":
        if words:
            whole = {"speaker": None, "start": words[0]["start"],
                     "end": words[-1]["end"], "words": words}
            new_segments = split_segment_by_punctuation(whole, *args)
    else:
        runs = []
        cur = None
        for w in words:
            if cur is None or w.get("speaker") != cur["speaker"]:
                if cur is not None:
                    runs.append(cur)
                cur = {"speaker": w.get("speaker"), "start": w["start"],
                       "end": w["end"], "words": [w]}
            else:
                cur["words"].append(w)
                cur["end"] = w["end"]
        if cur is not None and cur["words"]:
            runs.append(cur)
        for run in runs:
            if run["speaker"] in ("no-speaker", None):
                continue
            new_segments.extend(split_segment_by_punctuation(run, *args))

    out = []
    for seg in new_segments:
        if module == "tts":
            speaker = seg["speaker"]
        else:
            speaker = ",".join(dict.fromkeys(w.get("speaker") or "" for w in seg["words"]))
        out.append({
            "speaker": speaker,
            "start": seg["start"],
            "end": seg["end"],
            "text": " ".join(w.get("word", "") for w in seg["words"]),
            "words": seg["words"],
            "bandwidths": [w.get("bandwidth") for w in seg["words"]],
        })
    return out
