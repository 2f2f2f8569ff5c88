"""Speaker-diarization segment post-processing kernels.

Pure interval algebra behind the reference's SpeakerSeparationStage
(`stages/audio/segmentation/speaker_separation_module/speaker_sep.py:
149-441`): the diarization model itself (pyannote, GPU) is not in this
container — the Spark operator exposes it as an injectable seam — but
everything the stage does AFTER the model is deterministic sweep-line
processing over per-speaker ``(start, end)`` lists, reimplemented here
and unit-tested against hand-traced timelines.

Processing order (reference ``process_audio``:387-447): one overlap
policy (clean-cut or exclude-with-buffer), then merge adjacent
per-speaker segments, then drop short segments.
"""

from __future__ import annotations


def _timeline(speaker_segments: dict) -> list:
    """(time, +1/-1, speaker) events sorted by (time, end-before-start)."""
    ev = []
    for spk, segs in speaker_segments.items():
        for s, e in segs:
            ev.append((s, 1, spk))
            ev.append((e, -1, spk))
    ev.sort(key=lambda x: (x[0], x[1]))
    return ev


def clean_cut_overlaps(speaker_segments: dict) -> dict:
    """Cut segments at overlap boundaries: when a new speaker starts,
    every active speaker's running segment is closed at that instant
    (the overlap region stays with the newest speaker); when a speaker
    ends inside an overlap, the still-active speakers restart from that
    instant (reference speaker_sep.py:149-199)."""
    out = {spk: [] for spk in speaker_segments}
    active: set = set()
    cur = dict.fromkeys(speaker_segments)
    for t, kind, spk in _timeline(speaker_segments):
        if kind == -1:
            if spk in active:
                if cur[spk] is not None:
                    if cur[spk] < t:
                        out[spk].append((cur[spk], t))
                    cur[spk] = None
                active.remove(spk)
                for a in active:
                    if cur[a] is None:
                        cur[a] = t
        else:
            for a in active:
                if cur[a] is not None:
                    if cur[a] < t:
                        out[a].append((cur[a], t))
                    cur[a] = None
            active.add(spk)
            cur[spk] = t
    return out


def exclude_overlaps(speaker_segments: dict, buffer_time: float = 0.5) -> dict:
    """Keep only single-speaker spans, trimming ``buffer_time`` seconds
    off each side of a transition into/out of an overlap (reference
    speaker_sep.py:201-275). Spans where two or more speakers talk
    simultaneously are discarded entirely."""
    if not speaker_segments:
        return {}
    out = {spk: [] for spk in speaker_segments}
    active: set = set()
    start = None
    solo = None
    for t, kind, spk in _timeline(speaker_segments):
        if kind == 1:
            active.add(spk)
            if len(active) == 1:
                start = t
                solo = spk
            elif len(active) == 2 and start is not None:
                if solo is not None and start < t:
                    end_b = max(start, t - buffer_time)
                    if start < end_b:
                        out[solo].append((start, end_b))
                start = None
                solo = None
        else:
            if len(active) == 1 and spk in active:
                if start is not None and start < t:
                    out[spk].append((start, t))
                start = None
                solo = None
            active.discard(spk)
            if len(active) == 1:
                start = t + buffer_time
                solo = next(iter(active))
    return out


def merge_adjacent(segments: list, gap_threshold: float = 0.1) -> list:
    """Merge same-speaker segments whose gap is at most ``gap_threshold``
    (reference speaker_sep.py:298-324)."""
    if not segments:
        return []
    segs = sorted(segments)
    merged = [segs[0]]
    for s, e in segs[1:]:
        ps, pe = merged[-1]
        if s - pe <= gap_threshold:
            merged[-1] = (ps, max(pe, e))
        else:
            merged.append((s, e))
    return merged


def postprocess_speaker_segments(
    speaker_segments: dict,
    exclude: bool = False,
    buffer_time: float = 0.5,
    gap_threshold: float = 0.1,
    min_duration: float = 2.0,
) -> dict:
    """The full post-model chain in the reference's order
    (``process_audio``:420-447): overlap policy -> merge adjacent ->
    drop segments shorter than ``min_duration`` (skipped when <= 0)."""
    if not speaker_segments:
        return {}
    if exclude:
        processed = exclude_overlaps(speaker_segments, buffer_time)
    else:
        processed = clean_cut_overlaps(speaker_segments)
    processed = {
        spk: merge_adjacent(segs, gap_threshold) for spk, segs in processed.items()
    }
    if min_duration > 0:
        processed = {
            spk: [(s, e) for s, e in segs if e - s >= min_duration]
            for spk, segs in processed.items()
        }
    return processed


def align_words_to_segments(alignment: list, segments: list) -> list:
    """Merge an ASR word alignment into diarization segments
    (reference ``stages/audio/tagging/merge_alignment_diarization.py:
    63-178`` ``align_words_to_segments``): words and segments sort by
    start; a single cursor walks the words once per file. A word fully
    inside a segment joins it; a straddling word joins whichever of the
    current/next segment it overlaps more (ties to the current); words
    overlapping neither (gaps) are skipped. Each output segment gains
    ``text`` (joined words) and ``words``.

    Non-mutating: returns new segment dicts (the reference mutates its
    entry in place)."""
    words = sorted(alignment, key=lambda w: w.get("start", 0))
    segs = [dict(s) for s in sorted(segments, key=lambda s: s.get("start", 0))]
    i = 0
    for k, seg in enumerate(segs):
        seg_start, seg_end = seg.get("start", 0), seg.get("end", 0)
        mine = []
        while i < len(words):
            w = words[i]
            ws, we = w.get("start", 0), w.get("end", 0)
            if ws >= seg_end:
                break
            if ws >= seg_start and we <= seg_end:
                mine.append(w)
                i += 1
                continue
            cur_ov = max(0.0, min(we, seg_end) - max(ws, seg_start))
            if k < len(segs) - 1:
                nxt = segs[k + 1]
                nxt_ov = max(
                    0.0, min(we, nxt.get("end", 0)) - max(ws, nxt.get("start", 0))
                )
            else:
                nxt_ov = 0.0
            if cur_ov >= nxt_ov and cur_ov > 0:
                mine.append(w)
                i += 1
            elif nxt_ov > cur_ov:
                break
            else:  # gap word: overlaps neither segment
                i += 1
        seg["text"] = " ".join(w.get("word", "") for w in mine)
        seg["words"] = mine
    return segs
