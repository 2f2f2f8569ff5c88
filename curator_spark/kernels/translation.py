"""Pure-python kernels for the translation data-prep stages.

Reference: ``stages/text/experimental/translation/`` — the model-free
scaffolding around an LLM translate call:

- ``stages/segmentation.py:182-223,226-248,512-581`` — coarse (line-level,
  code-block-aware) and fine (sentence-level, structure-preserving)
  document segmentation with JSON reconstruction metadata;
- ``stages/reassembly.py:130-488`` — collapsing translated segments back
  into documents, per-field metadata walk, FAITH score aggregation;
- ``utils/field_paths.py:23-143`` — wildcard dot-path reads/writes over
  nested message structures (``messages.*.content``);
- ``utils/metadata.py`` — translation-metadata JSON and chat-message
  reconstruction.

The reference's sentence splitter is spaCy (an external model download);
here the span source is an injectable ``sentencizer(text) ->
[(start, end), ...]`` seam — a spaCy ``doc.sents`` adapter drops straight
in — with a deterministic regex default. Everything downstream of the
span list (separator preservation, the special-separator second pass, the
reconstruction invariant) matches the reference exactly: for any span
source, ``"".join(seg + sep for seg, sep in units) == text``.

These kernels are plain python over strings and dicts; the Spark
operators in ``operators/translation.py`` batch them through Arrow.
"""

from __future__ import annotations

import copy
import json
import re
import time
from typing import Any, Callable

import numpy as np

__all__ = [
    "FAITH_DIMENSIONS",
    "FAITH_EVAL_SYSTEM_PROMPT",
    "FAITH_EVAL_USER_TEMPLATE",
    "SPECIAL_SEPARATOR_RE",
    "TRANSLATE_SYSTEM_PROMPT",
    "TRANSLATE_USER_TEMPLATE",
    "average_faith_scores",
    "build_faith_messages",
    "build_translation_messages",
    "build_translation_metadata",
    "compute_faith_avg",
    "count_segments_in_meta",
    "default_sentencizer",
    "extract_faith_scores",
    "extract_json_object",
    "extract_nested_fields",
    "get_language_name",
    "is_line_translatable",
    "is_wildcard_path",
    "load_prompt_template",
    "make_llm_faith_scorer",
    "make_llm_translator",
    "merge_faith_scores_into_metadata",
    "parse_structured_value",
    "reassemble_document",
    "reconstruct_messages_with_translation",
    "retry_with_backoff",
    "segment_coarse",
    "segment_document",
    "segment_fine",
    "set_nested_fields",
    "units_with_structure",
    "unwrap_translation",
]

# segmentation.py:197-199 — runs of markdown/listing punctuation plus
# newline/tab/bullet glyphs are forced separator boundaries even when the
# sentencizer kept them inside one sentence.
SPECIAL_SEPARATOR_RE = re.compile(
    r"(\#{2,}|\_{2,}|…{2,}|\%{2,}|\+{2,}|\.{2,}|\-{3,}|\*{2,}|\~{2,}|\={2,}"
    r"|\!{2,}|\n|\t|‣|⁃|⁌|⁍|●|○|•|·|◘|◦|⦾|⦿|\|)"
)

# reassembly.py:43-49 — segment-level score columns and their FAITH keys.
FAITH_DIMENSIONS: dict[str, str] = {
    "faith_fluency": "Fluency",
    "faith_accuracy": "Accuracy",
    "faith_idiomaticity": "Idiomaticity",
    "faith_terminology": "Terminology",
    "faith_handling_of_format": "Handling_of_Format",
}


# ---------------------------------------------------------------------------
# wildcard dot-paths (field_paths.py)
# ---------------------------------------------------------------------------


def is_wildcard_path(path: str) -> bool:
    """field_paths.py:120 — a path component ``*`` fans out over lists."""
    return "*" in path


def _to_plain(value: Any) -> Any:
    """Normalize Arrow/pandas container types to plain Python: Spark hands
    ``array<struct>`` columns to pandas UDFs as ``numpy.ndarray`` (and
    scalars as numpy generics), which the reference's pure-Python walks
    never see. Recursing to list/dict keeps the wildcard walk, deepcopy,
    and the ``json.dumps`` writeback all working on typed columns."""
    if isinstance(value, np.ndarray):
        return [_to_plain(v) for v in value.tolist()]
    if isinstance(value, (list, tuple)):
        return [_to_plain(v) for v in value]
    if isinstance(value, dict):
        return {k: _to_plain(v) for k, v in value.items()}
    if isinstance(value, np.generic):
        return value.item()
    return value


def parse_structured_value(value: Any) -> Any | None:
    """field_paths.py:132-143 — dict/list pass through; JSON strings that
    parse to dict/list are parsed; anything else is ``None``. Arrow
    containers (``numpy.ndarray`` from typed Spark columns) are
    normalized to plain lists/dicts first."""
    value = _to_plain(value)
    if isinstance(value, (dict, list)):
        return value
    if isinstance(value, str):
        try:
            parsed = json.loads(value)
        except (json.JSONDecodeError, TypeError):
            return None
        if isinstance(parsed, (dict, list)):
            return parsed
    return None


def extract_nested_fields(record: Any, path: str) -> list[str]:
    """field_paths.py:53-57 — collect string leaves matching a wildcard
    dot-path, in traversal order."""
    out: list[str] = []

    def walk(node: Any, keys: list[str]) -> None:
        if not keys:
            return
        head, rest = keys[0], keys[1:]
        if head == "*":
            if isinstance(node, list):
                for item in node:
                    if rest:
                        walk(item, rest)
                    elif isinstance(item, str):
                        out.append(item)
            return
        if isinstance(node, dict) and head in node:
            if rest:
                walk(node[head], rest)
            elif isinstance(node[head], str):
                out.append(node[head])

    walk(record, path.split("."))
    return out


def set_nested_fields(record: dict, path: str, values: list[str]) -> dict:
    """field_paths.py:104-117 — write ``values`` back onto the string
    leaves matching ``path`` in the same traversal order as
    :func:`extract_nested_fields`. Non-string leaves are skipped (they
    were never extracted). Returns a deep copy."""
    result = copy.deepcopy(record)
    cursor = [0]

    def take() -> str | None:
        if cursor[0] >= len(values):
            return None
        v = values[cursor[0]]
        cursor[0] += 1
        return v

    def walk(node: Any, keys: list[str]) -> None:
        if not keys:
            return
        head, rest = keys[0], keys[1:]
        if head == "*":
            if isinstance(node, list):
                for i, item in enumerate(node):
                    if rest:
                        walk(item, rest)
                    elif isinstance(item, str):
                        v = take()
                        if v is not None:
                            node[i] = v
            return
        if isinstance(node, dict) and head in node:
            if rest:
                walk(node[head], rest)
            elif isinstance(node[head], str):
                v = take()
                if v is not None:
                    node[head] = v

    walk(result, path.split("."))
    return result


def normalize_text_field(text_field: str | list[str]) -> list[str]:
    """field_paths.py:125-129."""
    return [text_field] if isinstance(text_field, str) else list(text_field)


# ---------------------------------------------------------------------------
# translatability + coarse segmentation (segmentation.py:226-248, 512-551)
# ---------------------------------------------------------------------------


def is_line_translatable(line: str) -> bool:
    """segmentation.py:226-248 — False for lines with no alphabetic
    character, XML/HTML-tag-shaped lines, and strings that parse as JSON
    objects/arrays (tool payloads stay verbatim)."""
    s = line.strip()
    if not any(ch.isalpha() for ch in s):
        return False
    if s.startswith("<") and s.endswith(">"):
        return False
    if (s.startswith("{") and s.endswith("}")) or (s.startswith("[") and s.endswith("]")):
        try:
            parsed = json.loads(s)
        except (json.JSONDecodeError, TypeError):
            parsed = None
        if isinstance(parsed, (dict, list)):
            return False
    return True


def segment_coarse(text: str) -> tuple[list[str], dict[str, Any]]:
    """segmentation.py:512-551 — line-level segmentation. ```` ``` ````
    fence lines toggle a code-block flag and stay verbatim; in-block and
    non-translatable lines go to the template verbatim; translatable lines
    contribute their left-stripped body as a segment, with the leading
    whitespace remembered for reassembly (trailing whitespace rides along
    inside the segment, as in the reference's ``line[num_leading:]``)."""
    template: list[str | None] = []
    leading_spaces: list[str] = []
    segments: list[str] = []
    in_code = False
    for line in text.split("\n"):
        if line.strip().startswith("```"):
            in_code = not in_code
            template.append(line)
        elif in_code or not is_line_translatable(line):
            template.append(line)
        else:
            body = line.lstrip()
            template.append(None)
            leading_spaces.append(line[: len(line) - len(body)])
            segments.append(body)
    meta = {
        "mode": "coarse",
        "template": template,
        "leading_spaces": leading_spaces,
        "original_stripped_lines": list(segments),
    }
    return segments, meta


# ---------------------------------------------------------------------------
# fine segmentation (segmentation.py:131-223, 557-581)
# ---------------------------------------------------------------------------

_SENT_BOUNDARY_RE = re.compile(r"(?<=[.!?])[  ]+(?=[^\s])")


def default_sentencizer(text: str) -> list[tuple[int, int]]:
    """Deterministic fallback span source: sentence boundaries after
    ``.!?`` followed by whitespace. Returns ``[(start, end)]`` character
    spans with ends exclusive, whitespace between sentences excluded from
    the spans (the spaCy ``doc.sents`` contract the structure-preserving
    walk expects). A spaCy adapter — ``lambda t: [(s.start_char,
    s.end_char) for s in nlp(t).sents]`` — is a drop-in replacement."""
    if not text:
        return []
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_BOUNDARY_RE.finditer(text):
        spans.append((start, m.start()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    return [(a, b) for a, b in spans if a < b]


def _push_stripped(units: list[tuple[str, str]], piece: str, sep: str) -> None:
    """segmentation.py:131-140 — split a raw piece into (stripped body,
    separator) while keeping every whitespace byte: leading whitespace
    becomes its own empty-text unit, trailing whitespace is prepended to
    the following separator."""
    body = piece.strip()
    lead = piece[: len(piece) - len(piece.lstrip())]
    tail = piece[len(piece.rstrip()):]
    if lead and body:
        units.append(("", lead))
    units.append((body, tail + sep))


def _split_on_special(piece: str, sep: str) -> list[tuple[str, str]]:
    """segmentation.py:157-179 — second pass: force boundaries at
    :data:`SPECIAL_SEPARATOR_RE` matches inside one sentence unit."""
    hits = list(SPECIAL_SEPARATOR_RE.finditer(piece))
    units: list[tuple[str, str]] = []
    if not hits:
        _push_stripped(units, piece, sep)
        return units
    pos = 0
    for m in hits:
        _push_stripped(units, piece[pos : m.start()], m.group(0))
        pos = m.end()
    if pos < len(piece):
        _push_stripped(units, piece[pos:], sep)
    elif sep:
        units.append(("", sep))
    return units


def units_with_structure(
    text: str, sentencizer: Callable[[str], list[tuple[int, int]]] | None = None
) -> list[tuple[str, str]]:
    """segmentation.py:143-223 — ``(unit_text, separator_after)`` list
    whose concatenation reconstructs ``text`` exactly. Falls back to one
    untouched unit if the invariant would not hold (defensive, as the
    reference does after its own join check)."""
    spans = (sentencizer or default_sentencizer)(text)
    sent_units: list[tuple[str, str]] = []
    if spans and spans[0][0] > 0:
        sent_units.append(("", text[: spans[0][0]]))
    for i, (a, b) in enumerate(spans):
        nxt = spans[i + 1][0] if i + 1 < len(spans) else len(text)
        sent_units.append((text[a:b], text[b:nxt]))
    if not spans and text:
        sent_units.append(("", text))

    units: list[tuple[str, str]] = []
    for piece, sep in sent_units:
        units.extend(_split_on_special(piece, sep))
    if "".join(u + s for u, s in units) != text:
        return [(text, "")]
    return units


def segment_fine(
    text: str, sentencizer: Callable[[str], list[tuple[int, int]]] | None = None
) -> tuple[list[str], dict[str, Any]]:
    """segmentation.py:557-581 — sentence-level segmentation: each unit is
    either translatable (non-blank, passes the content gate) or frozen."""
    segments: list[str] = []
    unit_meta: list[dict[str, Any]] = []
    for unit, sep in units_with_structure(text, sentencizer):
        ok = bool(unit.strip()) and is_line_translatable(unit)
        unit_meta.append({"translatable": ok, "original": unit, "separator": sep})
        if ok:
            segments.append(unit)
    return segments, {"mode": "fine", "units": unit_meta}


# ---------------------------------------------------------------------------
# per-document segmentation (segmentation.py:303-461)
# ---------------------------------------------------------------------------


def segment_document(
    row: dict[str, Any],
    field_paths: list[str],
    mode: str = "coarse",
    min_segment_chars: int = 0,
    sentencizer: Callable[[str], list[tuple[int, int]]] | None = None,
) -> tuple[list[str], str]:
    """One source document -> (segments, metadata_json).

    segmentation.py:406-442 — for each field path, extract the text(s)
    (plain column / wildcard dot-path into structured data), segment each,
    and append a per-field metadata entry carrying its ``field_path``.
    Texts shorter than ``min_segment_chars`` pass through as a single
    opaque segment (segmentation.py:424-431)."""
    segments: list[str] = []
    entries: list[dict[str, Any]] = []
    for path in field_paths:
        for text in _extract_texts(row, path):
            if min_segment_chars > 0 and len(text) < min_segment_chars:
                entries.append(
                    {"mode": "passthrough", "field_path": path, "original_text": text}
                )
                segments.append(text)
                continue
            if mode == "fine":
                segs, meta = segment_fine(text, sentencizer)
            else:
                segs, meta = segment_coarse(text)
            meta["field_path"] = path
            entries.append(meta)
            segments.extend(segs)
    return segments, json.dumps({"field_metadatas": entries}, ensure_ascii=False)


def _extract_texts(row: dict[str, Any], path: str) -> list[str]:
    """segmentation.py:467-506 — flat column, or wildcard/nested dot-path
    into the root column's structured value (falling back to the raw
    string when the root does not parse)."""
    if not is_wildcard_path(path) and "." not in path:
        val = row.get(path, "")
        if isinstance(val, str):
            return [val] if val else []
        return [str(val)] if val else []
    root = path.split(".")[0]
    raw = row.get(root)
    if raw is None:
        return []
    record = parse_structured_value(raw)
    if record is None:
        return [raw] if isinstance(raw, str) and raw else []
    return extract_nested_fields({root: record}, path)


# ---------------------------------------------------------------------------
# reassembly (reassembly.py:326-488)
# ---------------------------------------------------------------------------


def count_segments_in_meta(fm: dict[str, Any]) -> int:
    """reassembly.py:326-338 — translatable-segment count one field entry
    expects from the translated stream."""
    mode = fm.get("mode", "coarse")
    if mode == "passthrough":
        return 1
    if mode == "coarse":
        return sum(1 for t in fm.get("template", []) if t is None)
    if mode == "fine":
        return sum(1 for u in fm.get("units", []) if u.get("translatable", False))
    return 0


def _reassemble_coarse(fm: dict[str, Any], segs: list[str]) -> str:
    """reassembly.py:427-456 — fill the line template; missing segments
    become empty lines."""
    out: list[str] = []
    leading = fm.get("leading_spaces", [])
    i = 0
    for slot in fm.get("template", []):
        if slot is None:
            if i < len(segs):
                out.append((leading[i] if i < len(leading) else "") + segs[i])
                i += 1
            else:
                out.append("")
        else:
            out.append(slot)
    return "\n".join(out)


def _reassemble_fine(fm: dict[str, Any], segs: list[str]) -> str:
    """reassembly.py:458-488 — splice translated units between frozen
    ones; a missing segment falls back to the original unit."""
    parts: list[str] = []
    i = 0
    for u in fm.get("units", []):
        if u.get("translatable", False):
            if i < len(segs):
                parts.append(segs[i] + u.get("separator", ""))
                i += 1
            else:
                parts.append(u.get("original", "") + u.get("separator", ""))
        else:
            parts.append(u.get("original", "") + u.get("separator", ""))
    return "".join(parts)


def _segment_pairs(fm: dict[str, Any], segs: list[str]) -> list[dict[str, str]]:
    """reassembly.py:403-425 — ``[{src, tgt}, ...]`` for one field entry."""
    mode = fm.get("mode", "coarse")
    if mode == "passthrough":
        return [{"src": fm.get("original_text", ""), "tgt": segs[0] if segs else ""}]
    if mode == "coarse":
        src = fm.get("original_stripped_lines", [])
        return [{"src": s, "tgt": t} for s, t in zip(src, segs)]
    if mode == "fine":
        out: list[dict[str, str]] = []
        i = 0
        for u in fm.get("units", []):
            if u.get("translatable", False):
                out.append(
                    {"src": u.get("original", ""), "tgt": segs[i] if i < len(segs) else ""}
                )
                i += 1
        return out
    return []


def reassemble_document(
    metadata_json: str,
    translated_segments: list[str],
    row: dict[str, Any],
    text_field: str = "text",
    output_field: str = "translated_text",
    replace_source_fields: bool = False,
) -> dict[str, Any]:
    """reassembly.py:130-324 — rebuild one document from its translated
    segments. Returns the columns to merge onto the first row of the
    group: ``output_field`` plus helper maps, and (with
    ``replace_source_fields``) overwritten source columns.

    Deviation for a typed engine: multi-path payloads and updated
    structured roots are emitted as JSON strings (the reference writes
    python dicts into an object column)."""
    meta = json.loads(metadata_json) if metadata_json else {}
    out: dict[str, Any] = {}

    if meta.get("mode") == "skip":
        out[output_field] = ""
        out["_translation_map"] = "{}"
        out["_segmented_translation_map"] = "{}"
        return out

    entries = meta.get("field_metadatas")
    if entries is None:
        # Legacy single-field metadata (no envelope).
        entries = [dict(meta, field_path=meta.get("field_path", text_field))]

    offset = 0
    by_path: dict[str, list[str]] = {}
    tmap: dict[str, Any] = {}
    smap: dict[str, Any] = {}
    for fm in entries:
        n = count_segments_in_meta(fm)
        segs = translated_segments[offset : offset + n]
        offset += n
        mode = fm.get("mode", "coarse")
        path = fm.get("field_path", text_field)
        key = path.split(".")[-1]
        if mode == "passthrough":
            rebuilt = segs[0] if segs else ""
        elif mode == "fine":
            rebuilt = _reassemble_fine(fm, segs)
        elif mode == "coarse":
            rebuilt = _reassemble_coarse(fm, segs)
        else:
            rebuilt = " ".join(segs)
        by_path.setdefault(path, []).append(rebuilt)
        pairs = _segment_pairs(fm, segs)
        if is_wildcard_path(path):
            tmap.setdefault(key, []).append(rebuilt)
            smap.setdefault(key, []).extend(pairs)
        else:
            tmap[key] = rebuilt
            smap[key] = pairs

    payload: Any = ""
    for path, texts in by_path.items():
        if is_wildcard_path(path) or "." in path:
            payload = _write_nested(out, row, path, texts, replace_source_fields)
        else:
            payload = texts[0] if len(texts) == 1 else "\n\n".join(texts)
            if replace_source_fields:
                out[path] = payload
    if not by_path:
        out[output_field] = ""
    elif len(by_path) == 1:
        out[output_field] = payload if isinstance(payload, str) else json.dumps(
            payload, ensure_ascii=False
        )
    else:
        out[output_field] = json.dumps(tmap, ensure_ascii=False)

    out["_translation_map"] = json.dumps(tmap, ensure_ascii=False)
    out["_segmented_translation_map"] = json.dumps(smap, ensure_ascii=False)
    return out


def _write_nested(
    out: dict[str, Any],
    row: dict[str, Any],
    path: str,
    texts: list[str],
    replace: bool,
) -> Any:
    """reassembly.py:305-324 — write texts back into the structured root
    column; unparseable roots degrade to joined plain text."""
    root = path.split(".")[0]
    raw = out.get(root, row.get(root))
    record = parse_structured_value(raw)
    if record is None:
        return "\n\n".join(texts)
    updated = set_nested_fields({root: record}, path, texts)[root]
    updated_str = json.dumps(updated, ensure_ascii=False)
    if replace:
        out[root] = updated_str
    return updated_str


# ---------------------------------------------------------------------------
# FAITH score aggregation (reassembly.py:345-401)
# ---------------------------------------------------------------------------


def average_faith_scores(segment_scores: list[dict[str, float]]) -> dict[str, float]:
    """reassembly.py:382-392 — per-dimension mean over the segments where
    the dimension scored > 0, rounded to 2 places; 0.0 when none did."""
    avg: dict[str, float] = {}
    for key in FAITH_DIMENSIONS.values():
        vals = [s.get(key, 0.0) for s in segment_scores if s.get(key, 0.0) > 0]
        avg[key] = round(sum(vals) / len(vals), 2) if vals else 0.0
    return avg


def compute_faith_avg(scores: dict[str, float]) -> float:
    """reassembly.py:394-401 — mean of the non-zero dimension averages."""
    vals = [float(scores.get(k, 0.0)) for k in FAITH_DIMENSIONS.values()]
    nz = [v for v in vals if v > 0]
    return sum(nz) / len(nz) if nz else 0.0


# ---------------------------------------------------------------------------
# output shaping (utils/metadata.py)
# ---------------------------------------------------------------------------


def build_translation_metadata(
    target_lang: str,
    translated_text: str | None = None,
    translation_map: dict | None = None,
    segmented_translation_map: Any | None = None,
) -> str:
    """utils/metadata.py:23-44 — the ``translation_metadata`` JSON
    envelope (insertion-ordered keys, ``ensure_ascii=False``)."""
    return json.dumps(
        {
            "target_lang": target_lang,
            "translation": (
                translation_map
                if translation_map is not None
                else {"content": translated_text or ""}
            ),
            "segmented_translation": (
                segmented_translation_map if segmented_translation_map is not None else []
            ),
        },
        ensure_ascii=False,
    )


def unwrap_translation(text: str) -> str:
    """translate.py:425-433 — extract the translated text from the
    ``〘...〙`` wrapper the reference's prompt instructs the LLM to emit
    (last-occurrence brackets; a lone opener takes the tail; no wrapper
    returns the text unchanged). Belongs in the LLM-client adapter a
    caller supplies as the ``translator`` seam."""
    lo = text.rfind("〘")
    hi = text.rfind("〙")
    if lo != -1 and hi != -1 and lo < hi:
        return text[lo + 1 : hi]
    if lo != -1:
        return text[lo + 1 :]
    return text


# The packaged translate prompt (prompts/translate.yaml — a published
# Apache-2.0 data constant, reproduced verbatim because parity requires
# the SAME prompt for the same LLM behavior, like the BS.1770
# coefficient table). `{source_lang}`/`{target_lang}`/`{src}` are the
# format slots translate.py:410-417 fills.
from .prompts import (  # noqa: F401,E402 - published constants registry
    TRANSLATE_SYSTEM_PROMPT,
    TRANSLATE_USER_TEMPLATE,
)

# utils/text_utils.py get_language_name resolves ISO codes via iso639
# and falls back to the raw code when the lib is absent (this sandbox).
# A small builtin map covers the codes the reference's examples use so
# prompts read "German", not "de", without the dependency.
_LANGUAGE_NAMES = {
    "ar": "Arabic", "de": "German", "en": "English", "es": "Spanish",
    "fr": "French", "hi": "Hindi", "it": "Italian", "ja": "Japanese",
    "ko": "Korean", "nl": "Dutch", "pl": "Polish", "pt": "Portuguese",
    "ru": "Russian", "sv": "Swedish", "th": "Thai", "tr": "Turkish",
    "vi": "Vietnamese", "zh": "Chinese",
}


def get_language_name(lang_code: str) -> str:
    """text_utils.py:223-248 — readable language name for an ISO code;
    iso639 when importable, builtin map, else the code itself."""
    if not lang_code:
        return ""
    try:
        import iso639  # noqa: PLC0415

        lang_ctor = getattr(iso639, "Lang", None)
        if callable(lang_ctor):
            return lang_ctor(lang_code).name
    except Exception:  # noqa: BLE001 — absent lib / unknown code fall through
        pass
    return _LANGUAGE_NAMES.get(lang_code.lower(), lang_code)


def build_translation_messages(
    segment: str,
    source_lang: str,
    target_lang: str,
    system_prompt: str | None = None,
    user_template: str | None = None,
) -> list[dict]:
    """translate.py:404-418 — the chat-message pair for one segment.
    Custom prompts slot in via the two overrides (the reference's
    ``prompt_path`` YAML contract, minus the YAML file)."""
    return [
        {"role": "system", "content": system_prompt or TRANSLATE_SYSTEM_PROMPT},
        {
            "role": "user",
            "content": (user_template or TRANSLATE_USER_TEMPLATE).format(
                source_lang=get_language_name(source_lang),
                target_lang=get_language_name(target_lang),
                src=segment,
            ),
        },
    ]


def make_llm_translator(
    llm_fn,
    source_lang: str,
    target_lang: str,
    system_prompt: str | None = None,
    user_template: str | None = None,
):
    """Adapter completing the reference's LLM protocol around a raw
    chat client: build messages (translate.py:404-418), call
    ``llm_fn(messages) -> str``, unwrap the ``〘...〙`` response
    (translate.py:425-433). Returns the ``list[str] -> list[str]``
    callable ``translate_segments`` takes as its ``translator`` seam —
    so a user with any LLM client plugs in the raw completion call and
    gets the reference's prompt + parsing behavior for free."""

    def _translate(segments: list[str]) -> list[str]:
        return [
            unwrap_translation(
                str(
                    llm_fn(
                        build_translation_messages(
                            s,
                            source_lang,
                            target_lang,
                            system_prompt=system_prompt,
                            user_template=user_template,
                        )
                    )
                )
            )
            for s in segments
        ]

    return _translate


# evaluation/faith.py prompt (prompts/faith_eval.yaml — published
# Apache-2.0 data constant, verbatim for score parity; `{{`/`}}` are
# str.format escapes for the literal JSON braces in the rubric).
from .prompts import (  # noqa: F401,E402 - published constants registry
    FAITH_EVAL_SYSTEM_PROMPT,
    FAITH_EVAL_USER_TEMPLATE,
)


def _json_string_state(ch: str, in_string: bool, escape: bool) -> tuple[bool, bool, bool]:
    """evaluation/faith.py:61-73 — (in_string, escape, consumed) after ch."""
    if in_string:
        if escape:
            return True, False, True
        if ch == "\\":
            return True, True, True
        if ch == '"':
            return False, False, True
        return True, False, True
    if ch == '"':
        return True, False, True
    return False, False, False


def extract_json_object(text: str) -> str | None:
    """evaluation/faith.py:76-103,423-444 — first balanced ``{...}``
    outside a JSON string literal (braces inside quoted strings neither
    anchor nor unbalance the scan; nested objects supported)."""
    in_string = False
    escape = False
    start = -1
    depth = 0
    for idx, ch in enumerate(text):
        in_string, escape, consumed = _json_string_state(ch, in_string, escape)
        if consumed:
            continue
        if ch == "{":
            if start == -1:
                start = idx
            depth += 1
        elif ch == "}" and start != -1:
            depth -= 1
            if depth == 0:
                return text[start : idx + 1]
    return None


def extract_faith_scores(text: str) -> tuple[dict[str, float], bool]:
    """evaluation/faith.py:447-483 — parse an LLM FAITH response into
    ``(scores, parse_failed)``: the five dimensions as floats, missing or
    non-numeric keys 0.0 ("zero means not applicable"); ``parse_failed``
    iff no balanced object was found or it wasn't a JSON dict."""
    zero = dict.fromkeys(FAITH_DIMENSIONS.values(), 0.0)
    candidate = extract_json_object(text or "")
    if candidate is None:
        return zero, True
    try:
        parsed = json.loads(candidate)
    except (json.JSONDecodeError, ValueError):
        return zero, True
    if not isinstance(parsed, dict):
        return zero, True
    out: dict[str, float] = {}
    for key in FAITH_DIMENSIONS.values():
        try:
            out[key] = float(parsed[key])
        except (KeyError, TypeError, ValueError):
            out[key] = 0.0
    return out, False


def build_faith_messages(
    source_text: str,
    translated_text: str,
    source_lang: str,
    target_lang: str,
    system_prompt: str | None = None,
    user_template: str | None = None,
) -> list[dict]:
    """evaluation/faith.py:346-367 — the FAITH-eval chat-message pair
    for one (source, translation) row; both templates take the resolved
    language names."""
    src_name = get_language_name(source_lang)
    dst_name = get_language_name(target_lang)
    return [
        {
            "role": "system",
            "content": (system_prompt or FAITH_EVAL_SYSTEM_PROMPT).format(
                source_language=src_name, target_language=dst_name
            ),
        },
        {
            "role": "user",
            "content": (user_template or FAITH_EVAL_USER_TEMPLATE).format(
                source_language=src_name,
                target_language=dst_name,
                source_text=source_text,
                translated_text=translated_text,
            ),
        },
    ]


def make_llm_faith_scorer(
    llm_fn,
    source_lang: str,
    target_lang: str,
    system_prompt: str | None = None,
    user_template: str | None = None,
):
    """Adapter around a raw chat client for the FAITH-eval seam: builds
    the rubric messages per row and returns the RAW responses (parsing
    stays in ``extract_faith_scores`` so parse failures are attributable
    per row, as the reference keeps them). Returns the
    ``(list[src], list[dst]) -> list[str]`` callable
    ``operators.translation.score_faith`` takes as its ``scorer`` seam."""

    def _score(sources: list[str], translations: list[str]) -> list[str]:
        return [
            str(
                llm_fn(
                    build_faith_messages(
                        s,
                        t,
                        source_lang,
                        target_lang,
                        system_prompt=system_prompt,
                        user_template=user_template,
                    )
                )
            )
            for s, t in zip(sources, translations)
        ]

    return _score


def load_prompt_template(filename_or_path) -> tuple:
    """utils/prompt_loader.py:26-70 — resolve a prompt source into
    ``(system_prompt, user_template)``. A bare filename resolves against
    the packaged prompts (here the two verbatim constants standing in
    for the reference's ``prompts/`` YAML dir); an absolute path loads a
    user YAML with the reference's validation: top-level mapping with
    ``system`` and ``user`` keys, same exception types per failure."""
    import os

    path = str(filename_or_path)
    if not os.path.isabs(path):
        builtin = {
            "translate.yaml": (TRANSLATE_SYSTEM_PROMPT, TRANSLATE_USER_TEMPLATE),
            "faith_eval.yaml": (FAITH_EVAL_SYSTEM_PROMPT, FAITH_EVAL_USER_TEMPLATE),
        }
        if path not in builtin:
            msg = f"Prompt template not found: {path}"
            raise FileNotFoundError(msg)
        return builtin[path]
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover — present in this env
        msg = "loading a custom prompt YAML requires pyyaml"
        raise ImportError(msg) from exc
    try:
        with open(path, encoding="utf-8") as fh:
            data = yaml.safe_load(fh)
    except FileNotFoundError as exc:
        msg = f"Prompt template not found: {path}"
        raise FileNotFoundError(msg) from exc
    except yaml.YAMLError as exc:
        msg = f"Malformed prompt template {path}: {exc}"
        raise ValueError(msg) from exc
    if not isinstance(data, dict):
        msg = (
            f"Prompt template {path} must contain a top-level mapping, "
            f"got {type(data).__name__}"
        )
        raise TypeError(msg)
    missing = [k for k in ("system", "user") if k not in data]
    if missing:
        msg = f"Prompt template {path} is missing required keys: {missing}"
        raise KeyError(msg)
    return data["system"], data["user"]


def retry_with_backoff(
    fn: Callable[[], Any],
    max_retries: int = 5,
    backend_name: str = "",
    non_retryable: tuple = (),
    max_backoff_seconds: float = 60.0,
    sleep: Callable[[float], None] | None = None,
):
    """backends/_retry.py:40-… — exponential-backoff retry loop for a
    zero-arg callable: attempt k sleeps ``min(2**k, cap)`` seconds before
    retrying; ``non_retryable`` exception types and the final failure are
    re-raised to the caller. The reference wraps async single-text AWS /
    Google clients; here the seams are synchronous batch callables, so
    this is the sync shape — wrap an injected translator/scorer with
    ``lambda: translator(batch)`` to give any backend the same retry
    contract. ``sleep`` is injectable for tests (default
    ``time.sleep``)."""
    do_sleep = sleep if sleep is not None else time.sleep
    last_exc: Exception | None = None
    for attempt in range(max_retries):
        try:
            return fn()
        except non_retryable:
            raise
        except Exception as exc:  # noqa: BLE001 — backend errors are opaque
            last_exc = exc
            if attempt < max_retries - 1:
                do_sleep(min(2.0 ** attempt, max_backoff_seconds))
    msg = f"{backend_name or 'backend'}: all {max_retries} attempts failed"
    raise RuntimeError(msg) from last_exc


def merge_faith_scores_into_metadata(metadata_json: str, faith_scores: dict) -> str:
    """utils/metadata.py:47-57 — attach ``faith_scores``; unparseable
    metadata degrades to a fresh object."""
    try:
        meta = json.loads(metadata_json)
    except (json.JSONDecodeError, TypeError):
        meta = {}
    if not isinstance(meta, dict):
        meta = {}
    meta["faith_scores"] = faith_scores
    return json.dumps(meta, ensure_ascii=False)


def reconstruct_messages_with_translation(
    original_messages: list[dict],
    translated_text: Any,
    field_path: str = "content",
) -> list[dict]:
    """utils/metadata.py:61-117 — copy the chat messages with translated
    content spliced in. A payload that is already a list of message dicts
    (or a JSON array of dicts) replaces the messages outright; otherwise
    the text is split on ``\\n---\\n`` and written onto each message's
    ``field_path`` leaf in order (intermediate path keys must exist and be
    dicts; the leaf key is set unconditionally)."""
    if not original_messages:
        return []
    structured = _structured_messages(translated_text)
    if structured is not None:
        return structured
    text = "" if translated_text is None else str(translated_text)
    parts = text.split("\n---\n") if "\n---\n" in text else [text]
    messages = copy.deepcopy(original_messages)
    keys = field_path.split(".")
    for i, msg in enumerate(messages):
        if i >= len(parts):
            break
        node: Any = msg
        for k in keys[:-1]:
            if isinstance(node, dict) and k in node and isinstance(node[k], dict):
                node = node[k]
            else:
                node = None
                break
        if isinstance(node, dict) and keys:
            node[keys[-1]] = parts[i]
    return messages


def _structured_messages(translated_text: Any) -> list[dict] | None:
    """utils/metadata.py:100-117 — already-structured payload detection:
    a list (or JSON array string starting with ``[``) whose items are all
    dicts; anything else falls through to text splitting."""
    if isinstance(translated_text, list):
        return (
            copy.deepcopy(translated_text)
            if all(isinstance(m, dict) for m in translated_text)
            else None
        )
    if isinstance(translated_text, str):
        s = translated_text.strip()
        if not s.startswith("["):
            return None
        try:
            parsed = json.loads(s)
        except (json.JSONDecodeError, TypeError):
            return None
        if isinstance(parsed, list) and all(isinstance(m, dict) for m in parsed):
            return parsed
    return None
