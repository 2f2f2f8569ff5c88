"""Pure-python kernels for the omni OCR synthetic-QA stages.

Reference: ``stages/synthetic/omni/`` — the OCR SDG pipeline that turns
word-level dense OCR output into multi-turn VQA conversations:

- ``ocr_nemotron_v2.py:39-54`` — the model prediction -> dense-item
  coordinate conversion (0-1 floats -> 0-1000 ints, inverted y naming);
- ``ocr_dense_qa.py`` — the fully model-free QA generation: balanced
  type sampling, prompt escaping, bbox/point geometry, the six QA
  generators, and conversation assembly;
- ``ocr_conversationalize.py`` — the dense-dump question pool and the
  eleven word-list output formats;
- ``ocr_scoring_qa.py`` — the verifier prompt build (y-first bbox
  swap), response JSON extraction, per-bbox score application and the
  image-level validity rules.

Determinism: the reference seeds ``random.Random(task_id)`` — a pure
function of the row — so every draw here replicates the reference
BIT-FOR-BIT while staying stable under partitioning and task retry
(unlike the Nemotron-CC stages, whose global-RNG draws needed the
md5-derived deviation). ``first_choice_rng`` is the degenerate sampler
the SQL value-oracle injects instead: every choice becomes "first
option, original order", which a declarative replay can re-derive.

OCR items are plain dicts throughout (the reference's ``OCRDenseItem``
dataclass fields): ``{"bbox_2d": [x1, y1, x2, y2], "text_content": str,
"valid": bool, "bbox_match": int|None, "text_errors": int|None}``.
The verifier LLM itself is the operator-level injectable seam.
"""

from __future__ import annotations

import json
import math
import random
import re
from collections import defaultdict

from .prompts import (  # noqa: F401 - published constants, one registry
    OCR_BBOX_TO_TEXT_TEMPLATES,
    OCR_POINT_TO_WORD_QUESTION_TEMPLATES,
    OCR_SCORING_PROMPT_TEMPLATE,
    OCR_SDG_PROMPT_VARIATIONS,
    OCR_TEXT_TO_BBOX_MULTI_BASES,
    OCR_TEXT_TO_BBOX_SINGLE_BASES,
    OCR_TEXT_TO_POINT_BASES,
    OCR_TEXT_TO_POINT_MULTI_BASES,
)

__all__ = [
    "MAX_QA_PAIRS",
    "WORD_OUTPUT_FORMATS",
    "apply_scoring",
    "balanced_sample_qa",
    "build_conversation",
    "build_dense_conversation",
    "build_qa_tagged",
    "escape_text_for_prompt",
    "first_choice_rng",
    "parse_json_object",
    "scoring_prompt",
    "to_dense_item",
]

MAX_QA_PAIRS = 100
_UPPERCASE_RAW_PROB = 0.5
_MAX_INVALIDS_FOR_TEXT_TO_BBOX = 5
_BBOX_COORD_COUNT = 4

QA_TYPE_BBOX_TO_TEXT = "bbox_to_text"
QA_TYPE_POINT_TO_TEXT = "point_to_text"
QA_TYPE_TEXT_TO_BBOX = "text_to_bbox"
QA_TYPE_TEXT_TO_POINT = "text_to_point"


# ---------------------------------------------------------------------------
# ocr_nemotron_v2.py:39-54 — prediction dict -> dense item


def to_dense_item(pred: dict) -> dict:
    """NemotronOCR-v2 prediction -> dense item on the 0-1000 grid. The
    model reports 0-1 floats with inverted y naming (``lower`` = top
    edge); min/max sorting guarantees y1 <= y2."""
    x1 = int(pred["left"] * 1000)
    x2 = int(pred["right"] * 1000)
    y1 = int(min(pred["upper"], pred["lower"]) * 1000)
    y2 = int(max(pred["upper"], pred["lower"]) * 1000)
    return {"bbox_2d": [x1, y1, x2, y2], "text_content": str(pred["text"]), "valid": True}


# ---------------------------------------------------------------------------
# geometry + escaping (ocr_dense_qa.py:111-156)


def _fmt_box(bbox) -> str:
    return f"[{bbox[0]}, {bbox[1]}, {bbox[2]}, {bbox[3]}]"


def _bbox_center(bbox) -> tuple:
    return ((int(bbox[0]) + int(bbox[2])) // 2, (int(bbox[1]) + int(bbox[3])) // 2)


def _bbox_center_x(b) -> float:
    return (b[0] + b[2]) / 2


def _bbox_center_y(b) -> float:
    return (b[1] + b[3]) / 2


def _bbox_dist_from_center(b) -> float:
    cx, cy = _bbox_center_x(b), _bbox_center_y(b)
    return math.sqrt((cx - 500) ** 2 + (cy - 500) ** 2)


def _point_dist_from_center(p) -> float:
    return math.sqrt((p[0] - 500) ** 2 + (p[1] - 500) ** 2)


def escape_text_for_prompt(text: str, rng) -> str:
    """Quote text for safe prompt insertion (ocr_dense_qa.py:144-156):
    all-caps alphabetic text passes raw half the time; texts containing
    one quote kind get the other; otherwise a coin picks the quote."""
    if text.isupper() and any(c.isalpha() for c in text) and rng.random() < _UPPERCASE_RAW_PROB:
        return text
    if '"' in text:
        escaped = text.replace("\\", "\\\\").replace("'", "\\'")
        return "'" + escaped + "'"
    if "'" in text:
        escaped = text.replace("\\", "\\\\").replace('"', '\\"')
        return '"' + escaped + '"'
    if rng.choice([True, False]):
        escaped = text.replace("\\", "\\\\").replace("'", "\\'")
        return "'" + escaped + "'"
    escaped = text.replace("\\", "\\\\").replace('"', '\\"')
    return '"' + escaped + '"'


# ---------------------------------------------------------------------------
# answer-format pools (ocr_dense_qa.py:177-382) as DATA: each pool row
# is (format_instruction, render_kind[, reverse]) and one renderer per
# value family produces the answer string. Row order is load-bearing —
# rng.choice indexes these exact sequences — and every rendered byte is
# pinned against the executed reference module in tests/test_ocrqa.py.


def _render_box(kind: str, b) -> str:
    if kind == "bracket":
        return _fmt_box(b)
    if kind == "plain":
        return f"{b[0]}, {b[1]}, {b[2]}, {b[3]}"
    if kind == "json0":
        return f'{{"x0": {b[0]}, "y0": {b[1]}, "x1": {b[2]}, "y1": {b[3]}}}'
    if kind == "jsonmin":
        return (
            f'{{"x_min": {b[0]}, "y_min": {b[1]},'
            f' "x_max": {b[2]}, "y_max": {b[3]}}}'
        )
    if kind == "tag":
        return f"<box>{_fmt_box(b)}</box>"
    return json.dumps({"bbox_2d": list(b)})  # "json2d"


_BBOX_FORMAT_ROWS = (
    ("Answer with the bounding box as [x1, y1, x2, y2].", "bracket"),
    ("Give the bounding box coordinates as [x_min, y_min, x_max, y_max].", "bracket"),
    ("Provide the box as [x0, y0, x1, y1].", "bracket"),
    ("Just write down the box coordinates.", "plain"),
    ("Reply with coordinates x1, y1, x2, y2.", "plain"),
    ("Give me the bounding box coordinates as [x0, y0, x1, y1].", "bracket"),
    ("Would be great to get the bounding box as json {x0, y0, x1, y1}.", "json0"),
    ("Format the box as a dictionary with keys x0, y0, x1, y1.", "json0"),
    ("Give the bounding box as x_min, y_min, x_max, y_max.", "plain"),
    ("Provide the box as [x_min, y_min, x_max, y_max].", "bracket"),
    ("Answer with a dictionary with keys x_min, y_min, x_max, y_max.", "jsonmin"),
    ("Format the box as json {x_min, y_min, x_max, y_max}.", "jsonmin"),
    ("Wrap the bounding box in <box></box> tags as [x1, y1, x2, y2].", "tag"),
    ("Reply with a JSON object with key bbox_2d (list [x1, y1, x2, y2]).", "json2d"),
)

_BBOX_FORMAT_TEMPLATES = [
    (lambda b, _k=k, _t=t: (_t, _render_box(_k, b))) for t, k in _BBOX_FORMAT_ROWS
]


def _render_point(kind: str, c) -> str:
    if kind == "plain":
        return f"{c[0]}, {c[1]}"
    if kind == "bracket":
        return f"[{c[0]}, {c[1]}]"
    if kind == "paren":
        return f"({c[0]}, {c[1]})"
    if kind == "space":
        return f"{c[0]} {c[1]}"
    if kind == "jsonxy":
        return f'{{"x": {c[0]}, "y": {c[1]}}}'
    if kind == "tag":
        return f"<point>({c[0]}, {c[1]})</point>"
    return json.dumps({"point_2d": [c[0], c[1]]})  # "json2d"


_POINT_FORMAT_ROWS = (
    ("Give the point as x, y.", "plain"),
    ("Answer with the center as [x, y].", "bracket"),
    ("Provide the point coordinates as [x, y].", "bracket"),
    ("Reply with the center point x, y.", "plain"),
    ("Give the point as a dict with keys x and y.", "jsonxy"),
    ("Wrap the point in <point></point> tags as (x, y).", "tag"),
    ("Reply with a JSON object with key point_2d (list [x, y]).", "json2d"),
)

_POINT_FORMAT_TEMPLATES = [
    (lambda c, _k=k, _t=t: (_t, _render_point(_k, c))) for t, k in _POINT_FORMAT_ROWS
]


def _render_points(kind: str, pts) -> str:
    if kind == "lines":
        return "\n".join(_render_point("plain", p) for p in pts)
    if kind == "commas":
        return ", ".join(_render_point("bracket", p) for p in pts)
    if kind == "lines_bracket":
        return "\n".join(_render_point("bracket", p) for p in pts)
    if kind == "and":
        return " and ".join(_render_point("plain", p) for p in pts)
    if kind == "tag_nest":
        inner = ", ".join(_render_point("paren", p) for p in pts)
        return f"<point>[{inner}]</point>"
    return json.dumps([{"point_2d": [x, y]} for x, y in pts])  # "json2d"


_POINT_LIST_FORMAT_ROWS = (
    ("Give each point as x, y, one per line.", "lines"),
    ("Provide each center as [x, y], comma-separated.", "commas"),
    ("List each point as [x, y] on its own line.", "lines_bracket"),
    ('Reply with each point as x, y separated by the word "and".', "and"),
    ("Wrap all points in <point></point> as a nested list of (x, y).", "tag_nest"),
    ("Output a JSON list of objects, each with key point_2d (list [x, y]).", "json2d"),
)

_POINT_LIST_FORMAT_TEMPLATES = [
    (lambda pts, _k=k, _t=t: (_t, _render_points(_k, pts)))
    for t, k in _POINT_LIST_FORMAT_ROWS
]

_POINT_IN_QUESTION_KINDS = ("plain", "bracket", "paren", "space", "jsonxy")

_POINT_IN_QUESTION_FORMATS = [
    (lambda c, _k=k: _render_point(_k, c)) for k in _POINT_IN_QUESTION_KINDS
]


def _render_boxes(kind: str, boxes) -> str:
    if kind == "lines":
        return "\n".join(_fmt_box(b) for b in boxes)
    if kind == "commas":
        return ", ".join(_fmt_box(b) for b in boxes)
    if kind == "and":
        return " and ".join(_fmt_box(b) for b in boxes)
    if kind == "json_arrays":
        return json.dumps([list(b) for b in boxes])
    if kind == "json0":
        return json.dumps([{"x0": b[0], "y0": b[1], "x1": b[2], "y1": b[3]} for b in boxes])
    if kind == "lines_plain":
        return "\n".join(_render_box("plain", b) for b in boxes)
    if kind == "jsonmin":
        return json.dumps(
            [{"x_min": b[0], "y_min": b[1], "x_max": b[2], "y_max": b[3]} for b in boxes]
        )
    if kind == "tag_nest":
        inner = ", ".join("[" + ",".join(str(c) for c in b) + "]" for b in boxes)
        return f"<box>[{inner}]</box>"
    return json.dumps([{"bbox_2d": list(b)} for b in boxes])  # "json2d"


_LIST_FORMAT_ROWS = (
    ("Give each bounding box as [x1, y1, x2, y2], one per line.", "lines"),
    ("Provide each box as [x1, y1, x2, y2], comma-separated.", "commas"),
    ('List each bounding box as [x1, y1, x2, y2] separated by "and".', "and"),
    ("Output a JSON array of arrays, each [x0, y0, x1, y1].", "json_arrays"),
    ("Format as a JSON list of objects with keys x0, y0, x1, y1.", "json0"),
    ("Give each box as x_min, y_min, x_max, y_max, one per line.", "lines_plain"),
    ("Output a JSON list of objects with keys x_min, y_min, x_max, y_max.", "jsonmin"),
    (
        "Wrap all bounding boxes in a single <box></box> span as a nested list of [x1, y1, x2, y2] per box.",
        "tag_nest",
    ),
    ("Output a JSON list of objects, each with key bbox_2d (list [x1, y1, x2, y2]).", "json2d"),
)

_LIST_FORMAT_TEMPLATES = [
    (lambda boxes, _k=k, _t=t: (_t, _render_boxes(_k, boxes)))
    for t, k in _LIST_FORMAT_ROWS
]

# sort pools: (instruction, key_kind, reverse); the key functions are
# the geometry helpers above

_BOX_KEYS = {
    "xy": lambda b: (b[0], b[1]),
    "yx": lambda b: (b[1], b[0]),
    "cx": _bbox_center_x,
    "cy": _bbox_center_y,
    "center_dist": _bbox_dist_from_center,
    "cx_central": lambda b: abs(_bbox_center_x(b) - 500),
    "cy_central": lambda b: abs(_bbox_center_y(b) - 500),
}

_BBOX_SORT_ROWS = (
    ("", "xy", False),
    ("List them sorted from left to right.", "xy", False),
    ("List them from top to bottom.", "yx", False),
    ("Sort by horizontal center, left to right.", "cx", False),
    ("Sort by vertical center, top to bottom.", "cy", False),
    ("List them starting from the center of the image outward.", "center_dist", False),
    ("Sort by horizontal centrality (closest to middle column first).", "cx_central", False),
    ("Sort by vertical centrality (closest to middle row first).", "cy_central", False),
)

_BBOX_SORT_GENERATORS = [
    (lambda boxes, _k=k, _r=r, _t=t: (_t, sorted(boxes, key=_BOX_KEYS[_k], reverse=_r)))
    for t, k, r in _BBOX_SORT_ROWS
]

_PT_KEYS = {
    "xy": lambda p: (p[0], p[1]),
    "yx": lambda p: (p[1], p[0]),
    "center_dist": _point_dist_from_center,
    "x_central": lambda p: abs(p[0] - 500),
    "y_central": lambda p: abs(p[1] - 500),
}

_POINT_SORT_ROWS = (
    ("", "xy", False),
    ("List them sorted from left to right.", "xy", False),
    ("List them from right to left.", "xy", True),
    ("List them from top to bottom.", "yx", False),
    ("List them from bottom to top.", "yx", True),
    ("List them starting from the center of the image outward.", "center_dist", False),
    ("List them from the edges inward.", "center_dist", True),
    ("Sort by horizontal centrality (closest to middle column first).", "x_central", False),
    ("Sort by vertical centrality (closest to middle row first).", "y_central", False),
)

_POINT_SORT_GENERATORS = [
    (lambda pts, _k=k, _r=r, _t=t: (_t, sorted(pts, key=_PT_KEYS[_k], reverse=_r)))
    for t, k, r in _POINT_SORT_ROWS
]


# ---------------------------------------------------------------------------
# ocr_conversationalize.py:77-170 — dense-dump word-list output formats
# over item DICTS (the reference takes OCRDenseItem attributes).


def _fmt_json_like(instruction: str):
    def fmt(items):
        return (
            instruction,
            json.dumps([{"bbox_2d": list(o["bbox_2d"]), "text_content": o["text_content"]} for o in items]),
        )

    return fmt


def _fmt_json_markdown(items):
    return (
        "Wrap the JSON output containing each bounding box and text in a markdown code block: ```json ... ```",
        "```json\n"
        + json.dumps([{"bbox_2d": list(o["bbox_2d"]), "text_content": o["text_content"]} for o in items])
        + "\n```",
    )


def _fmt_text_per_line(items):
    return (
        "Output one word per line as: text followed by bbox [x1, y1, x2, y2].",
        "\n".join(f"{o['text_content']} {list(o['bbox_2d'])}" for o in items),
    )


def _fmt_text_bracket(items):
    return (
        'List each word on its own line as: "[x1, y1, x2, y2]: text".',
        "\n".join(f"{list(o['bbox_2d'])}: {o['text_content']}" for o in items),
    )


def _fmt_text_tuple(items):
    return (
        "Reply with plain text, one word per line as: text (x1, y1, x2, y2).",
        "\n".join(f"{o['text_content']} {tuple(o['bbox_2d'])}" for o in items),
    )


def _fmt_markdown_table(items):
    return (
        "Output a markdown table with columns: text | bbox.",
        "| text | bbox |\n|------|------|\n"
        + "\n".join(f"| {o['text_content']!r} | {list(o['bbox_2d'])} |" for o in items),
    )


def _fmt_tsv(items):
    return (
        "Give each word as a single line: tab-separated text and bbox coordinates.",
        "\n".join(
            f"{o['text_content']}\t{o['bbox_2d'][0]}\t{o['bbox_2d'][1]}\t{o['bbox_2d'][2]}\t{o['bbox_2d'][3]}"
            for o in items
        ),
    )


WORD_OUTPUT_FORMATS = [
    _fmt_json_like("Output must be a JSON list only, no markdown. Output the text and bounding box."),
    _fmt_json_markdown,
    _fmt_json_like("Use keys bbox_2d (list [x1, y1, x2, y2]) and text_content (string). Return a JSON array."),
    _fmt_json_like('Format each item as {"bbox_2d": [x1, y1, x2, y2], "text_content": "..."}. One JSON list.'),
    _fmt_json_like("Reply with a JSON list of objects with keys bbox_2d and text_content. No extra text."),
    _fmt_json_like("Output a JSON list. Each entry: bbox_2d as [x_min, y_min, x_max, y_max] and text_content."),
    _fmt_text_per_line,
    _fmt_text_bracket,
    _fmt_text_tuple,
    _fmt_markdown_table,
    _fmt_tsv,
]


# ---------------------------------------------------------------------------
# QA generators (ocr_dense_qa.py:389-436)


def _gen_bbox_to_text(rng, bbox, text):
    return (rng.choice(OCR_BBOX_TO_TEXT_TEMPLATES).format(_fmt_box(bbox)), text)


def _gen_point_to_text(rng, point, text):
    q_tpl = rng.choice(OCR_POINT_TO_WORD_QUESTION_TEMPLATES)
    point_str = rng.choice(_POINT_IN_QUESTION_FORMATS)(point)
    return (q_tpl.format(point_str), text)


def _gen_text_to_bbox_single(rng, text, bbox):
    base = rng.choice(OCR_TEXT_TO_BBOX_SINGLE_BASES).format(escape_text_for_prompt(text, rng))
    fmt_instruction, answer = rng.choice(_BBOX_FORMAT_TEMPLATES)(tuple(bbox))
    return (f"{base} {fmt_instruction}", answer)


def _gen_text_to_bbox_multi(rng, text, bboxes):
    base = rng.choice(OCR_TEXT_TO_BBOX_MULTI_BASES).format(escape_text_for_prompt(text, rng))
    sort_instruction, sorted_boxes = rng.choice(_BBOX_SORT_GENERATORS)(bboxes)
    fmt_instruction, answer = rng.choice(_LIST_FORMAT_TEMPLATES)(sorted_boxes)
    parts = [base, sort_instruction, fmt_instruction]
    return (" ".join(p for p in parts if p), answer)


def _gen_text_to_point_single(rng, text, bbox):
    base = rng.choice(OCR_TEXT_TO_POINT_BASES).format(escape_text_for_prompt(text, rng))
    center = _bbox_center(bbox)
    fmt_instruction, answer = rng.choice(_POINT_FORMAT_TEMPLATES)(center)
    return (f"{base} {fmt_instruction}", answer)


def _gen_text_to_point_multi(rng, text, bboxes):
    base = rng.choice(OCR_TEXT_TO_POINT_MULTI_BASES).format(escape_text_for_prompt(text, rng))
    centers = [_bbox_center(b) for b in bboxes]
    sort_instruction, sorted_centers = rng.choice(_POINT_SORT_GENERATORS)(centers)
    fmt_instruction, answer = rng.choice(_POINT_LIST_FORMAT_TEMPLATES)(sorted_centers)
    parts = [base, sort_instruction, fmt_instruction]
    return (" ".join(p for p in parts if p), answer)


def _gen_dense_dump(rng, words):
    question_base = rng.choice(OCR_SDG_PROMPT_VARIATIONS)
    format_fn = rng.choice(WORD_OUTPUT_FORMATS)
    format_suffix, answer = format_fn(words)
    return (f"{question_base} {format_suffix}", answer)


# ---------------------------------------------------------------------------
# balanced sampler (ocr_dense_qa.py:67-103)


def balanced_sample_qa(tagged: list, max_pairs: int, rng) -> list:
    """Sample up to max_pairs (q, a) from tagged (type, q, a), balancing
    by type: sorted types get floor quotas + remainder-first extras;
    leftovers fill any shortfall; final order shuffled."""
    if len(tagged) <= max_pairs:
        result = [(q, a) for _, q, a in tagged]
        rng.shuffle(result)
        return result
    by_type: dict = defaultdict(list)
    for typ, q, a in tagged:
        by_type[typ].append((q, a))
    types = sorted(by_type.keys())
    n_types = len(types)
    base_quota = max_pairs // n_types
    remainder = max_pairs % n_types
    selected: list = []
    leftover: list = []
    for i, typ in enumerate(types):
        bucket = by_type[typ]
        quota = base_quota + (1 if i < remainder else 0)
        take = min(quota, len(bucket))
        if take >= len(bucket):
            selected.extend(bucket)
        else:
            indices = set(rng.sample(range(len(bucket)), take))
            for j, p in enumerate(bucket):
                if j in indices:
                    selected.append(p)
                else:
                    leftover.append(p)
    need = max_pairs - len(selected)
    if need > 0 and leftover:
        selected.extend(rng.sample(leftover, min(need, len(leftover))))
    rng.shuffle(selected)
    return selected


# ---------------------------------------------------------------------------
# QA build + conversation assembly (ocr_dense_qa.py:437-542). The
# conversation is the plain-dict shape of ConversationSample.to_dict
# (utils/conversation.py:81-99): fragments are strings, media fragments
# are {"t": "image", "value": <name>} dicts.


def build_qa_tagged(items: list, task_id: str, rng_factory=random.Random):
    """Build the full tagged QA list for one image's dense items and
    return ``(qa_tagged, rng)`` — callers keep using the SAME rng for
    sampling, exactly like the reference. Texts group by content (each
    distinct text draws ONE mode); text->bbox/point modes are disabled
    when >= 5 items are invalid."""
    words = items or []
    valid_words = [w for w in words if w.get("valid", True)]
    num_invalid = sum(1 for w in words if not w.get("valid", True))
    allow_text_to_bbox = num_invalid < _MAX_INVALIDS_FOR_TEXT_TO_BBOX

    rng = rng_factory(task_id)
    qa_tagged: list = []
    text_to_bboxes: dict = defaultdict(list)
    for raw in valid_words:
        bbox = raw.get("bbox_2d")
        text = (raw.get("text_content") or "").strip()
        if not bbox or len(bbox) != _BBOX_COORD_COUNT or not text:
            continue
        text_to_bboxes[text].append(bbox)

    for text, bboxes in text_to_bboxes.items():
        mode = rng.choice((0, 1, 2, 3) if allow_text_to_bbox else (0, 1))
        if mode == 0:
            q, a = _gen_bbox_to_text(rng, bboxes[0], text)
            qa_tagged.append((QA_TYPE_BBOX_TO_TEXT, q, a))
        elif mode == 1:
            point = _bbox_center(bboxes[0])
            q, a = _gen_point_to_text(rng, point, text)
            qa_tagged.append((QA_TYPE_POINT_TO_TEXT, q, a))
        elif allow_text_to_bbox:
            loc_type = rng.choice([QA_TYPE_TEXT_TO_BBOX, QA_TYPE_TEXT_TO_POINT])
            if len(bboxes) == 1:
                if loc_type == QA_TYPE_TEXT_TO_BBOX:
                    q, a = rng.choice(
                        (
                            lambda t, b: _gen_text_to_bbox_single(rng, t, b),
                            lambda t, b: _gen_text_to_bbox_multi(rng, t, [b]),
                        )
                    )(text, bboxes[0])
                else:
                    q, a = rng.choice(
                        (
                            lambda t, b: _gen_text_to_point_single(rng, t, b),
                            lambda t, b: _gen_text_to_point_multi(rng, t, [b]),
                        )
                    )(text, bboxes[0])
                qa_tagged.append((loc_type, q, a))
            else:
                if loc_type == QA_TYPE_TEXT_TO_BBOX:
                    q, a = _gen_text_to_bbox_multi(rng, text, bboxes)
                else:
                    q, a = _gen_text_to_point_multi(rng, text, bboxes)
                qa_tagged.append((loc_type, q, a))

    return qa_tagged, rng


def _image_fragment(image_name: str) -> dict:
    return {"t": "image", "value": image_name}


def build_conversation(qa_tagged: list, rng, image_name: str):
    """Sample qa_tagged and assemble the serialized conversation dict,
    or None when empty: first user turn carries the image fragment, then
    alternating user/assistant turns."""
    qa_pairs = balanced_sample_qa(qa_tagged, MAX_QA_PAIRS, rng)
    if not qa_pairs:
        return None
    first_q, first_a = qa_pairs[0]
    messages = [
        {"sender": "user", "fragments": [_image_fragment(image_name), first_q]},
        {"sender": "assistant", "fragments": [first_a]},
    ]
    for q, a in qa_pairs[1:]:
        messages.append({"sender": "user", "fragments": [q]})
        messages.append({"sender": "assistant", "fragments": [a]})
    return {"conversation": messages}


def build_dense_conversation(words: list, rng, image_name: str):
    """Single-turn dense dump listing every word with its bbox — used
    only when OCR is provably complete (no missing text reported)."""
    q, a = _gen_dense_dump(rng, words)
    return {
        "conversation": [
            {"sender": "user", "fragments": [_image_fragment(image_name), q]},
            {"sender": "assistant", "fragments": [a]},
        ]
    }


# ---------------------------------------------------------------------------
# scoring-stage kernels (ocr_scoring_qa.py:87-124, 196-270)

_JSON_OBJECT_RE = re.compile(r"\{.*\}", re.DOTALL)


def parse_json_object(text: str):
    """Strip markdown fences, then try each greedy ``{...}`` span as a
    JSON object; first parse wins, None when nothing parses — byte-level
    replica of ``_parse_json_object`` including the greedy-span
    behavior (no backtracking to narrower spans)."""
    cleaned = re.sub(r"```(?:json)?\s*|\s*```", "", text).strip()
    for match in _JSON_OBJECT_RE.finditer(cleaned):
        try:
            obj = json.loads(match.group(0))
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            return obj
    return None


def scoring_prompt(items: list) -> str:
    """The verifier prompt (``build_prompt``, ocr_scoring_qa.py:196-219):
    indexed bbox list with the x/y axes SWAPPED to the verifier's
    y-first convention, malformed bboxes skipped, json with
    ensure_ascii=False."""
    bboxes_for_prompt = []
    for idx, item in enumerate(items):
        bbox = item.get("bbox_2d")
        text = item.get("text_content")
        if bbox is None or len(bbox) != _BBOX_COORD_COUNT:
            continue
        x1, y1, x2, y2 = bbox
        bboxes_for_prompt.append({"idx": idx, "bbox_2d": [y1, x1, y2, x2], "text": str(text or "")})
    return OCR_SCORING_PROMPT_TEMPLATE.format(
        bboxes_json=json.dumps(bboxes_for_prompt, ensure_ascii=False)
    )


def apply_scoring(items: list, result: dict, min_bbox_match: int = 5, max_text_errors: int = 0):
    """Apply one parsed verifier result to the dense items
    (ocr_scoring_qa.py:240-270): per-idx bbox_match/text_errors with the
    valid cut, unknown/malformed entries invalidating their item; returns
    ``(scored_items, ocr_mode, missing_text, is_word_level)`` where
    is_word_level is True/False for word/line and None = leave as-is."""
    ocr_mode = result.get("ocr_mode", "unknown")
    text_results = result.get("text") or []
    missing_text = result.get("missing_text") or []
    is_word_level = True if ocr_mode == "word" else (False if ocr_mode == "line" else None)

    scores_by_idx = {int(e["idx"]): e for e in text_results if "idx" in e}
    scored = []
    for i, word in enumerate(items):
        w = dict(word)
        entry = scores_by_idx.get(i)
        if entry is None:
            w["valid"] = False
            scored.append(w)
            continue
        try:
            w["bbox_match"] = int(entry.get("bbox_match"))
            w["text_errors"] = int(entry.get("text_errors"))
        except (TypeError, ValueError):
            w["valid"] = False
            scored.append(w)
            continue
        w["valid"] = w["bbox_match"] >= min_bbox_match and w["text_errors"] <= max_text_errors
        scored.append(w)
    return scored, ocr_mode, missing_text, is_word_level


# ---------------------------------------------------------------------------
# the degenerate sampler for the SQL value-oracle


class _FirstChoice:
    """A ``random.Random``-shaped sampler whose every draw is the FIRST
    option in original order: choice -> seq[0], random -> 1.0 (so no
    probability gate ever fires), sample -> first k, shuffle -> no-op.
    Injected via ``rng_factory`` it collapses the QA generation to
    template 0 everywhere, which a declarative SQL replay CAN re-derive;
    the reference-exact Mersenne path stays pinned by pytests."""

    def __init__(self, _seed=None):
        pass

    def random(self) -> float:
        return 1.0

    def choice(self, seq):
        return seq[0]

    def sample(self, population, k):
        return list(population)[:k]

    def shuffle(self, seq) -> None:
        return None


def first_choice_rng(seed=None) -> _FirstChoice:
    """rng_factory for oracle queries — see ``_FirstChoice``."""
    return _FirstChoice(seed)
