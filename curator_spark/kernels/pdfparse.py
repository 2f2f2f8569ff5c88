"""Pure-python kernels for the Nemotron-Parse PDF pipeline.

Reference: ``stages/interleaved/pdf/nemotron_parse/utils.py`` — the
model-free structure around the Nemotron-Parse OCR model:

- ``parse_nemotron_output`` (utils.py:128-169) — the
  ``<x_><y_>…<x_><y_><class_>`` markup regex, inner-tag strip, the
  Picture-keeps-empty-text rule, and the untagged-output fallback;
- floater reordering (utils.py:223-314) — Caption→nearest-Picture
  pairing by bbox center-y, group ordering, insertion after the closest
  anchored element (needed for Nemotron-Parse v1.1, whose output emits
  Pictures/Captions at the end of the page instead of reading order);
- canvas / crop arithmetic (utils.py:158-221) — the processor's
  resize-then-center-pad geometry and the normalized-bbox → pixel-box
  clamp with the degenerate-crop (< min_crop_px) filter;
- ``build_interleaved_rows`` (utils.py:315-405) — one metadata row per
  PDF plus one row per parsed element in the interleaved schema.

PIL / cv2 / pypdfium2 are absent in this sandbox: page images ride as
numpy RGB arrays, the resize defaults to a pure-numpy bilinear (inject
``cv2.resize`` through the ``resizer`` seam for bit-parity with the
reference), and PNG encoding of Picture crops is the injectable
``encoder(arr) -> bytes`` seam (raising an honest NotImplementedError
when a Picture crop is produced without one).
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable

import numpy as np

__all__ = [
    "DEFAULT_MIN_CROP_PX",
    "bbox_center_y",
    "bbox_to_pixels",
    "build_canvas",
    "build_interleaved_rows",
    "interleave_floaters",
    "pair_pictures_and_captions",
    "parse_nemotron_output",
]

DEFAULT_MIN_CROP_PX = 28

_ELEMENT_RE = re.compile(
    r"<x_([\d.]+)><y_([\d.]+)>"
    r"(.*?)"
    r"<x_([\d.]+)><y_([\d.]+)>"
    r"<class_([^>]+)>",
    re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")


def parse_nemotron_output(raw_text: str) -> list:
    """utils.py:128-169 — markup → [{class, text, bbox}] elements; an
    element survives when it has text OR is a Picture; fully untagged
    non-blank output degrades to one bbox-less Text element."""
    elements: list = []
    raw_text = "" if raw_text is None else str(raw_text)
    for m in _ELEMENT_RE.finditer(raw_text):
        x1, y1 = float(m.group(1)), float(m.group(2))
        x2, y2 = float(m.group(4)), float(m.group(5))
        cls = m.group(6)
        text = _TAG_RE.sub("", m.group(3)).strip()
        if text or cls == "Picture":
            elements.append({"class": cls, "text": text, "bbox": [x1, y1, x2, y2]})
    if not elements and raw_text.strip():
        cleaned = _TAG_RE.sub("", raw_text).strip()
        if cleaned:
            elements.append({"class": "Text", "text": cleaned, "bbox": None})
    return elements


def bbox_center_y(bbox) -> float:
    """utils.py:223-226."""
    if bbox is None:
        return 0.0
    return (bbox[1] + bbox[3]) / 2.0


def pair_pictures_and_captions(floaters: list) -> list:
    """utils.py:229-269 — greedy Caption→nearest-unclaimed-Picture
    pairing by bbox center-y; unmatched Captions become singleton
    groups; groups ordered by their lead element's center-y."""
    pictures = [(i, f) for i, f in enumerate(floaters) if f["class"] == "Picture"]
    captions = [(i, f) for i, f in enumerate(floaters) if f["class"] == "Caption"]
    pic_taken: set = set()
    cap_to_pic: dict = {}
    for ci, cap in captions:
        cap_y = bbox_center_y(cap.get("bbox"))
        best_pi, best_dist = None, float("inf")
        for pi, pic in pictures:
            if pi in pic_taken:
                continue
            dist = abs(bbox_center_y(pic.get("bbox")) - cap_y)
            if dist < best_dist:
                best_dist, best_pi = dist, pi
        if best_pi is not None:
            cap_to_pic[ci] = best_pi
            pic_taken.add(best_pi)
    groups: list = []
    for pi, pic in pictures:
        group = [pic]
        group.extend(cap for ci, cap in captions if cap_to_pic.get(ci) == pi)
        groups.append(group)
    groups.extend([cap] for ci, cap in captions if ci not in cap_to_pic)
    groups.sort(key=lambda g: bbox_center_y(g[0].get("bbox")))
    return groups


def interleave_floaters(anchored: list, floaters: list) -> list:
    """utils.py:272-314 — insert each Picture/Caption group after the
    anchored element whose bbox center-y is closest; anchored order is
    preserved; with no anchors the paired groups stand alone."""
    if not floaters:
        return list(anchored)
    groups = pair_pictures_and_captions(floaters)
    if not anchored:
        return [e for g in groups for e in g]
    anchor_ys = [bbox_center_y(e.get("bbox")) for e in anchored]
    insert_map: dict = {}
    for group in groups:
        gy = bbox_center_y(group[0].get("bbox"))
        best_idx = min(range(len(anchor_ys)), key=lambda i: abs(anchor_ys[i] - gy))
        insert_map.setdefault(best_idx, []).append(group)
    for groups_at in insert_map.values():
        groups_at.sort(key=lambda g: bbox_center_y(g[0].get("bbox")))
    result: list = []
    for i, elem in enumerate(anchored):
        result.append(elem)
        for group in insert_map.get(i, ()):
            result.extend(group)
    return result


def _bilinear_resize(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Pure-numpy bilinear resize (half-pixel-center sampling, the
    convention cv2.INTER_LINEAR uses). Deterministic default for the
    ``resizer`` seam; inject cv2.resize for bit parity."""
    h, w = arr.shape[:2]
    if (w, h) == (new_w, new_h):
        return arr
    ys = np.clip((np.arange(new_h) + 0.5) * h / new_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(new_w) + 0.5) * w / new_w - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = arr[np.ix_(y0, x0)].astype(np.float64)
    b = arr[np.ix_(y0, x1)].astype(np.float64)
    c = arr[np.ix_(y1, x0)].astype(np.float64)
    d = arr[np.ix_(y1, x1)].astype(np.float64)
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    return np.rint(out).astype(arr.dtype)


def build_canvas(
    page: np.ndarray,
    proc_size: tuple,
    resizer: Callable | None = None,
) -> np.ndarray:
    """utils.py:171-210 — shrink-to-fit (aspect preserved, never
    upscaled) then center-pad with white to exactly ``proc_size``
    (height, width), replicating the model processor's geometry so
    normalized bboxes crop directly in canvas space."""
    proc_h, proc_w = proc_size
    orig_h, orig_w = page.shape[:2]
    ar = orig_w / orig_h
    new_h, new_w = orig_h, orig_w
    if new_h > proc_h:
        new_h = proc_h
        new_w = int(new_h * ar)
    if new_w > proc_w:
        new_w = proc_w
        new_h = int(new_w / ar)
    arr = page
    if (new_w, new_h) != (orig_w, orig_h):
        arr = (resizer or _bilinear_resize)(arr, new_w, new_h)
    pad_h = max(0, proc_h - arr.shape[0])
    pad_w = max(0, proc_w - arr.shape[1])
    if pad_h or pad_w:
        top, left = pad_h // 2, pad_w // 2
        pad = ((top, pad_h - top), (left, pad_w - left)) + ((0, 0),) * (arr.ndim - 2)
        arr = np.pad(arr, pad, mode="constant", constant_values=255)
    return arr


def bbox_to_pixels(bbox, proc_size: tuple, min_crop_px: int = DEFAULT_MIN_CROP_PX):
    """utils.py:199-221 — normalized bbox → clamped pixel box on the
    canvas; None for a missing bbox or a degenerate (< min_crop_px)
    crop."""
    if bbox is None:
        return None
    proc_h, proc_w = proc_size
    x0 = int(bbox[0] * proc_w)
    y0 = int(bbox[1] * proc_h)
    x1 = int(bbox[2] * proc_w)
    y1 = int(bbox[3] * proc_h)
    x0, x1 = max(0, min(x0, x1)), min(proc_w, max(x0, x1))
    y0, y1 = max(0, min(y0, y1)), min(proc_h, max(y0, y1))
    if x1 - x0 < min_crop_px or y1 - y0 < min_crop_px:
        return None
    return (x0, y0, x1, y1)


def build_interleaved_rows(
    sample_id: str,
    url: str,
    pdf_name: str,
    page_arrays: list,
    page_outputs: list,
    proc_size: tuple = (2048, 1664),
    reorder_floaters: bool = True,
    min_crop_px: int = DEFAULT_MIN_CROP_PX,
    encoder: Callable | None = None,
    resizer: Callable | None = None,
) -> list:
    """utils.py:315-405 — one metadata row + one row per parsed element
    (Picture → cropped-canvas PNG via the ``encoder(arr) -> bytes``
    seam; Table → text/markdown table row; anything else → markdown
    text row). ``page_arrays`` entries may be None when page pixels are
    unavailable — Picture crops on such pages are skipped exactly like
    degenerate bboxes, so text extraction works without any image
    stack."""
    rows: list = [
        {
            "sample_id": sample_id,
            "position": -1,
            "modality": "metadata",
            "content_type": "application/json",
            "text_content": json.dumps(
                {"url": url, "pdf_name": pdf_name, "num_pages": len(page_arrays)}
            ),
            "binary_content": None,
            "source_ref": None,
            "url": url,
            "page_number": None,
            "pdf_name": pdf_name,
            "element_class": None,
        }
    ]
    position = 0
    for page_num, (page, raw_output) in enumerate(
        zip(page_arrays, page_outputs)
    ):
        elements = parse_nemotron_output(raw_output)
        if reorder_floaters:
            anchored = [e for e in elements if e["class"] not in ("Picture", "Caption")]
            floaters = [e for e in elements if e["class"] in ("Picture", "Caption")]
            ordered = interleave_floaters(anchored, floaters)
        else:
            ordered = elements
        canvas = None
        for elem in ordered:
            cls = elem["class"]
            bbox = elem.get("bbox")
            source_ref = json.dumps({"page": page_num, "bbox": bbox})
            if cls == "Picture":
                box = bbox_to_pixels(bbox, proc_size, min_crop_px)
                if box is None or page is None:
                    continue
                if encoder is None:
                    raise NotImplementedError(
                        "STUB PNG encoder not available here: building a "
                        "Picture crop needs an encoder(arr) -> bytes seam "
                        "(the reference uses PIL, utils.py:121-126)"
                    )
                if canvas is None:
                    canvas = build_canvas(np.asarray(page), proc_size, resizer)
                x0, y0, x1, y1 = box
                modality, content_type = "image", "image/png"
                binary, text = encoder(canvas[y0:y1, x0:x1]), elem.get("text")
            elif cls == "Table":
                modality, content_type = "table", "text/markdown"
                binary, text = None, elem["text"]
            else:
                modality, content_type = "text", "text/markdown"
                binary, text = None, elem["text"]
            rows.append(
                {
                    "sample_id": sample_id,
                    "position": position,
                    "modality": modality,
                    "content_type": content_type,
                    "text_content": text,
                    "binary_content": binary,
                    "source_ref": source_ref,
                    "url": url,
                    "page_number": page_num,
                    "pdf_name": pdf_name,
                    "element_class": cls,
                }
            )
            position += 1
    return rows
