"""Property tests for the Nemotron-Parse kernels (hypothesis)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from curator_spark.kernels import pdfparse as ker


def _elem(cls, y0, y1, text):
    return {"class": cls, "text": text, "bbox": [0.1, y0, 0.9, y1]}


coords = st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=32)
texts = st.text(alphabet=string.ascii_letters + " ", min_size=1, max_size=8).map(str.strip).filter(bool)


@st.composite
def elements(draw, classes):
    y0 = draw(coords)
    y1 = draw(coords)
    return _elem(draw(st.sampled_from(classes)), min(y0, y1), max(y0, y1), draw(texts))


@settings(max_examples=60, deadline=None)
@given(
    anchored=st.lists(elements(classes=["Text", "Title", "Table"]), max_size=8),
    floaters=st.lists(elements(classes=["Picture", "Caption"]), max_size=8),
)
def test_interleave_is_a_permutation_preserving_anchor_order(anchored, floaters):
    """interleave_floaters must emit every input element exactly once
    (multiset preservation) and keep the anchored elements in their
    original relative order (utils.py:272-283's contract)."""
    got = ker.interleave_floaters(list(anchored), list(floaters))
    key = lambda e: (e["class"], e["text"], tuple(e["bbox"]))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, anchored + floaters))
    got_anchor_keys = [key(e) for e in got if e["class"] not in ("Picture", "Caption")]
    assert got_anchor_keys == [key(e) for e in anchored]


@settings(max_examples=60, deadline=None)
@given(floaters=st.lists(elements(classes=["Picture", "Caption"]), max_size=10))
def test_pairing_partitions_floaters(floaters):
    """Every floater lands in exactly one group; each group is one
    Picture plus its claimed Captions, or a lone unmatched Caption;
    groups come out sorted by lead center-y."""
    groups = ker.pair_pictures_and_captions(list(floaters))
    flat = [e for g in groups for e in g]
    key = lambda e: (e["class"], e["text"], tuple(e["bbox"]))  # noqa: E731
    assert sorted(map(key, flat)) == sorted(map(key, floaters))
    for g in groups:
        assert g[0]["class"] in ("Picture", "Caption")
        if g[0]["class"] == "Caption":
            assert len(g) == 1  # unmatched caption stays alone
        else:
            assert all(e["class"] == "Caption" for e in g[1:])
    ys = [ker.bbox_center_y(g[0]["bbox"]) for g in groups]
    assert ys == sorted(ys)


@settings(max_examples=60, deadline=None)
@given(
    pieces=st.lists(
        st.tuples(coords, coords, coords, coords, texts,
                  st.sampled_from(["Text", "Title", "Table", "Picture"])),
        max_size=6,
    )
)
def test_parse_roundtrip_counts(pieces):
    """Markup built from clean pieces parses back to exactly the pieces
    whose class/text combination survives the reference's keep rule."""
    raw = "".join(
        f"<x_{x1:.2f}><y_{y1:.2f}>{t if c != 'Picture' else ''}"
        f"<x_{x2:.2f}><y_{y2:.2f}><class_{c}>"
        for x1, y1, x2, y2, t, c in pieces
    )
    got = ker.parse_nemotron_output(raw)
    want = [(c, t if c != "Picture" else "") for x1, y1, x2, y2, t, c in pieces]
    assert [(e["class"], e["text"]) for e in got] == want


@settings(max_examples=60, deadline=None)
@given(
    bbox=st.tuples(coords, coords, coords, coords),
    proc=st.tuples(st.integers(100, 3000), st.integers(100, 3000)),
)
def test_bbox_pixels_always_inside_canvas(bbox, proc):
    box = ker.bbox_to_pixels(list(bbox), proc)
    if box is not None:
        x0, y0, x1, y1 = box
        ph, pw = proc
        assert 0 <= x0 <= x1 <= pw and 0 <= y0 <= y1 <= ph
        assert x1 - x0 >= ker.DEFAULT_MIN_CROP_PX
        assert y1 - y0 >= ker.DEFAULT_MIN_CROP_PX
