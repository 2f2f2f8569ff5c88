"""Interleaved (MINT-1T-style) filter surface: pure-python image header
parsing + the Spark filter/renumber operators, checked against direct
replicas of the reference's pandas keep-mask semantics
(stages/interleaved/stages.py, filter/image_to_text_ratio_filter.py)."""

from __future__ import annotations

import struct

import pytest

from curator_spark.kernels.image import image_aspect_ratio, image_dimensions

# ---------------------------------------------------------------------------
# hand-built container headers (header-only — the parser never reads pixels)
# ---------------------------------------------------------------------------


def png_bytes(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 4
    )


def jpeg_bytes(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def bmp_bytes(w: int, h: int, core: bool = False) -> bytes:
    if core:
        return b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", w, h) + b"\x00" * 8
    return b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", w, -h) + b"\x00" * 8


def webp_vp8x_bytes(w: int, h: int) -> bytes:
    return (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X"
        + struct.pack("<I", 10) + b"\x00" * 4
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    )


def webp_vp8l_bytes(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)
    return (
        b"RIFF" + struct.pack("<I", 17) + b"WEBP" + b"VP8L"
        + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits)
    )


class TestImageDimensions:
    @pytest.mark.parametrize(
        ("maker", "w", "h"),
        [
            (png_bytes, 640, 480),
            (jpeg_bytes, 1920, 1080),
            (gif_bytes, 31, 17),
            (bmp_bytes, 128, 64),
            (lambda w, h: bmp_bytes(w, h, core=True), 12, 8),
            (webp_vp8x_bytes, 300, 200),
            (webp_vp8l_bytes, 5000, 3000),
        ],
    )
    def test_formats(self, maker, w, h):
        assert image_dimensions(maker(w, h)) == (w, h)

    def test_jpeg_skips_leading_segments_and_restart_markers(self):
        # COM segment + fill bytes before the SOF2 (progressive) frame
        com = b"\xff\xfe" + struct.pack(">H", 6) + b"abcd"
        sof2 = b"\xff\xff\xff\xc2" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 7, 9) + b"\x01\x11\x00"
        assert image_dimensions(b"\xff\xd8" + com + sof2) == (9, 7)

    def test_garbage_and_truncation(self):
        assert image_dimensions(b"") is None
        assert image_dimensions(None) is None
        assert image_dimensions(b"not an image at all") is None
        assert image_dimensions(png_bytes(10, 10)[:20]) is None
        assert image_dimensions(b"\xff\xd8\xff\xd9") is None  # EOI before SOF
        assert image_dimensions(b"BM" + b"\x00" * 10) is None
        # zero dims are invalid
        assert image_dimensions(png_bytes(0, 5)) is None

    def test_aspect_ratio(self):
        assert image_aspect_ratio(png_bytes(200, 100)) == 2.0
        assert image_aspect_ratio(b"junk") is None


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

COLS = ["sample_id", "position", "modality", "text_content", "binary_content"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, schema="sample_id string, position int, modality string, "
        "text_content string, binary_content binary"
    )


class TestRenumberAndValidity:
    def test_validity_and_renumber(self, spark):
        from curator_spark.operators import image_to_text_ratio_filter

        rows = [
            # sample s1: valid, positions gappy after an invalid row drops
            ("s1", 0, "text", "three words here", None),
            ("s1", 3, "image", None, b"x"),
            ("s1", 7, "video", None, None),       # invalid modality
            ("s1", -1, "metadata", None, None),   # valid metadata
            ("s1", 5, "metadata", None, None),    # metadata at bad position
            ("s1", -1, "text", "bad pos", None),  # content at -1
            # sample s2: only invalid content + metadata -> metadata orphaned
            ("s2", -1, "metadata", None, None),
            ("s2", -2, "text", "oops", None),
        ]
        out = image_to_text_ratio_filter(_df(spark, rows), 0.0, None).collect()
        got = {(r.sample_id, r.position, r.modality) for r in out}
        assert got == {
            ("s1", 0, "text"),
            ("s1", 1, "image"),   # renumbered 3 -> 1
            ("s1", -1, "metadata"),
        }

    def test_no_union_in_plan(self, spark):
        from curator_spark.operators import image_to_text_ratio_filter

        out = image_to_text_ratio_filter(
            _df(spark, [("s1", 0, "text", "a b", None)]), 0.0, None
        )
        assert "Union" not in out._jdf.queryExecution().optimizedPlan().toString()


class TestImageToTextRatio:
    def test_ratio_bounds_drop_whole_sample(self, spark):
        from curator_spark.operators import image_to_text_ratio_filter

        rows = [
            # s1: 1 image / 4 words = 0.25
            ("s1", 0, "text", "one two three four", None),
            ("s1", 1, "image", None, b"x"),
            # s2: 3 images / 2 words = 1.5
            ("s2", 0, "image", None, b"x"),
            ("s2", 1, "image", None, b"x"),
            ("s2", 2, "image", None, b"x"),
            ("s2", 3, "text", "two words", None),
            # s3: no text at all -> 2 / max(0, 1) = 2.0
            ("s3", 0, "image", None, b"x"),
            ("s3", 1, "image", None, b"x"),
            # null sample id always survives
            (None, 0, "text", "free floater", None),
        ]
        out = image_to_text_ratio_filter(_df(spark, rows), 0.2, 1.0).collect()
        kept = {r.sample_id for r in out}
        assert kept == {"s1", None}

    def test_matches_reference_replica(self, spark):
        """Set-for-set parity with a direct pandas replica of the
        reference mask chain (content mask -> validity -> renumber ->
        orphan drop) on a randomized fixture."""
        import numpy as np

        from curator_spark.operators import image_to_text_ratio_filter

        rng = np.random.RandomState(7)
        rows = []
        for i in range(400):
            sid = None if i % 37 == 0 else f"s{int(rng.randint(0, 30))}"
            mod = ["text", "image", "metadata", "video"][int(rng.randint(0, 4))]
            pos = -1 if mod == "metadata" and rng.uniform() < 0.9 else int(rng.randint(0, 9))
            text = " ".join(["w"] * int(rng.randint(1, 6))) if mod == "text" else None
            rows.append((sid, pos, mod, text, None))
        lo, hi = 0.3, 1.2
        out = image_to_text_ratio_filter(_df(spark, rows), lo, hi).collect()

        # replica of the reference semantics
        stats: dict = {}
        for sid, pos, mod, text, _ in rows:
            if sid is None:
                continue
            st = stats.setdefault(sid, [0, 0])
            st[0] += 1 if mod == "image" else 0
            st[1] += len(text.split()) if mod == "text" and text else 0
        keep_sample = {
            sid: lo <= (img / max(wc, 1)) <= hi for sid, (img, wc) in stats.items()
        }
        surv = [
            r for r in rows
            if (r[0] is None or keep_sample[r[0]])
            and r[2] in ("text", "image", "metadata")
            and ((r[2] == "metadata") == (r[1] == -1))
        ]
        content_ids = {r[0] for r in surv if r[2] != "metadata"}
        surv = [r for r in surv if r[2] != "metadata" or r[0] in content_ids]
        renum: dict = {}
        expected = set()
        for r in sorted(surv, key=lambda r: (r[0] or "", r[1])):
            if r[2] == "metadata":
                expected.add((r[0], -1, r[2], r[3]))
            else:
                k = renum.get(r[0], 0)
                renum[r[0]] = k + 1
                expected.add((r[0], k, r[2], r[3]))
        got = {(r.sample_id, r.position, r.modality, r.text_content) for r in out}
        assert got == expected


class TestAspectRatioFilter:
    def test_header_probe_and_renumber(self, spark):
        from curator_spark.operators import aspect_ratio_filter

        rows = [
            ("s1", 0, "image", None, png_bytes(200, 100)),   # ar 2.0 keep
            ("s1", 1, "image", None, jpeg_bytes(100, 300)),  # ar .33 drop
            ("s1", 2, "image", None, b"corrupt"),            # drop
            ("s1", 3, "image", None, None),                  # drop
            ("s1", 4, "text", "caption", None),              # non-image keeps
            ("s1", -1, "metadata", None, None),
        ]
        out = aspect_ratio_filter(_df(spark, rows), 1.0, 2.0).collect()
        got = {(r.sample_id, r.position, r.modality) for r in out}
        assert got == {("s1", 0, "image"), ("s1", 1, "text"), ("s1", -1, "metadata")}

    def test_injectable_opener(self, spark):
        from curator_spark.operators import aspect_ratio_filter

        rows = [
            ("s1", 0, "image", None, b"\x05\x04"),  # fake format: (w, h) bytes
            ("s1", 1, "image", None, b"\x09\x01"),
        ]
        out = aspect_ratio_filter(
            _df(spark, rows), 1.0, 2.0, opener=lambda b: (b[0], b[1])
        ).collect()
        assert {(r.position,) for r in out} == {(0,)}
