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


# ---------------------------------------------------------------------------
# pixel kernels: PNG decode, Laplacian variance, quad area
# ---------------------------------------------------------------------------

import zlib

import numpy as np


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import binascii

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_ga(arr: np.ndarray) -> bytes:
    """Gray+alpha (color type 4) PNG for the alpha-drop tests."""
    h, w, _ = arr.shape
    lines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )


def encode_png(arr: np.ndarray, filter_types=None) -> bytes:
    """Minimal valid PNG encoder for tests: 8-bit gray/RGB/RGBA,
    per-row filter types (default all 0/None) applied per ISO 15948 §9."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[nch]
    raw = arr.reshape(h, w * nch).astype(np.int32)
    if filter_types is None:
        filter_types = [0] * h
    lines = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        ft = filter_types[y]
        cur = raw[y]
        left = np.concatenate([np.zeros(nch, dtype=np.int32), cur[:-nch]])
        upleft = np.concatenate([np.zeros(nch, dtype=np.int32), prev[:-nch]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif ft == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(ft)
        lines.append(ft)
        lines += enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


class TestDecodePng:
    def test_roundtrip_rgb_all_filter_types(self):
        from curator_spark.kernels.image import decode_png

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(9, 5, 3), dtype=np.uint8)
        for fts in ([0] * 9, [1] * 9, [2] * 9, [3] * 9, [4] * 9,
                    [0, 1, 2, 3, 4, 4, 3, 2, 1]):
            got = decode_png(encode_png(img, fts))
            assert got is not None and np.array_equal(got, img), fts

    def test_roundtrip_gray_and_rgba_drops_alpha(self):
        from curator_spark.kernels.image import decode_png

        rng = np.random.RandomState(11)
        gray = rng.randint(0, 256, size=(6, 7), dtype=np.uint8)
        got = decode_png(encode_png(gray, [4] * 6))
        assert got.shape == (6, 7, 1) and np.array_equal(got[:, :, 0], gray)
        # alpha plane dropped (cv2.IMREAD_COLOR semantics): color
        # channels round-trip, shape is HxWx3
        rgba = rng.randint(0, 256, size=(4, 4, 4), dtype=np.uint8)
        got = decode_png(encode_png(rgba, [3] * 4))
        assert got.shape == (4, 4, 3) and np.array_equal(got, rgba[:, :, :3])

    def test_alpha_does_not_dilute_blur_score(self):
        from curator_spark.kernels.image import decode_png, laplacian_variance

        yy, xx = np.mgrid[0:12, 0:12]
        checker = ((yy + xx) % 2 * 255).astype(np.uint8)
        opaque = np.full_like(checker, 255)
        ga = np.stack([checker, opaque], axis=2)       # gray + alpha
        score_gray = laplacian_variance(decode_png(encode_png(checker)))
        score_ga = laplacian_variance(decode_png(encode_png_ga(ga)))
        assert score_ga == score_gray

    def test_rejects_truncated_and_nonpng(self):
        from curator_spark.kernels.image import decode_png

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        full = encode_png(img)
        assert decode_png(full[: len(full) // 2]) is None
        assert decode_png(b"not a png at all") is None
        assert decode_png(png_bytes(4, 4)) is None  # header-only, no IDAT


class TestLaplacianVariance:
    def _replica(self, img):
        """Direct per-pixel loop replica of cv2.Laplacian(CV_64F, ksize=1)
        + .var() with reflect-101 borders."""
        img = np.asarray(img, dtype=np.float64)
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        out = np.empty_like(img)
        def px(y, x, ch):
            if y < 0:
                y = -y
            if y >= h:
                y = 2 * h - 2 - y
            if x < 0:
                x = -x
            if x >= w:
                x = 2 * w - 2 - x
            return img[y, x, ch]
        for y in range(h):
            for x in range(w):
                for ch in range(c):
                    out[y, x, ch] = (
                        px(y - 1, x, ch) + px(y + 1, x, ch)
                        + px(y, x - 1, ch) + px(y, x + 1, ch)
                        - 4 * img[y, x, ch]
                    )
        return float(out.var())

    def test_matches_loop_replica(self):
        from curator_spark.kernels.image import laplacian_variance

        rng = np.random.RandomState(3)
        for shape in [(5, 4), (6, 6, 3), (2, 2), (8, 3, 4)]:
            img = rng.randint(0, 256, size=shape).astype(np.uint8)
            assert laplacian_variance(img) == pytest.approx(self._replica(img))

    def test_constant_image_scores_zero(self):
        from curator_spark.kernels.image import laplacian_variance

        assert laplacian_variance(np.full((10, 10, 3), 77, np.uint8)) == 0.0

    def test_degenerate_dims_score_zero(self):
        from curator_spark.kernels.image import laplacian_variance

        assert laplacian_variance(np.zeros((1, 5, 3), np.uint8)) == 0.0
        assert laplacian_variance(np.zeros((5, 1), np.uint8)) == 0.0

    def test_checkerboard_sharper_than_smooth(self):
        from curator_spark.kernels.image import laplacian_variance

        yy, xx = np.mgrid[0:16, 0:16]
        checker = ((yy + xx) % 2 * 255).astype(np.uint8)
        smooth = (xx * 2).astype(np.uint8)
        assert laplacian_variance(checker) > 100.0 > laplacian_variance(smooth)


class TestQuadArea:
    def test_square_and_rotated(self):
        from curator_spark.kernels.image import quad_area

        assert quad_area([(0, 0), (10, 0), (10, 10), (0, 10)]) == 100.0
        assert quad_area([(5, 0), (10, 5), (5, 10), (0, 5)]) == 50.0


# ---------------------------------------------------------------------------
# content filters: blur / qrcode / clip-score
# ---------------------------------------------------------------------------


def _checker_png(n=16):
    yy, xx = np.mgrid[0:n, 0:n]
    return encode_png(((yy + xx) % 2 * 255).astype(np.uint8))


def _flat_png(n=16, v=128):
    return encode_png(np.full((n, n), v, np.uint8))


class TestBlurFilter:
    def test_blurry_and_undecodable_drop(self, spark):
        from curator_spark.operators import blur_filter

        rows = [
            ("s1", 0, "image", None, _checker_png()),  # sharp: keep
            ("s1", 1, "image", None, _flat_png()),     # flat: var 0, drop
            ("s1", 2, "image", None, b"corrupt"),      # drop
            ("s1", 3, "image", None, None),            # drop
            ("s1", 4, "text", "caption", None),        # non-image keeps
            ("s1", -1, "metadata", None, None),
        ]
        out = blur_filter(_df(spark, rows), score_threshold=100.0).collect()
        got = {(r.position, r.modality) for r in out}
        assert got == {(0, "image"), (1, "text"), (-1, "metadata")}

    def test_threshold_boundary_is_geq(self, spark):
        from curator_spark.kernels.image import decode_png, laplacian_variance
        from curator_spark.operators import blur_filter

        png = _checker_png()
        score = laplacian_variance(decode_png(png))
        rows = [("s1", 0, "image", None, png)]
        kept = blur_filter(_df(spark, rows), score_threshold=score).collect()
        assert len(kept) == 1  # >= keeps at exact threshold (ref :74)
        dropped = blur_filter(
            _df(spark, rows), score_threshold=score + 1e-9
        ).collect()
        assert len(dropped) == 0


class TestQRCodeFilter:
    def test_detector_seam_ratio_cut(self, spark):
        from curator_spark.operators import qrcode_filter

        # 16x16 image, area 256; one 4x4 quad = 16 -> ratio 0.0625
        detector = lambda img: [[(0, 0), (4, 0), (4, 4), (0, 4)]]  # noqa: E731
        rows = [
            ("s1", 0, "image", None, _checker_png(16)),
            ("s1", 1, "text", "t", None),
        ]
        drop = qrcode_filter(
            _df(spark, rows), score_threshold=0.05, qr_detector=detector
        ).collect()
        assert {(r.modality) for r in drop} == {"text"}
        keep = qrcode_filter(
            _df(spark, rows), score_threshold=0.10, qr_detector=detector
        ).collect()
        assert {(r.modality) for r in keep} == {"image", "text"}

    def test_no_detector_degrades_to_decodability_gate(self, spark):
        from curator_spark.operators import qrcode_filter

        rows = [
            ("s1", 0, "image", None, _checker_png()),
            ("s1", 1, "image", None, b"corrupt"),
        ]
        out = qrcode_filter(_df(spark, rows)).collect()
        assert {r.position for r in out} == {0}


class TestClipScoreFilter:
    @staticmethod
    def _embedders():
        # fake CLIP: images embed by mean intensity bucket; texts by name
        def image_embedder(images):
            return np.array(
                [[1.0, 0.0] if im.mean() > 100 else [0.0, 1.0] for im in images]
            )

        def text_embedder(texts):
            return np.array(
                [[1.0, 0.0] if "bright" in t else [0.0, 1.0] for t in texts]
            )

        return image_embedder, text_embedder

    def test_match_keeps_mismatch_drops(self, spark):
        from curator_spark.operators import clip_score_filter

        img_e, txt_e = self._embedders()
        bright = encode_png(np.full((8, 8), 200, np.uint8))
        dark = encode_png(np.full((8, 8), 10, np.uint8))
        rows = [
            ("s1", 0, "image", None, bright),
            ("s1", 1, "text", "a bright photo", None),
            ("s2", 0, "image", None, dark),
            ("s2", 1, "text", "a bright photo", None),  # mismatch -> drop img
            ("s3", 0, "image", None, bright),            # no text -> drop img
            ("s3", 1, "text", "   ", None),              # blank text ignored
        ]
        out = clip_score_filter(
            _df(spark, rows), min_score=0.5,
            image_embedder=img_e, text_embedder=txt_e,
        ).collect()
        got = {(r.sample_id, r.modality) for r in out}
        assert got == {
            ("s1", "image"), ("s1", "text"), ("s2", "text"), ("s3", "text"),
        }

    def test_requires_seams(self, spark):
        from curator_spark.operators import clip_score_filter

        with pytest.raises(ValueError, match="requires image_embedder"):
            clip_score_filter(_df(spark, []), image_embedder=None, text_embedder=None)
