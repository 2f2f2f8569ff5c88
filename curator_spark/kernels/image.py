"""Pure-python image kernels (no PIL/cv2/DALI in this container):
container-header inspection, an 8-bit PNG pixel decoder, and the
pixel-level scores the interleaved content filters need.

``image_dimensions`` reads (width, height) straight from the container
header for the formats interleaved web corpora actually carry —
PNG, JPEG, GIF, BMP, WEBP — without decoding any pixel data, which is
all the reference's InterleavedAspectRatioFilterStage needs from
``PIL.Image.open(...).size`` (reference
``stages/interleaved/stages.py:134-176``). Anything unparseable returns
``None`` (the reference maps decode failures to a dropped row, never a
job failure). Formats beyond these five go through the injectable
``opener`` seam on the operator.

Layouts follow the published container specs: PNG (ISO 15948 §5.3/11.2.2
IHDR), JPEG (ITU-T T.81 §B.2.2 frame headers), GIF (GIF87a/89a logical
screen descriptor), BMP (BITMAPINFOHEADER / BITMAPCOREHEADER), WEBP
(RIFF VP8/VP8L/VP8X chunk headers).
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "decode_png",
    "image_dimensions",
    "image_aspect_ratio",
    "laplacian_variance",
    "quad_area",
]

# JPEG start-of-frame markers that carry dimensions: SOF0-SOF15 minus
# DHT (C4), JPG (C8), DAC (CC) per T.81 table B.1
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def _png(raw: bytes):
    if len(raw) < 24 or raw[:8] != b"\x89PNG\r\n\x1a\n" or raw[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", raw[16:24])
    return (w, h) if w > 0 and h > 0 else None


def _jpeg(raw: bytes):
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(raw)
    while i + 3 < n:
        if raw[i] != 0xFF:  # desynchronized — not a marker stream
            return None
        marker = raw[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        if i + 4 > n:
            return None
        seglen = struct.unpack(">H", raw[i + 2 : i + 4])[0]
        if seglen < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", raw[i + 5 : i + 9])
            return (w, h) if w > 0 and h > 0 else None
        i += 2 + seglen
    return None


def _gif(raw: bytes):
    if len(raw) < 10 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", raw[6:10])
    return (w, h) if w > 0 and h > 0 else None


def _bmp(raw: bytes):
    if len(raw) < 26 or raw[:2] != b"BM":
        return None
    hdr_size = struct.unpack("<I", raw[14:18])[0]
    if hdr_size == 12:  # BITMAPCOREHEADER: uint16 dims
        w, h = struct.unpack("<HH", raw[18:22])
    else:  # BITMAPINFOHEADER+: int32 dims, height sign = row order
        w, h = struct.unpack("<ii", raw[18:26])
        h = abs(h)
    return (w, h) if w > 0 and h > 0 else None


def _webp(raw: bytes):
    if len(raw) < 25 or raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        return None
    fourcc = raw[12:16]
    if fourcc == b"VP8X":  # extended: 24-bit LE minus-one canvas dims
        if len(raw) < 30:
            return None
        w = int.from_bytes(raw[24:27], "little") + 1
        h = int.from_bytes(raw[27:30], "little") + 1
        return (w, h)
    if fourcc == b"VP8 ":  # lossy: dims in the frame tag after 3-byte code
        if len(raw) < 30 or raw[23:26] != b"\x9d\x01\x2a":
            return None
        w = struct.unpack("<H", raw[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", raw[28:30])[0] & 0x3FFF
        return (w, h) if w > 0 and h > 0 else None
    if fourcc == b"VP8L":  # lossless: 14-bit minus-one packed dims
        if len(raw) < 25 or raw[20] != 0x2F:
            return None
        bits = int.from_bytes(raw[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return (w, h)
    return None


def image_dimensions(raw: bytes) -> tuple | None:
    """(width, height) from the container header, or None if the bytes
    are not a parseable PNG/JPEG/GIF/BMP/WEBP."""
    if not raw:
        return None
    raw = bytes(raw)
    for probe in (_png, _jpeg, _gif, _bmp, _webp):
        dims = probe(raw)
        if dims is not None:
            return dims
    return None


def image_aspect_ratio(raw: bytes) -> float | None:
    """width/height, or None when undecodable or height <= 0 (the
    reference's keep-mask drops such rows,
    ``stages/interleaved/stages.py:141-152``)."""
    dims = image_dimensions(raw)
    if dims is None or dims[1] <= 0:
        return None
    return float(dims[0]) / float(dims[1])


# ---------------------------------------------------------------------------
# Pixel-level kernels for the interleaved content filters
# (stages/interleaved/filter/{blur,qrcode}_filter.py). The reference
# decodes via cv2.imdecode; here PNG — the one web container whose pixel
# path is pure zlib — decodes natively and everything else goes through
# the operator's injectable ``decoder`` seam.


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def decode_png(raw: bytes):
    """Decode an 8-bit non-interlaced PNG to an HxWxC uint8 ndarray
    (C = 1 gray or 3 RGB; palette expands to RGB and any ALPHA PLANE is
    DROPPED — matching the reference's cv2.IMREAD_COLOR decode, since an
    all-zero-Laplacian alpha plane would dilute the blur score), or None
    when the bytes are not such a PNG. Implements ISO 15948 §9 filter
    reconstruction (None/Sub/Up/Average/Paeth) over the concatenated
    IDAT zlib stream."""
    import numpy as np

    if len(raw) < 33 or bytes(raw[:8]) != b"\x89PNG\r\n\x1a\n":
        return None
    raw = bytes(raw)
    pos, n = 8, len(raw)
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None
        if ctype == b"IHDR":
            width, height = struct.unpack(">II", data[0:8])
            bit_depth, color_type, _, _, interlace = data[8:13]
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if (
        width is None
        or bit_depth != 8
        or interlace != 0
        or color_type not in _PNG_CHANNELS
        or not idat
        or width <= 0
        or height <= 0
    ):
        return None
    nch = _PNG_CHANNELS[color_type]
    stride = width * nch
    try:
        plain = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    if len(plain) < height * (stride + 1):
        return None
    rows = np.frombuffer(plain[: height * (stride + 1)], dtype=np.uint8).reshape(
        height, stride + 1
    )
    filters = rows[:, 0]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(filters[y])
        cur = rows[y, 1:].astype(np.int32)
        if ftype == 0:
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                b = int(prev[x])
                if ftype == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - nch]) if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    img = out.reshape(height, width, nch)
    if color_type == 3:  # palette -> RGB
        if palette is None:
            return None
        img = palette[np.clip(img[:, :, 0], 0, len(palette) - 1)]
    elif color_type == 4:  # gray+alpha: DROP alpha (cv2.IMREAD_COLOR
        img = img[:, :, :1]  # semantics — an all-zero-Laplacian alpha
    elif color_type == 6:  # plane would dilute the blur score)
        img = img[:, :, :3]
    return img


def laplacian_variance(image) -> float:
    """Sharpness score used by InterleavedBlurFilterStage
    (``stages/interleaved/filter/blur_filter.py:37-47``):
    ``cv2.Laplacian(image, cv2.CV_64F).var()`` — the 3x3 kernel
    [[0,1,0],[1,-4,1],[0,1,0]] (cv2 ksize=1) with reflect-101 borders,
    applied per channel, population variance over every element. Higher
    = sharper. A degenerate image (any dim < 2) scores 0.0, matching
    the reference's cv2.error -> 0.0 path."""
    import numpy as np

    img = np.asarray(image)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[0] < 2 or img.shape[1] < 2:
        return 0.0
    f = img.astype(np.float64)
    p = np.pad(f, ((1, 1), (1, 1), (0, 0)), mode="reflect")  # reflect-101
    lap = (
        p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4.0 * f
    )
    return float(lap.var())


def quad_area(points) -> float:
    """Shoelace area of one detected-QR quadrilateral — the
    ``cv2.contourArea`` term in InterleavedQRCodeFilterStage's coverage
    ratio (``qrcode_filter.py:36-61``). ``points`` is (4, 2) corner
    coordinates in order."""
    import numpy as np

    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    x, y = pts[:, 0], pts[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)
