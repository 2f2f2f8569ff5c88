"""Pure-python image header inspection (no PIL/DALI in this container).

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

__all__ = ["image_dimensions", "image_aspect_ratio"]

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
