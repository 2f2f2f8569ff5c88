"""Pure-python WARC (ISO 28500) record parser.

The reference's Common Crawl ingestion wraps ``warcio``
(``stages/text/download/common_crawl/warc_iterator.py:41-70``): iterate
records, keep ``response`` types, emit (url, warc_id, source_id,
content) with the HTTP envelope stripped. warcio is not in this
container, and the format is simple enough to not want a dependency at
10^5-file scale: a record is a ``WARC/1.x`` version line, CRLF header
block, ``Content-Length`` octets of payload, and a CRLF CRLF trailer.
Common Crawl archives store ONE GZIP MEMBER PER RECORD (the spec's
recommended layout) so members decompress independently; plain
concatenated-gzip and uncompressed files both parse too.

Corruption contract mirrors the reference: a malformed record logs and
skips, the iterator continues at the next parseable boundary (or next
gzip member), and never raises out of a file.
"""

from __future__ import annotations

import zlib
from typing import Any, Iterator

_CRLF2 = b"\r\n\r\n"
_GZ_MAGIC = b"\x1f\x8b\x08"


def _gzip_members(raw: bytes) -> Iterator[bytes]:
    """Decompress a stream of concatenated gzip members one at a time.

    A corrupt member (bad CRC / garbled deflate stream) is skipped by
    scanning forward to the next gzip magic and resuming there — one
    bad record-member mid-file must not drop the rest of a ~1 GiB
    Common Crawl segment (the documented corruption contract). A
    truncated FINAL member still yields the bytes recovered so far."""
    pos = 0
    n = len(raw)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(raw[pos:])
            chunk += d.flush()
        except zlib.error:
            nxt = raw.find(_GZ_MAGIC, pos + 1)
            if nxt < 0:
                return  # no further member boundary: trailing garbage
            pos = nxt
            continue
        yield chunk
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:  # zero progress: resync at the next magic
            nxt = raw.find(_GZ_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        pos += consumed


def _gzip_member_pieces(fobj, chunk_size: int = 4 << 20) -> Iterator[tuple]:
    """Decompress concatenated gzip members from a FILE OBJECT in bounded
    ``chunk_size`` reads, yielding events: ``("data", bytes)`` pieces,
    ``("end", b"")`` at each member boundary, ``("abort", b"")`` when a
    member turns out corrupt mid-stream (decompression then resumes at
    the next gzip magic — the documented corruption contract; a
    truncated final member flushes its recovered bytes before its
    ``end``). Peak memory is ~one chunk: nothing is accumulated here.

    A corrupt member's magic can only lie at/after the piece that raised
    (earlier pieces were ACCEPTED deflate data of the corrupt member),
    so resync scans just that piece plus a 2-byte overlap forward —
    compressed bytes are never retained per member."""
    pending = fobj.read(chunk_size)
    while pending:
        d = zlib.decompressobj(wbits=31)
        prev_tail = b""
        err = truncated = False
        while True:
            try:
                out = d.decompress(pending)
            except zlib.error:
                err = True
                break
            if out:
                yield ("data", out)
            if d.eof:
                break
            prev_tail = pending[-2:]
            pending = fobj.read(chunk_size)
            if not pending:
                truncated = True
                break
        if err:
            yield ("abort", b"")
            window = prev_tail + pending
            # skip this member's own magic when the error hit its first piece
            start = 0 if prev_tail else 1
            while True:
                nxt = window.find(_GZ_MAGIC, start)
                if nxt >= 0:
                    pending = window[nxt:]
                    break
                more = fobj.read(chunk_size)
                if not more:
                    return
                window = window[-2:] + more
                start = 0
            continue
        if truncated:
            tail = d.flush()
            if tail:
                yield ("data", tail)
            yield ("end", b"")
            return
        yield ("end", b"")
        pending = d.unused_data or fobj.read(chunk_size)


class _RecordStreamParser:
    """Incremental WARC record framing: feed decompressed pieces, get
    complete records out; only the CURRENT incomplete record's bytes are
    retained between feeds — so even a single multi-GiB gzip member
    parses in record-sized memory. Malformed records resync exactly like
    :func:`_parse_records` (skip past the ``WARC/`` marker); a header
    exceeding ``max_header`` with no terminating CRLFCRLF and a
    Content-Length that is negative or above ``max_record`` are treated
    as malformed, so an adversarial stream can grow the buffer to at
    most one ``max_record`` body."""

    def __init__(self, max_header: int = 1 << 16, max_record: int = 1 << 30):
        # bytearray so feed() appends are amortized O(piece): a record
        # spanning K feeds costs O(record), not the O(record*K) memcpy
        # that immutable-bytes `+=` through an attribute would
        self._buf = bytearray()
        self._max_header = max_header
        self._max_record = max_record

    def reset(self) -> None:
        self._buf = bytearray()

    def feed(self, data: bytes) -> Iterator[dict[str, Any]]:
        self._buf += data
        yield from self._drain(final=False)

    def finish(self) -> Iterator[dict[str, Any]]:
        yield from self._drain(final=True)
        self._buf = bytearray()

    def _drain(self, final: bool) -> Iterator[dict[str, Any]]:
        buf = self._buf
        n = len(buf)
        pos = 0
        while pos < n:
            start = buf.find(b"WARC/", pos)
            if start < 0:
                pos = max(n - 4, pos)  # keep a possible marker prefix
                break
            head_end = buf.find(_CRLF2, start)
            if head_end < 0:
                if n - start > self._max_header:
                    pos = start + 5  # unterminated header: resync
                    continue
                pos = start  # wait for the rest of the header
                break
            head = buf[start:head_end].decode("utf-8", errors="replace")
            lines = head.split("\r\n")
            headers: dict[str, str] = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                if _:
                    headers[k.strip().lower()] = v.strip()
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                pos = start + 5  # malformed: resync after this marker
                continue
            if length < 0 or length > self._max_record:
                # negative would walk pos BACKWARD (infinite loop);
                # oversized would buffer without bound — both malformed
                pos = start + 5
                continue
            body_start = head_end + len(_CRLF2)
            body_end = body_start + length
            if body_end > n:
                if final:
                    pos = n  # truncated record: drop (same as _parse_records)
                    break
                pos = start  # wait for the body
                break
            yield {
                "version": lines[0],
                "headers": headers,
                "payload": bytes(buf[body_start:body_end]),
            }
            pos = body_end
        if pos:
            # in-place compaction (memmove); while waiting for more of
            # an incomplete record pos == 0 and nothing is copied
            del buf[:pos]


def _parse_records(buf: bytes) -> Iterator[dict[str, Any]]:
    pos = 0
    n = len(buf)
    while pos < n:
        # seek the next version line (corruption recovery)
        start = buf.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = buf.find(_CRLF2, start)
        if head_end < 0:
            return
        head = buf[start:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + 5  # malformed: resync after this version marker
            continue
        if length < 0:  # would walk pos backward: infinite loop
            pos = start + 5
            continue
        body_start = head_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            return  # truncated record
        yield {
            "version": lines[0],
            "headers": headers,
            "payload": buf[body_start:body_end],
        }
        pos = body_end


def strip_http_envelope(payload: bytes) -> bytes:
    """Drop the HTTP status line + headers from a ``response`` record's
    payload (what warcio's ``content_stream`` returns)."""
    if payload[:5] in (b"HTTP/",):
        cut = payload.find(_CRLF2)
        if cut >= 0:
            return payload[cut + len(_CRLF2) :]
    return payload


def iter_warc_records(raw: bytes) -> Iterator[dict[str, Any]]:
    """Iterate every record of a (possibly gzipped) WARC byte buffer:
    dicts with ``version``, ``headers`` (lower-cased keys), ``payload``."""
    if raw[:2] == b"\x1f\x8b":
        for member in _gzip_members(raw):
            yield from _parse_records(member)
    else:
        yield from _parse_records(raw)


def _responses(
    records: Iterator[dict[str, Any]], source_id: str
) -> Iterator[dict[str, Any]]:
    for rec in records:
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        rid = h.get("warc-record-id", "")
        if rid.startswith("<urn:uuid:") and rid.endswith(">"):
            rid = rid[10:-1]
        yield {
            "url": h.get("warc-target-uri"),
            "warc_id": rid,
            "source_id": source_id,
            "content": strip_http_envelope(rec["payload"]),
        }


def iter_warc_responses(raw: bytes, source_id: str) -> Iterator[dict[str, Any]]:
    """The reference iterator's exact surface (warc_iterator.py:44-64):
    ``response`` records only, HTTP envelope stripped, ``warc_id``
    without the ``<urn:uuid:...>`` wrapper."""
    yield from _responses(iter_warc_records(raw), source_id)


def iter_warc_records_stream(fobj, chunk_size: int = 4 << 20) -> Iterator[dict[str, Any]]:
    """Streaming twin of :func:`iter_warc_records`: parse records from a
    binary file object in record-bounded memory (no whole-archive or
    whole-member buffer, no 2 GiB cap) — decompressed pieces stream
    straight into an incremental record parser, so even a single
    multi-GiB gzip member holds only the in-flight record. Parser state
    resets at member boundaries (records never span members in the
    spec's recommended layout — same contract as the in-memory parser)
    and on a corrupt member (complete records already parsed from its
    early pieces stay emitted — strictly better recovery than the
    in-memory parser, which drops the whole member). An uncompressed
    stream is read fully — plain (non-gzip) archives are test-scale
    only; Common Crawl ships member-gzipped."""
    head = fobj.read(2)
    if head == b"\x1f\x8b":
        fobj.seek(0)
        parser = _RecordStreamParser()
        for ev, data in _gzip_member_pieces(fobj, chunk_size):
            if ev == "data":
                yield from parser.feed(data)
            elif ev == "abort":
                parser.reset()
            else:  # member end
                yield from parser.finish()
        yield from parser.finish()
    else:
        yield from _parse_records(head + fobj.read())


def iter_warc_responses_stream(
    fobj, source_id: str, chunk_size: int = 4 << 20
) -> Iterator[dict[str, Any]]:
    """Streaming twin of :func:`iter_warc_responses` over a file object."""
    yield from _responses(iter_warc_records_stream(fobj, chunk_size), source_id)


def build_warc(records: list[tuple[str, dict, bytes]], gzip_members: bool = False) -> bytes:
    """Serialize (type, extra_headers, payload) records into WARC bytes —
    the test-side generator (one gzip member per record when asked,
    Common Crawl's layout)."""
    import gzip as _gz

    out = []
    for rec_type, extra, payload in records:
        headers = {
            "WARC-Type": rec_type,
            "Content-Length": str(len(payload)),
            **extra,
        }
        head = b"WARC/1.0\r\n" + b"\r\n".join(
            f"{k}: {v}".encode() for k, v in headers.items()
        )
        blob = head + _CRLF2 + payload + _CRLF2
        out.append(_gz.compress(blob) if gzip_members else blob)
    return b"".join(out)
