"""WARC parsing (ISO 28500) + the Spark binaryFile-backed source.

Reference surface: stages/text/download/common_crawl/warc_iterator.py
(response records only, HTTP envelope stripped, urn:uuid unwrapped,
corruption skips records instead of failing the file).
"""

from __future__ import annotations

import pytest

from curator_spark.kernels.warc import (
    build_warc,
    iter_warc_records,
    iter_warc_responses,
    strip_http_envelope,
)


def _http(body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body


def _records():
    return [
        ("warcinfo", {"WARC-Record-ID": "<urn:uuid:aaa>"}, b"software: test\r\n"),
        ("request", {"WARC-Record-ID": "<urn:uuid:bbb>",
                     "WARC-Target-URI": "http://x.test/a"}, b"GET /a HTTP/1.1\r\n"),
        ("response", {"WARC-Record-ID": "<urn:uuid:ccc>",
                      "WARC-Target-URI": "http://x.test/a"}, _http(b"<html>A</html>")),
        ("response", {"WARC-Record-ID": "<urn:uuid:ddd>",
                      "WARC-Target-URI": "http://x.test/b"}, _http(b"<html>B</html>")),
    ]


class TestWarcKernel:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip_plain_and_gzip_members(self, gz):
        raw = build_warc(_records(), gzip_members=gz)
        recs = list(iter_warc_records(raw))
        assert [r["headers"]["warc-type"] for r in recs] == [
            "warcinfo", "request", "response", "response"]
        resp = list(iter_warc_responses(raw, "seg.warc.gz"))
        assert [(r["url"], r["warc_id"], r["content"]) for r in resp] == [
            ("http://x.test/a", "ccc", b"<html>A</html>"),
            ("http://x.test/b", "ddd", b"<html>B</html>"),
        ]
        assert all(r["source_id"] == "seg.warc.gz" for r in resp)

    def test_http_envelope(self):
        assert strip_http_envelope(_http(b"body")) == b"body"
        assert strip_http_envelope(b"no envelope") == b"no envelope"

    def test_corrupt_record_skipped(self):
        good = build_warc(_records()[2:3])
        corrupt = b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\njunk\r\n\r\n"
        resp = list(iter_warc_responses(corrupt + good, "f"))
        assert len(resp) == 1 and resp[0]["warc_id"] == "ccc"

    def test_truncated_tail_stops_cleanly(self):
        raw = build_warc(_records()[2:4])
        resp = list(iter_warc_responses(raw[:-30], "f"))  # cut mid-record
        assert len(resp) == 1

    def test_truncated_gzip_member(self):
        raw = build_warc(_records()[2:4], gzip_members=True)
        resp = list(iter_warc_responses(raw[:-10], "f"))
        assert len(resp) >= 1  # first member intact, broken tail skipped

    def test_corrupt_middle_gzip_member_resumes(self):
        """One corrupt member mid-file must NOT drop the rest of the
        archive: decompression resumes at the next gzip magic."""
        parts = [build_warc(_records()[i : i + 1], gzip_members=True)
                 for i in range(4)]
        # garble the deflate stream of member 1 (keep its gzip header
        # intact so the corruption surfaces as a zlib error mid-member)
        bad = bytearray(parts[1])
        for i in range(12, min(len(bad) - 9, 40)):
            bad[i] ^= 0xFF
        raw = parts[0] + bytes(bad) + parts[2] + parts[3]
        resp = list(iter_warc_responses(raw, "f"))
        assert [r["warc_id"] for r in resp] == ["ccc", "ddd"]
        recs = list(iter_warc_records(raw))
        assert len(recs) >= 3  # warcinfo + the two responses survive

    def test_corrupt_middle_member_no_magic_left(self):
        """Corrupt member with no later gzip magic ends cleanly."""
        parts = [build_warc(_records()[i : i + 1], gzip_members=True)
                 for i in range(3)]
        bad = bytearray(parts[2])
        for i in range(12, min(len(bad) - 9, 40)):
            bad[i] ^= 0xFF
        # strip any accidental magic from the corrupted tail
        raw = parts[0] + parts[1] + bytes(bad).replace(b"\x1f\x8b\x08", b"xxx")
        recs = list(iter_warc_records(raw))
        assert [r["headers"]["warc-type"] for r in recs] == ["warcinfo", "request"]


class TestWarcKernelStream:
    """Streaming twins parse IDENTICALLY to the in-memory parser on
    every contract case, at chunk sizes far below member size (so every
    member spans many read() calls) and far above (whole file in one)."""

    @pytest.mark.parametrize("chunk", [7, 64, 1 << 20])
    @pytest.mark.parametrize("gz", [False, True])
    def test_stream_equals_inmemory_roundtrip(self, gz, chunk):
        import io

        from curator_spark.kernels.warc import iter_warc_responses_stream

        raw = build_warc(_records(), gzip_members=gz)
        want = list(iter_warc_responses(raw, "f"))
        got = list(iter_warc_responses_stream(io.BytesIO(raw), "f", chunk))
        assert got == want

    @pytest.mark.parametrize("chunk", [7, 1 << 20])
    def test_stream_corrupt_middle_member_resumes(self, chunk):
        import io

        from curator_spark.kernels.warc import iter_warc_responses_stream

        parts = [build_warc(_records()[i : i + 1], gzip_members=True)
                 for i in range(4)]
        bad = bytearray(parts[1])
        for i in range(12, min(len(bad) - 9, 40)):
            bad[i] ^= 0xFF
        raw = parts[0] + bytes(bad) + parts[2] + parts[3]
        resp = list(iter_warc_responses_stream(io.BytesIO(raw), "f", chunk))
        assert [r["warc_id"] for r in resp] == ["ccc", "ddd"]

    @pytest.mark.parametrize("chunk", [7, 1 << 20])
    def test_stream_truncated_member_and_no_magic_tail(self, chunk):
        import io

        from curator_spark.kernels.warc import (
            iter_warc_records_stream,
            iter_warc_responses_stream,
        )

        raw = build_warc(_records()[2:4], gzip_members=True)
        resp = list(iter_warc_responses_stream(io.BytesIO(raw[:-10]), "f", chunk))
        assert len(resp) >= 1
        parts = [build_warc(_records()[i : i + 1], gzip_members=True)
                 for i in range(3)]
        bad = bytearray(parts[2])
        for i in range(12, min(len(bad) - 9, 40)):
            bad[i] ^= 0xFF
        raw = parts[0] + parts[1] + bytes(bad).replace(b"\x1f\x8b\x08", b"xxx")
        recs = list(iter_warc_records_stream(io.BytesIO(raw), chunk))
        assert [r["headers"]["warc-type"] for r in recs] == ["warcinfo", "request"]

    @pytest.mark.parametrize("chunk", [37, 1 << 20])
    def test_stream_single_giant_member(self, chunk):
        """A whole-archive-in-ONE-gzip-member layout (plain `gzip
        file.warc`) parses record-by-record: output equals the in-memory
        parser and the incremental parser's retained buffer never exceeds
        one record + one piece."""
        import gzip
        import io

        from curator_spark.kernels.warc import (
            _RecordStreamParser,
            iter_warc_responses,
            iter_warc_responses_stream,
        )

        recs = [
            ("response",
             {"WARC-Record-ID": f"<urn:uuid:g{i}>",
              "WARC-Target-URI": f"http://x.test/{i}"},
             _http(b"y" * 400))
            for i in range(100)
        ]
        raw = gzip.compress(build_warc(recs))  # one member, 100 records
        want = list(iter_warc_responses(raw, "f"))
        got = list(iter_warc_responses_stream(io.BytesIO(raw), "f", chunk))
        assert got == want and len(got) == 100
        # direct bound on parser state: feed the decompressed stream in
        # small pieces, assert the retained tail stays record-sized
        plain = gzip.decompress(raw)
        parser = _RecordStreamParser()
        n_out, max_buf = 0, 0
        for i in range(0, len(plain), 256):
            n_out += sum(1 for _ in parser.feed(plain[i : i + 256]))
            max_buf = max(max_buf, len(parser._buf))
        n_out += sum(1 for _ in parser.finish())
        assert n_out == 100
        assert max_buf < 1200  # ~one 400-byte-body record + headers + piece

    def test_negative_and_oversized_content_length_resync(self):
        """A negative Content-Length must not walk the cursor backward
        (infinite re-yield loop), and a bogus multi-GiB length must not
        grow the buffer — both are malformed records that resync at the
        next marker, in BOTH the incremental and in-memory parsers."""
        from curator_spark.kernels.warc import (
            _RecordStreamParser,
            iter_warc_records,
        )

        good = build_warc(_records()[2:3])
        neg = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -1000000000\r\n\r\n"
        big = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999999999\r\n\r\n"
        for evil in (neg, big):
            parser = _RecordStreamParser()
            out = list(parser.feed(evil + good))
            out.extend(parser.finish())
            assert [r["headers"]["warc-record-id"] for r in out] == ["<urn:uuid:ccc>"]
            assert len(parser._buf) == 0
        recs = list(iter_warc_records(neg + good))
        assert [r["headers"].get("warc-record-id") for r in recs] == ["<urn:uuid:ccc>"]

    def test_record_stream_parser_header_cap(self):
        """An unterminated oversized header cannot grow the buffer: it is
        treated as malformed and the parser resyncs at the next record."""
        from curator_spark.kernels.warc import _RecordStreamParser

        good = build_warc(_records()[2:3])
        evil = b"WARC/1.0\r\nno-terminator " + b"x" * 200_000
        parser = _RecordStreamParser(max_header=1 << 16)
        out = []
        for blob in (evil, good):
            for i in range(0, len(blob), 1024):
                out.extend(parser.feed(blob[i : i + 1024]))
        out.extend(parser.finish())
        assert [r["headers"]["warc-record-id"] for r in out] == ["<urn:uuid:ccc>"]
        assert len(parser._buf) == 0

    def test_stream_bounded_reads(self):
        """The file object is read in chunk_size pieces — never one
        whole-file read() — proving the no-materialization contract."""
        import io

        from curator_spark.kernels.warc import iter_warc_responses_stream

        raw = build_warc(
            [("response",
              {"WARC-Record-ID": f"<urn:uuid:r{i}>",
               "WARC-Target-URI": f"http://x.test/{i}"},
              _http(b"x" * 5000))
             for i in range(50)],
            gzip_members=True,
        )

        reads = []

        class Spy(io.BytesIO):
            def read(self, n=-1):
                reads.append(n)
                return super().read(n)

        got = list(iter_warc_responses_stream(Spy(raw), "f", chunk_size=1024))
        assert len(got) == 50
        assert max(reads) <= 1024  # no unbounded read anywhere


@pytest.mark.slow
class TestWarcSpark:
    def test_read_warc_source(self, spark, tmp_path):
        from curator_spark.io import read_warc

        (tmp_path / "seg1.warc.gz").write_bytes(build_warc(_records(), gzip_members=True))
        (tmp_path / "seg2.warc").write_bytes(build_warc(_records()[2:3]))
        df = read_warc(spark, str(tmp_path) + "/*")
        rows = df.collect()
        assert len(rows) == 3
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source_id, []).append(r)
        assert len(by_src["seg1.warc.gz"]) == 2
        assert bytes(by_src["seg2.warc"][0].content) == b"<html>A</html>"
        assert all(r.url.startswith("http://x.test/") for r in rows)

    def test_read_warc_chunked_emission(self, spark, tmp_path):
        """Bounded-memory contract: with a 3-record flush threshold a
        200-record archive is parsed in many small frames, and the row
        set is identical to the one-shot read."""
        recs = [
            ("response",
             {"WARC-Record-ID": f"<urn:uuid:r{i}>",
              "WARC-Target-URI": f"http://x.test/{i}"},
             _http(b"<html>%d</html>" % i))
            for i in range(200)
        ]
        (tmp_path / "big.warc.gz").write_bytes(build_warc(recs, gzip_members=True))
        from curator_spark.io import read_warc

        small = read_warc(spark, str(tmp_path) + "/*", max_records_per_batch=3)
        # every record present exactly once despite ~67 flushes
        got = sorted(r.warc_id for r in small.collect())
        assert got == sorted(f"r{i}" for i in range(200))
        full = read_warc(spark, str(tmp_path) + "/*")
        assert sorted(r.warc_id for r in full.collect()) == got

    def test_read_warc_stream_matches_binaryfile_path(self, spark, tmp_path):
        """read_warc_stream (path-open, member-at-a-time) returns the
        exact row set of read_warc (binaryFile materialization), with a
        tiny chunk size so members straddle many reads."""
        from curator_spark.io import read_warc, read_warc_stream

        (tmp_path / "seg1.warc.gz").write_bytes(
            build_warc(_records(), gzip_members=True)
        )
        (tmp_path / "seg2.warc").write_bytes(build_warc(_records()[2:3]))
        want = sorted(
            ((r.source_id, r.warc_id, r.url, bytes(r.content))
             for r in read_warc(spark, str(tmp_path) + "/*").collect()),
        )
        got = sorted(
            ((r.source_id, r.warc_id, r.url, bytes(r.content))
             for r in read_warc_stream(
                 spark, str(tmp_path) + "/*", chunk_size=64
             ).collect()),
        )
        assert got == want


@pytest.mark.slow
class TestHtmlToText:
    def test_extraction_cases(self, spark):
        import pyspark.sql.functions as F

        from curator_spark.functions.html import html_to_text

        cases = [
            (0, "<html><head><style>p{c}</style></head><body>"
                "<script>var x='<p>no</p>';</script><!-- gone -->"
                "<h1>Title</h1><p>Hello &amp; welcome.</p>"
                "<div>Second   block</div><ul><li>one</li><li>two</li></ul>"
                "&amp;lt;kept&amp;gt;</body></html>",
             'Title\nHello & welcome.\nSecond block\none\ntwo\n&lt;kept&gt;'),
            (1, "plain text, no markup", "plain text, no markup"),
            (2, "a<br>b<br/>c<BR />d", "a\nb\nc\nd"),
            (3, "&nbsp;&quot;x&quot;&#39;y&#39;", '"x"\'y\''),
            (4, "", ""),
            # numeric references: generic <=255 (dec + hex, either x case),
            # typographic >255 map, unknown >255 / malformed pass through,
            # &#38; decodes single-pass (last), NBSP ref folds to space
            (5, "caf&#233; &#xe9;&#XE9; q&#x27;t", "café éé q't"),
            (6, "&#8220;curly&#8221; &#x2013; ok&#8230;", "“curly” – ok…"),
            (7, "keep&#9999; bad&#zz; end&#", "keep&#9999; bad&#zz; end&#"),
            (8, "amp&#38;lt; also&#x26;gt;", "amp&lt; also&gt;"),
            (9, "a&#160;b&#xa0;c", "a b c"),
        ]
        df = spark.createDataFrame([(i, h) for i, h, _ in cases], "i long, h string")
        got = {r.i: r.t for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
        for i, _, want in cases:
            assert got[i] == want, (i, got[i])

    def test_warc_to_text_pipeline(self, spark, tmp_path):
        """End-to-end CC ingestion shape: WARC -> html_to_text -> filter."""
        import pyspark.sql.functions as F

        from curator_spark.functions.html import html_to_text
        from curator_spark.io import read_warc

        (tmp_path / "s.warc.gz").write_bytes(build_warc(_records(), gzip_members=True))
        docs = (
            read_warc(spark, str(tmp_path) + "/*")
            .select("url", html_to_text(F.col("content").cast("string")).alias("text"))
        )
        rows = {r.url: r.text for r in docs.collect()}
        assert rows == {"http://x.test/a": "A", "http://x.test/b": "B"}


class TestStreamParserBuffer:
    def test_in_place_accumulation_across_feeds(self):
        """A record spanning many feeds accumulates into ONE bytearray
        (amortized O(piece) per feed) and only compacts after a record
        is emitted — the multi-GiB-member path is linear, not O(R^2)."""
        from curator_spark.kernels.warc import _RecordStreamParser

        body = b"x" * (1 << 16)
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        parser = _RecordStreamParser()
        buf_id = None
        out = []
        for i in range(0, len(rec) - 1, 4096):
            out.extend(parser.feed(rec[i : i + 4096]))
            assert isinstance(parser._buf, bytearray)
            if buf_id is None:
                buf_id = id(parser._buf)
            # same object identity: feed() extends in place, and the
            # waiting-for-body drain never reslices the buffer
            assert id(parser._buf) == buf_id
        out.extend(parser.feed(rec[len(rec) - 1 :]))
        out.extend(parser.finish())
        assert len(out) == 1
        assert isinstance(out[0]["payload"], bytes)
        assert out[0]["payload"] == body
