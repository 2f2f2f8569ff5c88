"""Math-pipeline content extraction: decode contract, notebook walk,
type routing, and the Spark operator (reference
stages/math/download/extract.py + mime_types.py)."""

from __future__ import annotations

import json

import pytest

from curator_spark.kernels.mathdoc import (
    decode_content,
    determine_doc_type,
    is_html_document,
    is_notebook,
    notebook_to_text,
)


def nb_json(cells) -> str:
    return json.dumps({"nbformat": 4, "nbformat_minor": 2, "cells": cells})


class TestDecode:
    def test_utf8_and_xml_decl(self):
        assert decode_content("héllo".encode()) == "héllo"
        assert decode_content(b'  <?xml version="1.0" encoding="utf-8"?><a>x</a>') == "<a>x</a>"

    def test_undecodable_without_detector(self):
        assert decode_content(b"\xff\xfe\x00bad") is None
        assert decode_content(None) is None

    def test_injected_detector(self):
        raw = "caf\xe9".encode("latin-1")
        assert decode_content(raw, encoding_detector=lambda b: "latin-1") == "caf\xe9"
        # detector says utf-8 again, or nothing, or lies -> None
        assert decode_content(raw, encoding_detector=lambda b: "utf-8") is None
        assert decode_content(raw, encoding_detector=lambda b: None) is None
        assert decode_content(raw, encoding_detector=lambda b: "no-such-codec") is None


class TestNotebook:
    def test_shape_check(self):
        assert is_notebook(nb_json([]))
        assert not is_notebook(json.dumps({"cells": []}))  # missing nbformat
        assert not is_notebook(json.dumps([1, 2]))
        assert not is_notebook("not json")
        assert not is_notebook(json.dumps({"nbformat": 4, "nbformat_minor": 2, "cells": 3}))

    def test_cell_walk_all_output_types(self):
        cells = [
            {"cell_type": "markdown", "source": ["# title\n", "para"]},
            {"cell_type": "raw", "source": ["raw "]},
            {
                "cell_type": "code",
                "source": ["print(1)\n"],
                "outputs": [
                    {"output_type": "stream", "text": ["out1\n"]},
                    {"output_type": "execute_result", "data": {"text/plain": ["42"]}},
                    {"output_type": "display_data", "data": {"image/png": "zzz"}},
                    {"output_type": "display_data", "data": {"text/plain": ["<fig>"]}},
                    {"output_type": "text", "text": ["legacy"]},
                ],
            },
            {"cell_type": "mystery", "source": ["ignored"]},
        ]
        assert notebook_to_text(nb_json(cells)) == "# title\npararaw print(1)\nout1\n42<fig>legacy"


class TestRouting:
    def test_html_document_probe_needs_all_six_tags(self):
        full = "<html a=1><head></head><body class=x>t</body></html>"
        assert is_html_document(full)
        assert not is_html_document(full.replace("</head>", ""))
        assert not is_html_document("<p>just a fragment</p>")

    @pytest.mark.parametrize(
        ("content", "magic", "mime", "url", "expected"),
        [
            ("", None, None, None, "text"),  # empty content
            (nb_json([]), "application/json", None, "x", "notebook"),
            (nb_json([]), None, None, "http://a/b.ipynb", "notebook"),
            (nb_json([]), None, None, "http://a/b.txt", "html"),  # no magic/mime -> fallback
            ("{}", "application/json", None, "x.ipynb", "html"),  # JSON but not a notebook
            ("x", None, "text/plain", None, "text"),
            ("x", None, "text/html", None, "html"),
            ("x", None, "application/unknown", None, "html"),  # fallback
            ("x", "text/html", "text/plain", None, "html"),  # magic html wins
            ("x", "application/pdf", "text/html", None, "html"),  # header html
            ("x", "text/plain", None, None, "text"),  # magic text
            ("x", "text/plain", "text/x-php", None, "html"),  # header html beats magic text
            ("x", "application/pdf", "application/unknown", None, "html"),
        ],
    )
    def test_determine_type(self, content, magic, mime, url, expected):
        assert determine_doc_type(content, magic, mime, url) == expected


class TestSparkOperator:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, schema="binary_content binary, url string, mime_type string"
        )

    def test_routing_and_extraction(self, spark):
        from curator_spark.operators import math_extract

        nb = nb_json([{"cell_type": "markdown", "source": ["solve x^2"]}])
        html = "<html><head><t></head><body><p>a &amp; b</p></body></html>"
        rows = [
            (nb.encode(), "http://m/1.ipynb", None),
            (html.encode(), "http://m/2.html", None),
            (b"plain math text", "http://m/3.txt", "text/plain"),
            (b"\xff\xfe broken", "http://m/4.bin", None),  # dropped
        ]
        out = {r.url: r for r in math_extract(self._df(spark, rows)).collect()}
        assert set(out) == {"http://m/1.ipynb", "http://m/2.html", "http://m/3.txt"}
        assert out["http://m/1.ipynb"].type == "notebook"
        assert out["http://m/1.ipynb"].text == "solve x^2"
        assert out["http://m/2.html"].type == "html"
        assert out["http://m/2.html"].text == "a & b"
        assert out["http://m/3.txt"].type == "text"
        assert out["http://m/3.txt"].text == "plain math text"
        assert all(r.magic_mime_type is None for r in out.values())

    def test_injected_magic_and_html_extractor(self, spark):
        from curator_spark.operators import math_extract

        rows = [(b"anything", "http://m/x", None)]
        out = math_extract(
            self._df(spark, rows),
            magic_detector=lambda b: "text/html",
            html_extractor=lambda s: f"LYNX:{s}",
        ).collect()
        assert out[0].type == "html"
        assert out[0].magic_mime_type == "text/html"
        assert out[0].text == "LYNX:anything"

    def test_injected_encoding_detector(self, spark):
        from curator_spark.operators import math_extract

        rows = [("caf\xe9".encode("latin-1"), "http://m/l1", "text/plain")]
        assert math_extract(self._df(spark, rows)).count() == 0
        out = math_extract(
            self._df(spark, rows), encoding_detector=lambda b: "latin-1"
        ).collect()
        assert out[0].text == "caf\xe9"
