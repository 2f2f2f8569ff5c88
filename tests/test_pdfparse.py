"""Nemotron-Parse PDF pipeline (reference
stages/interleaved/pdf/nemotron_parse/*)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from curator_spark.kernels import pdfparse as ker
from curator_spark.operators.pdfparse import (
    nemotron_parse_postprocess,
    pdf_manifest_entries,
    pdf_pages,
)


def elem(cls, y, text="t"):
    return {"class": cls, "text": text, "bbox": [0.1, y - 0.05, 0.9, y + 0.05]}


class TestParse:
    def test_markup_elements_and_inner_tag_strip(self):
        raw = (
            "<x_0.1><y_0.2>Hello <b>world</b><x_0.5><y_0.6><class_Text>"
            "<x_0.0><y_0.0><x_0.3><y_0.3><class_Picture>"
            "<x_0.2><y_0.2>   <x_0.4><y_0.4><class_Title>"
        )
        got = ker.parse_nemotron_output(raw)
        # empty-text Title dropped; empty-text Picture kept
        assert got == [
            {"class": "Text", "text": "Hello world", "bbox": [0.1, 0.2, 0.5, 0.6]},
            {"class": "Picture", "text": "", "bbox": [0.0, 0.0, 0.3, 0.3]},
        ]

    def test_untagged_fallback_and_empty(self):
        assert ker.parse_nemotron_output("plain prose") == [
            {"class": "Text", "text": "plain prose", "bbox": None}
        ]
        assert ker.parse_nemotron_output("") == []
        assert ker.parse_nemotron_output("<junk><tags>") == []
        assert ker.parse_nemotron_output(None) == []


class TestFloaters:
    def test_caption_pairs_with_nearest_picture_after_closest_anchor(self):
        anchored = [elem("Text", 0.1), elem("Text", 0.5)]
        floaters = [elem("Picture", 0.45, ""), elem("Caption", 0.5, "cap")]
        got = ker.interleave_floaters(anchored, floaters)
        assert [e["class"] for e in got] == ["Text", "Text", "Picture", "Caption"]

    def test_unmatched_caption_is_singleton(self):
        floaters = [elem("Caption", 0.2, "lone")]
        got = ker.interleave_floaters([elem("Text", 0.9)], floaters)
        assert [e["class"] for e in got] == ["Text", "Caption"]

    def test_two_pictures_one_caption_greedy_nearest(self):
        floaters = [
            elem("Picture", 0.2, ""),
            elem("Picture", 0.8, ""),
            elem("Caption", 0.75, "cap"),
        ]
        groups = ker.pair_pictures_and_captions(floaters)
        # caption claims the 0.8 picture; groups sorted by lead center-y
        assert [[e["class"] for e in g] for g in groups] == [
            ["Picture"], ["Picture", "Caption"]
        ]
        assert groups[1][1]["text"] == "cap"

    def test_no_anchors_yields_paired_order(self):
        floaters = [elem("Picture", 0.9, ""), elem("Picture", 0.1, "")]
        got = ker.interleave_floaters([], floaters)
        assert [ker.bbox_center_y(e["bbox"]) for e in got] == [
            pytest.approx(0.1), pytest.approx(0.9)
        ]

    def test_no_floaters_keeps_anchored(self):
        anchored = [elem("Text", 0.3)]
        assert ker.interleave_floaters(anchored, []) == anchored


class TestCanvasAndBbox:
    def test_small_page_center_padded_white(self):
        page = np.zeros((10, 20, 3), dtype=np.uint8)
        canvas = ker.build_canvas(page, (14, 24))
        assert canvas.shape == (14, 24, 3)
        assert (canvas[0, :, :] == 255).all() and (canvas[-2:, :, :] == 255).all()
        assert (canvas[2:12, 2:22, :] == 0).all()

    def test_oversized_page_shrinks_keeping_aspect(self):
        page = np.full((200, 100, 3), 7, dtype=np.uint8)
        canvas = ker.build_canvas(page, (100, 100))
        assert canvas.shape == (100, 100, 3)
        # 200x100 -> h clamps to 100, w = 50, centered with white pads
        assert (canvas[:, 25:75, :] == 7).all()
        assert (canvas[:, :25, :] == 255).all()

    @pytest.mark.parametrize(
        "bbox,want",
        [
            (None, None),
            ([0.0, 0.0, 0.005, 0.005], None),  # degenerate < min_crop_px
            ([0.5, 0.5, 0.1, 0.1], (160, 100, 800, 500)),  # swapped corners
            ([-0.5, 0.0, 2.0, 1.0], (0, 0, 1600, 1000)),  # clamped
        ],
    )
    def test_bbox_to_pixels(self, bbox, want):
        assert ker.bbox_to_pixels(bbox, (1000, 1600)) == want


class TestBuildRows:
    RAW = (
        "<x_0.1><y_0.1>Title text<x_0.9><y_0.15><class_Title>"
        "<x_0.1><y_0.2>| a | b |<x_0.9><y_0.4><class_Table>"
        "<x_0.1><y_0.8><x_0.6><y_0.95><class_Picture>"
        "<x_0.1><y_0.5>body<x_0.9><y_0.6><class_Text>"
    )

    def test_rows_shape_and_reorder_toggle(self):
        rows = ker.build_interleaved_rows(
            "s1", "http://u", "f.pdf", [None], [self.RAW], reorder_floaters=True
        )
        meta = rows[0]
        assert meta["modality"] == "metadata" and meta["position"] == -1
        assert json.loads(meta["text_content"])["num_pages"] == 1
        # page is None -> Picture skipped; reorder keeps anchored order
        assert [r["element_class"] for r in rows[1:]] == ["Title", "Table", "Text"]
        assert [r["position"] for r in rows[1:]] == [0, 1, 2]
        assert rows[2]["modality"] == "table"
        assert rows[2]["content_type"] == "text/markdown"
        assert json.loads(rows[1]["source_ref"]) == {
            "page": 0, "bbox": [0.1, 0.1, 0.9, 0.15]
        }

    def test_picture_crop_via_seams(self):
        page = np.full((1000, 800, 3), 9, dtype=np.uint8)
        seen = {}

        def encoder(arr):
            seen["shape"] = arr.shape
            return b"PNGBYTES"

        rows = ker.build_interleaved_rows(
            "s1", "u", "f.pdf", [page], [self.RAW],
            proc_size=(1000, 800), reorder_floaters=False, encoder=encoder,
        )
        pics = [r for r in rows if r["element_class"] == "Picture"]
        assert len(pics) == 1 and pics[0]["binary_content"] == b"PNGBYTES"
        assert pics[0]["modality"] == "image"
        # bbox (0.1,0.8)-(0.6,0.95) on 1000x800 canvas -> 400x150 crop
        assert seen["shape"] == (150, 400, 3)

    def test_picture_without_encoder_raises_stub(self):
        page = np.zeros((1000, 800, 3), dtype=np.uint8)
        with pytest.raises(NotImplementedError, match="STUB"):
            ker.build_interleaved_rows(
                "s", "u", "f", [page], [self.RAW], proc_size=(1000, 800)
            )


class TestManifest(object):
    def write_manifest(self, tmp_path):
        lines = [
            json.dumps({"file_name": "a.pdf", "url": "http://a", "byte_offset": 7}),
            "",
            json.dumps({"cc_pdf_file_names": ["b.pdf", "c.pdf", "b.pdf", ""], "url": "http://bc"}),
            json.dumps({"nothing": True}),
            json.dumps({"file_name": "d.pdf"}),
        ]
        p = tmp_path / "manifest.jsonl"
        p.write_text("\n".join(lines))
        return str(p)

    def test_expansion_dedup_skip_and_packing(self, spark, tmp_path):
        path = self.write_manifest(tmp_path)
        got = pdf_manifest_entries(spark, path, pdfs_per_task=2).collect()
        rows = [(r.task_index, r.file_name, r.url, json.loads(r.extra)) for r in got]
        assert rows == [
            (0, "a.pdf", "http://a", {"byte_offset": 7}),
            (0, "b.pdf", "http://bc", {}),
            (1, "c.pdf", "http://bc", {}),
            (1, "d.pdf", "", {}),
        ]

    def test_max_pdfs_cap(self, spark, tmp_path):
        path = self.write_manifest(tmp_path)
        got = pdf_manifest_entries(spark, path, pdfs_per_task=10, max_pdfs=2).collect()
        assert [r.file_name for r in got] == ["a.pdf", "b.pdf"]


class TestPagesAndPostprocess:
    def test_pages_seams_and_audit_rows(self, spark, tmp_path):
        path = TestManifest().write_manifest(tmp_path)
        entries = pdf_manifest_entries(spark, path)

        def source(fname, extra):
            if fname == "d.pdf":
                return None  # missing -> audit row
            return f"PDF::{fname}::{extra}".encode()

        def renderer(raw, max_pages):
            if b"c.pdf" in raw:
                raise RuntimeError("corrupt pdf")
            return [b"PAGE0-" + raw, b"PAGE1-" + raw]

        out = pdf_pages(entries, source, renderer).collect()
        good = sorted((r.pdf_name, r.position) for r in out if r.position >= 0)
        assert good == [("a.pdf", 0), ("a.pdf", 1), ("b.pdf", 0), ("b.pdf", 1)]
        # sample ids are entry-qualified; the clean name rides in pdf_name
        assert sorted(r.sample_id for r in out if r.pdf_name == "a.pdf") == ["0/a.pdf", "0/a.pdf"]
        audit = {r.pdf_name: r.text_content for r in out if r.position == -1}
        assert "corrupt pdf" in audit["c.pdf"]
        assert "FileNotFoundError" in audit["d.pdf"]
        # extra fields reached the source seam
        a0 = [r for r in out if r.pdf_name == "a.pdf"][0]
        assert b"byte_offset" in bytes(a0.binary_content)

    def test_postprocess_end_to_end_with_image_seams(self, spark):
        raw = TestBuildRows.RAW
        rows = [
            ("p1", 0, "http://u1", "p1.pdf", b"IMG", raw),
            ("p1", 1, "http://u1", "p1.pdf", b"IMG", "only prose"),
            ("p2", 0, "http://u2", "p2.pdf", None, raw),
        ]
        df = spark.createDataFrame(
            rows,
            "sample_id string, position int, url string, pdf_name string, "
            "binary_content binary, text_content string",
        )

        def decoder(b):
            return np.full((1000, 800, 3), 5, dtype=np.uint8)

        def encoder(arr):
            return b"CROP:" + str(arr.shape).encode()

        out = nemotron_parse_postprocess(
            df, proc_size=(1000, 800), model_path="nemotron-parse-v1.2",
            decoder=decoder, encoder=encoder,
        ).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.sample_id, []).append(r)
        p1 = sorted(by_id["p1"], key=lambda r: r.position)
        # metadata + page0: Title/Table/Picture/Text + page1: fallback Text
        assert json.loads(p1[0].text_content)["num_pages"] == 2
        assert [r.element_class for r in p1[1:]] == [
            "Title", "Table", "Picture", "Text", "Text",
        ]
        assert p1[1 + 2].binary_content is not None  # Picture crop encoded
        assert p1[-1].text_content == "only prose" and p1[-1].page_number == 1
        # p2 has no decodable page -> Picture skipped, text survives
        p2 = sorted(by_id["p2"], key=lambda r: r.position)
        assert [r.element_class for r in p2[1:]] == ["Title", "Table", "Text"]

    def test_seams_required(self, spark):
        df = spark.createDataFrame([("a", "u", "{}")], "file_name string, url string, extra string")
        with pytest.raises(NotImplementedError):
            pdf_pages(df, None, lambda r, m: [])
        with pytest.raises(NotImplementedError):
            pdf_pages(df, lambda f, e: b"", None)


class TestReviewRegressions:
    def test_audit_rows_never_become_document_text(self, spark):
        rows = [
            ("p1", -1, "u", "p1.pdf", None, "FileNotFoundError: p1.pdf"),
            ("p2", 0, "u", "p2.pdf", None, "real prose"),
        ]
        df = spark.createDataFrame(
            rows,
            "sample_id string, position int, url string, pdf_name string, "
            "binary_content binary, text_content string",
        )
        out = nemotron_parse_postprocess(df).collect()
        # the unrendered PDF contributes NOTHING (no fake metadata row,
        # no error-message Text element); the real one parses normally
        assert {r.sample_id for r in out} == {"p2"}
        texts = [r.text_content for r in out if r.modality == "text"]
        assert texts == ["real prose"]

    def test_same_name_on_two_lines_stays_two_entries(self, spark, tmp_path):
        """The reference dedups only WITHIN a line: the same name under
        two manifest lines is two entries (each keeping its own url and
        extras), and downstream they become two DISTINCT samples —
        entry-qualified sample ids, no postprocess-group merge."""
        p = tmp_path / "m.jsonl"
        p.write_text(
            json.dumps({"file_name": "x.pdf", "url": "http://first"}) + "\n"
            + json.dumps({"file_name": "x.pdf", "url": "http://second", "byte_offset": 3}) + "\n"
            + json.dumps({"file_name": "y.pdf", "url": "http://y"})
        )
        entries = pdf_manifest_entries(spark, str(p))
        got = [(r.entry_id, r.file_name, r.url, json.loads(r.extra)) for r in entries.collect()]
        assert got == [
            (0, "x.pdf", "http://first", {}),
            (1, "x.pdf", "http://second", {"byte_offset": 3}),
            (2, "y.pdf", "http://y", {}),
        ]
        pages = pdf_pages(
            entries,
            lambda f, e: f"{f}|{e}".encode(),
            lambda raw, m: [raw],
        )
        out = nemotron_parse_postprocess(
            pages.withColumn("text_content", pages["binary_content"].cast("string"))
        ).collect()
        metas = {r.sample_id: json.loads(r.text_content) for r in out if r.modality == "metadata"}
        # three samples, never merged; clean name preserved in pdf_name
        assert set(metas) == {"0/x.pdf", "1/x.pdf", "2/y.pdf"}
        assert all(m["pdf_name"] in ("x.pdf", "y.pdf") for m in metas.values())
        texts = {r.sample_id: r.text_content for r in out if r.modality == "text"}
        assert "byte_offset" in texts["1/x.pdf"] and "byte_offset" not in texts["0/x.pdf"]
