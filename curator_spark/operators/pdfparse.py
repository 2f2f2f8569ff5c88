"""Nemotron-Parse PDF pipeline stages, Spark-first (reference
``stages/interleaved/pdf/nemotron_parse/{partitioning,preprocess,
inference,postprocess,composite}.py``).

The reference pipeline is manifest → PDF bytes → page render → OCR
model → markup parse → interleaved rows, run as Ray stages. Here:

- **pdf_manifest_entries** — PDFPartitioningStage (partitioning.py:
  17-144): the JSONL manifest walk (single ``file_name`` entries with
  preserved extra fields, CC-MAIN ``cc_pdf_file_names`` expansion with
  per-line order-preserving dedup, blank/field-less line skips, the
  ``max_pdfs`` cap, ``pdfs_per_task`` packing) as a distributed read +
  one metadata-scale window for the order-exact cap/packing (the
  reference runs the whole walk on one worker; the manifest is metadata,
  thousands of lines, so one tiny exchange is the right trade).
- **pdf_pages** — PDFPreprocessStage's data flow (preprocess.py:30-140)
  behind two injectable seams: ``pdf_source(file_name, extra_json) ->
  bytes | None`` (covers the reference's zip / directory / JSONL modes)
  and ``renderer(pdf_bytes, max_pages) -> list[page PNG bytes]``
  (pypdfium2 + PIL in the reference). Unfetchable or unrenderable PDFs
  become audit rows, never task failures.
- **nemotron_parse_postprocess** — NemotronParsePostprocessStage
  (postprocess.py:24-111): ONE ``applyInPandas`` grouped on
  ``sample_id`` (the reference's per-task pandas groupby becomes the
  shuffle key) running the pure markup-parse / floater-reorder /
  canvas-crop kernels; page-image decode and PNG encode are the
  standard ``decoder`` / ``encoder`` seams — absent, text extraction
  still runs and Picture crops are skipped.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..kernels import pdfparse as ker

__all__ = [
    "nemotron_parse_postprocess",
    "pdf_manifest_entries",
    "pdf_pages",
]

_ENTRY_SCHEMA = "_ord long, _j long, file_name string, url string, extra string"

POSTPROCESS_SCHEMA = (
    "sample_id string, position int, modality string, content_type string, "
    "text_content string, binary_content binary, source_ref string, "
    "url string, page_number int, pdf_name string, element_class string"
)


def pdf_manifest_entries(
    spark: SparkSession,
    manifest_path: str,
    pdfs_per_task: int = 10,
    max_pdfs: int | None = None,
    file_name_field: str = "file_name",
    file_names_field: str = "cc_pdf_file_names",
    url_field: str = "url",
) -> DataFrame:
    """partitioning.py:89-144 — manifest JSONL → one row per PDF with
    ``task_index`` packing. Output: (task_index, file_name, url, extra)
    where ``extra`` is the JSON of the preserved per-file fields (e.g.
    ``jsonl_file``/``byte_offset``)."""
    lines = spark.read.text(manifest_path).select(
        F.monotonically_increasing_id().alias("_ord"), "value"
    )
    fn_f, fns_f, url_f = file_name_field, file_names_field, url_field

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ord_, raw in zip(pdf["_ord"], pdf["value"]):
                line = ("" if raw is None else str(raw)).strip()
                if not line:
                    continue
                record = json.loads(line)
                url = record.get(url_f, "")
                if fns_f in record:
                    file_names, extra = record[fns_f], {}
                elif fn_f in record:
                    file_names = [record[fn_f]]
                    extra = {
                        k: v
                        for k, v in record.items()
                        if k not in (fn_f, url_f, fns_f)
                    }
                else:
                    continue  # partitioning.py:114 — skip, audit via count
                for j, fname in enumerate(dict.fromkeys(file_names)):
                    if not fname:
                        continue
                    rows.append((int(ord_), j, fname, url, json.dumps(extra)))
            yield pd.DataFrame(
                rows, columns=["_ord", "_j", "file_name", "url", "extra"]
            )

    entries = lines.mapInPandas(parse, schema=_ENTRY_SCHEMA)
    # order-exact cap + packing: one window over the manifest order —
    # metadata-scale (the reference does this single-threaded). The
    # manifest-order row number doubles as ``entry_id``: the reference
    # dedups file names only WITHIN a line, so the same name may appear
    # under two lines — downstream, pdf_pages keys its samples by
    # (entry_id, file_name) so two such entries never merge into one
    # postprocess group, while cap/packing stay reference-order exact.
    w = Window.orderBy("_ord", "_j")
    entries = entries.withColumn("_rn", F.row_number().over(w) - 1)
    if max_pdfs:
        entries = entries.where(F.col("_rn") < int(max_pdfs))
    return entries.select(
        F.col("_rn").alias("entry_id"),
        (F.col("_rn") / int(pdfs_per_task)).cast("long").alias("task_index"),
        "file_name",
        "url",
        "extra",
    )


def pdf_pages(
    df: DataFrame,
    pdf_source: Callable | None = None,
    renderer: Callable | None = None,
    max_pages: int = 50,
) -> DataFrame:
    """preprocess.py:30-140 data flow — fetch PDF bytes through the
    ``pdf_source(file_name, extra_json) -> bytes | None`` seam, render
    through ``renderer(pdf_bytes, max_pages) -> list[PNG bytes]``, emit
    one row per page (text_content empty, to be filled by inference).
    A missing PDF or a renderer failure yields one audit row
    (page_number -1, error in text_content) instead of failing the
    task."""
    for name, seam in (("pdf_source", pdf_source), ("renderer", renderer)):
        if seam is None:
            raise NotImplementedError(
                f"pdf_pages requires a {name} callable; the reference uses "
                "zip/dir/JSONL readers + pypdfium2 (preprocess.py:78-140) — "
                "inject one"
            )

    schema = (
        "sample_id string, position int, url string, pdf_name string, "
        "binary_content binary, text_content string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            has_eid = "entry_id" in pdf.columns
            eids = pdf["entry_id"] if has_eid else range(len(pdf))
            for eid, fname, url, extra in zip(
                eids, pdf["file_name"], pdf["url"], pdf["extra"]
            ):
                # entry-qualified sample key: WebDataset-style names are
                # only unique per manifest ENTRY (the clean name stays in
                # pdf_name/url); a repeated name under two lines must not
                # merge two PDFs into one postprocess group
                sid = f"{int(eid)}/{fname}" if has_eid else str(fname)
                try:
                    raw = pdf_source(fname, extra)
                    if raw is None:
                        raise FileNotFoundError(fname)
                    pages = renderer(raw, max_pages)
                    for i, png in enumerate(pages[:max_pages]):
                        rows.append((sid, i, url, fname, png, ""))
                except Exception as e:  # noqa: BLE001 - audit, not fatal
                    rows.append(
                        (sid, -1, url, fname, None, f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sample_id", "position", "url", "pdf_name",
                    "binary_content", "text_content",
                ],
            )

    return df.mapInPandas(run, schema=schema)


def nemotron_parse_postprocess(
    df: DataFrame,
    proc_size: tuple = (2048, 1664),
    min_crop_px: int = ker.DEFAULT_MIN_CROP_PX,
    model_path: str = "",
    decoder: Callable | None = None,
    encoder: Callable | None = None,
    resizer: Callable | None = None,
) -> DataFrame:
    """postprocess.py:24-111 — raw model markup + page images →
    interleaved-schema rows, grouped per PDF. Floater reordering is
    applied for Nemotron-Parse v1.1 (``"v1.1" in model_path``) and
    skipped for v1.2+ exactly as the reference keys it. ``decoder``
    turns page ``binary_content`` into an RGB array (absent → Picture
    crops are skipped, text parsing unaffected); ``encoder`` serializes
    crops to PNG bytes."""
    for col in ("sample_id", "position", "url", "pdf_name", "binary_content", "text_content"):
        if col not in df.columns:
            raise ValueError(f"nemotron_parse_postprocess: missing column {col!r}")
    # pdf_pages audit rows (position -1, error text) are NOT model
    # output — without this filter the untagged-output fallback would
    # turn the error message into document text and an unrendered PDF
    # would still claim pages in its metadata row
    df = df.where(F.col("position") >= 0)
    reorder = "v1.1" in model_path
    psize, mcp, dec, enc, rsz = tuple(proc_size), int(min_crop_px), decoder, encoder, resizer

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("position")
        sample_id = str(g["sample_id"].iloc[0])
        url = str(g["url"].iloc[0])
        pdf_name = str(g["pdf_name"].iloc[0])
        arrays = []
        for b in g["binary_content"]:
            if dec is None or b is None:
                arrays.append(None)
            else:
                arrays.append(dec(bytes(b)))
        outputs = [str(t) if t else "" for t in g["text_content"].tolist()]
        rows = ker.build_interleaved_rows(
            sample_id, url, pdf_name, arrays, outputs,
            proc_size=psize, reorder_floaters=reorder,
            min_crop_px=mcp, encoder=enc, resizer=rsz,
        )
        out = pd.DataFrame(
            rows,
            columns=[
                "sample_id", "position", "modality", "content_type",
                "text_content", "binary_content", "source_ref", "url",
                "page_number", "pdf_name", "element_class",
            ],
        )
        out["position"] = out["position"].astype("int32")
        out["page_number"] = out["page_number"].astype("Int32")
        return out

    return df.groupBy("sample_id").applyInPandas(build, schema=POSTPROCESS_SCHEMA)
