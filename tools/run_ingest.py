"""spark-submit entry point: plan -> download -> parse -> extract ->
parquet for the three corpus sources (the reference's
DocumentDownloadExtractStage composition, text/download/base/stage.py,
as one resumable Spark job per source).

Usage:
    spark-submit --py-files curator_spark.zip tools/run_ingest.py \
        cc-news  <start YYYY-MM> <end YYYY-MM> <download_dir> <out_parquet>
    spark-submit ... run_ingest.py \
        cc-main  <start YYYY-WW> <end YYYY-WW> <download_dir> <out_parquet>
    spark-submit ... run_ingest.py \
        wikipedia <language> <dump_date|latest> <download_dir> <out_parquet>
    spark-submit ... run_ingest.py \
        arxiv    <bulk_tar_glob_or_s3_listing_file> - <download_dir> <out_parquet>
    spark-submit ... run_ingest.py \
        pdf      <manifest.jsonl> <pdf_dir> <download_dir> <out_parquet>

Network transport: uses urllib from the standard library when
reachable (`--fetcher wget` shells out to wget instead, matching the
reference downloader). Every step is restartable: the download stage
skips complete files (tmp + atomic rename), and the parse stage is a
pure function of the downloaded archives. `download_dir` must be
shared storage visible to all executors.

The `pdf` source runs the Nemotron-Parse data prep (manifest ->
per-PDF task packing -> page fetch from `<pdf_dir>` -> TEXT-ONLY
markup postprocess; the page renderer and OCR model are injectable
seams, so without them the pipeline emits the manifest/page audit
frame — wire real `pdf_source`/`renderer`/OCR callables through
`curator_spark.operators.pdfparse` for the full path).

Offline in this sandbox: run with `--dry-run` to print the planned
path/data URLs without fetching (exercised by tests; the fetch seam
itself is covered by tests/test_download.py with fake fetchers).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import urllib.request

from pyspark.sql import SparkSession

from curator_spark.functions import html_to_text, wikitext_to_text
from curator_spark.io import (
    arxiv_extract,
    cc_main_path_urls,
    cc_news_path_urls,
    download_files,
    expand_path_urls,
    read_arxiv_tars,
    read_warc,
    read_wikipedia_dump,
    wikipedia_dump_urls,
)
from curator_spark.io.download import arxiv_src_urls, latest_wikipedia_dump


def _urllib_bytes(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=30) as r:  # noqa: S310
        return r.read()


def _urllib_file(url: str, dest: str) -> None:
    with urllib.request.urlopen(url, timeout=30) as r, open(dest, "wb") as f:  # noqa: S310
        while chunk := r.read(1 << 20):
            f.write(chunk)


def _wget_file(url: str, dest: str) -> None:
    subprocess.run(
        ["wget", url, "-O", dest, "--retry-on-http-error=503",
         "--waitretry=5", "--tries=5", "-q"],
        check=True,
    )


def _plan(args) -> list:
    """Source -> list of data-file URLs (the URL-generation phase)."""
    if args.source == "cc-news":
        paths = cc_news_path_urls(args.a, args.b)
    elif args.source == "cc-main":
        collinfo = json.loads(
            _urllib_bytes("https://index.commoncrawl.org/collinfo.json")
        )
        paths = cc_main_path_urls(args.a, args.b, collinfo)
    elif args.source == "wikipedia":
        lang, dump_date = args.a, args.b
        if dump_date == "latest":
            index = _urllib_bytes(
                f"https://dumps.wikimedia.org/{lang}wiki"
            ).decode("utf-8")

            def get_status(d: str):
                try:
                    return json.loads(
                        _urllib_bytes(
                            f"https://dumps.wikimedia.org/{lang}wiki/{d}dumpstatus.json"
                        )
                    )
                except Exception:  # noqa: BLE001 - unfinished/missing dump
                    return None

            dump_date, dump_data = latest_wikipedia_dump(index, get_status)
        else:
            dump_data = json.loads(
                _urllib_bytes(
                    f"https://dumps.wikimedia.org/{lang}wiki/{dump_date}/dumpstatus.json"
                )
            )
        return wikipedia_dump_urls(
            dump_data, language=lang, dump_date=dump_date.strip("/")
        )
    else:  # arxiv: a = local bulk-tar glob OR a saved `s5cmd ls` listing
        if glob.glob(args.a):
            return []  # already-local bulk tars, no download phase
        with open(args.a) as f:
            return arxiv_src_urls(f.read())
    return paths


def _run_pdf(spark: SparkSession, args) -> None:
    """Nemotron-Parse data prep: manifest walk -> directory-mode page
    fetch -> text-only postprocess (interleaved/pdf/nemotron_parse/
    composite.py's model-free spine). ``args.a`` = manifest JSONL,
    ``args.b`` = loose-PDF directory."""
    import json as _json

    from curator_spark.operators.pdfparse import (
        nemotron_parse_postprocess,
        pdf_manifest_entries,
        pdf_pages,
    )

    entries = pdf_manifest_entries(
        spark, args.a, max_pdfs=args.limit or None
    )
    if args.dry_run:
        n = entries.count()
        head = [r.file_name for r in entries.limit(5).collect()]
        print(_json.dumps({"source": "pdf", "n_pdfs": n, "first": head}))
        return
    pdf_dir = args.b

    def from_dir(fname: str, extra: str):
        path = os.path.join(pdf_dir, fname)
        try:
            with open(path, "rb") as f:
                return f.read()
        except OSError:
            return None

    # renderer seam: without pypdfium2 the whole PDF rides as one
    # "page" whose bytes downstream OCR seams consume; a real renderer
    # (bytes, max_pages) -> [page PNGs] drops in here
    pages = pdf_pages(entries, from_dir, lambda raw, m: [raw])
    if args.ocr == "passthrough":
        # plumbing stand-in for the external Nemotron-Parse model: the
        # page bytes ARE the markup (lets the manifest->pages->parse
        # spine run end-to-end on pre-extracted text)
        from pyspark.sql import functions as F

        pages = pages.withColumn(
            "text_content",
            F.when(F.col("position") >= 0, F.col("binary_content").cast("string"))
            .otherwise(F.col("text_content")),
        )
    docs = nemotron_parse_postprocess(pages)
    docs.write.mode("overwrite").parquet(args.out_parquet)
    n = spark.read.parquet(args.out_parquet).count()
    print(_json.dumps({"source": "pdf", "rows": n}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("source", choices=["cc-news", "cc-main", "wikipedia", "arxiv", "pdf"])
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("download_dir")
    ap.add_argument("out_parquet")
    ap.add_argument("--fetcher", choices=["urllib", "wget"], default="urllib")
    ap.add_argument("--limit", type=int, default=0, help="cap data-file count")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument(
        "--ocr", choices=["none", "passthrough"], default="none",
        help="pdf source only: 'passthrough' treats page bytes as the "
        "OCR markup (plumbing stand-in; the real model is external)",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"curator-ingest-{args.source}").getOrCreate()
    fetch_file = _wget_file if args.fetcher == "wget" else _urllib_file

    if args.source == "pdf":
        _run_pdf(spark, args)
        return

    urls = _plan(args)
    if args.source in ("cc-news", "cc-main") and urls:
        expanded = expand_path_urls(spark, urls, _urllib_bytes)
        urls = [r.url for r in expanded.collect() if r.error is None]
    if args.limit:
        urls = urls[: args.limit]
    if args.dry_run:
        print(json.dumps({"source": args.source, "n_urls": len(urls), "urls": urls[:5]}))
        return

    if urls:
        dl = download_files(spark, urls, args.download_dir, fetch_file)
        failed = dl.where("NOT ok").count()
        local_glob = os.path.join(args.download_dir, "*")
    else:  # arxiv with already-local tars
        failed = 0
        local_glob = args.a

    if args.source in ("cc-news", "cc-main"):
        from pyspark.sql import functions as F

        docs = read_warc(spark, local_glob).withColumn(
            "text", html_to_text(F.col("content").cast("string"))
        ).drop("content")
    elif args.source == "wikipedia":
        raw = read_wikipedia_dump(spark, local_glob, language=args.a)
        docs = raw.withColumn("text", wikitext_to_text("raw_content")).drop(
            "raw_content"
        )
    else:
        docs = arxiv_extract(read_arxiv_tars(spark, local_glob))

    docs.write.mode("overwrite").parquet(args.out_parquet)
    n = spark.read.parquet(args.out_parquet).count()
    print(json.dumps({"source": args.source, "rows": n, "failed_downloads": failed}))


if __name__ == "__main__":
    main()
