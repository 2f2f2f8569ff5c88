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

Network transport: uses urllib from the standard library when
reachable (`--fetcher wget` shells out to wget instead, matching the
reference downloader). Every step is restartable: the download stage
skips complete files (tmp + atomic rename), and the parse stage is a
pure function of the downloaded archives. `download_dir` must be
shared storage visible to all executors.

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("source", choices=["cc-news", "cc-main", "wikipedia", "arxiv"])
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("download_dir")
    ap.add_argument("out_parquet")
    ap.add_argument("--fetcher", choices=["urllib", "wget"], default="urllib")
    ap.add_argument("--limit", type=int, default=0, help="cap data-file count")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"curator-ingest-{args.source}").getOrCreate()
    fetch_file = _wget_file if args.fetcher == "wget" else _urllib_file

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
