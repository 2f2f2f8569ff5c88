"""Download planning + distributed fetch, Spark-first (reference
``stages/text/download/{base,common_crawl,wikipedia,arxiv}/
{url_generation,download}.py``).

The reference's download layer has three portable parts and one
environment effect. Portable — re-expressed here exactly:

1. **Snapshot math** (``common_crawl/url_generation.py:120-255``):
   CC-MAIN ISO-week windows filtered against ``collinfo.json`` and
   CC-NEWS year/month walks — pure date arithmetic over parsed index
   documents, no network. The index documents ride in as arguments.
2. **Index-document parsing**: Wikipedia ``dumpstatus.json`` file
   selection (``wikipedia/url_generation.py:58-115``; the latest-dump
   walk over the index page uses stdlib ``html.parser`` instead of
   bs4) and the arXiv ``s5cmd ls`` listing shape
   (``arxiv/url_generation.py:29-40``).
3. **The download contract** (``base/download.py:67-101``): skip when
   the final file exists non-empty, fetch to a uuid-suffixed hidden
   temp (attempt-private, so concurrent/speculative attempts never
   interleave writes into one tmp path), atomic ``os.replace`` on
   success — retries/speculation never publish a partial file and
   re-runs resume for free. Output-name mapping matches
   ``CommonCrawlWARCDownloader._get_output_filename``.

The environment effect — actually moving bytes (requests / wget /
s5cmd in the reference) — is an injectable ``fetcher`` callable, the
same seam shape as every model slot in this repo. Without one the
operators raise an honest NotImplementedError.

Where the reference downloads on Ray workers, the Spark re-expression
is a ``mapInPandas`` over a one-column URL DataFrame: expanding ~100
``warc.paths.gz`` lists (~90k WARC URLs each at CC scale) and fetching
~1 GiB archives are embarrassingly parallel per-URL jobs, so task
parallelism = URL count and the cluster's network fan-out is governed
by ``repartition`` (the reference's ``num_workers_per_node`` knob
becomes partition count)."""

from __future__ import annotations

import os
import uuid
import zlib
from datetime import date, datetime, timedelta
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "arxiv_src_urls",
    "cc_main_path_urls",
    "cc_news_path_urls",
    "download_files",
    "expand_path_urls",
    "latest_wikipedia_dump",
    "parse_main_snapshot",
    "parse_news_snapshot",
    "warc_output_filename",
    "wikipedia_dump_urls",
]

CC_DATA_PREFIX = "https://data.commoncrawl.org"
_OLD_SNAPSHOTS = {"CC-MAIN-2009-2010", "CC-MAIN-2008-2009"}
_NEWS_MIN_DATE = date(2016, 8, 1)


# ---------------------------------------------------------------- snapshots
def parse_main_snapshot(snapshot_str: str) -> date:
    """``YYYY-WW`` (ISO week) -> Monday of that week (reference
    ``MainCommonCrawlUrlGenerator._parse_datetime_from_snapshot_string``)."""
    try:
        year, week = map(int, snapshot_str.split("-"))
    except ValueError as e:
        msg = (
            "Invalid Main CC snapshot format. Use YYYY-WW (e.g., "
            f"'2020-50'). Provided: '{snapshot_str}'"
        )
        raise ValueError(msg) from e
    if not (1 <= week <= 53):
        raise ValueError(
            f"Week number must be between 1 and 53. Provided: '{snapshot_str}'"
        )
    return datetime.fromisocalendar(year, week, 1).date()


def parse_news_snapshot(snapshot_str: str, for_start: bool) -> date:
    """``YYYY-MM`` -> first day (start) / last day (end) of the month
    (reference ``NewsCommonCrawlUrlGenerator`` parse)."""
    try:
        year, month = map(int, snapshot_str.split("-"))
        if not (1 <= month <= 12):
            raise ValueError(
                f"Month must be between 1 and 12. Provided: '{snapshot_str}'"
            )
        if for_start:
            return date(year, month, 1)
        ny, nm = (year + 1, 1) if month == 12 else (year, month + 1)
        return date(ny, nm, 1) - timedelta(days=1)
    except ValueError as e:
        if "Month must be" in str(e):
            raise
        msg = (
            "Invalid News CC snapshot format. Use YYYY-MM (e.g., "
            f"'2020-08'). Provided: '{snapshot_str}'"
        )
        raise ValueError(msg) from e


def _window(start: date, end: date, start_str: str, end_str: str, today: date | None):
    if start > end:
        raise ValueError(
            f"Start snapshot '{start_str}' is after end snapshot '{end_str}'"
        )
    if today is not None and end > today:
        end = today
    return start, end


def cc_main_path_urls(
    start_snapshot: str,
    end_snapshot: str,
    collinfo: list,
    data_prefix: str = CC_DATA_PREFIX,
    today: date | None = None,
) -> list:
    """CC-MAIN ``warc.paths.gz`` URLs for every collinfo snapshot whose
    ISO-week Monday falls inside [start, end] (reference
    ``generate_path_urls``, ``url_generation.py:150-185``): pre-2013
    starts clamp to 2013-01-01, the two 2008-2010 legacy ids and any
    unparseable id are skipped. ``collinfo`` is the parsed
    ``collinfo.json`` (list of ``{"id": "CC-MAIN-YYYY-WW", ...}``);
    fetching it is the caller's fetcher seam. ``today`` bounds a
    future ``end_snapshot`` (defaults to the real clock like the
    reference; pass a date for determinism)."""
    start = parse_main_snapshot(start_snapshot)
    end = parse_main_snapshot(end_snapshot)
    start, end = _window(
        start, end, start_snapshot, end_snapshot, today or date.today()
    )
    if start.year < 2013:
        start = date(2013, 1, 1)
    prefix = urljoin(data_prefix + "/", "crawl-data/CC-MAIN")
    out = []
    for info in collinfo:
        sid = info.get("id")
        if not sid or sid in _OLD_SNAPSHOTS:
            continue
        parts = sid.split("-")
        if len(parts) != 4 or parts[0] != "CC" or parts[1] != "MAIN":
            continue
        try:
            year, week = int(parts[2]), int(parts[3])
            snap_day = datetime.fromisocalendar(year, week, 1).date()
        except ValueError:
            continue
        if start <= snap_day <= end:
            out.append(f"{prefix}-{year}-{week:02d}/warc.paths.gz")
    return out


def cc_news_path_urls(
    start_snapshot: str,
    end_snapshot: str,
    data_prefix: str = CC_DATA_PREFIX,
    today: date | None = None,
) -> list:
    """CC-NEWS monthly ``warc.paths.gz`` URLs (reference
    ``url_generation.py:211-255``): month walk from start to end,
    starts before 2016-08 clamp to it, output reversed so the latest
    month comes first (matching CC-MAIN's newest-first order)."""
    start = parse_news_snapshot(start_snapshot, for_start=True)
    end = parse_news_snapshot(end_snapshot, for_start=False)
    start, end = _window(
        start, end, start_snapshot, end_snapshot, today or date.today()
    )
    if start < _NEWS_MIN_DATE:
        start = _NEWS_MIN_DATE
    prefix = urljoin(data_prefix + "/", "crawl-data/CC-NEWS")
    out = []
    y, m = start.year, start.month
    while date(y, m, 1) <= end:
        out.append(f"{prefix}/{y}/{m:02d}/warc.paths.gz")
        y, m = (y + 1, 1) if m == 12 else (y, m + 1)
    return out[::-1]


# ------------------------------------------------------------ index parsing
def wikipedia_dump_urls(
    dump_data: dict,
    language: str = "en",
    dump_date: str = "latest",
    index_prefix: str = "https://dumps.wikimedia.org",
) -> list:
    """XML multistream file URLs from a parsed ``dumpstatus.json``
    (reference ``wikipedia/url_generation.py:95-115``): the
    ``articlesmultistreamdump`` job must be ``done``; only file names
    containing ``xml`` qualify."""
    job = (dump_data.get("jobs") or {}).get("articlesmultistreamdump")
    if not job or job.get("status") != "done":
        raise ValueError(f"Dump {dump_date} is not finished")
    base = urljoin(
        urljoin(index_prefix + "/", f"{language}wiki") + "/", dump_date + "/"
    )
    return [urljoin(base, name) for name in job.get("files", ()) if "xml" in name]


class _AnchorTexts(HTMLParser):
    def __init__(self):
        super().__init__()
        self.texts: list = []
        self._in_a = False

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._in_a = True
            self.texts.append("")

    def handle_endtag(self, tag):
        if tag == "a":
            self._in_a = False

    def handle_data(self, data):
        if self._in_a and self.texts:
            self.texts[-1] += data


def latest_wikipedia_dump(index_html: str, get_dump_data) -> tuple:
    """Latest FINISHED dump from a ``<lang>wiki`` index page (reference
    ``url_generation.py:70-93``): walk anchors newest-first (skipping
    the trailing 'latest' link), keep digit-named dumps, take the first
    whose dumpstatus loads and whose multistream job is done.
    ``get_dump_data(dump_date) -> dict | None`` is the fetcher seam.
    Returns (dump_date, dump_data); raises when none qualifies."""
    parser = _AnchorTexts()
    parser.feed(index_html)
    for text in reversed(parser.texts[:-1]):
        if not text.strip("/").isdigit():
            continue
        dump_data = get_dump_data(text)
        if dump_data is None:
            continue
        job = (dump_data.get("jobs") or {}).get("articlesmultistreamdump", {})
        if job.get("status") == "done":
            return text, dump_data
    raise ValueError("no finished articlesmultistreamdump found in index")


def arxiv_src_urls(listing: str) -> list:
    """Bulk-tar keys from an ``s5cmd ls s3://arxiv/src/`` listing
    (reference ``arxiv/url_generation.py:29-40``): one object per line,
    the key is the 4th whitespace field; keep ``.tar`` lines, sorted."""
    urls = [
        fields[3]
        for line in listing.splitlines()
        if ".tar" in line and len(fields := line.split()) >= 4
    ]
    urls.sort()
    return urls


def warc_output_filename(url: str) -> str:
    """URL -> flat local name (reference
    ``CommonCrawlWARCDownloader._get_output_filename``)."""
    return urlparse(url).path[1:].replace("/", "-")


# -------------------------------------------------------------- Spark stages
def _url_frame(spark: SparkSession, urls, column: str) -> DataFrame:
    df = spark.createDataFrame([(u,) for u in urls], f"{column} string")
    return df.repartition(max(1, min(len(urls), spark.sparkContext.defaultParallelism)))


def expand_path_urls(
    spark: SparkSession,
    path_urls: list,
    fetcher,
    data_prefix: str = CC_DATA_PREFIX,
) -> DataFrame:
    """Expand ``warc.paths.gz`` lists into one row per WARC URL
    (reference ``generate_data_urls``, ``url_generation.py:76-113``)
    as a distributed map: each task fetches its path lists, gunzips,
    joins relative lines onto ``data_prefix``. A failed/corrupt path
    list yields ONE auditable error row (url NULL) instead of killing
    the job — the reference logs and continues. Output: (path_url,
    url, error)."""
    if fetcher is None:
        raise NotImplementedError(
            "expand_path_urls needs a fetcher(url) -> bytes callable; "
            "network access is an injected seam (reference uses requests)"
        )

    def run(batches):
        for pdf in batches:
            rows = []
            for purl in pdf["path_url"]:
                try:
                    raw = fetcher(purl)
                    lines = zlib.decompress(raw, zlib.MAX_WBITS | 32).decode("utf-8")
                except Exception as e:  # noqa: BLE001 - auditable, not fatal
                    rows.append((purl, None, f"{type(e).__name__}: {e}"))
                    continue
                rows.extend(
                    (purl, urljoin(data_prefix, ln.strip()), None)
                    for ln in lines.splitlines()
                    if ln.strip()
                )
            yield pd.DataFrame(rows, columns=["path_url", "url", "error"])

    return _url_frame(spark, path_urls, "path_url").mapInPandas(
        run, schema="path_url string, url string, error string"
    )


def fetch_once(fetcher, url: str, final: str) -> str:
    """The one shared skip-if-present + attempt-private-temp +
    atomic-publish download step (reference ``base/download.py:67-101``
    and ``file_utils.download_file``). Skip when ``final`` exists
    non-empty; otherwise ``fetcher(url, tmp)`` writes an attempt-private
    uuid temp and ``os.replace`` publishes it. Two concurrent attempts
    (spark.speculation, zombie tasks after a stage retry) each write
    their OWN temp, so the published file is always one attempt's
    complete bytes — never an interleaving. An empty fetch is an error
    (never published), matching the reference's non-empty validation."""
    if os.path.exists(final) and os.path.getsize(final) > 0:
        return final
    os.makedirs(os.path.dirname(final) or ".", exist_ok=True)
    tmp = os.path.join(
        os.path.dirname(final) or ".",
        f".{os.path.basename(final)}.{uuid.uuid4().hex}.tmp",
    )
    try:
        fetcher(url, tmp)
        if not os.path.exists(tmp) or os.path.getsize(tmp) == 0:
            raise RuntimeError(f"Download failed - empty file for {url}")
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return final


def download_files(
    spark: SparkSession,
    urls: list,
    download_dir: str,
    fetcher,
    output_name=warc_output_filename,
) -> DataFrame:
    """Distributed download with the reference's resume contract
    (``base/download.py:67-101``), one :func:`fetch_once` per URL:
    skip when the final file exists non-empty; otherwise the fetcher
    writes an attempt-private uuid temp and an atomic ``os.replace``
    publishes it — a failed, retried, or SPECULATIVE task never leaves
    a partial or interleaved final file, and re-running the job
    downloads only what is missing. ``download_dir`` must be shared
    storage visible to every executor (the reference requires the
    same). Output: (url, path, ok, nbytes, error)."""
    if fetcher is None:
        raise NotImplementedError(
            "download_files needs a fetcher(url, dest_path) callable; "
            "network access is an injected seam (reference shells out "
            "to wget/s5cmd)"
        )
    os.makedirs(download_dir, exist_ok=True)

    def run(batches):
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                final = os.path.join(download_dir, output_name(url))
                try:
                    fetch_once(fetcher, url, final)
                    rows.append((url, final, True, os.path.getsize(final), None))
                except Exception as e:  # noqa: BLE001 - auditable, not fatal
                    rows.append((url, None, False, 0, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows, columns=["url", "path", "ok", "nbytes", "error"]
            )

    return _url_frame(spark, urls, "url").mapInPandas(
        run, schema="url string, path string, ok boolean, nbytes long, error string"
    )
