"""Download planning + distributed fetch (reference
stages/text/download/{base,common_crawl,wikipedia,arxiv}/
{url_generation,download}.py)."""

from __future__ import annotations

import gzip
import os
from datetime import date

import pytest

from curator_spark.io.download import (
    arxiv_src_urls,
    cc_main_path_urls,
    cc_news_path_urls,
    download_files,
    expand_path_urls,
    latest_wikipedia_dump,
    parse_main_snapshot,
    parse_news_snapshot,
    warc_output_filename,
    wikipedia_dump_urls,
)

TODAY = date(2026, 8, 18)


class TestSnapshotParsing:
    def test_main_iso_week(self):
        assert parse_main_snapshot("2020-50") == date(2020, 12, 7)

    @pytest.mark.parametrize("bad", ["2020", "2020-aa", "2020-54", "2020-0"])
    def test_main_rejects(self, bad):
        with pytest.raises(ValueError):
            parse_main_snapshot(bad)

    def test_news_month_bounds(self):
        assert parse_news_snapshot("2020-02", for_start=True) == date(2020, 2, 1)
        assert parse_news_snapshot("2020-02", for_start=False) == date(2020, 2, 29)
        assert parse_news_snapshot("2020-12", for_start=False) == date(2020, 12, 31)

    @pytest.mark.parametrize("bad", ["2020", "2020-13", "2020-00", "x-y"])
    def test_news_rejects(self, bad):
        with pytest.raises(ValueError):
            parse_news_snapshot(bad, for_start=True)

    def test_start_after_end(self):
        with pytest.raises(ValueError, match="after end"):
            cc_news_path_urls("2021-05", "2021-01", today=TODAY)


COLLINFO = [
    {"id": "CC-MAIN-2020-50"},
    {"id": "CC-MAIN-2021-04"},
    {"id": "CC-MAIN-2021-10"},
    {"id": "CC-MAIN-2009-2010"},  # legacy: skipped
    {"id": "CC-MAIN-bogus-id-x"},  # unparseable week: skipped
    {"name": "no id"},  # skipped
    {"id": "CC-MAIN-2012-10"},  # before the 2013 clamp
]


class TestMainPlan:
    def test_window_filter_and_format(self):
        urls = cc_main_path_urls("2020-48", "2021-05", COLLINFO, today=TODAY)
        assert urls == [
            "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-50/warc.paths.gz",
            "https://data.commoncrawl.org/crawl-data/CC-MAIN-2021-04/warc.paths.gz",
        ]

    def test_pre2013_clamp_excludes_2012(self):
        urls = cc_main_path_urls("2011-01", "2021-05", COLLINFO, today=TODAY)
        assert not any("2012" in u for u in urls)
        assert len(urls) == 2

    def test_future_end_clamps_to_today(self):
        urls = cc_main_path_urls(
            "2021-06", "2099-01", COLLINFO, today=date(2021, 3, 1)
        )
        assert urls == []  # 2021-10's Monday (Mar 8) is past the clamp


class TestNewsPlan:
    def test_walk_reversed_with_rollover(self):
        urls = cc_news_path_urls("2020-11", "2021-02", today=TODAY)
        assert urls == [
            "https://data.commoncrawl.org/crawl-data/CC-NEWS/2021/02/warc.paths.gz",
            "https://data.commoncrawl.org/crawl-data/CC-NEWS/2021/01/warc.paths.gz",
            "https://data.commoncrawl.org/crawl-data/CC-NEWS/2020/12/warc.paths.gz",
            "https://data.commoncrawl.org/crawl-data/CC-NEWS/2020/11/warc.paths.gz",
        ]

    def test_min_date_clamp(self):
        urls = cc_news_path_urls("2016-01", "2016-09", today=TODAY)
        assert urls[-1].endswith("/2016/08/warc.paths.gz")
        assert len(urls) == 2


DUMPSTATUS = {
    "jobs": {
        "articlesmultistreamdump": {
            "status": "done",
            "files": {
                "enwiki-20240501-pages-articles-multistream1.xml-p1p41242.bz2": {},
                "enwiki-20240501-multistream-index1.txt.bz2": {},
                "enwiki-20240501-pages-articles-multistream2.xml-p41243p151573.bz2": {},
            },
        }
    }
}


class TestWikipediaPlan:
    def test_xml_filter_and_join(self):
        urls = wikipedia_dump_urls(DUMPSTATUS, language="en", dump_date="20240501")
        assert len(urls) == 2
        assert all(
            u.startswith("https://dumps.wikimedia.org/enwiki/20240501/") for u in urls
        )
        assert all(".xml" in u for u in urls)

    def test_unfinished_raises(self):
        bad = {"jobs": {"articlesmultistreamdump": {"status": "in-progress"}}}
        with pytest.raises(ValueError, match="not finished"):
            wikipedia_dump_urls(bad)
        with pytest.raises(ValueError):
            wikipedia_dump_urls({})

    def test_latest_dump_walk(self):
        index = (
            '<html><a href="20240301/">20240301/</a>'
            '<a href="20240401/">20240401/</a>'
            '<a href="20240501/">20240501/</a>'
            '<a href="latest/">latest/</a></html>'
        )
        statuses = {
            "20240501/": None,  # dumpstatus fetch failed
            "20240401/": {
                "jobs": {"articlesmultistreamdump": {"status": "in-progress"}}
            },
            "20240301/": DUMPSTATUS,
        }
        picked, data = latest_wikipedia_dump(index, statuses.get)
        assert picked == "20240301/" and data is DUMPSTATUS

    def test_latest_dump_none_finished(self):
        with pytest.raises(ValueError, match="no finished"):
            latest_wikipedia_dump('<a href="x">20240301/</a>', lambda d: None)


class TestArxivPlan:
    def test_s5cmd_listing_shape(self):
        listing = (
            "2023/01/02 10:00:00    524288000 s3://arxiv/src/arXiv_src_2301_002.tar\n"
            "2023/01/02 10:00:00     12345678 s3://arxiv/src/arXiv_src_2301_001.tar\n"
            "2023/01/02 10:00:00          100 s3://arxiv/src/manifest.json\n"
        )
        assert arxiv_src_urls(listing) == [
            "s3://arxiv/src/arXiv_src_2301_001.tar",
            "s3://arxiv/src/arXiv_src_2301_002.tar",
        ]


class TestExpand:
    def test_gzip_lists_expand_and_errors_audit(self, spark):
        lists = {
            "https://x/a/warc.paths.gz": gzip.compress(
                b"crawl-data/seg1/a.warc.gz\n\ncrawl-data/seg1/b.warc.gz\n"
            ),
            "https://x/b/warc.paths.gz": b"not gzip at all",
        }
        out = expand_path_urls(spark, sorted(lists), lists.__getitem__).collect()
        ok = sorted(r.url for r in out if r.error is None)
        assert ok == [
            "https://data.commoncrawl.org/crawl-data/seg1/a.warc.gz",
            "https://data.commoncrawl.org/crawl-data/seg1/b.warc.gz",
        ]
        bad = [r for r in out if r.error is not None]
        assert len(bad) == 1 and bad[0].url is None
        assert bad[0].path_url == "https://x/b/warc.paths.gz"

    def test_seam_required(self, spark):
        with pytest.raises(NotImplementedError):
            expand_path_urls(spark, ["u"], None)


class TestDownload:
    def test_commit_protocol_and_resume(self, spark, tmp_path):
        calls = []

        def fetch(url, dest):
            calls.append(url)
            with open(dest, "wb") as f:
                f.write(url.encode() * 3)

        urls = [
            "https://data.commoncrawl.org/crawl-data/seg1/a.warc.gz",
            "https://data.commoncrawl.org/crawl-data/seg1/b.warc.gz",
        ]
        out = {
            r.url: r
            for r in download_files(spark, urls, str(tmp_path), fetch).collect()
        }
        assert all(r.ok for r in out.values())
        for r in out.values():
            assert os.path.getsize(r.path) == r.nbytes > 0
            assert os.path.basename(r.path) == warc_output_filename(r.url)
        assert not [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]
        # resume: second run skips every existing non-empty file
        calls.clear()
        out2 = download_files(spark, urls, str(tmp_path), fetch).collect()
        assert all(r.ok for r in out2) and calls == []

    def test_failure_row_and_tmp_cleanup(self, spark, tmp_path):
        def fetch(url, dest):
            with open(dest, "wb") as f:
                f.write(b"partial")
            raise OSError("connection reset")

        (row,) = download_files(spark, ["https://x/y.gz"], str(tmp_path), fetch).collect()
        assert row.ok is False and "connection reset" in row.error
        assert row.path is None and os.listdir(tmp_path) == []

    def test_seam_required(self, spark, tmp_path):
        with pytest.raises(NotImplementedError):
            download_files(spark, ["u"], str(tmp_path), None)

    def test_attempt_private_temps(self, tmp_path):
        """Each fetch attempt writes its OWN uuid temp (speculative /
        zombie attempts can never interleave into one tmp path), temps
        are hidden dotfiles, and an empty fetch is never published."""
        from curator_spark.io.download import fetch_once

        seen = []

        def fetch(url, dest):
            seen.append(os.path.basename(dest))
            with open(dest, "wb") as f:
                f.write(b"payload")

        final = str(tmp_path / "f.warc.gz")
        fetch_once(fetch, "u", final)
        os.remove(final)
        fetch_once(fetch, "u", final)
        assert len(seen) == 2 and seen[0] != seen[1]
        assert all(n.startswith(".f.warc.gz.") and n.endswith(".tmp") for n in seen)

        def empty(url, dest):
            open(dest, "wb").close()

        with pytest.raises(RuntimeError, match="empty"):
            fetch_once(empty, "u", str(tmp_path / "g.gz"))
        assert sorted(os.listdir(tmp_path)) == ["f.warc.gz"]

    def test_output_filename_parity(self):
        url = "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-50/segments/1.warc.gz"
        assert (
            warc_output_filename(url)
            == "crawl-data-CC-MAIN-2020-50-segments-1.warc.gz"
        )
