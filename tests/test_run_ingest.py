"""tools/run_ingest.py — the composed plan->download->parse->extract
CLI (reference DocumentDownloadExtractStage, text/download/base/stage.py)."""

from __future__ import annotations

import gzip
import importlib.util
import io
import json
import os
import sys
import tarfile

import pytest


@pytest.fixture()
def ingest():
    spec = importlib.util.spec_from_file_location(
        "run_ingest",
        os.path.join(os.path.dirname(__file__), "..", "tools", "run_ingest.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(ingest, argv, capsys):
    old = sys.argv
    sys.argv = ["run_ingest.py", *argv]
    try:
        ingest.main()
    finally:
        sys.argv = old
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_arxiv_local_tars_end_to_end(spark, ingest, tmp_path, capsys):
    tex = b"\\section{T}\nbody text\n\\bibliography{r} junk"
    member = gzip.compress(tex)
    with tarfile.open(tmp_path / "arXiv_src_2301_001.tar", "w") as tar:
        info = tarfile.TarInfo(name="0001/2301.00001.gz")
        info.size = len(member)
        tar.addfile(info, io.BytesIO(member))
    out = _run(
        ingest,
        ["arxiv", str(tmp_path / "*.tar"), "-", str(tmp_path / "dl"),
         str(tmp_path / "out.parquet")],
        capsys,
    )
    assert out == {"source": "arxiv", "rows": 1, "failed_downloads": 0}
    row = spark.read.parquet(str(tmp_path / "out.parquet")).collect()[0]
    assert row.id == "2301.00001" and row.text.startswith("\\section{T}")


def test_cc_news_dry_run_plans_and_expands(spark, ingest, capsys, monkeypatch):
    def fake_bytes(url):
        assert url.endswith("/warc.paths.gz")
        return gzip.compress(b"crawl-data/a.warc.gz\ncrawl-data/b.warc.gz")

    monkeypatch.setattr(ingest, "_urllib_bytes", fake_bytes)
    out = _run(
        ingest,
        ["cc-news", "2024-01", "2024-02", "/tmp/x", "/tmp/y",
         "--dry-run", "--limit", "3"],
        capsys,
    )
    assert out["source"] == "cc-news" and out["n_urls"] == 3
    assert all(u.startswith("https://data.commoncrawl.org/crawl-data/")
               for u in out["urls"])


def test_wikipedia_dry_run_fixed_date(spark, ingest, capsys, monkeypatch):
    status = {
        "jobs": {
            "articlesmultistreamdump": {
                "status": "done",
                "files": {"enwiki-x-pages-articles-multistream1.xml.bz2": {}},
            }
        }
    }
    monkeypatch.setattr(
        ingest, "_urllib_bytes", lambda url: json.dumps(status).encode()
    )
    out = _run(
        ingest,
        ["wikipedia", "en", "20240501", "/tmp/x", "/tmp/y", "--dry-run"],
        capsys,
    )
    assert out["n_urls"] == 1 and "20240501" in out["urls"][0]
