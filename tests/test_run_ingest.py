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


class TestPdfCLI:
    def test_pdf_dry_run_and_local_dir_end_to_end(self, spark, tmp_path, capsys, monkeypatch):
        import json as j
        import sys

        import tools.run_ingest as ri

        pdf_dir = tmp_path / "pdfs"
        pdf_dir.mkdir()
        (pdf_dir / "a.pdf").write_bytes(b"raw markup: plain prose page")
        manifest = tmp_path / "m.jsonl"
        manifest.write_text(
            j.dumps({"file_name": "a.pdf", "url": "http://a"}) + "\n"
            + j.dumps({"file_name": "missing.pdf", "url": "http://m"})
        )
        out = tmp_path / "out.parquet"

        argv = ["run_ingest.py", "pdf", str(manifest), str(pdf_dir),
                str(tmp_path / "dl"), str(out), "--ocr", "passthrough", "--dry-run"]
        monkeypatch.setattr(sys, "argv", argv)
        monkeypatch.setattr(ri.SparkSession, "builder", type(
            "B", (), {"appName": staticmethod(lambda n: type(
                "G", (), {"getOrCreate": staticmethod(lambda: spark)})())})())
        ri.main()
        dry = j.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert dry == {"source": "pdf", "n_pdfs": 2, "first": ["a.pdf", "missing.pdf"]}

        monkeypatch.setattr(sys, "argv", argv[:-1])
        ri.main()
        res = j.loads(capsys.readouterr().out.strip().splitlines()[-1])
        rows = spark.read.parquet(str(out)).collect()
        # a.pdf -> metadata + one untagged-fallback text row; the missing
        # PDF's audit row is filtered by the postprocess
        got = {(r.sample_id, r.modality) for r in rows}
        assert got == {("0/a.pdf", "metadata"), ("0/a.pdf", "text")}
        assert res == {"source": "pdf", "rows": 2}
