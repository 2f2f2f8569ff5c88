"""ArXiv LaTeX cleaning kernel + bulk-tar source (reference
stages/text/download/arxiv/{iterator,extract}.py, RedPajama-derived)."""

from __future__ import annotations

import gzip
import io
import tarfile

import pytest

from curator_spark.kernels.latex import (
    build_non_arg_macros,
    clean_tex,
    clean_tex_project,
    format_arxiv_id,
)


class TestLatexKernel:
    def test_macro_extraction(self):
        src = (
            "\\newcommand{\\foo}{BAR}\n"
            "\\newcommand*{\\nn}{42}\n"
            "\\def\\xx {yy}\n"
            "\\newcommand{\\withargs}[1]{no}\n"  # argumented: regex shape excludes
        )
        m = build_non_arg_macros(src)
        assert m == {"\\\\foo": "BAR", "\\\\nn": "42", "\\\\xx": "yy"}

    def test_clean_requires_section_header(self):
        assert clean_tex("no headers here", {}) == ""

    def test_clean_pipeline(self):
        src = (
            "% preamble comment\n"
            "\\documentclass{article}\n"
            "\\begin{document}\n"
            "\\section{Intro}\n"
            "body text \\foo, done\n"
            "trailing % inline comment\n"
            "\\bibliography{refs} junk after\n"
        )
        out = clean_tex(src, build_non_arg_macros("\\newcommand{\\foo}{BAR}\n"))
        assert out.startswith("\\section{Intro}")
        assert "BAR," in out and "\\foo" not in out
        assert "preamble" not in out and "documentclass" not in out
        assert "inline comment" not in out
        assert "junk after" not in out and "\\bibliography" not in out

    def test_appendix_tail_and_project_join(self):
        a = "\\newcommand{\\mac}{VAL}\nx"
        b = "\\section{S}\nuse \\mac here\n\\appendix\ndropped"
        # macros from file a expand in file b; a itself has no header -> ""
        out = clean_tex_project([a, b])
        assert out == "\n\\section{S}\nuse VAL here\n"

    def test_empty_project(self):
        assert clean_tex_project([]) is None
        assert clean_tex_project(["no header"]) is None

    @pytest.mark.parametrize(
        ("raw", "formatted"),
        [
            ("astro-ph0001001", "astro-ph/0001001"),
            ("0704.0001", "0704.0001"),
            ("math-ph9901123", "math-ph/9901123"),
        ],
    )
    def test_format_arxiv_id(self, raw, formatted):
        assert format_arxiv_id(raw) == formatted

    def test_format_arxiv_id_invalid(self):
        with pytest.raises(ValueError):
            format_arxiv_id("???")


def make_bulk_tar(members: dict) -> bytes:
    """members: {member_name: raw_bytes} -> outer tar bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in members.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def gz_tex(text: str) -> bytes:
    return gzip.compress(text.encode())


def tar_gz_project(files: dict) -> bytes:
    inner = io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w:gz") as tar:
        for name, text in files.items():
            data = text.encode()
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return inner.getvalue()


class TestArxivSource:
    def test_read_and_extract(self, spark, tmp_path):
        from curator_spark.io import arxiv_extract, read_arxiv_tars

        single = "\\section{One}\nalpha\n"
        proj = {
            "main.tex": "\\newcommand{\\mm}{MAC}\n\\section{Main}\nuse \\mm now\n",
            "style.sty": "ignored",
            "extra.tex": "\\subsection{Extra}\nbeta\n",
        }
        bulk = make_bulk_tar(
            {
                "0001/astro-ph0001001.gz": gz_tex(single),
                "0001/0704.0002.gz": tar_gz_project(proj),
                "0001/broken.gz": b"\x00not gzip or tar\x00",
            }
        )
        (tmp_path / "arXiv_src_0001_001.tar").write_bytes(bulk)
        rows = read_arxiv_tars(spark, str(tmp_path / "*.tar"))
        got = {r.id: r for r in rows.collect()}
        assert set(got) == {"astro-ph/0001001", "0704.0002"}
        assert got["astro-ph/0001001"].source_id == "arXiv_src_0001_001.tar"
        assert list(got["0704.0002"].content) == [proj["main.tex"], proj["extra.tex"]]

        out = {r.id: r.text for r in arxiv_extract(rows).collect()}
        assert out["astro-ph/0001001"] == "\\section{One}\nalpha\n"
        # macro from main.tex expands in both files; join order preserved
        assert out["0704.0002"] == (
            "\\section{Main}\nuse MAC now\n\n\\subsection{Extra}\nbeta\n"
        )

    def test_non_utf8_tex_poisons_project(self, spark, tmp_path):
        from curator_spark.io import read_arxiv_tars

        bulk = make_bulk_tar({"0001/9901123.gz": make_nested_bad()})
        (tmp_path / "bulk.tar").write_bytes(bulk)
        assert read_arxiv_tars(spark, str(tmp_path / "bulk.tar")).count() == 0


def make_nested_bad() -> bytes:
    inner = io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w:gz") as tar:
        data = b"\xff\xfe not utf8"
        info = tarfile.TarInfo(name="bad.tex")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    return inner.getvalue()
