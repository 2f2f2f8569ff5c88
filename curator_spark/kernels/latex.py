"""ArXiv LaTeX cleaning kernel (reference
``stages/text/download/arxiv/extract.py:25-207`` ArxivExtractor, itself
derived from the public RedPajama-Data arxiv prep — the reference cites
https://github.com/togethercomputer/RedPajama-Data): strip everything
before the first section-like header and after the bibliography/
appendix, drop comments, and inline-expand user-defined no-argument
macros collected from every tex file of the project. Plus the arxiv-id
formatter from the iterator (``arxiv/iterator.py:99-126``, spec at
https://info.arxiv.org/help/arxiv_identifier.html)."""

from __future__ import annotations

import re

__all__ = ["build_non_arg_macros", "clean_tex", "clean_tex_project", "format_arxiv_id"]

# \newcommand{\name}{value} / \newcommand*{...}{...} and \def\name{value},
# names restricted to [a-zA-Z0-9] (reference extract.py:41-59)
_NEWCOMMAND = re.compile(r"\\\bnewcommand\b\*?\{(\\[a-zA-Z0-9]+?)\}\{(.*?)\}$", re.MULTILINE)
_DEF = re.compile(r"\\def\s*(\\[a-zA-Z0-9]+?)\s*\{(.*?)\}$", re.MULTILINE)

_SECTION_KINDS = (
    "chapter", "part", "section", "subsection", "subsubsection",
    "paragraph", "subparagraph",
)
# everything before the first section-like header dies; the header stays
# (reference extract.py:92-115 — note the reference joins the last two
# alternatives without '|', making subparagraph effectively part of the
# paragraph branch; we keep the evidently-intended alternation)
_FIRST_SECTION = re.compile(
    r"^(.*?)(" + "|".join(
        r"\\\b%s\b\*?(?:\[(?:.*?)\])?\{(?:.*?)\}" % k for k in _SECTION_KINDS
    ) + r")",
    re.DOTALL,
)
_LINE_COMMENT = re.compile(r"(?m)^%.*\n?")
_INLINE_COMMENT = re.compile(r"[^\\]%.+$", re.MULTILINE)
# from \appendix or the bibliography onward, everything dies
_TAIL = re.compile(
    r"(\\appendix|\\begin\{references\}|\\begin\{REFERENCES\}|"
    r"\\begin\{thebibliography\}|\\bibliography\{.*\}).*$",
    re.DOTALL,
)


def build_non_arg_macros(file_content: str) -> dict:
    """{macro_name: value} for every no-argument \\newcommand / \\def in
    the file (reference ``_build_non_arg_macros_dict``). Names/values are
    unicode-escaped exactly like the reference so they can feed re.sub."""
    macros = {}
    for reg in (_NEWCOMMAND, _DEF):
        for m in reg.finditer(file_content):
            name = m.group(1).encode("unicode-escape").decode("utf-8")
            macros[name] = m.group(2).encode("unicode-escape").decode("utf-8")
    return macros


def clean_tex(file_content: str, non_arg_macros: dict) -> str:
    """One tex file -> cleaned text (reference ``_clean_tex_file``):
    empty string when no section-like header exists; otherwise the
    content from the first header on, comments removed, bibliography/
    appendix tail removed, no-arg macros inline-expanded (argumented
    macros are an open TODO in the reference too)."""
    if not _FIRST_SECTION.search(file_content):
        return ""
    out = _FIRST_SECTION.sub(r"\2", file_content, count=1)
    out = _LINE_COMMENT.sub("", out)
    out = _INLINE_COMMENT.sub("", out)
    out = _TAIL.sub("", out)
    for name, value in non_arg_macros.items():
        out = re.sub(r"(" + name + r")([^a-zA-Z0-9])", value + r"\2", out)
    return out


def clean_tex_project(tex_files: list) -> str | None:
    """Whole-project cleaning (reference ``ArxivExtractor.extract``):
    macros collected across ALL files expand in every file; cleaned
    files join with newlines; empty result -> None (dropped row)."""
    if not tex_files:
        return None
    macros: dict = {}
    for content in tex_files:
        macros.update(build_non_arg_macros(content))
    try:
        joined = "\n".join(clean_tex(c, macros) for c in tex_files)
    except Exception:  # noqa: BLE001 - reference: extraction failure -> None
        return None
    return joined if joined else None


_ARXIV_ID = re.compile(r"^([a-zA-Z-]*)([\d\.]+)$")


def format_arxiv_id(arxiv_id: str) -> str:
    """Raw dump member stem -> spec-compliant arxiv id
    (``<archive>/YYMMNNN`` pre-2007, bare ``YYMM.NNNNN`` after)."""
    m = _ARXIV_ID.search(arxiv_id)
    if m is None:
        raise ValueError(f"Invalid arxiv id: {arxiv_id}")
    return m.group(2) if m.group(1) == "" else f"{m.group(1)}/{m.group(2)}"
