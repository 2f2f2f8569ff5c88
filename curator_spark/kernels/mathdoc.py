"""Math-pipeline content extraction core (model-free pieces of the
reference ``stages/math/download/extract.py`` MathContentExtractor):
bytes -> text decode, Jupyter-notebook detection + cell extraction,
full-HTML-document detection, and the mime/magic/url type routing.

What stays external in the reference and becomes an injectable seam in
the operator (``operators/mathdoc.py``): libmagic content sniffing
(``magic.Magic(mime=True)``, extract.py:137-144), resiliparse encoding
detection (extract.py:39-52), and the Lynx HTML renderer
(``html_extractors/lynx.py``) whose in-engine replacement is the
``functions/html.py`` Column chain.

The four MIME routing tables are the reference's published constants
(``stages/math/download/mime_types.py:16-110``) — routing parity is
only possible with the same tables.
"""

from __future__ import annotations

import json
import re

__all__ = [
    "TEXT_MIME_TYPES",
    "HTML_MIME_TYPES",
    "TEXT_MAGIC_TYPES",
    "HTML_MAGIC_TYPES",
    "decode_content",
    "is_notebook",
    "notebook_to_text",
    "is_html_document",
    "determine_doc_type",
]

# header MIME types that indicate text content (mime_types.py:16-54)
TEXT_MIME_TYPES = frozenset({
    "text/x-web-markdown", "text/x-verilog", "text/x-rst", "text/x-ruby",
    "text/x-rsrc", "text/x-python", "text/x-perl", "text/x-pascal",
    "text/x-objcsrc", "text/x-ml", "text/x-matlab", "text/x-log",
    "text/x-haskell", "text/x-fortran", "text/x-expect", "text/x-diff",
    "text/x-csrc", "text/x-common-lisp", "text/x-chdr", "text/x-cgi",
    "text/x-c++src", "text/x-basic", "text/vtt", "text/x-assembly",
    "text/troff", "text/plain", "message/rfc822", "message/news",
    "application/mathematica", "application/mbox", "application/postscript",
    "application/x-elc", "application/x-matlab-data", "application/x-sas",
    "application/x-sh", "application/x-subrip", "application/x-tex",
    "application/x-tika-msoffice",
})

# header MIME types that indicate HTML content (mime_types.py:57-71)
HTML_MIME_TYPES = frozenset({
    "text/x-php", "text/x-jsp", "text/x-coldfusion", "text/html",
    "message/x-emlx", "text/asp", "image/svg+xml", "application/xml",
    "application/atom+xml", "application/rdf+xml", "application/rss+xml",
    "application/x-bibtex-text-file", "application/xhtml+xml",
})

# libmagic MIME types that indicate text content (mime_types.py:74-88)
TEXT_MAGIC_TYPES = frozenset({
    "text/x-shellscript", "text/x-perl", "text/x-lisp", "text/x-java",
    "text/x-fortran", "text/x-diff", "application/postscript",
    "application/x-matlab-data", "message/news", "message/rfc822",
    "text/plain", "text/texmacs", "text/x-Algol68",
})

# libmagic MIME types that indicate HTML content (mime_types.py:91-110)
HTML_MAGIC_TYPES = frozenset({
    "text/xml", "text/x-tex", "text/x-php", "text/x-ruby",
    "text/x-script.python", "text/x-objective-c", "text/x-forth",
    "text/x-c", "text/x-c++", "text/csv", "text/html",
    "application/octet-stream", "application/x-appleworks3",
    "application/x-bytecode.python", "application/x-setupscript",
    "application/x-wine-extension-ini", "image/svg+xml",
})

_XML_DECL = re.compile(r"^\s*<\?xml.*\?>")


def decode_content(raw: bytes | None, encoding_detector=None) -> str | None:
    """Bytes -> text with the reference's decode contract
    (extract.py:39-52 ``_decode_bytes``): utf-8 first; on failure fall
    back to a detected encoding, giving up (None) when detection is
    absent, detects utf-8 again, or the re-decode fails; the XML
    encoding declaration is stripped from whatever survives
    (extract.py:35-36). ``encoding_detector(bytes) -> str | None`` is
    the injectable seam for the reference's resiliparse detector —
    without one, non-utf-8 bytes are honestly dropped rather than
    silently mis-decoded."""
    if raw is None:
        return None
    try:
        content = bytes(raw).decode("utf-8")
    except (UnicodeDecodeError, ValueError):
        if encoding_detector is None:
            return None
        try:
            encoding = encoding_detector(bytes(raw))
        except Exception:  # noqa: BLE001 - detector failure == no detection
            return None
        if encoding is None or encoding == "utf-8":
            return None
        try:
            content = bytes(raw).decode(encoding)
        except (UnicodeDecodeError, LookupError, ValueError):
            return None
    return _XML_DECL.sub("", content)


def is_notebook(content: str) -> bool:
    """Jupyter-notebook JSON shape check (extract.py:55-66)."""
    try:
        data = json.loads(content)
    except (json.JSONDecodeError, TypeError, ValueError):
        return False
    return (
        isinstance(data, dict)
        and "nbformat" in data
        and "nbformat_minor" in data
        and "cells" in data
        and isinstance(data["cells"], list)
    )


def notebook_to_text(content: str) -> str:
    """Flatten notebook cells to text (extract.py:69-86): code/markdown/
    raw sources, plus code outputs of type stream / execute_result /
    display_data (text/plain payload) / text."""
    data = json.loads(content)
    out = ""
    for cell in data.get("cells", []):
        t = cell.get("cell_type")
        if t in ("code", "markdown", "raw"):
            out += "".join(cell.get("source", []))
        if t == "code" and "outputs" in cell:
            for o in cell["outputs"]:
                if o.get("output_type") == "stream":
                    out += "".join(o.get("text", []))
                elif o.get("output_type") in ("execute_result", "display_data"):
                    d = o.get("data", {})
                    if "text/plain" in d:
                        out += "".join(d["text/plain"])
                elif o.get("output_type") == "text":
                    out += "".join(o.get("text", []))
    return out


def is_html_document(text: str) -> bool:
    """Full-document probe (extract.py:179-186): requires open AND close
    of html, head, and body."""
    return all(
        re.search(p, text, re.IGNORECASE)
        for p in (
            r"<html[^>]*>", r"</html\s*>",
            r"<head[^>]*>", r"</head\s*>",
            r"<body[^>]*>", r"</body\s*>",
        )
    )


def determine_doc_type(
    content: str | None,
    magic_mime_type: str | None,
    mime_type: str | None,
    url: str | None,
) -> str:
    """Type routing (extract.py:188-226 ``_determine_type`` +
    ``_is_notebook_type``): notebook takes precedence (magic says JSON
    or the URL ends in .ipynb, AND the JSON has the notebook shape);
    then header/magic MIME tables with 'html' as the terminal fallback.
    NOTE: the reference consults ``_is_html_document(content)`` in the
    no-magic branch, but that branch is routing-inert there too (both
    the probe's elif and the else yield 'html' — extract.py:200-203), so
    this function omits the probe on purpose; :func:`is_html_document`
    is kept as the exported parity replica of the probe itself."""
    if not content:
        return "text"
    if (
        (magic_mime_type == "application/json" or (url and url.endswith(".ipynb")))
        and is_notebook(content)
    ):
        return "notebook"
    if magic_mime_type is None:
        if mime_type in TEXT_MIME_TYPES:
            return "text"
        return "html"  # html mime or the fallback (probe is routing-inert)
    if magic_mime_type in HTML_MAGIC_TYPES or (mime_type and mime_type in HTML_MIME_TYPES):
        return "html"
    if mime_type in TEXT_MIME_TYPES or magic_mime_type in TEXT_MAGIC_TYPES:
        return "text"
    return "html"
