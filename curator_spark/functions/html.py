"""HTML-to-text extraction as Column expressions.

The reference extracts Common Crawl text with external C extractors
(``stages/text/download/html_extractors/{justext,resiliparse,
trafilatura}.py`` — none available in this container). This is the
model-free core those share before their boilerplate heuristics:
drop non-content blocks (script/style/comments/head), turn block-level
closers into newlines, strip tags, decode the common entities, and
normalize whitespace. Boilerplate removal itself is already covered by
the heuristic filter family (stopword density, repetition, length —
justext's signals), which runs downstream on the extracted text.

Everything is ``regexp_replace`` chains — JVM codegen, no UDF — and the
same RE2-compatible patterns replay in DuckDB, so the extraction is
VALUE-checked end to end (``html_extract_docs`` oracle query).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order; (?is) = case-insensitive +
# dot-matches-newline, supported by both Java regex and RE2/DuckDB
_STRIP_BLOCKS = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<head\b[^>]*>.*?</head>", " "),
    (r"(?s)<!--.*?-->", " "),
]
_BLOCK_BREAKS = r"(?i)</(p|div|h[1-6]|li|tr|table|blockquote)>|<br\s*/?>"
_ANY_TAG = r"(?s)<[^>]*>"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # LAST: so &amp;lt; decodes to the literal '&lt;'
]


def html_to_text(col: Column) -> Column:
    """Extract readable text from an HTML column (see module docstring
    for scope; entity decoding covers the named entities the reference
    extractors emit — full numeric-reference decoding would need a UDF
    and is out of scope for parity)."""
    out = col
    for pat, rep in _STRIP_BLOCKS:
        out = F.regexp_replace(out, pat, rep)
    out = F.regexp_replace(out, _BLOCK_BREAKS, "\n")
    out = F.regexp_replace(out, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[ \t\x0b\f\r]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    out = F.regexp_replace(out, r"^\n+|\n+$", "")
    return F.trim(out)


def html_to_text_sql(expr: str) -> str:
    """The DuckDB replay of ``html_to_text`` over SQL expression
    ``expr`` — same patterns, same order (RE2 flags inline)."""
    out = expr
    for pat, rep in _STRIP_BLOCKS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    out = f"regexp_replace({out}, '{_BLOCK_BREAKS}', chr(10), 'g')"
    out = f"regexp_replace({out}, '{_ANY_TAG}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    out = f"regexp_replace({out}, '[ \\t\\x0b\\f\\r]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n{{2,}}', chr(10), 'g')"
    out = f"regexp_replace({out}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({out})"
