"""Wikitext-to-text extraction as Column expressions.

The reference extracts Wikipedia dumps with mwparserfromhell
(``stages/text/download/wikipedia/extract.py:567-716`` WikipediaExtractor:
drop media wikilinks, strip category prefixes but keep the text, remove
``ref``/``table`` tags, strip markup, drop ``__MAGIC__`` words) — a C
parser absent in this container. This is the model-free core of that
extraction as ``regexp_replace`` chains (JVM codegen, no UDF) with an
identical RE2-compatible DuckDB replay (``wikitext_to_text_sql``), the
same split the repo makes for HTML (``functions/html.py`` vs the
reference's justext/trafilatura).

Approximation boundary (documented, like energy-VAD vs Silero): brace
constructs (templates ``{{...}}``, tables ``{|...|}``) and media links
nest; regex removes them innermost-out with a FIXED unrolled depth
(defaults: 4 interleaved template+table rounds, media links 3 — beyond
that depth residue survives). A user with mwparserfromhell drops it into
``functions.modifiers.string_map_modifier`` for full parser parity.
Language-specific media/category alias tables (the reference embeds
~540 lines of them) are parameters here — pass the aliases for your
language; defaults cover English plus the universal File/Image/Media
and Category prefixes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["wikitext_to_text", "wikitext_to_text_sql"]

TEMPLATE_DEPTH = 4  # template+table rounds (interleaved — see _steps)
MEDIA_DEPTH = 3
_LINK_DEPTH = 2

_COMMENT = r"(?s)<!--.*?-->"
# self-closing alternative uses [^>]* (NOT [^>/]*): a '/' inside an
# attribute value (<ref name="2009/10 season"/>) must not push the match
# into the paired alternative, which would lazily eat article text up to
# the next </ref>
_REF = r"(?is)<ref\b[^>]*/>|<ref\b[^>]*>.*?</ref>"
_TEMPLATE = r"(?s)\{\{[^{}]*\}\}"  # innermost only; unrolled per depth
_TABLE = r"(?s)\{\|[^{}]*\|\}"
_MAGIC = r"__[A-Z]*__"
_HEADING = r"(?m)^=+ *([^=\n]*?) *=+ *$"
_ANY_TAG = r"(?s)<[^>]*>"


def _media_link(prefixes: str) -> str:
    return r"(?is)\[\[(?:" + prefixes + r"):[^\[\]]*\]\]"


def _category_link(prefixes: str) -> str:
    # keep the page name, drop the prefix and any sort key — the
    # reference's clean_wikilink (extract.py:608-611)
    return r"(?is)\[\[(?:" + prefixes + r"):([^\[\]|]*)(?:\|[^\[\]]*)?\]\]"


_LABELED_LINK = r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]"
_PLAIN_LINK = r"\[\[([^\[\]]*)\]\]"
_EXT_LABELED = r"\[(?:https?|ftp)://[^ \]]* +([^\]]*)\]"
_EXT_BARE = r"\[(?:https?|ftp)://[^\]]*\]"


def _steps(media_prefixes: str, cat_prefixes: str):
    """(pattern, spark_repl, duck_repl, repeats) in application order.

    The four bracket-link rules repeat TOGETHER ``MEDIA_DEPTH`` times,
    media/category first in each round: a media link whose caption
    nests another link only becomes innermost after the nested link
    resolves, and the media rule must win the innermost match before
    the generic labeled rule would rewrite it to its caption."""
    link_round = [
        (_media_link(media_prefixes), " ", " "),
        (_category_link(cat_prefixes), "$1", r"\1"),
        (_LABELED_LINK, "$1", r"\1"),
        (_PLAIN_LINK, "$1", r"\1"),
    ]
    return (
        [
            (_COMMENT, " ", " "),
            (_REF, " ", " "),
        ]
        # templates and tables INTERLEAVED per round: a table nested in a
        # template (or vice versa) only becomes innermost-matchable after
        # the other construct's pass removes it, so running all template
        # passes before any table pass leaves the enclosing braces as
        # permanent residue even at nesting depth 1
        + [(_TEMPLATE, " ", " "), (_TABLE, " ", " ")] * TEMPLATE_DEPTH
        + [(_MAGIC, "", "")]
        + link_round * MEDIA_DEPTH
        + [
            (_EXT_LABELED, "$1", r"\1"),
            (_EXT_BARE, " ", " "),
            (_HEADING, "$1", r"\1"),
            (_ANY_TAG, " ", " "),
        ]
    )


_QUOTES = ["'''''", "'''", "''"]  # longest first


def wikitext_to_text(
    col,
    media_prefixes: str = "File|Image|Media",
    cat_prefixes: str = "Category",
) -> Column:
    """Wikitext Column -> plain text (see module docstring). Alias
    tables ride in as extra ``|``-joined prefixes."""
    out = col if isinstance(col, Column) else F.col(col)
    for pat, rep, _drep in _steps(media_prefixes, cat_prefixes):
        out = F.regexp_replace(out, pat, rep)
    for q in _QUOTES:
        out = F.replace(out, F.lit(q), F.lit(""))
    out = F.regexp_replace(out, r"[ \t\x0b\f\r]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n{3,}", "\n\n")
    return F.trim(out)


def wikitext_to_text_sql(
    expr: str,
    media_prefixes: str = "File|Image|Media",
    cat_prefixes: str = "Category",
) -> str:
    """The DuckDB replay of ``wikitext_to_text`` over SQL expression
    ``expr`` — same patterns, same order, same unrolled depths (RE2
    rewrite syntax ``\\1`` instead of Java's ``$1``)."""
    out = expr
    for pat, _rep, drep in _steps(media_prefixes, cat_prefixes):
        lit = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{lit}', '{drep}', 'g')"
    for q in _QUOTES:
        qq = q.replace("'", "''")
        out = f"replace({out}, '{qq}', '')"
    out = f"regexp_replace({out}, '[ \\t\\x0b\\f\\r]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"trim({out})"
