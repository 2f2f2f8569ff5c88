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
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # LAST: so &amp;lt; decodes to the literal '&lt;'
    ("&#38;", "&"),  # ampersand REFS decode last too (single-pass
    ("&#x26;", "&"),  # semantics: '&#38;lt;' -> literal '&lt;', like
    ("&#X26;", "&"),  # html.unescape) — excluded from the generic pass
]

# Common numeric character references ABOVE the Latin-1 range (Spark's
# chr() is mod-256, so >255 code points need a literal map): typographic
# quotes/dashes/ellipsis + currency/mark + zero-width junk. Decimal and
# lowercase-hex spellings; anything else >255 is left intact for the
# full-parity Arrow-UDF seam (functions.modifiers.decode_html_entities).
_HIGH_REFS = {
    8211: "–", 8212: "—", 8216: "‘", 8217: "’",
    8220: "“", 8221: "”", 8226: "•", 8230: "…",
    8364: "€", 8482: "™", 8203: "", 65279: "",
}
_HIGH_REF_PAIRS = [
    pair
    for code, ch in _HIGH_REFS.items()
    for pair in ((f"&#{code};", ch), (f"&#x{code:x};", ch))
]

_DEC_REF = r"^([0-9]{1,7});"
_HEX_REF = r"^[xX]([0-9a-fA-F]{1,6});"


def _decode_numeric_refs(out: Column) -> Column:
    """Generic ``&#NNN;`` / ``&#xHH;`` decoding for code points <= 255
    (Latin-1 — the accent/punctuation bulk of real Common Crawl numeric
    references), entirely JVM-side: split on '&#', decode each tail's
    leading reference with chr(), stitch back with array_join. Code 38
    (ampersand) is deliberately left for the LAST replace so chained
    references keep single-pass html.unescape semantics. Unknown /
    malformed / >255 references pass through untouched."""
    parts = F.split(out, "&#")
    head = F.element_at(parts, 1)
    tails = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def dec(p: Column) -> Column:
        d = F.regexp_extract(p, _DEC_REF, 1)
        h = F.regexp_extract(p, _HEX_REF, 1)
        code_d = d.try_cast("long")
        code_h = F.conv(h, 16, 10).try_cast("long")
        rest_d = p.substr(F.length(d) + F.lit(2), F.length(p))
        rest_h = p.substr(F.length(h) + F.lit(3), F.length(p))
        return (
            F.when(
                (d != "") & code_d.between(1, 255) & (code_d != 38),
                F.concat(F.char(code_d), rest_d),
            )
            .when(
                (h != "") & code_h.between(1, 255) & (code_h != 38),
                F.concat(F.char(code_h), rest_h),
            )
            .otherwise(F.concat(F.lit("&#"), p))
        )

    decoded = F.concat(head, F.array_join(F.transform(tails, dec), ""))
    # gate: skip the array machinery when the text has no reference
    return F.when(F.instr(out, "&#") > 0, decoded).otherwise(out)


def html_to_text(col: Column) -> Column:
    """Extract readable text from an HTML column (see module docstring
    for scope). Entity decoding: the common named set, ALL numeric
    references <= U+00FF (generic chr() pass), and a literal map for the
    frequent typographic >255 ones; full html.unescape parity lives in
    the Arrow-UDF seam ``functions.modifiers.decode_html_entities``."""
    out = col
    for pat, rep in _STRIP_BLOCKS:
        out = F.regexp_replace(out, pat, rep)
    out = F.regexp_replace(out, _BLOCK_BREAKS, "\n")
    out = F.regexp_replace(out, _ANY_TAG, " ")
    # every numeric-reference pattern contains '&#', so the whole
    # typographic map + generic chr() pass is gated per row behind one
    # instr() — reference-free documents (the overwhelming majority of
    # real pages' bytes) skip ~26 string passes; codegen CSE keeps the
    # gated branch from re-evaluating the stripped text
    refs = out
    for ent, rep in _HIGH_REF_PAIRS:
        refs = F.replace(refs, F.lit(ent), F.lit(rep))
    refs = _decode_numeric_refs(refs)
    out = F.when(F.instr(out, "&#") > 0, refs).otherwise(out)
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    # numeric refs decode to a real NBSP (U+00A0) - fold it with spaces
    out = F.regexp_replace(out, "[ \t\x0b\f\r\u00a0]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    out = F.regexp_replace(out, r"^\n+|\n+$", "")
    return F.trim(out)


def _decode_numeric_refs_sql(expr: str) -> str:
    """DuckDB replay of :func:`_decode_numeric_refs` — same split /
    per-tail decode / stitch, gated to <= 255 with code 38 excluded so
    both engines agree byte for byte (DuckDB's chr() is full-Unicode;
    the cap keeps it on Spark's chr() domain)."""
    dec = (
        "CASE "
        f"WHEN regexp_extract(p, '{_DEC_REF}', 1) <> '' "
        f"AND TRY_CAST(regexp_extract(p, '{_DEC_REF}', 1) AS BIGINT) BETWEEN 1 AND 255 "
        f"AND TRY_CAST(regexp_extract(p, '{_DEC_REF}', 1) AS BIGINT) <> 38 "
        f"THEN chr(CAST(regexp_extract(p, '{_DEC_REF}', 1) AS INT)) || "
        f"substr(p, length(regexp_extract(p, '{_DEC_REF}', 1)) + 2) "
        f"WHEN regexp_extract(p, '{_HEX_REF}', 1) <> '' "
        f"AND TRY_CAST('0x' || regexp_extract(p, '{_HEX_REF}', 1) AS BIGINT) BETWEEN 1 AND 255 "
        f"AND TRY_CAST('0x' || regexp_extract(p, '{_HEX_REF}', 1) AS BIGINT) <> 38 "
        f"THEN chr(CAST(('0x' || regexp_extract(p, '{_HEX_REF}', 1)) AS INT)) || "
        f"substr(p, length(regexp_extract(p, '{_HEX_REF}', 1)) + 3) "
        "ELSE '&#' || p END"
    )
    split = f"string_split({expr}, '&#')"
    decoded = (
        f"(({split})[1] || array_to_string("
        f"list_transform(({split})[2:], p -> {dec}), ''))"
    )
    return f"(CASE WHEN instr({expr}, '&#') > 0 THEN {decoded} ELSE {expr} END)"


def html_to_text_sql(expr: str) -> str:
    """The DuckDB replay of ``html_to_text`` over SQL expression
    ``expr`` — same patterns, same order (RE2 flags inline)."""
    out = expr
    for pat, rep in _STRIP_BLOCKS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    out = f"regexp_replace({out}, '{_BLOCK_BREAKS}', chr(10), 'g')"
    out = f"regexp_replace({out}, '{_ANY_TAG}', ' ', 'g')"
    for ent, rep in _HIGH_REF_PAIRS:
        lit = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    out = _decode_numeric_refs_sql(out)
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    out = f"regexp_replace({out}, '[ \\t\\x0b\\f\\r\\x{{00a0}}]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n{{2,}}', chr(10), 'g')"
    out = f"regexp_replace({out}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({out})"
