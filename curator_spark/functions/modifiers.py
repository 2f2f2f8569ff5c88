"""DocumentModifier family, Spark-first.

The reference ships eight model-free text modifiers
(stages/text/modifiers/string/*.py + unicode/unicode_reformatter.py) that
mutate the text column in place: NewlineNormalizer, UrlRemover,
MarkdownRemover, QuotationRemover, LineRemover, Slicer,
BoilerPlateStringModifier (C4-style), and UnicodeReformatter (ftfy).

Spark-first shape: every modifier except the unicode fixer is a pure
Column expression (JVM-side, whole-stage codegen, zero Python in the hot
path — at 100 TB these fuse into the scan stage with no shuffle). The
BoilerPlate modifier, a per-paragraph loop in the reference
(string/c4.py:50-105), compiles here to array higher-order functions
(split → transform → filter → array_join), still fully JVM. Only the
ftfy-backed UnicodeReformatter needs per-string Python (mojibake repair
is not expressible in SQL); it runs as an Arrow-batched pandas UDF, with
``ftfy`` used when importable and a documented pure-Python subset
otherwise (this sandbox has no ftfy).

Reference parity notes are cited per function as file:line of
/root/reference/nemo_curator.
"""

from __future__ import annotations

import html
import re
import sys
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "POLICY_SUBSTRINGS",
    "apply_modifiers",
    "chinese_convert",
    "decode_html_entities",
    "fasttext_label",
    "inverse_text_normalize",
    "normalize_newlines",
    "remove_boilerplate",
    "remove_lines",
    "remove_markdown",
    "remove_quotation",
    "remove_urls",
    "slice_text",
    "string_map_modifier",
    "unicode_reformat",
]


def apply_modifiers(df: DataFrame, field: str, *modifiers) -> DataFrame:
    """The reference's Modify stage (modifiers/doc_modifier.py): apply each
    modifier to the text field in order, in place. Each modifier is a
    Column -> Column callable, so the whole chain stays one projection."""
    col = F.col(field)
    for m in modifiers:
        col = m(col)
    return df.withColumn(field, col)


# ---------------------------------------------------------------------------
# NewlineNormalizer — string/newline_normalizer.py:23-35
# ---------------------------------------------------------------------------


def normalize_newlines(text: Column) -> Column:
    """3+ consecutive newlines -> exactly 2 (Unix first, then Windows —
    the reference's substitution order, newline_normalizer.py:33-34)."""
    out = F.regexp_replace(text, r"(\n){3,}", "\n\n")
    return F.regexp_replace(out, r"(\r\n){3,}", "\r\n\r\n")


def fasttext_label(text: Column, label: str) -> Column:
    """FastTextLabelModifier (modifiers/fasttext/fasttext_label.py:18-26):
    flatten newlines, neutralize literal ``__label__`` markers, prepend
    the training label — the fastText-training-corpus prep step. Pure
    Column exprs, zero UDF."""
    cleaned = F.replace(
        F.replace(text, F.lit("\n"), F.lit(" ")), F.lit("__label__"), F.lit(" ")
    )
    return F.concat(F.lit(label + " "), cleaned)


# ---------------------------------------------------------------------------
# UrlRemover — string/url_remover.py:20-31
# ---------------------------------------------------------------------------


def remove_urls(text: Column) -> Column:
    """Strip http(s)/www URLs (case-insensitive, same pattern as
    url_remover.py:20)."""
    return F.regexp_replace(text, r"(?i)https?://\S+|(?i)www\.\S+", "")


# ---------------------------------------------------------------------------
# MarkdownRemover — string/markdown_remover.py:20-44
# ---------------------------------------------------------------------------


def remove_markdown(text: Column) -> Column:
    """Unwrap **bold**, *italic*, _underline_, [text](url) -> url, in the
    reference's order (markdown_remover.py:38-41). The reference applies
    the regexes per line; `.` matches no newline in Java regex either, so
    one whole-document pass is equivalent."""
    out = F.regexp_replace(text, r"\*\*(.*?)\*\*", "$1")
    out = F.regexp_replace(out, r"\*(.*?)\*", "$1")
    out = F.regexp_replace(out, r"_(.*?)_", "$1")
    return F.regexp_replace(out, r"\[.*?\]\((.*?)\)", "$1")


# ---------------------------------------------------------------------------
# QuotationRemover — string/quotation_remover.py:20-38
# ---------------------------------------------------------------------------


def remove_quotation(text: Column) -> Column:
    """Strip a document-wrapping pair of straight quotes: only when
    len(trim) > 2, the raw text starts AND ends with '"', and either the
    trimmed text is single-line or the first line does not itself end
    with '"' (quotation_remover.py:34-37)."""
    trimmed = F.trim(text)
    first_line = F.element_at(F.split(text, "\n", -1), 1)
    wrapped = (
        (F.length(trimmed) > 2)
        & (F.substring(text, 1, 1) == '"')
        & (text.endswith('"'))
    )
    inner_ok = (~trimmed.contains("\n")) | (~first_line.endswith('"'))
    inner = F.substr(text, F.lit(2), F.length(text) - 2)
    return F.when(wrapped & inner_ok, inner).otherwise(text)


# ---------------------------------------------------------------------------
# LineRemover — string/line_remover.py:19-35
# ---------------------------------------------------------------------------


def remove_lines(text: Column, patterns: list[str]) -> Column:
    """Drop every line whose ENTIRE content equals one of ``patterns``
    (exact match, not substring — line_remover.py:33)."""
    pats = F.array(*[F.lit(p) for p in patterns])
    lines = F.split(text, "\n", -1)
    return F.array_join(F.filter(lines, lambda ln: ~F.array_contains(pats, ln)), "\n")


# ---------------------------------------------------------------------------
# Slicer — string/slicer.py:20-90
# ---------------------------------------------------------------------------


def slice_text(
    text: Column,
    left: int | str | None = 0,
    right: int | str | None = None,
    include_left: bool = True,
    include_right: bool = True,
    strip: bool = True,
) -> Column:
    """Slice by index or by substring occurrence (slicer.py:62-89):
    int left/right are Python-slice indices (negatives count from the
    end); str left slices from its FIRST occurrence, str right to its
    LAST occurrence, include_* controlling whether the marker itself is
    kept. A missing marker yields the empty string."""
    n = F.length(text)

    def _py_index(v: int) -> Column:
        # Python slice semantics: negative counts from the end, clamped at 0
        iv = F.lit(v)
        return F.greatest(n + iv, F.lit(0)) if v < 0 else iv

    missing = F.lit(False)
    if isinstance(left, int):
        left_idx = _py_index(left)
    elif isinstance(left, str):
        pos = F.locate(left, text)  # 1-based, 0 when absent
        missing = missing | (pos == 0)
        left_idx = (pos - 1) if include_left else (pos - 1 + len(left))
    else:
        left_idx = F.lit(0)

    if isinstance(right, int):
        right_idx = _py_index(right)
    elif isinstance(right, str):
        # last occurrence: locate the reversed needle in the reversed text
        rpos = F.locate(right[::-1], F.reverse(text))
        missing = missing | (rpos == 0)
        last0 = n - rpos - len(right) + 1  # 0-based index of last occurrence
        right_idx = (last0 + len(right)) if include_right else last0
    else:
        right_idx = n

    # substring(pos, len) ignores len<=0 -> "" — matches Python's empty
    # slice when left >= right
    sliced = F.substring(text, left_idx + 1, F.greatest(right_idx - left_idx, F.lit(0)))
    out = F.when(missing, F.lit("")).otherwise(sliced)
    # str.strip() parity: F.trim removes only ASCII spaces, but the
    # reference Slicer strips ALL whitespace (newlines/tabs included)
    return F.regexp_replace(out, r"^\s+|\s+$", "") if strip else out


# ---------------------------------------------------------------------------
# BoilerPlateStringModifier — string/c4.py:30-105 (Google C4 policy rule)
# ---------------------------------------------------------------------------

# utils/constants.py:21-54 — the C4 policy/cookie boilerplate markers.
# Long multi-sentence entries reproduced verbatim: they are the published
# C4 heuristic's match strings; shortening them would change semantics.
POLICY_SUBSTRINGS: tuple[str, ...] = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "privacy overview",
    "use of cookies",
    "use cookies",
    "privacy & cookies policy",
    "privacy and cookies policy",
    (
        "this website uses cookies to improve your experience while you "
        "navigate through the website. out of these cookies, the cookies "
        "that are categorized as necessary are stored on your browser as they "
        "are essential for the working of basic functionalities of the website. "
        "we also use third-party cookies that help us analyze and understand how "
        "you use this website. these cookies will be stored in your browser only "
        "with your consent. you also have the option to opt-out of these "
        "cookies. but opting out of some of these cookies may have an effect "
        "on your browsing experience."
    ),
    (
        "necessary cookies are absolutely essential for the website to "
        "function properly. this category only includes cookies that "
        "ensures basic functionalities and security features of the website. "
        "these cookies do not store any personal information."
    ),
    (
        "any cookies that may not be particularly necessary for the website "
        "to function and is used specifically to collect user personal data "
        "via analytics, ads, other embedded contents are termed as non-necessary "
        "cookies. it is mandatory to procure user consent prior to running these "
        "cookies on your website."
    ),
    (
        "this site uses cookies, including for analytics, personalization, and "
        "advertising purposes. for more information or to change your "
        "cookie settings, click here."
    ),
    (
        "if you continue to browse this site without changing your cookie "
        "settings, you agree to this use. acceptread more"
    ),
)


def _is_boilerplate(par: Column) -> Column:
    low = F.lower(par)
    cond = F.lit(False)
    for s in POLICY_SUBSTRINGS:
        cond = cond | low.contains(s)
    return cond


def remove_boilerplate(text: Column, remove_if_at_top_or_bottom: bool = True) -> Column:
    """C4 boilerplate rule (c4.py:50-105): any paragraph containing
    "lorem ipsum" kills the whole document. Paragraphs containing a
    policy/cookie marker are dropped when they sit in one contiguous run
    touching the top or bottom; a MID-document marker run leaves the text
    UNCHANGED (the reference returns the document as-is there — it does
    not kill it; with ``remove_if_at_top_or_bottom=False`` any marker
    empties the document). Entirely array higher-order functions — the
    reference's Python paragraph loop compiles to one JVM projection."""
    paras = F.split(text, r"\n\n", -1)
    npar = F.size(paras)
    has_lorem = F.exists(paras, lambda p: F.lower(p).contains("lorem ipsum"))
    flags = F.transform(paras, _is_boilerplate)
    # 0-based indices of flagged paragraphs, ascending (transform preserves order)
    idx = F.filter(
        F.transform(flags, lambda f, i: F.when(f, i).otherwise(F.lit(-1))),
        lambda x: x >= 0,
    )
    nbp = F.size(idx)
    first, last = F.element_at(idx, 1), F.element_at(idx, -1)
    contiguous = (last - first) == (nbp - 1)
    top_bottom_only = (nbp < npar) & contiguous & ((first == 0) | (last == npar - 1))
    kept = F.array_join(F.filter(paras, lambda p: ~_is_boilerplate(p)), "\n\n")

    out = F.when(has_lorem, F.lit(""))
    if not remove_if_at_top_or_bottom:
        return out.when(nbp > 0, F.lit("")).otherwise(text)
    return out.when(nbp == 0, text).when(top_bottom_only, kept).otherwise(text)


# ---------------------------------------------------------------------------
# UnicodeReformatter — unicode/unicode_reformatter.py:23-120 (ftfy-backed)
# ---------------------------------------------------------------------------

_ANSI_ESCAPE_RE = re.compile(r"(?:\x1B@|\x1B\[[\x30-\x3F]*[\x20-\x2F]*[\x40-\x7E])")
_MOJIBAKE_MARKER_RE = re.compile(
    # UTF-8 bytes mis-decoded as cp1252/latin-1 leave Ã/Â/â followed by a
    # continuation-range char, or the distinctive â€ punctuation prefix
    "[ÂÃ][-¿€‘’“”†‡…"
    "ˆ‰ŒŽ‹]|â€|ï»¿|�"
)
_LIGATURES = str.maketrans(
    {"ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl", "ﬃ": "ffi", "ﬄ": "ffl", "ﬅ": "st", "ﬆ": "st", "Ĳ": "IJ", "ĳ": "ij"}
)
_CURLY_QUOTES = str.maketrans(
    {"‘": "'", "’": "'", "‚": "'", "‛": "'", "“": '"', "”": '"', "„": '"', "‟": '"'}
)
_LINE_BREAKS = {"\r\n": "\n", "\r": "\n", "\x85": "\n", " ": "\n", " ": "\n"}
# C0 controls that have no display effect (keep \t \n \r), plus the
# Latin-1 padding char; mirrors ftfy's remove_control_chars set in spirit
_CONTROL_CHARS = str.maketrans(
    {c: None for c in map(chr, range(0x00, 0x20)) if c not in "\t\n\r"} | {chr(0x7F): None}
)


def _badness(s: str) -> int:
    return len(_MOJIBAKE_MARKER_RE.findall(s))


def _encode_sloppy_cp1252(s: str) -> bytes:
    """cp1252 encode where the five undefined code points (0x81 0x8D 0x8F
    0x90 0x9D) pass through as their own byte — mojibake text routinely
    contains them because the original decode mapped those bytes to C1
    controls (ftfy's public "sloppy-windows-1252" notion)."""
    out = bytearray()
    for c in s:
        try:
            out += c.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(c)
            if o < 0x100:
                out.append(o)
            else:
                raise
    return bytes(out)


def _fix_mojibake(s: str) -> str:
    """Common-case mojibake repair: if the text contains telltale
    UTF-8-decoded-as-cp1252/latin-1 sequences, try re-encoding through
    those codecs and keep the result iff it strictly reduces the marker
    count. This covers the dominant single-pass mojibake class
    ('Ã©'->'é', 'â€™'->'’'); ftfy's full multi-encoding search is used
    instead when importable."""
    if not _badness(s):
        return s
    best = s
    for enc in ("sloppy-cp1252", "latin-1"):
        try:
            raw = _encode_sloppy_cp1252(s) if enc == "sloppy-cp1252" else s.encode(enc)
            cand = raw.decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        if _badness(cand) < _badness(best):
            best = cand
    return best


def _fix_c1_controls(s: str) -> str:
    if not any("\x80" <= c <= "\x9f" for c in s):
        return s
    out = []
    for c in s:
        if "\x80" <= c <= "\x9f":
            try:
                c = bytes([ord(c)]).decode("cp1252")
            except UnicodeDecodeError:
                pass  # the five cp1252 holes stay as-is
        out.append(c)
    return "".join(out)


def _fix_surrogates(s: str) -> str:
    if not any("\ud800" <= c <= "\udfff" for c in s):
        return s
    return s.encode("utf-16", "surrogatepass").decode("utf-16", "replace")


def _fix_width(s: str) -> str:
    # fullwidth Latin + halfwidth Katakana only (ftfy's fix_character_width
    # scope) — NOT blanket NFKC, which would also rewrite e.g. "10³"
    return "".join(
        unicodedata.normalize("NFKC", c) if ("！" <= c <= "￮") else c for c in s
    )


def fix_text_basic(
    s: str,
    unescape_html: str | bool = "auto",
    remove_terminal_escapes: bool = True,
    fix_encoding: bool = True,
    fix_c1_controls: bool = True,
    fix_latin_ligatures: bool = False,
    fix_character_width: bool = False,
    uncurl_quotes: bool = False,
    fix_line_breaks: bool = False,
    fix_surrogates: bool = True,
    remove_control_chars: bool = True,
    normalization: str | None = None,
) -> str:
    """Pure-Python subset of ftfy.fix_text with the reference's flag
    surface (unicode_reformatter.py:24-120, same defaults). Steps follow
    ftfy's documented fixer order. The mojibake step handles the dominant
    single-encoding class only (see _fix_mojibake)."""
    if s is None:
        return s
    if unescape_html is True or (unescape_html == "auto" and "<" not in s):
        if "&" in s:
            s = html.unescape(s)
    if remove_terminal_escapes and "\x1b" in s:
        s = _ANSI_ESCAPE_RE.sub("", s)
    if fix_encoding:
        s = _fix_mojibake(s)
        if fix_c1_controls:
            s = _fix_c1_controls(s)
    if fix_surrogates:
        s = _fix_surrogates(s)
    if fix_latin_ligatures:
        s = s.translate(_LIGATURES)
    if fix_character_width:
        s = _fix_width(s)
    if uncurl_quotes:
        s = s.translate(_CURLY_QUOTES)
    if fix_line_breaks:
        for k, v in _LINE_BREAKS.items():
            s = s.replace(k, v)
    if remove_control_chars:
        s = s.translate(_CONTROL_CHARS)
    if normalization:
        s = unicodedata.normalize(normalization, s)
    return s


def unicode_reformat(text: Column, **flags) -> Column:
    """UnicodeReformatter as an Arrow-batched pandas UDF. Uses ftfy (the
    reference's engine) when importable; otherwise the documented
    fix_text_basic subset — this sandbox ships no ftfy, and the divergence
    (multi-encoding mojibake chains) is covered by tests on the classic
    single-encoding cases both paths fix identically."""
    from pyspark.sql.types import StringType

    # the availability decision is made on the DRIVER (deterministic
    # semantics for the whole job) and captured in the closure; if the
    # executors' environment disagrees, fail with a clear message rather
    # than an opaque ImportError or a silent downgrade per worker
    use_ftfy = "ftfy" in sys.modules or _try_import_ftfy()

    @F.pandas_udf(StringType())
    def _fix(col: pd.Series) -> pd.Series:
        if use_ftfy:
            try:
                import ftfy
            except ImportError as e:  # pragma: no cover - env-mismatch guard
                raise ImportError(
                    "unicode_reformat: ftfy is importable on the driver "
                    "but not on this executor — install ftfy on the "
                    "executors (or neither side) so the fix semantics "
                    "are consistent across the job"
                ) from e

            cfg = ftfy.TextFixerConfig(explain=False, **flags) if flags else ftfy.TextFixerConfig(explain=False)
            return col.map(lambda s: ftfy.fix_text(s, config=cfg) if s is not None else s)
        return col.map(lambda s: fix_text_basic(s, **flags) if s is not None else s)

    return _fix(text)


def decode_html_entities(text: Column) -> Column:
    """Full HTML character-reference decoding (named + decimal + hex,
    any code point) via stdlib ``html.unescape`` in an Arrow-batched
    pandas UDF — the parity backstop for ``functions.html.html_to_text``,
    whose JVM-side chain covers the named set, all numeric references
    <= U+00FF, and the common typographic >255 map. Reference analogue:
    the C extractors behind stages/text/download/html_extractors/*.py
    unescape fully; route extracted text through this modifier when
    exact entity parity matters more than staying JVM-side."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _unescape(col: pd.Series) -> pd.Series:
        return col.map(lambda s: html.unescape(s) if s is not None else s)

    return _unescape(text)


def string_map_modifier(fn, on_error: str = "raise") -> "callable":
    """Generic per-string Arrow-UDF modifier factory: wrap any
    ``str -> str`` callable as a Column transform (nulls pass through
    untouched). ``on_error="keep"`` falls back to the original string
    when ``fn`` raises — the reference's per-segment fallback contract
    (stages/audio/tagging/text/chinese_conversion.py:66-72). This is the
    drop-in point for external text libraries this container doesn't
    ship (WFST grammars, opencc, ...): supply the library call, get a
    distributed Arrow-batched column map."""
    if on_error not in ("raise", "keep"):
        raise ValueError(f"on_error must be 'raise' or 'keep', got {on_error!r}")
    from pyspark.sql.types import StringType

    def modifier(text: Column) -> Column:
        @F.pandas_udf(StringType())
        def _map(col: pd.Series) -> pd.Series:
            def one(s):
                if s is None:
                    return None
                if on_error == "keep":
                    try:
                        return fn(s)
                    except Exception:
                        return s
                return fn(s)

            return col.map(one)

        return _map(text)

    return modifier


def inverse_text_normalize(text: Column, normalizer=None) -> Column:
    """InverseTextNormalizationStage seam (reference stages/audio/
    tagging/text/itn.py:31-90): spoken -> written form ("forty two" ->
    "42"). The reference wraps nemo_text_processing's WFST
    ``InverseNormalizer`` — not in this container, so the normalizer is
    INJECTED: either an object with the reference's surface
    (``split_text_into_sentences`` + ``normalize_list``) or a plain
    ``str -> str`` callable. Empty strings pass through unchanged
    (itn.py:84 ``if text:``). Raises when no normalizer is supplied —
    an honest environment stub, same contract as the ASR/diarizer
    seams."""
    if normalizer is None:
        raise NotImplementedError(
            "inverse_text_normalize needs an injected normalizer (e.g. "
            "nemo_text_processing InverseNormalizer) — not available in "
            "this environment"
        )
    if hasattr(normalizer, "normalize_list"):
        def fn(s: str) -> str:
            if not s:
                return s
            sentences = normalizer.split_text_into_sentences(s)
            return " ".join(normalizer.normalize_list(sentences))
    else:
        def fn(s: str) -> str:
            return normalizer(s) if s else s

    return string_map_modifier(fn)(text)


def chinese_convert(text: Column, converter=None) -> Column:
    """ChineseConversionStage seam (reference stages/audio/tagging/text/
    chinese_conversion.py:29-73): Traditional -> Simplified (or any
    OpenCC conversion). The converter is INJECTED: an object with
    ``.convert`` (OpenCC's surface) or a plain ``str -> str`` callable.
    A failing conversion keeps the original string, per the reference's
    per-segment fallback."""
    if converter is None:
        raise NotImplementedError(
            "chinese_convert needs an injected converter (e.g. "
            "opencc.OpenCC('t2s')) — not available in this environment"
        )
    fn = converter.convert if hasattr(converter, "convert") else converter
    return string_map_modifier(fn, on_error="keep")(text)


def _try_import_ftfy() -> bool:
    try:
        import ftfy  # noqa: F401

        return True
    except ImportError:
        return False
