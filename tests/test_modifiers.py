"""DocumentModifier family: Spark Column implementations vs pure-Python
replicas of the reference semantics (stages/text/modifiers/string/*.py,
unicode/unicode_reformatter.py — logic transcribed from the reference
spec, see each replica's docstring)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from curator_spark.functions.filters import TokenCountFilter, token_count
from curator_spark.functions.modifiers import (
    POLICY_SUBSTRINGS,
    apply_modifiers,
    fix_text_basic,
    normalize_newlines,
    remove_boilerplate,
    remove_lines,
    remove_markdown,
    remove_quotation,
    remove_urls,
    slice_text,
)

# ---------------------------------------------------------------------------
# reference replicas (pure Python, straight from the reference's logic)
# ---------------------------------------------------------------------------


def ref_newline(text: str) -> str:
    # newline_normalizer.py:33-34
    text = re.sub(r"(\n){3,}", "\n\n", text)
    return re.sub(r"(\r\n){3,}", "\r\n\r\n", text)


def ref_url(text: str) -> str:
    # url_remover.py:20,31
    return re.sub(r"https?://\S+|www\.\S+", "", text, flags=re.IGNORECASE)


def ref_markdown(text: str) -> str:
    # markdown_remover.py:36-44
    lines = []
    for line in text.split("\n"):
        line = re.sub(r"\*\*(.*?)\*\*", r"\1", line)
        line = re.sub(r"\*(.*?)\*", r"\1", line)
        line = re.sub(r"_(.*?)_", r"\1", line)
        line = re.sub(r"\[.*?\]\((.*?)\)", r"\1", line)
        lines.append(line)
    return "\n".join(lines)


def ref_quotation(text: str) -> str:
    # quotation_remover.py:34-38
    if len(text.strip()) > 2 and text[0] == '"' and text[-1] == '"':  # noqa: PLR2004
        if "\n" not in text.strip() or text.split("\n")[0][-1] != '"':
            text = text[1:-1]
    return text


def ref_lines(text: str, patterns: list[str]) -> str:
    # line_remover.py:32-35
    return "\n".join(ln for ln in text.split("\n") if ln not in patterns)


def ref_slicer(text, left=0, right=None, include_left=True, include_right=True, strip=True):
    # slicer.py:62-90
    if isinstance(left, int):
        left_index = left
    elif isinstance(left, str):
        f = text.find(left)
        if f == -1:
            return ""
        left_index = f if include_left else f + len(left)
    else:
        left_index = 0
    if isinstance(right, int):
        right_index = right
    elif isinstance(right, str):
        f = text.rfind(right)
        if f == -1:
            return ""
        right_index = f + len(right) if include_right else f
    else:
        right_index = len(text)
    result = text[left_index:right_index]
    return result.strip() if strip else result


def ref_boilerplate(text: str, remove_if_at_top_or_bottom: bool = True) -> str:
    # c4.py:50-105 + text_utils.py:91-111
    paragraphs = text.split("\n\n")
    bp = []
    for idx, p in enumerate(paragraphs):
        pl = p.strip().lower()
        if "lorem ipsum" in pl:
            return ""
        if any(s in pl for s in POLICY_SUBSTRINGS):
            if not remove_if_at_top_or_bottom:
                return ""
            bp.append(idx)
    if not bp:
        return text
    contiguous = all(bp[i] + 1 == bp[i + 1] for i in range(len(bp) - 1))
    top_bottom = (
        len(bp) != len(paragraphs)
        and contiguous
        and (bp[0] == 0 or bp[-1] == len(paragraphs) - 1)
    )
    if top_bottom:
        return "\n\n".join(p for i, p in enumerate(paragraphs) if i not in bp)
    return text


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

NEWLINE_CASES = [
    "a\n\n\nb",
    "a\n\n\n\n\n\nb",
    "a\r\n\r\n\r\n\r\nb",
    "a\nb",
    "",
    "\n\n\n",
    "x\r\n\r\nb\n\n\n\nc",
]

URL_CASES = [
    "see https://example.com/x?q=1 now",
    "go to WWW.Example.COM.",
    "HTTP://caps.example/a and http://b",
    "no urls here",
    "wrapped (https://ex.com/y)",
]

MARKDOWN_CASES = [
    "**bold** and *it* and _u_ done",
    "[text](http://x.com) mid",
    "**a**\n*b*\n_c_\n[d](e)",
    "*unclosed",
    "a ** b ** c",
    "**multi *nested* bold**",
]

QUOTE_CASES = [
    '"hello"',
    '"line one\nline two"',
    '"line one"\nline two"',
    '"x"',
    'plain',
    '""',
    '"abc"\n',
]

SLICER_CASES = [
    dict(left=0, right=None),
    dict(left=5, right=12),
    dict(left=-7, right=-1),
    dict(left="START", right="END", include_left=False, include_right=False),
    dict(left="START", right="END", include_left=True, include_right=True),
    dict(left="missing", right=None),
    dict(left=0, right="END", include_right=False, strip=False),
    dict(left=2, right=1),
]
SLICER_TEXT = "xx START middle END yy START other END zz"

BOILER_CASES = [
    "clean paragraph\n\nanother one",
    "Please read our Privacy Policy\n\nreal content\n\nmore content",
    "real content\n\nmore content\n\nterms of use apply",
    "top Cookie Policy\n\nmid USES COOKIES\n\nreal\n\nbottom privacy policy",
    "real\n\nmid uses cookies\n\nreal2",
    "Lorem Ipsum dolor\n\nreal",
    "privacy policy\n\nterms of use",
    "uses cookies",
]


def _roundtrip(spark, texts, col_fn):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select("i", col_fn(F.col("text")).alias("out")).collect()
    return [r["out"] for r in sorted(rows, key=lambda r: r["i"])]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_normalize_newlines(spark):
    got = _roundtrip(spark, NEWLINE_CASES, normalize_newlines)
    assert got == [ref_newline(t) for t in NEWLINE_CASES]


def test_remove_urls(spark):
    got = _roundtrip(spark, URL_CASES, remove_urls)
    assert got == [ref_url(t) for t in URL_CASES]


def test_remove_markdown(spark):
    got = _roundtrip(spark, MARKDOWN_CASES, remove_markdown)
    assert got == [ref_markdown(t) for t in MARKDOWN_CASES]


def test_remove_quotation(spark):
    got = _roundtrip(spark, QUOTE_CASES, remove_quotation)
    assert got == [ref_quotation(t) for t in QUOTE_CASES]


def test_remove_lines(spark):
    pats = ["REMOVE ME", ""]
    texts = ["keep\nREMOVE ME\nkeep2", "REMOVE ME", "a\n\nb", "REMOVE ME inside stays"]
    got = _roundtrip(spark, texts, lambda c: remove_lines(c, pats))
    assert got == [ref_lines(t, pats) for t in texts]


@pytest.mark.parametrize("kw", SLICER_CASES)
def test_slicer(spark, kw):
    got = _roundtrip(spark, [SLICER_TEXT, "short", ""], lambda c: slice_text(c, **kw))
    want = [ref_slicer(t, **kw) for t in [SLICER_TEXT, "short", ""]]
    assert got == want, kw


def test_boilerplate(spark):
    got = _roundtrip(spark, BOILER_CASES, remove_boilerplate)
    assert got == [ref_boilerplate(t) for t in BOILER_CASES]
    # remove_if_at_top_or_bottom=False: any policy hit nukes the doc
    got2 = _roundtrip(
        spark, BOILER_CASES, lambda c: remove_boilerplate(c, remove_if_at_top_or_bottom=False)
    )
    assert got2 == [ref_boilerplate(t, remove_if_at_top_or_bottom=False) for t in BOILER_CASES]


def test_boilerplate_long_c4_paragraph(spark):
    # the verbatim long C4 cookie paragraph must be caught too
    long_p = POLICY_SUBSTRINGS[9]
    text = f"{long_p.capitalize()}\n\nreal content"
    [got] = _roundtrip(spark, [text], remove_boilerplate)
    assert got == "real content"


def test_apply_modifiers_chain(spark):
    df = spark.createDataFrame(
        [(1, '"**bold** see https://x.com\n\n\n\nend"')], "i long, text string"
    )
    out = apply_modifiers(
        df, "text", remove_quotation, remove_markdown, remove_urls, normalize_newlines
    ).collect()[0]["text"]
    want = ref_newline(ref_url(ref_markdown(ref_quotation('"**bold** see https://x.com\n\n\n\nend"'))))
    assert out == want


# ---------------------------------------------------------------------------
# unicode reformatter (pure-Python subset; ftfy absent in this sandbox)
# ---------------------------------------------------------------------------


def test_unicode_mojibake_classics():
    assert fix_text_basic("Ã©tÃ©") == "été"
    assert fix_text_basic("donâ€™t â€œquoteâ€\x9d") == "don’t “quote”"
    assert fix_text_basic("clean text stays") == "clean text stays"
    # marker-free accented text must NOT be touched
    assert fix_text_basic("déjà vu naïve") == "déjà vu naïve"


def test_unicode_html_auto():
    assert fix_text_basic("a &amp; b") == "a & b"
    # literal '<' means real HTML: entities preserved (unescape_html='auto')
    assert fix_text_basic("<b>a &amp; b</b>") == "<b>a &amp; b</b>"
    assert fix_text_basic("<b>x &amp; y</b>", unescape_html=True) == "<b>x & y</b>"


def test_unicode_terminal_escapes_and_controls():
    assert fix_text_basic("\x1b[31mred\x1b[0m") == "red"
    assert fix_text_basic("a\x00b\x07c\td\ne") == "abc\td\ne"


def test_unicode_optional_fixers():
    assert fix_text_basic("ﬁle ﬂow", fix_latin_ligatures=True) == "file flow"
    assert fix_text_basic("ＡＢＣ１２３", fix_character_width=True) == "ABC123"
    assert fix_text_basic("10³ stays", fix_character_width=True) == "10³ stays"
    assert fix_text_basic("‘a’ “b”", uncurl_quotes=True) == "'a' \"b\""
    assert fix_text_basic("a\r\nb\rc d", fix_line_breaks=True) == "a\nb\nc\nd"
    import unicodedata

    decomposed = "été"
    assert fix_text_basic(decomposed, normalization="NFC") == unicodedata.normalize(
        "NFC", decomposed
    )


def test_unicode_surrogates():
    broken = "\ud83d\ude00 smile"  # UCS-2 surrogate pair for the emoji
    assert fix_text_basic(broken) == "\U0001f600 smile"


def test_unicode_reformat_spark(spark):
    from curator_spark.functions.modifiers import unicode_reformat

    texts = ["Ã©tÃ©", "a &amp; b", "plain"]
    got = _roundtrip(spark, texts, unicode_reformat)
    assert got == ["été", "a & b", "plain"]


# ---------------------------------------------------------------------------
# TokenCountFilter
# ---------------------------------------------------------------------------


def test_token_count_default(spark):
    texts = ["a b  c", "  ", "", "one", "x\ty\nz w"]
    got = _roundtrip(spark, texts, token_count)
    assert got == [3, 0, 0, 1, 4]


def test_token_count_injected_tokenizer(spark):
    got = _roundtrip(spark, ["abcdef", "ab"], lambda c: token_count(c, tokenizer=list))
    assert got == [6, 2]


def test_token_count_filter_apply(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "one"), (3, "a b c d e")], "i long, text string"
    )
    kept = TokenCountFilter(min_tokens=2, max_tokens=4).apply(df).select("i").collect()
    assert sorted(r["i"] for r in kept) == [1]


def test_token_count_filter_validation():
    with pytest.raises(ValueError, match="not both"):
        TokenCountFilter(tokenizer=str.split, hf_model_name="x")
    with pytest.raises(NotImplementedError):
        TokenCountFilter(hf_model_name="gpt2")


def test_decode_html_entities_full_parity(spark):
    """The Arrow-UDF seam decodes EVERYTHING html.unescape does —
    including >255 numeric refs outside html_to_text's JVM map."""
    from curator_spark.functions.modifiers import decode_html_entities

    cases = [
        "caf&#233; &#x2603; snowman",      # <=255 + arbitrary >255
        "&#9999;&permil;&theta;",          # rare named entities
        "&amp;#38; single-pass",           # html.unescape semantics
        "no refs at all",
        None,
    ]
    import html as _html

    got = _roundtrip(spark, cases[:-1], decode_html_entities)
    assert got == [_html.unescape(c) for c in cases[:-1]]


def test_string_map_modifier_seams(spark):
    """ITN / Chinese-conversion injectable seams: a supplied callable
    flows through the Arrow-UDF modifier chain; no callable -> honest
    NotImplementedError; failure fallback keeps the original."""
    from curator_spark.functions.modifiers import (
        chinese_convert,
        inverse_text_normalize,
        string_map_modifier,
    )

    with pytest.raises(NotImplementedError):
        inverse_text_normalize(F.col("text"))
    with pytest.raises(NotImplementedError):
        chinese_convert(F.col("text"))
    with pytest.raises(ValueError):
        string_map_modifier(str.upper, on_error="ignore")

    class FakeNormalizer:  # the reference InverseNormalizer surface
        def split_text_into_sentences(self, s):
            return s.split(". ")

        def normalize_list(self, sentences):
            return [x.replace("forty two", "42") for x in sentences]

    got = _roundtrip(
        spark,
        ["the answer is forty two", "", None, "plain. forty two here"],
        lambda c: inverse_text_normalize(c, normalizer=FakeNormalizer()),
    )
    assert got == ["the answer is 42", "", None, "plain 42 here"]

    class FakeOpenCC:  # the OpenCC surface, failing on marker input
        def convert(self, s):
            if s == "BOOM":
                raise RuntimeError("conversion failed")
            return s.replace("T", "S")

    got = _roundtrip(
        spark,
        ["TRAD", "BOOM", None],
        lambda c: chinese_convert(c, converter=FakeOpenCC()),
    )
    assert got == ["SRAD", "BOOM", None]  # failure keeps original

    # plain-callable variants of both seams
    got = _roundtrip(
        spark, ["ab"], lambda c: inverse_text_normalize(c, normalizer=str.upper)
    )
    assert got == ["AB"]
    got = _roundtrip(spark, ["ab"], lambda c: chinese_convert(c, converter=str.upper))
    assert got == ["AB"]


def test_slicer_strip_removes_all_whitespace(spark):
    """str.strip() parity: the reference Slicer strips newlines/tabs too,
    not just ASCII spaces."""
    texts = ["Intro\nbody text\n", "L\t mid \tR"]
    got = _roundtrip(
        spark, texts,
        lambda c: slice_text(c, left="Intro", include_left=False, strip=True),
    )
    assert got[0] == "body text"
    got2 = _roundtrip(
        spark, texts,
        lambda c: slice_text(c, left="L", right="R", include_left=False,
                             include_right=False, strip=True),
    )
    assert got2[1] == "mid"
