"""Tests for the heuristic filter family (functions/filters.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.functions.filters import (
    mean_word_length_micro,
    non_alpha_ratio_micro,
    repeated_top_ngram_ratio_micro,
    score_filter,
    symbol_to_word_ratio_micro,
    word_count,
)


def test_word_count_and_mean_len(spark):
    df = spark.createDataFrame([(1, "ab cd efgh")], "id long, text string")
    row = df.select(
        word_count(F.col("text")).alias("wc"),
        mean_word_length_micro(F.col("text")).alias("ml"),
    ).collect()[0]
    assert row["wc"] == 3
    assert row["ml"] == 2_666_666  # floor(8/3 * 1e6)


def test_symbol_and_non_alpha(spark):
    df = spark.createDataFrame([(1, "ab# cd# ef 12")], "id long, text string")
    row = df.select(
        symbol_to_word_ratio_micro(F.col("text"), symbols="#").alias("sym"),
        non_alpha_ratio_micro(F.col("text")).alias("na"),
    ).collect()[0]
    assert row["sym"] == 500_000  # 2 symbols / 4 words
    # non-alpha chars: '#','#','1','2' of 13 chars
    assert row["na"] == int(4 * 1_000_000 / 13)


def test_repeated_top_ngram(spark):
    df = spark.createDataFrame([(1, "x x x y z")], "id long, text string")
    row = df.select(repeated_top_ngram_ratio_micro(F.col("text")).alias("r")).collect()[0]
    assert row["r"] == 600_000  # 'x' appears 3/5


def test_score_filter_composition(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d e")], "id long, text string")
    out = score_filter(df, word_count(F.col("text")), "wc", keep=F.col("wc") >= 3)
    rows = out.collect()
    assert [r["id"] for r in rows] == [2] and rows[0]["wc"] == 5


def test_full_heuristic_family_edges(spark):
    from curator_spark.functions.filters import (
        boilerplate_string_ratio_micro,
        bullet_lines_ratio_micro,
        common_english_words_count,
        ellipsis_lines_ratio_micro,
        has_pornographic_url,
        max_word_length,
        non_alpha_numeric_ratio_micro,
        numbers_ratio_micro,
        parentheses_ratio_micro,
        punctuation_ratio_micro,
        substring_filter_score,
        symbols_to_words_ratio_micro,
        urls_ratio_micro,
        white_space_ratio_micro,
        words_with_alphabets_ratio_micro,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, ""),  # empty -> ratio filters score 1.0 (reference: discard)
        (2, "lorem ipsum dolor"),  # boilerplate short-circuit
        (3, "see http://porn.example.com/x now"),
        (4, "short " + "x" * 1200),  # long-word
        (5, "the be to of and"),  # 5 common english words
        (6, "• a\n• b\nplain."),  # 2/3 bullet sentences, 1/3 end-mark
        (7, "well... \nokay..."),  # both sentences end with ellipsis
        (8, "(a) [b] {c}"),  # 6 paren chars / 11
        (9, "42 4242"),  # 6 digits / 7 chars
        (10, "### x#y#z #"),  # runs: '###'=1/3, 'x#y#z'=2/5 (not >50%), '#'=1/1 -> 1/3
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    t = F.col("t")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            non_alpha_numeric_ratio_micro(t).alias("nonaln"),
            boilerplate_string_ratio_micro(t).alias("boiler"),
            has_pornographic_url(t).alias("porn"),
            max_word_length(t).alias("maxw"),
            common_english_words_count(t).alias("common"),
            bullet_lines_ratio_micro(t).alias("bullets"),
            punctuation_ratio_micro(t).alias("punct"),
            ellipsis_lines_ratio_micro(t).alias("ell"),
            parentheses_ratio_micro(t).alias("parens"),
            numbers_ratio_micro(t).alias("digits"),
            symbols_to_words_ratio_micro(t).alias("sym"),
            urls_ratio_micro(t).alias("urls"),
            white_space_ratio_micro(t).alias("ws"),
            words_with_alphabets_ratio_micro(t).alias("alpha"),
            substring_filter_score(t, "lorem", "prefix").alias("sub"),
        ).collect()
    }
    assert got[1]["nonaln"] == 1_000_000 and got[1]["digits"] == 1_000_000
    assert got[2]["boiler"] == 1_000_000 and got[2]["sub"] == 1
    assert got[3]["porn"] == 1 and got[3]["urls"] > 0
    assert got[4]["maxw"] == 1200
    assert got[5]["common"] == 5 and got[5]["alpha"] == 1_000_000
    assert got[6]["bullets"] == 666_666
    assert got[6]["punct"] == 666_666  # '• a', '• b' lack end marks
    assert got[7]["ell"] == 1_000_000
    assert got[8]["parens"] == int(6 * 1_000_000 / 11)
    assert got[9]["digits"] == int(6 * 1_000_000 / 7)
    assert got[10]["sym"] == 333_333


def test_repetition_family(spark):
    from curator_spark.functions.filters import (
        repeated_lines_char_ratio_micro,
        repeated_lines_ratio_micro,
        repeated_paragraphs_ratio_micro,
        repeating_duplicate_ngram_ratio_micro,
        repeating_top_ngram_ratio_micro,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "aa\nbb\naa\ncc"),        # 3 distinct / 4 lines
        (2, "p1\n\np1\n\np2"),         # 2 distinct / 3 paragraphs
        (3, "x y x y x y z"),          # top bigram "x y" x3
        (4, "one two"),                # fewer than 3 words -> 3-gram ratio 1.0
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    t = F.col("t")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            repeated_lines_ratio_micro(t).alias("rl"),
            repeated_paragraphs_ratio_micro(t).alias("rp"),
            repeated_lines_char_ratio_micro(t).alias("rlc"),
            repeating_top_ngram_ratio_micro(t, 2).alias("t2"),
            repeating_top_ngram_ratio_micro(t, 3).alias("t3"),
        ).collect()
    }
    assert got[1]["rl"] == 750_000
    assert got[1]["rlc"] == int(6 * 1_000_000 / 8)
    assert got[2]["rp"] == 666_666
    # doc 3: "x y" removed everywhere -> "  x  z" wait: reference removes
    # ALL occurrences of the top ngram string: len 13 -> len(text.replace("x y",""))
    expect = int((13 - len("x y x y x y z".replace("x y", ""))) * 1_000_000 / 13)
    assert got[3]["t2"] == expect
    assert got[4]["t3"] == 1_000_000

    # duplicate-ngram sequential scan: reference algorithm, hand-checked
    out = repeating_duplicate_ngram_ratio_micro(df, 2, "t", "d2")
    d = {r["id"]: r["d2"] for r in out.collect()}
    # doc 3 bigrams: (x,y)(y,x)(x,y)(y,x)(x,y)(y,z); reference loop:
    # 3rd gram dup (+2 chars +1 space), 4th overlap-adjusted (+1+1),
    # 5th (+1+1) => 7 duplicated chars of 13
    assert d[3] == 7 * 1_000_000 // 13
    assert d[4] == 0  # exactly n words -> one bigram, no duplicates


def test_histogram_char_ratio(spark):
    from pyspark.sql import functions as F

    from curator_spark.functions.filters import histogram_char_ratio_score

    rows = [
        (1, "plain english text."),      # all in-set -> 1
        (2, "你好世界你好世界你好"),        # all out-of-set -> 0
        (3, ""),                          # empty -> 0 (reference would ZeroDivide)
        (4, "ok " + "€" * 7),             # 3/10 in-set -> 0
        (5, "abcdefghi€"),                # 9/10 = 0.9 > 0.8 -> 1
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", histogram_char_ratio_score(F.col("t")).alias("h")).collect()
    }
    assert got == {1: 1, 2: 0, 3: 0, 4: 0, 5: 1}


def test_top_ngram_linear_in_doc_length(spark):
    """Guard against the round-2 O(L^2) plan: scoring multi-KB docs must
    cost close-to-linearly more than short docs, not quadratically. The
    old nested-HOF Column plan took ~10 ms per 215-char doc and seconds
    per multi-KB doc; the Counter UDF is O(L)."""
    import time

    from pyspark.sql import functions as F

    from curator_spark.functions.filters import repeating_top_ngram_ratio_micro

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

    def corpus(n_docs: int, n_words: int):
        return [(i, " ".join(words[(i + j) % 8] for j in range(n_words))) for i in range(n_docs)]

    def timed(rows):
        df = spark.createDataFrame(rows, "id long, t string")
        df.select(repeating_top_ngram_ratio_micro(F.col("t"), 2)).count()  # warm
        t0 = time.monotonic()
        df.select(repeating_top_ngram_ratio_micro(F.col("t"), 2).alias("s")).agg(
            F.sum("s")
        ).collect()
        return time.monotonic() - t0

    short = timed(corpus(400, 40))    # ~240 chars/doc
    long = timed(corpus(400, 640))    # ~3.8 KB/doc: 16x chars
    # quadratic would be ~256x; allow generous scheduling noise at 60x
    assert long < max(short, 0.05) * 60, f"superlinear: {short:.3f}s -> {long:.3f}s"


def test_code_filters(spark):
    from curator_spark.functions.code import (
        code_alpha_ratio_micro,
        general_comment_ratio_micro,
        lines_of_code,
        python_comment_ratio_micro,
        xml_header_score,
    )
    from pyspark.sql import functions as F

    py_src = '"""Mod doc."""\n\ndef f():\n    """F doc."""\n    return 1  # inline\n'
    c_src = "int main() { // entry\n  /* body\n  comment */ return 0; }\n"
    rows = [
        (1, py_src),
        (2, c_src),
        (3, '<?xml version="1.0"?>\n<a/>'),
        (4, "123 456 !!"),
        (5, "def broken(:\n  # cmt\n"),  # unparseable python -> 0
        # markers inside string literals must NOT count as comments
        (6, 'char* u = "// not a comment"; // real\n'),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    t = F.col("t")
    base = df.select(
        "id",
        lines_of_code(t).alias("nl"),
        xml_header_score(t).alias("xml"),
        code_alpha_ratio_micro(t).alias("alpha"),
    )
    got = {r["id"]: r for r in base.collect()}
    assert got[3]["xml"] == 1 and got[1]["xml"] == 0
    assert got[1]["nl"] == py_src.count("\n") + 1
    assert got[4]["alpha"] == 0

    py = python_comment_ratio_micro(df, "t", "pc")
    pc = {r["id"]: r["pc"] for r in py.collect()}
    # comments ('# inline') + docstrings ('Mod doc.' + 'F doc.') chars
    expect = (len("# inline") + len("Mod doc.\nF doc.")) * 1_000_000 // len(py_src)
    assert pc[1] == expect
    assert pc[5] == 0  # syntax error -> 0 (reference code.py:40-42)

    gc = {r["id"]: r["gc"] for r in general_comment_ratio_micro(df, "text/x-c++", "t", "gc").collect()}
    # reference formula (code.py:73-79): len(" ".join(unstripped texts))
    want_c = len(" ".join([" entry", " body\n  comment "])) * 1_000_000 // len(c_src)
    assert gc[2] == want_c
    assert gc[4] == 0
    # '//' inside the string literal is skipped; only ' real' counts
    src6 = rows[5][1]
    assert gc[6] == len(" real") * 1_000_000 // len(src6)


def test_general_comment_contract_and_divergences(spark):
    """The tested contract vs the reference's comment_parser backend
    (functions/code.py docstring): agreement on the join formula and the
    unterminated-block sentinel; enumerated divergence on multi-line
    string literals."""
    from curator_spark.functions.code import general_comment_ratio_micro

    rows = [
        # (1) unterminated block comment -> comment_parser raises
        # UnterminatedCommentError, reference scores 9999 (code.py:75-77)
        (1, "int x; /* never closed\nint y;"),
        # (2) '/*' INSIDE a string literal is fine — no sentinel
        (2, 'char* s = "/*"; // tail\n'),
        # (3) join formula: two comments contribute one separator space
        (3, "// a\n// b\n"),
        # (4) DIVERGENCE (documented): marker inside a multi-line raw
        # string IS counted here; comment_parser's stateful lexer skips it
        (4, 'R"(\n// in raw string\n)";\n'),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    gc = {r["id"]: r["gc"] for r in general_comment_ratio_micro(df, "text/x-c++", "t", "gc").collect()}
    assert gc[1] == 9_999 * 1_000_000
    assert gc[2] == len(" tail") * 1_000_000 // len(rows[1][1])
    assert gc[3] == len(" ".join([" a", " b"])) * 1_000_000 // len(rows[2][1])
    # divergence pinned: the '// in raw string' line scores as a comment
    assert gc[4] == len(" in raw string") * 1_000_000 // len(rows[3][1])
