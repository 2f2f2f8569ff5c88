"""Round-trip translation quality metrics: chrF / sentence-BLEU kernels
and the TextQualityMetricStage operator.

Reference semantics: stages/text/experimental/translation/evaluation/
text_quality.py (sacrebleu-backed; the chrF and BLEU definitions here
come from Popović 2015 and the mteval lineage).
"""

from __future__ import annotations

import math

import pytest

from curator_spark.kernels import textquality as ker
from curator_spark.operators import text_quality as tq


# ---------------------------------------------------------------------------
# kernel: chrF
# ---------------------------------------------------------------------------


def test_chrf_identity_and_edges():
    assert ker.chrf_score("the cat sat", "the cat sat") == pytest.approx(100.0)
    assert ker.chrf_score("", "") == pytest.approx(100.0)
    assert ker.chrf_score("abc", "") == 0.0
    assert ker.chrf_score("", "abc") == 0.0
    # fully disjoint alphabets -> no shared n-grams at any order
    assert ker.chrf_score("aaaa", "bbbb") == 0.0


def test_chrf_hand_computed_single_order():
    # hyp="ab", ref="ab": whitespace-stripped len 2 -> orders 1 and 2 only
    # order1: P=R=1; order2: P=R=1 -> F=100
    assert ker.chrf_score("a b", "ab") == pytest.approx(100.0)
    # hyp="ab", ref="ba": order1 multiset {a,b} matches 2/2 -> P1=R1=1;
    # order2 hyp {ab}, ref {ba} -> 0. chrP=chrR=(1+0)/2=0.5 -> F=50
    assert ker.chrf_score("ab", "ba") == pytest.approx(50.0)


def test_chrf_beta_weights_recall():
    # hyp shorter than ref: recall suffers; beta=2 weighs recall 4x, so
    # F(beta=2) < F(beta=1) when R < P.
    hyp, ref = "abcd", "abcdefgh"
    f2 = ker.chrf_score(hyp, ref, beta=2.0)
    f1 = ker.chrf_score(hyp, ref, beta=1.0)
    assert f2 < f1
    # manual check at beta=1 for order 1 only
    f_ord1 = ker.chrf_score(hyp, ref, char_order=1, beta=1.0)
    # P=4/4, R=4/8 -> F1 = 2*1*.5/1.5
    assert f_ord1 == pytest.approx(100.0 * 2 * 1.0 * 0.5 / 1.5)


def test_chrf_whitespace_toggle():
    # with whitespace removed, spacing differences are invisible
    assert ker.chrf_score("a b c", "abc") == pytest.approx(100.0)
    assert ker.chrf_score("a b c", "abc", remove_whitespace=False) < 100.0


# ---------------------------------------------------------------------------
# kernel: 13a tokenizer + sentence BLEU
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("text", "tokens"),
    [
        ("Hello, world!", ["Hello", ",", "world", "!"]),
        ("3.14 is pi", ["3.14", "is", "pi"]),  # digit-adjacent period kept
        ("end.", ["end", "."]),
        ("&quot;x&quot; &amp; y", ['"', "x", '"', "&", "y"]),
        ("1-2 one-two", ["1", "-", "2", "one-two"]),  # dash after digit only
        # boundary punctuation adjacent to digits needs the script's
        # space padding to split (mteval-v13a.pl pads the line first)
        ("It costs 3.50.", ["It", "costs", "3.50", "."]),
        (".5 up", [".", "5", "up"]),
        ("", []),
    ],
)
def test_tokenize_13a(text, tokens):
    assert ker.tokenize_13a(text) == tokens


def test_bleu_identity_and_edges():
    assert ker.bleu_sentence_score("the cat sat on the mat", "the cat sat on the mat") == pytest.approx(100.0)
    assert ker.bleu_sentence_score("", "") == pytest.approx(100.0)
    assert ker.bleu_sentence_score("a", "") == 0.0
    assert ker.bleu_sentence_score("", "a") == 0.0


def test_bleu_effective_order_short_hypothesis():
    # 2-token identical strings: orders 1-2 only, both perfect -> 100
    assert ker.bleu_sentence_score("good morning", "good morning") == pytest.approx(100.0)


def test_bleu_exponential_smoothing_hand_computed():
    # hyp "a b c d", ref "a x c y": unigram 2/4, bigram 0/3, trigram 0/2,
    # 4gram 0/1; smoothing: p2=1/(2*3), p3=1/(4*2), p4=1/(8*1); BP=1.
    expect = 100.0 * math.exp(
        (math.log(0.5) + math.log(1 / 6) + math.log(1 / 8) + math.log(1 / 8)) / 4
    )
    assert ker.bleu_sentence_score("a b c d", "a x c y") == pytest.approx(expect)


def test_bleu_brevity_penalty():
    # perfect prefix, half length: BP = exp(1 - 8/4)
    hyp = "a b c d"
    ref = "a b c d e f g h"
    expect = 100.0 * math.exp(1.0 - 2.0)  # all precisions 1.0
    assert ker.bleu_sentence_score(hyp, ref) == pytest.approx(expect)


def test_bleu_clipped_counts():
    # hyp repeats "the": clipped unigram matches = ref count (1)
    hyp, ref = "the the the", "the cat"
    # unigram 1/3; bigram 0/2 -> p2 = 1/(2*2); trigram skipped? effective=3
    # trigram 0/1 -> p3 = 1/(4*1)
    expect = 100.0 * math.exp(
        (math.log(1 / 3) + math.log(1 / 4) + math.log(1 / 4)) / 3
    ) * math.exp(1 - 2 / 3) ** 0  # hyp_len 3 >= ref_len 2 -> BP=1
    assert ker.bleu_sentence_score(hyp, ref) == pytest.approx(expect)


# ---------------------------------------------------------------------------
# compute_text_quality_metric dispatch (text_quality.py:26-54)
# ---------------------------------------------------------------------------


def test_dispatch_pass_direction_and_injection():
    score, ok = tq.compute_text_quality_metric("same text", "same text", "chrf", 90.0)
    assert score == pytest.approx(100.0) and ok is True
    score, ok = tq.compute_text_quality_metric(
        "aaa bbb ccc ddd", "eee fff ggg hhh", "sacrebleu", 10.0
    )
    assert ok is False  # all-smoothed orders land well under 10
    # TER is lower-is-better and needs injection
    with pytest.raises(NotImplementedError, match="sacrebleu"):
        tq.compute_text_quality_metric("a", "b", "ter", 50.0)
    score, ok = tq.compute_text_quality_metric(
        "a", "b", "ter", 50.0, metric_fn=lambda h, r: 30.0
    )
    assert score == 30.0 and ok is True  # 30 <= 50 passes for an edit rate
    with pytest.raises(ValueError, match="Unsupported"):
        tq.compute_text_quality_metric("a", "b", "rouge", 1.0)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------


def test_text_quality_metrics_columns_and_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "the cat sat on the mat"),
            (2, "the cat sat on the mat", "a dog ran through a field"),
            (3, "the cat sat on the mat", "the cat sat on a mat"),
        ],
        ["doc_id", "text", "backtranslated_text"],
    )
    metrics = [
        {"type": "sacrebleu", "threshold": 50.0},
        {"type": "chrf", "threshold": 60.0},
    ]
    out = tq.text_quality_metrics(df, metrics)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["score_sacrebleu"] == pytest.approx(100.0)
    assert rows[1]["score_chrf"] == pytest.approx(100.0)
    assert rows[1]["is_quality_metric_passed"] is True
    assert rows[2]["is_quality_metric_passed"] is False
    # near-match passes chrf but its pass flag is the AND of both
    assert rows[3]["score_chrf"] > 60.0
    assert rows[3]["is_quality_metric_passed"] is (
        rows[3]["score_sacrebleu_passed"] and rows[3]["score_chrf_passed"]
    )
    # Spark scores equal the kernel run directly (no drift through Arrow)
    local = ker.bleu_sentence_score(
        "a dog ran through a field", "the cat sat on the mat"
    )
    assert rows[2]["score_sacrebleu"] == pytest.approx(local)

    kept = tq.text_quality_metrics(df, metrics, filter_enabled=True)
    assert {r["doc_id"] for r in kept.collect()} == {
        d for d, r in rows.items() if r["is_quality_metric_passed"]
    }


def test_text_quality_metrics_no_metrics_and_injection(spark):
    df = spark.createDataFrame(
        [(1, "a", "b")], ["doc_id", "text", "backtranslated_text"]
    )
    out = tq.text_quality_metrics(df, [])
    assert out.collect()[0]["is_quality_metric_passed"] is True

    # injected TER: lower-is-better comparison applied declaratively
    out = tq.text_quality_metrics(
        df,
        [{"type": "ter", "threshold": 40.0}],
        metric_fns={"ter": lambda h, r: float(len(h) + len(r))},
    )
    row = out.collect()[0]
    assert row["score_ter"] == 2.0 and row["score_ter_passed"] is True

    with pytest.raises(NotImplementedError):
        tq.text_quality_metrics(df, [{"type": "ter", "threshold": 1.0}])
    with pytest.raises(ValueError, match="missing column"):
        tq.text_quality_metrics(df.drop("text"), [])
    with pytest.raises(ValueError, match="duplicate"):
        tq.text_quality_metrics(
            df, [{"type": "chrf", "threshold": 1}, {"type": "chrf", "threshold": 2}]
        )
