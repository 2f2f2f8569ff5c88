"""Nemotron-CC synthetic-data stages, Spark-first (reference
``stages/synthetic/nemotron_cc/{base,nemotron_cc,prompts}.py`` and
``stages/synthetic/qa_multilingual_synthetic.py``).

The reference runs each stage as a Ray actor looping ``df.apply`` /
``asyncio.gather`` over rows of one batch. Here:

- generation is ONE Arrow-batched pandas UDF around the injectable
  ``generator(list[messages]) -> list[str]`` seam (the reference client
  is an ``AsyncLLMClient``; ``kernels.synthetic.make_llm_generator``
  adapts a raw per-messages chat callable). Concurrency is Spark's
  partition parallelism instead of an actor-local event loop — at
  10^12-row scale the fan-out knob is partition count, and a retried
  task re-derives exactly the same rows (no driver RNG state).
- a batch-level generator failure retries row-by-row so one poisoned
  row degrades to the reference's empty-response path ("" output)
  instead of failing its whole batch — the same convention as
  ``score_faith``.
- DiverseQA post-processing batches the ``format_diverse_qa`` kernel
  through Arrow (the tokenizer is the standard injectable seam);
  KnowledgeList post-processing is a pure Column program (JVM codegen,
  zero Python in the hot path).

Cite: base.py:62-107 (process/prompt/unwrap), nemotron_cc.py:38-182
(five stages + two post-processors), prompts.py (constants),
qa_multilingual_synthetic.py:33-129 (language pick + ``*`` strip).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..kernels import synthetic as ker

__all__ = [
    "diverse_qa_postprocess",
    "distill",
    "diverse_qa_generate",
    "extract_knowledge",
    "knowledge_list_format_column",
    "knowledge_list_generate",
    "knowledge_list_postprocess",
    "qa_multilingual",
    "synthesize",
    "wikipedia_rephrase",
]


def _require_generator(generator, who: str):
    if generator is None:
        msg = (
            f"{who} requires a generator callable "
            "(list[messages]) -> list[str]; the reference backend is an "
            "LLM client (synthetic/nemotron_cc/base.py:41) — adapt one "
            "with kernels.synthetic.make_llm_generator"
        )
        raise NotImplementedError(msg)


def synthesize(
    df: DataFrame,
    generator: Callable | None = None,
    prompt_template: str | None = None,
    system_prompt: str | None = None,
    input_field: str = "text",
    output_field: str = "synthetic",
) -> DataFrame:
    """BaseSyntheticStage (base.py:62-107): build the prompt per row
    (``prompt.format(document=...)``, optional system message), call the
    generator seam, attach the unwrapped response as ``output_field``."""
    _require_generator(generator, "synthesize")
    if not prompt_template:
        raise ValueError("synthesize: prompt_template is required")
    if input_field not in df.columns:
        raise ValueError(f"synthesize: missing column {input_field!r}")
    template, sys_prompt = prompt_template, system_prompt

    @F.pandas_udf(StringType())
    def _gen(texts: pd.Series) -> pd.Series:
        docs = ["" if t is None else str(t) for t in texts]
        messages = [ker.build_synthesis_messages(template, d, sys_prompt) for d in docs]
        return pd.Series(ker.generate_with_rowwise_fallback(generator, messages))

    return df.withColumn(output_field, _gen(F.col(input_field)))


def wikipedia_rephrase(df: DataFrame, generator=None, input_field: str = "text") -> DataFrame:
    """WikipediaParaphrasingStage (nemotron_cc.py:38-44)."""
    return synthesize(
        df, generator, ker.WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE,
        ker.NEMOTRON_CC_SYSTEM_PROMPT, input_field, "rephrased",
    )


def diverse_qa_generate(df: DataFrame, generator=None, input_field: str = "text") -> DataFrame:
    """DiverseQAStage (nemotron_cc.py:47-56) — generation half; chain
    :func:`diverse_qa_postprocess` for the reference's full stage pair."""
    return synthesize(
        df, generator, ker.DIVERSE_QA_PROMPT_TEMPLATE,
        ker.NEMOTRON_CC_SYSTEM_PROMPT, input_field, "diverse_qa",
    )


def distill(df: DataFrame, generator=None, input_field: str = "text") -> DataFrame:
    """DistillStage (nemotron_cc.py:124-130) — note the distinct system
    prompt."""
    return synthesize(
        df, generator, ker.DISTILL_PROMPT_TEMPLATE,
        ker.NEMOTRON_CC_DISTILL_SYSTEM_PROMPT, input_field, "distill",
    )


def extract_knowledge(df: DataFrame, generator=None, input_field: str = "text") -> DataFrame:
    """ExtractKnowledgeStage (nemotron_cc.py:133-139)."""
    return synthesize(
        df, generator, ker.EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE,
        ker.NEMOTRON_CC_SYSTEM_PROMPT, input_field, "extract_knowledge",
    )


def knowledge_list_generate(df: DataFrame, generator=None, input_field: str = "text") -> DataFrame:
    """KnowledgeListStage (nemotron_cc.py:142-148)."""
    return synthesize(
        df, generator, ker.KNOWLEDGE_LIST_PROMPT_TEMPLATE,
        ker.NEMOTRON_CC_SYSTEM_PROMPT, input_field, "knowledge_list",
    )


def diverse_qa_postprocess(
    df: DataFrame,
    input_field: str = "text",
    qa_field: str = "diverse_qa",
    tokenizer: Callable | None = None,
    prefix: str = ker.DIVERSE_QA_PREFIX,
    max_num_pairs: int = 10,
    sampler: Callable | None = None,
) -> DataFrame:
    """DiverseQAPostProcessingStage (nemotron_cc.py:59-121): parse the
    generated QA list, bound-sample, concatenate onto the document —
    written back to ``qa_field`` as the reference does.

    ``tokenizer(text) -> tokens`` is the injectable seam behind the
    length-scaled cap (the reference holds an ``AutoTokenizer``).
    Selection defaults to the kernel's md5 order + md5 draw — the
    documented deterministic stand-in for the reference's global-RNG
    ``shuffle``/``randint`` (pure function of the row: identical across
    partitionings and task retries). ``sampler(pairs, text, cap)``
    overrides it (tests pin reference RNG semantics through it)."""
    for col in (input_field, qa_field):
        if col not in df.columns:
            raise ValueError(f"diverse_qa_postprocess: missing column {col!r}")
    tok, pfx, cap0, smp = tokenizer, prefix, max_num_pairs, sampler

    @F.pandas_udf(StringType())
    def _post(texts: pd.Series, gens: pd.Series) -> pd.Series:
        out = []
        for text, gen in zip(texts, gens):
            text = "" if text is None else str(text)
            n_tok = len(tok(text)) if tok is not None else None
            out.append(
                ker.format_diverse_qa(
                    text, "" if gen is None else str(gen),
                    prefix=pfx, max_num_pairs=cap0, num_tokens=n_tok, sampler=smp,
                )
            )
        return pd.Series(out)

    return df.withColumn(qa_field, _post(F.col(input_field), F.col(qa_field)))


def knowledge_list_format_column(col: Column) -> Column:
    """``KnowledgeListPostProcessingStage._format_text``
    (nemotron_cc.py:168-177) as ONE Column expression — drop a
    non-bullet first line, trim ``- ``/two-space indents — so the
    post-process runs entirely in whole-stage codegen."""
    lines = F.split(F.coalesce(col, F.lit("")), "\n")
    return F.array_join(
        F.transform(
            F.filter(
                F.transform(lines, lambda x, i: F.struct(x.alias("x"), i.alias("i"))),
                lambda s: ~((s["i"] == F.lit(0)) & ~s["x"].startswith("-")),
            ),
            lambda s: F.when(
                s["x"].startswith("- ") | s["x"].startswith("  "),
                # str.strip() parity: F.trim removes only ASCII spaces, so
                # a '\t'/'\r'-terminated bullet body would diverge from
                # the kernel/reference byte-wise.
                F.regexp_replace(
                    s["x"].substr(F.lit(3), F.length(s["x"])),
                    r"^\s+|\s+$",
                    "",
                ),
            ).otherwise(s["x"]),
        ),
        "\n",
    )


def knowledge_list_postprocess(df: DataFrame, field: str = "knowledge_list") -> DataFrame:
    """KnowledgeListPostProcessingStage (nemotron_cc.py:152-182): null →
    "" (the reference's ``fillna``), then the Column-expression line
    walk, written back to ``field``."""
    if field not in df.columns:
        raise ValueError(f"knowledge_list_postprocess: missing column {field!r}")
    return df.withColumn(field, knowledge_list_format_column(F.col(field)))


def qa_multilingual(
    spark: SparkSession,
    prompt: str,
    languages: list,
    num_samples: int,
    generator: Callable | None = None,
) -> DataFrame:
    """QAMultilingualSyntheticStage (qa_multilingual_synthetic.py:33-129):
    generate ``num_samples`` synthetic documents, each prompted in a
    language picked per sample, ``*`` stripped from responses, returned
    as a one-column ``text`` frame.

    The reference picks the language with ``secrets.choice`` on the
    driver; here the pick is the md5 of the sample index (pure function
    of the row — stable under retries; same deviation rationale as the
    DiverseQA sampler). Generation distributes over ``spark.range``
    partitions instead of one actor's asyncio loop."""
    _require_generator(generator, "qa_multilingual")
    if not languages:
        raise ValueError("qa_multilingual: languages must be non-empty")
    langs, tmpl = list(languages), prompt

    @F.pandas_udf(StringType())
    def _gen(ids: pd.Series) -> pd.Series:
        import hashlib

        messages = []
        for i in ids:
            pick = int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % len(langs)
            messages.append(
                [{"role": "user", "content": tmpl.format(language=langs[pick])}]
            )
        out = ker.generate_with_rowwise_fallback(generator, messages)
        # qa_multilingual_synthetic.py:66-70 — strip model bolding
        return pd.Series([t.replace("*", "") for t in out])

    return spark.range(num_samples).select(_gen(F.col("id")).alias("text"))
