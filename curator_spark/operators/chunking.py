"""Token-budget chunking and chunk reassembly (math pipeline stages).

Reference: ``stages/math/modifiers/chunking.py`` (TokenSplitterStage:24-133
— split long documents into chunks under a token budget while preserving
paragraph boundaries) and ``stages/math/modifiers/merge_chunks.py``
(ChunkMergeStage:22-138 — dedup, filter no-content chunks, re-concatenate
per document). The pair brackets a per-chunk LLM-cleanup stage; the
cleanup model itself is out of scope (inference endpoint), the data
movement is not.

Spark-first shape: the splitter is a per-row Column program — paragraph
split/reattach with array higher-order functions, a greedy ``aggregate``
fold for the budget packing (the same fold shape as
``document_joiner(max_length=...)``), one ``posexplode`` fan-out; zero
shuffle, zero UDF with the default whitespace tokenizer. The reference's
HF tokenizer is an injectable callable (same convention as
``TokenCountFilter``) costing one Arrow-batched UDF for the per-paragraph
counts. The merger is one groupBy with ``array_sort(collect_list)``
ordered concatenation — one shuffle, all built-ins.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = ["llm_cleanup", "merge_chunks", "token_splitter"]

# python str.strip()/str.split() whitespace (str.isspace() == True on
# python 3.11: \t-\r + space + FS/GS/RS/US + NEL + NBSP + the unicode
# space separators), written with \x{..} escapes valid in BOTH Java
# regex (Spark) and RE2 (the DuckDB oracle replay). Deliberately no
# \s: Java's includes \x0B but RE2's does not, so a vertical tab in a
# document would silently diverge engine from oracle — and plain \s is
# ASCII-only in both engines anyway, diverging from the reference's
# para.strip() on real web text (NBSP, thin spaces, ...)
_PY_WS = (
    r"\x{0009}-\x{000d}\x{0020}\x{001c}-\x{001f}\x{0085}\x{00a0}\x{1680}"
    r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}"
)
PY_STRIP_RE = f"^[{_PY_WS}]+|[{_PY_WS}]+$"
PY_SPLIT_RE = f"[{_PY_WS}]+"


def token_splitter(
    df: DataFrame,
    max_length_tokens: int = 8000,
    separator: str = "\n\n",
    tokenizer=None,
    text_field: str = "text",
    chunk_id_field: str = "chunk_id",
    n_tokens_field: str = "n_tokens",
) -> DataFrame:
    """One row per chunk: paragraphs (split on ``separator``, separator
    kept on every non-final raw paragraph, whitespace-only paragraphs
    dropped — chunking.py:76-83) are greedily packed so a chunk never
    exceeds ``max_length_tokens`` unless a single paragraph does
    (chunking.py:88-116); other columns are carried through, and a
    document with no non-blank paragraphs emits no rows (chunking.py:121).

    ``tokenizer``: ``list[str] -> list[list[int]]`` (HF
    ``tokenizer(texts, add_special_tokens=False).input_ids`` shape) or
    any callable returning per-text token-id lists; ``None`` counts
    whitespace tokens in pure Column math (zero UDF)."""
    parts = F.split(F.col(text_field), re.escape(separator), -1)
    last = F.size(parts) - 1
    kept = F.filter(
        F.transform(
            parts,
            lambda p, i: F.struct(
                F.when(i < last, F.concat(p, F.lit(separator))).otherwise(p).alias("t"),
                p.alias("raw"),
            ),
        ),
        # python str.strip() semantics (full unicode whitespace set)
        lambda s: F.regexp_replace(s["raw"], PY_STRIP_RE, "") != "",
    )
    paras = F.transform(kept, lambda s: s["t"])

    if tokenizer is None:
        counted = F.transform(
            paras,
            lambda p: F.struct(
                p.alias("t"),
                # python-strip then split (full unicode whitespace): kept
                # paragraphs are non-blank, so size == token count
                F.size(
                    F.split(F.regexp_replace(p, PY_STRIP_RE, ""), PY_SPLIT_RE, -1)
                ).cast("long").alias("n"),
            ),
        )
    else:
        @F.pandas_udf(ArrayType(LongType()))
        def _counts(col: pd.Series) -> pd.Series:
            out = []
            for plist in col:
                texts = list(plist) if plist is not None else []
                out.append([len(ids) for ids in tokenizer(texts)] if texts else [])
            return pd.Series(out)

        counted = F.zip_with(
            paras, _counts(paras), lambda p, n: F.struct(p.alias("t"), n.alias("n"))
        )

    empty = F.array().cast("array<struct<t:string,n:bigint>>")
    fold = F.aggregate(
        counted,
        F.struct(
            empty.alias("done"),
            F.lit("").alias("cur"),
            F.lit(0).cast("long").alias("n"),
        ),
        lambda acc, s: F.when(
            (acc["n"] + s["n"] > max_length_tokens) & (acc["n"] > 0),
            F.struct(
                F.concat(
                    acc["done"],
                    F.array(F.struct(acc["cur"].alias("t"), acc["n"].alias("n"))),
                ).alias("done"),
                s["t"].alias("cur"),
                s["n"].alias("n"),
            ),
        ).otherwise(
            F.struct(
                acc["done"].alias("done"),
                F.concat(acc["cur"], s["t"]).alias("cur"),
                (acc["n"] + s["n"]).alias("n"),
            )
        ),
        lambda acc: F.when(
            acc["cur"] == "", acc["done"]
        ).otherwise(
            F.concat(
                acc["done"], F.array(F.struct(acc["cur"].alias("t"), acc["n"].alias("n")))
            )
        ),
    )
    others = [c for c in df.columns if c != text_field]
    chunk = F.posexplode(fold).alias(chunk_id_field, "_chunk")
    return df.select(*others, chunk).select(
        *others,
        F.col(chunk_id_field).cast("long").alias(chunk_id_field),
        F.col("_chunk")["t"].alias(text_field),
        F.col("_chunk")["n"].alias(n_tokens_field),
    )


def merge_chunks(
    df: DataFrame,
    text_field: str = "cleaned_text",
    raw_text_field: str | None = "text",
    chunk_id_field: str = "chunk_id",
    groupby_columns: list[str] | None = None,
    no_content_markers: list[str] | None = None,
    sum_columns: list[str] | None = None,
    max_text_length: int = 900_000,
    separator: str = "\n",
) -> DataFrame:
    """Rebuild one row per document from chunk rows (merge_chunks.py:68-133):
    dedup on (group, chunk_id) keep-first, drop chunks whose text is a
    no-content marker / null / empty / lone newline, concatenate the
    text fields in chunk order with ``separator``, sum ``sum_columns``,
    take every other column from the lowest-chunk-id row, and drop merged
    documents that end up null/empty/newline-only or longer than
    ``max_text_length``. One shuffle (the groupBy); ordering comes from
    ``array_sort`` on collected (chunk_id, value) structs, not a global
    sort. Null raw-text chunks are skipped by ``concat_ws`` rather than
    stringified (the reference inherits pandas' ``str(NaN) == "nan"``
    artifact; documented deviation). Dedup deviation: the reference's
    ``drop_duplicates(keep="first")`` keeps whichever conflicting row
    happens to come first in task order — not reproducible on a
    distributed engine — so conflicting rows sharing (group, chunk_id)
    here resolve to the lexicographically-smallest remaining-column
    struct: a pure function of the data, stable under any partitioning
    or retry, and identical to the reference whenever duplicates are
    byte-identical (the retried-upstream case the rule exists for)."""
    group = groupby_columns or ["url"]
    markers = no_content_markers if no_content_markers is not None else [
        "NO USEFUL CONTENT",
        '"NO USEFUL CONTENT"',
    ]
    sums = sum_columns if sum_columns is not None else [
        "num_generated_tokens",
        "num_input_tokens",
    ]
    others = [c for c in df.columns if c not in group and c != chunk_id_field]
    deduped = (
        df.groupBy(*group, chunk_id_field)
        .agg(F.min(F.struct(*others)).alias("_r"))
        .select(*group, chunk_id_field, "_r.*")
    )
    t = F.col(text_field)
    kept = deduped.where(
        t.isNotNull() & ~t.isin([*markers, "", "\n"])
    )

    def ordered_concat(col: str):
        pairs = F.array_sort(
            F.collect_list(F.struct(F.col(chunk_id_field).alias("i"), F.col(col).alias("v")))
        )
        return F.concat_ws(separator, F.transform(pairs, lambda s: s["v"])).alias(col)

    text_cols = [text_field] + (
        [raw_text_field] if raw_text_field and raw_text_field in df.columns else []
    )
    aggs = []
    for c in df.columns:
        if c in group or c == chunk_id_field:
            continue
        if c in text_cols:
            aggs.append(ordered_concat(c))
        elif c in sums:
            aggs.append(F.sum(c).alias(c))
        else:
            aggs.append(F.min_by(c, F.col(chunk_id_field)).alias(c))
    merged = kept.groupBy(*group).agg(*aggs)
    mt = F.col(text_field)
    return merged.where(
        mt.isNotNull()
        & (mt != "")
        & (mt != "\n")
        & (F.length(mt) <= max_text_length)
    )


def llm_cleanup(
    df: DataFrame,
    generator=None,
    system_prompt: str = "",
    model_name: str = "",
    text_field: str = "text",
    output_field: str = "cleaned_text",
    max_model_len: int | None = None,
    classification: bool = False,
    n_tokens_field: str = "n_tokens",
    chat_template=None,
) -> DataFrame:
    """LLMCleanupStage (reference math/modifiers/llm_cleanup.py:15-206)
    — per-chunk LLM cleanup/classification around two injectable seams.

    The model-free structure, Spark-first:

    - the chunked-data context gate (``n_tokens < 0.8 * max_model_len``,
      llm_cleanup.py:137-144) is a DECLARATIVE Column filter applied
      before any Python, so Catalyst pushes it into the scan of a
      checkpointed chunk table;
    - the reference's per-batch length sort becomes
      ``sortWithinPartitions`` (zero shuffle; same padding/scheduling
      rationale as the classifier stages);
    - prompt build — ``system_prompt.format_map(defaultdict(str,
      text=...))`` missing-key tolerance, the Qwen3-only ``/no_think``
      inline switch keyed off ``model_name`` (llm_cleanup.py:157-173),
      and the optional ``chat_template(messages) -> str`` seam with the
      reference's fall-back-to-raw-prompt contract — runs in ONE
      Arrow-batched UDF together with ``generator(list[prompt]) ->
      list[str]`` (the vLLM ``generate`` seam);
    - ``classification=True`` writes ``label`` and drops the text column
      (llm_cleanup.py:188-195).
    """
    if generator is None:
        raise NotImplementedError(
            "llm_cleanup requires a generator callable (list[prompt]) -> "
            "list[str]; the reference backend is a vLLM model "
            "(math/modifiers/llm_cleanup.py:104) — inject one"
        )
    if text_field not in df.columns:
        raise ValueError(f"llm_cleanup: missing column {text_field!r}")
    out = df
    if n_tokens_field in df.columns:
        if max_model_len is None:
            raise ValueError(
                "max_model_len must be set when processing chunked data "
                "(n_tokens field present)"
            )
        out = out.where(F.col(n_tokens_field) < 0.8 * max_model_len)
        out = out.sortWithinPartitions(n_tokens_field).drop(n_tokens_field)

    lname = model_name.lower()
    is_qwen3_family = "qwen3" in lname
    is_qwen3_only = is_qwen3_family and "qwen3." not in lname
    tmpl, sys_prompt, ct = generator, system_prompt, chat_template

    @F.pandas_udf("string")
    def _clean(texts: pd.Series) -> pd.Series:
        from collections import defaultdict

        prompts = []
        for t in texts:
            text = "" if t is None else str(t)
            user = sys_prompt.format_map(defaultdict(str, text=text))
            system_content = ""
            if is_qwen3_only:
                user = user + " /no_think"
                system_content = " /no_think"
            if ct is not None:
                messages = [
                    {"role": "system", "content": system_content},
                    {"role": "user", "content": user},
                ]
                try:
                    prompts.append(str(ct(messages)))
                except (AttributeError, ValueError, TypeError, KeyError):
                    prompts.append(user)  # reference's raw-prompt fallback
            else:
                prompts.append(user)
        from ..kernels.llmseam import generate_with_rowwise_fallback

        return pd.Series(generate_with_rowwise_fallback(tmpl, prompts))

    if classification:
        return out.withColumn("label", _clean(F.col(text_field))).drop(text_field)
    return out.withColumn(output_field, _clean(F.col(text_field)))
