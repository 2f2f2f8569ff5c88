"""Pure-python kernels for the Nemotron-CC synthetic-data stages.

Reference: ``stages/synthetic/nemotron_cc/`` and
``stages/synthetic/qa_multilingual_synthetic.py`` — LLM-backed
generation stages whose model-free structure is fully portable:

- ``prompts.py`` — the published Nemotron-CC prompt constants (system
  prompts + the five task templates), reproduced verbatim;
- ``base.py:76-107`` — prompt build (``prompt.format(document=...)``,
  optional system message) and response unwrap (first element, else "");
- ``nemotron_cc.py:59-121`` — DiverseQA post-processing: line
  normalization, prefix drop, ``Question:``-anchored pair merging,
  shuffle + bounded sampling, document+QA concatenation;
- ``nemotron_cc.py:152-182`` — KnowledgeList post-processing: bullet
  normalization line walk;
- ``qa_multilingual_synthetic.py:62-71`` — response unwrap with ``*``
  stripping.

The LLM call itself is the injectable ``generator`` seam (the reference
client is an ``AsyncLLMClient``); everything around it is implemented
here. Two reference behaviors are driver-state RNG draws
(``random.shuffle`` / ``random.randint`` in DiverseQA sampling,
``secrets.choice`` for the multilingual language pick) that a
distributed, retry-safe engine cannot reproduce: the defaults here are
pure functions of the row (md5-derived order / draw / pick — same
marginal behavior, stable under any partitioning or task retry; the
same deviation, for the same reason, as the fasttext pareto keep rule).
Tests inject seeded-RNG replicas to pin the reference semantics
bit-for-bit.
"""

from __future__ import annotations

import hashlib
from typing import Callable

__all__ = [
    "DISTILL_PROMPT_TEMPLATE",
    "DIVERSE_QA_PROMPT_TEMPLATE",
    "DIVERSE_QA_PREFIX",
    "EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE",
    "KNOWLEDGE_LIST_PROMPT_TEMPLATE",
    "NEMOTRON_CC_DISTILL_SYSTEM_PROMPT",
    "NEMOTRON_CC_SYSTEM_PROMPT",
    "WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE",
    "build_synthesis_messages",
    "det_draw",
    "det_order",
    "format_diverse_qa",
    "generate_with_rowwise_fallback",
    "knowledge_list_format",
    "make_llm_generator",
    "parse_qa_pairs",
    "unwrap_generation",
]

# ---------------------------------------------------------------------------
# prompts.py — published Nemotron-CC prompt constants, verbatim.

NEMOTRON_CC_SYSTEM_PROMPT = (
    "A chat between a curious user and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the questions."
)

NEMOTRON_CC_DISTILL_SYSTEM_PROMPT = (
    "You are an artificial intelligence assistant. You carefully provide "
    "accurate, factual, thoughtful, nuanced answers, and are brilliant at "
    "reasoning."
)

WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE = """For the following paragraph give me a diverse paraphrase of the same in high quality English language as in sentences on Wikipedia. Begin your answer on a separate line with "Here is a paraphrased version:".

Text: {document}"""

DIVERSE_QA_PROMPT_TEMPLATE = """Task:
Read the text, ask questions and answer them.

Follow these instructions:
1. Ask diverse questions that require different cognitive skills or cover different aspects of the text.
2. Ask questions in various forms such as:
  - Yes/No questions that require determining whether a statement is true or false.
  - Open-ended questions that begin with words like what, how, when, where, why and who.
  - Multi-choice questions that offers two or more options to choose from. Include the options in the question.
  - Comparison questions that compare two quantities or objects and determine the relationship between them.
  - Reading comprehension questions that test the ability to understand and analyze the text.
  - Problem-solving questions that test the ability to solve mathematical, physical, or logical problems.
3. Focus on asking questions about factual information, important knowledge, or concrete details in the text.
4. Write questions and answers using clear and concise language.
5. Use plain text. Do not use Markdown.
6. Each question and answer pair should be on a separate line. Tag the question with "Question:" and the answer with "Answer:".

Text:
{document}

Task:
After reading the above text, ask up to 8 questions and provide the correct answers following the instructions. Give your response in this format:

Here are the questions and answers based on the provided text:
- Question: [first question] Answer: [first answer]
- Question: [second question] Answer: [second answer]
...."""

DISTILL_PROMPT_TEMPLATE = """Your task is to read and paraphrase the provided text following these instructions:
- Aim to create a condensed but accurate and informative version of the original text, not a simplistic summary.
- Capture and preserve the crucial information, key concepts, important values, factual details in the original text, while making it more readable and accessible.
- Retain technical terms, specialized vocabulary, and complex concepts.
- Retain examples, explanations of reasoning processes, and supporting evidence to maintain the text's depth and context.
- Only include information that is present in the original text. Do not adding new or unsubstantiated claims.
- Write the text in plain text without formatting.

Here is the text:
{document}

Task:
After thoroughly reading the above text, paraphrase it in high-quality and clear English following the instructions. Begin your response with "Paraphrased Text:"."""

EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE = """Your task is to rewrite knowledge from the provided text following these instructions.
- Rewrite the text as a passage or passages using easy-to-understand and high-quality English like sentences in textbooks and Wikipedia.
- Focus on content in disciplines such as humanities, social sciences, natural sciences, technology, engineering, math, law and legal, business, management, art, education, agricultural sciences, politics, and history.
- Disregard content that does not contain useful facts or knowledge.
- Retain examples, explanations of reasoning processes, and supporting evidence to maintain the text's depth and context.
- Do not add or alter details. Only restate what is already in the text.
- Write in plain text.
- Do not add titles, subtitles, note, or comment.

Text:
{document}

Task:
Rewrite facts and knowledge from the above text as a passage or passages following the instructions."""

KNOWLEDGE_LIST_PROMPT_TEMPLATE = """Review the text and extract the key information. Follow these instructions:
- Carefully read the above text and provide a concise and organized list of factual information, concrete details, key concepts, and important numbers and statistics extracted from the text.
- Ensure each point is clear, specific, and supported by the original text.
- Ensure the extract text is information-dense and easier to learn from.
- Do not add titles or headings.

Text:
{document}

Task:
Extract the factual information, concrete details, and key concepts from the above text following the instructions."""

# nemotron_cc.py:74 — the literal response preamble DiverseQA strips.
DIVERSE_QA_PREFIX = "Here are the questions and answers based on the provided text:"


# ---------------------------------------------------------------------------
# base.py — prompt build + response unwrap


def build_synthesis_messages(
    prompt_template: str, document: str, system_prompt: str | None = None
) -> list:
    """base.py:90-101 — ``prompt.format(document=...)`` into a user
    message, with the optional system message first."""
    user = {"role": "user", "content": prompt_template.format(document=document)}
    if system_prompt:
        return [{"role": "system", "content": system_prompt}, user]
    return [user]


def unwrap_generation(response, strip_asterisks: bool = False) -> str:
    """base.py:84-87 — first element of the response list, else "".
    ``strip_asterisks`` adds qa_multilingual_synthetic.py:66-70's ``*``
    removal (some models bold the generated text)."""
    if isinstance(response, str):
        text = response
    else:
        try:
            text = response[0] if response else ""
        except TypeError:
            text = str(response)
    text = "" if text is None else str(text)
    if strip_asterisks and "*" in text:
        text = text.replace("*", "")
    return text


def generate_with_rowwise_fallback(fn: Callable, items: list) -> list:
    """The shared batch-call failure contract of every generation seam:
    call ``fn(items)`` once; on a batch-level failure (or a length
    mismatch) retry row-by-row so ONE poisoned row degrades to the
    reference's empty-response path ("") instead of failing its whole
    batch. Used by synthesize / qa_multilingual / llm_cleanup /
    aegis_classifier so the contract can't drift between them."""
    try:
        out = [str(r) for r in fn(items)]
        if len(out) != len(items):
            raise ValueError(
                f"generator returned {len(out)} responses for {len(items)} rows"
            )
        return out
    except Exception:  # noqa: BLE001 - degrade row-by-row, audit per row
        out = []
        for item in items:
            try:
                (r,) = fn([item])
                out.append(str(r))
            except Exception:  # noqa: BLE001
                out.append("")
        return out


def make_llm_generator(llm_fn: Callable, strip_asterisks: bool = False) -> Callable:
    """Adapter for the generation seam: wraps a raw per-messages chat
    callable (``messages -> response``, the shape of the reference's
    ``client.query_model``) into the batched
    ``list[messages] -> list[str]`` callable the Spark operators take.
    Response unwrap happens here (base.py:84-87)."""

    def generate(batches: list) -> list:
        return [unwrap_generation(llm_fn(m), strip_asterisks) for m in batches]

    return generate


# ---------------------------------------------------------------------------
# nemotron_cc.py:59-121 — DiverseQA post-processing


def parse_qa_pairs(generated_text: str, prefix: str = DIVERSE_QA_PREFIX):
    """The parse half of ``DiverseQAPostProcessingStage._format_row``:
    strip blank lines, drop ``- `` bullets, drop the literal preamble,
    merge continuation lines into their ``Question:`` anchor. Returns
    the pair list, or None wherever the reference returns "" (empty
    generation, a non-question line before the first pair, zero
    pairs)."""
    lines = [ln.strip() for ln in (generated_text or "").split("\n") if ln.strip()]
    if not lines:
        return None
    lines = [ln[2:].strip() if ln.startswith("- ") else ln for ln in lines]
    if lines[0] == prefix:
        lines = lines[1:]
    qa_pairs: list = []
    for ln in lines:
        if ln.startswith("Question:"):
            qa_pairs.append(ln)
        elif qa_pairs:
            qa_pairs[-1] += "\n" + ln
        else:
            return None
    return qa_pairs or None


def det_order(pairs: list) -> list:
    """Deterministic stand-in for ``random.shuffle`` (nemotron_cc.py:102):
    order pairs by the md5 hex of their text — uniform-looking, but a
    pure function of the content, so identical on every partitioning,
    retry, and engine (DuckDB replays ``ORDER BY md5(pair)``)."""
    return sorted(pairs, key=lambda p: hashlib.md5(p.encode("utf-8")).hexdigest())


def det_draw(text: str, cap: int) -> int:
    """Deterministic stand-in for ``random.randint(1, cap)``
    (nemotron_cc.py:104-106): 1 + (first md5 byte of ``text + '#k'``
    mod cap). Replayable in SQL from the md5 hex string."""
    cap = max(1, int(cap))
    h = hashlib.md5((text + "#k").encode("utf-8")).hexdigest()
    return 1 + int(h[:2], 16) % cap


def format_diverse_qa(
    text: str,
    generated_text: str,
    prefix: str = DIVERSE_QA_PREFIX,
    max_num_pairs: int = 10,
    num_tokens: int | None = None,
    sampler: Callable | None = None,
) -> str:
    """``DiverseQAPostProcessingStage._format_row`` end-to-end: parse
    the generated QA list, sample a bounded subset, concatenate onto the
    document. ``num_tokens`` (from the injectable tokenizer) switches
    the cap to ``max(1, int(max_num_pairs * num_tokens / 150))``
    (nemotron_cc.py:103-105).

    ``sampler(pairs, text, cap) -> list`` overrides selection; the
    default is the deterministic md5 order + md5 draw. Tests inject a
    seeded ``random.shuffle``/``randint`` replica to pin the reference's
    RNG semantics exactly."""
    text = "" if text is None else str(text)
    pairs = parse_qa_pairs(generated_text, prefix)
    if pairs is None:
        return ""
    cap = max_num_pairs
    if num_tokens is not None:
        cap = max(1, int(max_num_pairs * num_tokens / 150))
    if sampler is not None:
        chosen = list(sampler(list(pairs), text, cap))
    else:
        chosen = det_order(pairs)[: det_draw(text, cap)]
    return f"{text}\n\n" + "\n\n".join(chosen)


# ---------------------------------------------------------------------------
# nemotron_cc.py:152-182 — KnowledgeList post-processing


def knowledge_list_format(generated_text: str) -> str:
    """``KnowledgeListPostProcessingStage._format_text`` — drop a
    non-bullet first line, trim ``- ``/two-space bullet indentation,
    keep everything else verbatim. (The Spark operator runs this as a
    Column expression; this kernel is the parity replica.)"""
    lines: list = []
    for idx, line in enumerate(("" if generated_text is None else generated_text).split("\n")):
        if idx == 0 and not line.startswith("-"):
            continue
        if line.startswith(("  ", "- ")):
            lines.append(line[2:].strip())
        else:
            lines.append(line)
    return "\n".join(lines)
