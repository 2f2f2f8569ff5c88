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

from .llmseam import generate_with_rowwise_fallback  # noqa: F401 - shared seam contract

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
# prompts.py — published Nemotron-CC prompt constants, housed with every
# other published prompt in kernels/prompts.py (the one registry).

from .prompts import (  # noqa: F401 - published constants, one registry
    DISTILL_PROMPT_TEMPLATE,
    DIVERSE_QA_PREFIX,
    DIVERSE_QA_PROMPT_TEMPLATE,
    EXTRACT_KNOWLEDGE_PROMPT_TEMPLATE,
    KNOWLEDGE_LIST_PROMPT_TEMPLATE,
    NEMOTRON_CC_DISTILL_SYSTEM_PROMPT,
    NEMOTRON_CC_SYSTEM_PROMPT,
    WIKIPEDIA_REPHRASING_PROMPT_TEMPLATE,
)


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
