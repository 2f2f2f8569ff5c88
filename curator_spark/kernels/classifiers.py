"""Pure-python kernels for the text-classifier stages.

Reference: ``stages/text/classifiers/`` — HF-model classification
stages whose model-free structure is portable:

- ``base.py:139-151`` — softmax-prob -> argmax -> label-table mapping
  (the labels ride in the model config; injectable here);
- ``fineweb_edu.py:110-122`` — regression-logit post-processing: clamp
  to [0, 5], banker's-rounded int score, the 2.5 high/low-quality cut;
- ``aegis_utils.py`` — the published AEGIS safety taxonomy + LlamaGuard
  prompt wrapper (verbatim, like the FAITH rubric constants) and
  ``aegis.py:314-329``'s response parse;
- ``prompt_task_complexity.py:99-186`` — the multi-head output math:
  task-type top-2 with the 0.1 "NA" cut, weighted-sum scores divided by
  per-head divisors, the few-shots 0.05 floor, and the fixed-weight
  prompt-complexity blend. The weight/divisor/task-type maps live in
  the model config and are injected.

The model forward passes themselves (Deberta + heads, LlamaGuard LoRA)
are torch checkpoints absent in this sandbox — each rides behind the
standard injectable seam in ``operators/classifiers.py``; everything
downstream of the raw logits is implemented here and tested against
replicas of the reference math.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "AEGIS_LABELS",
    "AEGIS_UNSAFE_CATEGORIES",
    "argmax_labels",
    "fineweb_outputs",
    "format_aegis",
    "parse_aegis_response",
    "prompt_complexity_score",
    "ptc_task_types",
    "ptc_weighted_scores",
    "softmax",
]

# aegis_utils.py:22-38 — prediction label table (position 0/1 are the
# parse fallbacks, 2.. are the 13 violation categories).
AEGIS_LABELS = [
    "unknown",
    "safe",
    "O1", "O2", "O3", "O4", "O5", "O6", "O7",
    "O8", "O9", "O10", "O11", "O12", "O13",
]

# aegis_utils.py — the published NVIDIA content-safety taxonomy lives in
# kernels/prompts.py with every other published prompt constant.
from .prompts import AEGIS_UNSAFE_CATEGORIES  # noqa: F401 - published constants registry


def format_aegis(message: str) -> str:
    """aegis_utils.py:160-178 — wrap one user message in the LlamaGuard
    instruction prompt (verbatim structure; the indentation inside the
    f-string is part of the published prompt)."""
    role = "User"
    prompt = f"""[INST] Task: Check if there is unsafe content in \'{role}\' messages in conversations according our safety policy with the below categories.

    <BEGIN UNSAFE CONTENT CATEGORIES>
    {AEGIS_UNSAFE_CATEGORIES}
    <END UNSAFE CONTENT CATEGORIES>

    <BEGIN CONVERSATION>

    """
    prompt += f"{role}: {message}\n\n"
    prompt += f"""<END CONVERSATION>

    Provide your safety assessment for {role} in the above conversation:
    - First line must read \'safe\' or \'unsafe\'.
    - If unsafe, a second line must include a comma-separated list of violated categories. [/INST]"""
    return prompt


def parse_aegis_response(raw_response: str) -> str:
    """aegis.py:314-329 — first line \'safe\' -> safe; \'unsafe\' ->
    the second line if it is a known category, else unknown."""
    lines = ("" if raw_response is None else raw_response).split("\n")
    first = lines[0].strip()
    if first == "safe":
        return "safe"
    if first == "unsafe":
        if len(lines) < 2:
            return "unknown"
        potential = lines[1].strip()
        return potential if potential in AEGIS_LABELS[2:] else "unknown"
    return "unknown"


def softmax(logits: np.ndarray) -> np.ndarray:
    """Row-wise softmax (the reference calls torch.softmax)."""
    z = np.asarray(logits, dtype=np.float64)
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def argmax_labels(probs: np.ndarray, labels: list) -> list:
    """base.py:139-151 ClassifierModelStage.process_model_output — the
    argmax index into the config\'s id-ordered label table."""
    p = np.asarray(probs)
    return [labels[i] for i in p.argmax(axis=1)]


def fineweb_outputs(logits) -> tuple:
    """fineweb_edu.py:110-122 — (float_scores clamped to [0,5],
    banker\'s-rounded int scores, high/low-quality labels at 2.5).
    Python ``round`` is HALF_EVEN — the Spark replay must use
    ``bround``, not ``round``."""
    ls = [float(x) for x in np.asarray(logits).reshape(-1)]
    float_scores = [min(5.0, max(0.0, x)) for x in ls]
    int_scores = [round(max(0, min(x, 5))) for x in ls]
    labels = ["high_quality" if x >= 2.5 else "low_quality" for x in ls]
    return float_scores, int_scores, labels


def ptc_task_types(logits: np.ndarray, task_type_map: dict) -> tuple:
    """prompt_task_complexity.py:99-117 — top-2 task types from the
    task-type head: probs rounded to 3 places, second label replaced by
    "NA" below 0.1. Returns (task_type_1, task_type_2, task_type_prob)."""
    z = np.asarray(logits, dtype=np.float64)
    top2 = np.argsort(-z, axis=1, kind="stable")[:, :2]
    probs = softmax(z)
    t1, t2, p1 = [], [], []
    for row, idx in zip(probs, top2):
        pa, pb = round(float(row[idx[0]]), 3), round(float(row[idx[1]]), 3)
        t1.append(task_type_map[str(idx[0])])
        t2.append("NA" if pb < 0.1 else task_type_map[str(idx[1])])
        p1.append(pa)
    return t1, t2, p1


def ptc_weighted_scores(
    logits: np.ndarray,
    weights: list,
    divisor: float,
    decimal: int = 4,
    zero_floor: bool = False,
) -> list:
    """prompt_task_complexity.py:119-133 — softmax-weighted sum over the
    head\'s class weights divided by the head divisor; the few-shots
    head floors values under 0.05 to 0."""
    probs = softmax(np.asarray(logits, dtype=np.float64))
    w = np.asarray(weights, dtype=np.float64)
    scores = (probs * w).sum(axis=1) / float(divisor)
    out = [round(float(s), decimal) for s in scores]
    if zero_floor:
        out = [x if x >= 0.05 else 0 for x in out]
    return out


def prompt_complexity_score(
    creativity, reasoning, constraint, domain_knowledge, contextual_knowledge, few_shots
) -> list:
    """prompt_task_complexity.py:160-186 — the fixed-weight blend of the
    six complexity heads, rounded to 5 places."""
    return [
        round(
            0.35 * c + 0.25 * r + 0.15 * k + 0.15 * d + 0.05 * x + 0.05 * f,
            5,
        )
        for c, r, k, d, x, f in zip(
            creativity, reasoning, constraint, domain_knowledge, contextual_knowledge, few_shots
        )
    ]
