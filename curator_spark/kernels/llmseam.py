"""The shared LLM-seam calling convention.

Every generation-seam operator in this repo (synthetic stages, LLM
cleanup, AEGIS classification, multilingual QA) calls an injectable
batched callable and degrades identically on failure; the contract
lives here — a neutral, dependency-free module — so synthetic-only
refactors never ripple into chunking/classifier executors.
"""

from __future__ import annotations

from typing import Callable

__all__ = ["generate_with_rowwise_fallback"]


def generate_with_rowwise_fallback(fn: Callable, items: list) -> list:
    """Call ``fn(items)`` once; on a batch-level failure (or a length
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
