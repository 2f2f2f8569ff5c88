from .text import (
    lang_id_scores,
    language_id,
    quality_score_micro,
    token_stats,
)

__all__ = [
    "lang_id_scores",
    "language_id",
    "quality_score_micro",
    "token_stats",
]
