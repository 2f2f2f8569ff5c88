from .fasttext import (
    fasttext_langid,
    fasttext_langid_keep,
    fasttext_quality_keep,
    fasttext_quality_score,
)
from .filters import TokenCountFilter, score_filter, token_count
from .html import html_to_text, html_to_text_sql
from .wikitext import wikitext_to_text, wikitext_to_text_sql
from .modifiers import (
    apply_modifiers,
    fasttext_label,
    normalize_newlines,
    remove_boilerplate,
    remove_lines,
    remove_markdown,
    remove_quotation,
    remove_urls,
    slice_text,
    unicode_reformat,
)
from .text import (
    lang_id_scores,
    language_id,
    quality_score_micro,
    token_stats,
)

__all__ = [
    "fasttext_label",
    "fasttext_langid",
    "fasttext_langid_keep",
    "fasttext_quality_keep",
    "fasttext_quality_score",
    "html_to_text",
    "html_to_text_sql",
    "wikitext_to_text",
    "wikitext_to_text_sql",
    "TokenCountFilter",
    "apply_modifiers",
    "lang_id_scores",
    "language_id",
    "normalize_newlines",
    "quality_score_micro",
    "remove_boilerplate",
    "remove_lines",
    "remove_markdown",
    "remove_quotation",
    "remove_urls",
    "score_filter",
    "slice_text",
    "token_count",
    "token_stats",
    "unicode_reformat",
]
