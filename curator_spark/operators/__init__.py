from .alm import build_windows as alm_build_windows
from .alm import builder_stats as alm_builder_stats
from .alm import drop_overlapping_segments
from .alm import filtered_duration as alm_filtered_duration
from .alm import overlap_filter as alm_overlap_filter
from .alm import (
    duration_histogram,
    extract_snippets,
    join_split_alignment,
    plan_snippets_stage,
    prepare_module_segments_stage,
    repetition_flags,
    snippet_plan_stats,
    split_long_audio,
)
from .connected_components import connected_components
from .chunking import merge_chunks, token_splitter
from .documents import add_id, document_joiner, document_splitter
from .duplicates import exact_duplicates, identify_duplicates, remove_duplicates
from .edges import edges_from_buckets
from .ids import BatchIdRegistry, assign_dedup_ids, filter_by_id_range, hash_file_batch, id_range
from .interleaved import (
    aspect_ratio_filter,
    image_to_text_ratio_filter,
    interleaved_row_validity,
    renumber_interleaved,
)
from .jaccard import token_jaccard_pairs
from .mathdoc import math_extract
from .lsh import lsh_bucket_ids
from .minhash_stage import minhash_stage
from .multimodal import (
    add_non_speaker_segments,
    asr_inference,
    audio_data_filter_pipeline,
    audio_features,
    audio_score_filter,
    audio_metrics,
    band_features,
    band_filter,
    concat_vad_segments,
    image_features,
    merge_alignment_diarization,
    mono_conversion,
    preserve_by_value,
    resample_features,
    speaker_segment_postprocess,
    speaker_separation,
    translate_concat_spans,
    vad_segments,
)
from .semantic import (
    SemanticDedupConfig,
    fit_centroids,
    identify_semantic_duplicates,
    kmeans_assign,
    kmeans_fit_spark,
    pairwise_max_similarity,
    semantic_dedup,
)
from .similarity import ann_ivf_topk, ann_lsh_topk, cosine_neardup_pairs, cosine_topk
from .text_quality import compute_text_quality_metric, text_quality_metrics
from .translation import (
    faith_threshold_filter,
    format_translation_output,
    merge_faith_scores,
    reassemble_documents,
    restore_skipped_rows,
    score_faith,
    segment_documents,
    skip_existing_translations,
    translate_segments,
    translation_pipeline,
)
from .video import fixed_stride_clips, uuid5_column
from .wer_stage import compute_wer

__all__ = [
    "BatchIdRegistry",
    "SemanticDedupConfig",
    "add_id",
    "add_non_speaker_segments",
    "alm_build_windows",
    "alm_builder_stats",
    "alm_filtered_duration",
    "alm_overlap_filter",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "aspect_ratio_filter",
    "asr_inference",
    "assign_dedup_ids",
    "audio_data_filter_pipeline",
    "audio_features",
    "audio_metrics",
    "audio_score_filter",
    "band_features",
    "band_filter",
    "compute_text_quality_metric",
    "compute_wer",
    "concat_vad_segments",
    "connected_components",
    "cosine_neardup_pairs",
    "cosine_topk",
    "document_joiner",
    "document_splitter",
    "drop_overlapping_segments",
    "duration_histogram",
    "edges_from_buckets",
    "exact_duplicates",
    "extract_snippets",
    "faith_threshold_filter",
    "filter_by_id_range",
    "fit_centroids",
    "fixed_stride_clips",
    "format_translation_output",
    "hash_file_batch",
    "id_range",
    "identify_duplicates",
    "identify_semantic_duplicates",
    "image_features",
    "image_to_text_ratio_filter",
    "interleaved_row_validity",
    "join_split_alignment",
    "kmeans_assign",
    "kmeans_fit_spark",
    "lsh_bucket_ids",
    "math_extract",
    "merge_alignment_diarization",
    "merge_chunks",
    "merge_faith_scores",
    "minhash_stage",
    "mono_conversion",
    "pairwise_max_similarity",
    "plan_snippets_stage",
    "prepare_module_segments_stage",
    "preserve_by_value",
    "reassemble_documents",
    "remove_duplicates",
    "renumber_interleaved",
    "repetition_flags",
    "resample_features",
    "restore_skipped_rows",
    "score_faith",
    "segment_documents",
    "semantic_dedup",
    "skip_existing_translations",
    "snippet_plan_stats",
    "speaker_segment_postprocess",
    "speaker_separation",
    "split_long_audio",
    "text_quality_metrics",
    "token_jaccard_pairs",
    "token_splitter",
    "translate_concat_spans",
    "translate_segments",
    "translation_pipeline",
    "uuid5_column",
    "vad_segments",
]
