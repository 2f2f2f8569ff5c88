from .connected_components import connected_components
from .duplicates import exact_duplicates, identify_duplicates, remove_duplicates
from .edges import edges_from_buckets
from .ids import assign_dedup_ids
from .jaccard import token_jaccard_pairs
from .lsh import lsh_bucket_ids
from .minhash_stage import minhash_stage
from .multimodal import audio_features, resample_features
from .similarity import ann_lsh_topk, cosine_neardup_pairs, cosine_topk

__all__ = [
    "ann_lsh_topk",
    "assign_dedup_ids",
    "audio_features",
    "connected_components",
    "cosine_neardup_pairs",
    "cosine_topk",
    "edges_from_buckets",
    "exact_duplicates",
    "identify_duplicates",
    "lsh_bucket_ids",
    "minhash_stage",
    "remove_duplicates",
    "resample_features",
    "token_jaccard_pairs",
]
