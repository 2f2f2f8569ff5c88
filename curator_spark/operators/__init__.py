from .connected_components import connected_components
from .duplicates import exact_duplicates, identify_duplicates, remove_duplicates
from .edges import edges_from_buckets
from .ids import assign_dedup_ids
from .lsh import lsh_bucket_ids
from .minhash_stage import minhash_stage

__all__ = [
    "assign_dedup_ids",
    "connected_components",
    "edges_from_buckets",
    "exact_duplicates",
    "identify_duplicates",
    "lsh_bucket_ids",
    "minhash_stage",
    "remove_duplicates",
]
