from .fuzzy import streaming_lsh_edges
from .incremental import streaming_exact_dedup, streaming_hourly_agg

__all__ = ["streaming_exact_dedup", "streaming_hourly_agg", "streaming_lsh_edges"]
