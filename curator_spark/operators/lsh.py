"""LSH band hashing: signature -> (id, band, bucket-hash) long format.

Reference semantics (fuzzy/lsh/lsh.py:124-187): split the signature into
``num_bands`` contiguous ranges of ``minhashes_per_band``; bucket id =
band index + hash of the band slice; melt to long format. Two documents
collide in a band iff their band slices are equal.

Spark-first realization: the band slice is ``F.slice`` on the signature
array and the bucket key is two independent JVM-side hashes of the slice
(``xxhash64`` + ``hash``), all inside whole-stage codegen — no Python in
this stage at all. Numeric (band, h1, h2) keys replace the reference's
"b{i}_"+md5 strings: bucket labels only need to collide identically
(SURVEY §2.8); 96 bits of hash keeps cross-slice collisions negligible at
10^12-row scale while shuffling 20 bytes/row instead of a 36-char string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ID_FIELD, MINHASH_FIELD, FuzzyDedupConfig


def lsh_bucket_ids(
    df: DataFrame,
    cfg: FuzzyDedupConfig,
    band_range: tuple | None = None,
    id_field: str = ID_FIELD,
    minhash_field: str = MINHASH_FIELD,
) -> DataFrame:
    """(id, signature) -> (id, _band:int, _bh1:long, _bh2:long).

    ``band_range=(lo, hi)`` processes bands lo..hi-1 (the reference's
    bands_per_iteration memory bound, lsh/stage.py:179-183, becomes a
    driver loop over ranges).
    """
    lo, hi = band_range if band_range is not None else (0, cfg.num_bands)
    r = cfg.minhashes_per_band
    sig = F.col(minhash_field)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("_band"),
                F.xxhash64(F.lit(b), F.slice(sig, b * r + 1, r)).alias("_bh1"),
                F.hash(F.slice(sig, b * r + 1, r), F.lit(b)).cast("long").alias("_bh2"),
            )
            for b in range(lo, hi)
        ]
    )
    return df.select(F.col(id_field), F.explode(bands).alias("_b")).select(
        id_field, F.col("_b._band").alias("_band"), F.col("_b._bh1").alias("_bh1"), F.col("_b._bh2").alias("_bh2")
    )
