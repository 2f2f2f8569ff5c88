"""LSH band hashing: signature -> (id, bucket-hash) long format.

Reference semantics (fuzzy/lsh/lsh.py:124-187): split the signature into
``num_bands`` contiguous ranges of ``minhashes_per_band``; bucket id =
hash of (band index, band slice); melt to long format. Two documents
collide in a band iff their band slices are equal. Numeric (h1, h2) keys
replace the reference's "b{i}_"+md5 strings: bucket labels only need to
collide identically (SURVEY §2.8); 96+ bits of hash keeps cross-slice
collisions negligible at 10^12-row scale while shuffling 16 bytes/row
instead of a 36-char string.

Three implementations:
- ``numpy`` (default): splitmix64-folded band hashes computed in an
  Arrow-batched UDF — measured 5-10x the throughput of the JVM
  expression on this workload, because 20x slice()+struct+explode per
  row makes the codegen path allocation/GC-bound (it ran at the SAME
  wall-clock on 2 and 16 cores; the numpy path scales with cores).
- ``arrow``: same kernel via mapInArrow — the signature matrix is a
  zero-copy reshape of the list column's values buffer (no pandas
  boxing of one numpy array per row). Bit-identical rows; measured
  ~2-3% end-to-end at local scale (the band-hash kernel, not the
  conversion, dominates there), kept as the opt-in for high-core
  executors where Python-side allocation pressure grows.
- ``jvm``: F.slice + xxhash64/hash + posexplode, zero Python — kept for
  environments where Python workers are the scarce resource.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..config import ID_FIELD, MINHASH_FIELD, FuzzyDedupConfig


def lsh_bucket_ids(
    df: DataFrame,
    cfg: FuzzyDedupConfig,
    band_range: tuple | None = None,
    id_field: str = ID_FIELD,
    minhash_field: str = MINHASH_FIELD,
    impl: str | None = None,
    passthrough: tuple = (),
) -> DataFrame:
    """(id, signature) -> (id, *passthrough, _bh1:long, _bh2:long); the
    band index is seeded into both hashes (no separate band column in the
    key).

    ``band_range=(lo, hi)`` processes bands lo..hi-1 (the reference's
    bands_per_iteration memory bound, lsh/stage.py:179-183, becomes a
    driver loop over ranges). ``passthrough`` columns are replicated per
    band row (streaming event-time plumbing).
    """
    impl = impl or cfg.lsh_impl
    if impl == "arrow":
        return _lsh_bucket_ids_arrow(df, cfg, band_range, id_field, minhash_field, passthrough)
    if impl == "numpy":
        return _lsh_bucket_ids_numpy(df, cfg, band_range, id_field, minhash_field, passthrough)
    return _lsh_bucket_ids_jvm(df, cfg, band_range, id_field, minhash_field, passthrough)


def _lsh_bucket_ids_jvm(df, cfg, band_range, id_field, minhash_field, passthrough=()) -> DataFrame:
    lo, hi = band_range if band_range is not None else (0, cfg.num_bands)
    r = cfg.minhashes_per_band
    sig = F.col(minhash_field)
    bands = F.array(
        *[
            F.struct(
                F.xxhash64(F.lit(b), F.slice(sig, b * r + 1, r)).alias("_bh1"),
                F.hash(F.slice(sig, b * r + 1, r), F.lit(b)).cast("long").alias("_bh2"),
            )
            for b in range(lo, hi)
        ]
    )
    return df.select(F.col(id_field), *[F.col(c) for c in passthrough], F.explode(bands).alias("_b")).select(
        id_field, *passthrough, F.col("_b._bh1").alias("_bh1"), F.col("_b._bh2").alias("_bh2")
    )


_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> np.uint64(30))
    x = x * _SM1
    x = x ^ (x >> np.uint64(27))
    x = x * _SM2
    return x ^ (x >> np.uint64(31))


def _band_hash_pair(sig_mat: np.ndarray, lo: int, hi: int, r: int) -> tuple[np.ndarray, np.ndarray]:
    n = sig_mat.shape[0]
    nb = hi - lo
    h1 = np.empty((n, nb), dtype=np.uint64)
    h2 = np.empty((n, nb), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j, b in enumerate(range(lo, hi)):
            sl = sig_mat[:, b * r : (b + 1) * r]
            # band seeds are per-band scalars; fold them before the fill
            a1 = np.full(n, _splitmix64(np.uint64(b + 1) * _GOLDEN), dtype=np.uint64)
            a2 = np.full(n, _splitmix64(np.uint64(b + 0x5555) * _SM1), dtype=np.uint64)
            for k in range(r):
                col = sl[:, k].astype(np.uint64)
                a1 = _splitmix64(a1 ^ col)
                a2 = _splitmix64(a2 + col * _GOLDEN)
            h1[:, j] = a1
            h2[:, j] = a2
    return h1, h2


def _lsh_bucket_ids_numpy(df, cfg, band_range, id_field, minhash_field, passthrough=()) -> DataFrame:
    lo, hi = band_range if band_range is not None else (0, cfg.num_bands)
    r = cfg.minhashes_per_band
    nb = hi - lo
    schema = StructType(
        [
            StructField(id_field, LongType(), False),
            *[df.schema[c] for c in passthrough],
            StructField("_bh1", LongType(), False),
            StructField("_bh2", LongType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            sig_mat = np.vstack(pdf[minhash_field].to_numpy())
            if sig_mat.dtype == np.int32:  # u32 bit pattern (array<int> storage)
                sig_mat = sig_mat.view(np.uint32)
            sig_mat = sig_mat.astype(np.uint64)
            h1, h2 = _band_hash_pair(sig_mat, lo, hi, r)
            ids = np.repeat(pdf[id_field].to_numpy(), nb)
            out = {id_field: ids}
            for c in passthrough:
                out[c] = np.repeat(pdf[c].to_numpy(), nb)
            out["_bh1"] = h1.ravel().view(np.int64)
            out["_bh2"] = h2.ravel().view(np.int64)
            yield pd.DataFrame(out)

    cols = [F.col(id_field), *[F.col(c) for c in passthrough], F.col(minhash_field)]
    return df.select(*cols).mapInPandas(run, schema=schema)


def _lsh_bucket_ids_arrow(df, cfg, band_range, id_field, minhash_field, passthrough=()) -> DataFrame:
    """mapInArrow variant of the numpy impl: the signature matrix is a
    zero-copy reshape of the Arrow list column's flat values buffer and
    the output batch is assembled column-wise — no pandas boxing of one
    numpy array per row on input (measured ~900x slower than the flat
    view at 50k x 260) and no row-wise DataFrame build on the banded
    (n x num_bands) output. Bit-identical bucket keys (same
    _band_hash_pair kernel); passthrough columns replicate via Arrow
    ``take``, so any type streams through untouched."""
    import pyarrow as pa

    lo, hi = band_range if band_range is not None else (0, cfg.num_bands)
    r = cfg.minhashes_per_band
    nb = hi - lo
    n_perm = cfg.num_hashes
    schema = StructType(
        [
            StructField(id_field, LongType(), False),
            *[df.schema[c] for c in passthrough],
            StructField("_bh1", LongType(), False),
            StructField("_bh2", LongType(), False),
        ]
    )

    def run(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            names = batch.schema.names
            lst = batch.column(names.index(minhash_field))
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
            flat = lst.flatten()
            vals = flat.to_numpy(zero_copy_only=True)
            if len(vals) != n * n_perm:
                raise ValueError(
                    f"ragged {minhash_field}: {len(vals)} values for {n} x {n_perm}"
                )
            sig_mat = vals.reshape(n, n_perm)
            if sig_mat.dtype == np.int32:  # u32 bit pattern (array<int> storage)
                sig_mat = sig_mat.view(np.uint32)
            sig_mat = sig_mat.astype(np.uint64)
            h1, h2 = _band_hash_pair(sig_mat, lo, hi, r)
            rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), nb))
            cols = [pa.compute.take(batch.column(names.index(id_field)), rep)]
            for c in passthrough:
                cols.append(pa.compute.take(batch.column(names.index(c)), rep))
            cols.append(pa.array(h1.ravel().view(np.int64)))
            cols.append(pa.array(h2.ravel().view(np.int64)))
            yield pa.RecordBatch.from_arrays(
                cols, names=[id_field, *passthrough, "_bh1", "_bh2"]
            )

    sel = [F.col(id_field), *[F.col(c) for c in passthrough], F.col(minhash_field)]
    return df.select(*sel).mapInArrow(run, schema=schema)
