"""curator_spark — a PySpark-native rebuild of the NeMo-Curator dedup stack.

Spark-first architecture: DataFrame/SQL logical plans (Catalyst optimizes),
Arrow-batched pandas UDFs only for signature math, driver-side loops only
for the LSH band batching and the connected-components fixpoint.
"""

__version__ = "0.1.0"
