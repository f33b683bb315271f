"""Engine operators beyond plain relational algebra.

Two families:
1. Relational physical helpers (sampling, as-of style joins) that Spark
   expresses as compositions.
2. LLM-data-pipeline operators (the north-star extension — BASELINE.json):
   dedup (exact / minhash-LSH / simhash / n-gram jaccard), embedding
   similarity search (brute-force + LSH-bucketed), text analysis
   (lang-id, quality, token counts, fingerprints), multimodal column
   plumbing. Trino's hook for this class of workload is its ai_* function
   plugin (reference: plugin/trino-ai-functions/.../AiFunctions.java:55);
   we implement the data-prep operators natively.

Design rule: everything stays in DataFrame expressions (codegen, columnar)
unless semantics force a Pandas UDF; the only Python-boundary operator is
the multimodal decode stub (mapInPandas), which is exactly the shape a real
image/audio decoder needs.
"""

from trino_spark.operators import dedup, similarity, text  # noqa: F401
