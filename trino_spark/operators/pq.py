"""Product quantization (PQ) — compressed embedding search.

The missing piece next to LSH/IVF (operators/similarity.py): at 100 TB an
embedding column is the dominant storage cost (a 768-dim float32 vector
is 3 KB/row). PQ (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) splits each vector into M subvectors and
replaces each with the id of its nearest sub-codebook centroid: M bytes
per vector (~384x compression at 768-dim/M=8/ksub<=256), searchable
WITHOUT decompression via asymmetric distance computation (ADC) — a
per-query lookup table of query-subvector x centroid dot products, so
scoring a code is M table lookups + adds.

Scale shape, mirroring the IVF module:
- training is the one bounded driver-side step (sample O(4k) rows
  regardless of corpus size, seeded — same policy as IVF's k-means);
- encoding is one pandas-UDF matmul pass per Arrow batch (no shuffle);
- search broadcasts the small query set's LUTs into a vectorized UDF
  (numpy take + sum per batch), then per-query top-k via the rank<=k
  window (Spark WindowGroupLimit partial top-k);
- optional exact re-rank of the top `refine` ADC candidates restores
  recall without scanning raw vectors for the whole corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def train_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """(m, ksub, dim/m) sub-codebooks via per-subspace Lloyd k-means on a
    bounded, seeded sample (driver-side by design, like IVF training)."""
    sample = np.stack(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in corpus.select(vec_col).limit(sample_rows).collect()
        ]
    )
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for ci in range(len(cent)):
                members = sub[assign == ci]
                if len(members):
                    cent[ci] = members.mean(axis=0)
        books[s, : len(cent)] = cent
        if len(cent) < ksub:
            books[s, len(cent):] = cent[-1]
    return books


def encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "pq_code",
) -> DataFrame:
    """(id, pq_code array<int>) — M nearest-sub-centroid ids per vector;
    one matmul-free numpy pass per Arrow batch, no shuffle."""
    B = codebooks
    m, ksub, dsub = B.shape

    @F.pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            sub = M[:, s * dsub : (s + 1) * dsub]
            d2 = ((sub[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col), _enc(F.col(vec_col)).alias(out))


def adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    corpus: DataFrame | None = None,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Per-query top-k by asymmetric distance over PQ codes.

    With `refine` > 0 (requires `corpus` with raw vectors), the top
    `refine` ADC candidates are exactly re-ranked — the standard
    PQ + refine pipeline."""
    B = codebooks
    m, ksub, dsub = B.shape
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # LUT[qi, s, c] = dot(query subvector, centroid) -> score = sum_s LUT
    lut = np.stack([np.einsum("sd,scd->sc", q.reshape(m, dsub), B) for q in Q])

    @F.pandas_udf("array<double>")
    def _scores(code: pd.Series) -> pd.Series:
        C = np.stack(code.to_numpy())  # (batch, m)
        batch = C.shape[0]
        out = np.empty((batch, len(Q)))
        for qi in range(len(Q)):
            # gather LUT[qi, s, code[s]] for every row: take_along_axis
            out[:, qi] = np.take_along_axis(
                lut[qi][None, :, :].repeat(batch, axis=0), C[:, :, None], axis=2
            )[:, :, 0].sum(axis=1)
        return pd.Series(list(out))

    scored = codes.select(id_col, _scores(F.col(code_col)).alias("_s"))
    exploded = scored.select(
        id_col, F.posexplode("_s").alias("_qi", "adc_score")
    )
    qmap = F.array(*[F.lit(q) for q in qids])
    per_query = exploded.select(
        F.element_at(qmap, F.col("_qi") + 1).alias(query_id_col),
        F.col(id_col),
        "adc_score",
    )
    n_keep = max(k, refine)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("adc_score"), F.col(id_col))
    cand = per_query.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= n_keep)
    if not refine or corpus is None:
        return cand.filter(F.col("rnk") <= k).select(query_id_col, id_col, "adc_score", "rnk")

    # exact re-rank of the candidate pool only
    from trino_spark.functions.vectors import cosine_similarity

    qdf = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    joined = (
        cand.join(corpus.select(F.col(id_col), F.col(vec_col).alias("_cvec")), id_col)
        .join(F.broadcast(qdf), query_id_col)
        .withColumn("score", F.round(cosine_similarity(F.col("_qvec"), F.col("_cvec")), 6))
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        joined.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "score", "rnk")
    )
