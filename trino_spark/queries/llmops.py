"""LLM-data-pipeline operator queries (the extension tier from BASELINE.json:
dedup, similarity search, text analysis, multimodal) over the documents and
embeddings tables.

Oracle policy: everything whose math both engines share (normalization,
jaccard, cosine, md5, rolling hash, stub decode arithmetic) is
DuckDB-checked; xxhash64-seeded operators (minhash, simhash, LSH signatures)
have no cross-engine oracle and are covered by ground-truth recall tests in
tests/test_llmops.py instead (driver records rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from trino_spark.operators import dedup, similarity, text
from trino_spark.operators.multimodal import attach_fake_binary, decode_images
from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()


@REG.add(
    "dedup_exact",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    ),
    keyed AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS k
      FROM corpus
    )
    SELECT k AS content_key, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM keyed
    GROUP BY k
    HAVING count(*) > 1
    ORDER BY keep_id
    """,
)
def dedup_exact_q(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup pass over a corpus with injected clones (testdata has no
    byte-identical dups): groups sharing a normalized-content key."""
    d = t(spark, sf, "documents")
    corpus = d.select("doc_id", "text").unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    from trino_spark.functions.strings import normalize_text

    keyed = corpus.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("content_key"))
    return (
        keyed.groupBy("content_key")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy("keep_id")
    )


@REG.add(
    "text_ngram_jaccard_pairs",
    """
    WITH corpus AS (
      SELECT doc_id * 10 AS doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id * 10 + 1 AS doc_id,
             substring(text, 1, CAST(floor(length(text) * 0.8) AS INTEGER)) AS text
      FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS shingle_set
      FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
            FROM corpus) base
    )
    SELECT id_a, id_b, jaccard_sim FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_filter(a.shingle_set, x -> list_contains(b.shingle_set, x))) AS DOUBLE)
                   / len(list_distinct(list_concat(a.shingle_set, b.shingle_set))), 9) AS jaccard_sim
      FROM sh a JOIN sh b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
    ) p
    WHERE jaccard_sim >= 0.2
    ORDER BY id_a, id_b
    """,
)
def text_ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact word-3-gram Jaccard over a sliding id window (the ground-truth
    primitive behind minhash dedup; window-restricted to stay linear).

    The corpus unions each even doc with an 80%-prefix clone at the adjacent
    id so the query returns a non-trivial pair set at every SF (the raw
    testdata has no near-dups inside a 5-id window — r2's green was vacuous
    at 0 rows)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    corpus = d.select((F.col("doc_id") * 10).alias("doc_id"), "text").unionAll(
        d.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") * 10 + 1).alias("doc_id"),
            F.expr("substring(text, 1, cast(floor(length(text) * 0.8) as int))").alias("text"),
        )
    )
    s = dedup.with_shingles(corpus, "doc_id", "text", 3, out="shingle_set").withColumnRenamed(
        "_id", "doc_id"
    )
    a = s.select(F.col("doc_id").alias("id_a"), F.col("shingle_set").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("id_b"), F.col("shingle_set").alias("sh_b"))
    return (
        a.join(b, (F.col("id_b") > F.col("id_a")) & (F.col("id_b") <= F.col("id_a") + 5))
        .withColumn("jaccard_sim", F.round(dedup.jaccard(F.col("sh_a"), F.col("sh_b")), 9))
        .filter(F.col("jaccard_sim") >= 0.2)
        .select("id_a", "id_b", "jaccard_sim")
        .orderBy("id_a", "id_b")
    )


@REG.add("dedup_minhash_pairs", None)
def dedup_minhash_pairs_q(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs, jaccard-verified (>= 0.5).
    xxhash64-based — no cross-engine oracle; recall vs exact jaccard is
    asserted in tests/test_llmops.py."""
    return dedup.minhash_candidate_pairs(
        t(spark, sf, "documents"), threshold=0.5
    ).orderBy("id_a", "id_b")


@REG.add("dedup_minhash_keep", None)
def dedup_minhash_keep_q(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus after minhash dedup (earliest-id survivor per near-dup set)."""
    return (
        dedup.minhash_dedup(t(spark, sf, "documents"), threshold=0.5)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@REG.add("dedup_simhash_pairs", None)
def dedup_simhash_pairs_q(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 6 on 64-bit signatures)."""
    return dedup.simhash_candidate_pairs(
        t(spark, sf, "documents"), max_hamming=6
    ).orderBy("id_a", "id_b")


@REG.add(
    "text_stats",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                 / len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')), 9) AS mean_word_len,
           round(CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 9) AS space_ratio,
           CAST(list_sum([ceil(length(w) / 4.0) for w in list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')]) AS BIGINT) AS n_bpe_tokens
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def text_stats_q(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting + quality features (length stats, space ratio, BPE-ish
    subword estimate)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    c = F.col("text")
    n_tok = text.token_count(c)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars_m"),
        F.round(F.length(F.regexp_replace(c, r"\s+", "")) / n_tok, 9).alias("mean_word_len"),
        F.round(
            (F.length(c) - F.length(F.regexp_replace(c, r"\s", ""))) / F.greatest(F.length(c), F.lit(1)),
            9,
        ).alias("space_ratio"),
        text.bpe_ish_token_count(c).alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@REG.add(
    "text_lang_id",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' '), x -> x <> '') AS tk
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, lang,
           round(CAST(len(list_filter(tk, x -> list_contains(['the','and','of','to','a'], x))) AS DOUBLE) / greatest(len(tk), 1), 9) AS en_score,
           round(CAST(len(list_filter(tk, x -> list_contains(['der','die','und','das','ist'], x))) AS DOUBLE) / greatest(len(tk), 1), 9) AS de_score
    FROM toks
    ORDER BY doc_id
    """,
)
def text_lang_id_q(spark: SparkSession, sf: str) -> DataFrame:
    """Marker-word language-ID scores (the deterministic heuristic from
    operators/text.py lang_scores)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    scores = text.lang_scores("text")
    return d.select(
        "doc_id",
        "lang",
        F.round(F.element_at(scores, "en"), 9).alias("en_score"),
        F.round(F.element_at(scores, "de"), 9).alias("de_score"),
    ).orderBy("doc_id")


@REG.add(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp_md5,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(ch) AS BIGINT) for ch in string_split(text, '')]),
                            (a, c) -> (a * 31 + c) % 2147483647) AS BIGINT) AS fp_rolling
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def text_fingerprint_q(spark: SparkSession, sf: str) -> DataFrame:
    """Content fingerprints: md5 of normalized text + base-31 polynomial
    rolling hash (content-defined-chunking primitive)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        text.fingerprint("text").alias("fp_md5"),
        text.rolling_hash("text").alias("fp_rolling"),
    ).orderBy("doc_id")


@REG.add(
    "similarity_bruteforce_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) AS cs
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, round(cs, 9) AS cos_sim, CAST(rank AS INTEGER) AS rank
    FROM (SELECT query_id, vec_id, cs,
                 row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rank
          FROM scored) r
    WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def similarity_bruteforce_topk_q(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-10 neighbors for 5 query vectors (brute force —
    the recall baseline for the LSH variant)."""
    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    res = similarity.brute_force_topk(emb, queries, k=10)
    return res.select(
        "query_id", "vec_id", F.round("cos_sim", 9).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


@REG.add("similarity_lsh_topk", None)
def similarity_lsh_topk_q(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate (random-hyperplane LSH, multiprobe) cosine top-10 for the
    same 5 queries; recall vs brute force asserted in tests/test_llmops.py."""
    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    res = similarity.lsh_topk(emb, queries, k=10, nbits=4, n_tables=16, dim=64)
    return res.select(
        "query_id", "vec_id", F.round("cos_sim", 9).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


@REG.add(
    "similarity_embedding_neardup",
    """
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 1.5)
      FROM embeddings WHERE vec_id % 7 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 9) AS cos_sim
    FROM corpus a JOIN corpus b ON b.vec_id > a.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.99
    ORDER BY id_a, id_b
    """,
)
def similarity_embedding_neardup_q(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (>= 0.99) — the embedding-space
    analog of minhash dedup, routed through banded-LSH candidate generation
    + exact verify (operators/similarity.py: embedding_neardup_pairs); no
    all-pairs join in the plan.

    The raw corpus has no >=0.99 pairs (max natural cosine ~0.51), so the
    query plants one scaled copy (x1.5) of every 7th vector — cosine is
    scale-invariant, so each planted row pairs with its source at exactly
    1.0, and sign-bit LSH recall on those pairs is exact by construction.
    The oracle recomputes the same augmented corpus with an exact all-pairs
    join, so both the candidate recall and the verify filter are
    value-checked (FP candidates from shared buckets must be rejected)."""
    from trino_spark.operators import similarity

    emb = t(spark, sf, "embeddings")
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * 1.5).alias(
            "embedding"
        ),
    )
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionByName(planted)
    res = similarity.embedding_neardup_pairs(corpus, threshold=0.99)
    return res.select(
        "id_a", "id_b", F.round("cos_sim", 9).alias("cos_sim")
    ).orderBy("id_a", "id_b")


@REG.add(
    "ai_sentiment_stub",
    """
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z'']+') AS w
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CASE WHEN len(list_filter(w, x -> list_contains(['good','great','excellent','love','best','happy','win'], x)))
                   > len(list_filter(w, x -> list_contains(['bad','terrible','awful','hate','worst','sad','lose'], x)))
                THEN 'POSITIVE'
                WHEN len(list_filter(w, x -> list_contains(['bad','terrible','awful','hate','worst','sad','lose'], x)))
                   > len(list_filter(w, x -> list_contains(['good','great','excellent','love','best','happy','win'], x)))
                THEN 'NEGATIVE'
                ELSE 'NEUTRAL' END AS sentiment
    FROM toks
    ORDER BY doc_id
    """,
)
def ai_sentiment_stub_q(spark: SparkSession, sf: str) -> DataFrame:
    """ai_analyze_sentiment (reference: plugin/trino-ai-functions/.../
    AiFunctions.java:55) through the Arrow-batched pandas-UDF path with the
    deterministic offline client; the oracle restates the stub's lexicon
    heuristic relationally, so the whole Python boundary is value-checked."""
    from trino_spark.functions.ai import ai_analyze_sentiment

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    return d.select("doc_id", ai_analyze_sentiment("text").alias("sentiment")).orderBy("doc_id")


@REG.add(
    "multimodal_decode_stub",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)      AS n_bytes,
           'stub'                                          AS format,
           CAST(octet_length(encode(text)) % 640 AS INTEGER)       AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
           round(CAST(ascii(substring(text, 1, 1)) AS DOUBLE) / 255.0, 9) AS mean_luma
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def multimodal_decode_stub_q(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text -> binary column -> mapInPandas
    Arrow-batched 'decode' (deterministic stub) -> typed features. The
    oracle reproduces the stub arithmetic relationally, so the whole
    Python-boundary path is value-checked."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    features = decode_images(attach_fake_binary(d), impl="stub")
    return features.orderBy("doc_id")


@REG.add(
    "multimodal_ppm_decode",
    """
    SELECT d.doc_id,
           CAST(13 + 32 * 16 * 3 AS BIGINT) AS n_bytes,
           'ppm' AS format,
           32 AS width,
           16 AS height,
           round((SELECT avg(0.299 * v + 0.587 * v + 0.114 * v)
                  FROM (SELECT CAST((d.doc_id + x.i) % 256 AS DOUBLE) AS v
                        FROM generate_series(0, 31) x(i))) / 255.0, 6) AS mean_luma
    FROM documents d
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def multimodal_ppm_decode_q(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode end-to-end (operators/multimodal.py impl='ppm'):
    synthesize valid netpbm P6 files per row (gradient pixels
    (doc_id + x) % 256), decode them — header parse + BT.601 luma over the
    actual pixel matrix — and surface typed features. The oracle computes
    the gradient's closed-form luma, so a decoder that does not truly read
    the pixel bytes cannot match. Rounded to 6 digits: numpy's pairwise
    mean and SQL's sequential avg differ at ~1e-13."""
    from trino_spark.operators.multimodal import attach_synthetic_ppm

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    feats = decode_images(attach_synthetic_ppm(d), impl="ppm")
    return feats.withColumn("mean_luma", F.round("mean_luma", 6)).orderBy("doc_id")


@REG.add("text_word_stem_topk", None)
def text_word_stem_topk(spark: SparkSession, sf: str) -> DataFrame:
    """word_stem (WordStemFunction.java:51) over the documents corpus:
    tokenize JVM-side, stem the DISTINCT vocabulary only (Arrow-batched
    Porter UDF over ~thousands of words, not millions of tokens), then
    broadcast the stem map back onto the token stream — the scale-correct
    shape for per-row Python work. Rows-only (no Porter in DuckDB);
    algorithm pinned against published vocabulary in tests."""
    from trino_spark.functions.stem import word_stem

    d = t(spark, sf, "documents")
    toks = d.select(
        F.explode(
            F.split(F.lower(F.regexp_replace("text", r"[^A-Za-z ]", " ")), r"\s+")
        ).alias("w")
    ).filter(F.length("w") >= 3)
    vocab = toks.distinct().withColumn("stem", word_stem("w"))
    return (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("stem")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "stem")
        .limit(20)
    )


@REG.add("similarity_ivf_topk", None)
def similarity_ivf_topk_q(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate cosine top-10 via an IVF index (k-means centroid lists +
    n_probe nearest-list search, exact re-rank) — the second scale path
    next to LSH; recall vs brute force asserted in tests/test_llmops.py."""
    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    res = similarity.ivf_topk(emb, queries, k=10, n_centroids=32, n_probe=8)
    return res.select(
        "query_id", "vec_id", F.round("cos_sim", 9).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


@REG.add(
    "text_pii_mask",
    """
    SELECT CAST(doc_id % 7 AS INTEGER) AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_masked_ok,
           CAST(count(*) AS BIGINT) AS n_emails,
           CAST(count(*) AS BIGINT) AS n_phones,
           CAST(count(*) AS BIGINT) AS n_ips
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
)
def text_pii_mask(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub pass (pre-training corpus redaction; chained JVM
    regexp_replace, operators/text.py mask_pii + pii_counts — no UDF).
    Deterministic PII is synthesized per doc from its id, masked, and the
    result compared to the expected redaction the oracle knows by
    construction: every class count and every masked string must match or
    the group counts diverge."""
    from trino_spark.operators import text as tx

    d = t(spark, sf, "documents")
    did = F.col("doc_id")
    raw = F.concat(
        F.lit("User u"), did, F.lit("@example.com ip 10.0."), (did % 256),
        F.lit(".7 ssn 123-45-"), F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" call 415-555-"), F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" ok"),
    )
    expected = F.lit("User [EMAIL] ip [IP] ssn [SSN] call [PHONE] ok")
    rows = d.select(
        (did % 7).cast("int").alias("grp"),
        tx.mask_pii(raw).alias("masked"),
        expected.alias("expected"),
        tx.pii_counts(raw).alias("pc"),
    )
    return (
        rows.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("masked") == F.col("expected")).cast("long")).alias("n_masked_ok"),
            F.sum(F.col("pc.emails").cast("long")).alias("n_emails"),
            F.sum(F.col("pc.phones").cast("long")).alias("n_phones"),
            F.sum(F.col("pc.ips").cast("long")).alias("n_ips"),
        )
        .orderBy("grp")
    )


@REG.add(
    "dedup_connected_components",
    """
    WITH RECURSIVE e AS (
      SELECT doc_id AS u, doc_id + (doc_id % 7) AS v
      FROM documents WHERE doc_id % 7 <> 0 AND doc_id < 400
    ),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    reach AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v WHERE s.v <> r.u
    ),
    comp AS (
      SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(count(*) AS BIGINT) AS csize,
           CAST(max(node) AS BIGINT) AS max_node
    FROM comp GROUP BY component ORDER BY component
    """,
)
def dedup_connected_components(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed connected components (operators/components.py,
    small-star-style min-label propagation — the transitive-closure step
    real dedup pipelines run on near-dup pairs; Trino's WITH RECURSIVE is
    the small-scale equivalent, which IS the oracle here). Deterministic
    key-derived edge graph so both engines see identical input."""
    from trino_spark.operators.components import connected_components

    d = t(spark, sf, "documents")
    k = F.col("doc_id")
    edges = d.filter((k % 7 != 0) & (k < 400)).select(
        k.alias("u"), (k + k % 7).alias("v")
    )
    comp = connected_components(edges, "u", "v")
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("csize"),
            F.max("node").cast("long").alias("max_node"),
        )
        .withColumn("component", F.col("component").cast("long"))
        .select("component", "csize", "max_node")
        .orderBy("component")
    )


@REG.add("similarity_pq_topk", None)
def similarity_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantized ANN (operators/pq.py — Jegou et al. 2011): train
    bounded sub-codebooks, encode the corpus to M-byte codes (the ~32x
    compressed form a 100 TB embedding store actually keeps), score by
    asymmetric distance (per-query LUT, M lookups/row), exact re-rank of
    the candidate pool. Codebooks are k-means output -> rows-only; recall
    vs brute force pinned in tests/test_pq.py."""
    from trino_spark.operators import pq

    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq.train_codebooks(emb, m=8, ksub=16)
    codes = pq.encode(emb, books)
    return pq.adc_topk(codes, queries, books, k=10, corpus=emb, refine=100).orderBy(
        "query_id", "rnk"
    )


@REG.add(
    "multimodal_audio_stub",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
           CAST(CASE WHEN octet_length(encode(text)) >= 512
                     THEN 1 + (octet_length(encode(text)) - 512) // 256
                     ELSE 0 END AS INTEGER) AS n_frames,
           octet_length(encode(text)) / 16.0 AS duration_ms
    FROM documents WHERE doc_id < 300
    ORDER BY doc_id
    """,
)
def multimodal_audio_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Audio feature-extraction plumbing (binary column -> mapInPandas
    strided frame windowing; decode stubbed as 8-bit PCM, operators/
    multimodal.py extract_audio_features). The oracle re-derives the
    sample/frame/duration arithmetic from byte lengths in SQL; RMS and
    zero-crossing content is pinned by unit tests instead (not
    SQL-expressible)."""
    from trino_spark.operators import multimodal as mm

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    feats = mm.extract_audio_features(mm.attach_fake_binary(d))
    return feats.select(
        "doc_id",
        "n_samples",
        "n_frames",
        (F.col("n_samples") / 16.0).alias("duration_ms"),  # exact in fp
    ).orderBy("doc_id")


@REG.add(
    "text_decontaminate",
    """
    WITH base AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents WHERE doc_id < 300
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS s
      FROM base
    ), bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0
    ), ex AS (
      SELECT doc_id, unnest(s) AS g FROM sh
    ), hits AS (
      SELECT e.doc_id, CAST(count(*) AS BIGINT) AS h
      FROM ex e JOIN bench b ON e.g = b.g GROUP BY e.doc_id
    )
    SELECT t.doc_id,
           round(CAST(coalesce(h.h, 0) AS DOUBLE) / greatest(len(t.s), 1), 9) AS overlap_frac,
           (CAST(coalesce(h.h, 0) AS DOUBLE) / greatest(len(t.s), 1)) >= 0.1 AS contaminated
    FROM sh t LEFT JOIN hits h USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.decontaminate): every
    50th doc plays the eval set; per-doc fraction of word-3-gram shingles
    that leak from it, broadcast-probed — the training-data hygiene pass.
    Oracle re-derives shingles + overlap with exploded joins in DuckDB."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    bench = d.filter(F.col("doc_id") % 50 == 0)
    return dedup.decontaminate(d, bench, threshold=0.1).orderBy("doc_id")


@REG.add(
    "corpus_pack_sequences",
    """
    WITH RECURSIVE d AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok,
             row_number() OVER (ORDER BY doc_id) AS rn
      FROM documents WHERE doc_id < 300
    ), packs AS (
      SELECT rn, tok, tok AS fill, 0 AS pack FROM d WHERE rn = 1
      UNION ALL
      SELECT d.rn, d.tok,
             CASE WHEN p.fill + d.tok <= 2048 THEN p.fill + d.tok ELSE d.tok END,
             CASE WHEN p.fill + d.tok <= 2048 THEN p.pack ELSE p.pack + 1 END
      FROM packs p JOIN d ON d.rn = p.rn + 1
    )
    SELECT CAST(pack AS BIGINT) AS pack_id,
           CAST(count(*) AS INTEGER) AS n_docs,
           CAST(max(fill) AS BIGINT) AS total_tokens,
           max(fill) / 2048.0 AS fill_ratio
    FROM packs GROUP BY pack ORDER BY pack_id
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing (operators/packing.py): docs greedily packed into
    2048-token windows by whitespace token count; single range partition
    here so the oracle's sequential recursive-CTE greedy matches exactly
    (at scale, packing is per-partition-parallel, documented)."""
    from trino_spark.operators import packing
    from trino_spark.operators.text import token_count

    d = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", token_count("text").alias("n_tokens"))
    )
    out = packing.pack_sequences(d, budget=2048, n_parts=1)
    return out.select("pack_id", "n_docs", "total_tokens", "fill_ratio").orderBy("pack_id")


@REG.add("corpus_rebalance_langs", None)
def corpus_rebalance_langs(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified corpus rebalancing (operators/sampling.py — the
    data-mixture step): documents downsampled per language so no lang
    exceeds 1.5x the smallest; per-row seeded Bernoulli, no shuffle.
    Sampling is seed-dependent -> rows-only; proportions and determinism
    pinned in tests."""
    from trino_spark.operators import sampling

    d = t(spark, sf, "documents")
    out = sampling.rebalance(d, "lang", max_ratio=1.5, seed=42)
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .orderBy("lang")
    )


@REG.add(
    "text_repetition_signals",
    """
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
    lines AS (
      SELECT doc_id, l AS line
      FROM docs, unnest(string_split(text, chr(10))) AS t(l)
      WHERE length(l) > 0
    ),
    per_line AS (
      SELECT doc_id, line, count(*) AS cnt, length(line) AS len
      FROM lines GROUP BY doc_id, line
    ),
    line_stats AS (
      SELECT doc_id,
             1.0 - count(*) * 1.0 / sum(cnt) AS dup_line_frac,
             sum(CASE WHEN cnt > 1 THEN cnt * len ELSE 0 END) * 1.0
               / greatest(sum(cnt * len), 1) AS dup_line_char_frac
      FROM per_line GROUP BY doc_id
    ),
    words AS (
      SELECT doc_id, length(text) AS nct, string_split_regex(trim(text), '\\s+') AS w
      FROM docs
    ),
    bigrams AS (
      SELECT doc_id, nct, list_extract(w, i) || ' ' || list_extract(w, i + 1) AS bigram
      FROM words, unnest(generate_series(1, len(w) - 1)) AS g(i)
      WHERE len(w) >= 2
    ),
    per_bigram AS (
      SELECT doc_id, bigram, count(*) * length(bigram) AS covered, first(nct) AS nct
      FROM bigrams GROUP BY doc_id, bigram
    ),
    bigram_stats AS (
      SELECT doc_id, max(covered) * 1.0 / greatest(first(nct), 1) AS top_bigram_char_frac
      FROM per_bigram GROUP BY doc_id
    )
    SELECT d.doc_id,
           round(coalesce(ls.dup_line_frac, 0), 6) AS dup_line_frac,
           round(coalesce(ls.dup_line_char_frac, 0), 6) AS dup_line_char_frac,
           round(coalesce(bs.top_bigram_char_frac, 0), 6) AS top_bigram_char_frac
    FROM docs d
    LEFT JOIN line_stats ls USING (doc_id)
    LEFT JOIN bigram_stats bs USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_repetition_signals_q(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher/MassiveText repetition filters: duplicate-line fraction,
    duplicate-line character fraction, top word-bigram character coverage
    (operators/text.py repetition_signals — explode + doc-keyed hash aggs,
    pure expressions, scale = partition-by-document)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    sig = text.repetition_signals(d, "text", "doc_id")
    return sig.select(
        "doc_id",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac"),
        F.round("top_bigram_char_frac", 6).alias("top_bigram_char_frac"),
    ).orderBy("doc_id")


@REG.add(
    "tokenizer_bpe_pairs",
    """
    WITH words AS (
      SELECT lower(w) AS w
      FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(w)
      WHERE doc_id < 300 AND length(w) >= 2
    ),
    vocab AS (SELECT w, count(*) AS freq FROM words GROUP BY w),
    pairs AS (
      SELECT substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b, freq
      FROM vocab, unnest(generate_series(1, length(w) - 1)) AS g(i)
    )
    SELECT a || b AS pair, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY a || b
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def tokenizer_bpe_pairs_q(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer training, iteration-1 pair statistics
    (operators/tokenizer.py): corpus -> weighted distinct vocab -> adjacent
    char-pair counts. The full-corpus pass is one explode+agg; pair math
    runs on the vocab only (Heaps' law). Oracle recomputes the same counts
    character-positionally in DuckDB."""
    from trino_spark.operators import tokenizer

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    syms = tokenizer.to_symbols(tokenizer.word_vocab(d))
    stats = tokenizer.pair_stats(syms)
    return (
        stats.select(F.concat("a", "b").alias("pair"), F.col("cnt").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(20)
    )


@REG.add(
    "text_lm_perplexity",
    """
    WITH docs AS (SELECT doc_id, lower(trim(text)) AS t FROM documents WHERE doc_id < 300),
    words AS (
      SELECT doc_id, w FROM docs, unnest(string_split_regex(t, '\\s+')) AS u(w)
      WHERE length(w) > 0
    ),
    toks AS (
      SELECT doc_id, string_split_regex(t, '\\s+') AS ws FROM docs
    ),
    bigrams AS (
      SELECT doc_id, list_extract(ws, i) AS w1, list_extract(ws, i + 1) AS w2
      FROM toks, unnest(generate_series(1, len(ws) - 1)) AS g(i)
      WHERE len(ws) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
    c1 AS (SELECT w AS w1, count(*) AS c1 FROM words GROUP BY w),
    v AS (SELECT count(*) AS vs FROM c1),
    lm AS (
      SELECT c12.w1, c12.w2, ln((c12 + 1.0) / (c1 + (SELECT vs FROM v))) AS logp
      FROM c12 JOIN c1 ON c1.w1 = c12.w1
    ),
    scored AS (
      SELECT b.doc_id,
             coalesce(lm.logp, ln(1.0 / (coalesce(c1.c1, 0) + (SELECT vs FROM v)))) AS lp
      FROM bigrams b
      LEFT JOIN lm ON lm.w1 = b.w1 AND lm.w2 = b.w2
      LEFT JOIN c1 ON c1.w1 = b.w1
    )
    SELECT d.doc_id, round(exp(-avg(s.lp)), 6) AS perplexity
    FROM docs d LEFT JOIN scored s ON s.doc_id = d.doc_id
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
)
def text_lm_perplexity_q(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style quality scoring (Wenzek et al. 2020): per-document
    perplexity under a word-bigram LM with add-one smoothing, trained on
    the same corpus (operators/lm.py). Train = 2 hash aggs; score =
    broadcast model join + per-doc agg; all expressions. Oracle recomputes
    train+score verbatim in DuckDB."""
    from trino_spark.operators import lm as lmops

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    model, unigrams, v = lmops.train_bigram_lm(d)
    out = lmops.score_perplexity(d, model, unigrams, v)
    return out.select(
        "doc_id", F.round("perplexity", 6).alias("perplexity")
    ).orderBy("doc_id")


@REG.add(
    "corpus_quality_filter",
    """
    WITH docs AS (SELECT doc_id, lower(trim(text)) AS t, text FROM documents WHERE doc_id < 300),
    -- repetition signals
    lines AS (
      SELECT doc_id, l AS line FROM docs, unnest(string_split(text, chr(10))) AS u(l)
      WHERE length(l) > 0
    ),
    per_line AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS len FROM lines GROUP BY doc_id, line),
    line_stats AS (
      SELECT doc_id, 1.0 - count(*) * 1.0 / sum(cnt) AS dup_line_frac
      FROM per_line GROUP BY doc_id
    ),
    -- bigram LM perplexity (add-one smoothing, trained on the same corpus)
    words AS (SELECT doc_id, w FROM docs, unnest(string_split_regex(t, '\\s+')) AS u(w) WHERE length(w) > 0),
    toks AS (SELECT doc_id, string_split_regex(t, '\\s+') AS ws FROM docs),
    bigrams AS (
      SELECT doc_id, list_extract(ws, i) AS w1, list_extract(ws, i + 1) AS w2
      FROM toks, unnest(generate_series(1, len(ws) - 1)) AS g(i) WHERE len(ws) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
    c1 AS (SELECT w AS w1, count(*) AS c1 FROM words GROUP BY w),
    v AS (SELECT count(*) AS vs FROM c1),
    lm AS (SELECT c12.w1, c12.w2, ln((c12 + 1.0) / (c1 + (SELECT vs FROM v))) AS logp
           FROM c12 JOIN c1 ON c1.w1 = c12.w1),
    scored AS (
      SELECT b.doc_id, coalesce(lm.logp, ln(1.0 / (coalesce(c1.c1, 0) + (SELECT vs FROM v)))) AS lp
      FROM bigrams b LEFT JOIN lm ON lm.w1 = b.w1 AND lm.w2 = b.w2
      LEFT JOIN c1 ON c1.w1 = b.w1
    ),
    ppl AS (SELECT doc_id, exp(-avg(lp)) AS perplexity FROM scored GROUP BY doc_id),
    -- length features
    feats AS (
      SELECT d.doc_id,
             len(list_filter(string_split_regex(trim(d.text), '\\s+'), x -> x <> '')) AS n_tokens,
             coalesce(ls.dup_line_frac, 0) AS dup_line_frac,
             p.perplexity
      FROM docs d LEFT JOIN line_stats ls USING (doc_id) JOIN ppl p USING (doc_id)
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(dup_line_frac, 6) AS dup_line_frac,
           round(perplexity, 6) AS perplexity
    FROM feats
    WHERE n_tokens >= 20 AND round(dup_line_frac, 6) < 0.3 AND round(perplexity, 6) < 31.0
    ORDER BY doc_id
    """,
)
def corpus_quality_filter_q(spark: SparkSession, sf: str) -> DataFrame:
    """The composed pre-training quality-filter pass: token-count floor +
    Gopher duplicate-line ceiling + bigram-LM perplexity ceiling, one
    declarative pipeline (operators/text.py + operators/lm.py). Survivors
    with their signals — what a 100 TB filter stage emits before dedup."""
    from trino_spark.operators import lm as lmops
    from trino_spark.operators import text as textops

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    rep = textops.repetition_signals(d, "text", "doc_id").select("doc_id", "dup_line_frac")
    model, unigrams, v = lmops.train_bigram_lm(d)
    ppl = lmops.score_perplexity(d, model, unigrams, v)
    n_tok = textops.token_count(F.col("text"))
    feats = (
        d.select("doc_id", n_tok.alias("n_tokens"))
        .join(rep, "doc_id", "left")
        .na.fill(0.0, ["dup_line_frac"])
        .join(ppl, "doc_id")
    )
    return (
        feats.filter(
            (F.col("n_tokens") >= 20)
            & (F.round("dup_line_frac", 6) < 0.3)
            & (F.round("perplexity", 6) < 31.0)
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("dup_line_frac", 6).alias("dup_line_frac"),
            F.round("perplexity", 6).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


@REG.add(
    "embedding_label_centroids",
    """
    WITH per_dim AS (
      SELECT label, i AS dim, avg(list_extract(embedding, i)) AS m
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
      GROUP BY label, i
    )
    SELECT label,
           array_to_string(list(printf('%.6f', round(m, 6)) ORDER BY dim), ',') AS centroid_csv
    FROM per_dim
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_label_centroids_q(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity.label_centroids
    — explode + (label, dim)-keyed aggs, the class-prototype primitive).
    Oracle recomputes each dimension mean positionally; arrays emitted as
    CSV so the driver canonicalizer hashes them."""
    from trino_spark.operators import similarity

    emb = t(spark, sf, "embeddings")
    cent = similarity.label_centroids(emb)
    return cent.select(
        "label",
        F.array_join(
            F.transform(F.col("centroid"), lambda v: F.format_string("%.6f", F.round(v, 6))), ","
        ).alias("centroid_csv"),
    ).orderBy("label")


@REG.add(
    "corpus_prepare_e2e",
    r"""
    WITH raw AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 300 AND doc_id % 10 = 0
    ),
    tokd AS (
      SELECT doc_id, text,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM raw
    ),
    quality AS (SELECT * FROM tokd WHERE n_tokens >= 20),
    keyed AS (
      SELECT *,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS k
      FROM quality
    ),
    kept AS (
      SELECT keyed.* FROM keyed
      JOIN (SELECT k, min(doc_id) AS keep FROM keyed GROUP BY k) m
        ON keyed.k = m.k AND keyed.doc_id = m.keep
    ),
    base AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks
      FROM kept
    ),
    sh AS (
      SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                    for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS s
      FROM base
    ),
    bbase AS (
      SELECT string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks
      FROM documents WHERE doc_id < 300 AND doc_id % 50 = 0
    ),
    bench AS (
      SELECT DISTINCT unnest([array_to_string(toks[i:i+2], ' ')
                              for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS g
      FROM bbase
    ),
    ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
    hits AS (SELECT e.doc_id, count(*) AS h FROM ex e JOIN bench b ON e.g = b.g GROUP BY e.doc_id),
    clean AS (
      SELECT t.doc_id FROM sh t LEFT JOIN hits h USING (doc_id)
      WHERE round(CAST(coalesce(h.h, 0) AS DOUBLE) / greatest(len(t.s), 1), 9) < 0.1
    ),
    final AS (SELECT kept.* FROM kept JOIN clean USING (doc_id))
    SELECT stage, CAST(docs AS BIGINT) AS docs, CAST(tokens AS BIGINT) AS tokens
    FROM (
      SELECT 'a_raw' AS stage, count(*) AS docs, sum(n_tokens) AS tokens FROM tokd
      UNION ALL SELECT 'b_quality', count(*), sum(n_tokens) FROM quality
      UNION ALL SELECT 'c_dedup', count(*), sum(n_tokens) FROM kept
      UNION ALL SELECT 'd_clean', count(*), sum(n_tokens) FROM final
    )
    ORDER BY stage
    """,
)
def corpus_prepare_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The END-TO-END training-corpus preparation pipeline, composed from
    the section's operators in the order a real 100 TB run chains them:
    quality floor (token count) -> exact dedup keep-one (hash-groupBy on
    normalized content, operators/dedup.py) -> benchmark decontamination
    (broadcast 3-gram probe, dedup.decontaminate) -> per-stage corpus
    accounting (docs, tokens). Every stage is a declarative DataFrame op:
    one shuffle for the dedup group-by, a broadcast for the bench probe,
    everything else map-side. The oracle restates the full chain in SQL,
    so the differential checks the PIPELINE semantics end to end."""
    from trino_spark.functions.strings import normalize_text
    from trino_spark.operators import dedup as dedup_ops
    from trino_spark.operators.text import token_count

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id", "text")
    raw = d.unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    tokd = raw.withColumn("n_tokens", token_count(F.col("text")))
    quality = tokd.filter(F.col("n_tokens") >= 20)
    keyed = quality.withColumn("k", F.md5(normalize_text(F.col("text"))))
    mins = keyed.groupBy("k").agg(F.min("doc_id").alias("keep"))
    kept = keyed.join(mins, (keyed.k == mins.k) & (keyed.doc_id == mins.keep)).select(
        keyed.doc_id, keyed.text, keyed.n_tokens
    )
    bench = d.filter(F.col("doc_id") % 50 == 0).select("text")
    flags = dedup_ops.decontaminate(kept, bench, threshold=0.1)
    final = kept.join(flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id")
    stages = [
        ("a_raw", tokd),
        ("b_quality", quality),
        ("c_dedup", kept),
        ("d_clean", final),
    ]
    parts = [
        df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
        )
        for name, df in stages
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("stage")


@REG.add(
    "corpus_chunk_documents",
    """
    WITH d AS (
        SELECT doc_id, text,
               CAST(greatest(ceil((length(text) - 40) / 160.0), 1) AS BIGINT) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, unnest(range(0, n)) AS chunk_id, text FROM d
    )
    SELECT CAST(doc_id % 20 AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(length(substring(text, CAST(chunk_id * 160 + 1 AS INT), 200)))
                AS BIGINT) AS total_chars,
           CAST(max(chunk_id * 160 + 1) AS BIGINT) AS max_start
    FROM c
    GROUP BY doc_id % 20
    ORDER BY cell
    """,
)
def corpus_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking (operators/chunking.py): 200-char windows
    with 40-char overlap — sequence+explode+substring, all codegen, the
    RAG/pretraining windowing step. The oracle recomputes the identical
    windows with DuckDB range()+substring; per-bucket chunk counts,
    character totals, and max window start pin count, slicing, and
    stride arithmetic simultaneously."""
    from trino_spark.operators.chunking import chunk_documents

    chunks = chunk_documents(t(spark, sf, "documents"), "text", size=200, overlap=40)
    return (
        chunks.groupBy((F.col("doc_id") % 20).cast("bigint").alias("cell"))
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.length("chunk_text")).cast("bigint").alias("total_chars"),
            F.max("chunk_start").cast("bigint").alias("max_start"),
        )
        .orderBy("cell")
    )


@REG.add(
    "corpus_shuffle_buckets",
    """
    WITH keyed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 15))
                    AS BIGINT) AS k
        FROM documents
    )
    SELECT k % 64 AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(k) AS min_key,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM keyed
    GROUP BY 1
    ORDER BY 1
    """,
)
def corpus_shuffle_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global shuffle (operators/mixing.py): the 60-bit
    md5(id,seed) shuffle key is reproducible ACROSS ENGINES, so the oracle
    recomputes the identical keys in DuckDB and checks the per-bucket
    histogram (count + min key + id checksum) of the partition assignment
    — pinning determinism and uniformity of the one-shuffle corpus
    shuffle. 100 TB: key depends only on row identity; one hash exchange."""
    from trino_spark.operators.mixing import shuffle_key

    d = t(spark, sf, "documents")
    keyed = d.select("doc_id", shuffle_key(F.col("doc_id"), 42).alias("k"))
    return (
        keyed.groupBy(F.pmod("k", F.lit(64)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("k").alias("min_key"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("bucket")
    )


@REG.add(
    "corpus_mixture_sample",
    """
    WITH toks AS (
        SELECT doc_id, source,
               CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS _tokens
        FROM documents
    ),
    budget AS (
        SELECT CAST(0.4 AS DOUBLE) * sum(_tokens) AS b FROM toks
    ),
    ranked AS (
        SELECT source, _tokens,
               CASE WHEN source IN ('src0','src1','src2','src3')
                    THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.025 AS DOUBLE) END
                 * (SELECT b FROM budget) AS _target,
               coalesce(sum(_tokens) OVER (
                   PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _prior
        FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_tokens) AS BIGINT) AS sum_tokens
    FROM ranked
    WHERE _prior < _target
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixture sampling (operators/mixing.py): four head sources
    weighted 0.15, the sixteen tail sources 0.025, filled greedily in
    md5-ranked order until each source's share of a 40%-of-corpus token
    budget is reached. The oracle replays the identical window-prefix rule
    in DuckDB; per-source doc counts and token sums pin rank order, the
    running-sum boundary, and the weight map. 100 TB: one window pass per
    source partition, no iteration, scalar-only driver traffic."""
    from trino_spark.operators.mixing import mixture_sample, token_count

    d = t(spark, sf, "documents")
    total = d.select(F.sum(token_count(F.col("text")).cast("long"))).collect()[0][0]
    weights = {f"src{i}": (0.15 if i < 4 else 0.025) for i in range(20)}
    sel = mixture_sample(d, "source", weights, 0.4 * float(total))
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tokens").cast("bigint").alias("sum_tokens"),
        )
        .orderBy("source")
    )


@REG.add(
    "corpus_shard_balanced",
    """
    WITH toks AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS rk,
               CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS _tokens
        FROM documents
    ),
    w AS (
        SELECT _tokens,
               coalesce(sum(_tokens) OVER (
                   ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM toks
    )
    SELECT CAST(floor(prior / 4000.0) AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_tokens) AS BIGINT) AS sum_tokens
    FROM w
    GROUP BY 1
    ORDER BY 1
    """,
)
def corpus_shard_balanced(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget-balanced sharding (operators/mixing.py
    shard_by_token_budget): contiguous ~4000-token shards in deterministic
    md5 rank order, computed with bucket-prefix sums instead of a global
    single-partition sort. The oracle replays the global running-sum
    formula in DuckDB — equality proves the 16-bucket offset
    decomposition reproduces the exact global prefix sums."""
    from trino_spark.operators.mixing import shard_by_token_budget

    d = t(spark, sf, "documents")
    sharded = shard_by_token_budget(d, "doc_id", 4000.0)
    return (
        sharded.groupBy(F.col("_shard").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tokens").cast("bigint").alias("sum_tokens"),
        )
        .orderBy("shard_id")
    )


@REG.add(
    "text_boilerplate_ngrams",
    """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        FROM toks, unnest(range(1, len(w)-3)) AS t(i)
    ),
    freq AS (
        SELECT gram FROM g GROUP BY gram HAVING count(*) >= 3
    ),
    per_doc AS (
        SELECT toks.doc_id,
               count(g.gram) AS n_grams,
               count(freq.gram) AS n_boilerplate
        FROM toks
        LEFT JOIN g ON toks.doc_id = g.doc_id
        LEFT JOIN freq ON g.gram = freq.gram
        GROUP BY toks.doc_id
    )
    SELECT CAST(doc_id % 20 AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS grams,
           CAST(sum(n_boilerplate) AS BIGINT) AS boiler
    FROM per_doc
    GROUP BY 1
    ORDER BY 1
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document boilerplate spans (operators/text.py
    boilerplate_ngrams): 5-grams appearing in >= 3 distinct documents are
    corpus-frequent template text; per-doc distinct-gram and flagged-gram
    counts are bucket-aggregated. The oracle rebuilds the identical
    n-grams, document-frequency table, and flag join in DuckDB. Scale:
    explode -> one gram-keyed hash agg -> broadcast semi-join back."""
    from trino_spark.operators.text import boilerplate_ngrams

    d = t(spark, sf, "documents")
    per_doc = boilerplate_ngrams(d, n=5, min_docs=3)
    return (
        per_doc.groupBy((F.col("doc_id") % 20).cast("bigint").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("grams"),
            F.sum("n_boilerplate").cast("bigint").alias("boiler"),
        )
        .orderBy("cell")
    )


@REG.add(
    "dedup_duplicate_spans",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
      FROM documents
    ),
    grams AS (
      SELECT t.doc_id,
             i.i AS pos,
             array_to_string(t.tk[i.i + 1 : i.i + 5], ' ') AS gram
      FROM toks t,
           LATERAL (SELECT unnest(range(0, greatest(len(t.tk) - 4, 0))) AS i) i
    ),
    freq AS (
      SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
    ),
    dup AS (
      SELECT g.doc_id, g.pos,
             g.pos - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS isl
      FROM grams g JOIN freq f ON g.gram = f.gram
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(min(pos) AS BIGINT)           AS span_start,
           CAST(max(pos) + 5 AS BIGINT)       AS span_end,
           CAST(max(pos) + 5 - min(pos) AS BIGINT) AS span_tokens
    FROM dup
    GROUP BY doc_id, isl
    ORDER BY doc_id, span_start
    """,
)
def dedup_duplicate_spans_q(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-level exact dedup (operators/dedup.py duplicate_spans —
    the span analog of the exact-substring procedure in public LLM
    training-data reports): duplicated >= 5-token runs shared anywhere
    in the corpus, merged into maximal per-doc spans. The oracle
    restates the whole pipeline relationally (k-gram lateral unnest,
    frequency filter, pos - row_number islands). Plan: one explode, one
    hash exchange on the gram key, a same-key join back, one per-doc
    window — no all-pairs."""
    from trino_spark.operators.dedup import duplicate_spans

    return duplicate_spans(t(spark, sf, "documents"), k=5).orderBy(
        "doc_id", "span_start"
    )


@REG.add(
    "text_ngram_repetition",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    g2 AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
    ),
    g3 AS (
      SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
      FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
    c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
    a2 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM c2 GROUP BY doc_id),
    a3 AS (SELECT doc_id, count(*) AS dis, sum(c) AS tot FROM c3 GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(a2.tot, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN a2.tot > 0 THEN CAST(a2.mx AS DOUBLE) / CAST(a2.tot AS DOUBLE)
                ELSE 0.0 END AS top_bigram_frac,
           CASE WHEN a3.tot > 0 THEN 1.0 - CAST(a3.dis AS DOUBLE) / CAST(a3.tot AS DOUBLE)
                ELSE 0.0 END AS dup_trigram_frac
    FROM documents d
    LEFT JOIN a2 USING (doc_id)
    LEFT JOIN a3 USING (doc_id)
    ORDER BY doc_id
    LIMIT 30
    """,
)
def text_ngram_repetition_q(spark: SparkSession, sf: str) -> DataFrame:
    """Occurrence-count n-gram repetition signals (operators/text.py
    ngram_repetition_signals): top-bigram occupancy + duplicated-
    trigram fraction — the occurrence-side complement of the
    char-coverage signals in text_repetition_signals. Codegen explode
    + (doc, gram) hash agg."""
    from trino_spark.operators.text import ngram_repetition_signals

    return (
        ngram_repetition_signals(t(spark, sf, "documents"))
        .orderBy("doc_id")
        .limit(30)
    )


@REG.add(
    "dedup_semantic_keep",
    """
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 1.5)
      FROM embeddings WHERE vec_id % 7 = 0
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON b.vec_id > a.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.99
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS vec_id,
           CAST(least(u, min(v)) AS BIGINT) AS component,
           least(u, min(v)) = u AS kept
    FROM reach
    GROUP BY u
    ORDER BY vec_id
    """,
)
def dedup_semantic_keep_q(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup: embedding near-dup pairs (banded
    LSH + exact cosine verify) -> connected components (min-label +
    path halving) -> keep the minimum id of each semantic group. The
    published pipeline stage for pruning semantically redundant
    training data, composed from the two gate-green operators. The
    oracle recomputes groups with an exact all-pairs join + recursive
    transitive closure."""
    from trino_spark.operators import similarity
    from trino_spark.operators.components import connected_components

    emb = t(spark, sf, "embeddings")
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 1.5
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(planted)
    pairs = similarity.embedding_neardup_pairs(corpus, threshold=0.99).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(
        F.col("node").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("node") == F.col("component")).alias("kept"),
    ).orderBy("vec_id")
