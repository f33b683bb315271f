"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure column expressions (codegen; zero Python on the hot path), so each
is also SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trino_spark.functions.strings import normalize_text

# Minimal per-language marker sets for the n-gram/stopword heuristic
# (language-ID over web text normally uses char-trigram models; marker words
# are the degenerate-but-deterministic version that suits synthetic corpora).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (Trino-side analog: cardinality(split(...)))."""
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token estimate: word-piece split on 4-char chunks —
    ceil(len(word)/4) summed. A deterministic stand-in for a BPE vocab."""
    return F.aggregate(
        tokens(text), F.lit(0).cast("long"), lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append standard quality-score features (Gopher/C4-style filters):
    length, token stats, punctuation/digit/space ratios, mean word length."""
    c = F.col(text_col)
    n_tok = token_count(c)
    n_chars = F.length(c)
    return (
        df.withColumn("n_chars_m", n_chars.cast("long"))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_word_len",
            F.when(n_tok > 0, (F.length(F.regexp_replace(c, r"\s+", "")) / n_tok)).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_ratio", (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))) / F.greatest(n_chars, F.lit(1)))
        .withColumn("digit_ratio", (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))) / F.greatest(n_chars, F.lit(1)))
        .withColumn("space_ratio", (F.length(c) - F.length(F.regexp_replace(c, r"\s", ""))) / F.greatest(n_chars, F.lit(1)))
    )


def quality_score(text: Column | str) -> Column:
    """Scalar [0,1] quality score combining the feature family — monotone in
    'looks like prose'. Deterministic, documented weights."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    mean_wl = F.when(n_tok > 0, F.length(F.regexp_replace(c, r"\s+", "")) / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.3)
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1.0).otherwise(0.4)
    return F.round(len_ok * 0.6 + wl_ok * 0.4, 6)


def lang_scores(text: Column | str) -> Column:
    """map<string,double> of per-language marker-hit ratios."""
    toks = tokens(normalize_text(F.col(text) if isinstance(text, str) else text))
    n = F.greatest(F.size(toks), F.lit(1))
    entries = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(marker_arr, x)))
        entries.append(F.struct(F.lit(lang).alias("key"), (hits / n).alias("value")))
    return F.map_from_entries(F.array(*entries))


def detect_lang(text: Column | str) -> Column:
    """argmax over lang_scores with 'und' fallback when all-zero."""
    m = lang_scores(text)
    entries = F.map_entries(m)
    best = F.aggregate(
        entries,
        F.struct(F.lit("und").alias("key"), F.lit(0.0).alias("value")),
        lambda acc, e: F.when(e["value"] > acc["value"], e).otherwise(acc),
    )
    return best["key"]


def fingerprint(text: Column | str) -> Column:
    """Stable 128-bit content fingerprint of the normalized text (md5 hex)."""
    return F.md5(normalize_text(F.col(text) if isinstance(text, str) else text))


def rolling_hash(text: Column | str, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over characters (base 31, mod 2^31-1) —
    the per-window primitive for content-defined chunking."""
    chars = F.split(F.col(text) if isinstance(text, str) else text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(mod),
    )


def approx_top_k(
    df, key_col: str, k: int = 10, candidates_per_partition: int = 50
):
    """Scalable heavy hitters (Trino approx_most_frequent — reference:
    main/operator/aggregation/ApproximateMostFrequentHistogram.java,
    SpaceSaving sketch): per-partition local top-C candidates via
    mapInPandas (bounded memory regardless of key cardinality), then an
    exact global count restricted to the candidate union.

    Two-phase contract: any key in the true global top-k appears in at
    least one partition's local top-C when C >= k * (partition count
    imbalance factor) — C defaults to 5k. The final pass is an exact
    count over candidate keys only, so reported counts are exact (unlike
    raw SpaceSaving error bounds); only the candidate CUT is approximate.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    def local_top(batches):
        counts: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(cnt)
        top = sorted(counts.items(), key=lambda kv: -kv[1])[:candidates_per_partition]
        yield pd.DataFrame({key_col: [t[0] for t in top]})

    candidates = (
        df.select(key_col)
        .mapInPandas(local_top, schema=f"{key_col} string")
        .distinct()
    )
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), key_col)
        .limit(k)
    )


# ---------------------------------------------------------------- PII masking

# Pattern order matters: emails before phone-ish digit runs (an email's
# digits must not be half-masked first), IPs before bare digit runs.
_PII_PATTERNS: list[tuple[str, str]] = [
    # email addresses
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # IPv4
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    # US SSN
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # credit-card-ish 13-16 digit runs (optional spaces/dashes; must end
    # on a digit so trailing separators stay untouched)
    (r"\b\d(?:[ -]?\d){12,15}\b", "[CARD]"),
    # phone numbers: +cc / (area) / dashed forms, >= 7 digits total
    (r"(?<![\w.])(?:\+?\d{1,3}[ -.]?)?(?:\(\d{2,4}\)[ -.]?)?\d{3}[ -.]?\d{3,4}(?:[ -.]?\d{2,4})?(?![\w-])", "[PHONE]"),
]


def mask_pii(text: Column | str) -> Column:
    """Redact common PII shapes (emails, IPs, SSNs, card numbers, phones)
    with typed placeholder tokens — the standard pre-training scrub pass
    (cf. the PII filtering stage in public corpus pipelines; same
    regex-class approach as Presto/Trino deployments use via
    regexp_replace). Chained JVM regexp_replace expressions: no UDF, runs
    inside codegen at full scan speed."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in _PII_PATTERNS:
        c = F.regexp_replace(c, F.lit(pat), F.lit(repl))
    return c


def pii_counts(text: Column | str) -> Column:
    """struct of per-class PII match counts — the audit-side companion of
    mask_pii (count before you redact)."""
    c = F.col(text) if isinstance(text, str) else text
    names = ["emails", "ips", "ssns", "cards", "phones"]
    masked_prev = c
    fields = []
    for (pat, _repl), name in zip(_PII_PATTERNS, names):
        fields.append(F.size(F.regexp_extract_all(masked_prev, F.lit(pat), F.lit(0))).alias(name))
        masked_prev = F.regexp_replace(masked_prev, F.lit(pat), F.lit("_"))
    return F.struct(*fields)


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition metrics (the Gopher/MassiveText repetition
    filters; see also C4's line dedup): documents dominated by repeated
    lines or one repeated phrase are boilerplate/spam and get filtered
    before training.

      dup_line_frac       duplicate lines / total lines
      dup_line_char_frac  chars in lines occurring >1x / total line chars
      top_bigram_char_frac chars covered by the most frequent word 2-gram

    Shape: explode lines/bigrams -> two hash aggregations keyed by
    (document, unit) then (document) -> join back. Both shuffles are on the
    document id, so at 100 TB this partitions by document and never builds
    a per-executor state larger than one document's distinct units.
    Line/bigram splitting is pure expression (codegen); no UDFs.
    """
    c = F.col(text_col)
    lines = df.select(
        id_col, F.explode(F.filter(F.split(c, "\n"), lambda x: F.length(x) > 0)).alias("line")
    )
    line_stats = (
        lines.groupBy(id_col, "line")
        .agg(F.count("*").alias("cnt"), F.first(F.length("line")).alias("len"))
        .groupBy(id_col)
        .agg(
            (1.0 - F.sum(F.lit(1)) / F.sum("cnt")).alias("dup_line_frac"),
            (
                F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.col("len")).otherwise(0))
                / F.greatest(F.sum(F.col("cnt") * F.col("len")), F.lit(1))
            ).alias("dup_line_char_frac"),
        )
    )
    w = F.split(F.trim(c), r"\s+")
    bigrams_arr = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    bigrams = df.select(
        id_col,
        F.length(c).alias("n_chars_total"),
        F.explode(F.when(F.size(w) >= 2, bigrams_arr).otherwise(F.array())).alias("bigram"),
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "bigram")
        .agg(
            (F.count("*") * F.first(F.length("bigram"))).alias("covered"),
            F.first("n_chars_total").alias("n_chars_total"),
        )
        .groupBy(id_col)
        .agg(
            (F.max("covered") / F.greatest(F.first("n_chars_total"), F.lit(1))).alias(
                "top_bigram_char_frac"
            )
        )
    )
    return (
        df.select(id_col)
        .join(line_stats, id_col, "left")
        .join(bigram_stats, id_col, "left")
        .na.fill(0.0, ["dup_line_frac", "dup_line_char_frac", "top_bigram_char_frac"])
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate detection: an n-gram appearing in
    >= min_docs DISTINCT documents marks a repeated span (navigation
    chrome, license footers, template text — the spans web-corpus
    pipelines strip before training). Returns one row per document with
    `n_grams` (distinct n-grams) and `n_boilerplate` (how many of them
    are corpus-frequent).

    Scale shape: explode(distinct n-grams) → one hash aggregation keyed
    by gram for the document-frequency table, then a broadcast-friendly
    semi-join back onto the exploded grams — no all-pairs comparison;
    the frequent-gram table is tiny (corpus-wide repeated spans) and the
    rest is codegen expressions."""
    # The n-gram projection is the dominant CPU cost; a small local input
    # (one parquet file → one partition) would run it single-threaded, so
    # spread it first. At scale inputs arrive in many files/partitions and
    # this is a no-op branch.
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 16):
        df = df.repartition(min(target, 16))
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = df.select(F.col(id_col), F.explode_outer(grams).alias("gram"))
    freq = (
        per_doc.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("gram")
    )
    from pyspark.sql.functions import broadcast

    flagged = per_doc.join(
        broadcast(freq.withColumn("_freq", F.lit(1))), "gram", "left"
    )
    return flagged.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.count("_freq").alias("n_boilerplate"),
    )


def ngram_repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document n-gram repetition signals — complements
    `repetition_signals` (line-level + char-coverage) with the
    occurrence-count members of the same published rule family, as used by published
    LLM training-data quality filters (the Gopher/MassiveText rule
    family: fraction of tokens in the most frequent n-gram, fraction of
    duplicated n-gram occurrences).

    Output per input row: n_bigrams, top_bigram_frac (occurrences of
    the most frequent bigram / all bigram occurrences) and
    dup_trigram_frac (1 - distinct trigrams / trigram occurrences).
    Documents with fewer than n tokens report 0.0.

    100 TB plan shape: one explode (linear in tokens), a (doc, n, gram)
    hash aggregation with map-side combine, a per-doc re-aggregation,
    and a left join back onto the doc spine — all keyed by doc_id or
    finer, no skew surface beyond a single pathological document (which
    the per-doc key already isolates). Grams are CHAINED xxhash64 FOLDS
    over per-token hashes, never materialized strings (the
    duplicate_spans trick — occurrence counting only needs gram
    identity, and hashing cut this operator 7.1 s -> ~1.4 s at sf0.1);
    the projection-bound spread guard mirrors duplicate_spans too."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 16):
        df = df.repartition(min(target, 16))
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    th = F.transform(toks, lambda x: F.xxhash64(x))

    def gram_hashes(n: int):
        cnt = F.size(toks) - F.lit(n - 1)
        # sequence(1, 0) DESCENDS in Spark — the empty case must be an
        # explicit empty array (same guard as duplicate_spans)
        idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.aggregate(
                F.slice(th, i, n),
                F.lit(0).cast("long"),
                lambda acc, h: F.xxhash64(acc, h),
            ),
        )

    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.concat(
                F.transform(
                    gram_hashes(2),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("g")),
                ),
                F.transform(
                    gram_hashes(3),
                    lambda g: F.struct(F.lit(3).alias("n"), g.alias("g")),
                ),
            )
        ).alias("ng"),
    ).select("_id", F.col("ng.n").alias("_n"), F.col("ng.g").alias("_g"))
    counts = grams.groupBy("_id", "_n", "_g").agg(F.count(F.lit(1)).alias("_c"))
    per = counts.groupBy("_id").agg(
        F.max(F.when(F.col("_n") == 2, F.col("_c"))).alias("_max2"),
        F.sum(F.when(F.col("_n") == 2, F.col("_c"))).alias("_tot2"),
        F.sum(F.when(F.col("_n") == 3, F.col("_c"))).alias("_tot3"),
        F.count(F.when(F.col("_n") == 3, F.lit(1))).alias("_dis3"),
    )
    spine = df.select(F.col(id_col).alias("_id"))
    return spine.join(per, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("_tot2"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.when(F.col("_tot2") > 0, F.col("_max2") / F.col("_tot2"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            F.col("_tot3") > 0, F.lit(1.0) - F.col("_dis3") / F.col("_tot3")
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )
