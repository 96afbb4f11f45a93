"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline surface: token statistics, quality
scoring, language-ID heuristics, and document fingerprinting. All hot-path
logic is built-in Spark SQL functions (JVM-side, codegen) — no Python UDFs.

The token model is a plain single-space split (the synthetic corpus is
single-spaced); every expression is mirrored exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from allora_indexer_spark.operators.hashutil import md5_hex32_duck, md5_hex32_spark
from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import load_table, widen_if_narrow

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q30_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(replace(text, ' ', '')) AS n_nonspace_chars,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len,
           len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN})))
             AS n_stopwords
    FROM documents
    """,
)
def q30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting — whitespace tokenizer, distinct-token
    count, average token length, stopword count. All array built-ins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_nonspace_chars"),
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
        F.size(
            F.filter(toks, lambda w: w.isin(*STOPWORDS))
        ).alias("n_stopwords"),
    )


@query(
    "q31_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN})))
               AS n_stop
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
             + 0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)
             + 0.2 * least(5.0 * (CAST(n_stop AS DOUBLE) / n_tokens), 1.0)
             AS quality_score
    FROM t
    """,
)
def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality score: length saturation + type/token ratio
    + stopword-rate term. Same shape as production quality filters
    (length/punct/stopword mixes); weights are fixed, arithmetic is written
    in the same order in both engines for bit-identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).alias("n_stop"),
    )
    ttr = F.col("n_distinct").cast("double") / F.col("n_tokens")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    score = (
        F.lit(0.4) * F.least(F.col("n_tokens").cast("double") / F.lit(64.0), F.lit(1.0))
        + F.lit(0.4) * ttr
        + F.lit(0.2) * F.least(F.lit(5.0) * stop_ratio, F.lit(1.0))
    )
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        ttr.alias("type_token_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


@query(
    "q32_corpus_stats_by_lang",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(18,4))), 4) AS DOUBLE) / COUNT(*)
             AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def q32_corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup by (lang, source) — the 'what's in my
    training mix' query."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (
            F.round(F.sum(F.col("n_chars").cast("decimal(18,4)")), 4).cast("double")
            / F.count("*")
        ).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q33_language_id",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang AS labeled_lang,
             len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN})))
               AS en_markers,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, labeled_lang, en_markers,
           CASE WHEN CAST(en_markers AS DOUBLE) / n_tokens >= 0.02
                THEN 'en' ELSE 'und' END AS pred_lang
    FROM feat
    """,
)
def q33_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-marker language-ID heuristic (stopword-marker rate → en/und).

    The synthetic corpus shares one vocabulary across langs, so this pins the
    *plumbing* (marker extraction → rate → decision rule); swapping in real
    per-language marker lists is a data change, not a code change."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    feat = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).alias("en_markers"),
        F.size(toks).alias("n_tokens"),
    )
    return feat.select(
        "doc_id",
        "labeled_lang",
        "en_markers",
        F.when(
            F.col("en_markers").cast("double") / F.col("n_tokens") >= 0.02, "en"
        )
        .otherwise("und")
        .alias("pred_lang"),
    )


@query(
    "q34_bow_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fingerprint
      FROM documents
    )
    SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(*) >= 1
    """,
)
def q34_bow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words document fingerprint (md5 of the sorted distinct token
    set) → cluster + keeper selection. The fingerprint-dedup pattern: any two
    docs with identical vocabulary collapse to one cluster."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
        ).alias("fingerprint"),
    )
    return fp.groupBy("fingerprint").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )


@query(
    "q55_top_tokens_per_lang",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
      SELECT lang, token, COUNT(*) AS n
      FROM tok WHERE token <> '' GROUP BY lang, token
    ), ranked AS (
      SELECT lang, token, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
      FROM counts
    )
    SELECT lang, token, n, rk FROM ranked WHERE rk <= 10
    """,
)
def q55_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary head: tokenize → explode → count → top-10 by
    window rank (ties broken lexically for determinism). The shape behind
    corpus frequency tables and stopword induction. Scale: explode is
    map-side; the (lang, token) aggregate combines partially before its
    shuffle, and the final rank partitions by lang — the vocabulary, not
    the corpus, crosses the wire."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )


_Q64_SCORE_DUCK = (
    "0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)"
    " + 0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)"
    " + 0.2 * LEAST(5.0 * (CAST(n_stop AS DOUBLE) / n_tokens), 1.0)"
)


@query(
    "q64_curated_corpus",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, md5(text) AS h,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN})))
               AS n_stop
      FROM documents
    ), k AS (
      SELECT h, MIN(doc_id) AS keeper FROM t GROUP BY h
    )
    SELECT t.doc_id, t.lang, t.n_tokens,
           {_Q64_SCORE_DUCK} AS quality_score
    FROM t JOIN k ON t.h = k.h
    WHERE t.doc_id = k.keeper
      AND t.n_tokens >= 8
      AND {_Q64_SCORE_DUCK} >= 0.5
    """,
)
def q64_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: the end-to-end corpus-curation selection in ONE plan —
    exact-dedup canonical representative (q40) ∧ length gate ∧ quality
    threshold (q31's scoring) — i.e. the filter a training-data pipeline
    applies before tokenization. Composing the stages declaratively lets
    Catalyst share the single documents scan across the hash, token, and
    score branches; the only shuffle is the dedup groupBy on the 32-byte
    content hash. Same arithmetic order in both engines → exact match."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).alias("n_stop"),
    )
    score = (
        F.lit(0.4)
        * F.least(F.col("n_tokens").cast("double") / F.lit(64.0), F.lit(1.0))
        + F.lit(0.4) * (F.col("n_distinct").cast("double") / F.col("n_tokens"))
        + F.lit(0.2)
        * F.least(
            F.lit(5.0) * (F.col("n_stop").cast("double") / F.col("n_tokens")),
            F.lit(1.0),
        )
    )
    k = t.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    return (
        t.join(k, "h")
        .filter(
            (F.col("doc_id") == F.col("keeper"))
            & (F.col("n_tokens") >= 8)
            & (score >= 0.5)
        )
        .select("doc_id", "lang", "n_tokens", score.alias("quality_score"))
    )


SAMPLE_RATES = {"en": 50, "es": 30}  # percent per language
DEFAULT_SAMPLE_RATE = 20  # every other language
# one CASE expression derived from the dict, shared verbatim by the Spark
# plan and the DuckDB oracle — editing SAMPLE_RATES changes both engines
_RATE_CASE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items())
    + f" ELSE {DEFAULT_SAMPLE_RATE} END"
)
# md5-derived bucket in [0,100): first 8 hex chars as int, mod 100 —
# identical in both engines, so the sample is REPRODUCIBLE across runs,
# engines, and cluster sizes (unlike rand()/TABLESAMPLE).
_BUCKET_DUCK = md5_hex32_duck("CAST(doc_id AS VARCHAR)") + " % 100"


@query(
    "q69_stratified_hash_sample",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang, {_BUCKET_DUCK} AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket FROM s
    WHERE bucket < {_RATE_CASE_SQL}
    """,
)
def q69_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data mixes: each doc
    hashes to a stable bucket in [0,100) (md5 of its id) and survives iff
    bucket < its language's rate. Unlike rand()/TABLESAMPLE this is
    reproducible across engines, reruns, and partitionings — rerunning the
    mix build yields the same corpus, and raising a language's rate only
    ADDS documents (buckets are stable), which is what incremental mix
    iteration needs. Pure map-side: no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.expr(md5_hex32_spark("CAST(doc_id AS STRING)")) % 100
    ).alias("bucket")
    rate = F.expr(_RATE_CASE_SQL)
    return (
        docs.select("doc_id", "lang", bucket)
        .filter(F.col("bucket") < rate)
    )


@query(
    "q72_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS term_count
      FROM toks GROUP BY doc_id, token
    ),
    -- tf is distinct on (doc_id, token), so a COUNT(*) window partitioned by
    -- token IS the document frequency: no second corpus scan, no join.
    weighted AS (
      SELECT doc_id, token, term_count,
             COUNT(*) OVER (PARTITION BY token) AS doc_freq
      FROM tf
    ),
    scored AS (
      SELECT doc_id, token, term_count, doc_freq,
             CAST(term_count AS DOUBLE) / doc_freq AS salience,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY CAST(term_count AS DOUBLE) / doc_freq DESC,
                        token) AS rnk
      FROM weighted
    )
    SELECT doc_id, token, term_count, doc_freq, salience, rnk
    FROM scored WHERE rnk <= 5
    """,
)
def q72_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-family term salience: per-document term frequency weighted by
    inverse document frequency, top-5 terms per document. The weight is the
    exact ratio term_count/doc_freq (one correctly-rounded IEEE division,
    bit-identical across engines) rather than tf*ln(N/df) — ln() is not
    guaranteed to round identically across engines, and the ratio induces
    the same per-document ranking family. Ties break on the token itself.

    Scale: corpus scan → partial (doc, token) aggregate → document
    frequency as a partial-aggregating groupBy on token JOINED BACK, not a
    token-partitioned window: a stopword appears in nearly every document,
    and a window would sort that token's entire (doc, token) row set in
    one partition — the unbounded-straggler shape. The groupBy collapses
    hot tokens map-side, the df table is one row per distinct token (AQE
    broadcasts it at every realistic vocabulary size), and the final top-5
    window partitions on doc_id, the natural parallel grain."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("term_count"))
    # tf is distinct on (doc_id, token), so COUNT(*) per token IS the
    # document frequency — no COUNT(DISTINCT) anywhere
    df_counts = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    salience = F.col("term_count").cast("double") / F.col("doc_freq")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("salience").desc(), F.col("token")
    )
    return (
        tf.join(df_counts, "token")
        .withColumn("salience", salience)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "token", "term_count", "doc_freq", "salience", "rnk")
    )


# Shared regex constants for q76 — identical pattern/replacement text feeds
# both engines (Java regex and RE2 agree on this ASCII word-boundary subset).
_SCRUB_PAT = r"\b(the|a|of|and|to|in)\b"
_SQUEEZE_PAT = r" {2,}"


@query(
    "q76_stopword_scrub",
    oracle=f"""
    WITH scrubbed AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '{_SCRUB_PAT}')) AS n_scrubbed,
             trim(regexp_replace(
               regexp_replace(text, '{_SCRUB_PAT}', '', 'g'),
               '{_SQUEEZE_PAT}', ' ', 'g')) AS cleaned
      FROM documents
    )
    SELECT doc_id, source, n_scrubbed,
           length(cleaned) AS cleaned_len,
           md5(cleaned) AS cleaned_md5
    FROM scrubbed
    """,
)
def q76_stopword_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/stopword scrubbing — the regex-normalization pass of a
    training-data pipeline: count pattern hits, strip them, re-squeeze
    whitespace, and fingerprint the cleaned text (md5 — identical hex in
    both engines) so downstream exact-dedup runs on normalized content.

    Scale: pure per-row JVM regexp in whole-stage codegen — no shuffle at
    all; the md5 fingerprint is what the q40 exact-dedup family would
    consume, so scrub+dedup composes into scrub's scan plus q40's single
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace("text", _SCRUB_PAT, ""), _SQUEEZE_PAT, " "
        )
    )
    return docs.select(
        "doc_id",
        "source",
        F.regexp_count("text", F.lit(_SCRUB_PAT)).alias("n_scrubbed"),
        F.length(cleaned).alias("cleaned_len"),
        F.md5(cleaned).alias("cleaned_md5"),
    )


@query(
    "q79_source_quota_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_order
      FROM documents
    )
    SELECT doc_id, source, lang, pick_order
    FROM ranked WHERE pick_order <= 10
    """,
)
def q79_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping for corpus balancing: keep at most K=10
    docs per source, chosen by stable hash order (md5 of the doc id) so
    the 'random' subset is reproducible across runs and engines — the
    down-sampling step that stops one crawl dump from dominating the mix
    (composes with q69's stratified rate sampling: cap = hard ceiling,
    rate = proportional thinning).

    Scale: one shuffle on source + WindowGroupLimit, which keeps only the
    K smallest hashes per source on the map side before the sort — the
    shuffle moves O(K x sources) rows, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("pick_order", F.row_number().over(w))
        .filter(F.col("pick_order") <= 10)
    )


@query(
    "q80_repetition_score",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS gram
      FROM w
    ),
    gcounts AS (
      SELECT doc_id, gram, COUNT(*) AS n FROM grams GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_bigrams,
           MAX(n) AS max_bigram_count,
           CAST(MAX(n) AS DOUBLE) / SUM(n) AS repetition_ratio,
           (CAST(MAX(n) AS DOUBLE) / SUM(n) > 0.1) AS is_repetitive
    FROM gcounts GROUP BY doc_id
    """,
)
def q80_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram repetition scoring (C4/Gopher-family quality rule): the share
    of a document's bigrams taken by its single most frequent bigram —
    high values mean template/spam/loop text. Kept exact and
    cross-engine-deterministic: integer counts and one IEEE division.

    Scale: bigram counting is a per-document aggregation — partitioning on
    doc_id makes it map-side local; no corpus-wide state, no join. The
    duplicated-line/paragraph variants are the same plan over different
    gram extractors."""
    docs = load_table(spark, sf_dir, "documents")
    # widen a single-split scan before the per-position gram explode
    # (tables.widen_if_narrow — data-derived no-op on multi-split scans)
    w = widen_if_narrow(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    grams = w.select(
        "doc_id",
        F.explode(
            # Guard <2-token docs: Spark's sequence(1, 0) descends to 0 and
            # element_at(w, 0) throws (DuckDB's range() is empty, dropping
            # the doc on unnest — explode of array() matches that).
            F.expr(
                "CASE WHEN size(w) >= 2 THEN "
                "transform(sequence(1, size(w) - 1), "
                "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    gcounts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("n"))
    ratio = F.max("n").cast("double") / F.sum("n")
    return gcounts.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_bigrams"),
        F.max("n").alias("max_bigram_count"),
        ratio.alias("repetition_ratio"),
        (ratio > 0.1).alias("is_repetitive"),
    )


@query(
    "q85_bigram_lm_counts",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l
      FROM documents
    ), big AS (
      SELECT unnest(list_transform(generate_series(1, len(l)-1),
                                   i -> l[i] || ' ' || l[i+1])) AS bigram
      FROM t WHERE len(l) >= 2
    ), counts AS (
      SELECT bigram, string_split(bigram, ' ')[1] AS w1, COUNT(*) AS n
      FROM big GROUP BY bigram
    )
    SELECT bigram, w1, n,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY w1) AS DOUBLE)
             AS cond_p
    FROM counts
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
)
def q85_bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model counts: adjacent-token pairs per document
    (zip of the token list with itself shifted by one), global counts,
    and the conditional probability P(w2|w1) = n(w1 w2) / n(w1 *) via a
    window sum per first word; top-50 by count, ties broken lexically.
    The n-gram statistics pass behind KenLM-style corpus scoring and
    contamination n-gram indexes. Counts are integers and cond_p is one
    IEEE long/long division — bit-identical across engines.

    Scale: bigram construction is map-side (zip_with over slices, no
    shuffle); partial aggregation collapses each partition's pairs before
    the one shuffle on the bigram key, and the P(w2|w1) window partitions
    by w1 — vocabulary-sized state, never corpus-sized. Top-50 is
    TakeOrderedAndProject (per-partition heaps, no global sort).
    NOT widened (round 16): A/B'd 0.77 -> 0.90 s best-of-3 — the bigram
    zip is cheap string work, the aggregation exchange dominates."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    d = docs.select(toks.alias("l")).filter(F.size("l") >= 2)
    bigrams = F.zip_with(
        F.expr("slice(l, 1, size(l)-1)"),
        F.expr("slice(l, 2, size(l)-1)"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counts = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .withColumn("w1", F.split("bigram", " ")[0])
    )
    w = Window.partitionBy("w1")
    return (
        counts.select(
            "bigram",
            "w1",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
                "cond_p"
            ),
        )
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


@query(
    "q86_bigram_lm_doc_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      FROM documents
    ), dg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(l)-1),
                                   i -> l[i] || ' ' || l[i+1])) AS bigram
      FROM t WHERE len(l) >= 2
    ), counts AS (
      SELECT bigram, string_split(bigram, ' ')[1] AS w1, COUNT(*) AS n
      FROM dg GROUP BY bigram
    ), lm AS (
      SELECT bigram,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY w1) AS DOUBLE)
               AS cond_p
      FROM counts
    )
    SELECT dg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(ROUND(SUM(CAST(lm.cond_p AS DECIMAL(18,12))), 12) AS DOUBLE)
             / COUNT(*) AS avg_bigram_p
    FROM dg JOIN lm USING (bigram)
    GROUP BY dg.doc_id
    """,
)
def q86_bigram_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style corpus fluency scoring: train the bigram LM on the corpus
    (q85's counts + conditional probabilities), then score every document by
    the mean P(w2|w1) of its bigram occurrences — the model-based quality
    filter used to rank pretraining documents, with low scores flagging
    word-salad/template text. cond_p is one IEEE long/long division and the
    per-doc mean goes through a scale-12 decimal sum, so both engines agree
    bit-for-bit.

    Scale: the LM is vocabulary^2-bounded (aggregated BEFORE the join), the
    doc-gram stream stays corpus-sized but narrow (doc_id + bigram), and the
    join shuffles on the bigram key with partial aggregation on both sides.
    No per-document state, no window over the corpus; the doc-level mean is
    a plain hash aggregate on doc_id. NOT widened (round 16): A/B'd
    1.72 -> 1.85 s best-of-3 — see q85."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    d = docs.select("doc_id", toks.alias("l")).filter(F.size("l") >= 2)
    bigrams = F.zip_with(
        F.expr("slice(l, 1, size(l)-1)"),
        F.expr("slice(l, 2, size(l)-1)"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dg = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    counts = dg.groupBy("bigram").agg(F.count("*").alias("n")).withColumn(
        "w1", F.split("bigram", " ")[0]
    )
    lm = counts.select(
        "bigram",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("w1")).cast("double")
        ).alias("cond_p"),
    )
    return (
        dg.join(lm, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (
                F.round(F.sum(F.col("cond_p").cast("decimal(18,12)")), 12)
                .cast("double")
                / F.count("*")
            ).alias("avg_bigram_p"),
        )
    )


@query(
    "q87_corpus_composition",
    oracle="""
    WITH sl AS (
      SELECT source, lang, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST(n_docs AS DOUBLE)
             / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE)
             AS share_of_source
    FROM sl
    """,
)
def q87_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: the source x language breakdown (doc
    counts, char volume, each language's share within its source) that
    gates mixing decisions before a training run — the first dashboard
    anyone builds over a crawl. share_of_source is one IEEE long/long
    division on exact integer counts.

    Scale: one hash aggregate on (source, lang) with map-side partials —
    output is dimension-sized (sources x languages), so the share window
    runs on a tiny aggregate, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    return sl.select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy("source")).cast("double")
        ).alias("share_of_source"),
    )


@query(
    "q88_train_eval_split",
    oracle="""
    WITH tagged AS (
      SELECT source,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' AS is_train
      FROM documents
    )
    SELECT source,
           CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
             AS n_eval,
           COUNT(*) AS n_total
    FROM tagged GROUP BY source
    """,
)
def q88_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/eval split by content-free hash: a doc
    lands in train iff the first md5 byte of its id is < 0xcd (205/256 =
    80.1%), so membership is reproducible across runs, engines, and
    repartitioning — no rand(), no seed coordination, and adding documents
    never reshuffles existing assignments (the property that keeps eval
    sets stable as a corpus grows). Output is the per-source split census.

    Scale: embarrassingly parallel map (one md5 per row) + one
    dimension-sized hash aggregate; the split column itself can be
    partition-pruned when written as a partition key."""
    docs = load_table(spark, sf_dir, "documents")
    is_train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd"
    return (
        docs.select("source", is_train.alias("is_train"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("is_train"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(F.when(F.col("is_train"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_eval"),
            F.count("*").alias("n_total"),
        )
    )


CHUNK_TOKENS = 32  # chunk width
CHUNK_STRIDE = 24  # stride (8-token overlap between neighbors)


@query(
    "q92_token_chunking",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), starts AS (
      SELECT doc_id, w,
             unnest(range(1,
                          greatest(len(w) - {CHUNK_TOKENS} + {CHUNK_STRIDE}, 1)
                            + 1,
                          {CHUNK_STRIDE})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           array_to_string(w[start:start + {CHUNK_TOKENS} - 1], ' ')
             AS chunk_text,
           len(w[start:start + {CHUNK_TOKENS} - 1]) AS n_tokens
    FROM starts
    """,
)
def q92_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (width 32, stride 24) — the
    RAG-indexing / context-length preprocessing step that splits long
    documents into model-sized pieces with overlap so no boundary context
    is lost. Start positions are a STEPPED sequence from 1, so even an
    empty doc yields its single (possibly short) chunk and the sequence
    can never descend — the hazard the shingle guards exist for does not
    arise by construction.

    Scale: chunking is a map-side Generate over the pre-split token array
    (slice + concat inside the row, no shuffle anywhere); output rows
    ~ corpus_tokens / stride. Downstream embedding/dedup stages key on
    (doc_id, chunk_idx)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("w"))
    # the last start is the first stride point whose window reaches the
    # final token (len - W + S, floored at 1): a 33-token doc chunks as
    # [1..32] and [25..33], not a single window that drops the tail
    last_start = F.greatest(
        F.size("w") - CHUNK_TOKENS + CHUNK_STRIDE, F.lit(1)
    )
    starts = t.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(1), last_start, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("w"), F.col("start"), CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


PACK_BUDGET = 512  # token budget of one training-sequence pack


@query(
    "q95_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_prev
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(cum_prev // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cum_prev % {PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM c
    """,
)
def q95_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing prep: assign each document a (pack_id,
    pack_offset) inside fixed token-budget packs, sequentially per source
    in doc_id order — the deterministic cumulative-budget variant of
    greedy sequence packing used to build fixed-context training batches
    (docs may straddle a boundary; the tokenizer-side splitter consumes
    the offsets). pack_id = floor(prefix_sum / budget).

    Scale: the prefix sum is TWO-LEVEL (the bucketed-window idiom of the
    q71 gap detector): a naive per-source running total sorts a source's
    entire corpus slice in one partition — with a handful of sources,
    that is 1/|sources| of 100 TB in a single task. Instead docs cumsum
    inside doc_id-range buckets (partition size <= bucket width) and each
    bucket adds the exclusive running total of the per-bucket sums, a
    window over O(buckets) aggregate rows. Identical arithmetic, bounded
    partitions; packs never materialize, only labels, so output stays
    corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    bucket_w = 256  # docs per cumsum bucket — the per-task sort bound
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.floor(F.col("doc_id") / bucket_w).alias("bk"),
    )
    win = (
        Window.partitionBy("source", "bk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    # exclusive running total of bucket sums, over one row per bucket
    wb = (
        Window.partitionBy("source")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        t.groupBy("source", "bk")
        .agg(F.sum("n_tokens").alias("bk_sum"))
        .select(
            "source",
            "bk",
            F.coalesce(F.sum("bk_sum").over(wb), F.lit(0)).alias("bk_prev"),
        )
    )
    cum_prev = F.col("_intra") + F.col("bk_prev")
    return (
        t.withColumn("_intra", intra)
        .join(offsets, ["source", "bk"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor(cum_prev / PACK_BUDGET).alias("pack_id"),
            (cum_prev % PACK_BUDGET).cast("bigint").alias("pack_offset"),
        )
    )


# ---------------------------------------------------------------------------
# q99w: BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "table", "hash")
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


# The full BM25 scoring pipeline as shared DuckDB CTE text — q99w ranks it
# directly; q99x (similarity.py) fuses it with the dense ranking.
_BM25_SCORED_CTES = f"""d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         string_split(text, ' ') AS w
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM d
), tf AS (
  SELECT doc_id, dl, token, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(w) AS token FROM d)
  WHERE token IN ({_BM25_IN})
  GROUP BY doc_id, dl, token
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), term_scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(CAST(
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1} + 1.0))
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * (tf.dl / stats.avgdl)))
         AS DECIMAL(28,10)), 10) AS DECIMAL(28,10)) AS term_score
  FROM tf, stats JOIN df ON tf.token = df.token
), bm AS (
  SELECT doc_id,
         CAST(SUM(term_score) AS DOUBLE) AS bm25,
         COUNT(*) AS n_terms_hit
  FROM term_scored GROUP BY doc_id
)"""


def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 scores for the fixed _BM25_TERMS query (no
    limit) — the Spark twin of _BM25_SCORED_CTES, shared by q99w's direct
    ranking and q99x's hybrid fusion. Columns: doc_id, bm25,
    n_terms_hit."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.split("text", " ").alias("w"),
    )
    stats = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", "dl", F.explode("w").alias("token"))
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    sat = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1
        * (1.0 - _BM25_B + _BM25_B * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .join(F.broadcast(df), "token")
        .select(
            "doc_id",
            F.round((idf * sat).cast("decimal(28,10)"), 10)
            .cast("decimal(28,10)")
            .alias("term_score"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("term_score").cast("double").alias("bm25"),
        F.count("*").alias("n_terms_hit"),
    )


@query(
    "q99w_bm25_ranking",
    oracle=f"""
    WITH {_BM25_SCORED_CTES}
    SELECT doc_id, bm25, n_terms_hit
    FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPK}
    """,
)
def q99w_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson et al., TREC-3; the +1-smoothed
    idf of Lucene/ES) for a fixed conjunctive term set — THE lexical
    scorer a RAG pipeline runs beside q51's dense retrieval. Term
    frequencies, document frequencies, document length and the corpus
    average length all come from one token pass; idf·tf saturation per
    (doc, term) is quantized to DECIMAL(28,10) before the per-doc sum, so
    the only libm call (one ln per TERM — 3 values total) is evaluated on
    identical inputs in both engines and any sub-quantum ulp disagreement
    is rounded away before it can perturb the ranking.

    Scale: the token explode filters to the query terms AT THE SCAN
    (predicate on the exploded token — corpus tokens never shuffle), df
    and the corpus stats are broadcast 1-row/3-row aggregates, and the
    final ranking is TakeOrdered top-k, never a global sort."""
    return (
        bm25_doc_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# BPE merge-step statistics (tokenizer vocabulary induction)
# ---------------------------------------------------------------------------

BPE_TOPK = 20  # merge candidates surfaced per iteration


@query(
    "q99zo_bpe_pair_stats",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
      SELECT word, COUNT(*) AS wn FROM w WHERE word <> '' GROUP BY word
    ), p AS (
      SELECT unnest(list_transform(range(1, len(word)),
                                   i -> substr(word, i, 2))) AS pair,
             wn
      FROM wc WHERE len(word) >= 2
    )
    SELECT pair,
           CAST(SUM(wn) AS BIGINT) AS pair_count,
           CAST(COUNT(*) AS BIGINT) AS n_positions
    FROM p GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT {BPE_TOPK}
    """,
)
def q99zo_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner statistic of BPE tokenizer training (Sennrich et al.
    2016): corpus-weighted adjacent-symbol-pair counts, whose argmax is
    the next merge. The classic trainer never rescans the corpus — it
    aggregates the corpus down to the word-frequency table once, then
    computes pair counts over WORD TYPES weighted by their frequency;
    this query is exactly that shape, surfacing the top-``BPE_TOPK``
    merge candidates (``pair_count`` = corpus occurrences, weighted;
    ``n_positions`` = distinct (word-type, position) slots). Symbols
    here are characters, i.e. iteration 0 of the merge loop; later
    iterations re-run the same plan over re-segmented words.

    Scale: the corpus-sized explode feeds a map-side-combinable count
    into a word-TYPE-sized table (vocabulary-sized, not corpus-sized —
    the heavy-tail compression every BPE trainer relies on); the pair
    explode runs over word types only, the pair aggregation is again
    partial-agg'd, and the final cut is TakeOrdered top-k, never a
    global sort. Integer counts end-to-end — bit-exact in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    wc = words.groupBy("word").agg(F.count("*").alias("wn"))
    pairs = wc.filter(F.length("word") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wn",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("wn").cast("bigint").alias("pair_count"),
            F.count("*").cast("bigint").alias("n_positions"),
        )
        .orderBy(F.desc("pair_count"), "pair")
        .limit(BPE_TOPK)
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV-rate audit (tokenizer vocab sizing)
# ---------------------------------------------------------------------------

VOCAB_V = 12  # closed-vocabulary size under audit (the synthetic corpus
# has ~31 word types, so a 12-word head leaves a real OOV tail to score)


@query(
    "q99zt_vocab_coverage",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), wn AS (
      SELECT doc_id, word FROM w WHERE word <> ''
    ), vc AS (
      SELECT word, COUNT(*) AS c FROM wn GROUP BY word
    ), v AS (
      SELECT word FROM vc ORDER BY c DESC, word LIMIT {VOCAB_V}
    ), p AS (
      SELECT wn.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oov
      FROM wn LEFT JOIN v USING (word)
      GROUP BY wn.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_tokens, 0) AS n_tokens,
           COALESCE(p.n_oov, 0) AS n_oov,
           CASE WHEN COALESCE(p.n_tokens, 0) > 0
                THEN CAST(p.n_oov AS DOUBLE) / p.n_tokens
                ELSE 0.0 END AS oov_frac
    FROM documents d LEFT JOIN p USING (doc_id)
    """,
)
def q99zt_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus-derived top-{VOCAB_V}
    vocabulary — the coverage report that sizes a closed vocab before
    tokenizer training (and, inverted, the coverage-vs-V curve every
    tokenizer paper tabulates): a document whose tokens fall mostly
    outside the vocabulary head will fragment into UNK/byte-fallback
    pieces. Complements q55 (which lists the head per language) by
    scoring every DOCUMENT against the head; q99zo's BPE statistics then
    decide how the tail gets merged into subwords.

    Scale: the vocabulary derives from the word-TYPE table
    (map-side-combined count, TakeOrdered top-V — no global sort), and
    membership is a BROADCAST left join of the {VOCAB_V}-row vocab
    against the exploded corpus — the corpus shuffles once, on the
    per-doc aggregation (partial-agg'd). Zero-token docs surface with
    zeros via the left join (the short-doc rule)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    vc = words.groupBy("word").agg(F.count("*").alias("c"))
    vocab = (
        vc.orderBy(F.desc("c"), "word")
        .limit(VOCAB_V)
        .select("word", F.lit(1).alias("inv"))
    )
    per_doc = (
        words.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("inv").isNull(), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias(
                "n_tokens"
            ),
            F.coalesce("n_oov", F.lit(0).cast("bigint")).alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.col("n_oov").cast("double") / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("oov_frac"),
        )
    )
