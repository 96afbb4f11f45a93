"""Similarity search over the ``embeddings`` table (array<float>, dim=64).

- brute-force cosine top-k (the exactness baseline),
- adjacent-pair cosine near-duplicate flagging,
- per-label norm statistics (the IVF coarse-quantizer building block).

Determinism across Spark/DuckDB: dot products and norms are emitted as an
unrolled 64-term double addition chain — both engines evaluate the identical
left-associated expression, so results are bit-identical (sqrt and division
are IEEE-correctly-rounded in both). High-scale decimal casts of arbitrary
doubles are NOT cross-engine-safe and are deliberately avoided.

Scale (100 TB story): brute-force top-k against a fixed query set is a
broadcast join (queries are small) + per-partition partial top-k via window
rank — no shuffle of the corpus. The LSH/IVF variants bound the candidate set
before the exact kernel runs (see q53/q53b).

Literature: random-projection LSH follows Indyk & Motwani (STOC 1998) and
Datar et al., "Locality-sensitive hashing scheme based on p-stable
distributions" (SoCG 2004); the IVF coarse-quantizer/probe structure (q53b)
is the inverted-file stage of Jegou, Douze & Schmid, "Product quantization
for nearest neighbor search" (TPAMI 2011).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from allora_indexer_spark.operators.hashutil import (
    md5_hex32_duck,
    md5_hex32_spark,
    mean_q9,
)
from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import (
    load_table,
    pin,
    pin_lazy,
    widen_if_narrow,
)

DIM = 64


def _dot(a: str, b: str, one_based: bool) -> str:
    """Unrolled dot-product expression; identical op order in both engines."""
    off = 1 if one_based else 0
    return " + ".join(
        f"CAST({a}[{i + off}] AS DOUBLE) * CAST({b}[{i + off}] AS DOUBLE)"
        for i in range(DIM)
    )


def _norm2(a: str, one_based: bool) -> str:
    return _dot(a, a, one_based)


@query(
    "q50_embedding_norms",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, sqrt({_norm2("embedding", True)}) AS l2_norm
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vectors,
           CAST(ROUND(SUM(CAST(l2_norm AS DECIMAL(18,6))), 6) AS DOUBLE) / COUNT(*)
             AS avg_norm,
           CAST(MIN(CAST(l2_norm AS DECIMAL(18,6))) AS DOUBLE) AS min_norm,
           CAST(MAX(CAST(l2_norm AS DECIMAL(18,6))) AS DOUBLE) AS max_norm
    FROM n GROUP BY label
    """,
)
def q50_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics — array math entirely JVM-side.

    The label column plays the coarse-cluster id; this is the per-centroid
    statistics pass an IVF index build runs. (Scale-6 decimal casts of O(1)
    doubles are cross-engine exact; see module docstring.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id", "label", F.expr(f"sqrt({_norm2('embedding', False)})").alias("l2_norm")
    )
    return n.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        (
            F.round(F.sum(F.col("l2_norm").cast("decimal(18,6)")), 6).cast("double")
            / F.count("*")
        ).alias("avg_norm"),
        F.min(F.col("l2_norm").cast("decimal(18,6)")).cast("double").alias("min_norm"),
        F.max(F.col("l2_norm").cast("decimal(18,6)")).cast("double").alias("max_norm"),
    )


N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5


@query(
    "q51_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id, embedding FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ({_dot("q.embedding", "c.embedding", True)})
               / (sqrt({_norm2("q.embedding", True)})
                  * sqrt({_norm2("c.embedding", True)})) AS cosine
      FROM q JOIN c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) WHERE rk <= {TOP_K}
    """,
)
def q51_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: K query vectors against the full corpus.

    Scale: the query set broadcasts (it is tiny by construction), so the
    corpus is scanned exactly once with no data-dependent shuffle;
    ROW_NUMBER over the per-query partition does the top-k. This is the
    exact baseline that the LSH/IVF approximate variants are measured
    against. The corpus side is widened when the scan arrives as fewer
    splits than the session parallelism (round 16 — the K-unrolled
    64-term dot products are the query's CPU and a single-row-group
    local file serialized them on one core; widen_if_narrow is a no-op
    on multi-split production scans, so no cluster run pays it)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = widen_if_narrow(emb, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    cosine = F.expr(
        f"({_dot('q_emb', 'c_emb', False)})"
        f" / (sqrt({_norm2('q_emb', False)}) * sqrt({_norm2('c_emb', False)}))"
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "q52_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ({_dot("a.embedding", "b.embedding", True)})
             / (sqrt({_norm2("a.embedding", True)})
                * sqrt({_norm2("b.embedding", True)})) AS cosine,
           CASE WHEN ({_dot("a.embedding", "b.embedding", True)})
                  / (sqrt({_norm2("a.embedding", True)})
                     * sqrt({_norm2("b.embedding", True)})) >= 0.3
                THEN TRUE ELSE FALSE END AS is_near_dup
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
)
def q52_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate check over candidate pairs (adjacent
    ids here; in production the candidates come from LSH buckets — q41/q43 —
    and this exact kernel is the verifier)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos_expr = (
        f"({_dot('ea', 'eb', False)})"
        f" / (sqrt({_norm2('ea', False)}) * sqrt({_norm2('eb', False)}))"
    )
    return (
        a.join(b, F.col("vec_b") == F.col("vec_a") + 1)
        .select(
            "vec_a",
            "vec_b",
            F.expr(cos_expr).alias("cosine"),
            # coalesce mirrors the oracle's CASE...ELSE FALSE: a
            # zero-norm vector makes cosine x/0 -> NULL in both engines,
            # and NULL >= 0.3 is NULL in Spark but FALSE in the oracle
            F.coalesce(F.expr(cos_expr) >= 0.3, F.lit(False)).alias(
                "is_near_dup"
            ),
        )
    )


@query("q53_ann_lsh")  # no oracle: LSH bucketing uses Spark-internal RNG
def q53_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH
    (pyspark.ml BucketedRandomProjectionLSH, fixed seed).

    The scale path for similarity search: hash the corpus once into buckets,
    then approxSimilarityJoin only compares within-bucket candidates.
    Accuracy is checked in tests/test_similarity.py as recall@k against the
    q51 brute-force baseline (driver records a rows-only check here since
    the bucket RNG is Spark-internal)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(emb)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    joined = model.approxSimilarityJoin(
        queries, emb, threshold=float("inf"), distCol="dist"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        joined.select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.col("dist"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "q54_embedding_dimension_stats",
    oracle=f"""
    WITH u AS (
      SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
             unnest(embedding) AS val
      FROM embeddings
    )
    SELECT dim, COUNT(*) AS n_values,
           {mean_q9("val")} AS avg_value,
           MIN(CAST(val AS DOUBLE)) AS min_value,
           MAX(CAST(val AS DOUBLE)) AS max_value
    FROM u GROUP BY dim
    """,
)
def q54_embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics of the embedding matrix via positional
    explode — the E3 parallel-array pattern (reference arrays_zip sites,
    /root/reference/db.go:909-920) as a standalone query, and the
    column-profile pass a quantizer (PQ/IVF training) runs first.

    posexplode is an ungrouped Generate: it streams map-side (no shuffle to
    produce the long form), then one Exchange on the 64 dim keys for the
    aggregate. At 100 TB the partial aggregation collapses each partition
    to <= 64 rows before the shuffle, so the Exchange is O(partitions), not
    O(rows x dim). The mean uses the shared tie-safe quantized sum
    (hashutil.mean_q9 — double->decimal CAST ties diverge per engine);
    min/max of doubles are order-free and exact as is."""
    emb = load_table(spark, sf_dir, "embeddings")
    long = emb.select(F.posexplode("embedding").alias("dim", "val"))
    return long.groupBy("dim").agg(
        F.count("*").alias("n_values"),
        F.expr(mean_q9("val")).alias("avg_value"),
        F.min(F.col("val").cast("double")).alias("min_value"),
        F.max(F.col("val").cast("double")).alias("max_value"),
    )


@query(
    "q59_zipwith_cosine_adjacent",
    oracle=f"""
    WITH p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    )
    SELECT vec_a, vec_b,
           {_dot("ea", "eb", True)} AS dot,
           sqrt({_norm2("ea", True)}) * sqrt({_norm2("eb", True)}) AS norm_prod
    FROM p
    """,
)
def q59_zipwith_cosine_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair dot products via higher-order array functions:
    ``zip_with`` multiplies element-wise, ``aggregate`` left-folds the sum.
    Same kernel as q52's unrolled expression chain, expressed generically —
    the form that works for ANY dimension without code generation. The
    left-fold order equals the unrolled chain's left association, so the
    DuckDB oracle (explicit chain) matches bit-for-bit. All JVM-side:
    higher-order functions run inside codegen, no Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE),"
        " (acc, v) -> acc + v)"
    )

    def norm(side: str):
        return F.sqrt(
            F.expr(
                f"aggregate({side}.embedding, CAST(0 AS DOUBLE),"
                f" (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"
            )
        )

    return a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        dot.alias("dot"),
        (norm("a") * norm("b")).alias("norm_prod"),
    )


N_PROBE = 3  # clusters probed per query


N_CELLS = 8  # coarse-quantizer cells (k-means k); probe N_PROBE of them


@query("q53b_ann_ivf")  # no oracle: approximate by design; recall-gated test
def q53b_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors, IVF style: a k-means coarse quantizer
    (pyspark.ml, fixed seed) carves the corpus into N_CELLS Voronoi cells;
    each query probes only its N_PROBE nearest cells before the exact
    cosine rerank. (The synthetic ``label`` column is NOT usable as the
    cell id — its clusters are nearly orthogonal to cosine geometry, which
    drops recall to the nprobe/#cells floor; measured in-repo.)

    Scale (100 TB): fit the quantizer on a sample (k-means cost is
    O(sample·k·iters), independent of corpus size), assign cells in one
    map-side pass, write the corpus partitioned by cell. The centroid
    table is O(#cells) — broadcast both ways. The probe join then prunes
    the scan to nprobe/#cells of the data with whole-file skipping, and
    the exact kernel runs only inside probed cells. Recall is gated
    against q51 in tests/test_similarity.py (~0.9 at 8 cells/3 probes)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array
    emb = load_table(spark, sf_dir, "embeddings")
    feats = emb.withColumn("features", array_to_vector("embedding"))
    model = KMeans(k=N_CELLS, seed=7, maxIter=10).fit(feats)
    assigned = model.transform(feats).select(
        "vec_id",
        "embedding",
        F.col("prediction").alias("cell"),
    )
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell INT, centroid ARRAY<DOUBLE>",
    )
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # probe selection: distance query -> centroid, keep N_PROBE best cells
    q_dot = (
        "aggregate(zip_with(q_emb, centroid, (x, y) ->"
        " (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    wp = Window.partitionBy("query_id").orderBy(F.asc("l2sq"), F.asc("cell"))
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "q_emb", "cell", F.expr(q_dot).alias("l2sq"))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= N_PROBE)
        .select("query_id", "q_emb", "cell")
    )
    # candidate scan limited to probed cells, then exact cosine rerank
    cand = assigned.select(
        "cell",
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
    )
    cosine = F.expr(
        f"({_dot('q_emb', 'c_emb', False)})"
        f" / (sqrt({_norm2('q_emb', False)}) * sqrt({_norm2('c_emb', False)}))"
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(probes)
        .join(cand, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@query(
    "q89_label_centroids",
    oracle=f"""
    WITH u AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
             unnest(embedding) AS val
      FROM embeddings
    )
    SELECT label, dim, COUNT(*) AS n_vectors,
           {mean_q9("val")} AS centroid_value
    FROM u GROUP BY label, dim
    """,
)
def q89_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form (label, dim, mean) — one
    assignment-free k-means/IVF training step: the same posexplode +
    hash-aggregate shape q54 uses per dimension, keyed by (label, dim).
    The mean is the shared tie-safe quantized exact sum (hashutil.mean_q9):
    partition-order-independent AND engine-agnostic on .5e-9 cast ties.

    Scale: partial aggregation collapses every partition to at most
    labels x dims rows before the single Exchange — shuffle volume is
    O(partitions x labels x dims), never O(vectors). The long-form output
    re-packs to array centroids with array_agg when a consumer needs them;
    keeping it relational here preserves the exact-compare contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    long = emb.select("label", F.posexplode("embedding").alias("dim", "val"))
    return long.groupBy("label", "dim").agg(
        F.count("*").alias("n_vectors"),
        F.expr(mean_q9("val")).alias("centroid_value"),
    )


@query(
    "q96_scalar_quantization",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
      FROM embeddings
    ), s AS (
      SELECT vec_id, xd,
             list_max(list_transform(xd, x -> abs(x))) AS scale
      FROM e
    ), qq AS (
      SELECT vec_id, xd, scale,
             list_transform(xd,
               x -> CAST(floor(x * 127.0 / scale + 0.5) AS INTEGER)) AS q
      FROM s WHERE scale > 0
    )
    SELECT vec_id, scale,
           CAST(list_sum(q) AS BIGINT) AS sum_q,
           CAST(len(list_filter(q, v -> abs(v) = 127)) AS INTEGER)
             AS n_clipped,
           list_max(list_transform(range(1, len(xd) + 1),
             i -> abs(xd[i] - CAST(q[i] AS DOUBLE) * scale / 127.0)))
             AS max_abs_err
    FROM qq
    """,
)
def q96_scalar_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column with
    per-vector reconstruction diagnostics — the vector-compression pass an
    embedding store runs before ANN serving (4x smaller vectors; the IVF
    path of q53b consumes the same layout in production).

    Cross-engine exactness without a sum-order contract: every output is
    either element-wise double math in an identical expression shape
    (float→double widening is exact; `floor(x*127/scale + 0.5)` fixes the
    tie behavior both engines would otherwise choose differently), an
    integer aggregate (sum/count of int8 codes — commutative, exact), or a
    max (order-insensitive). All JVM-side higher-order functions: one scan,
    no shuffle, no Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("xd"),
    ).select(
        "vec_id",
        "xd",
        F.expr("array_max(transform(xd, x -> abs(x)))").alias("scale"),
    ).filter(F.col("scale") > 0)
    q = e.withColumn(
        "q",
        F.expr(
            "transform(xd, x -> CAST(floor(x * 127.0D / scale + 0.5D)"
            " AS INT))"
        ),
    )
    return q.select(
        "vec_id",
        "scale",
        F.expr(
            "aggregate(q, CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("sum_q"),
        F.expr("size(filter(q, v -> abs(v) = 127))").alias("n_clipped"),
        F.expr(
            "array_max(zip_with(xd, q, (x, v) ->"
            " abs(x - CAST(v AS DOUBLE) * scale / 127.0D)))"
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# q99x: hybrid retrieval — reciprocal-rank fusion of BM25 and dense cosine
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al., SIGIR 2009)
_RRF_DEPTH = 50  # per-ranker candidate depth
_RRF_TOPK = 10
_RRF_QUERY_VEC = 0  # the dense query: embedding of vec_id 0 (= doc_id 0)


from allora_indexer_spark.operators.textstats import (  # noqa: E402
    _BM25_SCORED_CTES,
    bm25_doc_scores,
)

_RRF_ORACLE = f"""
WITH {_BM25_SCORED_CTES},
lex AS (
  SELECT doc_id, rk AS lex_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
    FROM bm
  ) WHERE rk <= {_RRF_DEPTH}
),
qv AS (SELECT embedding AS q_emb FROM embeddings
       WHERE vec_id = {_RRF_QUERY_VEC}),
dense AS (
  SELECT doc_id, rk AS dense_rank FROM (
    SELECT c.vec_id AS doc_id,
           ROW_NUMBER() OVER (ORDER BY
             ({_dot("qv.q_emb", "c.embedding", True)})
               / (sqrt({_norm2("qv.q_emb", True)})
                  * sqrt({_norm2("c.embedding", True)})) DESC,
             c.vec_id) AS rk
    FROM embeddings c, qv WHERE c.vec_id <> {_RRF_QUERY_VEC}
  ) WHERE rk <= {_RRF_DEPTH}
)
SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
       lex.lex_rank, dense.dense_rank,
       COALESCE(1.0 / ({_RRF_K} + lex.lex_rank), 0.0)
         + COALESCE(1.0 / ({_RRF_K} + dense.dense_rank), 0.0)
         AS rrf_score
FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_TOPK}
"""


@query("q99x_hybrid_rrf", oracle=_RRF_ORACLE)
def q99x_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR
    2009 — the fusion Elasticsearch/OpenSearch ship for hybrid search) of
    the q99w lexical BM25 ranking and a dense cosine ranking against one
    query embedding, joined on the shared doc_id/vec_id key. Each ranker
    contributes 1/(60 + rank) for its top-50; documents surfaced by only
    one ranker keep that ranker's term — exactly why RRF is the RAG
    default: no score calibration between BM25's unbounded scale and
    cosine's [-1, 1].

    Determinism: ranks are integers (row_number with doc_id tie-breaks),
    1/(60+r) is one correctly-rounded division, and the two contributions
    are summed in a fixed written order — bit-identical across engines
    with no quantization needed.

    Scale: both rankers are the shapes already pinned elsewhere (BM25:
    scan-side term filter + broadcast stats; dense: broadcast query, one
    corpus scan); each cuts to top-50 via WindowGroupLimit-able
    row_number, the fusion joins two 50-row frames, and the final top-10
    is TakeOrdered."""
    lex = (
        bm25_doc_scores(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .alias("lex_rank"),
        )
        .filter(F.col("lex_rank") <= _RRF_DEPTH)
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") != _RRF_QUERY_VEC).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("c_emb")
    )
    cosine = F.expr(
        f"({_dot('q_emb', 'c_emb', False)})"
        f" / (sqrt({_norm2('q_emb', False)}) * sqrt({_norm2('c_emb', False)}))"
    ).alias("cosine")
    dense = (
        c.crossJoin(F.broadcast(q))
        .select("doc_id", cosine)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), "doc_id"))
            .alias("dense_rank"),
        )
        .filter(F.col("dense_rank") <= _RRF_DEPTH)
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(_RRF_TOPK)


# ---------------------------------------------------------------------------
# q99z / q99zw shared kernel: deterministic nearest-centroid assignment
# ---------------------------------------------------------------------------

# Exact cross-engine Voronoi assignment: per-label mean centroids (the
# q89 tie-safe quantized means), per-dimension squared residuals quantized
# to DECIMAL(28,14) so the 64-term distance reduction is partition-order-
# exact in both engines, argmin tie-broken on centroid label. Shared
# between q99z (purity evaluation) and q99zw (SemDeDup) so the two stay
# byte-identical twins of the Spark helper below.
_ASSIGN_CTES_DUCK = f"""
    u AS (
      SELECT vec_id, label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ), cent AS (
      SELECT label AS c_label, dim,
             {mean_q9("val")} AS cv
      FROM u GROUP BY label, dim
    ), dist AS (
      SELECT u.vec_id, u.label, cent.c_label,
             SUM(CAST(ROUND(CAST((u.val - cent.cv) * (u.val - cent.cv)
                                 AS DECIMAL(28,14)), 14)
                      AS DECIMAL(28,14))) AS d2
      FROM u JOIN cent ON u.dim = cent.dim
      GROUP BY u.vec_id, u.label, cent.c_label
    ), assigned AS (
      SELECT vec_id, label, c_label, d2 FROM (
        SELECT vec_id, label, c_label, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, c_label) AS rk
        FROM dist
      ) WHERE rk = 1
    )
"""


def _nearest_centroid_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark twin of ``_ASSIGN_CTES_DUCK``: (vec_id, label, c_label, d2)
    — every embedding assigned to its nearest per-label mean centroid,
    with the exact quantized distance to that centroid.

    Scale: centroids are labels x dims rows (broadcast); the long-form
    residual join partial-aggregates to (vector, candidate) rows before
    the shuffle; the argmin is a WindowGroupLimit-able row_number.

    The scan is widened when it arrives as fewer splits than the
    session parallelism (round 16, tables.widen_if_narrow — data-derived
    no-op on multi-split production scans): the 64-dim posexplode, the
    residual×candidate expansion and the partial aggregate all inherit
    the scan's split count, and a single-row-group local file serialized
    the whole family (q99z/q99zw/q99zx/q99zy) on one core."""
    emb = widen_if_narrow(
        load_table(spark, sf_dir, "embeddings"), "vec_id"
    )
    u = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "val"),
    ).withColumn("val", F.col("val").cast("double"))
    cent = u.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.expr(mean_q9("val")).alias("cv")
    )
    res = (F.col("val") - F.col("cv")) * (F.col("val") - F.col("cv"))
    dist = (
        u.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum(
                F.round(res.cast("decimal(28,14)"), 14).cast(
                    "decimal(28,14)"
                )
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# ---------------------------------------------------------------------------
# q99z: clustering evaluation — nearest-centroid assignment vs true labels
# ---------------------------------------------------------------------------


@query(
    "q99z_cluster_purity",
    oracle=f"""
    WITH {_ASSIGN_CTES_DUCK}
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN c_label = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN c_label = label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS purity
    FROM assigned GROUP BY label
    """,
)
def q99z_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering/quantizer EVALUATION: assign every embedding to its
    nearest per-label centroid (the q89 centroids) and report per-label
    purity — the quality gate run after every k-means/IVF training pass
    (is the coarse quantizer actually separating the classes the labels
    say exist?).

    Determinism and scale: see :func:`_nearest_centroid_assignment`
    (the shared exact Voronoi kernel this and q99zw both ride)."""
    assigned = _nearest_centroid_assignment(spark, sf_dir)
    hit = F.when(F.col("c_label") == F.col("label"), 1).otherwise(0)
    return assigned.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.sum(hit).cast("long").alias("n_correct"),
        (F.sum(hit).cast("double") / F.count("*")).alias("purity"),
    )


# ---------------------------------------------------------------------------
# q99zw: SemDeDup — embedding-cluster near-duplicate removal
# ---------------------------------------------------------------------------

# verified-pair cosine threshold (the synthetic corpus has no engineered
# embedding dups, so the q52 threshold keeps the removed set non-trivial
# yet bounded; production SemDeDup runs at ~0.95+ on real embeddings —
# tests/test_semdedup.py exercises that regime on a planted-duplicate
# fixture via the ``tau`` knob of :func:`semdedup`)
SEMDEDUP_TAU = 0.3

# target members per refined cell for ``n_cells="auto"``: the knob that
# makes intra-cell pair cost O(N * CELL_TARGET) instead of O(N^2/labels)
# — SemDeDup's own recipe (Abbas 2023 scales n_cells with the corpus;
# LAION runs 50k clusters). 64 keeps sf0.01 at k=1 (refined == plain)
# and sf0.1 at k=4, so the weak-scaling curve shows the bounded-cell
# signature across the committed SF spread.
SEMDEDUP_CELL_TARGET = 64


def _semdedup_k(emb: DataFrame, n_cells) -> int:
    """Sub-buckets per Voronoi cell for a requested total cell count.

    ``None`` → 1 (plain label-Voronoi cells, q99zw's exact form).
    ``"auto"`` → ceil(N / SEMDEDUP_CELL_TARGET) total cells.
    int → that many total cells. k = ceil(n_cells / n_labels), clamped
    to >= 1; exact integer arithmetic so the DuckDB oracle (which
    derives the same k in SQL) matches bit-for-bit. The two scalar
    reads are bounded driver-side aggregates (a count + the label
    vocabulary size), not a collect of data rows."""
    if n_cells is None:
        return 1
    n, labels = emb.agg(
        F.count("*").alias("n"), F.countDistinct("label").alias("l")
    ).first()
    if not labels:
        # empty corpus (or all-NULL labels): no cells exist to split —
        # k=1 keeps plan construction alive and the result is empty
        # anyway, matching the n_cells=None path's behavior
        return 1
    if n_cells == "auto":
        # ceil(ceil(N/C)/L) == ceil(N/(C*L)) for positive ints — the
        # SQL oracle uses the right-hand single-division form
        n_cells = (int(n) + SEMDEDUP_CELL_TARGET - 1) // SEMDEDUP_CELL_TARGET
    return max(1, (int(n_cells) + int(labels) - 1) // int(labels))




def _refined_assignment(
    spark: SparkSession, sf_dir: str, n_cells=None
) -> tuple[DataFrame, int]:
    """(vec_id, cell, d2) with Voronoi cells optionally sub-split into k
    deterministic hash-mod buckets — ``md5(vec_id) % k`` via the
    registry's cross-engine hex32 idiom (hashutil.py) — plus the k used.

    Why hash-mod and not the old rank-round-robin: the round-robin rank
    needed a row_number window PARTITIONED BY the Voronoi label, and
    per-label partitions grow linearly with the corpus — at 100 TB with
    a handful of labels that is one task sorting N/L rows, the exact
    shape this engine bans everywhere else. The hash-mod split is a
    per-row projection: no shuffle, no window, embarrassingly parallel,
    and deterministic, so the DuckDB oracle replays it bit-for-bit.

    The trade is the balance guarantee: round-robin gave a HARD
    ceil(cell/k) bound; hash-mod gives EXPECTED cell/k with multinomial
    spread (tests/test_semdedup.py pins determinism exactly and balance
    statistically). A pair split across sub-buckets is never compared —
    expected within-cell pair recall 1/k, the standard cost/recall dial
    of hash-partitioned dedup, mirrored exactly by the oracle. d2 stays
    the distance to the LABEL centroid: the sub-split is a cost
    partition, not a semantic one, so keep-least-prototypical is
    unchanged."""
    assigned = _nearest_centroid_assignment(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    k = _semdedup_k(emb, n_cells)
    if k == 1:
        cell = F.col("c_label").cast("int")
    else:
        bucket = F.expr(md5_hex32_spark("CAST(vec_id AS STRING)")) % F.lit(k)
        cell = (F.col("c_label") * F.lit(k) + bucket).cast("int")
    return assigned.select("vec_id", cell.alias("cell"), "d2"), k


# cell-id stride for the per-cell adaptive split: buckets are md5-hex32
# values mod k_c, so bucket < 2^32 always and (label, bucket) -> cell is
# injective for any label count < 2^31. BIGINT cell ids.
_CAP_STRIDE = 1 << 32


def _capped_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, d2) with every Voronoi cell sub-split into its OWN
    k_c = ceil(|cell| / SEMDEDUP_CELL_TARGET) hash-mod buckets — the
    skew-robust variant of the global-k split: a label that holds half
    the corpus gets proportionally more sub-cells, so EVERY cell's
    expected size is <= SEMDEDUP_CELL_TARGET, not just the average
    across cells (a global k derived from N/L under-splits the heavy
    label exactly when skew makes the bound matter most).

    Cost: one extra count aggregation over the assignment (one row per
    label, broadcast back) — still no window, no corpus-proportional
    partition, and the same deterministic md5 bucket as
    :func:`_refined_assignment`, so the DuckDB oracle stays exact."""
    # pin the assignment once (round 16): it feeds both the per-label
    # count and the bucket projection below — without the lazy
    # checkpoint the posexplode + residual-agg + argmin-window subtree
    # (the family's dominant cost) is evaluated twice
    assigned = _nearest_centroid_assignment(spark, sf_dir).transform(pin_lazy)
    t = SEMDEDUP_CELL_TARGET
    counts = assigned.groupBy("c_label").agg(
        F.expr(f"CAST((COUNT(*) + {t - 1}) DIV {t} AS INT)").alias("kc")
    )
    bucket = F.expr(md5_hex32_spark("CAST(vec_id AS STRING)")) % F.col("kc")
    cell = (
        F.col("c_label").cast("long") * F.lit(_CAP_STRIDE) + bucket
    ).cast("long")
    return assigned.join(F.broadcast(counts), "c_label").select(
        "vec_id", cell.alias("cell"), "d2"
    )


def _semdedup_oracle(refined_ctes: str) -> str:
    """DuckDB oracle tail shared by q99zw/q99zx: given CTE SQL that
    defines ``refined`` (vec_id, cell, d2) on top of ``assigned``, build
    the full verified-pair + keep-rule query (byte-identical twin of
    :func:`semdedup`'s Spark plan)."""
    return f"""
    WITH {_ASSIGN_CTES_DUCK},
    {refined_ctes},
    av AS (
      SELECT r.vec_id, r.cell, r.d2, e.embedding,
             sqrt({_norm2("e.embedding", True)}) AS nrm
      FROM refined r JOIN embeddings e ON e.vec_id = r.vec_id
    ), pairs AS (
      SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.d2 AS d2_a, b.d2 AS d2_b,
             ({_dot("a.embedding", "b.embedding", True)})
               / (a.nrm * b.nrm) AS cosine
      FROM av a JOIN av b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
    ), verified AS (
      SELECT cell,
             CASE WHEN d2_a < d2_b THEN vec_a
                  WHEN d2_b < d2_a THEN vec_b
                  ELSE vec_b END AS removed,
             cosine
      FROM pairs WHERE cosine >= {SEMDEDUP_TAU}
    )
    SELECT removed AS vec_id, cell,
           COUNT(*) AS n_dup_partners,
           MAX(cosine) AS max_cosine
    FROM verified GROUP BY removed, cell
    """


# global auto-k refined cells: k = ceil(N / (TARGET * labels)) derived in
# SQL by the single-division ceil identity, bucket = md5(vec_id) % k
_REFINED_AUTO_CTES = f"""
    kp AS (
      SELECT GREATEST(1, CAST(
               (COUNT(*) + {SEMDEDUP_CELL_TARGET} * COUNT(DISTINCT label) - 1)
               // ({SEMDEDUP_CELL_TARGET} * COUNT(DISTINCT label))
             AS INTEGER)) AS k
      FROM embeddings
    ), refined AS (
      SELECT a.vec_id, a.d2,
             CAST(a.c_label * kp.k
                  + ({md5_hex32_duck("CAST(a.vec_id AS VARCHAR)")} % kp.k)
                  AS INTEGER) AS cell
      FROM assigned a CROSS JOIN kp
    )"""

# per-cell adaptive cap: k_c = ceil(|cell| / TARGET) per Voronoi cell
_REFINED_CAP_CTES = f"""
    cnts AS (
      SELECT c_label,
             CAST((COUNT(*) + {SEMDEDUP_CELL_TARGET - 1})
                  // {SEMDEDUP_CELL_TARGET} AS INTEGER) AS kc
      FROM assigned GROUP BY c_label
    ), refined AS (
      SELECT a.vec_id, a.d2,
             CAST(CAST(a.c_label AS BIGINT) * {_CAP_STRIDE}
                  + ({md5_hex32_duck("CAST(a.vec_id AS VARCHAR)")} % c.kc)
                  AS BIGINT) AS cell
      FROM assigned a JOIN cnts c USING (c_label)
    )"""


@query("q99zw_semdedup_embedding_dedup", oracle=_semdedup_oracle(_REFINED_AUTO_CTES))
def q99zw_semdedup_embedding_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): cluster embeddings
    with a coarse quantizer, compute pairwise cosine ONLY within each
    cluster, and remove every member of a near-duplicate pair except the
    one farthest from its centroid (the paper's keep-low-similarity-to-
    centroid rule — keeping the least prototypical example preserves
    diversity). The embedding-space twin of q41's text-space MinHash
    dedup: cells play the role of LSH bands, bounding the candidate set;
    nothing is ever compared across cells.

    The registered default is the BOUNDED-CELL form (``n_cells="auto"``,
    targeting SEMDEDUP_CELL_TARGET members per cell): the cell count
    grows linearly with the corpus — the paper's own scale recipe (LAION
    runs 50k clusters) — so intra-cell pair cost is O(N * CELL_TARGET),
    never O(N^2 / labels). Round 13's scale curve measured the previous
    plain label-Voronoi default super-linear (1.9 s -> 10.1 s over a
    10x; SCALE_r13), so the unbounded form is now reachable only as an
    explicit engine knob (``semdedup(n_cells=None)``) for exact-recall
    baselines, not a registered query. k = ceil(N / (TARGET * labels))
    sub-buckets per Voronoi cell, assigned by the deterministic md5
    hash-mod (expected within-cell pair recall 1/k — the cost/recall
    dial, mirrored exactly by the oracle's identical k derivation and
    hash).

    Composition, not new machinery: the cluster assignment is the shared
    exact Voronoi kernel (:func:`_nearest_centroid_assignment` — q99z's
    purity evaluation rides the same one), the pair verifier is q52's
    unrolled cosine chain, and the keep-rule reuses the assignment's
    exact quantized distance-to-centroid (monotone in the paper's
    cosine-to-centroid for normalized embeddings). Pairwise keep-rule
    ties (identical distances) remove the larger vec_id, so the earliest
    vector of an exact-duplicate group survives deterministically.

    Scale (100 TB): the intra-cell self-join is an equi-join ON THE CELL
    KEY — shuffle both sides by cell, quadratic only within a cell, and
    the auto cell count bounds cell size by construction; with the
    corpus written cell-partitioned (ann_index.py layout) the join
    co-locates by construction. No all-pairs anywhere, no global sort,
    no window over corpus-proportional partitions; output is one row per
    REMOVED vector.

    Oracle: exact — every stage (quantized means, quantized residual
    distances, k derivation, md5 bucket, unrolled cosine, integer
    tie-breaks) is the bit-identical cross-engine form, so unlike
    k-means-backed q53b/q99zu this composition is fully
    DuckDB-checkable."""
    return semdedup(spark, sf_dir)


def semdedup(
    spark: SparkSession,
    sf_dir: str,
    *,
    tau: float = SEMDEDUP_TAU,
    n_cells="auto",
) -> DataFrame:
    """SemDeDup engine shared by q99zw (``n_cells="auto"`` — corpus-
    scaled global k, the registered default) and q99zx (``n_cells="cap"``
    — per-cell adaptive k_c, the skew-robust form). ``n_cells=None``
    keeps the plain label-Voronoi cells: fully exact recall, O(N^2 /
    labels) pair cost — the baseline the recall tests measure against,
    deliberately NOT a registered query since round 13's scale curve
    measured it super-linear. ``tau`` is the verified-pair cosine
    threshold (production ~0.95; the committed fixtures carry no
    engineered embedding dups, so registry entries run the documented
    fixture threshold — tests/test_semdedup.py pins the production
    regime on a planted-duplicate corpus). Returns one row per REMOVED
    vector: (vec_id, cell, n_dup_partners, max_cosine)."""
    emb = load_table(spark, sf_dir, "embeddings")
    if n_cells == "cap":
        refined = _capped_assignment(spark, sf_dir)
    else:
        refined, _ = _refined_assignment(spark, sf_dir, n_cells)
    # the assignment subtree (posexplode + residual agg + argmin window)
    # feeds BOTH sides of the pair join: the lazy localCheckpoint
    # materializes it once (q41's banded-signature idiom). The L2 norm
    # is computed per VECTOR here, not per pair — the oracle mirrors
    # both choices, so the float ops stay identical cross-engine.
    av = (
        refined
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .withColumn("nrm", F.expr(f"sqrt({_norm2('embedding', False)})"))
        .transform(pin_lazy)
    )
    a = av.select(
        F.col("vec_id").alias("vec_a"),
        "cell",
        F.col("d2").alias("d2_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("nrm_a"),
    )
    b = av.select(
        F.col("vec_id").alias("vec_b"),
        F.col("cell").alias("cell_b"),
        F.col("d2").alias("d2_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nrm_b"),
    )
    cos_expr = f"({_dot('ea', 'eb', False)}) / (nrm_a * nrm_b)"
    pairs = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("cosine", F.expr(cos_expr))
        .filter(F.col("cosine") >= F.lit(tau))
    )
    removed = F.when(F.col("d2_a") < F.col("d2_b"), F.col("vec_a")).when(
        F.col("d2_b") < F.col("d2_a"), F.col("vec_b")
    ).otherwise(F.col("vec_b"))
    return (
        pairs.select("cell", removed.alias("vec_id"), "cosine")
        .groupBy("vec_id", "cell")
        .agg(
            F.count("*").alias("n_dup_partners"),
            F.max("cosine").alias("max_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# q99zx: SemDeDup with per-cell adaptive cap (the skew-robust bounded form)
# ---------------------------------------------------------------------------


@query("q99zx_semdedup_cells", oracle=_semdedup_oracle(_REFINED_CAP_CTES))
def q99zx_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q99zw's SemDeDup with the cell-size bound enforced PER CELL:
    every Voronoi cell is sub-split into its own k_c = ceil(|cell| /
    SEMDEDUP_CELL_TARGET) deterministic md5 buckets, so a skewed label
    that holds half the corpus gets proportionally more sub-cells —
    expected sub-cell size <= CELL_TARGET everywhere, where q99zw's
    global k (derived from the corpus-wide average N/L) under-splits
    exactly the heavy cells skew makes dangerous. The committed fixture
    is label-balanced, so at sf0.1 both forms land k ~ 4; the forms
    diverge on skew, which tests/test_semdedup.py engineers directly.

    Cost relative to q99zw: one extra aggregation over the assignment
    (one row per label, broadcast back for the bucket projection); the
    pair join, keep rule and output contract are the shared
    :func:`semdedup` engine. Cell ids are BIGINT (label * 2^32 +
    bucket; md5-hex32 buckets are < 2^32, so the encoding is injective).

    Oracle: exact — the per-cell k_c derivation is one SQL ceil-division
    over the same ``assigned`` CTE, and the md5 bucket is the registry's
    bit-identical cross-engine idiom."""
    return semdedup(spark, sf_dir, n_cells="cap")
