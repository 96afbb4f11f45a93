"""Deduplication operators over the ``documents`` table.

The training-data-pipeline dedup family:
- exact duplicate detection (content-hash groupBy),
- MinHash + LSH banding for near-duplicate candidate generation with exact
  Jaccard verification,
- SimHash (bit-vote fingerprint) with bucketed Hamming-distance pairing,
- direct n-gram Jaccard similarity,
- EXACT set-similarity join with PPJoin prefix filtering (q99p, shared
  setsim_pairs helper) and its use as ground truth for sampled LSH
  recall QA (q99zb),
- FastSS deletion-neighborhood edit-distance-1 vocabulary pairs (q99m),
- cross-source content-overlap matrix (q99u).

Everything is built-in Spark SQL (md5 / array lambdas / joins) — no Python in
the hot path — and every query has an exact DuckDB oracle. Hash functions are
md5-based so both engines agree bit-for-bit (xxhash64 would be faster in
Spark but has no cross-engine twin; swapping it in is a one-line change and
does not alter the plan shape).

Scale design (100 TB story):
- LSH candidate generation explodes (doc → band rows) then shuffle-joins on
  the band hash: cost is O(sum of bucket sizes squared), never all-pairs.
- SimHash pairs join on a high-bits bucket before computing Hamming distance.
- Exact dedup is a straight hash aggregate.
The reference's dedup-on-write (ON CONFLICT DO NOTHING,
/root/reference/db.go:744-747) is the degenerate exact case of this family.

Literature: MinHash resemblance sketching follows Broder, "On the
resemblance and containment of documents" (SEQUENCES 1997); the band/row
LSH split follows Leskovec/Rajaraman/Ullman, Mining of Massive Datasets
ch. 3; SimHash follows Charikar, "Similarity estimation techniques from
rounding algorithms" (STOC 2002) as applied by Manku et al. (WWW 2007);
the pointer-jumping connected-components loop (q48) is the alternating
min-propagation structure of Kiveris et al., "Connected components in
MapReduce and beyond" (SoCC 2014).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from allora_indexer_spark.operators.hashutil import md5_hex32_duck, md5_hex32_spark
from allora_indexer_spark.operators.textstats import _STOP_IN
from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import (
    load_table,
    pin,
    pin_lazy,
    widen_if_narrow,
)

# ---------------------------------------------------------------------------
# Shared building blocks
# ---------------------------------------------------------------------------

N_MINHASH = 4  # 4 signatures → 2 bands × 2 rows
JACCARD_THRESHOLD = 0.5

# Shingle fragments operate on a pre-split words column `w` (split once per
# doc — re-splitting inside the lambda would be O(words^2) per document).
# The CASE guard matters: Spark's sequence(1, 0) is a *descending* [1, 0]
# (unlike DuckDB's range(), which is empty), so a sub-2-token doc would hit
# element_at(w, 0) and throw. Real corpora have empty/short docs.
_SHINGLES_SPARK = (
    "CASE WHEN size(w) >= 2 THEN "
    "array_distinct(transform(sequence(1, size(w) - 1), "
    "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))) "
    "ELSE array() END"
)
# DuckDB twin (1-based list indexing, range(stop) is exclusive).
_SHINGLES_DUCK = (
    "list_distinct(list_transform(range(1, len(w)), "
    "i -> w[i] || ' ' || w[i+1]))"
)

# One md5 per shingle, sliced into four 8-hex (32-bit) sub-hashes — 4
# independent minhash functions for the price of one digest pass. The `mh`
# column is the per-doc array of shingle digests.


def _minhash_spark(k: int) -> str:
    return f"array_min(transform(mh, h -> substring(h, {1 + 8 * k}, 8)))"


def _minhash_duck(k: int) -> str:
    return (
        f"list_aggregate(list_transform(mh, h -> substr(h, {1 + 8 * k}, 8)), 'min')"
    )


@query(
    "q40_exact_dedup",
    oracle="""
    WITH h AS (SELECT doc_id, lang, md5(text) AS content_hash FROM documents)
    SELECT content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id,
           COUNT(DISTINCT lang) AS n_langs
    FROM h GROUP BY content_hash
    """,
)
def q40_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy, keep lowest doc_id per group.

    Scale: a single hash aggregate on a 32-byte key — shuffles the hash, not
    the text. This is the reference's unique-constraint dedup (K1/K4,
    /root/reference/db.go:744-747) as a batch operator."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# The LSH candidate+verify pipeline as shared DuckDB CTE text — q41 selects
# the verified pairs directly, q48 builds its component graph from the SAME
# edge definition (only the threshold differs).
_LSH_CTES_DUCK = f"""sh AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
sig AS (
  SELECT doc_id, s,
         {", ".join(f"{_minhash_duck(k)} AS g{k}" for k in range(N_MINHASH))}
  FROM (SELECT doc_id, s, list_transform(s, x -> md5(x)) AS mh FROM sh)
),
b AS (
  SELECT doc_id, s, md5(g0 || g1) AS band1, md5(g2 || g3) AS band2 FROM sig
),
cand AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
         CAST(len(list_intersect(a.s, c.s)) AS DOUBLE)
           / len(list_distinct(a.s || c.s)) AS jaccard
  FROM b a JOIN b c
    ON a.doc_id < c.doc_id AND (a.band1 = c.band1 OR a.band2 = c.band2)
)"""

_Q41_ORACLE = f"""
WITH {_LSH_CTES_DUCK}
SELECT doc_a, doc_b, jaccard FROM cand WHERE jaccard >= {JACCARD_THRESHOLD}
"""


def _shingle_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, s): per-doc distinct bigram shingle sets."""
    return docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select("doc_id", F.expr(_SHINGLES_SPARK).alias("s"))


def _band_rows(sh: DataFrame) -> DataFrame:
    """(doc_id, s, band_id, bh) band rows from a (doc_id, s) frame —
    one md5 pass over the shingles, two band rows per doc."""
    sig = sh.withColumn("mh", F.expr("transform(s, x -> md5(x))")).select(
        "doc_id",
        "s",
        *[F.expr(_minhash_spark(k)).alias(f"g{k}") for k in range(N_MINHASH)],
    )
    return sig.select(
        "doc_id",
        "s",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("band_id"),
                    F.md5(F.concat("g0", "g1")).alias("bh"),
                ),
                F.struct(
                    F.lit(2).alias("band_id"),
                    F.md5(F.concat("g2", "g3")).alias("bh"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "s", "band.band_id", "band.bh")


def banded_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, s, band_id, bh) band rows for a documents frame — the
    MinHash+LSH front half, shared by the batch pair generator below and
    the incremental streaming dedup (streaming/stream.py), whose persisted
    signature store holds exactly these rows."""
    return _band_rows(_shingle_frame(docs))


def exact_jaccard(sa: str, sb: str):
    """Exact Jaccard over two shingle-array columns (both already
    distinct), as a Column expression."""
    return F.size(F.array_intersect(sa, sb)).cast("double") / F.size(
        F.array_distinct(F.concat(sa, sb))
    )


def lsh_verified_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """The shared MinHash+LSH candidate generator: banded self-join →
    candidate pairs → exact-Jaccard verification at ``threshold``. q41
    surfaces the pairs; q48 clusters over them. Twin of _LSH_CTES_DUCK.

    Round-16 shape (guide §2.3 "shuffle keys and metadata instead of
    payloads", §8's lightweight-proxy rule): the band self-join used to
    carry each doc's full shingle array through the band-hash exchange —
    two band rows per doc, both sides of the join, four array copies
    shuffled. Now the join runs over SLIM band rows (doc_id, band_id,
    bh — ~50 B each), candidate pairs are deduplicated while still
    slim, and the shingle arrays join back from a lazily-checkpointed
    (doc_id, s) frame only for surviving candidates — the arrays cross
    the wire at most once per side (and not at all when the candidate
    set broadcasts, the common case: the band join's output is
    collision-bounded). Both intermediates are lazy localCheckpoints:
    the shingle split and the md5-per-shingle digest pass each run
    exactly once. Chosen over .persist() because checkpoint blocks are
    reference-tracked and reclaimed when the frame is dropped, while
    CacheManager entries accumulate for the session — the wrong default
    for a 174-query registry. Cluster caveat: local checkpoints die
    with an executor; a multi-tenant deployment that cannot tolerate a
    stage re-run swaps in a reliable checkpoint dir (one-line change,
    same plan)."""
    # widen a single-split batch scan before the shingle + digest passes
    # (tables.widen_if_narrow — data-derived no-op on multi-split scans;
    # applied HERE and not inside _shingle_frame so the streaming store's
    # per-trigger micro-batches never pay an extra exchange)
    sh = _shingle_frame(
        widen_if_narrow(docs.select("doc_id", "text"), "doc_id")
    ).transform(pin_lazy)
    bands = (
        _band_rows(sh)
        .select("doc_id", "band_id", "bh")
        .transform(pin_lazy)
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])  # a pair may collide in both bands
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    jacc = exact_jaccard("sa", "sb")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@query("q41_minhash_lsh_dedup", oracle=_Q41_ORACLE)
def q41_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate detection, exact-verified.

    Pipeline: text → distinct bigram shingles → 4 md5-minhash signatures →
    2 LSH bands → explode bands → shuffle self-join on band hash → candidate
    pairs → exact Jaccard on shingle sets → threshold filter.

    Scale: the Spark plan explodes to (doc, band) rows and equi-joins on the
    band hash, so work is proportional to bucket collisions — the oracle's
    OR-join formulation would be a BNL cross join at scale and is exactly
    what this plan avoids. Shingle sets travel only for surviving candidates
    (joined back by doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_verified_pairs(docs, JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# 32-bit word hash = first 8 hex chars of md5, as integer.
_WORD_HASH_SPARK = md5_hex32_spark("w")
_WORD_HASH_DUCK = md5_hex32_duck("w")

SIMHASH_BITS = 32

# SimHash as pure SQL: for each bit b, vote over the distinct word hashes;
# set bit b iff ones are the majority (2*ones >= n).
_SIMHASH_SPARK = (
    "aggregate(transform(sequence(0, 31), b -> "
    "CASE WHEN 2 * size(filter(wh, h -> ((h >> b) & 1) = 1)) >= size(wh) "
    "THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END), "
    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)
_SIMHASH_DUCK = (
    "list_sum(list_transform(range(0, 32), b -> "
    "CASE WHEN 2 * len(list_filter(wh, h -> ((h >> b) & 1) = 1)) >= len(wh) "
    "THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END))"
)


@query(
    "q42_simhash",
    oracle=f"""
    WITH wds AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                            w -> {_WORD_HASH_DUCK}) AS wh
      FROM documents
    )
    SELECT doc_id, CAST({_SIMHASH_DUCK} AS BIGINT) AS simhash,
           CAST(CAST({_SIMHASH_DUCK} AS BIGINT) >> 24 AS BIGINT) AS bucket
    FROM wds
    """,
)
def q42_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per document (bit-vote over md5 word
    hashes), plus the top-byte bucket used for near-dup pairing."""
    docs = load_table(spark, sf_dir, "documents")
    wds = widen_if_narrow(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.expr(
            "transform(array_distinct(split(text, ' ')), "
            f"w -> {_WORD_HASH_SPARK})"
        ).alias("wh"),
    )
    return wds.select(
        "doc_id",
        F.expr(_SIMHASH_SPARK).cast("bigint").alias("simhash"),
        F.expr(f"CAST(({_SIMHASH_SPARK}) AS BIGINT) >> 24").cast("bigint").alias("bucket"),
    )


@query(
    "q43_simhash_near_dup",
    oracle=f"""
    WITH wds AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                            w -> {_WORD_HASH_DUCK}) AS wh
      FROM documents
    ),
    sh AS (
      SELECT doc_id, CAST({_SIMHASH_DUCK} AS BIGINT) AS simhash FROM wds
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a JOIN sh b
      ON (a.simhash >> 24) = (b.simhash >> 24) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def q43_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: bucket by the top 8 bits, then Hamming
    distance <= 6 within buckets.

    Scale: the bucket equi-join bounds pair generation; full-fingerprint
    comparison only runs inside buckets (the standard simhash block-split
    trick — more rotations/buckets raise recall, same plan shape). The
    lazy localCheckpoint materializes the fingerprints ONCE: without it
    the self-join evaluates the whole word-hash + 32-bit-vote subtree on
    BOTH sides (the same double-compute lsh_verified_pairs documents and
    avoids)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = widen_if_narrow(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.expr(
            "transform(array_distinct(split(text, ' ')), "
            f"w -> {_WORD_HASH_SPARK})"
        ).alias("wh"),
    ).select(
        "doc_id", F.expr(_SIMHASH_SPARK).cast("bigint").alias("simhash")
    ).transform(pin_lazy)
    a, b = sh.alias("a"), sh.alias("b")
    hamming = F.bit_count(
        F.expr("a.simhash").bitwiseXOR(F.expr("b.simhash"))
    ).alias("hamming")
    return (
        a.join(
            b,
            (F.expr("a.simhash >> 24") == F.expr("b.simhash >> 24"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming,
        )
        .filter(F.col("hamming") <= 6)
    )


@query(
    "q44_jaccard_adjacent",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.ws, b.ws)) AS n_common,
           CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
             / len(list_distinct(a.ws || b.ws)) AS jaccard
    FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
    """,
)
def q44_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct n-gram (word-set) Jaccard between consecutive doc_ids — the
    exact-similarity kernel used by the LSH verifier, isolated."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ws")
    )
    a, b = w.alias("a"), w.alias("b")
    inter = F.size(F.array_intersect("a.ws", "b.ws"))
    union = F.size(F.array_distinct(F.concat("a.ws", "b.ws")))
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        inter.alias("n_common"),
        (inter.cast("double") / union).alias("jaccard"),
    )


CLUSTER_THRESHOLD = 0.6


@query(
    "q48_dedup_components",
    oracle=f"""
    WITH RECURSIVE {_LSH_CTES_DUCK}, e AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      WHERE jaccard >= {CLUSTER_THRESHOLD}
    ), edges AS (
      SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ), reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT edges.dst, reach.r FROM reach JOIN edges ON edges.src = reach.doc_id
    )
    SELECT doc_id, MIN(r) AS component, (MIN(r) = doc_id) AS is_keeper
    FROM reach GROUP BY doc_id
    """,
)
def q48_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the REAL
    candidate graph — edges are q41's banded-LSH pairs exact-verified at
    Jaccard >= 0.6 (lsh_verified_pairs, the production near-dup edge set) —
    so transitive chains a~b~c collapse to one keeper even when a and c
    are not directly similar.

    Algorithm: distributed min-label propagation with pointer jumping —
    each round takes every vertex to min(its label, neighbors' labels),
    then short-circuits label -> label(label). The doubling step makes the
    round count O(log n) in the component diameter instead of O(diameter),
    which is what makes iterative CC viable on a 100 TB corpus (GraphX/
    Pregel CC uses the same structure). Each round is two shuffles; the
    driver only evaluates a scalar convergence count per round, never the
    data. The DuckDB oracle computes the same components by recursive-CTE
    reachability (min reachable id = component id) over the SAME edge
    CTEs q41's oracle uses."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(docs, CLUSTER_THRESHOLD).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(docs.select("doc_id"), pairs)


# Convergence cap for the label-propagation loop: pointer jumping makes the
# effective reach ~2^CC_MAX_ROUNDS in component diameter, so 25 covers any
# physically realizable graph; hitting it raises a RuntimeWarning (labels
# still moving = under-merged output) instead of returning silently.
CC_MAX_ROUNDS = 25

# Loop-frame sizing: rows per cached partition for the iterative graph
# loops (CC, pagerank). ~1M (src, dst) rows is ~50 MB unsafe-row — well
# inside an executor task, large enough that task-launch overhead never
# dominates. The partition count is DERIVED from the measured edge count
# (scale-adaptive), never from the local core count.
_EDGE_ROWS_PER_PART = 1_000_000


def connected_components(vertices: DataFrame, e: DataFrame) -> DataFrame:
    """Min-label propagation + pointer jumping over an undirected edge list
    (columns src/dst, one row per pair). Separated from q48 so any pair
    generator (q41 LSH, q43 simhash, q44 adjacent) can feed it.

    Precondition (ADVICE r16): every edge endpoint must be a member of
    ``vertices``. The loop seeds labels from edge ENDPOINTS (the
    incident-subgraph optimization), so a foreign endpoint would
    participate in propagation and its id could surface as a real
    vertex's component label. All in-repo pair generators emit pairs of
    existing doc_ids; a new generator must keep that contract (or
    pre-filter its edges against the vertex set)."""
    # Materialize the pair list ONCE (lazy checkpoint + the count below),
    # then size the loop's edge frame from the measured row count
    # (round 16): the union of two map-side branches otherwise carries
    # 2x the upstream partition count into EVERY round — at sf0.1 that
    # was 64 near-empty cached partitions, so each of the loop's
    # edge-side stages burned 64 task launches on ~500 rows. persist()
    # bypasses AQE's coalescing, so the sizing must be explicit; it is
    # derived from the data (rows / _EDGE_ROWS_PER_PART), not from the
    # local core count, so a cluster-scale edge list still gets
    # executor-sized partitions.
    raw = e.transform(pin_lazy)
    n_pairs = raw.count()
    n_parts = max(1, int(n_pairs * 2 // _EDGE_ROWS_PER_PART) + 1)
    edges = (
        raw.union(
            raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .coalesce(n_parts)
        .persist()
    )

    def propagate(labels: DataFrame) -> DataFrame:
        # operates on the EDGE-INCIDENT vertex set only (see below)
        nbr = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("nbr_of"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # lazy checkpoint: the pointer-jump self-join consumes `stepped`
        # on BOTH sides, and the doubled propagate nests this subtree —
        # without pinning it each round's plan re-evaluates the
        # min-with-neighbors join up to 4x (round-16 probe: ~90 AQE
        # stage-jobs per q48 run, almost all duplicated subtree stages)
        stepped = (
            labels.join(nbr, labels.doc_id == nbr.nbr_of, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
            )
            .transform(pin_lazy)
        )
        # pointer jumping: comp <- comp(comp); every label IS a vertex id
        return (
            stepped.alias("l1")
            .join(stepped.alias("l2"), F.col("l1.comp") == F.col("l2.doc_id"))
            .select(
                F.col("l1.doc_id").alias("doc_id"),
                F.col("l2.comp").alias("comp"),
            )
        )

    # The loop runs over EDGE-INCIDENT vertices only (round 16): an
    # isolated vertex's label is its own id forever — propagating it
    # through every round just re-shuffles corpus-sized frames for rows
    # that cannot change. On the near-dup candidate graph the incident
    # set is a small fraction of the corpus, so every per-round join,
    # checkpoint and probe shrinks from |V| to |V_incident| rows; the
    # isolated vertices re-attach through ONE left join at the end
    # (identical output — the closed-world subgraph labels are exactly
    # what the full loop would compute for those vertices, and comp
    # values never leave the incident set).
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .dropDuplicates(["doc_id"])
        .select("doc_id", F.col("doc_id").alias("comp"))
        .transform(pin_lazy)
    )
    # Convergence probe: labels are monotonically non-increasing per
    # vertex (least(own, neighbors), then comp <- comp(comp) where every
    # label is <= its vertex id), so SUM(comp) is strictly decreasing
    # until the fixpoint — an O(1)-output aggregate over the checkpointed
    # frame replaces the old join-with-previous + count probe (one small
    # scan instead of a 2-exchange join per round). DECIMAL(38,0) sum:
    # a long sum of 64-bit-hash-scale vertex ids overflows at ~10^9 rows
    # (an ARITHMETIC_OVERFLOW crash under Spark 4's default ANSI mode,
    # a silent wrap otherwise); the decimal form is exact past 10^19
    # rows of max-long ids, so the probe never lies at corpus scale.
    # The pins here and in the loop are LAZY (round 17): the convergence
    # agg that follows each one is the action that materializes it, so
    # every loop round costs ONE driver round-trip, not two (the old
    # eager pin ran a dedicated materialization job, then the agg ran a
    # second job over the pinned blocks).
    _comp_sum = F.sum(F.col("comp").cast("decimal(38,0)"))
    prev_sum = labels.agg(_comp_sum).first()[0]
    changed = 0
    for _ in range(CC_MAX_ROUNDS):  # ~log2(n) effective rounds; hard cap
        # two propagation rounds per convergence probe (the probe is a
        # driver-side action — halving probes halves the job count), and
        # the pin truncates lineage so the iterated plan stays
        # constant-size instead of doubling every round. With a reliable
        # checkpoint dir configured, pin() writes recoverable checkpoints
        # instead; the algorithm is unchanged.
        jumped = propagate(propagate(labels)).transform(pin_lazy)
        new_sum = jumped.agg(_comp_sum).first()[0]
        changed = 0 if new_sum == prev_sum else 1
        prev_sum = new_sum
        labels = jumped
        if changed == 0:
            break
    if changed != 0:
        # With pointer jumping the cap covers components of diameter
        # ~2^CC_MAX_ROUNDS; hitting it means labels are still moving and
        # the output would silently under-merge clusters — say so loudly.
        warnings.warn(
            "connected_components: labels still changing at "
            f"the {CC_MAX_ROUNDS}-round cap — components may be "
            "under-merged; raise the cap or check the edge set for "
            "pathological chains",
            RuntimeWarning,
            stacklevel=2,
        )
    edges.unpersist()
    # re-attach isolated vertices (comp = own id) in one pass — the only
    # corpus-sized operation left in the whole function
    return vertices.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("comp", "doc_id").alias("component"),
        (F.coalesce("comp", "doc_id") == F.col("doc_id")).alias("is_keeper"),
    )


# 5-token shingles for decontamination: long enough that cross-doc collisions
# mean real shared phrases, short enough to catch partial overlap. Operates on
# a pre-split words column `w` like the bigram fragments above.
# Guarded like _SHINGLES_SPARK: sequence(1, size-4) descends through 0 for
# a <=4-token doc and slice(w, 0, 5) throws INVALID_PARAMETER_VALUE.START.
_FIVEGRAM_SPARK = (
    "CASE WHEN size(w) >= 5 THEN "
    "array_distinct(transform(sequence(1, size(w) - 4), "
    "i -> concat_ws(' ', slice(w, i, 5)))) "
    "ELSE array() END"
)
_FIVEGRAM_DUCK = (
    "list_distinct(list_transform(range(1, len(w) - 3), "
    "i -> array_to_string(w[i:i+4], ' ')))"
)

_HELDOUT_SOURCES = ("src18", "src19")
_HELD_IN = ", ".join(f"'{s}'" for s in _HELDOUT_SOURCES)


@query(
    "q78_decontaminate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id, source, unnest({_FIVEGRAM_DUCK}) AS shingle FROM w
    ),
    held AS (
      SELECT DISTINCT shingle FROM sh WHERE source IN ({_HELD_IN})
    ),
    hits AS (
      SELECT sh.doc_id, COUNT(*) AS n_hits
      FROM sh JOIN held ON sh.shingle = held.shingle
      WHERE sh.source NOT IN ({_HELD_IN})
      GROUP BY sh.doc_id
    )
    SELECT w.doc_id, w.source,
           len({_FIVEGRAM_DUCK}) AS n_shingles,
           COALESCE(hits.n_hits, 0) AS n_hits,
           (COALESCE(hits.n_hits, 0) > 0) AS contaminated
    FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id
    WHERE w.source NOT IN ({_HELD_IN})
    """,
)
def q78_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus decontamination: flag training docs sharing any 5-token
    shingle with a heldout/benchmark slice (here sources src18/src19) —
    the n-gram-overlap eval-contamination check run before every training
    mix is finalized (the GPT-3/PaLM-style 'remove documents with a 13-gram
    collision against the benchmark' rule, scaled down to this corpus).

    Scale: the heldout side is an eval set — tiny by construction — so its
    distinct-shingle set broadcasts to every executor and the contamination
    probe is a map-side semi join against the training corpus scan: no
    shuffle of the 100 TB side at all (production variant: a bloom filter
    of benchmark shingles instead of the exact set)."""
    docs = load_table(spark, sf_dir, "documents")
    held_pred = F.col("source").isin(*_HELDOUT_SOURCES)
    w = docs.select("doc_id", "source", F.split("text", " ").alias("w"))
    sh = w.select(
        "doc_id", "source", F.explode(F.expr(_FIVEGRAM_SPARK)).alias("shingle")
    )
    held = sh.filter(held_pred).select("shingle").distinct()
    # shingles are distinct per doc, so COUNT(*) after the join counts the
    # distinct shared shingles per training doc.
    hits = (
        sh.filter(~held_pred)
        .join(F.broadcast(held), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        w.filter(~held_pred)
        .select(
            "doc_id", "source", F.size(F.expr(_FIVEGRAM_SPARK)).alias("n_shingles")
        )
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_shingles",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# q99h: PageRank over the near-dup similarity graph (canonical-doc scoring)
# ---------------------------------------------------------------------------

PR_ITERS = 5
PR_DAMPING = "CAST(0.85 AS DOUBLE)"


@query(
    "q99h_similarity_pagerank",
    oracle=f"""
    WITH RECURSIVE {_LSH_CTES_DUCK}, p AS (
      SELECT doc_a, doc_b FROM cand WHERE jaccard >= {JACCARD_THRESHOLD}
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM p
      UNION ALL SELECT doc_b, doc_a FROM p
    ), deg AS (
      SELECT src, COUNT(*) AS d FROM edges GROUP BY src
    ), nn AS (SELECT COUNT(*) AS n FROM deg),
    pr(iter, node, rank) AS (
      SELECT 0, src, CAST(1 AS DOUBLE) / (SELECT n FROM nn) FROM deg
      UNION ALL
      SELECT pr.iter + 1, e.dst,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
             + {PR_DAMPING} * CAST(
                 SUM(CAST(pr.rank / dg.d AS DECIMAL(28,12))) AS DOUBLE)
      FROM pr
      JOIN edges e ON e.src = pr.node
      JOIN deg dg ON dg.src = e.src
      WHERE pr.iter < {PR_ITERS}
      GROUP BY pr.iter, e.dst
    )
    SELECT node AS doc_id,
           CAST(ROUND(CAST(rank AS DECIMAL(18,10)), 10) AS DOUBLE) AS pagerank
    FROM pr WHERE iter = {PR_ITERS}
    """,
)
def q99h_similarity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate similarity graph (nodes = docs
    with at least one verified LSH pair, symmetric edges) — the
    centrality score used to pick the CANONICAL representative of a
    duplicate cluster (most-connected doc wins, vs q48's min-id keeper).
    Fixed 5 damped iterations; per-node incoming contributions are
    decimal-quantized before summing, so the reduction order — Spark
    partition order on one side, DuckDB recursion on the other — cannot
    perturb the doubles, and the oracle (a recursive CTE running the
    identical arithmetic) matches bit-for-bit.

    Scale: the Pregel shape — edges+degrees persisted once, each
    iteration is one shuffle join (edges x ranks on src) and one
    aggregate on dst; the iteration count is a small constant, so the
    whole chain materializes in ONE action with a bounded-depth plan
    (round 16 — was one eager localCheckpoint per iteration). Hot nodes
    are hash-agg keys, never window sorts."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(docs, JACCARD_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    # same loop-frame sizing as connected_components (round 16): pin the
    # pair list once, size the cached edge frame from its measured count
    # so the five join stages below never launch 2x-upstream-partition
    # task waves over a collision-bounded edge list
    raw = pairs.transform(pin_lazy)
    # ONE driver action sizes the loop frame AND counts the nodes
    # (round 17 — was a raw.count() plus a separate deg.count()): the
    # exploded endpoint stream has exactly 2x the pair rows, and its
    # distinct count is the node count; the agg also materializes the
    # lazy pin, so no dedicated materialization job runs either.
    _stats = (
        raw.select(F.explode(F.array("doc_a", "doc_b")).alias("v"))
        .agg(F.count("*").alias("n2"), F.countDistinct("v").alias("n"))
        .first()
    )
    n_pairs, n_nodes = _stats["n2"] // 2, _stats["n"]
    n_parts = max(1, int(n_pairs * 2 // _EDGE_ROWS_PER_PART) + 1)
    edges = (
        raw.union(raw.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .coalesce(n_parts)
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ej = edges.join(deg, "src").persist()
    if n_nodes == 0:
        edges.unpersist()
        ej.unpersist()
        return spark.createDataFrame([], "doc_id LONG, pagerank DOUBLE")
    base = 0.15 / n_nodes
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("rank")
    )
    for _ in range(PR_ITERS):
        incoming = (
            ej.join(ranks, ej.src == ranks.node)
            .select(
                "dst",
                (F.col("rank") / F.col("d"))
                .cast("decimal(28,12)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = incoming.select(
            F.col("dst").alias("node"),
            (
                F.lit(base)
                + F.expr(PR_DAMPING) * F.col("s").cast("double")
            ).alias("rank"),
        )
    # ONE action materializes the whole fixed-depth 5-iteration chain
    # (round 16): the loop count is a constant, so the plan depth is
    # bounded and the old per-iteration EAGER localCheckpoint — five
    # extra driver round-trips plus five materializations, each a full
    # job's fixed overhead — bought nothing but lineage truncation the
    # fixed depth does not need. The persisted ``ej`` is still computed
    # once and served from cache to all five join instances inside the
    # single job; the final eager checkpoint pins the result so the
    # caches can be dropped before returning. Identical arithmetic,
    # identical result.
    out_ranks = ranks.transform(pin)
    out = out_ranks.select(
        F.col("node").alias("doc_id"),
        F.round(F.col("rank").cast("decimal(18,10)"), 10)
        .cast("double")
        .alias("pagerank"),
    )
    edges.unpersist()
    ej.unpersist()
    return out


# ---------------------------------------------------------------------------
# q99m: edit-distance-1 vocabulary pairs via deletion-neighborhood signatures
# ---------------------------------------------------------------------------

_VOCAB_MIN_LEN = 3  # skip 1-2 char tokens: their neighborhoods are all noise

# All single-character deletions of `token` — the FastSS signature set
# (Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007).
# Two tokens are within edit distance 1 iff they share a signature in
# {token} ∪ deletions(token): substitution at i ⇒ both i-th deletions
# match; insertion/deletion ⇒ the longer one's deletion equals the
# shorter token itself.
_DELETIONS_EXPR = (
    "transform(sequence(1, length(token)), "
    "i -> concat(substring(token, 1, i - 1), substring(token, i + 1)))"
)


@query(
    "q99m_vocab_edit_distance_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
      UNION ALL
      SELECT unnest(string_split(p_name, ' ')) AS token FROM part
    ), v AS (
      SELECT token, COUNT(*) AS n FROM tok
      WHERE len(token) >= {_VOCAB_MIN_LEN} GROUP BY token
    )
    SELECT a.token AS token_a, b.token AS token_b,
           a.n AS n_a, b.n AS n_b
    FROM v a JOIN v b
      ON a.token < b.token
     AND abs(len(a.token) - len(b.token)) <= 1
     AND levenshtein(a.token, b.token) = 1
    """,
)
def q99m_vocab_edit_distance_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spell-variant detection: every pair of corpus-vocabulary tokens
    (documents text ∪ part names) within edit distance 1, via FastSS
    deletion-neighborhood signatures — an EQUI-join where the naive
    formulation is an O(V²) theta-join on levenshtein().

    Each vocabulary token emits length+1 signatures (itself plus each
    single-char deletion); candidate pairs are token pairs sharing a
    signature, verified with one exact levenshtein() call. The oracle IS
    the naive theta-join (feasible at oracle scale), so the driver check
    proves the signature scheme loses nothing.

    Scale: the vocabulary aggregate is a map-side-combining groupBy (hot
    tokens collapse before the shuffle); the signature join's key
    frequency is bounded by the alphabet (a signature of length L matches
    at most |Σ|·(L+2)+1 tokens), so no LSH-style skew blowup — the whole
    pair generation is shuffle-bounded by Σ_sig bucket², exactly the
    bound the naive cross-join lacks. Candidate distinct runs BEFORE the
    levenshtein verify so each surviving pair is verified once."""
    docs = load_table(spark, sf_dir, "documents")
    part = load_table(spark, sf_dir, "part")
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).unionAll(part.select(F.explode(F.split("p_name", " ")).alias("token")))
    v = (
        tok.filter(F.length("token") >= _VOCAB_MIN_LEN)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    sigs = v.select(
        "token",
        "n",
        F.explode(
            F.array_distinct(
                F.concat(F.array(F.col("token")), F.expr(_DELETIONS_EXPR))
            )
        ).alias("sig"),
    )
    a = sigs.select(
        F.col("token").alias("token_a"), F.col("n").alias("n_a"), "sig"
    )
    b = sigs.select(
        F.col("token").alias("token_b"), F.col("n").alias("n_b"), "sig"
    )
    return (
        a.join(b, "sig")
        .filter(F.col("token_a") < F.col("token_b"))
        .select("token_a", "token_b", "n_a", "n_b")
        .distinct()
        .filter(F.levenshtein("token_a", "token_b") == 1)
    )


# ---------------------------------------------------------------------------
# q99p: exact set-similarity join with PPJoin-style prefix filtering
# ---------------------------------------------------------------------------

_SSJ_GRAM = 8  # same span width as the q97 substring-dedup family
_SSJ_T = 0.5  # Jaccard threshold over 8-gram shingle SETS


def setsim_pairs(g: DataFrame, threshold: float) -> DataFrame:
    """EXACT Jaccard >= ``threshold`` pairs over per-id element sets,
    via PPJoin-style prefix filtering. ``g`` holds DISTINCT (doc_id, gh)
    element rows; output: (doc_a, doc_b, n_a, n_b, n_common, jaccard)
    with doc_a < doc_b. Shared by q99p (8-gram near-dup join) and q99zb
    (LSH recall evaluation over bigram sets).

    Shape notes (pinned via q99p's plan test): elements are ordered by
    ascending global frequency (rarest first, one consistent corpus-wide
    total order), prefixes are |S| - ceil(t|S|) + 1 long, and candidate
    pairs come from an EQUI-JOIN of the lightweight prefix rows
    (doc_id, n, gh — no arrays) with doc_a < doc_b. The earlier
    collect_list-per-prefix-bucket expansion carried every member doc's
    FULL shingle array in one aggregation row, so a duplicate-heavy
    cluster (100k near-copies sharing their rarest prefix shingle —
    exactly a dedup operator's target data) materialized
    cluster_size x full-array in a single executor buffer. The join
    spreads the same candidate set across tasks (AQE skew-split applies:
    rows are tiny), and the full arrays join back per SIDE afterwards.
    The shingle→freq→docsets lineage is still computed once — a lazy
    localCheckpoint feeds prefixes and both array join-backs."""
    freq = g.groupBy("gh").agg(F.count("*").alias("f"))
    # one ordered element array per id (rarest-first); the aggregate is
    # per-doc bounded → embarrassingly parallel
    docsets = (
        g.join(freq, "gh")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("f", "gh"))),
                lambda x: x["gh"],
            ).alias("arr")
        )
        .select("doc_id", "arr", F.size("arr").alias("n"))
        .transform(pin_lazy)
    )
    prefix_len = (
        F.col("n") - F.ceil(F.lit(threshold) * F.col("n")).cast("int") + 1
    )
    pref = docsets.select(
        "doc_id",
        "n",
        F.explode(F.slice(F.col("arr"), F.lit(1), prefix_len)).alias("gh"),
    )
    pa = pref.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"), "gh"
    )
    pb = pref.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"), "gh"
    )
    cand = (
        pa.join(pb, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "n_a", "n_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .join(
            docsets.select(
                F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")
            ),
            "doc_a",
        )
        .join(
            docsets.select(
                F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")
            ),
            "doc_b",
        )
    )
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    jaccard = common.cast("double") / (
        F.col("n_a") + F.col("n_b") - common
    )
    return (
        cand.withColumn("n_common", common)
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_a", "n_b", "n_common", "jaccard")
    )


@query(
    "q99p_setsim_prefix_join",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(w[i:i+{_SSJ_GRAM - 1}], ' ')) AS gh
      FROM t, UNNEST(range(1, len(w) - {_SSJ_GRAM - 2})) AS u(i)
      WHERE len(w) >= {_SSJ_GRAM}
    ), n AS (
      SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
    ), c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, na.n AS n_a, nb.n AS n_b, c.n_common,
           CAST(c.n_common AS DOUBLE) / (na.n + nb.n - c.n_common) AS jaccard
    FROM c
    JOIN n na ON na.doc_id = c.doc_a
    JOIN n nb ON nb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE) / (na.n + nb.n - c.n_common) >= {_SSJ_T}
    """,
)
def q99p_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity join over 8-gram shingle sets with
    PPJoin-style prefix filtering (Xiao et al., "Efficient Similarity
    Joins for Near Duplicate Detection", WWW 2008) — the deterministic
    counterpart of q41's probabilistic MinHash-LSH: no false negatives by
    construction, so the oracle (complete blocking on any shared shingle)
    must match it row-for-row.

    Prefix filter: order every document's shingles by ascending global
    frequency (rarest first, tie-broken by hash — one consistent total
    order corpus-wide); if J(A,B) >= t, A and B must share a shingle
    within their first |S| - ceil(t|S|) + 1 shingles. Candidates are
    generated by an EQUI-join on prefix shingles only, then verified with
    one exact array_intersect per pair (each doc's full ordered shingle
    array rides through the join, the q41 carry idiom).

    Scale: the frequency ordering is what makes this survive boilerplate
    skew — a shingle shared by millions of docs sorts to the END of every
    prefix and never becomes a join key, while LSH banding (q41) has no
    such guarantee for its band buckets. Join fan-out is bounded by the
    bucket sizes of RARE shingles. The per-doc window is bounded by
    document length, and the verify is O(|S|) per surviving candidate."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT widened (round 16): A/B'd 2.77 -> 3.07 s best-of-3 — the
    # setsim window/join machinery, not the gram digest pass, dominates
    # here, so the extra exchange nets negative.
    t = docs.select("doc_id", F.split("text", " ").alias("w"))
    g = (
        t.filter(F.size("w") >= _SSJ_GRAM)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(F.lit(1), F.size("w") - (_SSJ_GRAM - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), _SSJ_GRAM))
            ).alias("gh"),
        )
        .distinct()
    )
    return setsim_pairs(g, _SSJ_T)


# ---------------------------------------------------------------------------
# q99u: cross-source content-overlap matrix (corpus governance forensics)
# ---------------------------------------------------------------------------


@query(
    "q99u_source_overlap",
    oracle=f"""
    WITH t AS (
      SELECT source, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT DISTINCT source,
             md5(array_to_string(w[i:i+{_SSJ_GRAM - 1}], ' ')) AS gh
      FROM t, UNNEST(range(1, len(w) - {_SSJ_GRAM - 2})) AS u(i)
      WHERE len(w) >= {_SSJ_GRAM}
    ), n AS (
      SELECT source, COUNT(*) AS n FROM g GROUP BY source
    ), c AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
      FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT c.source_a, c.source_b, na.n AS n_a, nb.n AS n_b, c.n_common,
           CAST(c.n_common AS DOUBLE) / (na.n + nb.n - c.n_common) AS jaccard
    FROM c
    JOIN n na ON na.source = c.source_a
    JOIN n nb ON nb.source = c.source_b
    """,
)
def q99u_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-governance forensics: the EXACT pairwise content-overlap
    matrix between sources — Jaccard over each source's set of distinct
    8-gram shingles. High off-diagonal overlap means two feeds mirror or
    scrape each other; the number a mix designer checks before treating
    sources as independent (double-counted content silently upweights
    itself through any per-source quota).

    Scale: the per-shingle source list is bounded by |sources| (a small
    constant, unlike per-DOC pair joins), so the bucket-group pair
    expansion (collect_set per gh → i<j pairs) is safe even for
    boilerplate shingles shared by every source; intersections aggregate
    map-side from the (gh → source-pair) explosion, per-source set sizes
    are one groupBy, and the final matrix is |sources|² rows joined to
    them with broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT widened (round 16): A/B'd 1.57 -> 1.84 s best-of-3 — the
    # distinct + pair-expansion shuffles dominate, not the digest pass.
    t = docs.select("source", F.split("text", " ").alias("w"))
    g = (
        t.filter(F.size("w") >= _SSJ_GRAM)
        .select(
            "source",
            "w",
            F.explode(
                F.sequence(F.lit(1), F.size("w") - (_SSJ_GRAM - 1))
            ).alias("i"),
        )
        .select(
            "source",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), _SSJ_GRAM))
            ).alias("gh"),
        )
        .distinct()
    )
    n = g.groupBy("source").agg(F.count("*").alias("n"))
    buckets = (
        g.groupBy("gh")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(ss) - 2), i ->"
                " transform(sequence(i + 1, size(ss) - 1), j ->"
                " struct(ss[i] AS a, ss[j] AS b))))"
            )
        ).alias("p")
    )
    c = pairs.groupBy(
        F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
    ).agg(F.count("*").alias("n_common"))
    na = n.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    nb = n.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        c.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q99zb: sampled LSH recall evaluation against exact prefix-join ground truth
# ---------------------------------------------------------------------------

# Deterministic 1-in-_RECALL_SAMPLE_MOD (currently 1-in-5, i.e. a 20%)
# document sample for the ground-truth side: exact
# all-near-dup-pairs ground truth is inherently quadratic in the blocking
# candidates (on a low-diversity corpus EVERY pair shares bigrams), so
# production recall QA runs on a held-out sample sized to make the exact
# computation affordable — the estimate is unbiased for pair recall under
# uniform sampling, and md5 keeps it reproducible.
_RECALL_SAMPLE_MOD = 5

_RECALL_SAMPLED_DUCK = (
    md5_hex32_duck("CAST(doc_id AS VARCHAR)")
    + f" % {_RECALL_SAMPLE_MOD} = 0"
)


@query(
    "q99zb_lsh_recall_eval",
    oracle=f"""
    WITH docs_s AS (
      SELECT doc_id, text FROM documents WHERE {_RECALL_SAMPLED_DUCK}
    ), {_LSH_CTES_DUCK.replace("FROM documents", "FROM docs_s")},
    lsh AS (
      SELECT doc_a, doc_b FROM cand WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    truth AS (
      SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM sh a JOIN sh c ON a.doc_id < c.doc_id
      WHERE len(a.s) > 0 AND len(c.s) > 0
        AND CAST(len(list_intersect(a.s, c.s)) AS DOUBLE)
              / len(list_distinct(a.s || c.s)) >= {JACCARD_THRESHOLD}
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_true_pairs,
           (SELECT COUNT(*) FROM lsh) AS n_lsh_pairs,
           (SELECT COUNT(*) FROM lsh JOIN truth USING (doc_a, doc_b))
             AS n_matched,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0 THEN
             CAST((SELECT COUNT(*) FROM lsh JOIN truth
                   USING (doc_a, doc_b)) AS DOUBLE)
               / (SELECT COUNT(*) FROM truth)
           ELSE 1.0 END AS recall
    """,
)
def q99zb_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality QA: the RECALL of q41's banded MinHash-LSH candidate
    generation, measured against exact ground truth on a deterministic
    1-in-``_RECALL_SAMPLE_MOD`` (20%) document sample — every sampled pair
    with bigram-shingle
    Jaccard >= 0.5 (computed by the exact prefix join, no false negatives
    by the pinned lemma) vs the pairs LSH surfaces on the same sample.
    LSH precision is 1.0 by construction (candidates are exact-verified),
    so sampled recall is the number that decides whether 2 bands × 2 rows
    is enough banding — the measurement you rerun when the near-dup
    profile of incoming data shifts.

    WHY a sample: exact all-pairs ground truth is inherently quadratic in
    blocking candidates (a low-diversity corpus shares bigrams between
    almost every pair — no exact method escapes that), so production
    recall QA sizes a uniform sample to make exactness affordable;
    md5-derived sampling keeps the estimate reproducible across engines
    and runs. The full-corpus LSH path itself stays the scalable pinned
    shape — only the TRUTH is sampled.

    Oracle note: the SQL ground truth is the brute-force pairwise join
    over the sample, so the driver check proves the prefix-join plan
    equals the brute-force definition end-to-end."""
    sampled = (
        F.expr(md5_hex32_spark("CAST(doc_id AS STRING)"))
        % _RECALL_SAMPLE_MOD
        == 0
    )
    docs = load_table(spark, sf_dir, "documents").filter(sampled)
    sh = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).select("doc_id", F.expr(_SHINGLES_SPARK).alias("s"))
    g = sh.filter(F.size("s") > 0).select(
        "doc_id", F.explode("s").alias("gh")
    )
    truth = setsim_pairs(g, JACCARD_THRESHOLD).select("doc_a", "doc_b")
    lsh = lsh_verified_pairs(docs, JACCARD_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    n_true = truth.agg(F.count("*").alias("n_true_pairs"))
    n_lsh = lsh.agg(F.count("*").alias("n_lsh_pairs"))
    n_match = (
        lsh.join(truth, ["doc_a", "doc_b"])
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        n_true.crossJoin(n_lsh)
        .crossJoin(n_match)
        .select(
            "n_true_pairs",
            "n_lsh_pairs",
            "n_matched",
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_matched").cast("double") / F.col("n_true_pairs"),
            )
            .otherwise(F.lit(1.0))
            .alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup-aware train/val/test split leakage audit
# ---------------------------------------------------------------------------

# deterministic md5 id-bucket in [0,100) — the q69 idiom, shared verbatim
# between engines so split membership is reproducible across runs/engines
_ID_BUCKET_DUCK = md5_hex32_duck("CAST(doc_id AS VARCHAR)") + " % 100"
# train 0-89 / val 90-94 / test 95-99
_SPLIT_DUCK = (
    f"CASE WHEN {_ID_BUCKET_DUCK} < 90 THEN 'train' "
    f"WHEN {_ID_BUCKET_DUCK} < 95 THEN 'val' ELSE 'test' END"
)


@query(
    "q99zp_split_leakage_audit",
    oracle=f"""
    WITH {_LSH_CTES_DUCK},
    v AS (
      SELECT doc_a, doc_b, jaccard FROM cand
      WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    s AS (
      SELECT doc_id, {_SPLIT_DUCK} AS split FROM documents
    )
    SELECT v.doc_a, v.doc_b,
           sa.split AS split_a, sb.split AS split_b, v.jaccard
    FROM v
    JOIN s sa ON sa.doc_id = v.doc_a
    JOIN s sb ON sb.doc_id = v.doc_b
    WHERE sa.split <> sb.split
    """,
)
def q99zp_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware split-contamination audit: near-duplicate pairs that
    straddle a train/val/test boundary. Random (here: deterministic
    md5-bucket, the q69 idiom — train 0-89 / val 90-94 / test 95-99)
    document-level splits leak whenever two near-identical documents
    land on opposite sides — the eval set then scores memorization, not
    generalization (the C4/Pile/GPT-3 decontamination motivation; Lee et
    al. 2022 measure the effect directly). This query joins the q41
    exact-verified near-dup edge set (Jaccard >= {JACCARD_THRESHOLD})
    against the split assignment of BOTH endpoints and emits every
    cross-split pair — the work-list a pipeline either moves to one side
    (cluster-level splitting) or drops from eval.

    Scale: the edge set is the bucketed LSH join (q41's pinned shape,
    never all-pairs); the two split lookups are doc_id equi-joins of an
    edge-sized frame against a map-side-projected (doc_id, split) slice
    — the corpus text never travels. No global sort; output is
    edge-bounded."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(md5_hex32_spark("CAST(doc_id AS STRING)")) % 100
    splits = docs.select(
        "doc_id",
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    pairs = lsh_verified_pairs(docs, JACCARD_THRESHOLD)
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint selection (MOSS)
# ---------------------------------------------------------------------------

WINNOW_K = 5  # tokens per k-gram
WINNOW_W = 4  # window of consecutive gram hashes per selection
# guarantee threshold: any shared run of >= W + K - 1 = 8 tokens is caught
_POS_PAD = 9
# position-encoding capacity: the order-embedding key packs BASE - pos
# into _POS_PAD digits, so gram positions must stay under _POS_BASE
# (10^9 grams/doc — beyond any real document). The bound is ENFORCED,
# not assumed: docs at/over it are excluded from gram generation in both
# engines (they surface with n_fp = 0 via the left join, like the
# short-doc rule) — an unenforced bound would let BASE - pos go
# negative, whose '-' sorts before digits and silently breaks the
# rightmost-min tie plus the position decode.
_POS_BASE = 10 ** _POS_PAD
_WINNOW_MAX_TOKENS = _POS_BASE + WINNOW_K - 1  # size(w) bound <=> pos bound


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Select winnowed fingerprints ``(doc_id, gh, pos)`` from ``docs``.

    Classic winnowing (Schleimer/Wilkerson/Aiken, "Winnowing: local
    algorithms for document fingerprinting", SIGMOD 2003): hash every
    k-token gram, slide a window of ``w`` consecutive hashes, keep the
    minimum hash of each window — the RIGHTMOST position on ties (the
    paper's rule; it maximizes selection reuse between windows) — then
    de-duplicate the selections. Guarantees: every shared token run of
    length >= w + k - 1 yields a shared fingerprint (pinned by a
    property test), and expected density is ~2/(w+1) of gram count.

    The rightmost-min-tie argmin rides ONE window pass as a plain
    ``MIN`` over an order-embedding string key ``gh || '|' ||
    lpad(POS_BASE - pos)`` — smaller key = (smaller hash, larger
    position) — so both engines compute the identical selection with no
    argmin/tie-order ambiguity. Leading windows are the SQL trailing
    frame (``w-1 PRECEDING``, clipped at the doc start), so docs with
    1..w-1 grams still fingerprint; the e >= w windows are exactly the
    paper's.
    """
    # widen a single-split scan before the per-position md5 pass (see
    # tables.widen_if_narrow — no-op on multi-split production scans)
    t = widen_if_narrow(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.split("text", " ").alias("wrd")
    )
    g = (
        t.filter(
            (F.size("wrd") >= k) & (F.size("wrd") < _WINNOW_MAX_TOKENS)
        )
        .select(
            "doc_id",
            "wrd",
            F.explode(
                F.sequence(F.lit(1), F.size("wrd") - (k - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("wrd"), F.col("i"), k))
            ).alias("gh"),
        )
    )
    key = F.concat(
        F.col("gh"),
        F.lit("|"),
        F.lpad((F.lit(_POS_BASE) - F.col("i")).cast("string"), _POS_PAD, "0"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(-(w - 1), 0)
    )
    return (
        g.select("doc_id", F.min(key).over(win).alias("mk"))
        .select(
            "doc_id",
            F.substring("mk", 1, 32).alias("gh"),
            (
                F.lit(_POS_BASE)
                - F.substring("mk", 34, _POS_PAD).cast("int")
            ).alias("pos"),
        )
        .distinct()
    )


@query(
    "q99zr_winnowing_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id, i,
             md5(array_to_string(w[i:i+{WINNOW_K - 1}], ' ')) AS gh
      FROM t, UNNEST(range(1, len(w) - {WINNOW_K - 2})) AS u(i)
      WHERE len(w) >= {WINNOW_K} AND len(w) < {_WINNOW_MAX_TOKENS}
    ), k AS (
      SELECT doc_id,
             MIN(gh || '|' ||
                 lpad(CAST({_POS_BASE} - i AS VARCHAR), {_POS_PAD}, '0'))
               OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
               AS mk
      FROM g
    ), sel AS (
      SELECT DISTINCT doc_id, substr(mk, 1, 32) AS gh,
             {_POS_BASE} - CAST(substr(mk, 34, {_POS_PAD}) AS INT) AS pos
      FROM k
    ), sh AS (
      SELECT gh, COUNT(DISTINCT doc_id) AS nd FROM sel GROUP BY gh
    ), pd AS (
      SELECT sel.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_fp,
             CAST(SUM(CASE WHEN sh.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_fp
      FROM sel JOIN sh USING (gh) GROUP BY sel.doc_id
    )
    SELECT d.doc_id,
           CAST(GREATEST(len(string_split(d.text, ' '))
                         - {WINNOW_K - 1}, 0) AS BIGINT) AS n_grams,
           COALESCE(pd.n_fp, 0) AS n_fp,
           COALESCE(pd.n_shared_fp, 0) AS n_shared_fp,
           CASE WHEN len(string_split(d.text, ' ')) - {WINNOW_K - 1} > 0
                THEN CAST(COALESCE(pd.n_fp, 0) AS DOUBLE)
                     / (len(string_split(d.text, ' ')) - {WINNOW_K - 1})
                ELSE 0.0 END AS fp_density
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def q99zr_winnowing_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowing document fingerprinting (MOSS; Schleimer et al., SIGMOD
    2003) — the bounded-density alternative to q97's full gram census.
    Winnowing keeps ~2/(w+1) of all gram hashes yet still GUARANTEES a
    shared fingerprint for any cross-document token run of length >=
    w + k - 1 (= 8 here, the same span width as the q97 family), which
    is why plagiarism/clone detectors fingerprint with it instead of
    shipping every gram. Emits per-document selection stats plus the
    cross-document match signal: ``n_shared_fp`` counts this doc's
    fingerprints that some OTHER document also selected.

    Scale: the selection is one doc-partitioned window pass (never a
    global sort; hot grams cannot skew it — the partition axis is
    doc_id); the cross-doc count then aggregates and joins back the
    WINNOWED set only, ~2/(w+1) of the q97 join-back volume — that
    density factor is the whole economic argument for winnowing at
    100 TB, and the groupBy side collapses boilerplate fingerprints
    map-side exactly as q97 does (AQE-splittable join back). Per-doc
    gram counts are pure arithmetic on the token count (no second
    explode). Docs under {WINNOW_K} tokens surface with zeros via the
    left join (the short-doc rule)."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the winnowed selection ONCE (lazy localCheckpoint, the
    # q41 idiom) — it feeds both the per-gh distinct-doc count and the
    # per-doc join-back, and recomputing it means running the explode +
    # doc-partitioned window sort twice
    sel = winnow_fingerprints(docs).transform(pin_lazy)
    sh = sel.groupBy("gh").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        sel.join(sh, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_fp"),
            F.sum(
                F.when(F.col("nd") >= 2, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_shared_fp"),
        )
    )
    n_grams = F.greatest(
        F.size(F.split("text", " ")) - (WINNOW_K - 1), F.lit(0)
    ).cast("bigint")
    return (
        docs.select("doc_id", n_grams.alias("n_grams"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_fp", F.lit(0).cast("bigint")).alias("n_fp"),
            F.coalesce("n_shared_fp", F.lit(0).cast("bigint")).alias(
                "n_shared_fp"
            ),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce("n_fp", F.lit(0)).cast("double")
                / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("fp_density"),
        )
    )


# ---------------------------------------------------------------------------
# q99zzs: canonical-representative selection — the dedup DECISION stage
# ---------------------------------------------------------------------------


@query(
    "q99zzs_dedup_canonical_selection",
    oracle=f"""
    WITH RECURSIVE {_LSH_CTES_DUCK}, e AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      WHERE jaccard >= {CLUSTER_THRESHOLD}
    ), edges AS (
      SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ), reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT edges.dst, reach.r FROM reach JOIN edges ON edges.src = reach.doc_id
    ), comp AS (
      SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id
    ), qt AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN})))
               AS n_stop
      FROM documents
    ), quality AS (
      SELECT doc_id,
             0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
               + 0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)
               + 0.2 * least(5.0 * (CAST(n_stop AS DOUBLE) / n_tokens), 1.0)
               AS quality_score
      FROM qt
    ), j AS (
      SELECT c.doc_id, c.component, q.quality_score
      FROM comp c JOIN quality q ON c.doc_id = q.doc_id
    ), s AS (
      SELECT doc_id, component, quality_score,
             COUNT(*) OVER (PARTITION BY component) AS n_members,
             FIRST_VALUE(doc_id) OVER (
               PARTITION BY component
               ORDER BY quality_score DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS canonical_id
      FROM j
    )
    SELECT doc_id, component, CAST(n_members AS BIGINT) AS n_members,
           quality_score, canonical_id,
           (doc_id = canonical_id) AS keep
    FROM s WHERE n_members >= 2
    """,
)
def q99zzs_dedup_canonical_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup DECISION stage: which document of each near-duplicate
    cluster survives. q48's connected components (q41's exact-verified
    LSH edges, transitively closed) pick the clusters; within each
    multi-member cluster the keeper is the HIGHEST-q31-quality-score
    document (doc_id as the deterministic tie-break) — the production
    rule ("keep the best copy, purge the rest"; cf. the cluster-keeper
    policies in Lee et al. 2022 / SemDeDup, which keep one
    representative per duplicate cluster) rather than q48's
    lowest-id placeholder. One row per member of a multi-member
    cluster: the purge work-list (keep = false) plus its justification
    (the canonical doc and both scores' inputs are joinable). The
    oracle replays q31's EXACT arithmetic (same operation order → the
    same bit-identical doubles both engines already agree on at the
    q31 gate), so a drift between this query's embedded score and
    q31's is caught loudly as a value mismatch.

    Scale (100 TB): components via q48's O(log diameter) label
    propagation; the selection adds ONE component-key shuffle (count
    and argmax ride the same window partitioning) and a doc_id
    equi-join against the quality frame — no corpus-scale sort, no
    driver-side data."""
    from allora_indexer_spark.operators.textstats import q31_quality_score

    comp = q48_dedup_components(spark, sf_dir).select("doc_id", "component")
    q = q31_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    j = comp.join(q, "doc_id")
    w = Window.partitionBy("component")
    wo = (
        Window.partitionBy("component")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    s = j.select(
        "doc_id",
        "component",
        "quality_score",
        F.count("*").over(w).alias("n_members"),
        F.first("doc_id").over(wo).alias("canonical_id"),
    )
    return s.filter(F.col("n_members") >= 2).select(
        "doc_id",
        "component",
        "n_members",
        "quality_score",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
    )
