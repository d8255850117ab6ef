"""X2 — similarity search over the ``embeddings`` table
(SURVEY.md §2.D): brute-force cosine top-k baseline + LSH-bucketed
approximate variant (the scale path).

Vectors are ``array<float>`` columns (the multimodal embedding
convention, X3); all math runs as JVM higher-order expressions
(``zip_with`` + ``aggregate``) in double precision — no UDF, no
driver-side loop. Top-k compiles to TakeOrderedAndProject (per-
partition heaps, no global sort).

Scale stance: brute-force is O(N·d) per query — fine fanned out over
partitions for one query, wrong for batch query workloads; the
random-hyperplane LSH entry bounds each query to its bucket
(Hamming-0 probe here; multi-probe at lower recall cost is the
documented extension). An IVF variant is the same shape with learned
centroids instead of random planes.
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.plans.registry import query, scoped_persist
from couchwarehouse_spark.plans.sizing import data_width

QUERY_VEC_ID = 0  # the corpus vector used as the search query
TOP_K = 10

# SRP-LSH plane count is DERIVED from the corpus size, not fixed:
# planes = clamp(ceil(log2(N / TARGET_BUCKET_ROWS)), P_MIN, P_MAX), so
# the expected bucket holds ~TARGET_BUCKET_ROWS vectors at any scale —
# per-bucket pair/score work stays bounded at 100× data with no
# retuning (more data → more planes → same bucket size). Both lanes
# evaluate the SAME formula (Python over count(), SQL over a scalar
# COUNT subquery) against the SAME P_MAX plane literals, so even the
# derived geometry is exactly oracle-checked.
P_MIN, P_MAX = 4, 24
TARGET_BUCKET_ROWS = 1024


def derive_planes(n_rows: int) -> int:
    """Plane count for an N-row corpus; mirrors ``_NP_SQL`` exactly.
    Both sides are IEEE-double log2/ceil; the only values where a ULP
    could flip ceil are exact powers of two, which log2 computes
    exactly on both engines."""
    import math

    return min(
        P_MAX,
        max(P_MIN, math.ceil(math.log2(max(n_rows, 2) / float(TARGET_BUCKET_ROWS)))),
    )


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, z: a + z)


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def norm(x: Column) -> Column:
    """A vector's L2 norm, ``sqrt(dot(x, x))`` — precompute this ONCE
    per vector (one extra double through the exchange) so pair stages
    evaluate a single higher-order dot per pair via ``cosine_n``."""
    return F.sqrt(dot(x, x))


def cosine_n(x: Column, y: Column, nx: Column, ny: Column) -> Column:
    """``cosine`` with both norms precomputed: dot(x,y) / (nx * ny).
    Bit-identical to ``cosine(x, y)`` — the SAME IEEE operations in
    the SAME order (each norm is just evaluated once per vector
    instead of once per pair), verified pairwise-equal on the full
    bucket self-join. Cuts the dominant pair-stage cost of every
    bucketed similarity join from 3 interpreted higher-order dots to
    1 (measured 7.9 s -> 1.1 s on the sf0.1 bucket pair join)."""
    return dot(x, y) / (nx * ny)


@query(
    "knn_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT v AS qv FROM v WHERE vec_id = {QUERY_VEC_ID})
    SELECT v.vec_id, v.label,
           round(list_cosine_similarity(v.v, q.qv), 4) AS cos_sim
    FROM v CROSS JOIN q
    WHERE v.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(v.v, q.qv) DESC, v.vec_id
    LIMIT {TOP_K}
    """,
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (X2 baseline): query = corpus vector 0.

    The single-row query side joins in as a broadcast (Catalyst sees a
    1-row relation); each partition scores its vectors and keeps a
    k-heap — TakeOrderedAndProject, no global sort, nothing but the
    k winners reaches the driver. Ordered by raw (unrounded) cosine
    with vec_id tiebreak; the emitted value is rounded for hash
    stability.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        v.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("_cos", cos)
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", "label", F.round("_cos", 4).alias("cos_sim"))
    )


def _hyperplanes(dim: int = 64, n: int = P_MAX) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-derived, seedless
    of any RNG state so both lanes can inline identical literals)."""
    planes = []
    for p in range(n):
        row = []
        for d in range(dim):
            # simple LCG-ish mix — fixed, reproducible, public math
            x = (1103515245 * (p * 64 + d + 12345) + 54321) % 2147483647
            row.append((x / 2147483647.0) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _bucket_expr_spark(vcol: str, planes: list[list[float]]) -> Column:
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        parr = F.array(*[F.lit(float(w)) for w in plane])
        bit = F.when(dot(F.col(vcol), parr) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def _bucket_expr_sql(vexpr: str, planes: list[list[float]]) -> str:
    terms = []
    for i, plane in enumerate(planes):
        lits = "[" + ", ".join(repr(float(w)) for w in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(list_transform({vexpr}, x -> CAST(x AS DOUBLE)), {lits}) > 0 "
            f"THEN 1 ELSE 0 END) * {1 << i}"
        )
    return " + ".join(terms)


_ALL_PLANES = _hyperplanes()

_COUNT_CACHE: dict[str, int] = {}


def corpus_planes(spark: SparkSession, sf_dir: str, table: str = "embeddings"):
    """The derived plane prefix for this corpus (count cached per
    table path — one tiny count job per bench/session, not per
    query). Pre-register a known row count in ``_COUNT_CACHE`` to
    skip the probe entirely (the 'passed hint' path)."""
    key = f"{sf_dir.rstrip('/')}/{table}"
    if key not in _COUNT_CACHE:
        _COUNT_CACHE[key] = load_table(spark, sf_dir, table).count()
    return _ALL_PLANES[: derive_planes(_COUNT_CACHE[key])]


# SQL twin of derive_planes(); GREATEST(.., 2) mirrors max(n, 2).
_NP_SQL = (
    f"LEAST({P_MAX}, GREATEST({P_MIN}, CAST(ceil(log2("
    f"GREATEST((SELECT count(*) FROM embeddings), 2) / {TARGET_BUCKET_ROWS}.0"
    f")) AS INT)))"
)


def _bucket_expr_sql_derived(vexpr: str) -> str:
    """Masked full-width bucket: bit i of the SRP signature depends
    only on plane i, so ``full_bucket & ((1 << np) - 1)`` equals the
    bucket computed from the first ``np`` planes — which is exactly
    what the Spark lane computes from the ``corpus_planes`` prefix."""
    full = _bucket_expr_sql(vexpr, _ALL_PLANES)
    return f"(({full}) & ((1 << ({_NP_SQL})) - 1))"

ANN_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = {QUERY_VEC_ID})
    SELECT b.vec_id, b.label, b.bucket,
           round(list_cosine_similarity(b.v, q.qv), 4) AS cos_sim
    FROM b CROSS JOIN q
    WHERE b.bucket = q.qb AND b.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(b.v, q.qv) DESC, b.vec_id
    LIMIT {TOP_K}
"""


@query("ann_lsh_topk", oracle=ANN_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (X2 scale path).

    Random-hyperplane (SRP) LSH: the corpus-derived plane count (see
    ``derive_planes``) gives sign-bit buckets of ~TARGET_BUCKET_ROWS
    vectors at any N; the query probes only its own bucket — at
    100 TB the bucket id is the partition/cluster key and a query
    touches one bounded partition instead of the corpus, with no
    retuning as data grows. Identical hyperplane literals and the
    identical derivation are inlined into both lanes, so even this
    approximate operator is oracle-checked exactly (same buckets,
    same winners).

    Recall knob: more planes → smaller buckets, lower recall;
    multi-probe (flip one bit) trades compute back for recall. IVF =
    same query shape with k-means centroids as the bucketer.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bucket", _bucket_expr_spark("v", corpus_planes(spark, sf_dir)))
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        v.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qb")) & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("_cos", cos)
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", "label", "bucket", F.round("_cos", 4).alias("cos_sim"))
    )


def argmin_cell(vcol: Column, cents_col: Column, cell_type) -> Column:
    """Nearest-centroid assignment as a PURE PROJECTION: an
    ``aggregate`` argmin over a broadcast array of (cell, centroid)
    structs — squared-L2 per candidate, strict ``<`` keeps the first
    (lowest) cell on ties. No shuffle touches the vector table; this
    is the IVF/k-means assignment kernel shared by ``ivf_topk`` and
    ``kmeans_lloyd_step``."""
    init = F.struct(
        F.lit(None).cast(cell_type).alias("cell"),
        F.lit(float("inf")).alias("d"),
    )

    def step(acc: Column, c: Column) -> Column:
        d2 = F.aggregate(
            F.zip_with(vcol, c["centroid"], lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, z: s + z,
        )
        return F.when(
            d2 < acc["d"], F.struct(c["cell"].alias("cell"), d2.alias("d"))
        ).otherwise(acc)

    return F.aggregate(cents_col, init, step)["cell"]


IVF_ORACLE = f"""
    WITH flat AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    dims AS (
      SELECT label AS cell, dim, round(avg(x), 6) AS c FROM flat GROUP BY label, dim
    ),
    cents AS (
      SELECT cell, list(c ORDER BY dim) AS centroid FROM dims GROUP BY cell
    ),
    v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    assigned AS (
      SELECT vec_id, label, v,
             min_by(cell, list_distance(v, centroid)) AS cell
      FROM v CROSS JOIN cents
      GROUP BY vec_id, label, v
    ),
    q AS (SELECT v AS qv, cell AS qcell FROM assigned WHERE vec_id = {QUERY_VEC_ID})
    SELECT a.vec_id, a.label, a.cell,
           round(list_cosine_similarity(a.v, q.qv), 4) AS cos_sim
    FROM assigned a CROSS JOIN q
    WHERE a.cell = q.qcell AND a.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.vec_id
    LIMIT {TOP_K}
"""


@query("ivf_topk", oracle=IVF_ORACLE)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k (X2): coarse quantizer = per-label
    mean centroids (the k-means seed step); every vector is assigned
    to its NEAREST centroid cell (argmin L2 — which may not be its own
    label's); the query probes only its own cell.

    Same shape as a trained IVF index: |cells| ≪ N, a query scores
    N/|cells| vectors; nprobe>1 re-adds neighbor cells for recall.
    Both lanes round centroids to 6 decimals BEFORE distances so cell
    assignment cannot flip on last-ulp average differences between
    engines. Scale: the whole centroid table (|cells|×d doubles — KB)
    collapses to ONE row of array<struct<cell,centroid>>, broadcast,
    and cell assignment is a pure projection: an ``aggregate`` argmin
    over that array. No shuffle touches the corpus between the scan
    and the final top-k heap (the old shape grouped corpus×|cells|
    rows BY THE FULL VECTOR — a |cells|× shuffle amplification).
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))

    dims = (
        v.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy(F.col("label").alias("cell"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cents = dims.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc")
    ).select("cell", F.col("dc.c").alias("centroid"))
    # One row holding every (cell, centroid), cell-sorted so the argmin
    # scan order (and therefore tie-breaking: strict < keeps the first,
    # i.e. lowest, cell) is deterministic.
    cents_row = cents.agg(
        F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias("cents")
    )

    assigned = v.crossJoin(F.broadcast(cents_row)).select(
        "vec_id",
        "label",
        "v",
        argmin_cell(F.col("v"), F.col("cents"), cents.schema["cell"].dataType).alias(
            "cell"
        ),
    )
    q = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("cell").alias("qcell")
    )
    cos = cosine(F.col("v"), F.col("qv"))
    return (
        assigned.crossJoin(F.broadcast(q))
        .filter((F.col("cell") == F.col("qcell")) & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("_cos", cos)
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", "label", "cell", F.round("_cos", 4).alias("cos_sim"))
    )


@query(
    "centroid_similarity_per_label",
    oracle="""
    WITH flat AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    dims AS (
      SELECT label, dim, avg(x) AS c FROM flat GROUP BY label, dim
    ),
    centroids AS (
      SELECT label, list(c ORDER BY dim) AS centroid FROM dims GROUP BY label
    )
    SELECT e.label,
           count(*) AS n_vectors,
           round(avg(list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                            c.centroid)), 4) AS avg_cos_to_centroid
    FROM embeddings e JOIN centroids c USING (label)
    GROUP BY e.label
    """,
)
def centroid_similarity_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-cohesion probe (X2/IVF building block): per-label
    centroid (dimension-wise mean via posexplode + re-assembly), then
    the average cosine of members to their centroid.

    This is exactly the IVF coarse-quantizer training step's inner
    loop. Scale: posexplode multiplies rows ×64 but the aggregate is
    (label, dim)-keyed — partial aggregation collapses it map-side;
    centroids are |labels|×64 doubles — broadcast back.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    dims = (
        v.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
    )
    centroids = dims.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc")
    ).select("label", F.col("dc.c").alias("centroid"))
    cos = cosine(F.col("v"), F.col("centroid"))
    return (
        v.join(F.broadcast(centroids), "label")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg(cos), 4).alias("avg_cos_to_centroid"),
        )
    )


RRF_K = 60  # standard reciprocal-rank-fusion damping constant
RRF_LANE_DEPTH = 50  # candidates taken from each retrieval lane
RRF_TOP = 10


@query(
    "hybrid_search_rrf",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             (length(lower(text)) - length(replace(lower(text), 'data', ''))) / 4.0
           + (length(lower(text)) - length(replace(lower(text), 'table', ''))) / 5.0
               AS _score
      FROM documents
    ),
    t AS (
      SELECT doc_id AS id,
             row_number() OVER (ORDER BY _score DESC, doc_id) AS rt
      FROM scored WHERE _score > 0 AND doc_id <> {QUERY_VEC_ID}
      ORDER BY _score DESC, doc_id LIMIT {RRF_LANE_DEPTH}
    ),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
    s AS (
      SELECT e.vec_id AS id,
             row_number() OVER (
               ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id) AS rv
      FROM e CROSS JOIN q
      WHERE e.vec_id <> {QUERY_VEC_ID}
      ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.vec_id
      LIMIT {RRF_LANE_DEPTH}
    ),
    f AS (
      SELECT coalesce(t.id, s.id) AS doc_id,
             CAST(rt AS BIGINT) AS text_rank,
             CAST(rv AS BIGINT) AS vec_rank,
             coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + rt), 0)
           + coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + rv), 0) AS rrf
      FROM t FULL OUTER JOIN s ON t.id = s.id
    )
    SELECT doc_id, text_rank, vec_rank, round(rrf, 6) AS rrf_score
    FROM f ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (X2 + X4 capstone): fuse a term-match lane over
    ``documents`` with a cosine lane over ``embeddings`` (vec_id ==
    doc_id) by reciprocal-rank fusion — ``Σ 1/(60 + rank)`` — the
    standard way RAG pipelines combine lexical and vector retrieval.

    Determinism: the fused score is arithmetic on INTEGER ranks, so no
    engine-level float drift can reorder it; both lanes' orderings are
    themselves oracle-certified (``full_text_relevance``,
    ``knn_cosine_topk``). Scale: each lane reduces with a distributed
    top-k heap (TakeOrderedAndProject) BEFORE any window — row_number
    runs over 50 rows, never the corpus — and the fusion join is
    50×50.
    """
    from pyspark.sql import Window

    from couchwarehouse_spark.sinks.elasticsearch import full_text_search

    d = load_table(spark, sf_dir, "documents")
    hits = full_text_search(d, "text", "data table").filter(
        (F.col("_score") > 0) & (F.col("doc_id") != QUERY_VEC_ID)
    )
    t = (
        hits.orderBy(F.col("_score").desc(), "doc_id")
        .limit(RRF_LANE_DEPTH)
        .withColumn(
            "rt",
            F.row_number()
            .over(Window.orderBy(F.col("_score").desc(), "doc_id"))
            .cast("long"),  # match the oracle's BIGINT rank
        )
        .select(F.col("doc_id").alias("id"), "rt")
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    cos = cosine(F.col("v"), F.col("qv"))
    s = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("_cos", cos)
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(RRF_LANE_DEPTH)
        .withColumn(
            "rv",
            F.row_number()
            .over(Window.orderBy(F.col("_cos").desc(), "vec_id"))
            .cast("long"),
        )
        .select(F.col("vec_id").alias("id"), "rv")
    )

    one = F.lit(1.0)
    fused = (
        t.join(s, "id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(one / (F.lit(RRF_K) + F.col("rt")), F.lit(0.0))
            + F.coalesce(one / (F.lit(RRF_K) + F.col("rv")), F.lit(0.0)),
        )
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "id")
        .limit(RRF_TOP)
        .select(
            F.col("id").alias("doc_id"),
            F.col("rt").alias("text_rank"),
            F.col("rv").alias("vec_rank"),
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


BATCH_QUERY_MOD = 100  # vec_id % 100 == 0 plays the query-batch role
BATCH_TOP_K = 3


@query(
    "ann_batch_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % {BATCH_QUERY_MOD} = 0),
    s AS (
      SELECT q.qid, e.vec_id,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                                         e.vec_id) AS rank,
             round(list_cosine_similarity(e.v, q.qv), 4) AS cos_sim
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id, rank, cos_sim FROM s WHERE rank <= {BATCH_TOP_K}
    """,
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch similarity search (X2): top-k cosine neighbors for a
    BATCH of query vectors at once (every vec_id % 100 == 0) — the
    shape embedding-pipeline retrieval actually runs (N queries per
    job, not one).

    Scale: queries broadcast (Q ≪ N); scoring is a projection over
    the corpus scan. Top-k is TWO-STAGE so no single reducer ever
    sees a query's full score column: stage 1 ranks within
    (query, input-partition) — P×Q balanced window partitions — and
    keeps k per cell; stage 2 ranks the surviving P·k rows per query.
    Same result as one global window (rank order is total: cosine
    desc, vec_id), verified by the single-window oracle.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", norm(F.col("v")))  # 1 dot per (query, doc) pair
    q = v.filter(F.col("vec_id") % BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        v.repartition(data_width(spark, sf_dir, "embeddings"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "_cos", cosine_n(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qn"))
        )
        .withColumn("_pid", F.spark_partition_id())
        .select("qid", "vec_id", "_cos", "_pid")
    )
    w_local = Window.partitionBy("qid", "_pid").orderBy(
        F.col("_cos").desc(), "vec_id"
    )
    survivors = scored.withColumn("_r", F.row_number().over(w_local)).filter(
        F.col("_r") <= BATCH_TOP_K
    )
    w_final = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    return (
        survivors.withColumn("rank", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rank") <= BATCH_TOP_K)
        .select("qid", "vec_id", "rank", F.round("_cos", 4).alias("cos_sim"))
    )


MULTIPROBE_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = {QUERY_VEC_ID})
    SELECT b.vec_id, b.label, b.bucket,
           round(list_cosine_similarity(b.v, q.qv), 4) AS cos_sim
    FROM b CROSS JOIN q
    WHERE bit_count(xor(CAST(b.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= 1
      AND b.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(b.v, q.qv) DESC, b.vec_id
    LIMIT {TOP_K}
"""


@query("ann_multiprobe_topk", oracle=MULTIPROBE_ORACLE)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k (X2): like ``ann_lsh_topk`` but the query
    also probes every Hamming-1 neighbor bucket — ``bit_count(bucket ^
    qb) <= 1`` admits the ``n_planes`` buckets one sign-flip away,
    recovering the
    near-misses single-bucket SRP loses (multi-probe LSH, Lv et al.
    VLDB'07, public knowledge). Scored set ≈ (1+n_planes) buckets
    instead of 1: the standard recall/compute dial.

    Scale: identical shape to the single-probe entry — bucket id is
    the partition key, a query touches the 1+n_planes bucket
    partitions, scoring stays a projection, top-k a per-partition
    heap. Oracle-checked exactly (shared hyperplane literals).
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bucket", _bucket_expr_spark("v", corpus_planes(spark, sf_dir)))
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    cos = cosine(F.col("v"), F.col("qv"))
    near = F.bit_count(
        F.col("bucket").cast("long").bitwiseXOR(F.col("qb").cast("long"))
    ) <= 1
    return (
        v.crossJoin(F.broadcast(q))
        .filter(near & (F.col("vec_id") != QUERY_VEC_ID))
        .withColumn("_cos", cos)
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", "label", "bucket", F.round("_cos", 4).alias("cos_sim"))
    )


@query(
    "embedding_norm_audit",
    oracle="""
    WITH v AS (
      SELECT label,
             sqrt(coalesce(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0)) AS nrm,
             len(embedding) AS dim
      FROM embeddings
    )
    SELECT label,
           count(*)                              AS n_vectors,
           CAST(min(dim) AS INTEGER)             AS min_dim,
           CAST(max(dim) AS INTEGER)             AS max_dim,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           round(min(nrm), 4)                    AS min_norm,
           round(max(nrm), 4)                    AS max_norm,
           round(avg(nrm), 4)                    AS avg_norm
    FROM v
    GROUP BY label
    """,
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity gate (X2 pre-index audit): per label, vector
    counts, dimension extrema (a mixed-dim corpus breaks every ANN
    index), zero-norm vectors (cosine-undefined), and L2-norm
    extrema/mean — the checks an embedding pipeline runs before
    building an index or trusting cosine scores.

    Scale: pure projection + one hash aggregate; norms never leave
    the mapper unreduced. All JVM higher-order expressions.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "label",
        F.sqrt(dot(F.col("embedding").cast("array<double>"),
                   F.col("embedding").cast("array<double>"))).alias("nrm"),
        F.size("embedding").alias("dim"),
    )
    return v.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0)).alias("n_zero"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
    )


QUANT_ORACLE = """
    WITH flat AS (
      SELECT unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    dims AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM flat GROUP BY dim),
    mm AS (
      SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs FROM dims
    ),
    v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    errs AS (
      SELECT label,
             list_transform(range(0, len(v)), i ->
               CASE WHEN (mxs[i+1] - mns[i+1]) = 0 THEN 0.0
               ELSE abs((v[i+1] - mns[i+1]) -
                    ((least(floor(((v[i+1] - mns[i+1]) / (mxs[i+1] - mns[i+1])) * 256),
                            255) + 0.5)
                     * (mxs[i+1] - mns[i+1])) / 256)
               END) AS e
      FROM v CROSS JOIN mm
    )
    SELECT label,
           count(*)                       AS n_vectors,
           round(avg(list_max(e)), 6)     AS avg_max_err,
           round(max(list_max(e)), 6)     AS max_max_err
    FROM errs GROUP BY label
"""


@query("int8_quantization_audit", oracle=QUANT_ORACLE)
def int8_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (int8) quantization round-trip audit (X2): per-dimension
    global min/max → 256-bin uniform quantizer (``floor``, midpoint
    reconstruction) → per-vector max absolute reconstruction error,
    reduced per label. The go/no-go check before shipping a quantized
    ANN index: if max error rivals inter-vector distances, 8 bits is
    too coarse for this corpus.

    ``floor`` binning, not ``round``: both engines define floor
    identically, while round-half placement differs across engines —
    the quantizer itself must be engine-portable for the oracle to be
    exact. Scale: the min/max pass is a (dim)-keyed partial aggregate
    (64 rows out); the quantize+error pass is a pure projection
    against the broadcast bounds row; the final reduce is per-label.
    Two corpus scans, zero corpus shuffles.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))

    dims = (
        v.select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    mm = dims.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("dmm")
    ).select(F.col("dmm.mn").alias("mns"), F.col("dmm.mx").alias("mxs"))

    def err_arr(vcol: Column, mns: Column, mxs: Column) -> Column:
        d = F.zip_with(vcol, mns, lambda x, m: x - m)
        r = F.zip_with(mxs, mns, lambda a, b: a - b)

        def one(dd: Column, rr: Column) -> Column:
            q = F.least(F.floor(((dd / rr) * 256)), F.lit(255))
            return F.when(rr == 0, F.lit(0.0)).otherwise(
                F.abs(dd - ((q + 0.5) * rr) / 256)
            )

        return F.zip_with(d, r, one)

    errs = v.crossJoin(F.broadcast(mm)).select(
        "label", F.array_max(err_arr(F.col("v"), F.col("mns"), F.col("mxs"))).alias("me")
    )
    return errs.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("me"), 6).alias("avg_max_err"),
        F.round(F.max("me"), 6).alias("max_max_err"),
    )


KMEANS_ORACLE = """
    WITH flat AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    dims AS (
      SELECT label AS cell, dim, round(avg(x), 6) AS c FROM flat GROUP BY label, dim
    ),
    cents AS (
      SELECT cell, list(c ORDER BY dim) AS centroid FROM dims GROUP BY cell
    ),
    v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    assigned AS (
      SELECT vec_id, v,
             min_by(cell, list_distance(v, centroid)) AS cell
      FROM v CROSS JOIN cents
      GROUP BY vec_id, label, v
    ),
    newflat AS (
      SELECT cell, unnest(v) AS x, unnest(range(0, len(v))) AS dim FROM assigned
    ),
    newdims AS (
      SELECT cell, dim, round(avg(x), 6) AS c FROM newflat GROUP BY cell, dim
    ),
    newcents AS (
      SELECT cell, list(c ORDER BY dim) AS newcentroid FROM newdims GROUP BY cell
    ),
    members AS (
      SELECT cell, count(*) AS n_members FROM assigned GROUP BY cell
    )
    SELECT m.cell, m.n_members,
           round(list_distance(c.centroid, n.newcentroid), 6) AS centroid_shift
    FROM members m JOIN cents c USING (cell) JOIN newcents n USING (cell)
"""


@query("kmeans_lloyd_step", oracle=KMEANS_ORACLE)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means (X2 index-training kernel):
    seed centroids = per-label means (the IVF coarse quantizer), hard
    argmin assignment, then the centroid UPDATE step — emitting per
    cell its member count and how far the centroid moved (the
    convergence signal a training loop monitors). Iterating this
    operator IS k-means; one audited step keeps the oracle
    declarative (the recursive form is ``near_dup_clusters``-style).

    Scale — the canonical distributed k-means shape: centroids are
    KB-sized and broadcast; assignment is a pure projection (argmin
    ``aggregate`` over the broadcast array — no shuffle of the corpus,
    see ``argmin_cell``); the update is a (cell, dim)-keyed partial
    aggregate that collapses map-side exactly like word-count. Both
    lanes round centroids to 6 dp before distances so assignment
    can't flip on last-ulp mean differences between engines.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))

    dims = (
        v.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy(F.col("label").alias("cell"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cents = dims.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc")
    ).select("cell", F.col("dc.c").alias("centroid"))
    cents_row = cents.agg(
        F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias("cents")
    )

    assigned = v.crossJoin(F.broadcast(cents_row)).select(
        "vec_id",
        "v",
        argmin_cell(F.col("v"), F.col("cents"), cents.schema["cell"].dataType).alias(
            "cell"
        ),
    )
    assigned = scoped_persist(assigned)  # feeds the update agg + member census

    newdims = (
        assigned.select("cell", F.posexplode("v").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    newcents = newdims.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc")
    ).select("cell", F.col("dc.c").alias("newcentroid"))
    members = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))

    shift = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("centroid"), F.col("newcentroid"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda s, z: s + z,
        )
    )
    # |cells| rows per side — broadcast joins, nothing shuffles.
    return (
        members.join(F.broadcast(cents), "cell")
        .join(F.broadcast(newcents), "cell")
        .select("cell", "n_members", F.round(shift, 6).alias("centroid_shift"))
    )


KNN_GRAPH_K = 3

KNN_GRAPH_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id, a.bucket,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, nbr_id, rank, cos_sim FROM scored WHERE rank <= {KNN_GRAPH_K}
"""


@query("knn_graph_bucketed", oracle=KNN_GRAPH_ORACLE)
def knn_graph_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed k-NN graph construction (X2): every vector's top-k
    cosine neighbors WITHIN its SRP-LSH bucket — the all-nodes
    companion to the single-query ANN entries, and the build step for
    graph-based near-dup clustering and HNSW-style index seeding.

    Scale: the self-join keys on the bucket id — SRP buckets are
    near-uniform by construction (random hyperplanes), so the
    quadratic pair work is N·(N/2^planes) ≈ N·TARGET_BUCKET_ROWS
    spread evenly (plane count is corpus-derived), never
    all-pairs; plane count is the dial that keeps per-bucket size
    bounded as N grows. The per-node rank window partitions on
    (vec_id) over only that node's bucket candidates; if buckets ever
    get hot the two-stage heap of ``ann_batch_topk`` is the drop-in
    refinement. Identical hyperplane literals in both lanes keep even
    this approximate structure exactly oracle-checked.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("bucket", _bucket_expr_spark("v", corpus_planes(spark, sf_dir)))
        # Norm once per vector BEFORE the self-join: the pair stage
        # then runs cosine_n (1 dot/pair instead of 3) — bit-exact.
        .withColumn("nrm", norm(F.col("v")))
    )
    # Explicit-width bucket partitioning on BOTH join sides: the pair
    # cosine work is compute-dense but byte-light, so AQE's size-based
    # coalescing would collapse the join to one task; a user-specified
    # partition count is exempt from coalescing and the bucket join
    # reuses the partitioning with no extra exchange. The width derives
    # from the INPUT VOLUME (sizing.data_width), not the CPU count — a
    # core-count pin over-partitions KB-scale fixtures and
    # under-partitions a real corpus.
    par = data_width(spark, sf_dir, "embeddings")
    a = v.select(
        F.col("vec_id"), F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket"
    ).repartition(par, "bucket")
    b = v.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket",
    ).repartition(par, "bucket")
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), "nbr_id")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .withColumn(
            "_cos", cosine_n(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
        )
        .select("vec_id", "nbr_id", "bucket", "_cos")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= KNN_GRAPH_K)
        .select("vec_id", "nbr_id", "rank", F.round("_cos", 4).alias("cos_sim"))
    )


PR_DAMPING = 0.85

PAGERANK_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    edges AS (SELECT vec_id, nbr_id FROM scored WHERE rank <= {KNN_GRAPH_K}),
    od AS (SELECT vec_id, count(*) AS od FROM edges GROUP BY vec_id),
    contrib AS (
      SELECT e.nbr_id AS v,
             CAST(sum(6 // o.od) AS BIGINT) AS s,
             count(*) AS in_deg
      FROM edges e JOIN od o ON e.vec_id = o.vec_id
      GROUP BY e.nbr_id
    )
    SELECT emb.vec_id,
           coalesce(c.in_deg, 0) AS in_deg,
           round({1 - PR_DAMPING} + {PR_DAMPING} * coalesce(c.s, 0) / 6.0, 6)
             AS rank_score
    FROM embeddings emb LEFT JOIN contrib c ON emb.vec_id = c.v
"""


@query("graph_pagerank_step", oracle=PAGERANK_ORACLE)
def graph_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank power-iteration over the bucketed k-NN graph (X2
    companion): from uniform init, each node's next score is
    (1-d) + d·Σ_in 1/outdeg(u) (scores normalized ×N so the uniform
    start is 1). The per-iteration kernel of centrality-based corpus
    curation (rank-weighted sampling, hub detection in near-dup
    graphs); iterating is re-running this plan on the previous scores.

    Determinism by construction: out-degrees are ≤ KNN_GRAPH_K = 3, so
    each in-edge contributes the INTEGER 6/outdeg ∈ {6, 3, 2} — the sum
    is exact integer arithmetic in both lanes and only ONE float
    division happens per row, after aggregation. No float-sum ordering
    sensitivity anywhere.

    Scale: edges = N·k rows; out-degree and contribution are key-local
    hash aggregates (map-side combined); the outdeg join keys on the
    edge source (unhinted — AQE broadcasts while N fits); the final
    left join keys on vec_id. No window over the corpus, no driver
    loop inside the step.
    """
    # Persisted AFTER the nested registered call (registry ordering
    # constraint): `edges` feeds both the out-degree aggregate and the
    # contribution join — without the cache the whole bucketed
    # self-join + rank window would execute once per reference.
    edges = scoped_persist(
        knn_graph_bucketed(spark, sf_dir).select("vec_id", "nbr_id")
    )
    od = edges.groupBy("vec_id").agg(F.count("*").alias("od"))
    contrib = (
        edges.join(od, "vec_id")
        .groupBy(F.col("nbr_id").alias("v"))
        .agg(
            F.sum(F.expr("6 DIV od")).cast("long").alias("s"),
            F.count("*").alias("in_deg"),
        )
    )
    nodes = load_table(spark, sf_dir, "embeddings").select("vec_id")
    joined = nodes.join(contrib, nodes.vec_id == contrib.v, "left")
    return joined.select(
        "vec_id",
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        F.round(
            F.lit(1 - PR_DAMPING)
            + F.lit(PR_DAMPING) * F.coalesce("s", F.lit(0)) / F.lit(6.0),
            6,
        ).alias("rank_score"),
    )


# Deterministic literal model: 64 rational weights + bias — the same
# numbers appear verbatim in both lanes.
ML_WEIGHTS = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
ML_BIAS = 0.1
ML_TOP = 50

_W_SQL = "[" + ", ".join(str(w) for w in ML_WEIGHTS) + "]"

ML_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, label,
             1 / (1 + exp(-(list_dot_product(v, {_W_SQL}) + {ML_BIAS}))) AS p
      FROM v
    )
    SELECT vec_id, label, round(p, 4) AS score
    FROM s
    ORDER BY p DESC, vec_id
    LIMIT {ML_TOP}
"""


@query("ml_inference_scores", oracle=ML_ORACLE)
def ml_inference_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL ML inference (operator fusion — scoring a trained
    model as relational expressions, per the public ICDE'25 line of
    work on in-SQL inference pipelines): logistic regression over the
    embedding column with literal weights, fused into the scan
    projection — no UDF, no model server, no Python. This is how a
    trained quality/toxicity classifier scores a 100 TB corpus: the
    model ships as literals in the plan, scoring is embarrassingly
    parallel, and the top-k heap returns the review queue.

    Determinism: identical weight literals in both lanes; the dot
    product is a sequential fold; ranking uses the raw score with a
    vec_id tiebreak and only the 4-decimal rounding crosses engines.

    Scale: projection + TakeOrderedAndProject — zero shuffles.
    """
    e = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(x) for x in ML_WEIGHTS])
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(dot(F.col("v"), w) + F.lit(ML_BIAS))))
    scored = v.select("vec_id", "label", p.alias("_p"))
    return (
        scored.orderBy(F.col("_p").desc(), "vec_id")
        .limit(ML_TOP)
        .select("vec_id", "label", F.round("_p", 4).alias("score"))
    )


# 3-iteration PageRank kept INTEGER-EXACT by scaling: with damping
# d = 17/20 and outdeg ∈ {1,2,3}, define R_i = rank_i · 120^i; then
# R_{i+1} = 18·120^i + Σ_in R_i(u)·(102/outdeg(u)) where 102/outdeg
# ∈ {102, 51, 34} — every term integer, one float division at the end.
PR3_SCALE = 120**3  # 1,728,000

PR3_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    edges AS (SELECT vec_id AS src, nbr_id AS dst FROM scored WHERE rank <= {KNN_GRAPH_K}),
    ew AS (
      SELECT e.src, e.dst, 102 // o.od AS c
      FROM edges e JOIN (SELECT src, count(*) AS od FROM edges GROUP BY src) o
        ON e.src = o.src
    ),
    nodes AS (SELECT vec_id FROM embeddings),
    pr1 AS (
      SELECT n.vec_id, 18 + coalesce(s.w, 0) AS r
      FROM nodes n LEFT JOIN (
        SELECT dst, CAST(sum(c) AS BIGINT) AS w FROM ew GROUP BY dst
      ) s ON n.vec_id = s.dst
    ),
    pr2 AS (
      SELECT n.vec_id, 18 * 120 + coalesce(s.w, 0) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst, CAST(sum(p.r * e.c) AS BIGINT) AS w
        FROM ew e JOIN pr1 p ON e.src = p.vec_id GROUP BY e.dst
      ) s ON n.vec_id = s.dst
    ),
    pr3 AS (
      SELECT n.vec_id, 18 * 14400 + coalesce(s.w, 0) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst, CAST(sum(p.r * e.c) AS BIGINT) AS w
        FROM ew e JOIN pr2 p ON e.src = p.vec_id GROUP BY e.dst
      ) s ON n.vec_id = s.dst
    )
    SELECT vec_id, round(r / {PR3_SCALE}.0, 6) AS rank3
    FROM pr3
"""


@query("graph_pagerank_3iter", oracle=PR3_ORACLE)
def graph_pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank power iterations over the k-NN graph, INTEGER-
    EXACT end to end (companion to the single-step kernel): ranks are
    carried scaled by 120^i so damping 17/20 and the 1/outdeg splits
    stay integral — both lanes sum only integers across all three
    rounds and divide once at the end. This removes float-ordering
    sensitivity from a genuinely iterative distributed algorithm, the
    same trick fixed-point/decimal accounting systems use.

    Scale: per iteration one key join (edge source → ranks) + one
    hash aggregate on the target — the textbook distributed PageRank
    round; the weighted edge table builds once and is reused by all
    three rounds (persisted; at cluster scale it would be the
    partitioning-preserved input). Rank magnitudes stay < 2^40 for
    any graph with in-degree < 10^4, far inside long range.
    """
    edges = knn_graph_bucketed(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst")
    )
    od = edges.groupBy("src").agg(F.count("*").alias("od"))
    ew = scoped_persist(
        edges.join(od, "src").select("src", "dst", F.expr("102 DIV od").alias("c"))
    )
    nodes = load_table(spark, sf_dir, "embeddings").select("vec_id")

    def iterate(prev: DataFrame | None, base: int) -> DataFrame:
        if prev is None:  # R_0 = 1 for every node: weight = c itself
            contrib = ew.groupBy("dst").agg(F.sum("c").cast("long").alias("w"))
        else:
            contrib = (
                ew.join(prev, ew.src == prev.vec_id)
                .groupBy("dst")
                .agg(F.sum(F.col("r") * F.col("c")).cast("long").alias("w"))
            )
        return nodes.join(contrib, nodes.vec_id == contrib.dst, "left").select(
            "vec_id",
            (F.lit(base) + F.coalesce("w", F.lit(0))).cast("long").alias("r"),
        )

    pr1 = iterate(None, 18)
    pr2 = iterate(pr1, 18 * 120)
    pr3 = iterate(pr2, 18 * 14400)
    return pr3.select(
        "vec_id", F.round(F.col("r") / F.lit(float(PR3_SCALE)), 6).alias("rank3")
    )


TRIANGLE_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    und AS (
      SELECT DISTINCT least(vec_id, nbr_id) AS a, greatest(vec_id, nbr_id) AS c
      FROM scored WHERE rank <= {KNN_GRAPH_K}
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT c AS node FROM und
      ) GROUP BY node
    ),
    wedges AS (
      SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM und e1
      JOIN und e2 ON e1.c = e2.a
      JOIN und e3 ON e3.a = e1.a AND e3.c = e2.c
    )
    SELECT (SELECT count(*) FROM und)      AS n_edges,
           (SELECT n_wedges FROM wedges)   AS n_wedges,
           (SELECT n_triangles FROM tri)   AS n_triangles,
           round(3.0 * (SELECT n_triangles FROM tri)
                 / nullif((SELECT n_wedges FROM wedges), 0), 6) AS clustering_coeff
"""


@query("graph_triangle_count", oracle=TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the k-NN
    graph (the third classic distributed graph kernel after CC and
    PageRank): triangles reveal how clique-y near-neighbor structure
    is — high coefficient means dense near-dup communities, a
    pre-clustering signal for dedup policy.

    Ordered-edge formulation (public standard): undirect + dedup to
    a < c edges once, then each triangle is counted exactly once by
    joining e1=(a,b), e2=(b,c) and closing with e3=(a,c) — never the
    6-fold over-count of the naive join, and the join fan-out is
    bounded by per-node degree (≤ 2·KNN_GRAPH_K here). Wedges come
    from a degree aggregate: Σ d(d-1)/2, all integer; ONE float
    division produces the coefficient.

    Scale: two key joins over an N·k edge table + integer aggregates —
    at 100 TB the standard refinement is degree-ordered orientation
    (high-degree nodes get fewer out-edges), same plan shape.
    """
    edges = scoped_persist(
        knn_graph_bucketed(spark, sf_dir)
        .select(
            F.least("vec_id", "nbr_id").alias("a"),
            F.greatest("vec_id", "nbr_id").alias("c"),
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges")
    )
    e1 = edges.select(F.col("a"), F.col("c").alias("b"))
    e2 = edges.select(F.col("a").alias("b"), F.col("c"))
    closing = edges.select(F.col("a"), F.col("c"))
    tri = (
        e1.join(e2, "b")
        .join(closing, ["a", "c"], "left_semi")
        .agg(F.count("*").alias("n_triangles"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (
        n_edges.crossJoin(wedges)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.nullif("n_wedges", F.lit(0)),
                6,
            ).alias("clustering_coeff"),
        )
    )


_IVF_RECALL_ORACLE = f"""
    WITH ivf AS ({IVF_ORACLE}),
    v2 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q2 AS (SELECT v AS qv FROM v2 WHERE vec_id = {QUERY_VEC_ID}),
    exact AS (
      SELECT v2.vec_id
      FROM v2 CROSS JOIN q2
      WHERE v2.vec_id <> {QUERY_VEC_ID}
      ORDER BY list_cosine_similarity(v2.v, q2.qv) DESC, v2.vec_id
      LIMIT {TOP_K}
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM ivf) AS BIGINT)   AS n_ivf,
           CAST((SELECT count(*) FROM ivf JOIN exact USING (vec_id)) AS BIGINT)
                                                        AS n_matched,
           round(CAST((SELECT count(*) FROM ivf JOIN exact USING (vec_id)) AS DOUBLE)
                 / nullif((SELECT count(*) FROM exact), 0), 4) AS recall_at_k
"""


@query("ivf_recall_audit", oracle=_IVF_RECALL_ORACLE)
def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the IVF path against the brute-force scan
    (X2 self-check — the ANN-side twin of ``lsh_recall_audit``): how
    many of the exact top-{TOP_K} neighbors the single-probe IVF query
    returns. Recall < 1 here is not a bug — it is the IVF trade
    (neighbors whose nearest cell differs from the query's are
    unreachable at nprobe=1); the audit MEASURES that trade so an
    operator can choose nprobe / |cells| before trusting the index.

    Scale: runs both audited pipelines (their plans are the
    scale-safe ones pinned in test_plan_shapes) and joins two ≤k-row
    id lists — the audit itself adds broadcast-sized work only.
    """
    ivf = ivf_topk(spark, sf_dir).select("vec_id")
    exact = knn_cosine_topk(spark, sf_dir).select("vec_id")
    ivf = scoped_persist(ivf)
    exact = scoped_persist(exact)
    ne = exact.agg(F.count("*").alias("n_exact"))
    ni = ivf.agg(F.count("*").alias("n_ivf"))
    nm = ivf.join(exact, "vec_id", "left_semi").agg(F.count("*").alias("n_matched"))
    return (
        ne.crossJoin(ni)
        .crossJoin(nm)
        .select(
            "n_exact",
            "n_ivf",
            "n_matched",
            F.expr(
                "round(CAST(n_matched AS DOUBLE) / nullif(n_exact, 0), 4)"
            ).alias("recall_at_k"),
        )
    )


# SemDeDup prune threshold — deliberately the same margin-checked
# value as the X1 embedding dedup (min |cos - t| over CELL-blocked
# pairs: 4.3e-3 / 9.7e-3 / 1.2e-4 at sf0.001/0.01/0.1 — orders of
# magnitude above cross-engine double-summation noise).
SEMDEDUP_THRESHOLD = 0.45

_SEMDEDUP_ORACLE = f"""
    WITH flat AS (
      SELECT label, unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    dims AS (SELECT label AS cell, dim, round(avg(x), 6) AS c FROM flat GROUP BY label, dim),
    cents AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM dims GROUP BY cell),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    assigned AS (
      SELECT vec_id, v, min_by(cell, list_distance(v, centroid)) AS cell
      FROM v CROSS JOIN cents GROUP BY vec_id, v
    ),
    pruned AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= {SEMDEDUP_THRESHOLD}
    )
    SELECT s.cell,
           CAST(count(*) AS BIGINT)                                    AS n_vectors,
           CAST(count(*) FILTER (p.vec_id IS NOT NULL) AS BIGINT)      AS n_pruned,
           CAST(count(*) FILTER (p.vec_id IS NULL) AS BIGINT)          AS n_kept
    FROM assigned s LEFT JOIN pruned p ON s.vec_id = p.vec_id
    GROUP BY s.cell
"""


@query("semdedup_prune", oracle=_SEMDEDUP_ORACLE)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic deduplication by
    k-means cell — cluster the embedding space (coarse cells from the
    per-label mean seed, the same quantizer as ``ivf_topk``), compare
    pairs ONLY within a cell, and prune every vector that has a
    lower-id semantic duplicate (cos ≥ {SEMDEDUP_THRESHOLD}) in its
    cell. Census per cell: total / pruned / kept. Unlike
    ``embedding_near_dup`` (which blocks on the given label), the
    blocking key here is LEARNED — which is what makes the method
    work on unlabeled web-scale corpora (the paper prunes ~50% of
    LAION with no quality loss).

    Scale: cell assignment is the broadcast-argmin projection (no
    shuffle); within-cell pair generation is a salted self-join on
    the cell key (n_cells is small by design — the paper uses ~11k
    cells for 5B points — so salting, not AQE, supplies parallelism);
    the prune decision is one semi-join-shaped DISTINCT on the loser
    ids. Keep-lowest-id is the deterministic stand-in for the paper's
    keep-farthest-from-centroid policy, whose float comparison would
    not be engine-stable under the oracle gate (policy choice is
    orthogonal to the dataflow).
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))

    dims = (
        v.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy(F.col("label").alias("cell"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cents = dims.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc")
    ).select("cell", F.col("dc.c").alias("centroid"))
    cents_row = cents.agg(
        F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias("cents")
    )
    assigned = scoped_persist(
        v.crossJoin(F.broadcast(cents_row)).select(
            "vec_id",
            "v",
            argmin_cell(
                F.col("v"), F.col("cents"), cents.schema["cell"].dataType
            ).alias("cell"),
        )
    )

    norm = F.sqrt(dot(F.col("v"), F.col("v")))
    t = assigned.select("cell", "vec_id", "v", norm.alias("norm"))
    a_side = t.select(
        "cell",
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("v_a"),
        F.col("norm").alias("norm_a"),
    )
    b_side = t.select(
        "cell",
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("v_b"),
        F.col("norm").alias("norm_b"),
    )
    from couchwarehouse_spark.operators.skew import salted_join

    pairs = salted_join(
        b_side,
        a_side,
        on="cell",
        n_salts=8,
        partitions=data_width(spark, sf_dir, "embeddings"),
    ).filter(F.col("vec_a") < F.col("vec_b"))
    cos = dot(F.col("v_a"), F.col("v_b")) / (F.col("norm_a") * F.col("norm_b"))
    pruned = (
        pairs.filter(cos >= SEMDEDUP_THRESHOLD).select("vec_b").distinct()
    )
    flagged = assigned.join(
        pruned.withColumnRenamed("vec_b", "vec_id").withColumn(
            "_pruned", F.lit(1)
        ),
        "vec_id",
        "left",
    )
    return flagged.groupBy("cell").agg(
        F.count("*").alias("n_vectors"),
        F.count("_pruned").alias("n_pruned"),
        (F.count("*") - F.count("_pruned")).alias("n_kept"),
    )


LPA_ITERS = 3

_LPA_EDGES_CTE = f"""
    b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {{bucket}} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    kedges AS (SELECT vec_id, nbr_id FROM scored WHERE rank <= {KNN_GRAPH_K}),
    sym AS (
      SELECT vec_id, nbr_id FROM kedges
      UNION
      SELECT nbr_id AS vec_id, vec_id AS nbr_id FROM kedges
    )
"""


def _lpa_iter_sql(i: int) -> str:
    prev = "l0" if i == 1 else f"l{i - 1}"
    return f"""
    c{i} AS (
      SELECT s.vec_id, p.label, count(*) AS n
      FROM sym s JOIN {prev} p ON s.nbr_id = p.vec_id
      GROUP BY s.vec_id, p.label
    ),
    w{i} AS (
      SELECT vec_id, label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY n DESC, label) AS rk
      FROM c{i}
    ),
    l{i} AS (
      SELECT n.vec_id, coalesce(w.label, n.vec_id) AS label
      FROM (SELECT vec_id FROM embeddings) n
      LEFT JOIN (SELECT vec_id, label FROM w{i} WHERE rk = 1) w
        ON n.vec_id = w.vec_id
    )"""


_LPA_ORACLE = (
    "    WITH "
    + _LPA_EDGES_CTE.format(bucket=_bucket_expr_sql_derived("embedding")).strip()
    + ",\n    l0 AS (SELECT vec_id, vec_id AS label FROM embeddings),"
    + ",".join(_lpa_iter_sql(i) for i in range(1, LPA_ITERS + 1))
    + f"""
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(vec_id) AS BIGINT) AS min_member,
           CAST(max(vec_id) AS BIGINT) AS max_member
    FROM l{LPA_ITERS}
    GROUP BY label
    HAVING count(*) > 1
"""
)


@query("graph_label_propagation", oracle=_LPA_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by label propagation (X2 graph family,
    Raghavan et al. 2007): every node starts as its own community;
    each of {LPA_ITERS} synchronous iterations relabels a node to the
    most frequent label among its (symmetrized k-NN) neighbors, ties
    to the smallest label. Output: communities with ≥2 members — the
    corpus's near-duplicate/topic neighborhoods, cheaper than
    connected components when the graph has bridges CC would collapse
    across.

    Determinism by construction: label counts are integers and the
    winner is row_number over (count DESC, label ASC) — the same total
    order in both engines; isolated nodes keep their own label via
    the left join. Scale: per iteration, ONE join of the edge table
    to the current |N|-row label map (both keyed on vec_id — AQE
    broadcasts the label side while it fits, else it's a co-keyed
    shuffle) + one hash agg + one per-node group-limit window
    (WindowGroupLimit: ≤1 candidate row per node survives map-side).
    The edge table persists across iterations, exactly like
    graph_pagerank_3iter; iterations is the dial, each a fixed plan.
    """
    edges = scoped_persist(
        knn_graph_bucketed(spark, sf_dir).select("vec_id", "nbr_id")
    )
    sym = scoped_persist(
        edges.unionByName(
            edges.select(
                F.col("nbr_id").alias("vec_id"), F.col("vec_id").alias("nbr_id")
            )
        ).distinct()
    )
    nodes = load_table(spark, sf_dir, "embeddings").select("vec_id")
    labels = nodes.select("vec_id", F.col("vec_id").alias("label"))

    from pyspark.sql import Window

    for _ in range(LPA_ITERS):
        counts = (
            sym.join(
                labels.select(
                    F.col("vec_id").alias("nbr_id"), F.col("label")
                ),
                "nbr_id",
            )
            .groupBy("vec_id", "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("n").desc(), "label")
        best = (
            counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "label")
        )
        labels = nodes.join(best, "vec_id", "left").select(
            "vec_id", F.coalesce("label", "vec_id").alias("label")
        )

    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count("*").alias("n_members"),
            F.min("vec_id").alias("min_member"),
            F.max("vec_id").alias("max_member"),
        )
        .filter(F.col("n_members") > 1)
    )


LABEL_PURITY_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, a.label AS own, bb.label AS nbr_label,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, bb.v) DESC,
                                         bb.vec_id) AS rank
      FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id
    ),
    per_vec AS (
      SELECT vec_id, any_value(own) AS label,
             CAST(sum(CASE WHEN nbr_label = own THEN 1 ELSE 0 END) AS BIGINT)
               AS matches,
             CAST(count(*) AS BIGINT) AS k_actual
      FROM scored WHERE rank <= {KNN_GRAPH_K}
      GROUP BY vec_id
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(matches) AS DOUBLE) / sum(k_actual), 6) AS avg_purity,
           CAST(sum(CASE WHEN 2 * matches < k_actual THEN 1 ELSE 0 END)
                AS BIGINT) AS n_noisy
    FROM per_vec GROUP BY label
"""


@query("knn_label_purity", oracle=LABEL_PURITY_ORACLE)
def knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit via k-NN purity (X2 × curation): for every
    vector, the fraction of its k nearest neighbors (within its SRP
    bucket — the ``knn_graph_bucketed`` edges) sharing its label,
    aggregated per label. Low purity flags mislabeled or boundary
    examples — the classic dataset-auditing signal (confident-learning
    style) run BEFORE training, here over the same bucketed graph the
    dedup/community operators already build. ``n_noisy`` counts
    vectors whose neighbor majority disagrees (2·matches < k).

    Scale: reuses the bucketed k-NN edge plan (N·bucket-width pair
    work, never all-pairs — see ``knn_graph_bucketed``); the label
    joins are against the (vec_id, label) projection — a slim dim
    Catalyst broadcasts — and the rollup is a 10-group hash aggregate.
    Integer-exact: matches and k are counts; the single division
    happens once per label on exact integer sums.
    """
    edges = knn_graph_bucketed(spark, sf_dir)  # vec_id, nbr_id, rank, cos_sim
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    per_vec = (
        edges.join(lab, "vec_id")
        .join(
            lab.select(
                F.col("vec_id").alias("nbr_id"), F.col("label").alias("nbr_label")
            ),
            "nbr_id",
        )
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.when(F.col("nbr_label") == F.col("label"), 1).otherwise(0)
            ).alias("matches"),
            F.count("*").alias("k_actual"),
        )
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.sum("matches").cast("double") / F.sum("k_actual"), 6
        ).alias("avg_purity"),
        F.sum(
            F.when(2 * F.col("matches") < F.col("k_actual"), 1).otherwise(0)
        ).alias("n_noisy"),
    )


EVAL_QUERY_MOD = 10  # vec_id % 10 == 0 plays the held-out query role
EVAL_TOP_K = 10
_RR_LCM = 2520  # lcm(1..10): 2520/rank is an exact integer for rank<=10

RETRIEVAL_EVAL_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, label AS qlabel, v AS qv
      FROM e WHERE vec_id % {EVAL_QUERY_MOD} = 0
    ),
    s AS (
      SELECT q.qid, q.qlabel, e.label,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                                         e.vec_id) AS rank
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    per_q AS (
      SELECT qid, any_value(qlabel) AS qlabel,
             CAST(coalesce(max(CASE WHEN label = qlabel THEN {_RR_LCM} // rank
                                    END), 0) AS BIGINT) AS rr_scaled,
             CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
               AS hits
      FROM s WHERE rank <= {EVAL_TOP_K}
      GROUP BY qid
    )
    SELECT qlabel AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(rr_scaled) AS DOUBLE)
                 / (count(*) * {_RR_LCM}), 6) AS mrr_at_10,
           round(CAST(sum(hits) AS DOUBLE)
                 / (count(*) * {EVAL_TOP_K}), 6) AS precision_at_10
    FROM per_q GROUP BY qlabel
"""


@query("retrieval_eval_mrr", oracle=RETRIEVAL_EVAL_ORACLE)
def retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation (X2 eval harness): MRR@10 and
    precision@10 of brute-force cosine retrieval, scored per label
    with label-match as the relevance judgment — the embedding-quality
    gate a training-data pipeline runs before trusting an encoder for
    semantic dedup or ANN curation. Every vec_id % {EVAL_QUERY_MOD}
    == 0 is a held-out query; first-relevant rank feeds MRR.

    Scale: the bounded query sample broadcasts (Q ≪ N); scoring is a
    projection over one corpus scan; top-10 selection is the same
    TWO-STAGE heap as ``ann_batch_topk`` (rank within (query,
    input-partition), keep k, re-rank P·k survivors) so no reducer
    sees a query's full score column. The eval reduce is integer
    arithmetic on ≤ Q·k rows: reciprocal ranks are kept exact as
    {_RR_LCM}/rank (lcm(1..10) — always an integer), divided once per
    label at emit.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", norm(F.col("v")))  # 1 dot per (query, doc) pair
    q = v.filter(F.col("vec_id") % EVAL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        v.repartition(data_width(spark, sf_dir, "embeddings"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "_cos", cosine_n(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qn"))
        )
        .withColumn("_pid", F.spark_partition_id())
        .select("qid", "qlabel", "vec_id", "label", "_cos", "_pid")
    )
    w_local = Window.partitionBy("qid", "_pid").orderBy(F.col("_cos").desc(), "vec_id")
    survivors = scored.withColumn("_r", F.row_number().over(w_local)).filter(
        F.col("_r") <= EVAL_TOP_K
    )
    w_final = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    topk = survivors.withColumn("rank", F.row_number().over(w_final)).filter(
        F.col("rank") <= EVAL_TOP_K
    )
    rel_rr = F.when(
        F.col("label") == F.col("qlabel"), F.lit(_RR_LCM) / F.col("rank")
    ).cast("long")
    per_q = topk.groupBy("qid").agg(
        F.first("qlabel").alias("qlabel"),
        F.coalesce(F.max(rel_rr), F.lit(0)).alias("rr_scaled"),
        F.sum(
            F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
        ).alias("hits"),
    )
    return per_q.groupBy(F.col("qlabel").alias("label")).agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.sum("rr_scaled").cast("double") / (F.count("*") * _RR_LCM), 6
        ).alias("mrr_at_10"),
        F.round(
            F.sum("hits").cast("double") / (F.count("*") * EVAL_TOP_K), 6
        ).alias("precision_at_10"),
    )


PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # 64 dims / 4 subspaces

PQ_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    subs AS (
      SELECT vec_id, label, ms.m,
             list_slice(v, ms.m * {PQ_SUBDIM} + 1,
                           ms.m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM v CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) ms
    ),
    flat AS (
      SELECT m, label, unnest(sv) AS x, unnest(range(0, len(sv))) AS dim
      FROM subs
    ),
    dims AS (
      SELECT m, label AS cell, dim, round(avg(x), 6) AS c
      FROM flat GROUP BY m, label, dim
    ),
    cents AS (
      SELECT m, cell, list(c ORDER BY dim) AS centroid
      FROM dims GROUP BY m, cell
    ),
    assigned AS (
      SELECT s.vec_id, s.label, s.m,
             min_by(c.cell, list_distance(s.sv, c.centroid)) AS cell,
             min(list_distance(s.sv, c.centroid)) AS dist
      FROM subs s JOIN cents c ON s.m = c.m
      GROUP BY s.vec_id, s.label, s.m, s.sv
    )
    SELECT m, cell,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(sum(CASE WHEN label = cell THEN 1 ELSE 0 END) AS BIGINT)
             AS n_label_match,
           round(avg(dist), 6) AS avg_dist
    FROM assigned GROUP BY m, cell
"""


@query("pq_quantization_audit", oracle=PQ_ORACLE)
def pq_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization audit (X2 — the PQ/IVFADC compression
    kernel, Jégou et al. 2011): the embedding splits into {PQ_M}
    {PQ_SUBDIM}-dim subvectors; each subspace gets a 10-cell codebook
    (per-label subvector means — the same deterministic seeding as
    ``kmeans_lloyd_step``/``ivf_topk``); every subvector is assigned
    to its nearest code. The audit emits, per (subspace, cell),
    occupancy, how often the code agrees with the vector's own label,
    and mean assignment distance — the numbers that size a PQ index's
    distortion before it replaces raw vectors at 100 TB.

    Scale: codebooks are (M·cells·subdim) floats — KB-sized,
    broadcast; subvector explosion is a projection (M rows per
    vector, each {PQ_SUBDIM} floats — SMALLER than the input row);
    assignment is the ``argmin_cell`` fold, a pure projection, so the
    corpus never shuffles; the audit reduce is an (m, cell) hash
    aggregate with map-side combine. Centroids round to 6 dp in both
    lanes before distances so assignment can't flip on last-ulp mean
    differences (the ``kmeans_lloyd_step`` rule).
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    subs = v.select(
        "vec_id",
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("v", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "label", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    subs = scoped_persist(subs)  # feeds codebook build AND assignment

    dims = (
        subs.select("m", "label", F.posexplode("sv").alias("dim", "x"))
        .groupBy("m", F.col("label").alias("cell"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cents = (
        dims.groupBy("m", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("m", "cell", F.col("dc.c").alias("centroid"))
    )
    books = cents.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias("cents")
    )

    # Fold argmin over the broadcast per-subspace codebook, keeping
    # BOTH the winning cell and its (squared) distance; strict < keeps
    # the lowest cell on exact ties, matching the oracle's min_by over
    # the same rounded centroids.
    init = F.struct(
        F.lit(None).cast("int").alias("cell"),
        F.lit(float("inf")).alias("d"),
    )

    def step(acc, c):
        d2 = F.aggregate(
            F.zip_with(F.col("sv"), c["centroid"], lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, z: s + z,
        )
        return F.when(
            d2 < acc["d"], F.struct(c["cell"].alias("cell"), d2.alias("d"))
        ).otherwise(acc)

    assigned = subs.join(F.broadcast(books), "m").select(
        "m",
        "label",
        F.aggregate(F.col("cents"), init, step).alias("best"),
    )
    return (
        assigned.groupBy("m", F.col("best.cell").alias("cell"))
        .agg(
            F.count("*").alias("n_assigned"),
            F.sum(
                F.when(F.col("label") == F.col("best.cell"), 1).otherwise(0)
            ).alias("n_label_match"),
            F.round(F.avg(F.sqrt(F.col("best.d"))), 6).alias("avg_dist"),
        )
    )


CONTRASTIVE_COS_MIN = 0.35  # candidate-pair floor; margin-checked: nearest
# within-bucket cosine sits ≥3.6e-5 away at sf0.01 AND sf0.1, so the float
# threshold cannot flip between engines (the COSINE_DUP_THRESHOLD discipline)

CONTRASTIVE_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT least(a.label, bb.label)    AS label_a,
             greatest(a.label, bb.label) AS label_b,
             list_cosine_similarity(a.v, bb.v) AS cos
      FROM b a JOIN b bb
        ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
      WHERE list_cosine_similarity(a.v, bb.v) >= {CONTRASTIVE_COS_MIN}
    )
    SELECT label_a, label_b,
           (label_a = label_b)                  AS is_positive,
           CAST(count(*) AS BIGINT)             AS n_pairs,
           round(avg(cos), 6)                   AS avg_cos,
           round(max(cos), 6)                   AS max_cos
    FROM pairs GROUP BY label_a, label_b
"""


@query("contrastive_pair_mining", oracle=CONTRASTIVE_ORACLE)
def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair census (X2 — the mining step under
    SimCSE/CLIP-style embedding training): within-bucket vector pairs
    above cosine {CONTRASTIVE_COS_MIN}, grouped by (label, label).
    Diagonal rows (is_positive) size the positive-pair pool per
    class; off-diagonal rows are the HARD negatives — high-similarity
    cross-label pairs, exactly the examples a contrastive loss needs
    and random negative sampling misses. ``max_cos`` off-diagonal
    flags label pairs so confusable they deserve a curation look
    (cf. ``knn_label_purity``).

    Scale: pair generation is the SRP-bucket self-join (N·bucket-width
    work, plane count corpus-derived — never all-pairs; the
    ``knn_graph_bucketed`` geometry), the cosine floor prunes pairs
    before the shuffle, and the census is a ≤|labels|² hash aggregate
    with map-side combine.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = (
        e.select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("bucket", _bucket_expr_spark("v", corpus_planes(spark, sf_dir)))
        .withColumn("nrm", norm(F.col("v")))  # 1 dot/pair via cosine_n
    )
    par = data_width(spark, sf_dir, "embeddings")
    a = v.select(
        "vec_id", "label", F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket"
    ).repartition(par, "bucket")
    b = v.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket",
    ).repartition(par, "bucket")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("vec_id") < F.col("nbr_id"))
        .withColumn(
            "_cos", cosine_n(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
        )
        .filter(F.col("_cos") >= CONTRASTIVE_COS_MIN)
        .select(
            F.least("label", "nbr_label").alias("label_a"),
            F.greatest("label", "nbr_label").alias("label_b"),
            "_cos",
        )
    )
    return (
        pairs.groupBy("label_a", "label_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("_cos"), 6).alias("avg_cos"),
            F.round(F.max("_cos"), 6).alias("max_cos"),
        )
        .select(
            "label_a",
            "label_b",
            (F.col("label_a") == F.col("label_b")).alias("is_positive"),
            "n_pairs",
            "avg_cos",
            "max_cos",
        )
    )


GRAM_SCALE = 1000  # fixed-point quantization for integer-exact Gram sums
GRAM_TOP_K = 20


@query(
    "embedding_gram_matrix",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id,
             unnest(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {GRAM_SCALE}) AS BIGINT))) AS q,
             generate_subscripts(embedding, 1) - 1 AS i
      FROM embeddings
    )
    SELECT a.i AS dim_i, b.i AS dim_j, CAST(sum(a.q * b.q) AS BIGINT) AS gram,
           count(*) AS n_rows
    FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND b.i > a.i
    GROUP BY a.i, b.i
    ORDER BY abs(sum(a.q * b.q)) DESC, dim_i, dim_j
    LIMIT {GRAM_TOP_K}
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram-matrix step (X2 — the X'X kernel under PCA /
    whitening / covariance estimation over an embedding corpus): the
    top-GRAM_TOP_K strongest off-diagonal second-moment entries
    G[i,j] = Σ_rows x_i·x_j. Strong off-diagonals mean correlated
    dimensions — wasted capacity an index (OPQ rotation, PCA
    truncation) should remove; near-diagonal Gram means the space is
    already decorrelated. INTEGER-EXACT: components are fixed-point
    quantized (floor(x·1000) — floor, not round: round-half placement
    differs across engines) so the sums are exact longs and the
    oracle hash cannot drift on float association order.

    Scale: this is the map-reduce Gram construction — each row emits
    its upper-triangle products and a (i,j)-keyed hash aggregate with
    MAP-SIDE PARTIAL COMBINE collapses them; the shuffle carries at
    most d²/2 = 2016 running sums PER MAP PARTITION regardless of
    row count (the classic reason Gram/covariance scales linearly in
    N on a cluster). The double explode is JVM-side (posexplode);
    nothing all-pairs, nothing driver-side.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * GRAM_SCALE).cast("long"),
    )
    v = e.repartition(data_width(spark, sf_dir, "embeddings")).select(
        "vec_id", q.alias("q")
    )
    a = v.select("vec_id", "q", F.posexplode("q").alias("i", "qi"))
    b = a.select("i", "qi", F.posexplode("q").alias("j", "qj")).filter(
        F.col("j") > F.col("i")
    )
    return (
        b.groupBy(
            F.col("i").cast("long").alias("dim_i"),
            F.col("j").cast("long").alias("dim_j"),
        )
        .agg(
            F.sum(F.col("qi") * F.col("qj")).alias("gram"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(F.abs(F.col("gram")).desc(), "dim_i", "dim_j")
        .limit(GRAM_TOP_K)
    )


# Johnson-Lindenstrauss sign-projection audit. RP_K Rademacher (±1)
# sign rows, generated by the same seedless LCG mix as _hyperplanes so
# both lanes inline identical literals.
RP_K = 8


def _rp_signs(dim: int = 64, k: int = RP_K) -> list[list[float]]:
    rows = []
    for j in range(k):
        row = []
        for d in range(dim):
            x = (1103515245 * (j * 64 + d + 999331) + 12345) % 2147483647
            row.append(1.0 if x % 2 == 0 else -1.0)
        rows.append(row)
    return rows


_RP_ROWS = _rp_signs()
_RP_PROJ_SQL = ", ".join(
    "list_dot_product(v, ["
    + ", ".join(repr(w) for w in row)
    + f"]) AS p{j}"
    for j, row in enumerate(_RP_ROWS)
)
_RP_NORM_SQL = " + ".join(f"p{j} * p{j}" for j in range(RP_K))


@query(
    "random_projection_audit",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    proj AS (
      SELECT vec_id, label,
             list_dot_product(v, v) AS norm_sq,
             {_RP_PROJ_SQL}
      FROM v
    )
    SELECT vec_id, label,
           round(norm_sq, 4) AS norm_sq,
           round(({_RP_NORM_SQL}) / ({RP_K} * norm_sq), 4) AS jl_distortion
    FROM proj
    ORDER BY vec_id
    LIMIT 20
    """,
)
def random_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random-projection distortion audit (X2):
    project each embedding onto RP_K fixed Rademacher (±1) sign
    vectors (Achlioptas 2003, "Database-friendly random projections")
    and report ‖Px‖²/(k·‖x‖²) — the per-vector norm-distortion ratio
    the JL lemma bounds near 1. This is the go/no-go check before
    swapping full-dimension distances for projected ones in a
    blocking/ANN stage: heavy-tailed distortion → raise k.

    Both lanes inline the SAME literal sign matrix (seedless LCG mix,
    the ``_hyperplanes`` idiom); all arithmetic is in-row fold-order
    dot products — no shuffle at all until the top-20-by-id heap
    (TakeOrderedAndProject). At 100 TB this is a pure projection
    pass; the ±1 signs make each of the k projections an add/subtract
    sweep, the cheapest possible matvec.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    ve = e.select("vec_id", "label", v.alias("v"))
    projs = [
        dot(F.col("v"), F.array(*[F.lit(w) for w in row])).alias(f"p{j}")
        for j, row in enumerate(_RP_ROWS)
    ]
    proj = ve.select(
        "vec_id", "label", dot(F.col("v"), F.col("v")).alias("norm_sq"), *projs
    )
    pn = sum((F.col(f"p{j}") * F.col(f"p{j}") for j in range(RP_K)), F.lit(0.0))
    return (
        proj.select(
            "vec_id",
            "label",
            F.round("norm_sq", 4).alias("norm_sq"),
            F.round(pn / (RP_K * F.col("norm_sq")), 4).alias("jl_distortion"),
        )
        .orderBy("vec_id")
        .limit(20)
    )


PCA_SCALE = 1000  # fixed-point quantization (the embedding_gram_matrix idiom)
PCA_TOP_DIMS = 10


@query(
    "pca_power_iteration",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {PCA_SCALE}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    srow AS (
      SELECT vec_id, qv, CAST(list_sum(qv) AS BIGINT) AS s FROM q
    ),
    flat AS (
      SELECT vec_id, s, unnest(qv) AS qe,
             generate_subscripts(qv, 1) - 1 AS i
      FROM srow
    ),
    v1 AS (
      SELECT i AS dim_i, CAST(sum(qe * s) AS BIGINT) AS v1
      FROM flat GROUP BY i
    ),
    ray AS (SELECT CAST(sum(s * s) AS BIGINT) AS rayleigh_num FROM srow)
    SELECT dim_i, v1, rayleigh_num
    FROM v1 CROSS JOIN ray
    ORDER BY abs(v1) DESC, dim_i
    LIMIT {PCA_TOP_DIMS}
    """,
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed power-iteration step toward the top principal
    component (X2): v₁ = Gv₀ with v₀ = 1 and G = XᵀX the (uncentered)
    Gram matrix — evaluated WITHOUT materializing G, via the identity
    Gv₀ = Σ_rows x·(xᵀ1): each row contributes its quantized vector
    scaled by its own coordinate sum. Also reports the Rayleigh
    numerator v₀ᵀGv₀ = Σ s² (the iteration's convergence statistic).
    Power iteration is textbook numerical linear algebra (Mises &
    Pollaczek-Geiringer 1929); this is the PCA/whitening training
    kernel that pairs with ``embedding_gram_matrix``.

    Exactness: coordinates quantize to integers (floor(x·{PCA_SCALE}),
    the Gram idiom); the row sum s is an in-row integer fold; every
    aggregate is an integer SUM — bit-exact on both engines.

    Scale: one scan; the per-dim reduce carries d=64 groups with
    map-side partials (each executor emits ≤64 longs), the Rayleigh
    reduce one long — the whole matvec is a word-count-shaped
    aggregate, the reason power iteration (and its production cousin,
    randomized SVD) distributes trivially where full eigendecomposition
    does not. Top dims by |v₁| are per-partition heaps.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * PCA_SCALE).cast("long")
    )
    srow = e.select(
        qv.alias("qv"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias("s"),
    )
    srow = scoped_persist(srow)
    flat = srow.select("s", F.posexplode("qv").alias("i", "qe"))
    v1 = flat.groupBy(F.col("i").alias("dim_i")).agg(
        F.sum(F.col("qe") * F.col("s")).alias("v1")
    )
    ray = srow.agg(F.sum(F.col("s") * F.col("s")).alias("rayleigh_num"))
    return (
        v1.crossJoin(F.broadcast(ray))
        .orderBy(F.abs("v1").desc(), "dim_i")
        .limit(PCA_TOP_DIMS)
    )


CONF_THRESHOLD = 0.5  # decision threshold for the confusion table


@query(
    "binary_classifier_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id,
             label % 2 = 0 AS y_true,
             1.0 / (1.0 + exp(-(list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               {_W_SQL}) + {ML_BIAS}))) >= {CONF_THRESHOLD} AS y_pred
      FROM embeddings
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN y_true AND y_pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN NOT y_true AND y_pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN y_true AND NOT y_pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN NOT y_true AND NOT y_pred THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6)        AS precision,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6)        AS recall,
           round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
    FROM cells
    """,
)
def binary_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix eval of the in-SQL logistic classifier
    (X2 eval tier): the fused-projection scores of
    ``ml_inference_scores`` thresholded at {CONF_THRESHOLD} against a
    deterministic ground truth (even label = positive), reduced to the
    TP/FP/FN/TN cells plus precision / recall / F1 / accuracy — the
    table every quality-filter model review starts from (companion of
    ``score_calibration_bins``: that one asks "are the probabilities
    honest", this one "is the decision rule any good").

    All four cells are exact integer sums (the threshold compare runs
    on identical doubles in both engines); every metric is ONE
    division of those integers, rounded once.

    Scale: scoring fuses into the scan projection (the
    ml_inference_scores argument); the reduce is a single
    partial-aggregated global sum — four longs per partition cross
    the exchange. Zero joins, zero windows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(x) for x in ML_WEIGHTS])
    v = F.transform("embedding", lambda x: x.cast("double"))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(dot(v, w) + F.lit(ML_BIAS))))
    scored = e.select(
        (F.col("label") % 2 == 0).alias("y_true"),
        (p >= CONF_THRESHOLD).alias("y_pred"),
    )
    cells = scored.agg(
        F.sum((F.col("y_true") & F.col("y_pred")).cast("long")).alias("tp"),
        F.sum((~F.col("y_true") & F.col("y_pred")).cast("long")).alias("fp"),
        F.sum((F.col("y_true") & ~F.col("y_pred")).cast("long")).alias("fn"),
        F.sum((~F.col("y_true") & ~F.col("y_pred")).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cells.select(
        "tp", "fp", "fn", "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall"),
        F.round((2 * tp).cast("double") / (2 * tp + fp + fn), 6).alias("f1"),
        F.round((tp + tn).cast("double") / (tp + fp + fn + tn), 6).alias("accuracy"),
    )


N_SHARDS = 8  # target index shards for the balance plan


@query(
    "ann_shard_balance_plan",
    oracle=f"""
    WITH b AS (
      SELECT {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    cells AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bucket
    ),
    ranked AS (
      SELECT bucket, n,
             CAST((row_number() OVER (ORDER BY n DESC, bucket) - 1)
                  % {N_SHARDS} AS BIGINT) AS shard
      FROM cells
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM ranked)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_vectors,
           round(CAST(sum(n) AS DOUBLE) * {N_SHARDS} / tot.t, 6)
             AS load_vs_ideal
    FROM ranked CROSS JOIN tot
    GROUP BY shard, tot.t
    ORDER BY shard
    """,
)
def ann_shard_balance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-shard layout plan for the SRP-LSH bucketed ANN index:
    bucket census → size-ranked round-robin assignment onto
    {N_SHARDS} shards → per-shard load vs the ideal equal split. This
    is the placement question every distributed vector index answers
    before serving (route hot cells apart, keep shard fan-in flat);
    round-robin over the size-sorted cells is the deterministic,
    windowable proxy for LPT packing, and load_vs_ideal ≈ 1.0
    everywhere is the 'safe to ship' signal.

    Exactness: buckets from the shared derived-plane literals (the
    ann_lsh_topk seam — identical in both lanes); ranks, shards and
    counts all integers; one division, rounded once.

    Scale: the bucket census is the word-count shape; the rank window
    runs over the CELL table (2^planes rows ≈ N/1024, never the
    corpus); the total attaches as a one-row broadcast.
    """
    e = load_table(spark, sf_dir, "embeddings")
    planes = corpus_planes(spark, sf_dir)
    cells = (
        e.select(_bucket_expr_spark("embedding", planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "bucket")
    ranked = cells.select(
        "n",
        ((F.row_number().over(w) - 1) % N_SHARDS).cast("long").alias("shard"),
    )
    tot = ranked.agg(F.sum("n").alias("t"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("shard", "t")
        .agg(F.count("*").alias("n_buckets"), F.sum("n").alias("n_vectors"))
        .select(
            "shard",
            "n_buckets",
            "n_vectors",
            F.round(
                F.col("n_vectors").cast("double") * N_SHARDS / F.col("t"), 6
            ).alias("load_vs_ideal"),
        )
        .orderBy("shard")
    )


DIM_TOP = 10  # most-variant dimensions reported


@query(
    "embedding_dim_stats_audit",
    oracle=f"""
    WITH flat AS (
      SELECT unnest(range(0, len(embedding))) AS dim,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      FROM embeddings
    ),
    per AS (
      SELECT dim,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(round(x * 1000000) AS BIGINT)
                    * CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS sxx
      FROM flat GROUP BY dim
    )
    SELECT dim,
           round(CAST(sx AS DOUBLE) / n / 1000000, 6) AS mean_val,
           round((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / (CAST(n AS DOUBLE) * n) / 1e12, 6) AS pop_variance
    FROM per
    ORDER BY pop_variance DESC, dim
    LIMIT {DIM_TOP}
    """,
)
def embedding_dim_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding statistics, top-{DIM_TOP} by variance —
    the embedding-health audit that catches dead dimensions (variance
    ≈ 0: wasted capacity), runaway dimensions (variance ≫ others:
    they dominate every dot product), and mean offsets (uncentered
    spaces break cosine assumptions) — the per-axis complement of
    embedding_norm_audit (per-vector) and the diagnostic read before
    the whitening the Gram/PCA entries implement.

    Exactness: values quantize to integer MICRO units once; per-dim
    moments are integer sums and the population variance is the
    cross-multiplied form (n·Σx²−(Σx)²)/n² — one division pair,
    rounded once (the moment_stats discipline in fixed point).

    Scale: posexplode fans each vector into (dim, value) rows — d×N,
    map-side partial-aggregated down to d rows before the exchange;
    the top-k head is a bounded sort over d rows. At 100 TB do the
    same with per-partition Σ/Σ² accumulated via fold — same shape,
    no explode; kept explicit here for the oracle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "x"
        )
    )
    q = F.round(F.col("x") * 1_000_000).cast("long")
    per = flat.select("dim", q.alias("qx")).groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("qx").alias("sx"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
    )
    return (
        per.select(
            "dim",
            F.round(F.col("sx").cast("double") / F.col("n") / 1_000_000, 6).alias(
                "mean_val"
            ),
            F.round(
                (
                    F.col("n").cast("double") * F.col("sxx")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                / (F.col("n").cast("double") * F.col("n"))
                / 1e12,
                6,
            ).alias("pop_variance"),
        )
        .orderBy(F.col("pop_variance").desc(), "dim")
        .limit(DIM_TOP)
    )


import math as _math

# Integer DCG gain table: round(1e6 / log2(rank+1)) for ranks 1..k —
# TEN literal constants inlined in both lanes (the Benford-share
# idiom), so no engine evaluates a log in the scoring path.
_DCG_GAIN = {
    r: round(1_000_000 / _math.log2(r + 1)) for r in range(1, EVAL_TOP_K + 1)
}
_DCG_CASE = "CASE rank " + " ".join(
    f"WHEN {r} THEN {g}" for r, g in _DCG_GAIN.items()
) + " ELSE 0 END"
_IDCG_PREFIX = {  # ideal DCG for m relevant docs (m = 1..k), scaled
    m: sum(_DCG_GAIN[r] for r in range(1, m + 1))
    for m in range(1, EVAL_TOP_K + 1)
}
_IDCG_CASE = "CASE LEAST(n_rel, " + str(EVAL_TOP_K) + ") " + " ".join(
    f"WHEN {m} THEN {v}" for m, v in _IDCG_PREFIX.items()
) + " ELSE 0 END"


@query(
    "retrieval_eval_ndcg",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    lbl AS (SELECT label, CAST(count(*) AS BIGINT) AS n_members FROM e GROUP BY label),
    q AS (
      SELECT vec_id AS qid, label AS qlabel, v AS qv
      FROM e WHERE vec_id % {EVAL_QUERY_MOD} = 0
    ),
    s AS (
      SELECT q.qid, q.qlabel, e.label,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                                         e.vec_id) AS rank
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    per_q AS (
      SELECT qid, any_value(qlabel) AS qlabel,
             CAST(sum(CASE WHEN label = qlabel THEN {_DCG_CASE} ELSE 0 END)
                  AS BIGINT) AS dcg_scaled
      FROM s WHERE rank <= {EVAL_TOP_K}
      GROUP BY qid
    ),
    scored AS (
      SELECT p.qlabel,
             CAST(round(1000000.0 * p.dcg_scaled / ({_IDCG_CASE}))
                  AS BIGINT) AS ndcg_micro
      FROM (SELECT per_q.*, lbl.n_members - 1 AS n_rel
            FROM per_q JOIN lbl ON per_q.qlabel = lbl.label) p
    )
    SELECT qlabel AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(ndcg_micro) AS DOUBLE) / count(*) / 1000000, 6)
             AS ndcg_at_10
    FROM scored GROUP BY qlabel
    ORDER BY qlabel
    """,
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{EVAL_TOP_K} retrieval eval (Järvelin & Kekäläinen 2002)
    — the graded, position-discounted standard that MRR and
    precision@k summarize away: DCG over the same label-relevance
    ranking as retrieval_eval_mrr, normalized by the IDEAL DCG given
    how many relevant neighbors exist (label size − 1, capped at k).
    The metric leaderboards report for embedding retrieval.

    Exactness: the 1/log2(rank+1) gains are TEN inlined integer
    literals shared by both lanes (no engine computes a log); DCG and
    IDCG are integer sums, each query's nDCG quantizes to integer
    micro units once, and the per-label mean is an integer sum with
    one final division.

    Scale: same two-stage shape as retrieval_eval_mrr (queries
    broadcast; per-partition heaps bound every ranking); the
    label-size table is |labels| rows, broadcast.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", norm(F.col("v")))  # 1 dot per (query, doc) pair
    e = scoped_persist(e)
    lbl = e.groupBy("label").agg(F.count("*").alias("n_members"))
    q = e.filter(F.col("vec_id") % EVAL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    s = (
        e.repartition(data_width(spark, sf_dir, "embeddings"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "label",
            cosine_n(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qn")).alias(
                "_cos"
            ),
            "vec_id",
            F.spark_partition_id().alias("_pid"),
        )
    )
    # Two-stage top-k (the retrieval_eval_mrr shape): a per-(query,
    # partition) local rank bounds every heap, then the final rank
    # runs over ≤ k·partitions survivors per query.
    w_local = Window.partitionBy("qid", "_pid").orderBy(
        F.col("_cos").desc(), "vec_id"
    )
    survivors = s.withColumn("_r", F.row_number().over(w_local)).filter(
        F.col("_r") <= EVAL_TOP_K
    )
    w_final = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    ranked = survivors.select(
        "qid", "qlabel", "label", F.row_number().over(w_final).alias("rank")
    ).filter(F.col("rank") <= EVAL_TOP_K)
    gain = F.create_map(
        *[F.lit(x) for kv in _DCG_GAIN.items() for x in kv]
    )[F.col("rank")]
    per_q = ranked.groupBy("qid", "qlabel").agg(
        F.sum(
            F.when(F.col("label") == F.col("qlabel"), gain).otherwise(0)
        )
        .cast("long")
        .alias("dcg_scaled")
    )
    idcg = F.create_map(
        *[F.lit(x) for kv in _IDCG_PREFIX.items() for x in kv]
    )[F.least(F.col("n_members") - 1, F.lit(EVAL_TOP_K))]
    scored = per_q.join(
        F.broadcast(lbl), per_q.qlabel == lbl.label
    ).select(
        "qlabel",
        F.round(F.lit(1_000_000.0) * F.col("dcg_scaled") / idcg)
        .cast("long")
        .alias("ndcg_micro"),
    )
    return (
        scored.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count("*").alias("n_queries"),
            F.round(
                F.sum("ndcg_micro").cast("double") / F.count("*") / 1_000_000,
                6,
            ).alias("ndcg_at_10"),
        )
        .orderBy("label")
    )


DBSCAN_EPS_COS = 0.55  # neighbor when cosine >= eps (margin-checked)
DBSCAN_MIN_PTS = 3  # core point when >= minPts neighbors (excl. self)


@query(
    "dbscan_core_census",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    nbr AS (
      SELECT a.vec_id, a.label,
             CAST(sum(CASE WHEN list_cosine_similarity(a.v, c.v)
                                >= {DBSCAN_EPS_COS}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_nbrs
      FROM b a JOIN b c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
      GROUP BY a.vec_id, a.label
    ),
    allpts AS (
      SELECT b.vec_id, b.label, coalesce(nbr.n_nbrs, 0) AS n_nbrs
      FROM b LEFT JOIN nbr ON b.vec_id = nbr.vec_id
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN n_nbrs >= {DBSCAN_MIN_PTS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_core,
           CAST(sum(CASE WHEN n_nbrs > 0 AND n_nbrs < {DBSCAN_MIN_PTS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_border_or_edge,
           CAST(sum(CASE WHEN n_nbrs = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_isolated
    FROM allpts
    GROUP BY label
    ORDER BY label
    """,
)
def dbscan_core_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core-point census (Ester et al. 1996) within SRP-LSH
    buckets: a point is CORE when ≥{DBSCAN_MIN_PTS} neighbors sit at
    cosine ≥ {DBSCAN_EPS_COS} in its bucket — the density primitive
    under density-based dedup/clustering, and the census (core /
    sparse / isolated per label) is the readout that says whether a
    label's region is dense enough for density clustering to mean
    anything (all-isolated ⇒ use k-means; all-core ⇒ tighten ε). The
    density sibling of knn_label_purity over the same blocking.

    Exactness: neighbor counts are integers from a fixed threshold
    compare (identical doubles both engines; ε sits away from the
    data's cosine values — the COSINE_DUP_THRESHOLD margin
    discipline); the census is pure integer sums.

    Scale: the self-join keys on the corpus-derived SRP bucket
    (~TARGET_BUCKET_ROWS per bucket at ANY corpus size — never
    all-pairs); the census is a |labels|-group aggregate.
    """
    e = load_table(spark, sf_dir, "embeddings").repartition(
        data_width(spark, sf_dir, "embeddings")
    )
    planes = corpus_planes(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    pts = e.select(
        "vec_id",
        "label",
        v.alias("v"),
        _bucket_expr_spark("embedding", planes).alias("bucket"),
    ).withColumn("nrm", norm(F.col("v")))  # 1 dot/pair via cosine_n
    pts = scoped_persist(pts)
    a = pts.select(
        F.col("vec_id").alias("ia"), F.col("label").alias("la"),
        F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket",
    )
    c = pts.select(
        F.col("vec_id").alias("ic"), F.col("v").alias("vc"),
        F.col("nrm").alias("nc"), "bucket",
    )
    nbr = (
        a.join(c, ["bucket"])
        .filter(F.col("ia") != F.col("ic"))
        .groupBy("ia", "la")
        .agg(
            F.sum(
                (
                    cosine_n(
                        F.col("va"), F.col("vc"), F.col("na"), F.col("nc")
                    )
                    >= DBSCAN_EPS_COS
                ).cast("int")
            )
            .cast("long")
            .alias("n_nbrs")
        )
    )
    allpts = pts.select(
        F.col("vec_id").alias("ia"), F.col("label").alias("label")
    ).join(nbr.drop("la"), "ia", "left").na.fill({"n_nbrs": 0})
    return (
        allpts.groupBy("label")
        .agg(
            F.count("*").alias("n_points"),
            F.sum((F.col("n_nbrs") >= DBSCAN_MIN_PTS).cast("int"))
            .cast("long")
            .alias("n_core"),
            F.sum(
                ((F.col("n_nbrs") > 0) & (F.col("n_nbrs") < DBSCAN_MIN_PTS)).cast(
                    "int"
                )
            )
            .cast("long")
            .alias("n_border_or_edge"),
            F.sum((F.col("n_nbrs") == 0).cast("int")).cast("long").alias(
                "n_isolated"
            ),
        )
        .orderBy("label")
    )


@query(
    "centroid_shift_drift",
    oracle="""
    WITH b AS (
      SELECT vec_id, label, vec_id % 2 AS half,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    dims AS (
      SELECT label, half, generate_subscripts(v, 1) AS dim, unnest(v) AS x
      FROM b
    ),
    cents AS (
      SELECT label, half, dim, round(avg(x), 6) AS c
      FROM dims GROUP BY label, half, dim
    ),
    halves AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n, half FROM b
      GROUP BY label, half
    )
    SELECT e.label,
           ne.n AS n_even, no.n AS n_odd,
           round(sqrt(sum((e.c - o.c) * (e.c - o.c))), 6) AS centroid_shift
    FROM cents e
    JOIN cents o ON e.label = o.label AND e.dim = o.dim
                AND e.half = 0 AND o.half = 1
    JOIN halves ne ON ne.label = e.label AND ne.half = 0
    JOIN halves no ON no.label = e.label AND no.half = 1
    GROUP BY e.label, ne.n, no.n
    ORDER BY e.label
    """,
)
def centroid_shift_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between corpus halves (X2 embedding
    drift audit): split each label's vectors into even/odd vec_id
    halves, compute both centroids, and report the L2 shift between
    them. Near-zero shift = the label's embedding cloud is stable
    under subsampling; a large shift flags a heterogeneous or
    drifting cluster (mixed concepts under one label, or an encoder
    change mid-corpus) — the embedding-space twin of
    ``ks_drift_doclen``'s distributional drift test, and the canary a
    pipeline checks before trusting label-conditioned ANN blocking
    (``knn_label_purity``).

    Exactness: per-dim means round to 6 dp in BOTH lanes before the
    distance (the ``kmeans_lloyd_step`` rule), so the emitted shift is
    a deterministic function of rounded values; halves are an integer
    parity split — no sampling randomness.

    Scale: one posexplode projection → (label, half, dim) hash
    aggregate with map-side partial sums (the ``embedding_gram_matrix``
    shape, d·2·|labels| output rows); the distance reduce runs over
    the tiny centroid table, never the corpus.
    """
    e = load_table(spark, sf_dir, "embeddings").repartition(
        data_width(spark, sf_dir, "embeddings")
    )
    b = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    b = scoped_persist(b)  # feeds the dim explode AND the half counts
    cents = (
        b.select("label", "half", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "half", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    halves = b.groupBy("label", "half").agg(F.count("*").alias("n"))
    ce = cents.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("ce")
    )
    co = cents.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("co")
    )
    ne = halves.filter(F.col("half") == 0).select(
        "label", F.col("n").alias("n_even")
    )
    no = halves.filter(F.col("half") == 1).select(
        "label", F.col("n").alias("n_odd")
    )
    return (
        ce.join(co, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("ce") - F.col("co")) * (F.col("ce") - F.col("co")))),
                6,
            ).alias("centroid_shift")
        )
        .join(F.broadcast(ne), "label")
        .join(F.broadcast(no), "label")
        .select("label", "n_even", "n_odd", "centroid_shift")
        .orderBy("label")
    )


LINKPRED_TOP_K = 20


@query(
    "graph_common_neighbors_linkpred",
    oracle=f"""
    WITH edges AS ({KNN_GRAPH_ORACLE}),
    und AS (
      SELECT vec_id AS src, nbr_id AS dst FROM edges
      UNION
      SELECT nbr_id AS src, vec_id AS dst FROM edges
    ),
    cn AS (
      SELECT a.src AS u, b.src AS w, CAST(count(*) AS BIGINT)
               AS common_neighbors
      FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT u, w, common_neighbors
    FROM cn ANTI JOIN und ON cn.u = und.src AND cn.w = und.dst
    ORDER BY common_neighbors DESC, u, w
    LIMIT {LINKPRED_TOP_K}
    """,
)
def graph_common_neighbors_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction over the k-NN graph (X2 —
    Liben-Nowell & Kleinberg 2003's baseline that later methods are
    measured against): the top NON-adjacent vector pairs ranked by
    shared-neighbor count on the symmetrized bucketed k-NN graph.
    High-common-neighbor non-edges are exactly the pairs an ANN index
    MISSED (bucket boundaries split them) — so beyond its classic
    recommender role this is an index-quality probe: feed the
    predictions to the exact verifier and every confirmed hit is an
    LSH recall failure, localized.

    Exactness: the graph is the oracle-checked ``knn_graph_bucketed``
    (invoked as the inner stage — one definition, never drift);
    neighbor counts are integers; ranking is integer-ordered with a
    full tie-break.

    Scale: the wedge join keys on the SHARED NEIGHBOR, so work is
    Σ deg(n)² with degrees bounded by k out-edges and bucket-bounded
    in-edges (the derive_planes guarantee); the anti-join removes
    existing edges on the (src, dst) key; top-k is
    TakeOrderedAndProject on the integer count.
    """
    from couchwarehouse_spark.plans import QUERIES

    edges = QUERIES["knn_graph_bucketed"](spark, sf_dir).select(
        "vec_id", "nbr_id"
    )
    und = (
        edges.select(F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst"))
        .union(
            edges.select(
                F.col("nbr_id").alias("src"), F.col("vec_id").alias("dst")
            )
        )
        .distinct()
    )
    und = scoped_persist(und)  # wedge join sides AND the anti-join
    a = und.select(F.col("src").alias("u"), "dst")
    b = und.select(F.col("src").alias("w"), "dst")
    cn = (
        a.join(b, "dst")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").alias("common_neighbors"))
    )
    existing = und.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    return (
        cn.join(existing, ["u", "w"], "left_anti")
        .orderBy(F.col("common_neighbors").desc(), "u", "w")
        .limit(LINKPRED_TOP_K)
    )


# Shared oracle prefix for the undirected k-NN graph kernels: the
# directed bucketed top-k edges collapsed to distinct (a < c) pairs.
# MATERIALIZED: DuckDB inlines CTEs by default, so a CTE referenced n
# times is evaluated n times — the bucket self-join would re-run per
# reference (and per unrolled k-core round, compounding). Pinning the
# shared frames mirrors the Spark lane's scoped_persist.
_UND_CTE = f"""
    WITH b AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {{bucket}} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    dir_e AS (SELECT vec_id, nbr_id FROM scored WHERE rank <= {KNN_GRAPH_K}),
    und AS MATERIALIZED (
      SELECT least(vec_id, nbr_id) AS a, greatest(vec_id, nbr_id) AS c,
             CAST(count(*) AS BIGINT) AS n_dir
      FROM dir_e GROUP BY 1, 2
    )
"""


def _und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed bucketed k-NN edges → undirected (a < c) pairs with
    the orientation count (2 = reciprocal edge)."""
    e = knn_graph_bucketed(spark, sf_dir).select("vec_id", "nbr_id")
    return (
        e.select(
            F.least("vec_id", "nbr_id").alias("a"),
            F.greatest("vec_id", "nbr_id").alias("c"),
        )
        .groupBy("a", "c")
        .agg(F.count("*").cast("long").alias("n_dir"))
    )


@query(
    "mutual_knn_pairs",
    oracle=_UND_CTE.format(bucket=_bucket_expr_sql_derived("embedding"))
    + """
    SELECT CAST(sum(n_dir) AS BIGINT)  AS n_directed,
           CAST(count(*) AS BIGINT)    AS n_und_pairs,
           CAST(sum(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mutual,
           round(CAST(sum(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS mutuality_rate
    FROM und
    """,
)
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal (mutual) k-NN census: pairs where BOTH vectors rank
    each other in their top-k — the classic high-precision alignment/
    near-dup primitive (mutual-NN filtering in bitext mining and
    image matching): a one-sided edge often just means an asymmetric
    density neighborhood; a reciprocal edge is evidence of a genuine
    pair. The mutuality rate is also the practical health probe for k
    and bucket width (too-small buckets destroy reciprocity at
    bucket boundaries).

    Scale: one groupBy over the N·k directed edge list keyed by the
    canonical (min,max) pair — counting orientations instead of
    self-joining the edge table halves the shuffle; everything after
    is a single global agg.
    """
    und = _und_edges(spark, sf_dir)
    mutual = (F.col("n_dir") == 2).cast("int")
    return und.agg(
        F.sum("n_dir").cast("long").alias("n_directed"),
        F.count("*").cast("long").alias("n_und_pairs"),
        F.sum(mutual).cast("long").alias("n_mutual"),
        F.round(F.sum(mutual).cast("double") / F.count("*"), 6).alias(
            "mutuality_rate"
        ),
    )


KCORE_K = 4  # degree threshold for the peel (median und degree is 3-4)
KCORE_ROUNDS = 3  # bounded synchronous peel rounds (deterministic)


def _kcore_round_sql(i: int) -> str:
    src = "und_e" if i == 1 else f"e{i}"
    return f"""
    deg{i} AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM {src} UNION ALL SELECT c AS node FROM {src}
      ) GROUP BY node
    ),
    keep{i} AS MATERIALIZED (SELECT node FROM deg{i} WHERE d >= {KCORE_K}),
    e{i + 1} AS MATERIALIZED (
      SELECT s.a, s.c FROM {src} s
      JOIN keep{i} k1 ON s.a = k1.node
      JOIN keep{i} k2 ON s.c = k2.node
    )"""


@query(
    "kcore_decomposition",
    oracle=_UND_CTE.format(bucket=_bucket_expr_sql_derived("embedding"))
    + ", und_e AS MATERIALIZED (SELECT a, c FROM und),"
    + ",".join(_kcore_round_sql(i) for i in range(1, KCORE_ROUNDS + 1))
    + "".join(
        f"""
    {"SELECT" if i == 1 else "UNION ALL SELECT"} {i} AS iter,
           (SELECT CAST(count(*) AS BIGINT) FROM keep{i}) AS n_core_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e{i + 1}) AS n_core_edges"""
        for i in range(1, KCORE_ROUNDS + 1)
    )
    + " ORDER BY iter",
)
def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (Seidman 1983; the distributed
    formulation is Montresor et al.'s synchronous peel) over the
    undirected k-NN graph: each round drops nodes of degree < k and
    the edges they carried, reporting the shrinking core per round.
    The k-core is the standard "dense region" extractor — in a
    near-dup graph it isolates template/boilerplate families that
    pairwise thresholds miss; three synchronous rounds are a
    deterministic, oracle-checkable prefix of the fixpoint (full
    convergence is this same plan iterated with an early-exit probe).

    Scale: per round one degree hash-agg over current edges + two
    endpoint joins (AQE broadcasts the shrinking keep set from exact
    checkpointed sizes); edges only ever shrink. Each round's frames
    are localCheckpoint'ed, NOT merely persisted: the final result
    unions all rounds, so with live lineage round i's plan re-embeds
    every earlier round's tree and the AQE plan-string alone grows
    exponentially (observed: OOM in explainString at round 3 on a
    1k-edge graph). Truncating lineage per round is the standard
    iterative-graph discipline (GraphFrames/GraphX checkpoint for
    exactly this reason); at cluster scale the same call goes to a
    reliable checkpoint dir. Checkpoint blocks are dropped by the
    ContextCleaner when the frames go out of scope.

    Reference: the same bounded-iteration pattern as
    graph_pagerank_3iter (similarity.py) — unrolled in the oracle,
    a Python loop over DataFrames in Spark.
    """
    edges = _und_edges(spark, sf_dir).select("a", "c").localCheckpoint()
    out = None
    for i in range(1, KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("a").alias("node"))
            .unionAll(edges.select(F.col("c").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= KCORE_K).select("node").localCheckpoint()
        nxt = (
            edges.join(keep.withColumnRenamed("node", "a"), "a")
            .join(keep.withColumnRenamed("node", "c"), "c")
            .select("a", "c")
            .localCheckpoint()
        )
        row = (
            keep.agg(F.count("*").cast("long").alias("n_core_nodes"))
            .crossJoin(nxt.agg(F.count("*").cast("long").alias("n_core_edges")))
            .select(F.lit(i).alias("iter"), "n_core_nodes", "n_core_edges")
        )
        out = row if out is None else out.unionByName(row)
        edges = nxt
    return out.orderBy("iter")


@query(
    "degree_assortativity",
    oracle=_UND_CTE.format(bucket=_bucket_expr_sql_derived("embedding"))
    + """
    , deg AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT c AS node FROM und
      ) GROUP BY node
    ),
    stubs AS (
      SELECT d1.d AS x, d2.d AS y
      FROM und JOIN deg d1 ON und.a = d1.node JOIN deg d2 ON und.c = d2.node
      UNION ALL
      SELECT d2.d, d1.d
      FROM und JOIN deg d1 ON und.a = d1.node JOIN deg d2 ON und.c = d2.node
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM stubs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
           round(CAST(m * sxy - sx * sx AS DOUBLE)
                 / nullif(CAST(m * sxx - sx * sx AS DOUBLE), 0), 6)
             AS assortativity
    FROM t
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002's r): Pearson correlation of
    endpoint degrees over every edge stub of the undirected k-NN
    graph. Positive r — hubs linking to hubs — predicts that
    near-dup/template clusters will chain into giant components under
    transitive closure (exactly when connected-components cost
    explodes), so r is the cheap early warning read BEFORE running
    clustering. Both orientations of each edge are counted, making
    Σx = Σy and the formula symmetric.

    Exactness: degrees are integers; all four reduce sums are exact
    integer aggregates; one float division at the end (nullif-guarded
    for regular graphs where the variance is 0).

    Scale: a degree hash-agg plus two broadcast-friendly joins of the
    edge list against the |V|-sized degree table, then a single
    global agg — no window, no driver loop.
    """
    und = _und_edges(spark, sf_dir).select("a", "c")
    und = scoped_persist(und)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    joined = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "dx"), "a")
        .join(deg.withColumnRenamed("node", "c").withColumnRenamed("d", "dy"), "c")
        .select("dx", "dy")
    )
    # Both stub orientations folded into ONE pass: per edge the stub
    # sums are (dx+dy), (dx²+dy²), 2·dx·dy and m = 2·|E| — identical
    # integers to the unioned two-orientation frame at half the agg
    # input (the union literally scanned the join twice).
    t = joined.agg(
        (2 * F.count("*")).cast("long").alias("m"),
        F.sum(F.col("dx") + F.col("dy")).cast("long").alias("sx"),
        F.sum(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        .cast("long")
        .alias("sxx"),
        F.sum(2 * F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    n_e = und.agg(F.count("*").cast("long").alias("n_edges"))
    return n_e.crossJoin(F.broadcast(t)).select(
        "n_edges",
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")).cast("double")
            / F.nullif(
                (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("assortativity"),
    )


MMR_LAMBDA_NUM, MMR_LAMBDA_DEN = 7, 10  # λ = 0.7 relevance vs diversity
MMR_POOL = 8  # candidate pool from the cosine top-k
MMR_K = 3  # greedy picks (unrolled in both lanes)

_MMR_CAND_CTE = f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT v AS qv FROM v WHERE vec_id = {QUERY_VEC_ID}),
    cand AS MATERIALIZED (
      SELECT v.vec_id, v.label, v.v,
             list_cosine_similarity(v.v, q.qv) AS rel
      FROM v CROSS JOIN q
      WHERE v.vec_id <> {QUERY_VEC_ID}
      ORDER BY list_cosine_similarity(v.v, q.qv) DESC, v.vec_id
      LIMIT {MMR_POOL}
    ),
    p1 AS (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
    s2 AS (
      SELECT c.*,
             {MMR_LAMBDA_NUM / MMR_LAMBDA_DEN} * c.rel
             - {1 - MMR_LAMBDA_NUM / MMR_LAMBDA_DEN}
               * list_cosine_similarity(c.v, p1.v) AS mmr
      FROM cand c CROSS JOIN p1 WHERE c.vec_id <> p1.vec_id
    ),
    p2 AS (SELECT * FROM s2 ORDER BY mmr DESC, vec_id LIMIT 1),
    s3 AS (
      SELECT c.*,
             {MMR_LAMBDA_NUM / MMR_LAMBDA_DEN} * c.rel
             - {1 - MMR_LAMBDA_NUM / MMR_LAMBDA_DEN}
               * greatest(list_cosine_similarity(c.v, p1.v),
                          list_cosine_similarity(c.v, p2.v)) AS mmr
      FROM cand c CROSS JOIN p1 CROSS JOIN p2
      WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id
    ),
    p3 AS (SELECT * FROM s3 ORDER BY mmr DESC, vec_id LIMIT 1)
"""


@query(
    "mmr_diversified_rerank",
    oracle=_MMR_CAND_CTE
    + f"""
    SELECT 1 AS rank, vec_id, label, round(rel, 4) AS relevance,
           round({MMR_LAMBDA_NUM / MMR_LAMBDA_DEN} * rel, 4) AS mmr_score
    FROM p1
    UNION ALL
    SELECT 2, vec_id, label, round(rel, 4), round(mmr, 4) FROM p2
    UNION ALL
    SELECT 3, vec_id, label, round(rel, 4), round(mmr, 4) FROM p3
    ORDER BY rank
    """,
)
def mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98 — the standard relevance/diversity trade-off in search
    and RAG context selection): greedily pick k results maximizing
    λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s) over the cosine top-8
    pool. A plain top-k returns near-duplicates of one document; MMR
    is what context-window builders actually ship. The greedy loop is
    inherently sequential in k, so both lanes unroll the 3 picks
    (the kcore_decomposition pattern) — iterating further is the same
    plan repeated.

    Exactness: relevance and pairwise sims are the same float dag in
    both engines over identical doubles; every argmax carries a
    vec_id tiebreak; rounding only at display.

    Scale: ONE distributed pass builds the pool (TakeOrderedAndProject
    over the corpus scan); every unrolled step then operates on the
    ≤8-row broadcast pool — the corpus is never rescanned. Pool size,
    not corpus size, bounds the sequential part (this is why
    production MMR re-ranks a candidate window, never the index).
    """
    lam = MMR_LAMBDA_NUM / MMR_LAMBDA_DEN
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    cand = (
        v.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", "v", cosine(F.col("v"), F.col("qv")).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_POOL)
    )
    cand = scoped_persist(cand)

    def pick(scored: DataFrame, score_col: str) -> DataFrame:
        return scored.orderBy(F.col(score_col).desc(), "vec_id").limit(1)

    p1 = pick(cand, "rel")
    p1b = F.broadcast(p1.select(F.col("vec_id").alias("p1_id"), F.col("v").alias("p1_v")))
    s2 = (
        cand.crossJoin(p1b)
        .filter(F.col("vec_id") != F.col("p1_id"))
        .withColumn(
            "mmr",
            lam * F.col("rel") - (1 - lam) * cosine(F.col("v"), F.col("p1_v")),
        )
    )
    p2 = pick(s2, "mmr")
    p2b = F.broadcast(p2.select(F.col("vec_id").alias("p2_id"), F.col("v").alias("p2_v")))
    s3 = (
        cand.crossJoin(p1b)
        .crossJoin(p2b)
        .filter((F.col("vec_id") != F.col("p1_id")) & (F.col("vec_id") != F.col("p2_id")))
        .withColumn(
            "mmr",
            lam * F.col("rel")
            - (1 - lam)
            * F.greatest(
                cosine(F.col("v"), F.col("p1_v")), cosine(F.col("v"), F.col("p2_v"))
            ),
        )
    )
    p3 = pick(s3, "mmr")
    out1 = p1.select(
        F.lit(1).alias("rank"), "vec_id", "label",
        F.round("rel", 4).alias("relevance"),
        F.round(lam * F.col("rel"), 4).alias("mmr_score"),
    )
    out2 = p2.select(
        F.lit(2).alias("rank"), "vec_id", "label",
        F.round("rel", 4).alias("relevance"),
        F.round("mmr", 4).alias("mmr_score"),
    )
    out3 = p3.select(
        F.lit(3).alias("rank"), "vec_id", "label",
        F.round("rel", 4).alias("relevance"),
        F.round("mmr", 4).alias("mmr_score"),
    )
    return out1.unionByName(out2).unionByName(out3).orderBy("rank")


_MODULARITY_ORACLE = f"""
    WITH flat AS (
      SELECT label,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    dims AS (
      SELECT label AS cell, dim, round(avg(x), 6) AS c FROM flat GROUP BY label, dim
    ),
    cents AS (
      SELECT cell, list(c ORDER BY dim) AS centroid FROM dims GROUP BY cell
    ),
    vv AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    assigned AS (
      SELECT vec_id, min_by(cell, list_distance(v, centroid)) AS cell
      FROM vv CROSS JOIN cents
      GROUP BY vec_id, v
    ),
    knn AS ({KNN_GRAPH_ORACLE.replace(chr(10), chr(10) + '    ')}),
    und AS (
      SELECT DISTINCT least(vec_id, nbr_id) AS a, greatest(vec_id, nbr_id) AS c
      FROM knn
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM und UNION ALL SELECT c FROM und)
      GROUP BY node
    ),
    intra AS (
      SELECT aa.cell, CAST(count(*) AS BIGINT) AS intra_edges
      FROM und
      JOIN assigned aa ON aa.vec_id = und.a
      JOIN assigned ac ON ac.vec_id = und.c
      WHERE aa.cell = ac.cell
      GROUP BY aa.cell
    ),
    cellstat AS (
      SELECT s.cell,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(coalesce(deg.d, 0)) AS BIGINT) AS degree_sum
      FROM assigned s LEFT JOIN deg ON deg.node = s.vec_id
      GROUP BY s.cell
    )
    SELECT cs.cell, cs.n_nodes,
           coalesce(i.intra_edges, 0) AS intra_edges,
           cs.degree_sum,
           round(CAST(coalesce(i.intra_edges, 0) AS DOUBLE) / m.m
                 - power(CAST(cs.degree_sum AS DOUBLE) / (2 * m.m), 2),
                 6) AS q_contribution
    FROM cellstat cs LEFT JOIN intra i ON i.cell = cs.cell CROSS JOIN m
    ORDER BY cs.cell
"""


@query("partition_modularity", oracle=_MODULARITY_ORACLE)
def partition_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity (Newman-Girvan 2004) of the IVF cell
    partition over the k-NN graph — the index-quality diagnostic that
    connects the repo's two X2 structures: if vectors' nearest-centroid
    cells align with the near-neighbor graph's community structure
    (per-cell contribution q_c = L_c/m − (D_c/2m)² summing high),
    single-probe IVF queries rarely cross a cell boundary to find
    their neighbors; Q near 0 says the quantizer fights the geometry
    and nprobe must rise. Same cell assignment as ``ivf_topk`` (6-dp
    centroids, strict-< argmin), same undirected edge set as
    ``graph_triangle_count``.

    Exactness: m, per-cell intra-edge counts, and degree sums are
    exact integers; one fixed float expression per cell, rounded once.

    Scale: the kNN build dominates (bucketed, never all-pairs — see
    ``knn_graph_bucketed``); after it, two broadcast-sized joins of
    the edge list against the |V|-row assignment and a |cells|-group
    aggregate. The assignment itself is a pure projection over ONE
    broadcast centroid row.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = (
        v.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy(F.col("label").alias("cell"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    cents = dims.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc")
    ).select("cell", F.col("dc.c").alias("centroid"))
    cents_row = cents.agg(
        F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias("cents")
    )
    assigned = scoped_persist(
        v.crossJoin(F.broadcast(cents_row)).select(
            "vec_id",
            argmin_cell(
                F.col("v"), F.col("cents"), cents.schema["cell"].dataType
            ).alias("cell"),
        )
    )
    edges = scoped_persist(
        knn_graph_bucketed(spark, sf_dir)
        .select(
            F.least("vec_id", "nbr_id").alias("a"),
            F.greatest("vec_id", "nbr_id").alias("c"),
        )
        .distinct()
    )
    m = edges.agg(F.count("*").cast("long").alias("m"))
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    a_cell = assigned.select(F.col("vec_id").alias("a"), F.col("cell").alias("a_cell"))
    c_cell = assigned.select(F.col("vec_id").alias("c"), F.col("cell").alias("c_cell"))
    intra = (
        edges.join(a_cell, "a")
        .join(c_cell, "c")
        .filter(F.col("a_cell") == F.col("c_cell"))
        .groupBy(F.col("a_cell").alias("cell"))
        .agg(F.count("*").cast("long").alias("intra_edges"))
    )
    cellstat = (
        assigned.join(deg, assigned.vec_id == deg.node, "left")
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).cast("long").alias("degree_sum"),
        )
    )
    intra_e = F.coalesce(F.col("intra_edges"), F.lit(0))
    return (
        cellstat.join(intra, "cell", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "cell",
            "n_nodes",
            intra_e.alias("intra_edges"),
            "degree_sum",
            F.round(
                intra_e.cast("double") / F.col("m")
                - F.pow(
                    F.col("degree_sum").cast("double") / (2 * F.col("m")),
                    F.lit(2),
                ),
                6,
            ).alias("q_contribution"),
        )
        .orderBy("cell")
    )


@query(
    "embedding_isotropy_audit",
    oracle="""
    WITH q AS (
      SELECT label, vec_id,
             unnest(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
               AS qx,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    per_dim AS (
      SELECT label, dim,
             CAST(sum(qx) AS BIGINT) AS s,
             CAST(sum(qx * qx) AS BIGINT) AS s2
      FROM q GROUP BY label, dim
    ),
    per_label AS (
      SELECT label,
             CAST((SELECT count(*) FROM embeddings e
                   WHERE e.label = per_dim.label) AS BIGINT) AS n_vecs,
             sum((CAST(s AS DOUBLE) / 1000000)
                 * (CAST(s AS DOUBLE) / 1000000)) AS mean_num,
             sum(CAST(s2 AS DOUBLE) / 1000000000000.0) AS sq_sum
      FROM per_dim GROUP BY label
    )
    SELECT label, n_vecs,
           round(sqrt(mean_num) / n_vecs, 6) AS mean_vec_norm,
           round(sqrt(sq_sum / n_vecs), 6) AS rms_norm,
           round((mean_num / (n_vecs * n_vecs))
                 / nullif(sq_sum / n_vecs, 0), 6) AS anisotropy
    FROM per_label
    ORDER BY label
    """,
)
def embedding_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding ISOTROPY audit per label (Mu & Viswanath 2018,
    Ethayarajh 2019 — "how much of the space do my embeddings actually
    use?"): anisotropy = ‖mean vector‖² / E[‖v‖²] is ~0 when vectors
    spread symmetrically and → 1 when they collapse toward a common
    direction — collapsed embeddings make every cosine look high,
    which silently breaks near-dup thresholds and ANN recall. Reports
    mean-vector norm, RMS vector norm, and the ratio per label.

    Exactness: every element is quantized to integer MICRO-units
    BEFORE the cross-row reduces (the repo's ln-reduce idiom applied
    to coordinates), so Σx and Σx² per dimension are associative
    integer sums that cannot flip on partitioning; the handful of
    float ops after them run on identical integers in both engines.
    At this quantum, Σq² stays < 2⁶³ up to ~10⁵ vectors/label ×
    64 dims; at 100 TB drop the quantum to 1e4 or split the sum.

    Scale: one explode + (label, dim)-keyed integer agg (64·|labels|
    groups), then a |labels|-row reduce — the same shape as
    ``embedding_gram_matrix``'s diagonal, never materializing pairs.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    ).select(
        "label", "dim", F.round(F.col("x") * 1_000_000).cast("long").alias("qx")
    )
    per_dim = q.groupBy("label", "dim").agg(
        F.sum("qx").cast("long").alias("s"),
        F.sum(F.col("qx") * F.col("qx")).cast("long").alias("s2"),
    )
    counts = e.groupBy("label").agg(F.count("*").cast("long").alias("n_vecs"))
    per_label = (
        per_dim.groupBy("label")
        .agg(
            F.sum(
                (F.col("s").cast("double") / 1_000_000)
                * (F.col("s").cast("double") / 1_000_000)
            ).alias("mean_num"),
            F.sum(F.col("s2").cast("double") / 1e12).alias("sq_sum"),
        )
        .join(F.broadcast(counts), "label")
    )
    return per_label.select(
        "label",
        "n_vecs",
        F.round(F.sqrt(F.col("mean_num")) / F.col("n_vecs"), 6).alias(
            "mean_vec_norm"
        ),
        F.round(F.sqrt(F.col("sq_sum") / F.col("n_vecs")), 6).alias("rms_norm"),
        F.round(
            (F.col("mean_num") / (F.col("n_vecs") * F.col("n_vecs")))
            / F.nullif(F.col("sq_sum") / F.col("n_vecs"), F.lit(0.0)),
            6,
        ).alias("anisotropy"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# Round 9 additions: rank-based ROC-AUC, mean-average-precision
# retrieval eval, and HITS hub/authority scores on the k-NN graph.
# ---------------------------------------------------------------------------


@query(
    "roc_auc_rank",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label % 2 = 1 AS pos,
             CAST(round(1000000 * (list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)), {_W_SQL})
               + {ML_BIAS})) AS BIGINT) AS score_micro
      FROM embeddings
    ),
    g AS (
      SELECT score_micro,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS q
      FROM v GROUP BY score_micro
    ),
    cum AS (
      SELECT p, q,
             coalesce(CAST(sum(q) OVER (ORDER BY score_micro
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS q_below
      FROM g
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(q) AS BIGINT) AS n_neg,
           CAST(sum(p * (2 * q_below + q)) AS BIGINT) AS u2_stat,
           round(CAST(sum(p * (2 * q_below + q)) AS DOUBLE)
                 / nullif(2.0 * sum(p) * sum(q), 0), 6) AS auc
    FROM cum
    """,
)
def roc_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the in-SQL linear classifier via the rank / Mann-
    Whitney identity (AUC = U/(n1·n0) — Hanley & McNeil 1982; the
    model-eval number every classifier-backed quality filter reports
    before its threshold is trusted at corpus scale). Scores are the
    raw linear logits of ``ml_inference_scores``'s model (monotone in
    the sigmoid, so the AUC is identical and no exp() enters);
    positives are odd labels.

    Exactness: scores quantize to integer micro units BEFORE
    grouping, so tie groups are identical in both lanes; with p_s/q_s
    positives/negatives per distinct score, U·2 = Σ_s p_s·(2·q_below
    + q_s) handles ties exactly (each tied pair counts once, i.e.
    0.5·2) — ALL integer arithmetic, one division at emit.

    Scale: grouping collapses N rows to |distinct scores|; the
    cumulative window runs over that collapsed, ordered table (at
    100 TB: bin scores to bounded resolution first — which the micro
    quantization already is). No row-level ranks materialize.
    """
    e = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(x) for x in ML_WEIGHTS])
    v = e.select(
        (F.col("label") % 2 == 1).alias("pos"),
        F.round(
            1_000_000
            * (dot(F.col("embedding").cast("array<double>"), w) + F.lit(ML_BIAS))
        )
        .cast("long")
        .alias("score_micro"),
    )
    g = v.groupBy("score_micro").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("p"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("q"),
    )
    w_below = Window.orderBy("score_micro").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = g.select(
        "p",
        "q",
        F.coalesce(F.sum("q").over(w_below).cast("long"), F.lit(0)).alias(
            "q_below"
        ),
    )
    u2 = F.sum(F.col("p") * (2 * F.col("q_below") + F.col("q"))).cast("long")
    return cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("q").cast("long").alias("n_neg"),
        u2.alias("u2_stat"),
        F.round(
            u2.cast("double")
            / F.nullif(2.0 * F.sum("p") * F.sum("q"), F.lit(0.0)),
            6,
        ).alias("auc"),
    )


RETRIEVAL_MAP_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    lc AS (SELECT label, CAST(count(*) AS BIGINT) AS nl FROM e GROUP BY label),
    q AS (
      SELECT vec_id AS qid, label AS qlabel, v AS qv
      FROM e WHERE vec_id % {EVAL_QUERY_MOD} = 0
    ),
    s AS (
      SELECT q.qid, q.qlabel, e.label,
             row_number() OVER (PARTITION BY q.qid
                                ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                                         e.vec_id) AS rank
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    hits AS (
      SELECT qid, qlabel, rank,
             CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
             CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                  OVER (PARTITION BY qid ORDER BY rank) AS BIGINT) AS h
      FROM s WHERE rank <= {EVAL_TOP_K}
    ),
    per_q AS (
      SELECT qid, any_value(qlabel) AS qlabel,
             CAST(sum(CASE WHEN rel = 1 THEN ({_RR_LCM} // rank) * h
                           ELSE 0 END) AS BIGINT) AS ap_scaled
      FROM hits GROUP BY qid
    ),
    ap AS (
      SELECT p.qlabel,
             CAST(round(1000000.0 * p.ap_scaled
                        / ({_RR_LCM} * least(l.nl - 1, {EVAL_TOP_K})))
                  AS BIGINT) AS ap_micro
      FROM per_q p JOIN lc l ON p.qlabel = l.label
    )
    SELECT qlabel AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(CAST(sum(ap_micro) AS DOUBLE) / 1000000 / count(*), 6)
             AS map_at_10
    FROM ap GROUP BY qlabel
"""


@query("retrieval_eval_map", oracle=RETRIEVAL_MAP_ORACLE)
def retrieval_eval_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean average precision at 10 (MAP@10 — the order-sensitive
    retrieval metric that credits EVERY relevant hit by the precision
    at its rank, unlike MRR's first-hit-only view; the third leg of
    the eval stool next to ``retrieval_eval_mrr`` and
    ``retrieval_eval_ndcg``): per held-out query (vec_id %
    {EVAL_QUERY_MOD} = 0), AP@10 = Σ_rel P@k / min(R, 10) with
    label-match relevance and R = the query label's corpus size - 1.

    Exactness: P@k at rank k is hits@k/k, carried exactly as
    ({_RR_LCM}//k)·hits@k (lcm(1..10) scaling — always integer); the
    per-query AP is ONE division quantized to micro units; the
    per-label MAP reduce is an INTEGER sum.

    Scale: same two-stage heap as the MRR eval — the bounded query
    sample broadcasts, per-partition top-10 heaps bound what the
    final per-query rank window sees, and the eval reduce runs over
    ≤ Q·10 rows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", norm(F.col("v")))  # 1 dot per (query, doc) pair
    lc = v.groupBy("label").agg(F.count("*").cast("long").alias("nl"))
    q = v.filter(F.col("vec_id") % EVAL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        v.repartition(data_width(spark, sf_dir, "embeddings"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "_cos", cosine_n(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qn"))
        )
        .withColumn("_pid", F.spark_partition_id())
        .select("qid", "qlabel", "vec_id", "label", "_cos", "_pid")
    )
    w_local = Window.partitionBy("qid", "_pid").orderBy(
        F.col("_cos").desc(), "vec_id"
    )
    survivors = scored.withColumn("_r", F.row_number().over(w_local)).filter(
        F.col("_r") <= EVAL_TOP_K
    )
    w_final = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), "vec_id")
    topk = survivors.withColumn("rank", F.row_number().over(w_final)).filter(
        F.col("rank") <= EVAL_TOP_K
    )
    rel = F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
    w_run = Window.partitionBy("qid").orderBy("rank")
    hits = topk.select(
        "qid", "qlabel", "rank", rel.alias("rel"),
        F.sum(rel).over(w_run).cast("long").alias("h"),
    )
    per_q = hits.groupBy("qid").agg(
        F.first("qlabel").alias("qlabel"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                (F.lit(_RR_LCM) / F.col("rank")).cast("long") * F.col("h"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("ap_scaled"),
    )
    ap = per_q.join(
        F.broadcast(lc.withColumnRenamed("label", "qlabel")), "qlabel"
    ).select(
        "qlabel",
        F.round(
            1_000_000.0
            * F.col("ap_scaled")
            / (_RR_LCM * F.least(F.col("nl") - 1, F.lit(EVAL_TOP_K))),
        )
        .cast("long")
        .alias("ap_micro"),
    )
    return ap.groupBy(F.col("qlabel").alias("label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(
            F.sum("ap_micro").cast("double") / 1_000_000 / F.count("*"), 6
        ).alias("map_at_10"),
    )


HITS_TOP = 20

HITS_ORACLE = f"""
    WITH b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    edges AS (SELECT vec_id AS src, nbr_id AS dst FROM scored
              WHERE rank <= {KNN_GRAPH_K}),
    a1 AS (SELECT dst, CAST(count(*) AS BIGINT) AS a1 FROM edges GROUP BY dst),
    h1 AS (SELECT e.src, CAST(sum(a.a1) AS BIGINT) AS h1
           FROM edges e JOIN a1 a ON e.dst = a.dst GROUP BY e.src),
    a2 AS (SELECT e.dst, CAST(sum(h.h1) AS BIGINT) AS a2
           FROM edges e JOIN h1 h ON e.src = h.src GROUP BY e.dst),
    h2 AS (SELECT e.src, CAST(sum(a.a2) AS BIGINT) AS h2
           FROM edges e JOIN a2 a ON e.dst = a.dst GROUP BY e.src)
    SELECT n.vec_id,
           coalesce(a2.a2, 0) AS auth_score,
           coalesce(h2.h2, 0) AS hub_score
    FROM embeddings n
    LEFT JOIN a2 ON n.vec_id = a2.dst
    LEFT JOIN h2 ON n.vec_id = h2.src
    ORDER BY auth_score DESC, n.vec_id
    LIMIT {HITS_TOP}
"""


@query("hits_hub_authority", oracle=HITS_ORACLE)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two HITS iterations (Kleinberg 1999 — hubs point at good
    authorities, authorities are pointed at by good hubs; the other
    classic link-analysis kernel next to PageRank, and on a k-NN
    graph the detector of dense similarity cores vs. broad
    connectors): from uniform init, a1 = in-degree, h1 = Σ_out a1,
    a2 = Σ_in h1, h2 = Σ_out a2, reported UNNORMALIZED for the top
    {20} authorities — normalization divides every score by the same
    constant and changes no ordering, so the integer fixed-point form
    is exact in both lanes (the PageRank-3iter scaling idea, with no
    scaling needed at all).

    Exactness: every score is an integer sum over integer scores —
    bounded by (k·N)² « 2^63 at any realistic shard size; ordering
    ties break on vec_id.

    Scale: each half-iteration is one edge-keyed join + hash agg over
    the N·k edge table (the textbook distributed HITS round); the
    edge table builds once (persisted) and feeds all four rounds;
    top-{20} is a TakeOrderedAndProject heap, never a global sort.
    """
    edges = knn_graph_bucketed(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst")
    )
    edges = scoped_persist(edges)
    a1 = edges.groupBy("dst").agg(F.count("*").cast("long").alias("a1"))
    h1 = (
        edges.join(a1, "dst")
        .groupBy("src")
        .agg(F.sum("a1").cast("long").alias("h1"))
    )
    a2 = (
        edges.join(h1, "src")
        .groupBy("dst")
        .agg(F.sum("h1").cast("long").alias("a2"))
    )
    h2 = (
        edges.join(a2, "dst")
        .groupBy("src")
        .agg(F.sum("a2").cast("long").alias("h2"))
    )
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id")
        .join(a2.withColumnRenamed("dst", "vec_id"), "vec_id", "left")
        .join(h2.withColumnRenamed("src", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("a2"), F.lit(0)).cast("long").alias("auth_score"),
            F.coalesce(F.col("h2"), F.lit(0)).cast("long").alias("hub_score"),
        )
        .orderBy(F.col("auth_score").desc(), "vec_id")
        .limit(HITS_TOP)
    )


@query(
    "adamic_adar_linkpred",
    oracle=f"""
    WITH edges AS ({KNN_GRAPH_ORACLE}),
    und AS (
      SELECT vec_id AS src, nbr_id AS dst FROM edges
      UNION
      SELECT nbr_id AS src, vec_id AS dst FROM edges
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src),
    aa AS (
      SELECT a.src AS u, b.src AS w,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(CAST(round(1000000 / ln(CAST(g.d AS DOUBLE)))
                           AS BIGINT)) AS BIGINT) AS aa_micro
      FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
      JOIN deg g ON g.src = a.dst
      GROUP BY 1, 2
    )
    SELECT u, w, common_neighbors,
           round(aa_micro / 1000000.0, 6) AS adamic_adar
    FROM aa ANTI JOIN und ON aa.u = und.src AND aa.w = und.dst
    ORDER BY aa_micro DESC, u, w
    LIMIT {LINKPRED_TOP_K}
    """,
)
def adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the k-NN graph (Adamic &
    Adar 2003 — the degree-weighted refinement of common-neighbors:
    a shared RARE neighbor is stronger evidence than a shared hub, so
    each common neighbor n contributes 1/ln(deg(n)) instead of 1).
    The standard next rung above ``graph_common_neighbors_linkpred``
    on the link-prediction ladder, and the same ANN-recall-probe role
    with hub-robust ranking.

    Exactness: degrees are integers; each wedge's 1/ln(deg) is
    quantized ONCE to micro units (a common neighbor has >= 2
    distinct neighbors, so ln(deg) > 0 by construction) and the
    per-pair reduce is an INTEGER sum; ranking orders on the integer
    aa_micro with a full tie-break.

    Scale: identical wedge-join shape to the common-neighbors entry —
    work is sum deg(n)² with bucket-bounded degrees; the degree table
    is node-sized and joins on the wedge center key.
    """
    from couchwarehouse_spark.plans import QUERIES

    edges = QUERIES["knn_graph_bucketed"](spark, sf_dir).select(
        "vec_id", "nbr_id"
    )
    und = (
        edges.select(F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst"))
        .union(
            edges.select(
                F.col("nbr_id").alias("src"), F.col("vec_id").alias("dst")
            )
        )
        .distinct()
    )
    und = scoped_persist(und)  # wedge sides, degree table, anti-join
    deg = und.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    a = und.select(F.col("src").alias("u"), "dst")
    b = und.select(F.col("src").alias("w"), "dst")
    aa = (
        a.join(b, "dst")
        .filter(F.col("u") < F.col("w"))
        .join(deg.withColumnRenamed("src", "dst"), "dst")
        .groupBy("u", "w")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum(
                F.round(1_000_000 / F.log(F.col("d").cast("double"))).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("aa_micro"),
        )
    )
    existing = und.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    return (
        aa.join(existing, ["u", "w"], "left_anti")
        .orderBy(F.col("aa_micro").desc(), "u", "w")
        .limit(LINKPRED_TOP_K)
        .select(
            "u", "w", "common_neighbors",
            F.round(F.col("aa_micro") / 1_000_000.0, 6).alias("adamic_adar"),
        )
    )


@query(
    "knn_hubness_audit",
    oracle=f"""
    WITH edges AS ({KNN_GRAPH_ORACLE}),
    indeg AS (
      SELECT n.vec_id, CAST(coalesce(d.c, 0) AS BIGINT) AS d
      FROM embeddings n LEFT JOIN (
        SELECT nbr_id, count(*) AS c FROM edges GROUP BY nbr_id
      ) d ON n.vec_id = d.nbr_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s1,
             CAST(sum(d * d) AS BIGINT) AS s2,
             CAST(sum(d * d * d) AS BIGINT) AS s3,
             CAST(max(d) AS BIGINT) AS dmax,
             CAST(sum(CASE WHEN d > 2 * {KNN_GRAPH_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hubs,
             CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_antihubs
      FROM indeg
    )
    SELECT n AS n_vectors, s1 AS n_edges, dmax AS max_in_degree,
           n_hubs, n_antihubs,
           round((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / nullif(pow(CAST(s2 AS DOUBLE) / n
                              - (CAST(s1 AS DOUBLE) / n)
                                * (CAST(s1 AS DOUBLE) / n), 1.5), 0), 4)
             AS indegree_skewness
    FROM m
    """,
)
def knn_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN hubness audit (Radovanović et al. 2010 — the
    high-dimensional pathology where a few "hub" vectors appear in
    everyone's neighbor lists while "anti-hubs" appear in nobody's;
    positive in-degree (k-occurrence) skewness is THE diagnostic, and
    high hubness degrades every downstream k-NN consumer: label
    purity, near-dup graphs, retrieval): in-degree distribution of
    the directed bucketed k-NN graph — moments, skewness, max, hub
    (d > 2k) and anti-hub (d = 0) counts.

    Exactness: in-degrees are integers (zero-degree vectors included
    via the node spine); the three moment sums are integer
    aggregates (d ≤ N keeps d³ sums in range at any realistic shard);
    skewness is one fixed float dag, nullif-guarded for the
    degenerate constant-degree graph.

    Scale: one hash agg over the N·k edge table + a node-spine left
    join + a 6-counter reduce — the hubness of a billion-vector index
    costs the graph build it already audits.
    """
    edges = knn_graph_bucketed(spark, sf_dir).select("vec_id", "nbr_id")
    e = load_table(spark, sf_dir, "embeddings")
    indeg = (
        e.select("vec_id")
        .join(
            edges.groupBy("nbr_id").agg(F.count("*").alias("c")),
            F.col("vec_id") == F.col("nbr_id"),
            "left",
        )
        .select(F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("d"))
    )
    m = indeg.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).cast("long").alias("s3"),
        F.max("d").cast("long").alias("dmax"),
        F.sum(F.when(F.col("d") > 2 * KNN_GRAPH_K, 1).otherwise(0))
        .cast("long")
        .alias("n_hubs"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_antihubs"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    var = m2 - mean * mean
    return m.select(
        F.col("n").alias("n_vectors"),
        F.col("s1").alias("n_edges"),
        F.col("dmax").alias("max_in_degree"),
        "n_hubs",
        "n_antihubs",
        F.round(
            (m3 - 3.0 * mean * m2 + 2.0 * mean * mean * mean)
            / F.nullif(F.pow(var, 1.5), F.lit(0.0)),
            4,
        ).alias("indegree_skewness"),
    )


@query(
    "mcc_confusion_scalars",
    oracle=f"""
    WITH scored AS (
      SELECT label % 2 = 0 AS y_true,
             1.0 / (1.0 + exp(-(list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               {_W_SQL}) + {ML_BIAS}))) >= {CONF_THRESHOLD} AS y_pred
      FROM embeddings
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN y_true AND y_pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN NOT y_true AND y_pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN y_true AND NOT y_pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN NOT y_true AND NOT y_pred THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / nullif(sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                               * (tn + fp) * (tn + fn)), 0), 6) AS mcc,
           round((CAST(tp AS DOUBLE) / nullif(tp + fn, 0)
                  + CAST(tn AS DOUBLE) / nullif(tn + fp, 0)) / 2, 6)
             AS balanced_accuracy,
           round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0)
                 + CAST(tn AS DOUBLE) / nullif(tn + fp, 0) - 1, 6)
             AS youden_j
    FROM cells
    """,
)
def mcc_confusion_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prevalence-robust decision-rule scalars over the SAME
    confusion cells as ``binary_classifier_confusion``: Matthews
    correlation (Matthews 1975 — the single-number summary that,
    unlike accuracy/F1, cannot be gamed by class imbalance; it is the
    phi coefficient of the 2x2 table), balanced accuracy
    (TPR+TNR)/2, and Youden's J = TPR+TNR−1 (the quantity ROC
    threshold selection maximizes — see ``roc_auc_rank`` for the
    threshold-free companion). A quality-filter model reviewed only
    on F1 looks great when positives are rare; MCC is the audit that
    catches it.

    Exactness: the four cells are exact integer sums; MCC's numerator
    tp·tn − fp·fn is integer arithmetic (double-cast only for the
    final division); every denominator is nullif-guarded for the
    degenerate all-one-class corpus.

    Scale: identical to the confusion entry — scoring fused into the
    scan projection, one partial-aggregated global sum, four longs
    per partition across the exchange. Zero joins, zero windows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(x) for x in ML_WEIGHTS])
    v = F.transform("embedding", lambda x: x.cast("double"))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(dot(v, w) + F.lit(ML_BIAS))))
    scored = e.select(
        (F.col("label") % 2 == 0).alias("y_true"),
        (p >= CONF_THRESHOLD).alias("y_pred"),
    )
    cells = scored.agg(
        F.sum((F.col("y_true") & F.col("y_pred")).cast("long")).alias("tp"),
        F.sum((~F.col("y_true") & F.col("y_pred")).cast("long")).alias("fp"),
        F.sum((F.col("y_true") & ~F.col("y_pred")).cast("long")).alias("fn"),
        F.sum((~F.col("y_true") & ~F.col("y_pred")).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    tpr = tp.cast("double") / F.nullif(tp + fn, F.lit(0))
    tnr = tn.cast("double") / F.nullif(tn + fp, F.lit(0))
    return cells.select(
        "tp", "fp", "fn", "tn",
        F.round(
            (tp.cast("double") * tn - fp.cast("double") * fn)
            / F.nullif(
                F.sqrt(
                    (tp + fp).cast("double") * (tp + fn) * (tn + fp) * (tn + fn)
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("mcc"),
        F.round((tpr + tnr) / 2, 6).alias("balanced_accuracy"),
        F.round(tpr + tnr - 1, 6).alias("youden_j"),
    )


@query(
    "pr_auc_classifier",
    oracle=f"""
    WITH v AS (
      SELECT label % 2 = 1 AS pos,
             CAST(round(1000000 * (list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)), {_W_SQL})
               + {ML_BIAS})) AS BIGINT) AS score_micro
      FROM embeddings
    ),
    g AS (
      SELECT score_micro,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY score_micro
    ),
    cum AS (
      SELECT p,
             CAST(sum(p) OVER (ORDER BY score_micro DESC) AS BIGINT) AS tp,
             CAST(sum(n) OVER (ORDER BY score_micro DESC) AS BIGINT) AS nn
      FROM g
    ),
    terms AS (
      SELECT p, tp, nn,
             CAST(round(1000000.0 * p * tp / nn) AS BIGINT) AS term_micro
      FROM cum WHERE p > 0
    ),
    tot AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
                   CAST(count(*) AS BIGINT) AS nall FROM v)
    SELECT t.np AS n_pos, t.nall - t.np AS n_neg,
           CAST(count(*) AS BIGINT) AS n_pos_thresholds,
           CAST(sum(term_micro) AS BIGINT) AS ap_sum_micro,
           round(sum(term_micro) / 1000000.0 / t.np, 6) AS average_precision
    FROM terms CROSS JOIN tot t
    GROUP BY t.np, t.nall
    """,
)
def pr_auc_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall AUC (average precision) of the in-SQL linear
    classifier — the eval that matters when positives are RARE and
    ``roc_auc_rank`` flatters (Davis & Goadrich ICML'06: a model can
    hold 0.9 ROC-AUC while its PR curve collapses): AP = (1/P)·Σ_s
    p_s·Precision(s) stepping down the distinct score thresholds,
    with each tie GROUP scored as a block at its block-end precision
    (the deterministic tie convention; sklearn's step interpolation
    restricted to distinct scores).

    Exactness: scores quantize to integer micro units before
    grouping (tie groups identical in both lanes); cumulative TP and
    N are integer window sums over the collapsed score table; each
    threshold's contribution p·TP/N quantizes to integer micro units
    BEFORE the cross-threshold reduce (no float sum), and AP is one
    division at emit.

    Scale: same shape as the ROC entry — N rows collapse to distinct
    scores, one ordered window over that bounded table, one row out.
    """
    e = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(x) for x in ML_WEIGHTS])
    v = e.select(
        (F.col("label") % 2 == 1).alias("pos"),
        F.round(
            1_000_000
            * (dot(F.col("embedding").cast("array<double>"), w) + F.lit(ML_BIAS))
        )
        .cast("long")
        .alias("score_micro"),
    )
    v = scoped_persist(v)
    g = v.groupBy("score_micro").agg(
        F.sum(F.col("pos").cast("int")).cast("long").alias("p"),
        F.count("*").cast("long").alias("n"),
    )
    w_desc = Window.orderBy(F.col("score_micro").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "p",
        F.sum("p").over(w_desc).cast("long").alias("tp"),
        F.sum("n").over(w_desc).cast("long").alias("nn"),
    )
    terms = cum.filter(F.col("p") > 0).select(
        F.round(1_000_000.0 * F.col("p") * F.col("tp") / F.col("nn"))
        .cast("long")
        .alias("term_micro"),
    )
    tot = v.agg(
        F.sum(F.col("pos").cast("int")).cast("long").alias("np"),
        F.count("*").cast("long").alias("nall"),
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .groupBy("np", "nall")
        .agg(
            F.count("*").cast("long").alias("n_pos_thresholds"),
            F.sum("term_micro").cast("long").alias("ap_sum_micro"),
            F.round(
                F.sum("term_micro") / 1_000_000.0 / F.first("np"), 6
            ).alias("average_precision"),
        )
        .select(
            F.col("np").alias("n_pos"),
            (F.col("nall") - F.col("np")).alias("n_neg"),
            "n_pos_thresholds",
            "ap_sum_micro",
            "average_precision",
        )
    )


# ---------------------------------------------------------------------------
# Round 11: the remaining classical link-prediction scores and the
# per-node clustering profile over the k-NN graph.
# ---------------------------------------------------------------------------


@query(
    "jaccard_pa_linkpred",
    oracle=f"""
    WITH edges AS ({KNN_GRAPH_ORACLE}),
    und AS (
      SELECT vec_id AS src, nbr_id AS dst FROM edges
      UNION
      SELECT nbr_id AS src, vec_id AS dst FROM edges
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src),
    cn AS (
      SELECT a.src AS u, b.src AS w, CAST(count(*) AS BIGINT) AS common_neighbors
      FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT u, w, common_neighbors,
             CAST(round(1000000.0 * common_neighbors
                        / (du.d + dw.d - common_neighbors)) AS BIGINT)
               AS jaccard_micro,
             CAST(du.d * dw.d AS BIGINT) AS pref_attach
      FROM cn JOIN deg du ON du.src = cn.u JOIN deg dw ON dw.src = cn.w
    )
    SELECT u, w, common_neighbors,
           round(jaccard_micro / 1000000.0, 6) AS jaccard,
           pref_attach
    FROM scored ANTI JOIN und ON scored.u = und.src AND scored.w = und.dst
    ORDER BY jaccard_micro DESC, pref_attach DESC, u, w
    LIMIT {LINKPRED_TOP_K}
    """,
)
def jaccard_pa_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient + preferential-attachment link prediction
    over the k-NN graph (Liben-Nowell & Kleinberg 2003's survey
    pair) — completes the classical score ladder beside
    ``graph_common_neighbors_linkpred`` (raw overlap) and
    ``adamic_adar_linkpred`` (rarity-weighted): Jaccard normalizes
    the overlap by the neighborhood UNION (penalizing hubs the way
    raw counts can't), and du·dw is the density-growth baseline every
    stronger score must beat.

    Exactness: |Γu ∪ Γw| = du + dw − cn is exact integer arithmetic;
    the Jaccard ratio quantizes ONCE to micro units and ranking
    orders on (jaccard_micro, pref_attach, u, w) — a full integer
    tie-break; pref_attach itself is an integer product that crosses
    the oracle.

    Scale: the same wedge join as the sibling entries (work Σ
    deg(n)², bucket-bounded degrees); the degree table is node-sized
    and joins twice on the pair endpoints.
    """
    from couchwarehouse_spark.plans import QUERIES

    edges = QUERIES["knn_graph_bucketed"](spark, sf_dir).select(
        "vec_id", "nbr_id"
    )
    und = (
        edges.select(F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst"))
        .union(
            edges.select(
                F.col("nbr_id").alias("src"), F.col("vec_id").alias("dst")
            )
        )
        .distinct()
    )
    und = scoped_persist(und)
    deg = und.groupBy("src").agg(F.count("*").cast("long").alias("d"))
    a = und.select(F.col("src").alias("u"), "dst")
    b = und.select(F.col("src").alias("w"), "dst")
    cn = (
        a.join(b, "dst")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count("*").cast("long").alias("common_neighbors"))
    )
    du = deg.select(F.col("src").alias("u"), F.col("d").alias("du"))
    dw = deg.select(F.col("src").alias("w"), F.col("d").alias("dw"))
    scored = (
        cn.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            "common_neighbors",
            F.round(
                1_000_000.0
                * F.col("common_neighbors")
                / (F.col("du") + F.col("dw") - F.col("common_neighbors"))
            )
            .cast("long")
            .alias("jaccard_micro"),
            (F.col("du") * F.col("dw")).cast("long").alias("pref_attach"),
        )
    )
    existing = und.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    return (
        scored.join(existing, ["u", "w"], "left_anti")
        .orderBy(
            F.col("jaccard_micro").desc(), F.col("pref_attach").desc(), "u", "w"
        )
        .limit(LINKPRED_TOP_K)
        .select(
            "u",
            "w",
            "common_neighbors",
            F.round(F.col("jaccard_micro") / 1_000_000.0, 6).alias("jaccard"),
            "pref_attach",
        )
    )


LCC_TOP_K = 20  # reported head of the per-node clustering profile


@query(
    "local_clustering_coefficient",
    oracle=f"""
    WITH edges AS ({KNN_GRAPH_ORACLE}),
    und AS (
      SELECT DISTINCT least(vec_id, nbr_id) AS a, greatest(vec_id, nbr_id) AS c
      FROM edges
    ),
    adj AS (
      SELECT a AS u, c AS v FROM und UNION ALL SELECT c AS u, a AS v FROM und
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    tri AS (
      SELECT p.u, CAST(count(*) AS BIGINT) AS t
      FROM (SELECT x.u, x.v, y.v AS w
            FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v) p
      JOIN und e ON e.a = p.v AND e.c = p.w
      GROUP BY p.u
    )
    SELECT deg.u AS node, deg.d AS degree,
           CAST(coalesce(tri.t, 0) AS BIGINT) AS n_triangles,
           round(CAST(round(2000000.0 * coalesce(tri.t, 0)
                            / (deg.d * (deg.d - 1))) AS BIGINT)
                 / 1000000.0, 6) AS lcc
    FROM deg LEFT JOIN tri ON tri.u = deg.u
    WHERE deg.d >= 2
    ORDER BY CAST(round(2000000.0 * coalesce(tri.t, 0)
                        / (deg.d * (deg.d - 1))) AS BIGINT) DESC,
             deg.d DESC, deg.u
    LIMIT {LCC_TOP_K}
    """,
)
def local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-NODE clustering coefficient over the k-NN graph (Watts &
    Strogatz 1998: lcc(u) = 2·T(u)/(d(u)·(d(u)−1)) — the local
    counterpart of ``graph_triangle_count``'s single global
    transitivity number): the profile that separates nodes sitting
    inside near-dup cliques (lcc → 1, dedup-cluster cores) from
    bridge nodes connecting communities (lcc → 0) — per-item
    evidence for cluster-aware pruning policy where the global
    coefficient only says "how cliquey on average".

    Exactness: per-node triangle counts come from the neighbor-pair
    join closed against the ordered edge set (each triangle at u
    counted once via v < w); degrees and T(u) are integers that
    cross the oracle; the coefficient quantizes once to micro units
    and the ranking orders on (lcc_micro, degree, node) — full
    integer tie-break.

    Scale: the neighbor-pair fan-out is Σ d(u)²/2 with
    bucket-bounded degrees (≤ 2·KNN_GRAPH_K here) and the closing
    join keys on the (v, w) edge — the same shape as the global
    triangle kernel, plus one node-sized left join.
    """
    edges = scoped_persist(
        knn_graph_bucketed(spark, sf_dir)
        .select(
            F.least("vec_id", "nbr_id").alias("a"),
            F.greatest("vec_id", "nbr_id").alias("c"),
        )
        .distinct()
    )
    adj = edges.select(F.col("a").alias("u"), F.col("c").alias("v")).unionByName(
        edges.select(F.col("c").alias("u"), F.col("a").alias("v"))
    )
    adj = scoped_persist(adj)
    deg = adj.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    pairs = (
        adj.join(
            adj.select(F.col("u"), F.col("v").alias("w")), "u"
        ).filter(F.col("v") < F.col("w"))
    )
    tri = (
        pairs.join(
            edges.select(F.col("a").alias("v"), F.col("c").alias("w")),
            ["v", "w"],
            "left_semi",
        )
        .groupBy("u")
        .agg(F.count("*").cast("long").alias("t"))
    )
    lcc_micro = F.round(
        2_000_000.0
        * F.coalesce(F.col("t"), F.lit(0))
        / (F.col("d") * (F.col("d") - 1))
    ).cast("long")
    return (
        deg.join(tri, "u", "left")
        .filter(F.col("d") >= 2)
        .orderBy(lcc_micro.desc(), F.col("d").desc(), "u")
        .limit(LCC_TOP_K)
        .select(
            F.col("u").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.round(lcc_micro / 1_000_000.0, 6).alias("lcc"),
        )
    )


# ---------------------------------------------------------------------------
# Round 12: graph-traversal ANN — greedy beam search over a TWO-TABLE
# bucketed k-NN graph (the NSW/HNSW-style lane the LSH/IVF pair
# doesn't cover). One LSH table's intra-bucket k-NN edges can never
# leave the bucket, so a walk seeded in the wrong bucket stalls; the
# union of TWO tables' edges (independent hyperplane sets — the
# LSH-forest idiom) cuts across each other's bucket boundaries and
# makes the graph navigable.
# ---------------------------------------------------------------------------

GS_BEAM = 12  # frontier width per expansion round (HNSW's efSearch dial)
GS_ROUNDS = 5  # fixed expansion rounds — unrolled identically in the oracle
GS_GRAPH_K = 6  # traversal-graph degree per table (HNSW's M dial) —
# denser than the reporting k-NN entry's KNN_GRAPH_K: navigability
# needs degree ~ log N, and 2 tables × 6 gives ≤ 12 out-edges/node

# Second-table hyperplanes: indices [P_MAX, 2·P_MAX) of the same LCG
# stream — disjoint from table A's planes at every derived prefix.
_ALL_PLANES_B = _hyperplanes(n=2 * P_MAX)[P_MAX:]


def _bucket_expr_sql_derived_b(vexpr: str) -> str:
    """Table-B twin of ``_bucket_expr_sql_derived``: same masked
    full-width trick, table-B plane literals."""
    full = _bucket_expr_sql(vexpr, _ALL_PLANES_B)
    return f"(({full}) & ((1 << ({_NP_SQL})) - 1))"


def _gs_oracle_ctes() -> str:
    """Shared oracle CTE block: two SRP bucket tables, the union of
    their symmetric intra-bucket k-NN edges, multiprobe entry points,
    and the GS_ROUNDS-unrolled beam search. Built programmatically so
    the SQL unroll and the Spark loop share one round count."""
    parts = [
        f"""
    WITH b AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             {_bucket_expr_sql_derived('embedding')} AS bucket,
             {_bucket_expr_sql_derived_b('embedding')} AS bucket_b
      FROM embeddings
    ),
    q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = {QUERY_VEC_ID}),
    e0 AS MATERIALIZED (
      SELECT a.vec_id AS src, b.vec_id AS nbr,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    e0b AS MATERIALIZED (
      SELECT a.vec_id AS src, b.vec_id AS nbr,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                                         b.vec_id) AS rank
      FROM b a JOIN b b ON a.bucket_b = b.bucket_b AND a.vec_id <> b.vec_id
    ),
    edges AS MATERIALIZED (
      SELECT src, nbr FROM e0 WHERE rank <= {GS_GRAPH_K}
      UNION
      SELECT nbr, src FROM e0 WHERE rank <= {GS_GRAPH_K}
      UNION
      SELECT src, nbr FROM e0b WHERE rank <= {GS_GRAPH_K}
      UNION
      SELECT nbr, src FROM e0b WHERE rank <= {GS_GRAPH_K}
    ),
    sc AS MATERIALIZED (
      SELECT b.vec_id, list_cosine_similarity(b.v, q.qv) AS c
      FROM b CROSS JOIN q
    ),
    eps AS (
      SELECT min(b.vec_id) AS vec_id
      FROM b CROSS JOIN q
      WHERE bit_count(xor(CAST(b.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= 1
        AND b.vec_id <> {QUERY_VEC_ID}
      GROUP BY b.bucket
    ),
    vis0 AS MATERIALIZED (
      SELECT sc.vec_id, sc.c, 0 AS hop
      FROM sc JOIN eps USING (vec_id)
    ),
    exp0 AS (SELECT vec_id FROM vis0 WHERE 1 = 0)"""
    ]
    for r in range(1, GS_ROUNDS + 1):
        parts.append(f""",
    f{r} AS MATERIALIZED (
      SELECT vec_id FROM vis{r - 1}
      WHERE vec_id NOT IN (SELECT vec_id FROM exp{r - 1})
      ORDER BY c DESC, vec_id LIMIT {GS_BEAM}
    ),
    exp{r} AS MATERIALIZED (SELECT vec_id FROM exp{r - 1}
               UNION SELECT vec_id FROM f{r}),
    n{r} AS MATERIALIZED (
      SELECT DISTINCT e.nbr AS vec_id
      FROM edges e JOIN f{r} f ON e.src = f.vec_id
      WHERE e.nbr NOT IN (SELECT vec_id FROM vis{r - 1})
    ),
    vis{r} AS MATERIALIZED (
      SELECT * FROM vis{r - 1}
      UNION ALL
      SELECT sc.vec_id, sc.c, {r} FROM sc JOIN n{r} USING (vec_id)
    )""")
    return "".join(parts)


GS_ORACLE = f"""
    {_gs_oracle_ctes()}
    SELECT vec_id, CAST(hop AS BIGINT) AS hop, round(c, 4) AS cos_sim
    FROM vis{GS_ROUNDS}
    WHERE vec_id <> {QUERY_VEC_ID}
    ORDER BY c DESC, vec_id
    LIMIT {TOP_K}
"""


@query("graph_greedy_search_topk", oracle=GS_ORACLE)
def graph_greedy_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy beam search over the bucketed k-NN graph (X2's
    graph-traversal ANN lane — the NSW/HNSW search kernel, Malkov &
    Yashunin 2016): multiprobe LSH seeds (min vec_id of the query
    bucket and each Hamming-1 neighbor bucket) start a best-first
    walk; each of GS_ROUNDS rounds expands the GS_BEAM best
    not-yet-expanded visited nodes along symmetric-closure k-NN
    edges, scoring only newly discovered nodes. Output = top-k of
    the visited set with first-discovery hop.

    Determinism: every frontier/answer selection orders by
    (cosine DESC, vec_id); the identical hyperplane literals,
    derived plane count, and round count are inlined in both lanes,
    so even this approximate traversal is exactly oracle-checked.

    Scale: the frontier (≤ GS_BEAM ids) keys one id-keyed lookup per
    round against the N·2k edge table (id-partitioned point lookups
    at scale); visited stays ≤ entries + GS_ROUNDS·GS_BEAM·4k rows —
    bounded by search parameters, not corpus size, which is why the
    beam BOOKKEEPING lives at the driver (the CC_DRIVER_EDGE_BOUND
    idiom; asserted against ``bound`` below) while all per-node
    cosine math stays in Catalyst over the persisted corpus; cosine
    is computed ONLY for discovered nodes (≤ beam·degree per round),
    never the corpus. Entry count is ≤ 1 + n_planes ≤ 1 + P_MAX. The
    graph build is the same bounded intra-bucket self-join as
    ``knn_graph_bucketed``, twice — an index-build cost, amortized
    over queries.
    """
    e = load_table(spark, sf_dir, "embeddings")
    np_ = len(corpus_planes(spark, sf_dir))
    v = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("bucket", _bucket_expr_spark("v", _ALL_PLANES[:np_]))
        .withColumn("bucket_b", _bucket_expr_spark("v", _ALL_PLANES_B[:np_]))
        # Norm once per vector: both kNN edge builds then pay one dot
        # per pair (cosine_n) instead of three — bit-exact.
        .withColumn("nrm", norm(F.col("v")))
    )
    v = scoped_persist(v)
    par = data_width(spark, sf_dir, "embeddings")

    def knn_edges(bcol: str) -> DataFrame:
        a = v.select(
            "vec_id", F.col("v").alias("va"), F.col("nrm").alias("na"), bcol
        ).repartition(par, bcol)
        bb = v.select(
            F.col("vec_id").alias("nbr_id"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
            bcol,
        ).repartition(par, bcol)
        w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), "nbr_id")
        return (
            a.join(bb, bcol)
            .filter(F.col("vec_id") != F.col("nbr_id"))
            .withColumn(
                "_cos", cosine_n(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= GS_GRAPH_K)
            .select(F.col("vec_id").alias("src"), F.col("nbr_id").alias("nbr"))
        )

    # localCheckpoint, not persist: the per-round plans re-embed every
    # earlier round's tree (the kcore_decomposition disease) — truncate
    # lineage per round, the standard iterative-graph discipline.
    e_dir = knn_edges("bucket").union(knn_edges("bucket_b"))
    edges = (
        e_dir.union(
            e_dir.select(F.col("nbr").alias("src"), F.col("src").alias("nbr"))
        )
        .distinct()
        .localCheckpoint()
    )
    # Beam state lives at the DRIVER (the CC_DRIVER_EDGE_BOUND idiom:
    # a lane that is provably small may collect): visited is bounded by
    # SEARCH PARAMETERS, not corpus size — ≤ (P_MAX + 1) entry points
    # plus GS_ROUNDS · GS_BEAM · 4·GS_GRAPH_K discovered neighbors
    # (1,465 rows at the current dials). The distributed-loop
    # formulation paid 2
    # localCheckpoints + a broadcast build per round (~80 Spark jobs /
    # entry, all driver round-trips over ≤ 1.5k-row frames); driver
    # state needs exactly ONE bounded job per round (candidate lookup
    # + cosine scoring, collected). The per-pair/per-node MATH is the
    # same Catalyst expressions as before (cosine_n over the persisted
    # corpus; the query vector/norm re-enter as exact double literals),
    # so every score is bit-identical and the oracle hash cannot move.
    bound = (P_MAX + 1) + GS_ROUNDS * GS_BEAM * 4 * GS_GRAPH_K
    qrow = (
        v.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("v", "bucket", "nrm")
        .first()
    )
    out_schema = (
        "vec_id bigint, hop bigint, cos_sim double"
    )
    if qrow is None:  # no query vector -> empty result, as before
        return spark.createDataFrame([], out_schema)
    qv = F.array(*[F.lit(float(x)) for x in qrow["v"]])
    qn = F.lit(float(qrow["nrm"]))
    score_col = cosine_n(F.col("v"), qv, F.col("nrm"), qn).alias("c")

    near = F.bit_count(
        F.col("bucket").cast("long").bitwiseXOR(F.lit(int(qrow["bucket"])))
    ) <= 1
    eps = (
        v.filter(near & (F.col("vec_id") != QUERY_VEC_ID))
        .groupBy("bucket")
        .agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id")
    )
    visited: dict[int, tuple[float, int]] = {
        row["vec_id"]: (row["c"], 0)
        for row in eps.join(v, "vec_id").select("vec_id", score_col).collect()
    }
    expanded: set[int] = set()
    for r in range(1, GS_ROUNDS + 1):
        unexp = [
            (vid, c) for vid, (c, _) in visited.items() if vid not in expanded
        ]
        # Same total order as the distributed orderBy(c DESC, vec_id),
        # INCLUDING Spark's NaN-greatest rule: a zero-norm vector scores
        # NaN (0/0), which Spark's descending order ranks first, while a
        # raw Python comparison with NaN is undefined under Timsort —
        # rank NaN explicitly ahead of every finite score.
        unexp.sort(
            key=lambda t: (
                not math.isnan(t[1]),
                -t[1] if not math.isnan(t[1]) else 0.0,
                t[0],
            )
        )
        frontier = [vid for vid, _ in unexp[:GS_BEAM]]
        expanded.update(frontier)
        cand_rows = (
            edges.filter(F.col("src").isin(frontier))
            .select(F.col("nbr").alias("vec_id"))
            .distinct()
            .join(v, "vec_id")
            .select("vec_id", score_col)
            .collect()
        )
        for row in cand_rows:
            # first-discovery hop wins (the old left_anti on visited)
            if row["vec_id"] not in visited:
                visited[row["vec_id"]] = (row["c"], r)
        if len(visited) > bound:
            # The parameter bound assumes out-degree ≤ GS_GRAPH_K per
            # direction, but symmetrization adds IN-degree, which a kNN
            # graph does not bound — on hub-heavy distributions a
            # frontier node can exceed 4·GS_GRAPH_K neighbors. That is
            # more driver rows than budgeted, not a wrong answer: warn,
            # don't crash an entry the distributed loop completed fine.
            warnings.warn(
                f"greedy-search visited set {len(visited)} exceeds the "
                f"parameter bound {bound} (hub-heavy kNN graph)",
                stacklevel=2,
            )
    # Re-emit the bounded visited set as a literal relation (VALUES,
    # not createDataFrame(rows): no Python-RDD scan) and keep the
    # final top-k ordering + rounding in Spark — identical
    # TakeOrderedAndProject + round(…, 4) as the distributed loop.
    # repr() doubles round-trip exactly through Double.parseDouble.
    vals = ", ".join(
        f"({vid}, {hop}, CAST('{c!r}' AS DOUBLE))"
        for vid, (c, hop) in visited.items()
        if vid != QUERY_VEC_ID
    )
    if not vals:
        return spark.createDataFrame([], out_schema)
    vis_df = spark.sql(
        f"SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(hop AS INT) AS hop,"
        f" c FROM VALUES {vals} AS t(vec_id, hop, c)"
    )
    return (
        vis_df.orderBy(F.col("c").desc(), "vec_id")
        .limit(TOP_K)
        .select(
            "vec_id",
            F.col("hop").cast("long").alias("hop"),
            F.round("c", 4).alias("cos_sim"),
        )
    )


GS_RECALL_ORACLE = f"""
    {_gs_oracle_ctes()},
    ann AS (
      SELECT vec_id FROM vis{GS_ROUNDS}
      WHERE vec_id <> {QUERY_VEC_ID}
      ORDER BY c DESC, vec_id
      LIMIT {TOP_K}
    ),
    brute AS (
      SELECT vec_id FROM sc
      WHERE vec_id <> {QUERY_VEC_ID}
      ORDER BY c DESC, vec_id
      LIMIT {TOP_K}
    )
    SELECT CAST({TOP_K} AS BIGINT) AS k,
           (SELECT CAST(count(*) AS BIGINT) FROM ann) AS n_ann,
           (SELECT CAST(count(*) AS BIGINT)
            FROM ann JOIN brute USING (vec_id)) AS n_hits,
           round((SELECT count(*) FROM ann JOIN brute USING (vec_id))
                 / {TOP_K}.0, 4) AS recall_at_k
"""


@query("greedy_search_recall_audit", oracle=GS_RECALL_ORACLE)
def greedy_search_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit for the graph-traversal lane: the greedy-search
    answer set vs the brute-force cosine top-k (the same audit
    discipline as ``ivf_recall_audit`` / ``lsh_recall_audit`` — every
    approximate lane ships with its measured recall). One row: k,
    answers returned, hits, recall.

    Scale: the search side is the bounded traversal; the brute side
    is the one-query broadcast scan + TakeOrdered heap — the audit
    runs on a sample of queries at 100 TB, not the corpus.
    """
    ann = graph_greedy_search_topk(spark, sf_dir).select("vec_id")
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = v.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    brute = (
        v.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("_cos", cosine(F.col("v"), F.col("qv")))
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id")
    )
    n_ann = ann.agg(F.count("*").cast("long").alias("n_ann"))
    n_hits = ann.join(brute, "vec_id").agg(
        F.count("*").cast("long").alias("n_hits")
    )
    return n_ann.crossJoin(F.broadcast(n_hits)).select(
        F.lit(TOP_K).cast("long").alias("k"),
        "n_ann",
        "n_hits",
        F.round(F.col("n_hits") / float(TOP_K), 4).alias("recall_at_k"),
    )
