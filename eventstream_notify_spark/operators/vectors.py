"""Similarity-search / multimodal-vector operators — SURVEY.md §2.F
(X3, X7) plus the ANN scale paths (IVF, random-hyperplane LSH) and
embedding-based near-dup the north star mandates.

Scale design:
- brute-force cosine is always (small query set) × (big corpus) with
  the query side BROADCAST — the corpus never shuffles;
- top-k per query is a window row_number over the query key, not a
  global sort;
- the IVF path turns O(Q·N) into O(Q·N/K): assign once (broadcast
  centroids), then probe only the matching cluster — the same two
  broadcast joins at any corpus size;
- LSH bucketing replaces distance joins with equi-joins on bucket
  keys — the only join shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.functions.vector import (
    cosine_sql,
    dot,
    l2_norm,
    l2_norm_sql,
    sq_norm,
)
from eventstream_notify_spark.registry import register

TOP_K = 5
QUERY_MOD = 50  # vec_id % 50 == 0 -> the query set
CENTROID_MOD = 100  # vec_id % 100 == 0 -> IVF "centroids"
IVF_NPROBE = 8  # cells probed per query (multiprobe; top-1 measured 37%
# recall@5 at sf0.1, P=4 → 71%, P=8 → the pinned ≥0.8 floor. At the
# testdata's K=N/100 cells this probes ~P/K of the corpus; production
# sizes K≈sqrt(N) so Q·P·N/K stays ~P·sqrt(N) per query.


# ---------------------------------------------------------------- X3


@register(
    "sim_search_cosine",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               ROUND({cosine_sql('q.qe', 'e.embedding')}, 6) AS score
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, score
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id
    ) <= {TOP_K}
    """,
)
def sim_search_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — brute-force top-k cosine search: broadcast the query set
    against the full corpus, score with higher-order-function dot
    products (no UDF), keep top-5 per query via windowed row_number.
    Scores rounded to 6 d.p. and tie-broken on vec_id so the ranking
    is engine-independent."""
    # norms are materialized per side BEFORE the join — each vector's
    # norm is computed once, not once per candidate pair
    e = table(spark, sf_dir, "embeddings").withColumn("nrm", l2_norm("embedding"))
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    scored = (
        e.join(q, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@register(
    "sim_search_ivf",
    extra=True,
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings WHERE vec_id % {CENTROID_MOD} = 0
    ),
    assign AS (
        SELECT e.vec_id, e.embedding, c.cid
        FROM embeddings e JOIN cent c ON TRUE
        QUALIFY row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY ROUND({cosine_sql('e.embedding', 'c.ce')}, 6) DESC, c.cid
        ) = 1
    ),
    q AS (
        SELECT e.vec_id AS query_id, e.embedding AS qe, c.cid
        FROM embeddings e JOIN cent c ON TRUE
        WHERE e.vec_id % {QUERY_MOD} = 0
        QUALIFY row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY ROUND({cosine_sql('e.embedding', 'c.ce')}, 6) DESC, c.cid
        ) <= {IVF_NPROBE}
    ),
    scored AS (
        SELECT q.query_id, a.vec_id,
               ROUND({cosine_sql('q.qe', 'a.embedding')}, 6) AS score
        FROM q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, score
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id
    ) <= {TOP_K}
    """,
)
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path — IVF-style ANN with MULTIPROBE: (1) assign every
    vector to its nearest 'centroid' (a deterministic sample here;
    k-means centroids in production) via a broadcast join + argmax;
    (2) each query probes its top-{IVF_NPROBE} nearest CELLS (not just
    its own — single-cell probing measured 37% recall@5 at sf0.1;
    boundary neighbors live in adjacent cells) and the union of cell
    members is exact-scored and top-5'd. Search cost is Q·P·N/K
    instead of Q·N, and every phase stays broadcast-equi-join shaped:
    the probe list is (Q·P) rows of (query, cell), broadcast free."""
    e = table(spark, sf_dir, "embeddings").withColumn("nrm", l2_norm("embedding"))
    cent = F.broadcast(
        e.filter(F.col("vec_id") % CENTROID_MOD == 0).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("ce"),
            F.col("nrm").alias("cnrm"),
        )
    )
    assign = (
        e.crossJoin(cent)
        .withColumn(
            "cscore",
            F.round(dot("embedding", "ce") / (F.col("nrm") * F.col("cnrm")), 6),
        )
        .groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.first("nrm").alias("nrm"),
            F.max_by(
                F.col("cid"),
                F.struct(F.col("cscore"), (-F.col("cid")).alias("nc")),
            ).alias("cid"),
        )
        .select("vec_id", "embedding", "nrm", "cid")
    )
    # multiprobe list: top-P cells per query — Q·K pair rows (tiny:
    # queries are 1/QUERY_MOD of the corpus, centroids broadcast)
    qw = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cid")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
        .crossJoin(cent)
        .withColumn(
            "cscore",
            F.round(dot("qe", "ce") / (F.col("qnrm") * F.col("cnrm")), 6),
        )
        .withColumn("qrn", F.row_number().over(qw))
        .filter(F.col("qrn") <= IVF_NPROBE)
        .select("query_id", "qe", "qnrm", F.col("cid").alias("qcid"))
    )
    scored = (
        assign.join(
            q,
            (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


def _plane_dot(j: int, emb: str = "embedding") -> F.Column:
    """Dot product of a vector column against deterministic integer
    hyperplane #j ((i*7 + j*13) % 11 - 5) — exact in both engines, so
    sign-bit signatures built from it are oracle-checkable."""
    dim_idx = F.sequence(F.lit(1), F.size(emb))
    return F.aggregate(
        F.zip_with(
            F.col(emb),
            F.transform(dim_idx, lambda i: ((i * 7 + F.lit(j * 13)) % 11 - 5)),
            lambda x, w: x.cast("double") * w.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _plane_bit(j: int, emb: str = "embedding") -> F.Column:
    return F.when(_plane_dot(j, emb) > 0, F.lit(1)).otherwise(F.lit(0))


@register(
    "ann_lsh_buckets",
    extra=True,
    oracle="""
    WITH sig AS (
        SELECT vec_id,
               list_transform(range(0, 8), j -> CASE WHEN
                   list_sum(list_transform(range(1, len(embedding) + 1),
                       i -> CAST(embedding[i] AS DOUBLE)
                            * CAST((i * 7 + j * 13) % 11 - 5 AS DOUBLE)))
                   > 0 THEN 1 ELSE 0 END) AS bits
        FROM embeddings
    )
    SELECT bits[1] * 128 + bits[2] * 64 + bits[3] * 32 + bits[4] * 16
         + bits[5] * 8 + bits[6] * 4 + bits[7] * 2 + bits[8] AS bucket,
           COUNT(*) AS n_vectors
    FROM sig
    GROUP BY 1
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #2 — random-hyperplane (SimHash) LSH bucketing:
    8 sign-bits of dot products against deterministic integer
    hyperplanes. Near-neighbors collide in buckets, turning ANN
    candidate generation into an equi-join on the bucket key. Emits
    bucket occupancy (the candidate-set size profile)."""
    e = table(spark, sf_dir, "embeddings")
    bucket = sum(
        [
            F.when(_plane_dot(j) > 0, F.lit(2 ** (7 - j))).otherwise(F.lit(0))
            for j in range(8)
        ],
        F.lit(0),
    )
    return (
        e.select(bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


KMPP_L = 4  # k-means|| oversampling factor per round
KMPP_ROUNDS = 3
_LEH_P = 2_147_483_647  # Lehmer modulus (shared with the KMV/perm ops)
_LEH_A = 48_271
_LEH_SALT = 1_000_003  # round stride into the hash stream


def _lehmer_sql(col: str, r: int) -> str:
    """Three multiply-mod rounds of the Lehmer stream on ``col`` —
    the same derandomization zx_ab_permutation_test uses, identical
    text on both engines so the sampled set is identical."""
    h = f"(({col} + {r * _LEH_SALT}) % {_LEH_P})"
    for _ in range(3):
        h = f"(({h} * {_LEH_A}) % {_LEH_P})"
    return h


def _d2_sql(a: str, b: str) -> str:
    """Squared L2 distance as a DuckDB left fold (dot_sql's twin)."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), i ->"
        f" (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )


def _kmpp_oracle() -> str:
    """Unrolled k-means|| rounds: each round's CTE chain is cost ->
    phi -> Lehmer-sampled candidates -> center union. Data-dependent
    center SETS flow between rounds as rows, so no recursion is
    needed — just KMPP_ROUNDS copies of the same three CTEs."""
    ctes = [
        """pts AS (SELECT vec_id, embedding FROM embeddings),
    c0 AS (
        SELECT vec_id, embedding, 0 AS round_added FROM pts
        WHERE vec_id = (SELECT MIN(vec_id) FROM pts)
    )"""
    ]
    for r in range(1, KMPP_ROUNDS + 1):
        d2 = _d2_sql("p.embedding", "c.embedding")
        ctes.append(
            f"""d{r} AS (
        SELECT p.vec_id, p.embedding,
               CAST(FLOOR(1000000 * MIN({d2})) AS BIGINT) AS cq
        FROM pts p, c{r - 1} c GROUP BY p.vec_id, p.embedding
    ),
    phi{r} AS (SELECT SUM(cq) AS phi FROM d{r}),
    s{r} AS (
        SELECT d.vec_id, d.embedding, {r} AS round_added
        FROM d{r} d, phi{r}
        WHERE CAST({_lehmer_sql('d.vec_id', r)} AS DOUBLE) / {_LEH_P}
              < (4.0 * d.cq) / phi
    ),
    c{r} AS (SELECT * FROM c{r - 1} UNION ALL SELECT * FROM s{r})"""
        )
    last = f"c{KMPP_ROUNDS}"
    d2a = _d2_sql("p.embedding", "c.embedding")
    return f"""
    WITH {','.join(ctes)},
    assign AS (
        SELECT p.vec_id AS pid, c.vec_id AS cid
        FROM pts p, {last} c
        QUALIFY row_number() OVER (
            PARTITION BY p.vec_id ORDER BY {d2a}, c.vec_id
        ) = 1
    )
    SELECT c.vec_id AS center_vec_id, c.round_added,
           CAST(COUNT(a.pid) AS BIGINT) AS weight
    FROM {last} c LEFT JOIN assign a ON a.cid = c.vec_id
    GROUP BY 1, 2
    """


@register("kmeans_parallel_init", extra=True, oracle=_kmpp_oracle())
def kmeans_parallel_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| initialization (Bahmani et al., VLDB 2012) — the
    distributed answer to k-means++'s inherently sequential seeding,
    and the init spark.ml's KMeans ships by default: instead of k
    passes each picking ONE center by d²-weighted sampling, run a few
    OVERSAMPLING rounds that each sample ~l points independently with
    p = l·d²(x,C)/φ, then hand the ~l·R+1 weighted candidates to a
    cheap final clustering (their weights = how many corpus points
    they'd absorb). Completes the k-means lifecycle next to
    sim_search_ivf_kmeans's Lloyd refinement: init -> iterate ->
    serve.

    Fully ORACLE-PAIRED — unusual for a sampling algorithm: the coin
    flips are a Lehmer hash of (vec_id, round) (the
    zx_ab_permutation_test derandomization), costs quantize to
    integer micro-units before the φ sum (order-independent), and the
    acceptance test compares two identically-computed doubles, so
    DuckDB re-derives the exact candidate set, per-round membership
    and weights. The oracle unrolls the rounds as CTE copies — the
    center set flows between rounds as ROWS, no recursion.

    Scale shape: per round ONE scan computing min-d² against ≤ l·r+1
    BROADCAST-LITERAL centers (folded into codegen, no join), one
    integer sum for φ (map-side combinable), and a filter whose
    survivors — expected l rows — are the only data ever collected.
    The final weighting pass is the same literal-centers argmin
    (array_min over a struct array, no shuffle) plus a ≤13-group
    count. The corpus never shuffles; driver traffic is O(l·R·dim)."""
    pts = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    first = pts.orderBy("vec_id").limit(1).collect()[0]
    centers = [
        (int(first.vec_id), [float(v) for v in first.embedding], 0)
    ]

    def d2_lit(cvals: list) -> F.Column:
        arr = F.array(*[F.lit(v).cast("double") for v in cvals])
        return F.aggregate(
            F.zip_with(
                "embedding",
                arr,
                lambda x, y: (x.cast("double") - y)
                * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    for r in range(1, KMPP_ROUNDS + 1):
        cq = (
            F.floor(
                F.lit(1_000_000.0)
                * F.least(*[d2_lit(c) for _, c, _ in centers])
                if len(centers) > 1
                else F.lit(1_000_000.0) * d2_lit(centers[0][1])
            )
        ).cast("bigint")
        costed = pts.select("vec_id", "embedding", cq.alias("cq"))
        phi = int(costed.agg(F.sum("cq")).collect()[0][0])
        if phi == 0:
            # every point IS a center (degenerate corpus): sampling
            # probability 4*cq/phi is 0/0 — the oracle's NULL arm
            # admits nobody, so skip the round instead of dividing
            continue
        h = F.expr(_lehmer_sql("vec_id", r)).cast("double")
        samp = (
            costed.filter(
                h / F.lit(float(_LEH_P))
                < (F.lit(4.0) * F.col("cq").cast("double"))
                / F.lit(float(phi))
            )
            .select("vec_id", "embedding")
            .collect()
        )
        centers += [
            (int(s.vec_id), [float(v) for v in s.embedding], r)
            for s in sorted(samp, key=lambda s: s.vec_id)
        ]
    # weights: nearest-candidate counts via a literal struct-array
    # argmin — lexicographic array_min = (min d2, then min center id)
    cand_arr = F.array(
        *[
            F.struct(
                d2_lit(c).alias("d2"),
                F.lit(cid).cast("bigint").alias("cid"),
            )
            for cid, c, _ in centers
        ]
    )
    counts = {
        int(row.cid): int(row.w)
        for row in pts.select(
            F.array_min(cand_arr).getField("cid").alias("cid")
        )
        .groupBy("cid")
        .agg(F.count("*").alias("w"))
        .collect()
    }
    rows = [
        (cid, rnd, counts.get(cid, 0)) for cid, _, rnd in centers
    ]
    return spark.createDataFrame(
        rows, "center_vec_id bigint, round_added int, weight bigint"
    )


@register("sim_search_ivf_kmeans", extra=True)  # rows-only: iterative float refinement
def sim_search_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #3 — IVF with k-means-refined centroids: start
    from the deterministic seed centroids and run Lloyd iterations as
    pure DataFrame ops (assign = inline argmax over the broadcast
    centroid array, zero shuffles; update = groupBy mean over array
    positions via posexplode), then probe as in sim_search_ivf. Each
    iteration is one broadcast + one aggregation — the standard
    distributed k-means shape; K stays driver-sized (centroids
    broadcast), N never leaves the cluster.
    Each iteration's centroid frame is localCheckpoint()ed: K rows of
    driver-sized data, so the checkpoint is cheap, and it truncates
    the lineage that would otherwise grow one broadcast-join + two
    aggregations deeper per iteration (at real iteration counts the
    plan itself becomes the bottleneck: re-analysis cost and stack
    depth scale with lineage).
    Rows-only: centroid means are iterative float refinement."""
    n_iters = 5
    # point norms are Lloyd-invariant: compute ONCE here and carry the
    # column through every assignment (they only matter for the final
    # cosine scores — argmax-per-point is norm-invariant, so assign
    # divides by the centroid norm alone)
    e = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .withColumn("nrm", l2_norm("embedding"))
    )
    cent = (
        e.filter(F.col("vec_id") % CENTROID_MOD == 0)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
        .withColumn("cn", l2_norm("ce"))
    )

    def assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
        # r13 opt (guide §2.4): pack the K-row centroid frame into ONE
        # array row and compute each point's argmax INLINE — the N×K
        # pair frame, its map-side partial agg and the groupBy(vec_id)
        # Exchange all disappear; assign is now a narrow projection
        # (zero shuffles per Lloyd iteration, was one). Same
        # left-to-right dot fold per (point, centroid), and
        # array_max over struct(score, -cid) is exactly the old
        # max_by(cid, struct(cscore, -cid)) tie-break (score desc,
        # then cid asc; -cid is unique so float ties cannot flip).
        # K stays driver-sized by design, so one array row is the
        # honest at-scale carrier too (it is what the broadcast held).
        carr = centroids.agg(
            F.collect_list(F.struct("cid", "ce", "cn")).alias("carr")
        )
        best = F.array_max(
            F.transform(
                F.col("carr"),
                lambda c: F.struct(
                    (dot("embedding", c["ce"]) / c["cn"]).alias("s"),
                    (-c["cid"]).alias("nc"),
                ),
            )
        )
        return points.crossJoin(F.broadcast(carr)).select(
            "vec_id",
            "embedding",
            "nrm",
            (-best["nc"]).cast("long").alias("cid"),
        )

    for it in range(n_iters):
        assigned = assign(e, cent)
        # new centroid = positional mean of member vectors
        cent = (
            assigned.select(
                "cid", F.posexplode("embedding").alias("pos", "x")
            )
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("ce")
            )
            .withColumn("cn", l2_norm("ce"))
        )
        # truncate lineage every THIRD iteration (and before the final
        # probe): plan depth stays bounded at three Lloyd rounds while
        # paying two eager materialization jobs for 5 iterations —
        # per-iteration checkpointing made the job count, not the
        # data, the cost (measured: {2,4} beats {1,3,4} beats every-1)
        if it % 3 == 2 or it == n_iters - 1:
            cent = cent.localCheckpoint(eager=True)

    final = assign(e, cent)
    # multiprobe: each query searches its top-IVF_NPROBE cells of the
    # refined centroid set (single-cell probing measured 40% recall@5
    # at sf0.1 — Lloyd-tightened cells make boundary spill WORSE, not
    # better, because clusters shrink around their means)
    qw = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cid")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
        .crossJoin(F.broadcast(cent))
        .withColumn("cscore", dot("qe", "ce") / F.col("cn"))
        .withColumn("qrn", F.row_number().over(qw))
        .filter(F.col("qrn") <= IVF_NPROBE)
        .select("query_id", "qe", "qnrm", F.col("cid").alias("qcid"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        final.join(
            q,
            (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")),
                6,
            ).alias("score"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= TOP_K)
        .drop("__rn")
    )


# ---------------------------------------------------------------- X7


@register(
    "multimodal_cols",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           len(e.embedding) AS dim,
           ROUND({l2_norm_sql('e.embedding')}, 6) AS l2_norm,
           ROUND(CAST(e.embedding[1] AS DOUBLE)
                 / {l2_norm_sql('e.embedding')}, 6) AS first_unit
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 — text + scalar + vector columns co-resident in one frame,
    with vector math as first-class expressions (norms, normalized
    components). The join key aligns documents with their embeddings;
    at scale both sides bucket on the id."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").alias("dim"),
        F.round(l2_norm("embedding"), 6).alias("l2_norm"),
        F.round(
            F.element_at("embedding", 1).cast("double") / l2_norm("embedding"), 6
        ).alias("first_unit"),
    )


# ------------------------------------------ embedding near-dup (X2/X3)


# Per-bucket candidate budget for the banded near-dup path: a bucket
# with more than this many members is truncated (deterministic
# hash-order sample) on the CANDIDATE side only, bounding pairs per
# bucket at probe_count x cap instead of s^2 — the knob that keeps a
# skewed bucket (one giant near-dup class) from quadratic pair growth
# at 100 TB. The probe side is never capped, so every vector still
# probes all its buckets and full coverage (everyone keeps a
# neighbor) holds as long as any of its probe buckets retains a
# true neighbor; recall effect measured in tests/test_scale_paths.py.
NN_BUCKET_CAP = 256

# Adaptive band width: bits per band sized so the EXPECTED bucket
# occupancy stays ~NN_TARGET_BUCKET as the corpus grows — fixed-width
# banding collapses at scale (measured at 10x sf0.1: buckets grew to
# ~500 members, the cap then dropped true neighbors from every probe
# bucket and same-NN recall fell 0.998 -> 0.59). Production LSH sizes
# hash widths with log N for exactly this reason.
NN_TARGET_BUCKET = 64
NN_BANDS = 4
NN_MIN_BITS, NN_MAX_BITS = 2, 8
# Double-flip probe budget: pairwise flips are probed only among the
# NN_PROBE_DOUBLES lowest-|margin| bits (margin-pruned multiprobe, Lv
# et al.), keeping the quadratic probe tier constant in band width.
NN_PROBE_DOUBLES = 4


def _embedding_nn(
    spark: SparkSession,
    sf_dir: str,
    banded: bool,
    bucket_cap: int | None = NN_BUCKET_CAP,
) -> DataFrame:
    """Shared kernel for the embedding-cosine near-dup pair: candidate
    generation (label-blocked exact, or banded-LSH with multiprobe),
    then exact rescoring and a windowed per-vector top-1. Both
    registered variants are this one plan with different candidate
    stages — the scoring/rank tail is literally shared.

    Banded path: candidates must share (label, band_idx, band_key) —
    NN_BANDS bands × ADAPTIVE hyperplane sign-bits (deterministic
    integer planes shared with ``ann_lsh_buckets``; bits per band
    sized from one scalar profiling action so expected bucket
    occupancy stays ~NN_TARGET_BUCKET as the corpus densifies —
    fixed 2-bit bands measured a 0.998→0.59 same-NN collapse at 10x
    sf0.1 once buckets outgrew the cap). Each vector probes its own
    band key, every single-bit flip, and the pairwise flips of its
    NN_PROBE_DOUBLES lowest-|margin| bits (margin-pruned multiprobe,
    Lv et al. 2007): a disagreement bit is precisely one where the
    vector sits close to the plane, so low-margin flips are the
    highest-probability neighbor buckets, and the quadratic probe
    tier stays constant in band width. Measured at the 10x-sf0.1
    decade (20k vectors, bits=5): same-NN 0.918 / close-score 0.994
    vs full Hamming-≤2's 0.940 at 1.5x the time — which is exactly
    why the EXACT variant keeps the coarser label blocking: sign-bit
    banding on unstructured embeddings cannot certify coverage of the
    last few %, and no probe union short of the full block closes it.
    At 100 TB (real near-dups, cosine ≫ 0), the residual vanishes
    exponentially in agreed bits and the multiprobe path is the one
    that survives: its join key splits label blocks per band
    and shuffles only (vec_id, label, band) id-rows, never vectors."""
    e = table(spark, sf_dir, "embeddings").withColumn("nrm", l2_norm("embedding"))
    if not banded:
        # The label block join broadcasts the small build side, so the
        # probe side's task count IS the pair-expansion parallelism —
        # and a compact parquet corpus arrives as ONE input split,
        # serializing the whole quadratic block expansion onto one
        # core (measured: 26 min single-threaded at 10x sf0.1).
        # Repartition the probe side by vec_id first: one narrow
        # vector-sized shuffle buys executor-bound parallelism for the
        # O(block²) cosine folds that dominate this operator.
        par = spark.sparkContext.defaultParallelism
        a = e.repartition(par, "vec_id").alias("a")
        b = e.alias("b")
        pairs = a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nn_vec_id"),
            F.col("a.label").alias("label"),
            F.round(
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("score"),
        )
    else:
        # ---- adaptive band width: one scalar profiling action (the
        # dedup_near precedent) sizes bits so expected bucket occupancy
        # stays ~NN_TARGET_BUCKET — the signature gets FINER as the
        # corpus gets denser, which is what keeps the bucket cap a
        # safety valve instead of a recall killer (see NN_TARGET_BUCKET
        # note; measured 0.998 -> 0.59 collapse with fixed 2-bit bands
        # at 10x sf0.1).
        import math

        # Same single-input-split lesson as the exact branch: a
        # compact parquet corpus is ONE split, and everything narrow
        # downstream (the per-band plane-dot folds, the probe
        # explosion) would serialize onto one core without this.
        e = e.repartition(spark.sparkContext.defaultParallelism, "vec_id")

        prof = e.agg(
            F.count("*").alias("n"),
            F.countDistinct("label").alias("nl"),
        ).first()
        bits = min(
            NN_MAX_BITS,
            max(
                NN_MIN_BITS,
                math.ceil(
                    math.log2(
                        max(prof.n / max(prof.nl, 1) / NN_TARGET_BUCKET, 1.0)
                    )
                ),
            ),
        )
        # NOTE on centering: hashing the residual x − centroid(label)
        # balances buckets perfectly but DESTROYS similarity
        # preservation in the raw space (residual directions of true
        # NN pairs are weakly correlated in 64-d: measured same-NN
        # fell 0.77 → 0.68 at 10x). Buckets are therefore balanced by
        # adaptive WIDTH and compensated by MARGIN-AWARE multiprobe
        # instead (below).
        #
        # The probe set is the Lv et al. multi-probe refinement — a
        # true neighbor disagrees exactly on the bits where THIS
        # vector sits closest to the hyperplane, so probing flips of
        # the lowest-|margin| bits buys most of full-Hamming recall at
        # a probe count CONSTANT in band width (full Hamming-<=2 is
        # quadratic: 37 probes/band at 8 bits).
        #
        # Evaluation-count trap (measured +27 s at the 10x decade):
        # the plane dots are interpreted higher-order folds with no
        # common-subexpression elimination, so any expression tree
        # referencing a dot twice evaluates the 64-dim fold twice.
        # The posexplode generator below is the materialization
        # barrier: its input (all bands' dot arrays) is evaluated
        # ONCE per row, and `darr` is then a physical attribute, so
        # the key/rank/mask derivations are cheap element accesses.
        per_band = e.select(
            "vec_id",
            "label",
            F.posexplode(
                F.array(
                    *[
                        F.array(
                            *[_plane_dot(bits * b + j) for j in range(bits)]
                        )
                        for b in range(NN_BANDS)
                    ]
                )
            ).alias("band_idx", "darr"),
        )
        key = sum(
            F.when(F.col("darr")[j] > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits)
        )
        ranked = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(F.col("darr")[j]).alias("m"),
                        F.lit(1 << j).alias("k"),
                    )
                    for j in range(bits)
                ]
            )
        )
        nflip = min(NN_PROBE_DOUBLES, bits)
        low = [ranked[i]["k"] for i in range(nflip)]
        masks = [F.lit(0)]
        # all single-bit flips (the per-band Hamming-1 guarantee —
        # linear in band width) ...
        masks += [F.lit(1 << j) for j in range(bits)]
        # ... plus doubles restricted to the lowest-margin bits (the
        # quadratic tier, margin-pruned to a constant)
        masks += [
            low[i].bitwiseOR(low[j])
            for i in range(nflip)
            for j in range(i + 1, nflip)
        ]
        # candidate generation shuffles ONLY (vec_id, label, band) —
        # ids, never vectors; a pair colliding in several bands dedups
        # while rows are still narrow, and only surviving pairs pay the
        # dim-length cosine fold after re-attaching embeddings
        sig_all = per_band.select(
            "vec_id",
            "label",
            "band_idx",
            key.alias("band_key"),
            F.array(*masks).alias("masks"),
        )
        sig_full = sig_all.select("vec_id", "label", "band_idx", "band_key")
        sig = sig_full
        if bucket_cap is not None:
            # pair budget: cap CANDIDATE-side bucket membership at
            # bucket_cap in deterministic hash order (a pseudo-random,
            # input-stable sample — not lowest-id, which would bias
            # which vectors are ever findable). Narrow id rows only.
            # The PROBE side below stays uncapped: every vector still
            # probes all of its buckets, so full coverage only needs
            # one probe bucket to retain a true neighbor.
            wb = Window.partitionBy("label", "band_idx", "band_key").orderBy(
                F.xxhash64("vec_id"), F.col("vec_id")
            )
            sig = (
                sig_full.withColumn("__bn", F.row_number().over(wb))
                .filter(F.col("__bn") <= bucket_cap)
                .drop("__bn")
            )
        # multiprobe side: own key ∪ the margin-ranked flip keys. The
        # expansion is one-sided and asymmetric-by-margin: probe(a)
        # hits own(b) when the key diff is within a's flip set, and a
        # disagreement bit is precisely a bit where a sits close to
        # the plane — so a's lowest-margin flips are the highest-
        # probability buckets for a's true neighbors. Probes reuse the
        # same buckets, so candidate volume is bounded by probe count
        # x capped bucket size, never corpus size.
        probe = sig_all.select(
            "vec_id",
            "label",
            "band_idx",
            F.explode(
                F.transform(
                    "masks",
                    lambda m: F.col("band_key").bitwiseXOR(m),
                )
            ).alias("band_key"),
        )
        a, b = probe.alias("a"), sig.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.label") == F.col("b.label"))
                & (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.vec_id") != F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_id"),
                F.col("b.vec_id").alias("nn_vec_id"),
                F.col("a.label").alias("label"),
            )
            .dropDuplicates(["vec_id", "nn_vec_id"])
        )
        ea = e.select(
            F.col("vec_id").alias("__aid"),
            F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"),
        )
        eb = e.select(
            F.col("vec_id").alias("__bid"),
            F.col("embedding").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        pairs = (
            cand.join(ea, F.col("vec_id") == F.col("__aid"))
            .join(eb, F.col("nn_vec_id") == F.col("__bid"))
            .select(
                "vec_id",
                "nn_vec_id",
                "label",
                F.round(
                    dot("ea", "eb") / (F.col("na") * F.col("nb")), 6
                ).alias("score"),
            )
        )
    w = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), F.col("nn_vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_near_embedding",
    extra=True,
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id, b.vec_id AS nn_vec_id, a.label,
               ROUND({cosine_sql('a.embedding', 'b.embedding')}, 6) AS score
        FROM embeddings a
        JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, nn_vec_id, label, score
    FROM pairs
    QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY score DESC, nn_vec_id
    ) = 1
    """,
)
def dedup_near_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, exact: nearest same-label neighbor
    per vector. The label is the blocking key, so candidate pairs are
    generated inside blocks only — never a global cross join. Exact
    because every same-label pair is considered; see ``_embedding_nn``
    for why the finer banded key cannot keep this oracle green on
    unstructured embeddings (measured 3/500 residual)."""
    return _embedding_nn(spark, sf_dir, banded=False)


@register(
    "dedup_near_embedding_lsh", extra=True
)  # rows-only: banded-LSH recall is approximate by design
def dedup_near_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, the 100 TB blocking: (label, band_idx,
    band_key) equi-join with DENSITY-ADAPTIVE band width and
    margin-pruned multiprobe (all single flips + lowest-margin double
    flips). Measured same-NN recall vs the exact sibling: 1.00 at
    sf0.1, 0.918 at the 10x decade (close-score 0.994; the fixed-width
    variant collapsed to 0.59 there). Same plan tail as the exact
    sibling (``_embedding_nn``). Rows-only: recall vs the exact
    sibling is pinned by tests instead of an oracle."""
    return _embedding_nn(spark, sf_dir, banded=True)


@register(
    "embedding_outliers",
    extra=True,
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                   AS eq
        FROM embeddings
    ),
    pos AS (
        SELECT label, u.i AS pos, u.x
        FROM q, LATERAL (
            SELECT UNNEST(eq) AS x,
                   UNNEST(range(1, len(eq) + 1)) AS i
        ) u
    ),
    cent AS (
        SELECT label,
               list(mean ORDER BY pos) AS c
        FROM (
            SELECT label, pos,
                   CAST(SUM(x) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean
            FROM pos GROUP BY label, pos
        )
        GROUP BY label
    )
    SELECT vec_id, label, dist
    FROM (
        SELECT q.vec_id, q.label,
               list_sum(list_transform(range(1, len(q.eq) + 1),
                   i -> (CAST(q.eq[i] AS DOUBLE) / 1000000.0 - cent.c[i])
                        * (CAST(q.eq[i] AS DOUBLE) / 1000000.0 - cent.c[i])))
                   AS dist
        FROM q JOIN cent ON cent.label = q.label
    )
    QUALIFY row_number() OVER (
        PARTITION BY label ORDER BY dist DESC, vec_id
    ) <= 5
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-based data cleaning — per-label centroid distance as
    an outlier score, top-5 farthest vectors per label (the 'drop the
    weird embeddings before training' pass). Cross-engine EXACT by
    construction: embeddings are floor-quantized to 1e-6 (floor is
    tie-free, unlike round), centroid means are exactly-rounded
    divisions of exact integer sums, and the squared-distance
    reduction is an ORDERED sequential fold (zip_with + aggregate ↔
    list_transform + list_sum) — never a groupBy sum of doubles,
    whose partition order would break the hash. Scale shape: one
    posexplode aggregation for centroids (map-side combinable), then
    a broadcast of the K×dim centroid table back onto the corpus —
    the corpus shuffles zero times."""
    e = table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1_000_000).cast("bigint"),
        ).alias("eq"),
    )
    cent = (
        q.select("label", F.posexplode("eq").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg((F.sum("x").cast("double") / F.count("*") / 1e6).alias("mean"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                lambda s: s["mean"],
            ).alias("c")
        )
    )
    diff = F.zip_with(
        F.col("eq"),
        F.col("c"),
        lambda x, c: (x.cast("double") / 1e6 - c) * (x.cast("double") / 1e6 - c),
    )
    scored = q.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.aggregate(diff, F.lit(0.0), lambda a, v: a + v).alias("dist"),
    )
    w = Window.partitionBy("label").orderBy(F.col("dist").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


PR_MICRO = 10**12  # integer micro-units for precision@k terms


@register(
    "eval_pr_auc",
    extra=True,
    oracle=f"""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                   AS eq
        FROM embeddings
    ),
    pos AS (
        SELECT label, u.i AS pos, u.x
        FROM q, LATERAL (
            SELECT UNNEST(eq) AS x,
                   UNNEST(range(1, len(eq) + 1)) AS i
        ) u
    ),
    cent AS (
        SELECT label AS cls, list(mean ORDER BY pos) AS c
        FROM (
            SELECT label, pos,
                   CAST(SUM(x) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean
            FROM pos GROUP BY label, pos
        )
        GROUP BY label
    ),
    scored AS (
        SELECT q.vec_id, cent.cls,
               CASE WHEN q.label = cent.cls THEN 1 ELSE 0 END AS is_pos,
               list_sum(list_transform(range(1, len(q.eq) + 1),
                   i -> (CAST(q.eq[i] AS DOUBLE) / 1000000.0 - cent.c[i])
                        * (CAST(q.eq[i] AS DOUBLE) / 1000000.0
                           - cent.c[i]))) AS dist
        FROM q CROSS JOIN cent
    ),
    ranked AS (
        SELECT cls, is_pos,
               ROW_NUMBER() OVER (PARTITION BY cls
                   ORDER BY dist, vec_id) AS k,
               SUM(is_pos) OVER (PARTITION BY cls
                   ORDER BY dist, vec_id
                   ROWS UNBOUNDED PRECEDING) AS cum_pos
        FROM scored
    )
    SELECT cls, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(is_pos) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN is_pos = 1
                    THEN (cum_pos * {PR_MICRO}) // k
                    ELSE 0 END) AS BIGINT) AS ap_micro,
           CAST(SUM(CASE WHEN is_pos = 1
                    THEN (cum_pos * {PR_MICRO}) // k
                    ELSE 0 END) AS DOUBLE) / {PR_MICRO}.0
               / CAST(SUM(is_pos) AS DOUBLE) AS avg_precision
    FROM ranked GROUP BY cls
    """,
)
def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRECISION-RECALL EVAL (average precision, one-vs-rest per
    label) for the nearest-centroid retrieval surface: every vector
    is scored against every class centroid (exact integer-moment
    centroids, the embedding_outliers discipline), ranked by distance
    per class, and AP = mean of precision@k over the positive ranks.
    AP's float sum over positives is the classic order trap, so each
    precision@k term is an INTEGER (cum_pos * 1e12 div k) — integer
    sums are order-free under any partitioning, and the final AP
    double is one division chain on exact integers. Complements
    zx_eval_auc_roc (threshold-free ranking quality) with the metric
    that actually matters under class imbalance.

    Scale: the N x K score frame comes from a broadcast of K
    centroids (corpus never shuffles for scoring); the per-class
    ranking is a window over the eval sample — eval sets are
    sample-scale by construction, never the 100 TB corpus."""
    e = table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1_000_000).cast("bigint"),
        ).alias("eq"),
    )
    cent = (
        q.select("label", F.posexplode("eq").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg((F.sum("x").cast("double") / F.count("*") / 1e6).alias("mean"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                lambda s: s["mean"],
            ).alias("c")
        )
        .select(F.col("label").alias("cls"), "c")
    )
    diff = F.zip_with(
        F.col("eq"),
        F.col("c"),
        lambda x, c: (x.cast("double") / 1e6 - c) * (x.cast("double") / 1e6 - c),
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cls",
        (F.col("label") == F.col("cls")).cast("int").alias("is_pos"),
        F.aggregate(diff, F.lit(0.0), lambda a, v: a + v).alias("dist"),
    )
    w = Window.partitionBy("cls").orderBy("dist", "vec_id")
    ranked = scored.select(
        "cls",
        "is_pos",
        F.row_number().over(w).alias("k"),
        F.sum("is_pos")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_pos"),
    )
    term = F.when(
        F.col("is_pos") == 1,
        F.expr(f"(cum_pos * {PR_MICRO}L) div k"),
    ).otherwise(F.lit(0))
    return ranked.groupBy("cls").agg(
        F.count("*").alias("n"),
        F.sum("is_pos").cast("bigint").alias("n_pos"),
        F.sum(term).cast("bigint").alias("ap_micro"),
        (
            F.sum(term).cast("double")
            / float(PR_MICRO)
            / F.sum("is_pos").cast("double")
        ).alias("avg_precision"),
    )


@register(
    "sim_search_sq8",
    extra=True,
    oracle=f"""
    WITH dims AS (
        SELECT i AS d,
               CAST(MIN(x) AS DOUBLE) AS mn, CAST(MAX(x) AS DOUBLE) AS mx
        FROM (
            SELECT UNNEST(embedding) AS x,
                   UNNEST(range(1, len(embedding) + 1)) AS i
            FROM embeddings
        )
        GROUP BY 1
    ),
    rng AS (
        SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
        FROM dims
    ),
    eq AS (
        SELECT vec_id,
               list_transform(range(1, len(embedding) + 1), i ->
                   coalesce(
                       r.mns[i]
                       + FLOOR(LEAST(GREATEST(
                             (CAST(embedding[i] AS DOUBLE) - r.mns[i])
                             / nullif(r.mxs[i] - r.mns[i],
                                      CAST(0.0 AS DOUBLE)),
                             CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))
                           * 255 + CAST(0.5 AS DOUBLE))
                         * (r.mxs[i] - r.mns[i]) / 255,
                       r.mns[i])) AS dq
        FROM embeddings, rng r
    ),
    q AS (
        SELECT vec_id AS query_id, dq AS qdq FROM eq
        WHERE vec_id % {QUERY_MOD} = 0
    )
    SELECT q.query_id, e.vec_id,
           ROUND({cosine_sql('q.qdq', 'e.dq')}, 6) AS score
    FROM q JOIN eq e ON e.vec_id <> q.query_id
    QUALIFY row_number() OVER (
        PARTITION BY q.query_id ORDER BY score DESC, e.vec_id
    ) <= {TOP_K}
    """,
)
def sim_search_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain similarity search — scalar quantization
    (SQ8): each float32 dimension compresses to one byte against
    per-dimension [min, max] ranges, and the top-k cosine search runs
    entirely on the DEQUANTIZED 8-bit codes. The memory story of a
    100 TB vector corpus: 4x smaller residency with ~1e-2 score
    error; the IVF/LSH siblings cut candidates, this cuts bytes per
    candidate — production ANN stacks (FAISS SQ/PQ) compose both.

    Shape: per-dimension ranges are ONE posexplode + groupBy(dim)
    (64 rows out), folded back in as a broadcast 1-row frame of
    dim-indexed arrays — no driver collect; quantize + dequantize are
    higher-order transforms (JVM-side, no UDF); then the standard
    broadcast-queries top-k. Recall vs the exact search is pinned in
    tests AND (r9) the quantized search itself is ORACLE-PAIRED: with
    explicit-double dequantize and floor(x+0.5) rounding, DuckDB
    replays codes, reconstructions, and the top-k bit-for-bit."""
    e = table(spark, sf_dir, "embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min("x").cast("double").alias("mn"),
            F.max("x").cast("double").alias("mx"),
        )
    )
    ranges = F.broadcast(
        dims.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct("d", "mn", "mx"))
            ).alias("rng")
        ).select(
            F.transform("rng", lambda r: r["mn"]).alias("mns"),
            F.transform("rng", lambda r: r["mx"]).alias("mxs"),
        )
    )
    # quantize to uint8 codes, dequantize back — both as one fused
    # expression; scale guards the mx == mn degenerate dimension.
    # Every step is EXPLICIT double arithmetic and the rounding is
    # floor(x + 0.5) — engine-neutral, which is what flipped this op
    # from rows-only to oracle-paired in r9 (Spark's round() and
    # DuckDB's disagree at binary-vs-shortest-repr midpoints; float
    # intermediates would diverge from DuckDB's double lists)
    deq = F.expr(
        "transform(embedding, (x, i) -> coalesce("
        " element_at(mns, i + 1) +"
        " floor(least(greatest((CAST(x AS DOUBLE) - element_at(mns, i + 1)) /"
        "   nullif(element_at(mxs, i + 1) - element_at(mns, i + 1),"
        "          CAST(0.0 AS DOUBLE)),"
        "   CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) * 255"
        "   + CAST(0.5 AS DOUBLE))"
        " * (element_at(mxs, i + 1) - element_at(mns, i + 1)) / 255,"
        " element_at(mns, i + 1)))"  # mx == mn: the dim is a constant
    )
    eq = (
        e.crossJoin(ranges)
        .select("vec_id", deq.alias("dq"))
        .withColumn("nrm", l2_norm("dq"))
    )
    q = F.broadcast(
        eq.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("dq").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    scored = eq.join(q, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        F.round(
            dot("qe", "dq") / (F.col("qnrm") * F.col("nrm")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


BQ_SHORTLIST_MIN = 50  # shortlist floor ahead of the exact re-rank
BQ_SHORTLIST_CAP = 1000  # ~10% of corpus between floor and cap — the
# same corpus-scaled depth rule the PQ ADC shortlist settled on after
# a FIXED 50 dropped recall 0.84 -> 0.62 at 10x corpus (here a fixed
# 50 measured 0.78 at sf0.01 but 0.445 at sf0.1; 1-bit codes rank
# coarsely, so coverage must track N until the absolute cap)
BQ_PRECUT = 4  # Hamming pre-cut width multiplier: the popcount tier
# keeps the bulk Q x N pass in integer ALU and admits PRECUT x depth
# candidates; only those pay the 64-term asymmetric fold. r8 measured
# symmetric-Hamming-only shortlists at 0.76 recall@5 (floor-hugging):
# 1-bit symmetric distance double-quantizes — the query's own
# quantization error stacks on the corpus's. Scoring the RAW query
# against per-dim bit representatives (asymmetric distance, the
# FAISS/SQ convention) removes the query-side error for free at
# search time; only the refine tier pays float math.
BQ_WORD = 32  # bits packed per code word — shifts stay < 32, so the
# packed BIGINT words never touch the sign bit and shift/xor/popcount
# semantics are identical across engines (no overflow edge anywhere)


@register(
    "sim_search_bq",
    extra=True,
    oracle=f"""
    WITH dims AS (
        SELECT i AS d,
               CAST(MIN(x) AS DOUBLE) AS mn, CAST(MAX(x) AS DOUBLE) AS mx
        FROM (
            SELECT UNNEST(embedding) AS x,
                   UNNEST(range(1, len(embedding) + 1)) AS i
            FROM embeddings
        )
        GROUP BY 1
    ),
    reps AS (
        SELECT list((mn + (mn + mx) / 2) / 2 ORDER BY d) AS los,
               list(((mn + mx) / 2 + mx) / 2 ORDER BY d) AS his
        FROM dims
    ),
    codes AS (
        SELECT vec_id, list(word ORDER BY w) AS words FROM (
            SELECT vec_id, (i - 1) // {BQ_WORD} AS w,
                   CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > t
                        THEN CAST(1 AS BIGINT) << ((i - 1) % {BQ_WORD})
                        ELSE 0 END) AS BIGINT) AS word
            FROM (
                SELECT vec_id, UNNEST(embedding) AS x,
                       UNNEST(range(1, len(embedding) + 1)) AS i
                FROM embeddings
            )
            JOIN (SELECT d, (mn + mx) / 2 AS t FROM dims) thr ON thr.d = i
            GROUP BY 1, 2
        )
        GROUP BY 1
    ),
    ham AS (
        SELECT qb.vec_id AS query_id, cb.vec_id AS vec_id,
               cb.words AS cwords,
               CAST(list_sum(list_transform(range(1, len(qb.words) + 1),
                   i -> bit_count(xor(qb.words[i], cb.words[i]))))
                   AS BIGINT) AS hamming
        FROM codes qb
        JOIN codes cb ON cb.vec_id <> qb.vec_id
        WHERE qb.vec_id % {QUERY_MOD} = 0
    ),
    pre AS (
        SELECT query_id, vec_id, cwords, hamming FROM ham
        QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY hamming, vec_id
        ) <= {BQ_PRECUT} * LEAST({BQ_SHORTLIST_CAP},
                 GREATEST({BQ_SHORTLIST_MIN},
                 (SELECT COUNT(*) FROM embeddings) / 10))
    ),
    refine AS (
        SELECT p.query_id, p.vec_id, p.hamming,
               ROUND(list_sum(list_transform(
                   range(1, len(qv.embedding) + 1),
                   i -> CAST(qv.embedding[i] AS DOUBLE) *
                        (CASE WHEN ((p.cwords[(i - 1) // {BQ_WORD} + 1]
                                     >> ((i - 1) % {BQ_WORD})) & 1) = 1
                              THEN r.his[i] ELSE r.los[i] END))), 6)
                   AS asym
        FROM pre p
        JOIN embeddings qv ON qv.vec_id = p.query_id
        CROSS JOIN reps r
    ),
    short AS (
        SELECT query_id, vec_id, hamming FROM refine
        QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY asym DESC, vec_id
        ) <= LEAST({BQ_SHORTLIST_CAP}, GREATEST({BQ_SHORTLIST_MIN},
                 (SELECT COUNT(*) FROM embeddings) / 10))
    )
    SELECT s.query_id, s.vec_id, s.hamming,
           ROUND({cosine_sql('qv.embedding', 'cv.embedding')}, 6) AS score
    FROM short s
    JOIN embeddings qv ON qv.vec_id = s.query_id
    JOIN embeddings cv ON cv.vec_id = s.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY s.query_id ORDER BY score DESC, s.vec_id
    ) <= {TOP_K}
    """,
)
def sim_search_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization similarity search — the 1-bit-per-dimension
    compression tier below SQ8 (32x smaller residency; the default
    coarse tier in modern vector stores): each dimension becomes the
    sign bit against its corpus midrange (min+max)/2, 32 bits pack
    into one BIGINT word, and candidate generation is XOR + popcount
    over 2 words per 64-dim vector. THREE-TIER search: (1) the bulk
    Q x N pass is pure-integer Hamming, admitting BQ_PRECUT x depth
    candidates; (2) an ASYMMETRIC refine scores the raw query against
    each survivor's per-dim bit representatives (side midpoints from
    MIN/MAX — the FAISS ADC convention applied to 1-bit codes;
    symmetric Hamming alone stacked the query's own quantization
    error on the corpus's and hugged its 0.7 recall floor at 0.76)
    and keeps the corpus-scaled depth (~10% of N between 50 and
    1000, sized in-plan like PQ's); (3) exact-cosine re-rank restores
    precision. Codes table stays 4x smaller than PQ's; float math
    touches only PRECUT x depth rows per query before the re-rank.

    Fully ORACLE-PAIRED, unlike the SQ8/PQ siblings: the midrange
    threshold is one IEEE double op on order-independent MIN/MAX (no
    float-sum drift), bits/packing/Hamming are integers, and the
    re-rank reuses sim_search_cosine's bit-reproducible fold — so the
    whole ANN pipeline, shortlist cut included, hash-matches DuckDB.

    Scale shape: thresholds are a 64-row groupBy folded back as one
    broadcast array (same pattern as SQ8's ranges); codes build in one
    scan with higher-order transforms (no UDF); the Q x N Hamming pass
    broadcasts only the query CODES (2 bigints each), never raw
    vectors; the re-rank joins the (Q x shortlist)-row frame back to
    the corpus as a broadcast equi-join. The corpus never shuffles."""
    e = table(spark, sf_dir, "embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min("x").cast("double").alias("mn"),
            F.max("x").cast("double").alias("mx"),
        )
        .select("d", "mn", "mx", ((F.col("mn") + F.col("mx")) / 2).alias("t"))
        .select(
            "d",
            "t",
            # per-dim bit representatives for the asymmetric refine:
            # side midpoints, derived from the same order-independent
            # MIN/MAX as the threshold (no float-sum drift anywhere)
            ((F.col("mn") + F.col("t")) / 2).alias("lo"),
            ((F.col("t") + F.col("mx")) / 2).alias("hi"),
        )
    )
    # one broadcast row carrying all three per-dim arrays; lazily
    # checkpointed so the codes build AND the asym refine share one
    # materialization of the dim-stats subtree
    arrs = (
        dims.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("d", "t", "lo", "hi"))
            ).alias("a")
        )
        .select(
            F.transform("a", lambda r: r["t"]).alias("thrs"),
            F.transform("a", lambda r: r["lo"]).alias("los"),
            F.transform("a", lambda r: r["hi"]).alias("his"),
        )
        .localCheckpoint(eager=False)
    )
    thrs = F.broadcast(arrs.select("thrs"))
    bitvals = F.expr(
        "transform(embedding, (x, i) ->"
        " IF(CAST(x AS DOUBLE) > element_at(thrs, i + 1),"
        f" shiftleft(CAST(1 AS BIGINT), i % {BQ_WORD}), CAST(0 AS BIGINT)))"
    )
    words = F.expr(
        f"transform(sequence(0, (size(bv) - 1) div {BQ_WORD}),"
        f" w -> aggregate(slice(bv, w * {BQ_WORD} + 1, {BQ_WORD}),"
        " CAST(0 AS BIGINT), (a, b) -> a | b))"
    )
    # lazy checkpoint: the query-side broadcast and the probe side both
    # consume the codes; without the barrier the threshold aggregation
    # subtree plans twice (2 extra Exchanges). Codes are 2 bigints per
    # vector — the cheapest possible thing to materialize.
    coded = (
        e.crossJoin(thrs)
        .select("vec_id", bitvals.alias("bv"))
        .select("vec_id", words.alias("words"))
        .localCheckpoint(eager=False)
    )
    qc = F.broadcast(
        coded.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"), F.col("words").alias("qw")
        )
    )
    ham = coded.join(qc, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        "words",
        F.expr(
            "aggregate(zip_with(qw, words, (a, b) -> bit_count(a ^ b)),"
            " 0, (acc, v) -> acc + v)"
        )
        .cast("bigint")
        .alias("hamming"),
    )
    depth = F.least(
        F.lit(BQ_SHORTLIST_CAP),
        F.greatest(F.lit(BQ_SHORTLIST_MIN), F.col("__n") / 10),
    )
    wsh = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    nrow = e.agg(F.count("*").alias("__n"))
    pre = (
        ham.withColumn("rn", F.row_number().over(wsh))
        .crossJoin(F.broadcast(nrow))
        .filter(F.col("rn") <= F.lit(BQ_PRECUT) * depth)
        .select("query_id", "vec_id", "words", "hamming", "__n")
    )
    # asymmetric refine: the RAW query against each candidate's bit
    # representatives — only PRECUT x depth candidates per query pay
    # this 64-term fold; the bulk Q x N pass above stayed XOR+popcount
    qraw = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
        )
    )
    asym_expr = F.expr(
        "aggregate(transform(qe, (x, i) -> CAST(x AS DOUBLE) *"
        f" IF(((shiftright(element_at(words, CAST(i div {BQ_WORD} AS INT) + 1),"
        f" i % {BQ_WORD})) & 1) = 1,"
        " element_at(his, i + 1), element_at(los, i + 1))),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    wsa = Window.partitionBy("query_id").orderBy(
        F.col("asym").desc(), "vec_id"
    )
    short = (
        pre.join(qraw, "query_id")
        .crossJoin(F.broadcast(arrs.select("los", "his")))
        .withColumn("asym", F.round(asym_expr, 6))
        .withColumn("rn", F.row_number().over(wsa))
        .filter(F.col("rn") <= depth)
        .select("query_id", "vec_id", "hamming")
    )
    en = e.withColumn("nrm", l2_norm("embedding"))
    qe = F.broadcast(
        en.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qemb"),
            F.col("nrm").alias("qnrm"),
        )
    )
    rer = (
        en.join(F.broadcast(short), "vec_id")
        .join(qe, "query_id")
        .select(
            "query_id",
            "vec_id",
            "hamming",
            F.round(
                dot("qemb", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("score"),
        )
    )
    wtop = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        rer.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


MMR_LAMBDA = 0.7
MMR_CANDIDATES = 50
MMR_K = 10


@register(
    "mmr_rerank",
    extra=True,
    oracle=f"""
    WITH RECURSIVE q AS (
        SELECT vec_id AS query_id, embedding AS qe FROM embeddings
        WHERE vec_id % {QUERY_MOD} = 0
    ),
    cand AS (
        SELECT q.query_id, e.vec_id,
               ROUND({cosine_sql('q.qe', 'e.embedding')}, 6) AS rel,
               list_transform(e.embedding, x ->
                   CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT)) AS qv
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
        QUALIFY row_number() OVER (
            PARTITION BY q.query_id ORDER BY rel DESC, e.vec_id
        ) <= {MMR_CANDIDATES}
    ),
    gram AS (
        SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
               list_sum(list_transform(range(1, len(a.qv) + 1),
                   i -> a.qv[i] * b.qv[i])) AS dp
        FROM cand a JOIN cand b USING (query_id)
    ),
    nrm AS (
        SELECT query_id, va AS vec_id, sqrt(CAST(dp AS DOUBLE)) AS nq
        FROM gram WHERE va = vb
    ),
    sims AS (
        SELECT g.query_id, g.va, g.vb,
               CAST(g.dp AS DOUBLE) / (na.nq * nb.nq) AS sim
        FROM gram g
        JOIN nrm na ON na.query_id = g.query_id AND na.vec_id = g.va
        JOIN nrm nb ON nb.query_id = g.query_id AND nb.vec_id = g.vb
    ),
    rec AS (
        SELECT 0 AS iter, query_id, vec_id, rel,
               CAST(0.0 AS DOUBLE) AS max_sim,
               CAST(NULL AS INT) AS sel_iter,
               CAST(NULL AS DOUBLE) AS sel_score
        FROM cand
        UNION ALL
        SELECT w.iter + 1, w.query_id, w.vec_id, w.rel,
               GREATEST(w.max_sim, s.sim),
               CASE WHEN w.sel_iter IS NULL AND w.vec_id = w.win
                    THEN w.iter + 1 ELSE w.sel_iter END,
               CASE WHEN w.sel_iter IS NULL AND w.vec_id = w.win
                    THEN w.win_score ELSE w.sel_score END
        FROM (
            SELECT t.*,
                   first_value(t.vec_id) OVER (
                       PARTITION BY t.query_id
                       ORDER BY (CASE WHEN t.sel_iter IS NULL
                                      THEN t.mmr END) DESC NULLS LAST,
                                (CASE WHEN t.sel_iter IS NULL
                                      THEN t.vec_id END) ASC NULLS LAST
                   ) AS win,
                   first_value(t.mmr) OVER (
                       PARTITION BY t.query_id
                       ORDER BY (CASE WHEN t.sel_iter IS NULL
                                      THEN t.mmr END) DESC NULLS LAST,
                                (CASE WHEN t.sel_iter IS NULL
                                      THEN t.vec_id END) ASC NULLS LAST
                   ) AS win_score
            FROM (
                -- CAST the lambda literals to DOUBLE: DuckDB folds
                -- bare (1 - 0.7) in DECIMAL (exactly 0.3) while the
                -- kernel's float64 (1 - 0.7) is 0.30000000000000004 —
                -- a one-ulp score skew that breaks the hash
                SELECT r.*,
                       CAST({MMR_LAMBDA} AS DOUBLE) * r.rel
                       - (1 - CAST({MMR_LAMBDA} AS DOUBLE)) * r.max_sim
                           AS mmr
                FROM rec r WHERE r.iter < {MMR_K}
            ) t
        ) w
        JOIN sims s ON s.query_id = w.query_id
                   AND s.va = w.vec_id AND s.vb = w.win
    )
    SELECT query_id, sel_iter AS rank, vec_id,
           sel_score AS mmr_score
    FROM rec WHERE iter = {MMR_K} AND sel_iter IS NOT NULL
    """,
)
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: take each query's top-50
    cosine candidates and greedily pick 10 that trade off relevance
    against redundancy (lambda=0.7) — the diversification pass behind
    every retrieval stack (Carbonell & Goldstein, SIGIR'98).

    The candidate cut is the existing broadcast + HOF-dot-product
    kernel (distributed); the greedy argmax is inherently sequential
    IN K but over <= 50 candidates per query, so it runs as an
    applyInPandas kernel per query group — numpy over a 50 x dim
    block, Arrow-batched, thousands of queries in parallel. This is
    the canonical 'small iterative core after a distributed cut'
    split.

    ORACLE-PAIRED (r9, was rows-only): candidate-pair similarities
    come from integer micro-unit Gram products (exact, summation-
    order-free) with IEEE sqrt/divide — so a DuckDB RECURSIVE CTE
    replays the greedy argmax loop decision-for-decision (winner per
    iteration via a first_value window over the non-selected rows,
    max_sim folded forward with GREATEST) and the full 10-pick output
    hash-matches. A python-reference test additionally pins the
    kernel.
    """
    import pandas as pd

    e = table(spark, sf_dir, "embeddings").withColumn("nrm", l2_norm("embedding"))
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    cand = (
        e.join(q, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("score"),
            (F.col("embedding")).alias("emb"),
            F.col("nrm").alias("cnrm"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_CANDIDATES)
        .drop("rn")
    )

    out_schema = (
        "query_id bigint, rank int, vec_id bigint, mmr_score double"
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["score", "vec_id"], ascending=[False, True])
        pdf = pdf.reset_index(drop=True)
        # candidate-pair similarities from INTEGER-QUANTIZED dots
        # (floor(x*1e6 + 0.5) micro-units): the int64 Gram matrix is
        # exact and summation-order-free, and the only float ops left
        # (sqrt of the diagonal, one division) are bit-deterministic
        # IEEE — which is what lets a DuckDB recursive CTE replay the
        # whole greedy loop and hash-match (the nearest-centroid
        # discipline applied to MMR). A float32 matmul here would be
        # BLAS-summation-ordered and engine-specific.
        embs = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
        q = np.floor(embs * 1e6 + 0.5).astype(np.int64)
        gram = q @ q.T  # exact int64
        nq = np.sqrt(np.diag(gram).astype(np.float64))
        sims = gram.astype(np.float64) / np.outer(nq, nq)
        rel = pdf["score"].to_numpy(dtype=np.float64)
        vec_ids = pdf["vec_id"].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        rows = []
        max_sim = np.zeros(n)
        for rank in range(min(MMR_K, n)):
            mmr_score = MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * max_sim
            mmr_score[selected] = -np.inf
            # deterministic tie-break: lowest vec_id among maxima
            best = np.lexsort((vec_ids, -mmr_score))[0]
            selected.append(best)
            rows.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    rank + 1,
                    int(vec_ids[best]),
                    # UNROUNDED: both engines build this double from
                    # the same exact-integer sims and the same two-term
                    # expression, so it is bit-identical by
                    # construction — rounding would only reintroduce
                    # the half-way-tie engine mismatch it usually fixes
                    float(mmr_score[best]),
                )
            )
            max_sim = np.maximum(max_sim, sims[:, best])
        return pd.DataFrame(
            rows, columns=["query_id", "rank", "vec_id", "mmr_score"]
        )

    return cand.groupBy("query_id").applyInPandas(mmr, out_schema)


# ------------------------------------------- matryoshka truncation


TRUNC_DIM = 16   # prefix dims kept in the truncated index
TRUNC_K = 10     # recall@k


@register(
    "sim_truncate_recall",
    extra=True,
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe,
               embedding[1:{TRUNC_DIM}] AS qt
        FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
    ),
    e AS (
        SELECT vec_id, embedding AS fe,
               embedding[1:{TRUNC_DIM}] AS te
        FROM embeddings
    ),
    full_k AS (
        SELECT q.query_id, e.vec_id
        FROM q JOIN e ON e.vec_id <> q.query_id
        QUALIFY row_number() OVER (
            PARTITION BY q.query_id
            ORDER BY ROUND({cosine_sql('q.qe', 'e.fe')}, 6) DESC, e.vec_id
        ) <= {TRUNC_K}
    ),
    trunc_k AS (
        SELECT q.query_id, e.vec_id
        FROM q JOIN e ON e.vec_id <> q.query_id
        QUALIFY row_number() OVER (
            PARTITION BY q.query_id
            ORDER BY ROUND({cosine_sql('q.qt', 'e.te')}, 6) DESC, e.vec_id
        ) <= {TRUNC_K}
    )
    SELECT f.query_id,
           CAST(COUNT(t.vec_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(t.vec_id) / {TRUNC_K}.0, 6) AS recall_at_k
    FROM full_k f
    LEFT JOIN trunc_k t
      ON t.query_id = f.query_id AND t.vec_id = f.vec_id
    GROUP BY f.query_id
    """,
)
def sim_truncate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: how much retrieval quality
    survives keeping only the first {TRUNC_DIM} of 64 dims — recall@k
    of the truncated index against full-dim exact top-k, per query.
    The go/no-go measurement before shipping prefix-truncated
    embeddings (MRL) to cut index memory 4x.

    Both rankings use the repo's cross-engine discipline (6-d.p.
    rounded cosine + vec_id tie-break) so the whole audit — including
    the recall numbers — is oracle-exact, not approximate.

    Scale: two broadcast-query passes over the corpus (the truncated
    pass reads {TRUNC_DIM}/64 of the vector bytes — the actual MRL
    saving) + one join of two k-row-per-query sets.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").alias("fe"),
        F.slice("embedding", 1, TRUNC_DIM).alias("te"),
    )
    e = e.withColumn("fn", l2_norm("fe")).withColumn("tn", l2_norm("te"))
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("fe").alias("qe"),
            F.col("te").alias("qt"),
            F.col("fn").alias("qfn"),
            F.col("tn").alias("qtn"),
        )
    )

    def topk(score_col: F.Column) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("vec_id")
        )
        return (
            e.join(q, F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", score_col.alias("score"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TRUNC_K)
            .select("query_id", "vec_id")
        )

    full_k = topk(
        F.round(dot("qe", "fe") / (F.col("qfn") * F.col("fn")), 6)
    )
    trunc_k = topk(
        F.round(dot("qt", "te") / (F.col("qtn") * F.col("tn")), 6)
    ).withColumnRenamed("vec_id", "t_vec_id")
    return (
        full_k.join(
            trunc_k,
            (full_k.query_id == trunc_k.query_id)
            & (full_k.vec_id == trunc_k.t_vec_id),
            "left",
        )
        .groupBy(full_k.query_id)
        .agg(
            F.count("t_vec_id").alias("n_hits"),
            F.round(F.count("t_vec_id") / TRUNC_K, 6).alias("recall_at_k"),
        )
    )


PQ_M = 8  # subspaces (64 dims -> 8 x 8)
PQ_SUBDIM = 8
PQ_SEED_MOD = 13  # every 13th vec_id seeds the codebook...
PQ_KCODES = 32  # ...capped at 32 centroids per subspace (k is a codec
# property — FAISS uses 256 — NOT a function of corpus size; an uncapped
# seed rule made codebook training scale superlinearly with N)
PQ_ITERS = 2
# ADC shortlist: exact re-rank picks TOP_K from it. Recall tracks
# shortlist/corpus coverage (a FIXED 50 covered 10% at sf0.01 but 2.5%
# at sf0.1 and recall@5 dropped 0.84 -> 0.62 — caught by bench
# --recall), so the floor scales to ~10% of the corpus, CAPPED: at
# production scale the shortlist is an absolute knob (FAISS nprobe x
# list-len shape, composed with IVF so ADC never scans the full
# corpus), never a corpus fraction.
PQ_SHORTLIST_MIN = 50
PQ_SHORTLIST_CAP = 1000


def _l2sq(a, b) -> F.Column:
    """Squared L2 distance between two float arrays, double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@register("sim_search_pq", extra=True)  # rows-only: iterative codebook training
def sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #4 — product quantization (PQ) with asymmetric
    distance computation (Jégou et al., TPAMI'11; FAISS's IndexPQ):
    split each 64-d vector into 8 contiguous 8-d subvectors, train a
    small k-means codebook per subspace, encode every vector as 8
    code ids, and score query→vector as a LOOKUP-TABLE sum — the
    query's exact per-(subspace, centroid) partial dot products are a
    Q x m x k broadcast frame, so each database vector's approximate
    dot product is m table lookups instead of d multiplies, and the
    corpus resides as m small ints per vector (64x smaller than
    float32 here). This is the bytes-per-candidate lever at 100 TB:
    compose with IVF (cut candidates) and this (cut bytes/candidate)
    exactly as FAISS IVFPQ does.

    Shape, all DataFrame ops / zero UDFs: subspace explode is a
    sequence+slice projection (no shuffle); codebook training is the
    ivf_kmeans Lloyd loop restricted to (sub, seed) groups — assign =
    broadcast join + min_by hash-agg (never a sort window), update =
    positional mean via posexplode; encoding reuses the final assign;
    ADC = codes ⋈ broadcast LUT on (sub, code) then a (query, vec)
    hash-agg whose partial aggregation shrinks the pair frame
    map-side. Approximate norms come free as Σ‖centroid‖² per code
    word. The ADC pass emits a corpus-scaled shortlist per query
    (~N/10, floor 50, cap 1000; sized in-plan from a broadcast 1-row
    count, no dedicated count() job) and an EXACT cosine re-rank
    picks the final top-5 from it — the standard two-stage deployment
    (compressed-domain recall, exact precision); only shortlisted
    vectors are ever re-read at full width. Rows-only:
    codebooks are iterative float refinement (same class as
    sim_search_ivf_kmeans); recall@5 vs the exact search is pinned in
    tests."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sub = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
        "embedding",
    ).select(
        "vec_id",
        "sub",
        F.expr(f"slice(embedding, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM})")
        .alias("sv"),
    )
    book = sub.filter(
        (F.col("vec_id") % PQ_SEED_MOD == 0)
        & (F.col("vec_id") < PQ_SEED_MOD * PQ_KCODES)
    ).select(
        "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("ce")
    )

    def assign(points: DataFrame, codebook: DataFrame) -> DataFrame:
        # argmin centroid per (vec_id, sub): hash-agg min_by with a
        # (dist, cid) struct tie-break — partial agg shrinks the
        # N*m*k pair frame map-side, one candidate per partition
        return (
            points.join(F.broadcast(codebook), "sub")
            .withColumn("dist", _l2sq(F.col("sv"), F.col("ce")))
            .groupBy("vec_id", "sub")
            .agg(
                F.first("sv").alias("sv"),
                F.min_by(
                    F.col("cid"), F.struct(F.col("dist"), F.col("cid"))
                ).alias("code"),
            )
        )

    for it in range(PQ_ITERS):
        assigned = assign(sub, book)
        book = (
            assigned.select(
                "sub", F.col("code").alias("cid"),
                F.posexplode("sv").alias("pos", "x"),
            )
            .groupBy("sub", "cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("ce")
            )
        )
        if it == PQ_ITERS - 1:
            book = book.withColumn("cn2", sq_norm("ce")).localCheckpoint(
                eager=True
            )

    codes = assign(sub, book).select("vec_id", "sub", "code")

    # asymmetric LUT: the query keeps EXACT subvectors; one row per
    # (query, subspace, centroid) with the partial dot product and the
    # centroid's squared norm (for the reconstructed-vector norm)
    qsub = sub.filter(F.col("vec_id") % QUERY_MOD == 0)
    qn = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), l2_norm("embedding").alias("qnrm")
    )
    lut = F.broadcast(
        qsub.join(F.broadcast(book), "sub")
        .select(
            F.col("vec_id").alias("query_id"),
            "sub",
            F.col("cid").alias("code"),
            dot("sv", "ce").alias("part"),
            "cn2",
        )
        .join(F.broadcast(qn), "query_id")
    )
    scored = (
        codes.join(lut, ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            F.round(
                F.sum("part")
                / (F.first("qnrm") * F.sqrt(F.sum("cn2"))),
                6,
            ).alias("score")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    # corpus-scaled shortlist depth, sized INSIDE the plan: a 1-row
    # count aggregate broadcast-crossed onto the scored frame (no
    # dedicated count() action — the old driver-side e.count() paid a
    # full extra job per invocation just to pick a literal)
    nrow = e.agg(F.count("*").alias("__n"))
    shortlist = (
        scored.withColumn("rn", F.row_number().over(wq))
        .crossJoin(F.broadcast(nrow))
        .filter(
            F.col("rn")
            <= F.least(
                F.lit(PQ_SHORTLIST_CAP),
                F.greatest(
                    F.lit(PQ_SHORTLIST_MIN), F.col("__n") / 10
                ),
            )
        )
        .select("query_id", "vec_id")
    )
    # exact re-rank of the shortlist (the FAISS deployment shape:
    # compressed-domain shortlist, exact final scores). The shortlist
    # is Q x PQ_SHORTLIST rows -> broadcast side of the corpus join;
    # only shortlisted full vectors are ever touched again.
    ec = e.withColumn("nrm", l2_norm("embedding"))
    qv = F.broadcast(
        ec.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    rer = (
        ec.join(F.broadcast(shortlist), "vec_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("score"),
        )
    )
    return (
        rer.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


IVFPQ_TRAIN_CAP = 2048  # codebook training sample — a FIXED budget
# (FAISS trains quantizers on a bounded sample offline), so training
# cost is corpus-size-independent by construction
IVFPQ_ITERS = 10  # numpy Lloyd rounds on the 2048-row sample (driver)


@register("sim_search_ivfpq", extra=True)  # rows-only: sampled Lloyd codebooks
def sim_search_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #5 — IVF+PQ composed, the FAISS IndexIVFPQ
    deployment shape (Jégou et al., TPAMI'11 §V): the coarse quantizer
    cuts CANDIDATES (each query probes its top-{IVF_NPROBE} cells),
    product quantization of the RESIDUAL x − c(x) cuts BYTES PER
    CANDIDATE (8 code ids instead of 64 floats), and an exact re-rank
    of the ADC shortlist restores precision. Complements the siblings:
    ``sim_search_ivf`` demonstrates candidate cutting alone,
    ``sim_search_pq`` byte cutting alone with in-Spark distributed
    Lloyd; this one composes both and trains its codebooks the way
    production systems actually do — numpy Lloyd on a FIXED
    {IVFPQ_TRAIN_CAP}-row sample collected once (≤512 KiB; training
    cost independent of corpus size), while assignment, encoding, ADC
    scoring and re-rank all stay distributed broadcast-equi-join
    plans.

    Scoring uses the inner-product decomposition q·x̃ = q·c(x) +
    Σ_m q_m·pc_m[code_m(x)] — exact for the reconstructed vector, and
    equal to cosine ranking here because the corpus is unit-norm. The
    q·c term rides the probe frame (one row per query×cell); the
    Σ LUT term is a broadcast (query, sub, code) partial-dot table, so
    a database vector's approximate score is {PQ_M} lookups + one add.
    Rows-only: recall@5 vs exact is pinned in tests and bench
    --recall."""
    import numpy as np

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = F.broadcast(
        e.filter(F.col("vec_id") % CENTROID_MOD == 0).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
        ).withColumn("cn", l2_norm("ce"))
    )
    # ---- offline training (bounded): deterministic hash-ordered
    # sample + the broadcast-sized centroid set, residual PQ codebooks
    # fit with numpy Lloyd. Both collects are bounded by design
    # constants (sample cap; centroids are the broadcast side of every
    # IVF plan), not by corpus size.
    sample = np.array(
        [
            r.embedding
            for r in e.orderBy(F.xxhash64("vec_id"), "vec_id")
            .limit(IVFPQ_TRAIN_CAP)
            .collect()
        ],
        dtype=np.float64,
    )
    C = np.array(
        [r.ce for r in cent.collect()], dtype=np.float64
    )  # (K, d), cid order = collect order; only geometry matters here
    cn = np.linalg.norm(C, axis=1)
    own = (sample @ C.T / cn).argmax(axis=1)
    resid = sample - C[own]
    books = []
    # fewer training rows than codes (degenerate corpus): a codebook
    # can't have more entries than distinct residuals seeded it —
    # clamp like vopt_dp clamps buckets (full corpora never hit this)
    kc = min(PQ_KCODES, len(sample))
    for m in range(PQ_M):
        S = resid[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        cb = S[:kc].copy()  # deterministic init: first k rows
        for _ in range(IVFPQ_ITERS):
            a = (
                ((S[:, None, :] - cb[None, :, :]) ** 2).sum(-1).argmin(1)
            )
            for k in range(kc):
                if (a == k).any():
                    cb[k] = S[a == k].mean(0)
        books.extend(
            (m, k, [float(x) for x in cb[k]]) for k in range(kc)
        )
    book = F.broadcast(
        spark.createDataFrame(books, "sub int, code int, pc array<double>")
    )

    # ---- distributed encode: coarse assign (argmax hash-agg), then
    # per-subspace residual -> nearest code (min_by hash-agg). The
    # corpus's search-time representation is (cid, 8 small ints).
    # measured r13: the inline-argmax rewrite used for the Lloyd
    # assign in sim_search_ivf_kmeans REGRESSED here — this consumer
    # needs TWO fields of the winner (cid AND ce for the residual),
    # and CollapseProject re-inlines the whole K-dot argmax per field
    # reference; the agg boundary below evaluates it once.
    # Deliberately kept as the pair-frame + max_by formulation.
    assign = (
        e.crossJoin(cent)
        .withColumn("cscore", dot("embedding", "ce") / F.col("cn"))
        .groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.max_by(
                F.struct(F.col("cid"), F.col("ce")),
                F.struct(F.col("cscore"), (-F.col("cid")).alias("nc")),
            ).alias("cc"),
        )
        .select(
            "vec_id",
            F.col("cc.cid").alias("cid"),
            F.zip_with(
                "embedding",
                F.col("cc.ce"),
                lambda x, c: x.cast("double") - c.cast("double"),
            ).alias("resid"),
        )
    )
    codes = (
        assign.select(
            "vec_id",
            "cid",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
            "resid",
        )
        .select(
            "vec_id",
            "cid",
            "sub",
            F.expr(f"slice(resid, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias(
                "rv"
            ),
        )
        .join(book, "sub")
        # measured r13: an inline argmin over a 256-entry codebook
        # array (transform + array_min) ran ~30% SLOWER than this flat
        # exploded join + min_by — the flat frame stays inside
        # whole-stage codegen while HOF lambdas evaluate per element.
        # Deliberately kept as the exploded-join formulation.
        .withColumn("d", _l2sq(F.col("rv"), F.col("pc")))
        .groupBy("vec_id", "cid", "sub")
        .agg(
            F.min_by(F.col("code"), F.struct(F.col("d"), F.col("code"))).alias(
                "code"
            )
        )
    )

    # ---- query side: multiprobe top-P cells, q·c carried per probe
    qv = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        l2_norm("embedding").alias("qnrm"),
    )
    qw = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cid")
    )
    probe = F.broadcast(
        qv.crossJoin(cent)
        .withColumn("cscore", dot("qe", "ce") / F.col("cn"))
        .withColumn("qrn", F.row_number().over(qw))
        .filter(F.col("qrn") <= IVF_NPROBE)
        .select(
            "query_id",
            F.col("cid").alias("qcid"),
            dot("qe", "ce").alias("qc_part"),
        )
    )
    lut = F.broadcast(
        qv.select(
            "query_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
            "qe",
        )
        .select(
            "query_id",
            "sub",
            F.expr(f"slice(qe, sub * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias(
                "qs"
            ),
        )
        .join(book, "sub")
        .select("query_id", "sub", "code", dot("qs", "pc").alias("part"))
    )

    # ---- ADC: candidates = codes in probed cells; approximate dot =
    # q·c + Σ_m LUT[m][code]. Partial aggregation shrinks the
    # (candidate × sub) frame map-side before the (query, vec) agg.
    scored = (
        codes.join(
            probe,
            (F.col("cid") == F.col("qcid"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .join(lut, ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg((F.first("qc_part") + F.sum("part")).alias("adc"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id")
    )
    nrow = e.agg(F.count("*").alias("__n"))
    shortlist = (
        scored.withColumn("rn", F.row_number().over(wq))
        .crossJoin(F.broadcast(nrow))
        .filter(
            F.col("rn")
            <= F.least(
                F.lit(PQ_SHORTLIST_CAP),
                F.greatest(F.lit(PQ_SHORTLIST_MIN), F.col("__n") / 10),
            )
        )
        .select("query_id", "vec_id")
    )
    # ---- exact re-rank of the shortlist (same tail as sim_search_pq)
    ec = e.withColumn("nrm", l2_norm("embedding"))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        ec.join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("score"),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


LOGREG_ITERS = 10
LOGREG_LR = 2.0  # full-batch step on the mean gradient


LOGREG_XS = 1_000_000  # feature quantum: xq = floor(x * 1e6)
LOGREG_RS = 1_000_000  # residual quantum: rq = floor(r * 1e6)


LOGREG_ORACLE = f"""
WITH RECURSIVE corpus AS MATERIALIZED (
    SELECT list(struct_pack(
               xq := list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {LOGREG_XS})
                             AS BIGINT)),
               y := CAST(1 - label % 2 AS DOUBLE))
               ORDER BY vec_id) AS rws,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM embeddings
),
it AS (
    SELECT 0 AS i, list_transform(range(1, 65), j -> 0.0::DOUBLE) AS w,
           0.0::DOUBLE AS b, rws, n
    FROM corpus
    UNION ALL
    SELECT i + 1,
           list_transform(range(1, 65), j ->
               w[j] - {LOGREG_LR}::DOUBLE
                      * (CAST(g[j] AS DOUBLE)
                         / {LOGREG_XS * LOGREG_RS}.0::DOUBLE) / n),
           b - {LOGREG_LR}::DOUBLE * (CAST(rs AS DOUBLE) / {LOGREG_RS}.0::DOUBLE) / n,
           rws, n
    FROM (
        SELECT i, w, b, rws, n,
               list_transform(range(1, 65), j ->
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(rqs, k -> k.rq * k.xq[j])),
                       (acc, v) -> acc + v)) AS g,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(rqs, k -> k.rq)),
                   (acc, v) -> acc + v) AS rs
        FROM (
            SELECT i, w, b, rws, n,
                   list_transform(rws, rr -> struct_pack(
                       xq := rr.xq,
                       rq := CAST(FLOOR((
                           (0.5::DOUBLE + 0.5::DOUBLE
                            * ((list_reduce(list_prepend(0.0::DOUBLE,
                                   list_transform(range(1, 65), j ->
                                       (CAST(rr.xq[j] AS DOUBLE)
                                        / {LOGREG_XS}.0::DOUBLE) * w[j])),
                                   (acc, v) -> acc + v) + b)
                               / (1.0::DOUBLE + ABS(list_reduce(list_prepend(0.0::DOUBLE,
                                      list_transform(range(1, 65), j ->
                                          (CAST(rr.xq[j] AS DOUBLE)
                                           / {LOGREG_XS}.0::DOUBLE) * w[j])),
                                      (acc, v) -> acc + v) + b))))
                           - rr.y) * {LOGREG_RS}) AS BIGINT)))
                       AS rqs
            FROM it WHERE i < {LOGREG_ITERS}
        )
    )
),
fin AS MATERIALIZED (
    SELECT w, b, rws, n FROM it WHERE i = {LOGREG_ITERS}
),
accv AS MATERIALIZED (
    SELECT CAST(list_sum(list_transform(rws, rr ->
               CASE WHEN CAST(
                        (list_reduce(list_prepend(0.0::DOUBLE,
                             list_transform(range(1, 65), j ->
                                 (CAST(rr.xq[j] AS DOUBLE)
                                  / {LOGREG_XS}.0::DOUBLE) * w[j])),
                             (acc, v) -> acc + v) + b) > 0
                        AS DOUBLE) = rr.y
               THEN 1 ELSE 0 END)) AS DOUBLE) / n AS acc
    FROM fin
)
SELECT CAST(j - 1 AS INTEGER) AS pos, ROUND(w[j], 6) AS weight
FROM fin, range(1, 65) t(j)
UNION ALL
SELECT -1, ROUND(b, 6) FROM fin
UNION ALL
SELECT -2, ROUND(acc, 6) FROM accv
"""


@register("logreg_train", extra=True, oracle=LOGREG_ORACLE)
def logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed LOGISTIC-style training (full-batch gradient
    descent, the one-machine-of-math / cluster-of-data shape every
    data-parallel trainer reduces to): learn w for P(label is even |
    embedding) over the embeddings table in 10 GD steps. Per step the
    model (64 weights + bias — driver-sized, like every linear model
    head) folds into the scan as a LITERAL array: margins and
    per-row residuals are higher-order-function expressions (no UDF),
    and the gradient is one posexplode + groupBy(dim) aggregation —
    64 rows back to the driver per step. The corpus is read N_ITERS
    times but never shuffled on rows: the only exchange is the
    64-group gradient agg, which partial-aggregates map-side to
    (partitions x 64) rows. Conceptually allreduce-SGD with the
    reduce expressed as a hash-agg.

    ORACLE-PAIRED (r9 verdict #5) by three portability choices:
    (1) features quantize once to 1e-6 integers (the embedding-family
    standard), (2) the link is the ALGEBRAIC sigmoid
    0.5 + 0.5*m/(1+|m|) — same shape and sign behavior as the
    logistic link but built from IEEE-exact portable ops, where
    exp() is implementation-defined across JVM/libm and 10 amplified
    iterations would surface the ulp, (3) per-row residuals floor-
    quantize to 1e-6 integers so the gradient reduce is an ORDER-FREE
    integer sum (summed in decimal to dodge bigint overflow at
    corpus scale), not a shuffle-ordered float fold. The recursive
    CTE twin carries (w, b) and replays margins, residuals and
    updates expression-for-expression.

    Emits (pos, weight) for the 64 dims plus pos=-1 for the bias and
    a final pos=-2 row carrying training accuracy."""
    # measured r13: checkpointing this frame across the 10 gradient
    # jobs is SLOWER than re-reading (A/B 7.15/4.10/3.75 s ckpt vs
    # 4.24/4.01/3.15 s without) — a 10x re-scan of a columnar parquet
    # through codegen quantization beats scanning materialized
    # 64-element-array rows. Deliberately NOT cached.
    e = table(spark, sf_dir, "embeddings").select(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * LOGREG_XS).cast(
                "bigint"
            ),
        ).alias("xq"),
        (1 - F.col("label") % 2).cast("double").alias("y"),
    )
    dim = 64
    w = [0.0] * dim
    b = 0.0
    for _ in range(LOGREG_ITERS):
        w_lit = F.array(*[F.lit(x) for x in w])
        margin = (
            F.aggregate(
                F.zip_with(
                    "xq",
                    w_lit,
                    lambda xq, wj: (
                        xq.cast("double") / F.lit(float(LOGREG_XS))
                    )
                    * wj,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            + F.lit(b)
        )
        p = F.lit(0.5) + F.lit(0.5) * (
            margin / (F.lit(1.0) + F.abs(margin))
        )
        scored = e.select(
            "xq",
            F.floor((p - F.col("y")) * LOGREG_RS)
            .cast("bigint")
            .alias("rq"),
        )
        # corpus size and the bias gradient both fall out of the SAME
        # gradient aggregate (every pos group holds each row's rq
        # exactly once), so no dedicated count()/sum() jobs — ONE job
        # per iteration. Integer-product sums ride decimal(38,0):
        # exact at any corpus size, immune to shuffle order.
        grad = (
            scored.select("rq", F.posexplode("xq").alias("pos", "x"))
            .groupBy("pos")
            .agg(
                F.sum(
                    (F.col("rq") * F.col("x")).cast("decimal(38,0)")
                ).alias("g"),
                F.sum(F.col("rq").cast("decimal(38,0)")).alias("rs"),
                F.count("*").alias("cnt"),
            )
            .collect()
        )
        n = grad[0].cnt
        gb = int(grad[0].rs)
        for row in grad:
            w[row.pos] -= (
                LOGREG_LR
                * (float(int(row.g)) / float(LOGREG_XS * LOGREG_RS))
                / n
            )
        b -= LOGREG_LR * (float(gb) / float(LOGREG_RS)) / n
    # final pass: training accuracy under the learned weights
    w_lit = F.array(*[F.lit(x) for x in w])
    margin = (
        F.aggregate(
            F.zip_with(
                "xq",
                w_lit,
                lambda xq, wj: (
                    xq.cast("double") / F.lit(float(LOGREG_XS))
                )
                * wj,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(b)
    )
    acc = (
        e.select(
            ((margin > 0).cast("double") == F.col("y"))
            .cast("double")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    rows = (
        [(int(i), round(float(x), 6)) for i, x in enumerate(w)]
        + [(-1, round(float(b), 6)), (-2, round(float(acc), 6))]
    )
    return spark.createDataFrame(rows, "pos int, weight double")


KNN_K = 10


@register(
    "knn_classifier",
    extra=True,
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe, label AS true_label
        FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, q.true_label, e.label,
               ROUND({cosine_sql('q.qe', 'e.embedding')}, 6) AS score,
               e.vec_id
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    topk AS (
        SELECT query_id, true_label, label, score, vec_id
        FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, vec_id
        ) <= {KNN_K}
    ),
    votes AS (
        SELECT query_id, true_label, label,
               CAST(COUNT(*) AS BIGINT) AS n_votes,
               ROUND(MAX(score), 6) AS best_score
        FROM topk GROUP BY 1, 2, 3
    )
    SELECT query_id, true_label,
           label AS predicted_label, n_votes,
           CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END
               AS INTEGER) AS correct
    FROM votes
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY n_votes DESC, best_score DESC, label
    ) = 1
    """,
)
def knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NEAREST-NEIGHBOR CLASSIFICATION over the embedding corpus:
    for each query vector, the majority label among its 10 nearest
    neighbors by exact cosine (ties broken by best neighbor score,
    then label — every step deterministic, so even the PREDICTIONS
    hash-match the oracle). This stacks the classification head on
    the sim-search family: the same broadcast-queries / corpus-
    never-shuffles kernel, plus a per-query vote aggregation; swap
    the exact scorer for the IVF/PQ path and the plan survives any
    corpus size (the vote is always k rows per query).

    Emits (query_id, true_label, predicted_label, n_votes, correct)
    — the correct column makes the result its own accuracy report."""
    e = table(spark, sf_dir, "embeddings").withColumn(
        "nrm", l2_norm("embedding")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.col("label").alias("true_label"),
        )
    )
    scored = e.join(q, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "true_label",
        "label",
        F.round(
            dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
        ).alias("score"),
        "vec_id",
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    topk = scored.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= KNN_K
    )
    votes = topk.groupBy("query_id", "true_label", "label").agg(
        F.count("*").cast("bigint").alias("n_votes"),
        F.round(F.max("score"), 6).alias("best_score"),
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("best_score").desc(), F.col("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("predicted_label"),
            "n_votes",
            (F.col("label") == F.col("true_label"))
            .cast("int")
            .alias("correct"),
        )
    )


NC_SCALE = 1_000_000  # embeddings quantized to integer micro-units


@register(
    "nearest_centroid_classifier",
    extra=True,
    oracle=f"""
    WITH qe AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * {NC_SCALE})
                        AS BIGINT)) AS ei,
               label
        FROM embeddings
    ),
    cent AS (
        SELECT label AS c_label,
               list_transform(range(1, 65),
                   i -> list_sum(list_transform(grp, g -> g[i]))) AS cs
        FROM (SELECT label, list(ei) AS grp
              FROM qe WHERE vec_id % {QUERY_MOD} <> 0 GROUP BY label)
    ),
    q AS (SELECT vec_id AS query_id, ei AS qv, label AS true_label
          FROM qe WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
        SELECT q.query_id, q.true_label, cent.c_label,
               ROUND(
                   list_sum(list_transform(range(1, 65),
                       i -> CAST(qv[i] AS DOUBLE) * cs[i]))
                   / (sqrt(list_sum(list_transform(qv,
                          x -> CAST(x AS DOUBLE) * x)))
                      * sqrt(list_sum(list_transform(cent.cs,
                          x -> CAST(x AS DOUBLE) * x)))),
               6) AS score
        FROM q, cent
    )
    SELECT query_id, true_label,
           c_label AS predicted_label, score,
           CAST(CASE WHEN c_label = true_label THEN 1 ELSE 0 END
               AS INTEGER) AS correct
    FROM scored
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, c_label
    ) = 1
    """,
)
def nearest_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-CENTROID (Rocchio) classification — the O(labels)
    companion to knn_classifier's O(corpus): one mean vector per
    label, queries classified by cosine to the nearest centroid.
    Made ORACLE-EXACT by quantizing embeddings to integer micro-units
    first: centroid sums are then EXACT INTEGER vectors (immune to
    the float-summation-order divergence that makes naive float
    centroids engine-dependent), and the only floats are the final
    cosine's products/sqrt from identical exact integers — identical
    IEEE results on both engines, 6-d.p.-rounded with a label
    tie-break. Queries (vec_id % 50 = 0) are held out of their own
    centroids (no self-leakage).

    Shape: centroids = one posexplode + (label, dim) hash-agg (10x64
    rows), folded to arrays and BROADCAST; scoring is a per-row HOF
    dot against 10 centroids — no corpus pairing at all, the cheapest
    classification plan that exists at 100 TB."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding, x -> cast(round(cast(x as double)"
            f" * {NC_SCALE}) as bigint))"
        ).alias("ei"),
    )
    train = e.filter(F.col("vec_id") % QUERY_MOD != 0)
    cent = (
        train.select("label", F.posexplode("ei").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.sum("x").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda r: r["s"],
            ).alias("cs")
        )
        .select(F.col("label").alias("c_label"), "cs")
    )
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("ei").alias("qv"),
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "true_label",
        "c_label",
        F.round(
            dot("qv", "cs") / (l2_norm("qv") * l2_norm("cs")), 6
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("c_label")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("c_label").alias("predicted_label"),
            "score",
            (F.col("c_label") == F.col("true_label"))
            .cast("int")
            .alias("correct"),
        )
    )


@register(
    "cluster_silhouette",
    extra=True,
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding, x ->
                   CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT)) AS qv
        FROM embeddings
    ),
    sums AS (
        SELECT label, i, CAST(SUM(x) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT label, UNNEST(qv) AS x,
                   UNNEST(range(1, len(qv) + 1)) AS i
            FROM q
        )
        GROUP BY 1, 2
    ),
    cents AS (
        SELECT label AS c_label, MAX(n) AS n,
               list(s ORDER BY i) AS cs
        FROM sums GROUP BY 1
    ),
    dists AS (
        SELECT q.vec_id, q.label, c.c_label,
               sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> CAST(q.qv[i] * c.n - c.cs[i] AS DOUBLE)
                        * CAST(q.qv[i] * c.n - c.cs[i] AS DOUBLE))))
                   / c.n AS d
        FROM q CROSS JOIN cents c
    ),
    ab AS (
        SELECT vec_id, label,
               MIN(CASE WHEN c_label = label THEN d END) AS a,
               MIN(CASE WHEN c_label <> label THEN d END) AS b
        FROM dists GROUP BY 1, 2
    )
    SELECT vec_id, label, ROUND(a, 6) AS a_dist, ROUND(b, 6) AS b_dist,
           ROUND(CASE WHEN GREATEST(a, b) = 0 THEN 0.0
                      ELSE (b - a) / GREATEST(a, b) END, 6) AS silhouette
    FROM ab
    """,
)
def cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING-QUALITY eval — the SIMPLIFIED SILHOUETTE
    (centroid-based; Hruschka et al. 2004): per point, a = distance to
    its own label centroid, b = distance to the nearest other
    centroid, s = (b - a) / max(a, b). The eval that tells you whether
    the label structure the ANN family banks on (IVF cells, SemDeDup
    clusters, centroid classifier) actually separates — O(N x K)
    where the full silhouette's pairwise a/b is O(N^2), which is the
    only formulation that exists at 100 TB.

    Oracle-exact by the nearest-centroid discipline, extended to
    EUCLIDEAN distance without any engine-dependent division: with
    quantized integers q and centroid SUM S over n members,
    (q_j - S_j/n) = (q_j*n - S_j)/n, so per-dim diffs are EXACT
    INTEGERS (<= ~4e9, exact as doubles) squared/summed in one
    deterministic fold; sqrt and the single /n are bit-stable IEEE.
    Shape: one (label, dim) hash-agg builds K sum-vectors (broadcast),
    scoring is a per-row HOF fold against K centroids, one
    vec_id-keyed aggregation extracts a/b — no point-pair ever
    materializes."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double)"
            " * 1000000 + 0.5) as bigint))"
        ).alias("qv"),
    )
    cent = (
        e.select("label", F.posexplode("qv").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.sum("x").alias("s"), F.count("*").alias("cnt"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda r: r["s"],
            ).alias("cs"),
            F.max("cnt").alias("n"),
        )
        .select(F.col("label").alias("c_label"), "cs", "n")
    )
    d = (
        F.sqrt(
            F.expr(
                "aggregate(zip_with(qv, cs,"
                " (x, s) -> CAST(x * n - s AS DOUBLE)"
                " * CAST(x * n - s AS DOUBLE)),"
                " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
            )
        )
        / F.col("n")
    )
    ab = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "label", "c_label", d.alias("d"))
        .groupBy("vec_id", "label")
        .agg(
            F.min(
                F.when(F.col("c_label") == F.col("label"), F.col("d"))
            ).alias("a"),
            F.min(
                F.when(F.col("c_label") != F.col("label"), F.col("d"))
            ).alias("b"),
        )
    )
    return ab.select(
        "vec_id",
        "label",
        F.round("a", 6).alias("a_dist"),
        F.round("b", 6).alias("b_dist"),
        F.round(
            F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
                (F.col("b") - F.col("a")) / F.greatest("a", "b")
            ),
            6,
        ).alias("silhouette"),
    )


@register(
    "eval_calibration",
    extra=True,
    oracle="""
    WITH q AS (
        SELECT vec_id, label,
               CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS y,
               list_transform(embedding, x ->
                   CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT)) AS qv
        FROM embeddings
    ),
    sums AS (
        SELECT label % 2 AS par, i, CAST(SUM(x) AS BIGINT) AS s
        FROM (
            SELECT label, UNNEST(qv) AS x,
                   UNNEST(range(1, len(qv) + 1)) AS i
            FROM q
        )
        GROUP BY 1, 2
    ),
    cents AS (
        SELECT par, list(s ORDER BY i) AS cs FROM sums GROUP BY 1
    ),
    scored AS (
        SELECT vec_id, y,
               (
                 list_sum(list_transform(range(1, len(qv) + 1), i ->
                     CAST(qv[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(qv, x ->
                        CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(ce, s ->
                        CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))))
                 -
                 list_sum(list_transform(range(1, len(qv) + 1), i ->
                     CAST(qv[i] AS DOUBLE) * CAST(co[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(qv, x ->
                        CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(co, s ->
                        CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))))
                 + 2
               ) / 4 AS p
        FROM q,
             (SELECT cs AS ce FROM cents WHERE par = 0),
             (SELECT cs AS co FROM cents WHERE par = 1)
    ),
    binned AS (
        SELECT vec_id, y,
               CAST(FLOOR(p * 1000000 + 0.5) AS BIGINT) AS pq
        FROM scored
    ),
    agg AS (
        SELECT LEAST(pq // 100000, 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(pq) AS BIGINT) AS sum_pq,
               CAST(SUM((pq - y * 1000000) * (pq - y * 1000000))
                    AS BIGINT) AS sq
        FROM binned GROUP BY 1
        UNION ALL
        SELECT -1, CAST(COUNT(*) AS BIGINT), CAST(SUM(y) AS BIGINT),
               CAST(SUM(pq) AS BIGINT),
               CAST(SUM((pq - y * 1000000) * (pq - y * 1000000))
                    AS BIGINT)
        FROM binned
    )
    SELECT CAST(bin AS INT) AS bin, n, n_pos,
           ROUND(CAST(sum_pq AS DOUBLE) / n / 1000000, 6) AS conf,
           ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS acc,
           ROUND(ABS(CAST(n_pos AS DOUBLE) / n
                     - CAST(sum_pq AS DOUBLE) / n / 1000000), 6) AS gap,
           ROUND(CAST(sq AS DOUBLE) / n / 1000000000000, 6) AS brier
    FROM agg
    """,
)
def eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBABILITY-CALIBRATION eval — reliability table (10 equal-
    width confidence bins: count, positives, mean confidence, observed
    accuracy, |gap|) plus Brier score, per bin and overall (bin = -1,
    the logreg sentinel-row convention). The eval behind 'is this
    classifier's confidence usable as a probability' — gap-weighted
    sum over bins is ECE, derivable from these columns.

    The scored model is deterministic by construction: a two-centroid
    (even/odd label) cosine margin mapped linearly into [0,1] —
    p = (cos_even - cos_odd + 2) / 4 — built from integer micro-unit
    centroid sums with all folds in deterministic double (no exp/
    sigmoid: libm exp differs across engines, a linear link doesn't).
    Probabilities then QUANTIZE to integer micro-units, so every
    aggregate (sum p, sum (p-y)^2) is an exact integer sum — immune
    to float-summation order — and the emitted doubles are single
    division chains over exact integers. At 100 TB the squared sums
    (~1e12/row) want decimal(38,0); bigint holds to ~1e6 rows/bin.

    Shape: one (parity, dim) hash-agg builds the 2 centroid sum
    vectors (broadcast); scoring + binning is scan-local; one 11-row
    aggregation. The fact never pairs with itself."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        (F.col("label") % 2 == 0).cast("int").alias("y"),
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double)"
            " * 1000000 + 0.5) as bigint))"
        ).alias("qv"),
    )
    cents = (
        e.select((F.col("label") % 2).alias("par"), F.posexplode("qv").alias("pos", "x"))
        .groupBy("par", "pos")
        .agg(F.sum("x").alias("s"))
        .groupBy("par")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda r: r["s"],
            ).alias("cs")
        )
        .groupBy()
        .agg(
            F.max(F.when(F.col("par") == 0, F.col("cs"))).alias("ce"),
            F.max(F.when(F.col("par") == 1, F.col("cs"))).alias("co"),
        )
    )

    def cos_to(cent_col: str) -> F.Column:
        return F.expr(
            f"aggregate(zip_with(qv, {cent_col}, (x, s) ->"
            " CAST(x AS DOUBLE) * CAST(s AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ) / (
            F.sqrt(
                F.expr(
                    "aggregate(transform(qv, x -> CAST(x AS DOUBLE)"
                    " * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE),"
                    " (a, v) -> a + v)"
                )
            )
            * F.sqrt(
                F.expr(
                    f"aggregate(transform({cent_col}, s -> CAST(s AS DOUBLE)"
                    " * CAST(s AS DOUBLE)), CAST(0.0 AS DOUBLE),"
                    " (a, v) -> a + v)"
                )
            )
        )

    p = (cos_to("ce") - cos_to("co") + F.lit(2)) / F.lit(4)
    binned = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "y",
        F.floor(p * 1000000 + F.lit(0.5)).cast("bigint").alias("pq"),
    )
    sq = (F.col("pq") - F.col("y") * 1000000) * (
        F.col("pq") - F.col("y") * 1000000
    )
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum("pq").cast("bigint").alias("sum_pq"),
        F.sum(sq).cast("bigint").alias("sq"),
    ]
    per_bin = binned.groupBy(
        F.least(F.expr("pq div 100000"), F.lit(9)).cast("int").alias("bin")
    ).agg(*aggs)
    total = binned.groupBy().agg(*aggs).select(
        F.lit(-1).cast("int").alias("bin"), "n", "n_pos", "sum_pq", "sq"
    )
    return per_bin.unionByName(total).select(
        "bin",
        "n",
        "n_pos",
        F.round(F.col("sum_pq").cast("double") / F.col("n") / 1000000, 6)
            .alias("conf"),
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("acc"),
        F.round(
            F.abs(
                F.col("n_pos").cast("double") / F.col("n")
                - F.col("sum_pq").cast("double") / F.col("n") / 1000000
            ),
            6,
        ).alias("gap"),
        F.round(
            F.col("sq").cast("double") / F.col("n") / 1000000000000, 6
        ).alias("brier"),
    )


# ---------------------------------------------------------------- r7:
# SemDeDup cluster pruning + hard-negative mining

SEMDEDUP_T = 0.3  # paper uses ~0.95 on web embeddings; this synthetic
# corpus has NO true near-dups (measured max within-cluster cosine
# 0.48 at sf0.01), so the threshold sits where the MECHANISM bites —
# the keep/drop rule, not the threshold, is what parity verifies.


@register(
    "semdedup_prune",
    extra=True,
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding,
               {l2_norm_sql('embedding')} AS nrm
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS ce, nrm AS cnrm
        FROM e WHERE vec_id % {CENTROID_MOD} = 0
    ),
    assign AS (
        SELECT e.vec_id, e.embedding, e.nrm, c.cid
        FROM e JOIN cent c ON TRUE
        QUALIFY row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY ROUND({cosine_sql('e.embedding', 'c.ce')}, 6)
                DESC, c.cid
        ) = 1
    ),
    sims AS (
        SELECT a.vec_id, b.vec_id AS other_id,
               ROUND({cosine_sql('a.embedding', 'b.embedding')}, 6) AS s
        FROM assign a JOIN assign b
          ON a.cid = b.cid AND a.vec_id <> b.vec_id
    ),
    agg AS (
        SELECT vec_id,
               CAST(COUNT(*) FILTER (WHERE s >= {SEMDEDUP_T})
                   AS BIGINT) AS n_dups,
               CAST(COUNT(*) FILTER (
                   WHERE s >= {SEMDEDUP_T} AND other_id < vec_id)
                   AS BIGINT) AS n_earlier_dups,
               MAX(s) AS max_sim
        FROM sims GROUP BY vec_id
    )
    SELECT a.vec_id, a.cid,
           COALESCE(g.n_dups, 0) AS n_dups,
           COALESCE(g.max_sim, -1.0) AS max_sim,
           CAST(COALESCE(g.n_earlier_dups, 0) = 0 AS INT) AS is_kept
    FROM assign a LEFT JOIN agg g USING (vec_id)
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — semantic dedup by
    cluster-then-prune: assign every embedding to its nearest centroid
    (broadcast argmax, the IVF kernel), compare pairs ONLY within a
    cluster, and drop any item that has an over-threshold neighbor
    with a smaller id (one representative per semantic-dup set
    survives; the paper keeps the item farthest from the centroid —
    first-id is the deterministic stand-in that hash-verifies). Emits
    per item: cluster, over-threshold neighbor count, max similarity,
    keep flag.

    Scale: the pair stage is cluster-blocked (Q·N/K, the SemDeDup
    point: clustering makes semantic dedup sub-quadratic); pairs carry
    ids + one double, embeddings join back never — and the cluster is
    the natural partition key at 100 TB."""
    e = table(spark, sf_dir, "embeddings").withColumn(
        "nrm", l2_norm("embedding")
    )
    cent = F.broadcast(
        e.filter(F.col("vec_id") % CENTROID_MOD == 0).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("ce"),
            F.col("nrm").alias("cnrm"),
        )
    )
    aw = Window.partitionBy("vec_id").orderBy(
        F.col("cscore").desc(), F.col("cid")
    )
    assign = (
        e.crossJoin(cent)
        .withColumn(
            "cscore",
            F.round(dot("embedding", "ce") / (F.col("nrm") * F.col("cnrm")), 6),
        )
        .withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") == 1)
        .select("vec_id", "embedding", "nrm", "cid")
    )
    a = assign.alias("a")
    b = assign.select(
        F.col("vec_id").alias("other_id"),
        F.col("embedding").alias("be"),
        F.col("nrm").alias("bnrm"),
        F.col("cid").alias("bcid"),
    )
    sims = (
        a.join(b, (F.col("cid") == F.col("bcid"))
               & (F.col("vec_id") != F.col("other_id")))
        .select(
            "vec_id",
            "other_id",
            F.round(
                dot("embedding", "be") / (F.col("nrm") * F.col("bnrm")), 6
            ).alias("s"),
        )
    )
    over = F.col("s") >= SEMDEDUP_T
    agg = sims.groupBy("vec_id").agg(
        F.count(F.when(over, 1)).cast("bigint").alias("n_dups"),
        F.count(
            F.when(over & (F.col("other_id") < F.col("vec_id")), 1)
        ).cast("bigint").alias("n_earlier_dups"),
        F.max("s").alias("max_sim"),
    )
    return assign.join(agg, "vec_id", "left").select(
        "vec_id",
        "cid",
        F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
        F.coalesce("max_sim", F.lit(-1.0)).alias("max_sim"),
        (F.coalesce("n_earlier_dups", F.lit(0)) == 0)
        .cast("int")
        .alias("is_kept"),
    )


@register(
    "hard_negative_mining",
    extra=True,
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {l2_norm_sql('embedding')} AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel,
                 embedding AS qe, nrm AS qnrm
          FROM e WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
        SELECT q.query_id, q.qlabel, e.vec_id, e.label,
               ROUND({cosine_sql('q.qe', 'e.embedding')}, 6) AS s
        FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    neg AS (
        SELECT query_id, vec_id AS neg_id, s AS neg_score
        FROM scored WHERE label <> qlabel
        QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY s DESC, vec_id) = 1
    ),
    pos AS (
        SELECT query_id, vec_id AS pos_id, s AS pos_score
        FROM scored WHERE label = qlabel
        QUALIFY row_number() OVER (
            PARTITION BY query_id ORDER BY s DESC, vec_id) = 1
    )
    SELECT n.query_id, p.pos_id, p.pos_score, n.neg_id, n.neg_score,
           ROUND(p.pos_score - n.neg_score, 6) AS margin
    FROM neg n JOIN pos p USING (query_id)
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data prep: for every query vector, mine
    the HARDEST negative (highest-cosine item with a DIFFERENT label)
    and the strongest positive (same label), emitting the margin — the
    quantity a triplet/InfoNCE curriculum sorts by. One broadcast of
    the query set over the corpus (the sim_search_cosine kernel) with
    a label predicate split into two argmax windows; deterministic
    tie-breaks make even the picked ids hash-stable. At 100 TB the
    exact scorer swaps for the IVF/PQ shortlist and the argmax
    windows are unchanged — mining cost tracks the ANN budget, not
    the corpus."""
    e = table(spark, sf_dir, "embeddings").withColumn(
        "nrm", l2_norm("embedding")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            "vec_id",
            "label",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("vec_id")
    )
    neg = (
        scored.filter(F.col("label") != F.col("qlabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.col("s").alias("neg_score"),
        )
    )
    pos = (
        scored.filter(F.col("label") == F.col("qlabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("pos_id"),
            F.col("s").alias("pos_score"),
        )
    )
    return neg.join(pos, "query_id").select(
        "query_id",
        "pos_id",
        "pos_score",
        "neg_id",
        "neg_score",
        F.round(F.col("pos_score") - F.col("neg_score"), 6).alias("margin"),
    )


EVAL_K = 10  # retrieval-eval cutoff


@register(
    "retrieval_eval_mrr",
    extra=True,
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {l2_norm_sql('embedding')} AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel,
                 embedding AS qe, nrm AS qnrm
          FROM e WHERE vec_id % {QUERY_MOD} = 0),
    ranked AS (
        SELECT q.query_id, q.qlabel, e.label,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND({cosine_sql('q.qe', 'e.embedding')}, 6)
                       DESC, e.vec_id
               ) AS rnk
        FROM q JOIN e ON e.vec_id <> q.query_id
    )
    SELECT query_id,
           CAST(COALESCE(MIN(rnk) FILTER (
               WHERE label = qlabel AND rnk <= {EVAL_K}), 0)
               AS BIGINT) AS first_rel_rank,
           CAST(COUNT(*) FILTER (
               WHERE label = qlabel AND rnk <= {EVAL_K})
               AS BIGINT) AS n_rel_at_k,
           ROUND(CASE WHEN MIN(rnk) FILTER (
                   WHERE label = qlabel AND rnk <= {EVAL_K}) IS NULL
               THEN 0.0
               ELSE 1.0 / MIN(rnk) FILTER (
                   WHERE label = qlabel AND rnk <= {EVAL_K}) END, 6)
               AS reciprocal_rank
    FROM ranked GROUP BY query_id, qlabel
    """,
)
def retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval EVALUATION — the other half of the ANN story: per
    query, the rank of the first same-label item in the exact top-10
    (labels as relevance ground truth), hits@10, and the reciprocal
    rank (mean over queries = MRR@10, the metric every retrieval
    curriculum reports). One broadcast-query scoring pass + a rank
    window per query; swap the exact scorer for any of the ANN paths
    and the SAME operator measures THEIR quality — this is how the
    recall floors in bench --recall generalize to labeled data."""
    e = table(spark, sf_dir, "embeddings").withColumn(
        "nrm", l2_norm("embedding")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("vec_id")
    )
    ranked = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            "label",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("s"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= EVAL_K)
    )
    rel = F.col("label") == F.col("qlabel")
    first = F.min(F.when(rel, F.col("rnk")))
    return ranked.groupBy("query_id").agg(
        F.coalesce(first, F.lit(0)).cast("bigint").alias("first_rel_rank"),
        F.count(F.when(rel, 1)).cast("bigint").alias("n_rel_at_k"),
        F.round(
            F.when(first.isNull(), F.lit(0.0)).otherwise(1.0 / first), 6
        ).alias("reciprocal_rank"),
    )

# nDCG@10 machinery: the log2 discount is pre-scaled to exact integer
# weights (round(1e6 / log2(rank+1)) for ranks 1..10) so the per-query
# DCG is an ORDER-INDEPENDENT integer sum in both engines — the BM25
# trick applied to ranking metrics (float log/sum order would differ
# between Spark's partial aggregation and DuckDB's). _NDCG_P holds the
# ideal-DCG prefix sums for 1..10 relevant items.
_NDCG_W = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)
_NDCG_P = (
    1000000, 1630930, 2130930, 2561607, 2948460,
    3304667, 3638000, 3953465, 4254495, 4543560,
)


@register(
    "retrieval_eval_ndcg",
    extra=True,
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {l2_norm_sql('embedding')} AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel,
                 embedding AS qe, nrm AS qnrm
          FROM e WHERE vec_id % {QUERY_MOD} = 0),
    nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
           FROM e GROUP BY label),
    ranked AS (
        SELECT q.query_id, q.qlabel, e.label,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND({cosine_sql('q.qe', 'e.embedding')}, 6)
                       DESC, e.vec_id
               ) AS rnk
        FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    d AS (
        SELECT query_id, qlabel,
               CAST(SUM(CASE WHEN label = qlabel
                    THEN ({list(_NDCG_W)})[rnk] ELSE 0 END)
                   AS BIGINT) AS dcg_s
        FROM ranked WHERE rnk <= {EVAL_K}
        GROUP BY query_id, qlabel
    )
    SELECT d.query_id,
           CAST(nl.n_label - 1 AS BIGINT) AS n_rel,
           ROUND(d.dcg_s / 1000000.0::DOUBLE, 6) AS dcg,
           ROUND(CASE WHEN nl.n_label <= 1 THEN 0.0::DOUBLE
                 ELSE CAST(d.dcg_s AS DOUBLE)
                      / ({list(_NDCG_P)})[LEAST(nl.n_label - 1, {EVAL_K})]
                 END, 6) AS ndcg
    FROM d JOIN nl ON d.qlabel = nl.label
    """,
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 retrieval evaluation (labels as binary relevance) —
    complements ``retrieval_eval_mrr``: MRR scores only the FIRST
    relevant hit, nDCG scores the whole ranked list with a graded
    position discount, which is the metric that moves when an ANN
    path returns the right set in the wrong order. The log2 discount
    is integer-pre-scaled (module constants) so DCG is an exact
    integer sum in both engines; the ideal DCG divides once at the
    end (n_label from a broadcast per-label count; same broadcast-
    query × corpus scoring pass as the MRR twin, so the 100 TB shape
    is unchanged)."""
    e = table(spark, sf_dir, "embeddings").withColumn(
        "nrm", l2_norm("embedding")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    nl = e.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_label")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("vec_id")
    )
    ranked = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            "label",
            "vec_id",
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("s"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= EVAL_K)
    )
    warr = F.array(*[F.lit(x) for x in _NDCG_W])
    parr = F.array(*[F.lit(x) for x in _NDCG_P])
    rel = F.col("label") == F.col("qlabel")
    dcg = ranked.groupBy("query_id", "qlabel").agg(
        F.sum(
            F.when(rel, F.element_at(warr, F.col("rnk"))).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("dcg_s")
    )
    return dcg.join(F.broadcast(nl), dcg.qlabel == nl.label).select(
        "query_id",
        (F.col("n_label") - 1).cast("bigint").alias("n_rel"),
        F.round(F.col("dcg_s") / F.lit(1000000.0), 6).alias("dcg"),
        F.round(
            F.when(F.col("n_label") <= 1, F.lit(0.0)).otherwise(
                F.col("dcg_s").cast("double")
                / F.element_at(
                    parr,
                    F.least(
                        F.col("n_label") - 1, F.lit(EVAL_K)
                    ).cast("int"),
                )
            ),
            6,
        ).alias("ndcg"),
    )


# Hybrid retrieval fusion constants: RRF_K0 is the standard rank
# smoothing (Cormack et al. 2009), RRF_POOL the per-leg candidate pool
# depth, FUSE_K the fused output cutoff.
RRF_K0 = 60
RRF_POOL = 20
FUSE_K = 10


@register(
    "hybrid_rrf",
    extra=True,
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding, {l2_norm_sql('embedding')} AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qnrm
          FROM e WHERE vec_id % {QUERY_MOD} = 0),
    vranked AS (
        SELECT q.query_id, e.vec_id AS cand,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND({cosine_sql('q.qe', 'e.embedding')}, 6)
                       DESC, e.vec_id
               ) AS vec_rank
        FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    v AS (SELECT query_id, cand, vec_rank FROM vranked
          WHERE vec_rank <= {RRF_POOL}),
    tok AS (
        SELECT doc_id,
               unnest(list_distinct(
                   regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term
        FROM documents
    ),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    idf AS (
        SELECT term,
               CAST(ROUND(1000000.0::DOUBLE
                    * (s.n_docs - COUNT(*) + 0.5::DOUBLE)
                    / (COUNT(*) + 0.5::DOUBLE)) AS BIGINT) AS idf_s
        FROM tok CROSS JOIN stats s GROUP BY term, s.n_docs
    ),
    qtok AS (SELECT doc_id AS query_id, term FROM tok
             WHERE doc_id % {QUERY_MOD} = 0),
    lexs AS (
        SELECT qt.query_id, t.doc_id AS cand,
               CAST(SUM(i.idf_s) AS BIGINT) AS lex_s
        FROM tok t
        JOIN qtok qt ON t.term = qt.term
        JOIN idf i ON t.term = i.term
        WHERE t.doc_id <> qt.query_id
        GROUP BY qt.query_id, t.doc_id
    ),
    lranked AS (
        SELECT query_id, cand,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY lex_s DESC, cand
               ) AS lex_rank
        FROM lexs
    ),
    l AS (SELECT query_id, cand, lex_rank FROM lranked
          WHERE lex_rank <= {RRF_POOL}),
    fused AS (
        SELECT COALESCE(v.query_id, l.query_id) AS query_id,
               COALESCE(v.cand, l.cand) AS doc_id,
               CAST(COALESCE(v.vec_rank, 0) AS BIGINT) AS vec_rank,
               CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
               ROUND(COALESCE(1.0::DOUBLE / ({RRF_K0} + v.vec_rank), 0.0)
                     + COALESCE(1.0::DOUBLE / ({RRF_K0} + l.lex_rank), 0.0),
                     6) AS rrf_score
        FROM v FULL OUTER JOIN l
          ON v.query_id = l.query_id AND v.cand = l.cand
    )
    SELECT query_id, doc_id, vec_rank, lex_rank, rrf_score,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
           ) AS BIGINT) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {FUSE_K}
    """,
)
def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009) — the production RAG shape: a VECTOR leg (exact cosine
    top-20 per query over embeddings) and a LEXICAL leg (idf-weighted
    distinct-token overlap over documents, an inverted-index
    intersection) fused by rrf = Σ 1/(60 + rank), top-10 per query.
    Uses doc_id = vec_id row alignment of the test corpus and the
    same query set as the retrieval evals (vec_id % QUERY_MOD).

    Cross-engine exactness: the lexical score is an integer sum of
    pre-scaled Robertson idf weights (round(1e6·(N-df+.5)/(df+.5)) —
    no log, no float-sum reorder), and the fused score is a fixed
    two-term sum rounded to 6 before ranking.

    100 TB shape: the lexical leg joins the corpus token postings to
    a BROADCAST query-token list on term — the inverted-index probe;
    df/idf and corpus stats also broadcast. The vector leg is the
    shared broadcast-queries × corpus scan. Nothing but (query, cand,
    rank) id-rows ever shuffles; per-leg pools bound the fusion join
    at Q × RRF_POOL rows per side."""
    from eventstream_notify_spark.operators.text import tokens_col

    e = table(spark, sf_dir, "embeddings").withColumn(
        "nrm", l2_norm("embedding")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnrm"),
        )
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("cand")
    )
    v = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand"),
            F.round(
                dot("qe", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("s"),
        )
        .withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= RRF_POOL)
        .select("query_id", "cand", "vec_rank")
    )
    d = table(spark, sf_dir, "documents")
    # r13 opt (guide §5): three consumers (idf, the query-token list,
    # the postings probe) each re-ran the tokenize+explode over
    # documents — one lazy checkpoint pays the corpus tokenize once
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col())).alias("term")
    ).localCheckpoint(eager=False)
    n_docs = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    idf = (
        tok.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(
                F.lit(1000000.0)
                * (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            )
            .cast("bigint")
            .alias("idf_s"),
        )
    )
    qtok = tok.filter(F.col("doc_id") % QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("lex_s").desc(), F.col("cand")
    )
    lex = (
        tok.join(F.broadcast(qtok), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(idf), "term")
        .groupBy("query_id", F.col("doc_id").alias("cand"))
        .agg(F.sum("idf_s").cast("bigint").alias("lex_s"))
        .withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= RRF_POOL)
        .select("query_id", "cand", "lex_rank")
    )
    fused = v.join(lex, ["query_id", "cand"], "full").select(
        "query_id",
        F.col("cand").alias("doc_id"),
        F.coalesce(F.col("vec_rank"), F.lit(0))
        .cast("bigint")
        .alias("vec_rank"),
        F.coalesce(F.col("lex_rank"), F.lit(0))
        .cast("bigint")
        .alias("lex_rank"),
        F.round(
            F.coalesce(1.0 / (RRF_K0 + F.col("vec_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K0 + F.col("lex_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn(
            "fused_rank", F.row_number().over(wf).cast("bigint")
        )
        .filter(F.col("fused_rank") <= FUSE_K)
    )


# --------------------------------------------------- PCA (power it.)

PCA_SCALE = 10_000  # per-row fixed-point quantum for moment sums
PCA_COMPONENTS = 2
PCA_ITERS = 100


def pca_power_components(
    s: "object", m: "object", n: int
) -> list[tuple[int, int, float, float, float]]:
    """Driver-side half of the PCA: covariance from EXACT integer
    moments (S = sum q q^T, m = sum q, n rows; q = floor(v*SCALE+.5)),
    then power iteration with deflation for the top components.
    Deterministic end to end: fixed start vector, fixed iteration
    count, sign fixed by the largest-|loading| coordinate. Shared by
    the Spark operator and its numpy twin test.

    Every reduction is an explicit LEFT-TO-RIGHT float64 fold (no
    BLAS): BLAS matvec/dot pick unspecified summation orders, and the
    DuckDB oracle replays this kernel op-for-op with list_reduce —
    defined order is what makes the iterative solver SQL-checkable.
    Returns rows (component, dim, loading, eigenvalue,
    explained_ratio)."""
    import math

    d = len(m)
    nd = float(n)
    scale2 = float(PCA_SCALE) ** 2
    cov = [
        [
            ((float(s[i][j]) / nd) - (float(m[i]) * float(m[j])) / (nd * nd))
            / scale2
            for j in range(d)
        ]
        for i in range(d)
    ]

    def mv(mat: list[list[float]], vec: list[float]) -> list[float]:
        out = []
        for i in range(d):
            acc = mat[i][0] * vec[0]
            for j in range(1, d):
                acc = acc + mat[i][j] * vec[j]
            out.append(acc)
        return out

    trace = cov[0][0]
    for i in range(1, d):
        trace = trace + cov[i][i]
    rows: list[tuple[int, int, float, float, float]] = []
    work = [row[:] for row in cov]
    for comp in range(PCA_COMPONENTS):
        v = [1.0 / math.sqrt(float(d))] * d
        for _ in range(PCA_ITERS):
            w = mv(work, v)
            acc = w[0] * w[0]
            for i in range(1, d):
                acc = acc + w[i] * w[i]
            nv = math.sqrt(acc)
            if nv == 0.0:
                break
            v = [x / nv for x in w]
        t = mv(work, v)
        lam = v[0] * t[0]
        for i in range(1, d):
            lam = lam + v[i] * t[i]
        absv = [abs(x) for x in v]
        if v[absv.index(max(absv))] < 0:
            v = [-x for x in v]
        for dim in range(d):
            rows.append(
                (
                    comp + 1,
                    dim,
                    round(v[dim], 6),
                    round(lam, 6),
                    round(lam / trace, 6) if trace > 0 else 0.0,
                )
            )
        work = [
            [work[i][j] - lam * (v[i] * v[j]) for j in range(d)]
            for i in range(d)
        ]
    return rows


# The power iteration replayed in DuckDB: covariance from the same
# exact integer moments, then two 100-step recursions (one per
# component). The work matrix W rides INSIDE the recursion state —
# a CTE referenced from the recursive arm would be re-evaluated
# (re-aggregated) on every iteration. list_reduce is a left fold,
# matching the kernel's explicit left-to-right accumulation.
PCA_ORACLE = f"""
    WITH RECURSIVE qr AS (
      SELECT list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {PCA_SCALE} + 0.5)
                       AS BIGINT)) AS q
      FROM embeddings
    ),
    idx AS (SELECT UNNEST(range(1,
                (SELECT len(q) FROM qr LIMIT 1) + 1)) AS i),
    nrow AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM qr),
    mvec AS (
      SELECT i.i AS i, CAST(SUM(q[i.i]) AS DOUBLE) AS mi
      FROM qr, idx i GROUP BY 1
    ),
    cells AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(q[a.i] * q[b.i]) AS DOUBLE) AS s
      FROM qr, idx a, idx b GROUP BY 1, 2
    ),
    covm AS (
      SELECT list(r ORDER BY i) AS W, len(list(r)) AS d
      FROM (
        SELECT c.i AS i,
               list(((c.s / n.nd) - (ma.mi * mb.mi) / (n.nd * n.nd))
                    / {float(PCA_SCALE) ** 2!r} ORDER BY c.j) AS r
        FROM cells c
        JOIN mvec ma ON c.i = ma.i
        JOIN mvec mb ON c.j = mb.i
        CROSS JOIN nrow n
        GROUP BY c.i
      )
    ),
    it1 AS (
      SELECT 0 AS it, W, d,
             list_transform(range(1, d + 1),
                            x -> 1.0 / sqrt(CAST(d AS DOUBLE))) AS v
      FROM covm
      UNION ALL
      SELECT it + 1, W, d,
             (SELECT list_transform(t.w, x -> x / sqrt(list_reduce(
                        list_transform(t.w, y -> y * y), (a, b) -> a + b)))
              FROM (SELECT list_transform(range(1, it1.d + 1),
                      i -> list_reduce(list_transform(range(1, it1.d + 1),
                             j -> it1.W[i][j] * it1.v[j]),
                           (a, b) -> a + b)) AS w) t)
      FROM it1 WHERE it < {PCA_ITERS}
    ),
    lam1 AS (
      SELECT f.v AS v, f.W AS W, f.d AS d,
             (SELECT list_reduce(list_transform(range(1, f.d + 1),
                       i -> f.v[i] * t.tv[i]), (a, b) -> a + b)
              FROM (SELECT list_transform(range(1, f.d + 1),
                      i -> list_reduce(list_transform(range(1, f.d + 1),
                             j -> f.W[i][j] * f.v[j]),
                           (a, b) -> a + b)) AS tv) t) AS lam
      FROM (SELECT * FROM it1 WHERE it = {PCA_ITERS}) f
    ),
    sv1 AS (
      SELECT CASE WHEN v[list_position(list_transform(v, x -> abs(x)),
                         list_max(list_transform(v, x -> abs(x))))] < 0
                  THEN list_transform(v, x -> -x) ELSE v END AS v,
             lam,
             list_transform(range(1, d + 1),
               i -> list_transform(range(1, d + 1),
                      j -> W[i][j] - lam * (v[i] * v[j]))) AS W2,
             d
      FROM lam1
    ),
    it2 AS (
      SELECT 0 AS it, W2 AS W, d,
             list_transform(range(1, d + 1),
                            x -> 1.0 / sqrt(CAST(d AS DOUBLE))) AS v
      FROM sv1
      UNION ALL
      SELECT it + 1, W, d,
             (SELECT list_transform(t.w, x -> x / sqrt(list_reduce(
                        list_transform(t.w, y -> y * y), (a, b) -> a + b)))
              FROM (SELECT list_transform(range(1, it2.d + 1),
                      i -> list_reduce(list_transform(range(1, it2.d + 1),
                             j -> it2.W[i][j] * it2.v[j]),
                           (a, b) -> a + b)) AS w) t)
      FROM it2 WHERE it < {PCA_ITERS}
    ),
    lam2 AS (
      SELECT f.v AS v, f.d AS d,
             (SELECT list_reduce(list_transform(range(1, f.d + 1),
                       i -> f.v[i] * t.tv[i]), (a, b) -> a + b)
              FROM (SELECT list_transform(range(1, f.d + 1),
                      i -> list_reduce(list_transform(range(1, f.d + 1),
                             j -> f.W[i][j] * f.v[j]),
                           (a, b) -> a + b)) AS tv) t) AS lam
      FROM (SELECT * FROM it2 WHERE it = {PCA_ITERS}) f
    ),
    sv2 AS (
      SELECT CASE WHEN v[list_position(list_transform(v, x -> abs(x)),
                         list_max(list_transform(v, x -> abs(x))))] < 0
                  THEN list_transform(v, x -> -x) ELSE v END AS v,
             lam
      FROM lam2
    ),
    tr AS (
      SELECT list_reduce(list_transform(range(1, d + 1), i -> W[i][i]),
                         (a, b) -> a + b) AS trace
      FROM covm
    ),
    comps AS (
      SELECT 1 AS component, v, lam FROM sv1
      UNION ALL
      SELECT 2 AS component, v, lam FROM sv2
    )
    SELECT c.component,
           CAST(i.i - 1 AS INTEGER) AS dim,
           ROUND(c.v[i.i], 6) AS loading,
           ROUND(c.lam, 6) AS eigenvalue,
           CASE WHEN t.trace > 0 THEN ROUND(c.lam / t.trace, 6)
                ELSE 0.0 END AS explained_ratio
    FROM comps c, idx i, tr t
    """


@register("vec_pca_power", extra=True, oracle=PCA_ORACLE)
def vec_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED PCA over the embedding corpus — the linear-algebra
    member of the vectors family (whitening / decorrelation /
    dimensionality reduction ahead of ANN indexing): top-2 principal
    components by power iteration with deflation.

    Shape: the distributed stage is ONE pass computing exact integer
    moments — each row quantizes to q = round(v*1e4) and contributes
    q q^T (int64, overflow-safe per partition up to ~1e8 rows) via a
    mapInPandas partial, and the cross-partition reduce sums
    decimal(38,0) cells keyed by (i, j) — order-independent integer
    arithmetic, the als_implicit discipline, so the covariance is
    bit-identical under any partitioning. The 64x64 eigenproblem then
    solves on the driver (fixed start, 100 iterations, deterministic
    sign) — at ANY corpus size the driver sees d^2 integers, never
    rows. Oracle-paired (was rows-only): the driver kernel uses
    explicit left-to-right float64 folds instead of BLAS, so a DuckDB
    recursive CTE carrying the work matrix in its state replays all
    200 power-iteration steps bit-for-bit; also pinned EXACTLY by a
    numpy twin recomputing the moments single-node.

    Reference scope: beyond-reference extension (embedding analytics
    family)."""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")

    def moments(batches):
        s = None
        m = None
        n = 0
        for pdf in batches:
            vs = np.stack(pdf["embedding"].values).astype(np.float64)
            # floor(x+0.5), not rint: rint rounds half-to-even, which
            # no SQL engine exposes — half-up keeps the quantization
            # replayable in the DuckDB oracle
            q = np.floor(vs * PCA_SCALE + 0.5).astype(np.int64)
            s = q.T @ q if s is None else s + q.T @ q
            m = q.sum(axis=0) if m is None else m + q.sum(axis=0)
            n += len(q)
        if n == 0:
            return
        d = s.shape[0]
        i_idx, j_idx, vals = [], [], []
        for i in range(d):
            for j in range(d):
                i_idx.append(i)
                j_idx.append(j)
                vals.append(int(s[i, j]))
        for i in range(d):
            i_idx.append(i)
            j_idx.append(-1)
            vals.append(int(m[i]))
        i_idx.append(-1)
        j_idx.append(-1)
        vals.append(n)
        yield pd.DataFrame({"i": i_idx, "j": j_idx, "v": vals})

    cells = (
        emb.select("embedding")
        .mapInPandas(moments, "i int, j int, v bigint")
        .groupBy("i", "j")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("v"))
        .collect()
    )
    d = 1 + max(r["i"] for r in cells)
    s = [[0] * d for _ in range(d)]
    m = [0] * d
    n = 0
    for r in cells:
        i, j, v = r["i"], r["j"], int(r["v"])
        if i == -1:
            n = v
        elif j == -1:
            m[i] = v
        else:
            s[i][j] = v
    rows = pca_power_components(s, m, n)
    return spark.createDataFrame(
        rows,
        "component int, dim int, loading double, "
        "eigenvalue double, explained_ratio double",
    )


# ---------------------------------------- late-interaction retrieval

MAXSIM_TOKENS = 4  # token vectors per embedding (64 dims -> 4 x 16)
MAXSIM_DIM = 16


def _tok_dot_sql(a: str, b: str, qt: int, dt: int) -> str:
    qo, do = qt * MAXSIM_DIM, dt * MAXSIM_DIM
    return (
        f"list_sum(list_transform(range(1, {MAXSIM_DIM} + 1), "
        f"i -> CAST({a}[{qo} + i] AS DOUBLE)"
        f" * CAST({b}[{do} + i] AS DOUBLE)))"
    )


def _maxsim_sql(a: str, b: str) -> str:
    terms = [
        "greatest("
        + ", ".join(
            _tok_dot_sql(a, b, qt, dt) for dt in range(MAXSIM_TOKENS)
        )
        + ")"
        for qt in range(MAXSIM_TOKENS)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


@register(
    "sim_search_maxsim",
    extra=True,
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               ROUND({_maxsim_sql('q.qe', 'e.embedding')}, 6) AS score
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, score
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, vec_id
    ) <= {TOP_K}
    """,
)
def sim_search_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-INTERACTION retrieval (the ColBERT MaxSim operator,
    Khattab & Zaharia 2020): each embedding is read as
    4 token vectors of 16 dims, and
    score(q, d) = sum over query tokens of the MAX dot product
    against any doc token — token-level matching that single-vector
    cosine collapses away. This is the exact brute-force baseline
    (the sim_search_cosine counterpart for multi-vector scoring);
    the production scale path prunes candidates per query TOKEN with
    any of the ANN tiers, then pays MaxSim only on the shortlist.

    Cross-engine exact: every token dot is the same 16-term
    left-to-right double fold as the cosine family, max-of-4 and the
    4-term sum are fixed-order IEEE ops, ties break on vec_id.

    r14 (guide §4.2/§4.3): the 16 interpreted-HOF token dots per pair
    moved into ONE mapInArrow/numpy block kernel over the corpus scan
    (the mutual_knn_pairs kernel pattern). Bit-exactness argument —
    this query is HASH-oracle-paired, so the kernel must reproduce the
    JVM fold exactly, not approximately:
    - embeddings are raw float32; each float32→float64 cast is exact
      and each product of two such doubles is exact (24+24 = 48
      mantissa bits < 53), so the only rounding anywhere is in the
      16 accumulating ADDS of each token dot;
    - the kernel accumulates dim-by-dim over (query × doc) MATRICES —
      `acc += q[:,i] ⊗ d[:,i]` for i = 1..16 — which performs the
      IDENTICAL left-to-right IEEE-754 add sequence per pair as the
      JVM `aggregate` fold (vectorized across pairs, sequential across
      dims; no BLAS matmul, no pairwise reassociation);
    - max-of-4 is order-free, the 4-term token sum is accumulated in
      the same fixed order, and ROUND(·, 6) stays in Spark (JVM
      BigDecimal HALF_UP semantics, untouched).
    The kernel also pre-prunes each batch to the per-query top-K with
    a 2e-6 raw-score margin: HALF_UP rounding to the 1e-6 grid is
    monotone and moves a value < 5e-7, so a row whose raw score is
    > 2e-6 below its block's K-th raw score is strictly below the
    K-th ROUNDED score and can never enter the global top-K — the
    window's input shrinks from Q×N rows to Q×(K+ε) per batch while
    the returned rows are provably identical.
    Scale: query set broadcasts (same driver posture as the previous
    broadcast hash join build side); corpus scans once; the per-pair
    score matrix lives only inside one Arrow batch — no UDF-per-row,
    no shuffle beyond the (now tiny) top-k window.
    """
    import numpy as np

    e = table(spark, sf_dir, "embeddings")
    qpd = (
        e.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select("vec_id", "embedding")
        .toPandas()
    )
    qids = qpd["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.array(
        [np.asarray(v, dtype=np.float32) for v in qpd["embedding"]],
        dtype=np.float32,
    ).astype(np.float64)  # float32 -> float64: exact
    bq = spark.sparkContext.broadcast((qids, qmat))

    def maxsim_kernel(batches):
        import numpy as np  # executor-side
        import pyarrow as pa

        q_ids, Q = bq.value
        nq = len(q_ids)
        out_schema = pa.schema(
            [
                ("query_id", pa.int64()),
                ("vec_id", pa.int64()),
                ("score", pa.float64()),
            ]
        )
        for batch in batches:
            nd = batch.num_rows
            if nd == 0 or nq == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            D = (
                batch.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)  # float32 values: exact widen
                .reshape(nd, MAXSIM_TOKENS * MAXSIM_DIM)
            )
            score = None
            for qt in range(MAXSIM_TOKENS):
                best = None
                for dt in range(MAXSIM_TOKENS):
                    # left-to-right fold across the 16 dims: each +=
                    # is the same IEEE add the JVM fold performs
                    acc = np.zeros((nq, nd), dtype=np.float64)
                    qo, do = qt * MAXSIM_DIM, dt * MAXSIM_DIM
                    for i in range(MAXSIM_DIM):
                        acc += Q[:, qo + i][:, None] * D[None, :, do + i]
                    best = acc if best is None else np.maximum(best, acc)
                score = best if score is None else score + best
            # self-pairs are excluded by contract
            self_mask = q_ids[:, None] == ids[None, :]
            if self_mask.any():
                score[self_mask] = -np.inf
            oq, ov, os_ = [], [], []
            k = TOP_K
            for r in range(nq):
                row = score[r]
                if nd > k:
                    kth = np.partition(row, -k)[-k]
                    keep = np.flatnonzero(row >= kth - 2e-6)
                else:
                    keep = np.flatnonzero(row > -np.inf)
                keep = keep[row[keep] > -np.inf]
                oq.append(np.full(keep.size, q_ids[r], dtype=np.int64))
                ov.append(ids[keep])
                os_.append(row[keep])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(oq), type=pa.int64()),
                    pa.array(np.concatenate(ov), type=pa.int64()),
                    pa.array(np.concatenate(os_), type=pa.float64()),
                ],
                schema=out_schema,
            )

    scored = (
        e.select("vec_id", "embedding")
        .mapInArrow(
            maxsim_kernel, "query_id long, vec_id long, score double"
        )
        .select("query_id", "vec_id", F.round("score", 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


# ------------------------------------------------ embedding drift

MMD_SCALE = 1_000_000  # fixed-point quantum for the moment sums


@register(
    "embedding_drift_mmd",
    extra=True,
    oracle=f"""
    WITH q AS (
        SELECT vec_id, vec_id % 2 AS grp,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {MMD_SCALE})
                             AS BIGINT)) AS eq
        FROM embeddings
    ),
    pos AS (
        SELECT grp, u.i AS pos, u.x
        FROM q, LATERAL (
            SELECT UNNEST(eq) AS x,
                   UNNEST(range(1, len(eq) + 1)) AS i
        ) u
    ),
    means AS (
        SELECT grp, pos,
               CAST(SUM(x) AS DOUBLE) / COUNT(*) / {MMD_SCALE}.0 AS m,
               COUNT(*) AS n
        FROM pos GROUP BY 1, 2
    ),
    sides AS (
        SELECT a.pos, a.m AS ma, b.m AS mb, a.n AS na, b.n AS nb
        FROM (SELECT * FROM means WHERE grp = 0) a
        JOIN (SELECT * FROM means WHERE grp = 1) b USING (pos)
    ),
    gaps AS (
        SELECT list((ma - mb) * (ma - mb) ORDER BY pos) AS sq,
               list(abs(ma - mb) ORDER BY pos) AS ab,
               MAX(na) AS n_a, MAX(nb) AS n_b
        FROM sides
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           list_sum(sq) AS mmd2_linear,
           list_max(ab) AS max_dim_gap,
           CAST(list_position(ab, list_max(ab)) - 1 AS BIGINT)
               AS argmax_dim
    FROM gaps
    """,
)
def embedding_drift_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING DRIFT between two corpus halves by linear-kernel
    maximum mean discrepancy — MMD^2 with k(x,y) = x.y reduces to
    ||mean_A - mean_B||^2 (Gretton et al. 2012), the one member of
    the MMD family that needs only FIRST moments, so the whole test
    statistic derives from exact integer sums: embeddings floor-
    quantize to 1e-6, per-group per-dim sums are int64, means are
    exactly-rounded divisions, and the squared-gap reduction is an
    ordered fold. Emits group sizes, MMD^2, and the worst-drifting
    dimension — the embedding-space companion to zx_ks_drift_test's
    scalar KS (drift in the representation a retrieval index serves
    is invisible to value-level tests).

    Scale: one posexplode aggregate (map-side combinable) folds the
    corpus to 2 x dims cells; everything after is driver-sized. The
    group key here is the deterministic vec_id parity (old/new batch
    stand-in); production swaps in ingestion day or source."""
    e = table(spark, sf_dir, "embeddings")
    q = e.select(
        (F.col("vec_id") % 2).alias("grp"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * MMD_SCALE).cast("bigint"),
        ).alias("eq"),
    )
    means = (
        q.select("grp", F.posexplode("eq").alias("pos", "x"))
        .groupBy("grp", "pos")
        .agg(
            (F.sum("x").cast("double") / F.count("*") / float(MMD_SCALE))
            .alias("m"),
            F.count("*").alias("n"),
        )
    )
    a = means.filter(F.col("grp") == 0).select(
        "pos", F.col("m").alias("ma"), F.col("n").alias("na")
    )
    b = means.filter(F.col("grp") == 1).select(
        "pos", F.col("m").alias("mb"), F.col("n").alias("nb")
    )
    sides = a.join(b, "pos")
    gaps = sides.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        ((F.col("ma") - F.col("mb"))
                         * (F.col("ma") - F.col("mb"))).alias("sqv"),
                    )
                )
            ),
            lambda s: s["sqv"],
        ).alias("sq"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", F.abs(F.col("ma") - F.col("mb")).alias("av"))
                )
            ),
            lambda s: s["av"],
        ).alias("ab"),
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
    )
    return gaps.select(
        F.col("n_a").cast("bigint"),
        F.col("n_b").cast("bigint"),
        F.aggregate("sq", F.lit(0.0), lambda acc, v: acc + v).alias(
            "mmd2_linear"
        ),
        F.array_max("ab").alias("max_dim_gap"),
        (F.array_position("ab", F.array_max("ab")) - 1)
        .cast("bigint")
        .alias("argmax_dim"),
    )


# ------------------------------------------------ k-center coreset


KCENTER_K = 8
_KC_D2 = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> (q.vec[i] - c.vec[i]) * (q.vec[i] - c.vec[i])), "
    "(a, b) -> a + b)"
)

KCENTER_ORACLE = f"""
WITH RECURSIVE quant AS (
    SELECT vec_id,
           ROW_NUMBER() OVER (ORDER BY vec_id) AS idx,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vec
    FROM embeddings
), seed AS (
    SELECT vec_id, vec FROM quant WHERE idx = 1
), it AS (
    SELECT 0 AS t,
           [struct_pack(pick := CAST(0 AS BIGINT),
                        id := s.vec_id,
                        r2 := CAST(0 AS BIGINT))] AS chosen,
           (SELECT list(list_reduce(list_transform(range(1, 65),
                       i -> (q.vec[i] - c.vec[i]) * (q.vec[i] - c.vec[i])),
                       (a, b) -> a + b) ORDER BY q.idx)
            FROM quant q, seed c) AS minds
    FROM seed s
    UNION ALL
    SELECT t + 1,
           list_append(chosen, struct_pack(
               pick := CAST(t + 1 AS BIGINT),
               id := (SELECT q.vec_id FROM quant q
                      WHERE q.idx = list_position(minds, list_max(minds))),
               r2 := list_max(minds))),
           (SELECT list(least(minds[q.idx], {_KC_D2}) ORDER BY q.idx)
            FROM quant q,
                 (SELECT q2.vec AS vec FROM quant q2
                  WHERE q2.idx = list_position(minds, list_max(minds))) c)
    FROM it WHERE t < {KCENTER_K - 1}
), fin AS (
    SELECT chosen, list_max(minds) AS cov
    FROM it WHERE t = {KCENTER_K - 1}
)
SELECT CAST(c['pick'] AS BIGINT) AS pick_order,
       CAST(c['id'] AS BIGINT) AS vec_id,
       CAST(c['r2'] AS BIGINT) AS sel_r2,
       CAST(cov AS BIGINT) AS covering_r2
FROM (SELECT UNNEST(chosen) AS c, cov FROM fin)
"""


@register("coreset_kcenter", extra=True, oracle=KCENTER_ORACLE)
def coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORESET SELECTION by greedy k-center (Gonzalez 1985) — the
    deterministic data-selection primitive behind diverse-subset
    picking (active learning seed sets, eval-set curation, prototype
    selection): repeatedly take the point FARTHEST from everything
    chosen so far. The greedy is a provable 2-approximation of the
    optimal covering radius, and unlike k-means it needs no RNG —
    byte-stable under retries, which is why selection pipelines
    prefer it.

    Exactness: coordinates quantize to 1e-6 units ONCE, so every
    distance is an exact int64 sum of squared integer deltas (order-
    free) and the argmax is over integers with a vec_id tie-break —
    the whole greedy trajectory is combinatorial, no float anywhere.
    The DuckDB twin replays it in one recursive CTE whose state is
    (chosen list, per-point min-distance list ordered by vec_id).

    Scale: k-1 rounds, each ONE scan computing least(mind, d2-to-new-
    center) and ONE TakeOrdered(1) argmax — no shuffle at all; the
    running min-distance column carries between rounds via lazy
    localCheckpoints (the graph_kcore posture) so round t never
    recomputes rounds 1..t-1. Selection cost is O(k * N / cores) with
    k fixed: at 100 TB the same 7 scans, just wider."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1e6).cast("bigint"),
        ).alias("q"),
    )

    def d2_expr(center: list[int]) -> F.Column:
        arr = "array({})".format(",".join(f"{int(v)}L" for v in center))
        return F.expr(
            f"aggregate(transform(q, (x, i) -> (x - {arr}[i]) * "
            f"(x - {arr}[i])), 0L, (a, x) -> a + x)"
        )

    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(0, int(seed.vec_id), 0)]
    cur = emb.withColumn("mind", d2_expr(seed.q))
    for t in range(1, KCENTER_K):
        cur = cur.localCheckpoint(eager=False)
        best = (
            cur.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1).collect()
        )[0]
        chosen.append((t, int(best.vec_id), int(best.mind)))
        cur = cur.withColumn(
            "mind", F.least(F.col("mind"), d2_expr(best.q))
        )
    covering = int(cur.agg(F.max("mind")).collect()[0][0])
    rows = [(p, vid, r2, covering) for p, vid, r2 in chosen]
    return spark.createDataFrame(
        rows,
        "pick_order bigint, vec_id bigint, sel_r2 bigint, "
        "covering_r2 bigint",
    )


# --------------------------------------------- mutual nearest pairs


_MNN_QDOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> a.q[i] * b.q[i]))"
)

MNN_ORACLE = f"""
WITH quant AS (
    SELECT vec_id, label,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q
    FROM embeddings
), scored AS (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           CAST(floor(
               CAST({_MNN_QDOT} AS DOUBLE)
               / (sqrt(CAST(list_sum(list_transform(a.q, x -> x * x))
                            AS DOUBLE))
                  * sqrt(CAST(list_sum(list_transform(b.q, x -> x * x))
                              AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS score_micro
    FROM quant a JOIN quant b ON a.vec_id <> b.vec_id
),
nn AS (
    SELECT src, dst, score_micro
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY src ORDER BY score_micro DESC, dst
    ) = 1
),
mutual AS (
    SELECT n1.src AS vec_a, n1.dst AS vec_b, n1.score_micro
    FROM nn n1 JOIN nn n2
      ON n1.src = n2.dst AND n1.dst = n2.src AND n1.src < n1.dst
)
SELECT m.vec_a, m.vec_b, m.score_micro,
       ROUND(CAST(m.score_micro AS DOUBLE) / 1000000.0, 6) AS score,
       CAST(ea.label AS INT) AS label_a,
       CAST(eb.label AS INT) AS label_b,
       CAST(ea.label = eb.label AS INT) AS same_label
FROM mutual m
JOIN embeddings ea ON ea.vec_id = m.vec_a
JOIN embeddings eb ON eb.vec_id = m.vec_b
"""


# block-nested-loop shape of the exact MNN search: queries split into
# MNN_QCHUNKS, corpus into MNN_BLOCKS, one cogrouped Arrow kernel per
# (chunk, block) cell => C*B-way parallel cells, per-task memory
# N/C + N/B vectors, shuffle volume N*(B+C) rows. Production tunes
# both so a cell's two slabs fit executor memory.
MNN_QCHUNKS = 4
MNN_BLOCKS = 8


@register("mutual_knn_pairs", extra=True, oracle=MNN_ORACLE)
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL NEAREST NEIGHBOR matching — the high-precision pairing
    primitive (translation-pair mining a la LASER/CCMatrix, batch
    integration, duplicate VERIFICATION after candidate generation):
    keep (a, b) only when a is b's top-1 AND b is a's top-1. MNN
    trades recall for precision exactly where a curation pipeline
    wants it; the emitted same_label flag doubles as the
    embedding-space quality readout.

    DISTRIBUTED EXACT block-nested-loop (the r9 fix: the first cut
    collected the whole corpus to the driver and broadcast it — the
    textbook driver bottleneck). Both sides of the all-pairs search
    are CHUNKED: queries into MNN_QCHUNKS, corpus into MNN_BLOCKS,
    every (chunk, block) cell cogroups into one Arrow kernel call, so
    per-task memory is N/C + N/B vectors and the only replication is
    the shuffle (queries x B + corpus x C rows) — no driver collect,
    no corpus-sized broadcast, and the N x N score matrix never
    exists anywhere. Each cell emits its block-local top-1; the
    global top-1 is an ordinary partial-aggregable groupBy MAX over
    (score, -dst) structs — exactly a map-side-combinable argmax, so
    the reduce is as scalable as any agg_hash.

    Scoring is exact and BLAS-fast: coordinates floor-quantized to
    1e-6 INTEGERS held in float64 — every product (<= 1e12) and every
    partial sum (<= 6.4e13) sits under 2^53, so BLAS addition of
    these integers is exact in any tiling order, which is what makes
    a matmul oracle-checkable. The ranking key is
    floor(1e6 * dot / (|a||b|)), a fully IEEE-determined bigint,
    tie-broken on min dst (block-local ties resolved by sorting
    candidate columns by id; cross-block by the struct max). Block
    partials reduce to the true global argmax because (score, -dst)
    max is associative — the partition of candidates into blocks
    cannot change the winner.

    Scale: exhaustive all-pairs is this operator's CONTRACT (it is
    the exact verifier); at 100 TB the same cogrouped kernel runs
    with the LSH banding (zx_dedup_near_embedding_lsh) as the block
    key instead of pmod, turning O(N^2/CB) cells into O(bucket^2) —
    same kernel, same reduce, candidate generation swapped.
    Mutuality = one self-equi-join of the N-row top-1 table."""
    e = table(spark, sf_dir, "embeddings")
    nn = (
        mnn_top1(e)
        # checkpoint: the mutuality join reads the top-1 table twice —
        # without a barrier the cogrouped kernel executes once per ref
        .localCheckpoint(eager=False)
    )
    return _mnn_mutual(spark, sf_dir, nn)


def _mnn_block_top1(left, right):
    """Per-cell exact top-1 kernel shared by the pmod block-NL search
    (mnn_top1) and the LSH-bucketed scale path (mnn_top1_lsh): exact
    integer-valued float64 matmul over 1e-6-quantized coordinates
    (every partial sum < 2^53 — exact under any BLAS tiling), ranking
    key floor(1e6 * cos), block-local min-dst tie-break via sorted
    candidate columns. left: (vec_id, embedding); right: (cid, cemb).
    """
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "src": pd.Series([], dtype="int64"),
            "dst": pd.Series([], dtype="int64"),
            "score_micro": pd.Series([], dtype="int64"),
        }
    )
    if not len(left) or not len(right):
        return empty
    A = np.floor(
        np.array(list(left["embedding"]), dtype=np.float64) * 1e6
    )  # integer-valued float64: exact under BLAS (see docstring)
    Bm = np.floor(np.array(list(right["cemb"]), dtype=np.float64) * 1e6)
    an = np.sqrt((A * A).sum(axis=1))
    bn = np.sqrt((Bm * Bm).sum(axis=1))
    # integer-valued float64 matmul: exact, order-free, BLAS
    sm = np.floor((A @ Bm.T) / (an[:, None] * bn[None, :]) * 1e6)
    dst_ids = right["cid"].to_numpy(dtype=np.int64)
    order = np.argsort(dst_ids)  # argmax's first-max => min dst
    dst_ids = dst_ids[order]
    sm = sm[:, order]
    out_src, out_dst, out_sc = [], [], []
    for r, sid in enumerate(left["vec_id"].to_numpy(dtype=np.int64)):
        row = sm[r]
        self_mask = dst_ids == sid
        if self_mask.any():
            row = row.copy()
            row[self_mask] = -np.inf
        bi = int(np.argmax(row))
        if row[bi] == -np.inf:  # block held only the query itself
            continue
        out_src.append(int(sid))
        out_dst.append(int(dst_ids[bi]))
        out_sc.append(int(row[bi]))
    if not out_src:
        return empty
    return pd.DataFrame(
        {"src": out_src, "dst": out_dst, "score_micro": out_sc}
    )


def _mnn_reduce(partials: DataFrame) -> DataFrame:
    """Cell partials -> global top-1: map-side-combinable struct max
    (score desc, then min dst — matching the oracle's QUALIFY order).
    Exact for any partition of the candidate set into cells because
    (score, -dst) max is associative."""
    return (
        partials.groupBy("src")
        .agg(
            F.max(
                F.struct(
                    F.col("score_micro"), (-F.col("dst")).alias("nd")
                )
            ).alias("m")
        )
        .select(
            "src",
            (-F.col("m.nd")).alias("dst"),
            F.col("m.score_micro").alias("score_micro"),
        )
    )


def mnn_top1(e: DataFrame) -> DataFrame:
    """The distributed exact top-1 search stage of mutual_knn_pairs,
    pre-checkpoint: (chunk, block) cogrouped Arrow matmul kernel +
    struct-max global reduce. Exposed so tests can pin the plan shape
    (FlatMapCoGroupsInPandas, no driver collect) that the checkpoint
    barrier hides from the registered query's final plan string."""
    q_side = e.select(
        "vec_id",
        "embedding",
        F.pmod(F.col("vec_id"), F.lit(MNN_QCHUNKS)).cast("int").alias("qc"),
    ).withColumn(
        "blk", F.explode(F.sequence(F.lit(0), F.lit(MNN_BLOCKS - 1)))
    )
    c_side = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        F.pmod(F.col("vec_id"), F.lit(MNN_BLOCKS)).cast("int").alias("blk"),
    ).withColumn(
        "qc", F.explode(F.sequence(F.lit(0), F.lit(MNN_QCHUNKS - 1)))
    )
    partials = (
        q_side.groupBy("qc", "blk")
        .cogroup(c_side.groupBy("qc", "blk"))
        .applyInPandas(
            _mnn_block_top1, "src long, dst long, score_micro long"
        )
    )
    return _mnn_reduce(partials)


# band shape of the LSH-bucketed MNN: 32 deterministic hyperplanes as
# MNN_LSH_BANDS bands x MNN_LSH_BITS sign bits; a pair is a candidate
# iff it collides in >= 1 band. More/wider bands trade recall for
# bucket size — at 100 TB these are THE knobs (bits up => buckets
# shrink quadratically in kernel cost; bands up => recall recovers).
MNN_LSH_BANDS = 16
MNN_LSH_BITS = 2


def mnn_top1_lsh(e: DataFrame) -> DataFrame:
    """The LSH-bucketed MNN search — the 100 TB composition the exact
    block-NL's docstring names: the SAME exact kernel and struct-max
    reduce, with candidate generation swapped from all-pairs (chunk,
    block) cells to sign-hyperplane band buckets, so per-cell cost is
    O(bucket^2) instead of O((N/C)(N/B)) and total cost follows the
    bucket-occupancy profile instead of N^2. Result is exact AMONG
    CANDIDATES; pairs whose members share no band are missed — the
    recall-vs-exact floor is pinned by test (the banded-LSH family
    posture)."""
    bands = []
    for bidx in range(MNN_LSH_BANDS):
        key = sum(
            [
                F.when(
                    _plane_dot(bidx * MNN_LSH_BITS + j) > 0,
                    F.lit(2**j),
                ).otherwise(F.lit(0))
                for j in range(MNN_LSH_BITS)
            ],
            F.lit(0),
        )
        bands.append(
            F.struct(
                F.lit(bidx).alias("band"),
                key.cast("long").alias("bkey"),
            )
        )
    q_side = e.select(
        "vec_id", "embedding", F.explode(F.array(*bands)).alias("bk")
    ).select("vec_id", "embedding", "bk.band", "bk.bkey")
    c_side = q_side.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cemb"),
        "band",
        "bkey",
    )
    partials = (
        q_side.groupBy("band", "bkey")
        .cogroup(c_side.groupBy("band", "bkey"))
        .applyInPandas(
            _mnn_block_top1, "src long, dst long, score_micro long"
        )
    )
    return _mnn_reduce(partials)


@register("mutual_knn_pairs_lsh", extra=True)  # rows-only: banded recall
def mutual_knn_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL NEAREST NEIGHBOR matching, LSH-bucketed — the variant a
    100 TB corpus actually runs (the exact sibling zx_mutual_knn_pairs
    is the verifier): candidate generation by sign-hyperplane band
    collision, the same exact Arrow kernel per bucket, the same
    struct-max reduce and mutuality equi-join. Approximate by design
    (a pair sharing no band is unseen), so registered rows-only with
    the recall floor vs the exact sibling pinned by test."""
    e = table(spark, sf_dir, "embeddings")
    nn = mnn_top1_lsh(e).localCheckpoint(eager=False)
    return _mnn_mutual(spark, sf_dir, nn)


def _mnn_mutual(spark: SparkSession, sf_dir: str, nn: DataFrame) -> DataFrame:
    """Mutuality + label decoration shared by the exact and LSH MNN
    paths: one equi self-join of the N-row top-1 table (dst = b_src,
    filter b_dst = src), then two label joins — nothing corpus-sized
    is ever forced into a broadcast."""
    n2 = nn.select(
        F.col("src").alias("b_src"), F.col("dst").alias("b_dst")
    )
    mutual = (
        nn.join(n2, F.col("dst") == F.col("b_src"))
        .filter(
            (F.col("b_dst") == F.col("src"))
            & (F.col("src") < F.col("dst"))
        )
        .select(
            F.col("src").alias("vec_a"),
            F.col("dst").alias("vec_b"),
            "score_micro",
        )
    )
    lab = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        mutual.join(
            lab.select(
                F.col("vec_id").alias("vec_a"),
                F.col("label").cast("int").alias("label_a"),
            ),
            "vec_a",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("vec_b"),
                F.col("label").cast("int").alias("label_b"),
            ),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            "score_micro",
            F.round(
                F.col("score_micro").cast("double") / 1000000.0, 6
            ).alias("score"),
            "label_a",
            "label_b",
            (F.col("label_a") == F.col("label_b")).cast("int").alias(
                "same_label"
            ),
        )
    )


# -------------------------------------------- isotonic calibration


def pava_fit(bins: list[tuple[int, int, int]]):
    """Pool-Adjacent-Violators over (x, n, sum_y) bins sorted by x —
    ALL-INTEGER: the monotonicity test is cross-multiplied
    (sy_prev * n_top > sy_top * n_prev), so no float exists until
    the final per-block rate. Returns blocks (x_lo, x_hi, n, sy)."""
    st: list[list[int]] = []
    for x, n, sy in bins:
        st.append([x, x, n, sy])
        while len(st) >= 2 and st[-2][3] * st[-1][2] > st[-1][3] * st[-2][2]:
            a, b = st[-2], st[-1]
            st[-2:] = [[a[0], b[1], a[2] + b[2], a[3] + b[3]]]
    return [tuple(b) for b in st]


ISOTONIC_ORACLE = """
WITH RECURSIVE bins AS (
    SELECT CAST(FLOOR(value) AS BIGINT) AS x,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS sy
    FROM events GROUP BY 1
), blist AS (
    SELECT list(struct_pack(x := x, n := n, sy := sy) ORDER BY x) AS bs,
           CAST(len(list(x)) AS BIGINT) AS nb
    FROM bins
), it AS (
    SELECT CAST(2 AS BIGINT) AS i, bs, nb,
           [struct_pack(x_lo := bs[1].x, x_hi := bs[1].x,
                        n := bs[1].n, sy := bs[1].sy)] AS st
    FROM blist
    UNION ALL
    SELECT CASE WHEN viol THEN i ELSE i + 1 END, bs, nb,
           CASE WHEN viol THEN
               st[1:len(st) - 2] || [struct_pack(
                   x_lo := st[len(st) - 1].x_lo,
                   x_hi := st[len(st)].x_hi,
                   n := st[len(st) - 1].n + st[len(st)].n,
                   sy := st[len(st) - 1].sy + st[len(st)].sy)]
           ELSE
               list_append(st, struct_pack(
                   x_lo := bs[i].x, x_hi := bs[i].x,
                   n := bs[i].n, sy := bs[i].sy))
           END
    FROM (
        SELECT i, bs, nb, st,
               (len(st) >= 2 AND
                st[len(st) - 1].sy * st[len(st)].n
                    > st[len(st)].sy * st[len(st) - 1].n) AS viol
        FROM it
    )
    WHERE viol OR i <= nb
), fin AS (
    SELECT st
    FROM (
        SELECT i, nb, st,
               (len(st) >= 2 AND
                st[len(st) - 1].sy * st[len(st)].n
                    > st[len(st)].sy * st[len(st) - 1].n) AS viol
        FROM it
    )
    WHERE i = nb + 1 AND NOT viol
)
SELECT CAST(row_number() OVER (ORDER BY b['x_lo']) AS BIGINT) AS block,
       CAST(b['x_lo'] AS BIGINT) AS x_lo,
       CAST(b['x_hi'] AS BIGINT) AS x_hi,
       CAST(b['n'] AS BIGINT) AS n,
       CAST(b['sy'] AS BIGINT) AS n_pos,
       ROUND(CAST(b['sy'] AS DOUBLE) / CAST(b['n'] AS DOUBLE), 6)
           AS rate
FROM (SELECT UNNEST(st) AS b FROM fin)
"""


@register("isotonic_calibration", extra=True, oracle=ISOTONIC_ORACLE)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC CALIBRATION by Pool-Adjacent-Violators — the
    calibration FIT that zx_eval_calibration's reliability bins
    diagnose the need for (and the method production rankers use
    over Platt scaling when monotonicity is the only assumption
    worth making): the best nondecreasing step function from event
    value to purchase rate, in least squares.

    PAVA is inherently sequential, but its state is tiny: pool
    whole-dollar bins first (the fact folds to <=500 integer
    (x, n, sum_y) rows — binned isotonic, the standard large-N
    practice), then run the stack algorithm on the summary. ALL
    arithmetic is integer — the violator test cross-multiplies
    instead of comparing float means — so the DuckDB twin replays
    the fit exactly: one recursive CTE whose every step performs ONE
    action (push next bin, or merge the top two blocks), stack
    carried in the recursion state; <= 2*bins - 1 steps total.

    Scale: one (dollar-bin) hash aggregate over the fact is the only
    corpus-sized work; the driver solve is corpus-size-independent.
    """
    e = table(spark, sf_dir, "events")
    bins = (
        e.select(
            F.floor("value").cast("bigint").alias("x"),
            (F.col("event_type") == "purchase").cast("bigint").alias("y"),
        )
        .groupBy("x")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
        )
        .orderBy("x")
        .collect()
    )
    blocks = pava_fit([(int(r.x), int(r.n), int(r.sy)) for r in bins])
    rows = [
        (i + 1, lo, hi, n, sy, round(sy / n, 6))
        for i, (lo, hi, n, sy) in enumerate(blocks)
    ]
    return spark.createDataFrame(
        rows,
        "block bigint, x_lo bigint, x_hi bigint, n bigint, "
        "n_pos bigint, rate double",
    )
