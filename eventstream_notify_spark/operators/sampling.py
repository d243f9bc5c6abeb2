"""Deterministic sampling operators — the training-data-pipeline
primitives (corpus subsampling, per-stratum balancing, train/test
splits) built so the SAME rows come out on every engine and every run.

Randomness here is a pure function of the row key (multiplicative
hashing with explicit integer arithmetic, no engine RNG, no
``F.rand()``), which buys three things at 100 TB:
- reproducible pipelines (re-runs and backfills select identical rows);
- pushdown-friendly plans (the sample predicate is a scan filter —
  no shuffle, no sort, no global state);
- cross-engine oracles (DuckDB computes the identical arithmetic).

All three queries are narrow map-side filters/windows over one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

# Knuth's multiplicative constant mod 2^31 keeps doc_id*K inside long
# range for any plausible id while scrambling low bits well enough for
# percent-bucket assignment. (This is sampling determinism, not
# cryptography: the point is an identical, engine-neutral bucket.)
_MULT = 2654435761
_BUCKETS = 100


def _bucket(col: str) -> F.Column:
    return F.pmod(F.col(col) * _MULT + 12345, F.lit(_BUCKETS))


_BUCKET_SQL = "((({col} * 2654435761 + 12345) % 100) + 100) % 100"


# Per-language keep-rates (percent) — the stratified-balancing shape:
# downweight the dominant stratum, keep the tail.
_LANG_RATES = {"en": 20, "de": 60, "fr": 60, "es": 60}
_DEFAULT_RATE = 100


@register(
    "sample_stratified",
    extra=True,
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_BUCKET_SQL.format(col='doc_id')} <
          CASE lang
               WHEN 'en' THEN 20 WHEN 'de' THEN 60
               WHEN 'fr' THEN 60 WHEN 'es' THEN 60
               ELSE 100 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling: per-language keep-rates applied via
    a deterministic hash bucket of the key — a pure scan filter (no
    shuffle), reproducible across runs/engines, and trivially
    push-down-able. The CASE mirrors per-stratum quotas (downsample
    the dominant language, keep the tail)."""
    d = table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r))
            for lang, r in _LANG_RATES.items()
        ],
        F.lit(_DEFAULT_RATE),
    )
    return d.filter(_bucket("doc_id") < rate).select("doc_id", "lang")


@register(
    "sample_reservoir_group",
    extra=True,
    oracle=f"""
    SELECT lang, doc_id, n_chars
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY {_BUCKET_SQL.format(col='doc_id')}, doc_id
    ) <= 50
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-per-group sampling (the distributed 'reservoir'): rank
    rows inside each group by their hash bucket and keep the first k.
    Unlike a rate filter this guarantees EXACTLY min(k, |group|) rows
    per group; the hash order makes the choice deterministic. One
    shuffle on the group key — the same shape at any scale."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_bucket("doc_id"), F.col("doc_id"))
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 50)
        .drop("__rn")
        .select("lang", "doc_id", "n_chars")
    )


@register(
    "train_test_split",
    extra=True,
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
        SELECT CASE WHEN {_BUCKET_SQL.format(col='doc_id')} < 80
                    THEN 'train'
                    WHEN {_BUCKET_SQL.format(col='doc_id')} < 90
                    THEN 'valid'
                    ELSE 'test' END AS split,
               n_chars
        FROM documents
    )
    GROUP BY split
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test assignment by key hash — membership is
    a property of the ROW, not of the run: late-arriving data lands in
    a stable split, and no engine RNG can leak rows across splits
    between backfills. Emits per-split counts (the assignment itself
    is the `split` expression, usable as a partition column)."""
    d = table(spark, sf_dir, "documents")
    b = _bucket("doc_id")
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@register(
    "weighted_domain_sample",
    extra=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, source,
               CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    AS BIGINT) AS n_tok
        FROM documents
    ),
    grp AS (
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM toks GROUP BY lang, source
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_groups
        FROM grp
    ),
    weighted AS (
        SELECT g.lang, g.source, g.n_docs,
               LEAST(1.0, (SELECT total_tokens FROM tot)
                   / ((SELECT n_groups FROM tot) * 1.0 * g.n_tokens))
                   AS keep_rate
        FROM grp g
    )
    SELECT w.lang, w.source, w.n_docs, w.keep_rate,
           CAST(SUM(CASE WHEN {_BUCKET_SQL.format(col='t.doc_id')}
                          < w.keep_rate * 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled
    FROM toks t
    JOIN weighted w ON w.lang = t.lang AND w.source = t.source
    GROUP BY w.lang, w.source, w.n_docs, w.keep_rate
    """,
)
def weighted_domain_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted corpus sampling — the 'rebalance the training
    mix' op: each (lang, source) domain gets keep-rate
    min(1, uniform_share / token_share) (domain_mix's equalizing
    weight, capped), applied as the engine-neutral multiplicative-
    hash bucket predicate — so the SAMPLE ITSELF is deterministic,
    reproducible, and pushdown-friendly, like every sampler in this
    module. Output: per-domain docs, keep-rate, and realized sample
    size. Two narrow aggregations + a broadcast of the domain-weight
    frame; the bucket comparison is double arithmetic from exact
    integer sums, identical across engines."""
    from eventstream_notify_spark.operators.text import tokens_col

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.size(tokens_col()).cast("bigint").alias("n_tok"),
    )
    grp = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    tot = grp.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_groups"),
    )
    weighted = grp.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            F.col("total_tokens")
            / (F.col("n_groups") * F.lit(1.0) * F.col("n_tokens")),
        ).alias("keep_rate"),
    )
    return (
        d.join(F.broadcast(weighted), ["lang", "source"])
        .groupBy("lang", "source", "n_docs", "keep_rate")
        .agg(
            F.sum(
                (_bucket("doc_id") < F.col("keep_rate") * _BUCKETS)
                .cast("bigint")
            ).alias("n_sampled")
        )
    )


@register(
    "split_group_aware",
    extra=True,
    oracle=f"""
    SELECT split,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
        SELECT user_id,
               CASE WHEN {_BUCKET_SQL.format(col='user_id')} < 80
                    THEN 'train'
                    WHEN {_BUCKET_SQL.format(col='user_id')} < 90
                    THEN 'valid'
                    ELSE 'test' END AS split
        FROM events
    )
    GROUP BY split
    """,
)
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/valid/test split: the split key is the
    ENTITY (user_id), not the row — every event of a user lands in
    the same split by construction, which is the leakage guard
    row-level splits miss (a user's test events must not share a user
    with training events, or per-user features leak the answer).
    Same hash-bucket determinism as train_test_split; the
    no-user-spans-two-splits invariant is pinned by a test."""
    ev = table(spark, sf_dir, "events")
    b = _bucket("user_id")
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.select(split.alias("split"), "user_id")
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


_NEG_K = 5
_NEG_QUERY_MOD = 50
# pair-hash constants sized so every intermediate stays under 2^63 in
# both engines: (pair % p) * m < 1e9 * 1.2e9
_NEG_P = 1_000_000_007
_NEG_M = 1_103_515_245


@register(
    "negative_sampling",
    extra=True,
    oracle=f"""
    WITH q AS (
        SELECT doc_id AS query_id, source AS qsource
        FROM documents WHERE doc_id % {_NEG_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, d.doc_id AS neg_id,
               ((q.query_id * 1000003 + d.doc_id) % {_NEG_P})
                   * {_NEG_M} % {_NEG_P} AS h
        FROM q JOIN documents d
          ON d.source <> q.qsource AND d.doc_id <> q.query_id
    )
    SELECT query_id, neg_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY h, neg_id
           ) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {_NEG_K}
    """,
)
def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for contrastive training: for
    each query document, draw k=5 pseudo-random negatives from a
    different source (the cheap 'not obviously related' filter), with
    the draw a pure function of the (query, candidate) pair — the
    same multiplicative-hash discipline as the sampling family, so
    backfills and re-runs emit identical training pairs and DuckDB
    can replay the exact draw.

    Shape: the query set (1/50 of docs) broadcasts against the corpus
    with only (doc_id, source) projected — bodies never move; the
    per-query top-5 is a window over the query key. At 100 TB you'd
    pre-bucket candidates by hash range and only join the k nearest
    buckets per query — same hash, candidate volume per query capped;
    declared here, not needed at bench scale."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    q = F.broadcast(
        d.filter(F.col("doc_id") % _NEG_QUERY_MOD == 0).select(
            F.col("doc_id").alias("query_id"),
            F.col("source").alias("qsource"),
        )
    )
    scored = d.join(
        q,
        (F.col("source") != F.col("qsource"))
        & (F.col("doc_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("doc_id").alias("neg_id"),
        (
            ((F.col("query_id") * 1000003 + F.col("doc_id")) % _NEG_P)
            * _NEG_M
            % _NEG_P
        ).alias("h"),
    )
    w = Window.partitionBy("query_id").orderBy("h", "neg_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _NEG_K)
        .select("query_id", "neg_id", "rank")
    )


_NEYMAN_BUDGET = 1000  # total sample size across strata


@register(
    "sample_neyman",
    extra=True,
    oracle=f"""
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(FLOOR(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                   AS mv
        FROM events
    ),
    stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mv) AS DECIMAL(38, 0)) AS sv,
               CAST(SUM(mv * mv) AS DECIMAL(38, 0)) AS sv2
        FROM ev GROUP BY 1
    ),
    wgt AS (
        SELECT event_type, n,
               sqrt(CAST(CAST(n AS DECIMAL(38, 0)) * sv2 - sv * sv
                         AS DOUBLE)) AS w
        FROM stats
    ),
    tot AS (
        SELECT list_sum(list(w ORDER BY event_type)) AS tw FROM wgt
    ),
    alloc AS (
        SELECT event_type,
               CAST(FLOOR({_NEYMAN_BUDGET} * w / tw) AS BIGINT) AS n_h
        FROM wgt, tot
    )
    SELECT e.event_id, e.event_type, CAST(r.rk AS BIGINT) AS rank
    FROM (
        SELECT event_id, event_type,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rk
        FROM ev
    ) r
    JOIN ev e USING (event_id)
    JOIN alloc a ON a.event_type = e.event_type
    WHERE r.rk <= a.n_h
    """,
)
def sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-ALLOCATION stratified sampling — the variance-optimal
    split of a fixed sample budget across strata (n_h proportional to
    N_h * S_h, Neyman 1934): high-variance strata get more rows, so a
    downstream estimator of the stratified mean hits minimum variance
    for the budget. The statistically-correct upgrade over
    zx_sample_stratified's fixed keep-rates when the sample feeds an
    ESTIMATE rather than a training mix.

    Exactness engineering: per-stratum std enters only through
    sqrt(N*sum(v^2) - sum(v)^2) over MILLI-QUANTIZED integers carried
    as DECIMAL(38,0) (the product overflows bigint at sf0.1 already —
    exact decimals are the 100 TB posture); the cross-strata weight
    total folds over the event_type-SORTED weight list (a 5-double
    sum is order-sensitive; a sorted-list fold is deterministic in
    both engines); the draw itself is the md5-rank hash sampler every
    sampling op here uses. Shape: one stats aggregation (5 rows), a
    broadcast allocation table, one per-stratum rank window over the
    scan."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value").cast("double") * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("mv"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("mv").cast("decimal(38,0)").alias("sv"),
        F.sum(F.col("mv") * F.col("mv")).cast("decimal(38,0)").alias("sv2"),
    )
    wgt = stats.select(
        "event_type",
        "n",
        F.sqrt(
            (
                F.col("n").cast("decimal(38,0)") * F.col("sv2")
                - F.col("sv") * F.col("sv")
            ).cast("double")
        ).alias("w"),
    )
    tot = wgt.groupBy().agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_type", "w"))),
                lambda r: r["w"],
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("tw")
    )
    alloc = F.broadcast(
        wgt.crossJoin(F.broadcast(tot)).select(
            "event_type",
            # tw = 0 (every stratum zero-variance, e.g. one row per
            # stratum): allocation is undefined — NULL n_h keeps the
            # rank filter false and emits zero rows, exactly the
            # oracle's NULL-on-zero-divide arm; Spark's ANSI divide
            # would error instead (r10 degenerate-corpus sweep)
            F.floor(
                F.when(
                    F.col("tw") > 0,
                    F.lit(_NEYMAN_BUDGET) * F.col("w") / F.col("tw"),
                )
            )
            .cast("bigint")
            .alias("n_h"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .join(alloc, "event_type")
        .filter(F.col("rank") <= F.col("n_h"))
        .select("event_id", "event_type", "rank")
    )
