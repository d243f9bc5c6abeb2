"""Training-data curation operators: chunking, epoch shuffling, PII
redaction.

These extend the LLM-pipeline family (SURVEY §2.F) with three shapes a
large-scale pretraining pipeline needs between "curated corpus" and
"training batches":

- overlapping-window chunking (RAG / context packing prep),
- deterministic epoch-shuffle ordering (reproducible global
  permutations without materializing a random state),
- PII redaction (regex scrubbing with audit counts).

All three are scan-local or bucket-parallel — no all-pairs joins, no
driver-side loops; see each docstring for the 100 TB argument.

Reference scope note: the reference engine (auto_kafka_redis.py) has no
document pipeline; these derive from the driver's ``documents`` table
and public corpus-curation practice (C4/Gopher-style pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

# Tokens = whitespace runs, after trim: identical in Java regex (Spark)
# and RE2 (DuckDB), no zero-length edge tokens.
_WS = r"\s+"

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@register(
    "llm_chunk_overlap",
    extra=True,
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '{_WS}') AS tokens,
               len(regexp_split_to_array(trim(text), '{_WS}')) AS n
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, n,
               unnest(generate_series(
                   0, ((greatest(0, n - {CHUNK_SIZE}) + {CHUNK_STRIDE - 1})
                       // {CHUNK_STRIDE}))) AS chunk_id
        FROM toks
    )
    SELECT c.doc_id, c.chunk_id,
           least({CHUNK_SIZE}, t.n - c.chunk_id * {CHUNK_STRIDE}) AS n_tokens,
           md5(array_to_string(
               t.tokens[c.chunk_id * {CHUNK_STRIDE} + 1 :
                        c.chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}],
               ' ')) AS chunk_md5
    FROM chunks c JOIN toks t USING (doc_id)
    """,
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking: size-64 word windows at
    stride 48 (16-word overlap), the standard RAG/pretraining prep for
    documents longer than the context budget.

    Chunk count per doc = ceil(max(0, n-64)/48) + 1 in pure integer
    arithmetic, so every token lands in >=1 chunk and the final partial
    window is kept. Output carries md5(chunk_text) rather than the text
    itself so the result (and the oracle hash) stays small.

    Scale: split -> sequence -> explode -> slice is entirely scan-local
    (narrow, whole-stage codegen); ZERO shuffles. At 100 TB this runs
    at parquet-scan speed with ~1.33x row expansion.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), _WS).alias("tokens"),
    ).withColumn("n", F.size("tokens"))
    n_last = (
        F.greatest(F.lit(0), F.col("n") - F.lit(CHUNK_SIZE))
        + F.lit(CHUNK_STRIDE - 1)
    ) / F.lit(CHUNK_STRIDE)
    return (
        toks.withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0), n_last.cast("int"))),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.least(
                F.lit(CHUNK_SIZE),
                F.col("n") - F.col("chunk_id") * CHUNK_STRIDE,
            ).alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        "tokens",
                        F.col("chunk_id") * CHUNK_STRIDE + 1,
                        F.lit(CHUNK_SIZE),
                    ),
                )
            ).alias("chunk_md5"),
        )
    )


N_EPOCHS = 3
# md5-prefix keys are < 2^60; >> 52 yields 256 balanced buckets.
_SHUF_BUCKET_SHIFT = 52


@register(
    "llm_epoch_shuffle",
    extra=True,
    oracle=f"""
    WITH keyed AS (
        SELECT e.epoch, d.doc_id,
               CAST(('0x' || substring(
                   md5(CAST(d.doc_id AS VARCHAR) || ':'
                       || CAST(e.epoch AS VARCHAR)), 1, 15)) AS UBIGINT) AS k
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(0, {N_EPOCHS - 1})) AS epoch) e
    )
    SELECT epoch,
           row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos,
           doc_id
    FROM keyed
    """,
)
def llm_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle order: every epoch gets an
    independent pseudo-random permutation of the corpus, reproducible
    from (doc_id, epoch) alone — no RNG state to checkpoint, any worker
    can recompute any shard's order (how large-scale training jobs
    shuffle without a coordinator).

    The key is the top 60 bits of md5(doc_id:epoch) — uniform, so
    ordering by it IS the permutation.

    Scale: a naive row_number() OVER (PARTITION BY epoch) puts one
    epoch = ONE task (the whole corpus through a single partition —
    dead at 100 TB). Instead this computes the classic distributed
    global rank: bucket by the key's top byte (256 uniform buckets per
    epoch), count per bucket, prefix-sum the tiny (epochs x 256)
    bucket-count table for offsets, broadcast it back, and rank within
    each (epoch, bucket) in parallel: pos = bucket_offset + local rank.
    Hash-identical to the oracle's single-window form.
    """
    d = table(spark, sf_dir, "documents")
    keyed = (
        d.select("doc_id")
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))))
        .withColumn(
            "k",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("epoch"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint"),
        )
        .withColumn("bucket", F.shiftright("k", _SHUF_BUCKET_SHIFT))
    )
    counts = keyed.groupBy("epoch", "bucket").agg(F.count("*").alias("c"))
    w_off = (
        Window.partitionBy("epoch")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "epoch",
        "bucket",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("offset"),
    )
    w_local = Window.partitionBy("epoch", "bucket").orderBy("k", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), ["epoch", "bucket"])
        .select(
            "epoch",
            (F.col("offset") + F.row_number().over(w_local)).alias("pos"),
            "doc_id",
        )
    )


# Redaction patterns — identical semantics in Java regex and RE2 (no
# lookaround, no \b).
_RE_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_RE_PHONE = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
_RE_IDNUM = r"[0-9]{6,}"

# The synthetic documents are digit-free lowercase prose, so a pure
# redaction over `text` would be vacuously zero-hit. Append a
# deterministic PII-bearing contact line derived from doc_id (one
# email, one phone, one 8-digit id per doc) so the kernel's match,
# replace, and count paths all execute with nonzero traffic — and the
# oracle must reproduce them exactly.
_CONTACT_SQL = (
    "text || ' contact user' || CAST(doc_id AS STRING)"
    " || '@example.com ph 415-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
    " || ' id ' || lpad(CAST(doc_id AS STRING), 8, '0')"
)


@register(
    "text_pii_redact",
    extra=True,
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id, {_CONTACT_SQL} AS t0 FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               regexp_replace(t0, '{_RE_EMAIL}', '<EMAIL>', 'g') AS t1,
               len(regexp_extract_all(t0, '{_RE_EMAIL}')) AS n_email
        FROM aug
    ),
    s2 AS (
        SELECT doc_id, n_email,
               regexp_replace(t1, '{_RE_PHONE}', '<PHONE>', 'g') AS t2,
               len(regexp_extract_all(t1, '{_RE_PHONE}')) AS n_phone
        FROM s1
    )
    SELECT doc_id, n_email, n_phone,
           len(regexp_extract_all(t2, '{_RE_IDNUM}')) AS n_idnum,
           n_email + n_phone
               + len(regexp_extract_all(t2, '{_RE_IDNUM}')) AS n_redactions,
           md5(regexp_replace(t2, '{_RE_IDNUM}', '<NUM>', 'g')) AS redacted_md5
    FROM s2
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with audit counts: emails, then phone numbers,
    then long digit runs, replaced in that order (so a phone's digit
    groups are consumed before the id-number pass) with per-stage match
    counts — the scrub-and-account shape privacy review requires of a
    training-data pipeline.

    Counting happens on each stage's INPUT (post-prior-redaction), so
    categories never double-count the same span. Output carries
    md5(redacted) so the full redacted text never leaves the executor.

    Scale: pure per-row regex in whole-stage codegen — zero shuffles,
    runs at parquet-scan speed; counts aggregate map-side if rolled up.
    """
    d = table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.expr(_CONTACT_SQL).alias("t0"),
    )
    s1 = aug.select(
        "doc_id",
        F.regexp_replace("t0", _RE_EMAIL, "<EMAIL>").alias("t1"),
        F.size(F.expr(f"regexp_extract_all(t0, '{_RE_EMAIL}', 0)")).alias("n_email"),
    )
    s2 = s1.select(
        "doc_id",
        "n_email",
        F.regexp_replace("t1", _RE_PHONE, "<PHONE>").alias("t2"),
        F.size(F.expr(f"regexp_extract_all(t1, '{_RE_PHONE}', 0)")).alias("n_phone"),
    )
    n_idnum = F.size(F.expr(f"regexp_extract_all(t2, '{_RE_IDNUM}', 0)"))
    return s2.select(
        "doc_id",
        "n_email",
        "n_phone",
        n_idnum.alias("n_idnum"),
        (F.col("n_email") + F.col("n_phone") + n_idnum).alias("n_redactions"),
        F.md5(F.regexp_replace("t2", _RE_IDNUM, "<NUM>")).alias("redacted_md5"),
    )


# ------------------------------------------------- fuzzy typo lookup

# Deletion-key blocking for edit distance <= 1: every string emits
# itself plus each single-character deletion as join keys. Two strings
# within one edit ALWAYS share a key (delete the differing position);
# sharing a key does NOT imply distance <= 1, so candidates get an
# exact levenshtein verify. Standard spell-join (FastSS family).
_DEL_KEYS = (
    "transform(sequence(0, length({c})), "
    "i -> concat(substring({c}, 1, i), substring({c}, i + 2)))"
)


@register(
    "fuzzy_typo_lookup",
    extra=True,
    oracle="""
    WITH probes AS (
        SELECT p_partkey AS probe_id,
               substring(p_name, 1, p_partkey % length(p_name)) ||
               substring(p_name, p_partkey % length(p_name) + 2) AS q
        FROM part
    ),
    pk AS (
        SELECT probe_id, q,
               unnest(list_transform(range(0, length(q) + 1),
                   i -> substring(q, 1, i) || substring(q, i + 2))) AS key
        FROM probes
    ),
    nk AS (
        SELECT p_name,
               unnest(list_transform(range(0, length(p_name) + 1),
                   i -> substring(p_name, 1, i)
                        || substring(p_name, i + 2))) AS key
        FROM (SELECT DISTINCT p_name FROM part)
    ),
    cand AS (
        SELECT DISTINCT pk.probe_id, pk.q, nk.p_name
        FROM pk JOIN nk USING (key)
    ),
    hits AS (
        SELECT probe_id, q, p_name, levenshtein(q, p_name) AS dist
        FROM cand WHERE levenshtein(q, p_name) <= 1
    )
    SELECT probe_id, COUNT(*) AS n_names, MIN(dist) AS min_dist
    FROM hits GROUP BY probe_id
    """,
)
def fuzzy_typo_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy catalog lookup: part names corrupted by one deterministic
    character deletion (position = p_partkey mod length) matched back
    against the distinct name catalog at edit distance <= 1 — the
    typo-tolerant entity-resolution shape (product matching, query
    spelling, dedup of near-identical titles).

    Scale: NEVER a levenshtein cross join. Both sides explode into
    deletion keys (len+1 keys per string, the FastSS blocking), match
    on a hash equi-join, dedupe candidates, and verify with one exact
    levenshtein per candidate. Candidate count is bounded by true
    near-matches plus blocking collisions — independent of catalog x
    probe cardinality. Per-probe aggregation (match count + min
    distance) keeps the output narrow even on duplicate-heavy
    catalogs.
    """
    part = table(spark, sf_dir, "part")
    probes = part.select(
        F.col("p_partkey").alias("probe_id"),
        F.expr(
            "concat(substring(p_name, 1, p_partkey % length(p_name)), "
            "substring(p_name, p_partkey % length(p_name) + 2))"
        ).alias("q"),
    )
    pk = probes.select(
        "probe_id", "q", F.explode(F.expr(_DEL_KEYS.format(c="q"))).alias("key")
    )
    names = part.select("p_name").distinct()
    nk = names.select(
        "p_name", F.explode(F.expr(_DEL_KEYS.format(c="p_name"))).alias("key")
    )
    cand = pk.join(nk, "key").select("probe_id", "q", "p_name").distinct()
    hits = cand.withColumn("dist", F.levenshtein("q", "p_name")).filter(
        F.col("dist") <= 1
    )
    return hits.groupBy("probe_id").agg(
        F.count("*").alias("n_names"),
        F.min("dist").alias("min_dist"),
    )


# -------------------------------------------------- URL canonical


@register(
    "dedup_url_canonical",
    extra=True,
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTP://WWW.' || upper(source) || '.COM:80/p/'
             || CAST(doc_id % 100 AS STRING)
             || '?utm_source=feed&b=' || CAST(doc_id % 3 AS STRING)
             || '&a=1&utm_campaign=x' AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS host,
             regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS query
      FROM raw
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(host, '^www\\.', ''),
                            ':80$', '')
             || CASE WHEN path = '' THEN '/' ELSE path END
             || CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS curl
      FROM (
        SELECT doc_id, host, path,
               array_to_string(list_sort(list_filter(
                   string_split(query, '&'),
                   kv -> NOT starts_with(kv, 'utm_'))), '&') AS cq
        FROM parts
      )
    )
    SELECT curl AS canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS canonical_doc
    FROM canon
    GROUP BY 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first dedup a crawl pipeline
    runs (before any content hashing): lowercase the host, strip the
    `www.` prefix and default `:80` port, drop `utm_*` tracking
    params, SORT the remaining query params (param order is not
    identity), then group by the canonical form. The corpus has no
    URL column, so a deterministic messy URL is synthesized per doc
    (mixed case, www, default port, tracking params, shuffled params)
    and the oracle must reproduce the full normalization pipeline.

    Everything is built-in string/array functions — canonicalization
    stays in whole-stage codegen, and the dedup shuffles only the
    canonical strings (dedup_exact's scale shape).
    """
    d = table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW."),
            F.upper("source"),
            F.lit(".COM:80/p/"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("?utm_source=feed&b="),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("&a=1&utm_campaign=x"),
        ).alias("url"),
    )
    parts = raw.select(
        "doc_id",
        F.lower(
            F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)
        ).alias("host"),
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1).alias(
            "path"
        ),
        F.regexp_extract("url", r"\?([^#]*)", 1).alias("query"),
    )
    cq = F.array_join(
        F.array_sort(
            F.filter(
                F.split("query", "&"),
                lambda kv: ~kv.startswith("utm_"),
            )
        ),
        "&",
    )
    canon = parts.select(
        "doc_id",
        F.concat(
            F.regexp_replace(
                F.regexp_replace("host", r"^www\.", ""), r":80$", ""
            ),
            F.when(F.col("path") == "", F.lit("/")).otherwise(
                F.col("path")
            ),
            F.when(cq == "", F.lit("")).otherwise(F.concat(F.lit("?"), cq)),
        ).alias("curl"),
    )
    return canon.groupBy(F.col("curl").alias("canonical_url")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


# --------------------------------------------- compressibility gate


def compress_ratio_batches(batches):
    """mapInPandas kernel: zlib-level-6 compression ratio per doc —
    the classic near-duplicate/boilerplate/low-entropy text signal
    (highly repetitive text compresses far below natural prose)."""
    import zlib

    import pandas as pd

    for pdf in batches:
        ratios = []
        for t in pdf["text"]:
            raw = t.encode("utf-8")
            ratios.append(
                round(len(zlib.compress(raw, 6)) / max(1, len(raw)), 6)
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "compress_ratio": ratios}
        )


@register("text_compress_ratio", extra=True)  # rows-only: zlib kernel
def text_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality gate (the Gopher/C4-family signal
    text_quality's length/punct/stopword ratios don't capture):
    zlib-compress each doc and flag the tails — too-low ratio means
    machine-generated repetition, too-high means high-entropy noise
    (base64 blobs, minified code). Rows-only (no SQL engine exposes
    zlib), pinned by a python parity test over the same corpus.

    Scale: per-doc kernel over Arrow batches, embarrassingly
    parallel; output is (doc_id, ratio, keep) — text never shuffles.
    """
    d = table(spark, sf_dir, "documents")
    scored = d.select("doc_id", "text").mapInPandas(
        compress_ratio_batches, "doc_id long, compress_ratio double"
    )
    return scored.select(
        "doc_id",
        "compress_ratio",
        (
            (F.col("compress_ratio") >= 0.25)
            & (F.col("compress_ratio") <= 0.9)
        ).cast("int").alias("keep"),
    )


_KANON_K = 5


@register(
    "k_anonymity",
    extra=True,
    oracle=f"""
    WITH qi AS (
        SELECT user_id % 100 AS user_bucket,
               event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS grp_size
        FROM events
        GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN grp_size < {_KANON_K} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violating,
           CAST(SUM(CASE WHEN grp_size < {_KANON_K} THEN grp_size
                    ELSE 0 END) AS BIGINT) AS rows_to_suppress,
           CAST(MIN(grp_size) AS BIGINT) AS min_group
    FROM qi
    GROUP BY event_type
    """,
)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit over a quasi-identifier tuple — the release
    gate a privacy review runs before sharing an event extract: with
    QI = (coarsened user bucket, event_type, day), a row is k-anonymous
    iff its QI group has ≥ k members; groups under k must be
    suppressed or generalized further. Emits per event_type the group
    count, violating-group count, rows that suppression would drop,
    and the minimum group size (the achieved k). Companion to
    zx_text_pii_redact (which scrubs direct identifiers; this audits
    the indirect ones).

    Shape: one hash-agg to QI-group sizes, one 5-group rollup — the
    fact shuffles once on the QI key; at 100 TB the QI-group table is
    bounded by the QI domain, not the corpus."""
    ev = table(spark, sf_dir, "events")
    qi = ev.groupBy(
        (F.col("user_id") % 100).alias("user_bucket"),
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count("*").cast("bigint").alias("grp_size"))
    under = F.col("grp_size") < _KANON_K
    return qi.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(under.cast("bigint")).cast("bigint").alias("n_violating"),
        F.sum(F.when(under, F.col("grp_size")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_to_suppress"),
        F.min("grp_size").cast("bigint").alias("min_group"),
    )



_DP_EPS = 1.0
_DP_CAP = 30  # two-sided geometric support truncated to [-30, 30]
# engine-neutral group hash: Lehmer step over a 2^26-bucketed mix —
# every intermediate fits a bigint in both engines, and the final
# division by the SAME literal is one correctly-rounded IEEE op, so
# u is bit-identical cross-engine.
_DP_M1, _DP_M2, _DP_P = 1_000_003, 7_919, 2_147_483_647


def _dp_thresholds() -> list:
    """CDF thresholds of the truncated two-sided geometric (discrete
    Laplace) mechanism with alpha = exp(-eps): noise k = (number of
    thresholds <= u) - cap. Computed once in python floats and
    embedded as LITERALS on both engines, so every comparison is an
    exact IEEE operation on identical doubles and the mechanism
    branches identically everywhere."""
    import math

    a = math.exp(-_DP_EPS)
    weights = [a ** abs(k) for k in range(-_DP_CAP, _DP_CAP + 1)]
    tot = sum(weights)
    acc, out = 0.0, []
    for w in weights[:-1]:  # last threshold is 1.0 — never compared
        acc += w / tot
        out.append(acc)
    return out


def _dp_oracle() -> str:
    ths = _dp_thresholds()
    noise_terms = " + ".join(
        f"CASE WHEN u >= {t!r} THEN 1 ELSE 0 END" for t in ths
    )
    return f"""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS true_n
        FROM events GROUP BY 1, 2
    ),
    h AS (
        SELECT *,
               (((ascii(event_type) * {_DP_M1} + day * {_DP_M2} + 42)
                 % 67108864) * 48271) % {_DP_P} AS hv
        FROM g
    ),
    un AS (SELECT *, hv / {float(_DP_P)!r} AS u FROM h)
    SELECT event_type, day,
           CAST(GREATEST(true_n + ({noise_terms}) - {_DP_CAP}, 0)
               AS BIGINT) AS released_n
    FROM un
    """


@register("dp_noisy_counts", extra=True, oracle=_dp_oracle())
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE release of per-(event_type, day) event
    counts: the two-sided geometric (discrete Laplace) mechanism at
    eps=1 — the integer-valued mechanism of choice for count queries
    — with noise drawn from a KEYED HASH of the group (consistent
    re-release: re-querying the same group must not spend fresh
    privacy budget, so the draw is a pure function of the group key).
    The inverse-CDF evaluates as a monotone threshold count against
    literals embedded in BOTH the Spark expression and the DuckDB
    oracle; every comparison is an exact IEEE op on identical
    doubles, so the noisy counts hash-match exactly — a DP mechanism
    under differential test, which is how release pipelines should be
    validated (mechanism bugs are silent privacy/accuracy bugs).
    Released counts clamp at 0.

    Shape: one hash-agg to group counts, then scan-local arithmetic
    (60 branch-free comparisons inside codegen). k_anonymity
    suppresses; this perturbs — the two standard disclosure-control
    levers side by side."""
    ths = _dp_thresholds()
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count("*").cast("bigint").alias("true_n"))
    hv = (
        (
            (
                F.ascii("event_type") * _DP_M1
                + F.col("day") * _DP_M2
                + 42
            )
            % 67108864
        )
        * 48271
    ) % _DP_P
    u = hv / F.lit(float(_DP_P))
    noise = sum(
        (u >= F.lit(t)).cast("bigint") for t in ths
    ) - F.lit(_DP_CAP)
    return g.select(
        "event_type",
        "day",
        F.greatest(F.col("true_n") + noise, F.lit(0)).cast("bigint").alias(
            "released_n"
        ),
    )


# ---------------------------------------------------------------- r7:
# corpus-dedup + mixture additions (Lee et al. '22 exact-substring
# dedup; CCNet paragraph dedup; XLM-R temperature sampling; cross-
# source contamination audit)

PARA_WORDS = 16  # delimiter-free "paragraph" = disjoint 16-word chunk
MIX_ALPHA = 0.3  # XLM-R / mC4 temperature exponent


@register(
    "llm_dedup_substring",
    extra=True,
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ts) - 3),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                        || ts[i+3] || ' ' || ts[i+4])) AS term
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents)
        WHERE len(ts) >= 5
    ),
    firsts AS (SELECT term, MIN(doc_id) AS first_doc FROM sh GROUP BY term)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE f.first_doc < s.doc_id)
               AS BIGINT) AS n_dup_shingles,
           ROUND(COUNT(*) FILTER (WHERE f.first_doc < s.doc_id)
               * 1.0 / COUNT(*), 6) AS dup_ratio
    FROM sh s JOIN firsts f USING (term)
    GROUP BY s.doc_id
    """,
)
def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup audit (Lee et al. 2022, 'Deduplicating
    Training Data Makes Language Models Better'): per document, how
    many of its distinct word 5-gram shingles appear verbatim in an
    EARLIER document (doc_id = corpus order, first occurrence owns the
    span), and the duplicated share. The paper's suffix-array scan
    becomes an inverted-index shape: one shingle-min aggregation
    (min doc_id per shingle = the owner) and one equi-join back —
    never doc x doc. At 100 TB the term becomes its 8-byte hash and
    the shingle width (5 here, 50 in the paper — a knob) trades
    sensitivity for index size; both stages are plain shuffles on the
    shingle key with map-side partial aggregation."""
    from eventstream_notify_spark.operators.text import _shingle_rows

    sh = _shingle_rows(table(spark, sf_dir, "documents"), 5)
    firsts = sh.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    dup = F.col("first_doc") < F.col("doc_id")
    return (
        sh.join(firsts, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(dup, 1)).alias("n_dup_shingles"),
            F.round(
                F.count(F.when(dup, 1)) * 1.0 / F.count("*"), 6
            ).alias("dup_ratio"),
        )
    )


@register(
    "llm_paragraph_dedup",
    extra=True,
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '{_WS}') AS ts
        FROM documents
    ),
    paras AS (
        SELECT doc_id, u.i AS pid,
               md5(array_to_string(
                   ts[u.i * {PARA_WORDS} + 1 :
                      u.i * {PARA_WORDS} + {PARA_WORDS}], ' ')) AS h
        FROM toks, UNNEST(generate_series(
            0, (len(ts) + {PARA_WORDS - 1}) // {PARA_WORDS} - 1)) u(i)
    ),
    firsts AS (
        SELECT h, MIN(doc_id * 1000000 + pid) AS first_key
        FROM paras GROUP BY h
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(COUNT(*) FILTER (
               WHERE p.doc_id * 1000000 + p.pid = f.first_key)
               AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (
               WHERE p.doc_id * 1000000 + p.pid <> f.first_key)
               AS BIGINT) AS n_dropped
    FROM paras p JOIN firsts f USING (h)
    GROUP BY p.doc_id
    """,
)
def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup audit: hash every paragraph, keep
    only the corpus-wide FIRST occurrence of each hash (by (doc_id,
    position)), report kept/dropped counts per doc. The corpus has no
    newlines, so 'paragraph' is the delimiter-free analogue — disjoint
    16-word chunks. md5 is the cross-engine hash (same bytes in Spark
    and DuckDB, so the oracle is exact). Shape: one hash-min
    aggregation + one join back, both on the paragraph hash — digests
    shuffle, text never does (the md5 is computed scan-side); the
    composite integer first-key (doc_id*1e6 + pos) keeps argmin a
    plain MIN."""
    d = table(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id", F.split(F.trim("text"), _WS).alias("ts")
    ).localCheckpoint(eager=True)
    paras = toked.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("ts") / PARA_WORDS).cast("int") - 1,
            )
        ).alias("pid"),
        F.col("ts"),
    ).select(
        "doc_id",
        "pid",
        F.md5(
            F.concat_ws(
                " ", F.slice("ts", F.col("pid") * PARA_WORDS + 1, PARA_WORDS)
            )
        ).alias("h"),
        (F.col("doc_id") * 1_000_000 + F.col("pid")).alias("key"),
    )
    firsts = paras.groupBy("h").agg(F.min("key").alias("first_key"))
    kept = F.col("key") == F.col("first_key")
    return (
        paras.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.count(F.when(~kept, 1)).alias("n_dropped"),
        )
    )


@register(
    "llm_mix_temperature",
    extra=True,
    oracle=f"""
    WITH grp AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                   AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_tokens) AS t FROM grp),
    w AS (
        SELECT lang, n_docs, n_tokens,
               n_tokens / t AS p,
               POW(n_tokens / t, {MIX_ALPHA}) AS pw
        FROM grp CROSS JOIN tot
    ),
    z AS (SELECT SUM(pw) AS z FROM w)
    SELECT lang, n_docs, n_tokens,
           ROUND(p, 6) AS actual_share,
           ROUND(pw / z, 6) AS temp_share,
           ROUND((pw / z) / p, 6) AS upsample_factor
    FROM w CROSS JOIN z
    """,
)
def llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing (XLM-R / mC4): resample
    language shares as p_i^alpha / sum_j p_j^alpha with alpha = 0.3 —
    the standard up-weighting of low-resource languages. The heavy
    stage (token counting over the corpus) is a distributed
    aggregation; the alpha-fold over the DOMAIN-BOUNDED language table
    (5 rows here, never more than ~100 languages anywhere) runs in
    CPython — deliberately, because pow must come from the same system
    libm as DuckDB's for the oracle hash to be exact (the adaboost-ln
    precedent; the JVM's StrictMath rounds differently in the last
    ulp)."""
    grp = (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.size(
                    F.regexp_extract_all(
                        F.lower("text"), F.lit("[a-z0-9]+"), 0
                    )
                )
            ).cast("bigint").alias("n_tokens"),
        )
    )
    rows = sorted(grp.collect())  # bounded driver fold: <= #languages
    total = float(sum(r.n_tokens for r in rows))
    ps = [r.n_tokens / total for r in rows]
    pws = [p ** MIX_ALPHA for p in ps]
    z = sum(pws)
    out = [
        (
            r.lang,
            int(r.n_docs),
            int(r.n_tokens),
            round(p, 6),
            round(pw / z, 6),
            round((pw / z) / p, 6),
        )
        for r, p, pw in zip(rows, ps, pws)
    ]
    return spark.createDataFrame(
        out,
        "lang string, n_docs bigint, n_tokens bigint, "
        "actual_share double, temp_share double, upsample_factor double",
    )


@register(
    "llm_cross_source_overlap",
    extra=True,
    oracle="""
    WITH sh AS (
        SELECT DISTINCT d.source,
               unnest(list_transform(range(1, len(ts) - 3),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                        || ts[i+3] || ' ' || ts[i+4])) AS term
        FROM (SELECT doc_id, source,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents) d
        WHERE len(ts) >= 5
    ),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms
           FROM sh GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           ROUND(COUNT(*) * 1.0 / ANY_VALUE(za.n_terms), 6)
               AS containment_a
    FROM sh a
    JOIN sh b ON a.term = b.term AND a.source <> b.source
    JOIN sz za ON za.source = a.source
    GROUP BY a.source, b.source
    """,
)
def llm_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every ordered source
    pair (A, B), how many of A's distinct word 5-gram shingles also
    occur in B, and the containment share |A∩B|/|A| — the audit that
    finds a crawl source quietly mirroring another (or an eval set
    leaked into a training crawl). Shape: distinct (source, shingle)
    rows — already a tiny fraction of token volume — self-joined on
    the shingle, then a pair-keyed aggregation over a domain-bounded
    (sources²) result. At 100 TB: shingle → 8-byte hash, and the
    distinct-per-source projection is the classic pre-aggregation
    that keeps the join input proportional to VOCABULARY, not corpus
    size."""
    from eventstream_notify_spark.operators.text import _shingle_rows

    d = table(spark, sf_dir, "documents")
    sh = (
        _shingle_rows(d, 5, extra=("source",))
        .select("source", "term")
        .distinct()
    )
    sz = sh.groupBy("source").agg(F.count("*").alias("n_terms"))
    a = sh.alias("a")
    b = sh.select(F.col("source").alias("source_b"), "term").alias("b")
    return (
        a.join(b, (F.col("a.term") == F.col("b.term"))
               & (F.col("a.source") != F.col("source_b")))
        .groupBy(F.col("a.source").alias("source_a"), "source_b")
        .agg(F.count("*").alias("n_shared"))
        .join(
            F.broadcast(sz.select(F.col("source").alias("source_a"),
                                  "n_terms")),
            "source_a",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(F.col("n_shared") * 1.0 / F.col("n_terms"), 6).alias(
                "containment_a"
            ),
        )
    )


DSIR_BUCKETS = 64  # hashed-feature dimensionality (paper: 10k; the
# bucket hash must be BIT-IDENTICAL across engines, so it's built from
# ascii()+length() — primitives both engines define identically)
DSIR_TARGET_SRC = "src0"  # the "trusted domain" the sampler aims at
_DSIR_BUCKET = (
    f"(ascii(substring(term, 1, 1)) * 31 + length(term)) % {DSIR_BUCKETS}"
)


@register(
    "dsir_importance",
    extra=True,
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    feat AS (
        SELECT doc_id, source, {_DSIR_BUCKET} AS b FROM tok
    ),
    tgt AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM feat
        WHERE source = '{DSIR_TARGET_SRC}' GROUP BY b
    ),
    raw AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM feat GROUP BY b
    ),
    tots AS (
        SELECT (SELECT SUM(ct) FROM tgt) AS nt,
               (SELECT SUM(cr) FROM raw) AS nr
    ),
    lr AS (
        SELECT r.b,
               CAST(FLOOR(1000000.0 * ln(
                   ((COALESCE(t.ct, 0) + 1.0) / (tots.nt + {DSIR_BUCKETS}))
                   / ((r.cr + 1.0) / (tots.nr + {DSIR_BUCKETS}))
               ) + 0.5) AS BIGINT) AS lr_micro
        FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tots
    ),
    doc AS (
        SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(lr.lr_micro) AS BIGINT) AS logw_micro
        FROM feat f JOIN lr USING (b) GROUP BY f.doc_id
    )
    SELECT doc_id, n_tokens, logw_micro,
           ROUND(logw_micro / (1000000.0 * n_tokens), 6)
               AS logw_per_token
    FROM doc
    """,
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) — Data Selection via Importance
    Resampling: score every document by the log importance weight
    log(p_target/p_raw) under bag-of-hashed-unigram models, where the
    target distribution is a trusted domain ({src0 here}) and raw is
    the whole corpus. The sampler then keeps documents with the
    highest weights — the principled alternative to hand-written
    quality rules.

    Cross-engine exactness: bucket hashing uses ascii+length
    primitives both engines evaluate identically; the 64-entry
    Laplace-smoothed log-ratio table is computed in CPython (bounded
    driver fold — same libm ln as DuckB, the adaboost precedent) and
    quantized to integer micro-units with floor(x+0.5), so per-doc
    scores are exact integer sums. Shape: two bucket-count
    aggregations (map-side combinable), the tiny ratio table
    broadcast back as a literal map, one doc-keyed agg — token volume
    never shuffles twice."""
    import math

    d = table(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term"),
    ).select("doc_id", "source", F.expr(_DSIR_BUCKET).alias("b"))
    counts = (
        feat.groupBy("b")
        .agg(
            F.count("*").alias("cr"),
            F.count(
                F.when(F.col("source") == DSIR_TARGET_SRC, 1)
            ).alias("ct"),
        )
        .collect()
    )  # bounded driver fold: <= DSIR_BUCKETS rows
    nt = sum(r.ct for r in counts)
    nr = sum(r.cr for r in counts)
    lr = {
        r.b: int(
            math.floor(
                1_000_000.0
                * math.log(
                    ((r.ct + 1.0) / (nt + DSIR_BUCKETS))
                    / ((r.cr + 1.0) / (nr + DSIR_BUCKETS))
                )
                + 0.5
            )
        )
        for r in counts
    }
    lr_map = F.create_map(
        *[F.lit(x) for kv in lr.items() for x in kv]
    )
    doc = (
        feat.withColumn("lr_micro", lr_map[F.col("b")])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lr_micro").cast("bigint").alias("logw_micro"),
        )
    )
    return doc.select(
        "doc_id",
        "n_tokens",
        "logw_micro",
        F.round(
            F.col("logw_micro") / (1_000_000.0 * F.col("n_tokens")), 6
        ).alias("logw_per_token"),
    )


_LDIV_L = 3


@register(
    "l_diversity",
    extra=True,
    oracle=f"""
    WITH qi AS (
        SELECT user_id % 100 AS user_bucket,
               event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(DISTINCT CAST(ROUND(value) AS BIGINT))
                   AS BIGINT) AS diversity,
               CAST(COUNT(*) AS BIGINT) AS grp_size
        FROM events
        GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN diversity < {_LDIV_L} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violating,
           CAST(SUM(CASE WHEN diversity < {_LDIV_L} THEN grp_size
                    ELSE 0 END) AS BIGINT) AS rows_at_risk,
           CAST(MIN(diversity) AS BIGINT) AS min_diversity
    FROM qi
    GROUP BY event_type
    """,
)
def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY audit — k-anonymity's necessary second check
    (Machanavajjhala et al. 2007): a QI group can have >= k members
    yet expose everyone if they all share the same SENSITIVE value
    (the homogeneity attack k-anonymity misses). Same QI tuple as
    zx_k_anonymity (user bucket, event_type, day); sensitive
    attribute = the event's integer-rounded value; a group is
    l-diverse iff it contains >= l distinct sensitive values. Emits
    per event_type the group count, under-l group count, rows in
    those groups, and the achieved minimum diversity.

    Shape: one hash-agg to QI groups with a COUNT(DISTINCT) (expand +
    two-phase agg — the same two-shuffle plan as agg_distinct), one
    domain-bounded rollup. The QI-group table is bounded by the QI
    domain at any corpus size."""
    ev = table(spark, sf_dir, "events")
    qi = ev.groupBy(
        (F.col("user_id") % 100).alias("user_bucket"),
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.countDistinct(F.round("value").cast("bigint"))
        .cast("bigint")
        .alias("diversity"),
        F.count("*").cast("bigint").alias("grp_size"),
    )
    under = F.col("diversity") < _LDIV_L
    return qi.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(under.cast("bigint")).cast("bigint").alias("n_violating"),
        F.sum(F.when(under, F.col("grp_size")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("diversity").cast("bigint").alias("min_diversity"),
    )


# ----------------------------------------- span corruption (T5-style)

SPAN_BLOCK = 8  # token block size; one candidate span per block
SPAN_PICK_MOD = 3  # corrupt every block where hash % 3 == 0 (~1/3)


@register(
    "llm_span_corruption",
    extra=True,
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS tk,
               len(regexp_split_to_array(trim(text), '\s+')) AS n
        FROM documents WHERE len(trim(text)) > 0
    ),
    blocks AS (
        SELECT doc_id, tk, n, UNNEST(range(0, (n - 1) // {SPAN_BLOCK} + 1))
                   AS b
        FROM toks
    ),
    drawn AS (
        SELECT doc_id, tk, n, b,
               CAST(CAST(('0x' || substring(
                   md5('sc:' || CAST(doc_id AS STRING) || ':'
                       || CAST(b AS STRING)), 1, 15)) AS UBIGINT)
                   AS BIGINT) AS h
        FROM blocks
    ),
    spans AS (
        SELECT doc_id, CAST(b AS BIGINT) AS mask_id,
               CAST(b * {SPAN_BLOCK} + (h // {SPAN_PICK_MOD}) % 4 + 1
                    AS BIGINT) AS span_start,
               CAST(1 + (h // 12) % 4 AS BIGINT) AS span_len,
               tk, n
        FROM drawn WHERE h % {SPAN_PICK_MOD} = 0
    )
    SELECT doc_id, mask_id, span_start, span_len,
           array_to_string(list_transform(
               range(span_start, span_start + span_len),
               i -> tk[CAST(i AS INTEGER)]), ' ') AS span_text
    FROM spans
    WHERE span_start + span_len - 1 <= n
    """,
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-CORRUPTION MASK PLAN (the T5/UL2 denoising objective's
    data prep): pick non-overlapping token spans to mask per document
    and emit (doc_id, mask_id, span_start, span_len, span_text) — the
    table a pretraining pipeline joins back to build inputs/targets
    with sentinel tokens.

    Determinism + non-overlap BY CONSTRUCTION (no RNG, no sequential
    scan): token positions partition into {SPAN_BLOCK}-token blocks;
    an md5 draw per (doc, block) decides whether the block is
    corrupted (~1/{SPAN_PICK_MOD} of blocks), the span offset within
    the block (0-3) and the span length (1-4) — offset + length never
    cross the block boundary, so spans cannot overlap and every
    worker computes the identical plan with zero coordination. Mask
    rate ~ 2.5/({SPAN_BLOCK}*{SPAN_PICK_MOD}) ~ 10% of tokens, the
    T5 neighborhood.

    Scale: embarrassingly parallel per doc (one explode over blocks,
    no shuffle at all until a consumer groups); the draw is a hash of
    (doc_id, block) — stable under any repartitioning, reshard, or
    retry, which is exactly why RNG-based masking is the wrong tool
    on a 1000-executor corpus.

    Reference scope: beyond-reference extension (LLM-training-data
    family)."""
    d = table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = d.select(
        "doc_id",
        F.split(F.trim("text"), r"\s+").alias("tk"),
    ).withColumn("n", F.size("tk"))
    blocks = toks.select(
        "doc_id",
        "tk",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(n - 1) div {SPAN_BLOCK}"))
        ).alias("b"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("sc:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    drawn = blocks.withColumn("h", h).filter(
        F.col("h") % SPAN_PICK_MOD == 0
    )
    spans = drawn.select(
        "doc_id",
        F.col("b").cast("bigint").alias("mask_id"),
        (
            F.col("b") * SPAN_BLOCK
            + F.expr(f"(h div {SPAN_PICK_MOD}) % 4")
            + 1
        )
        .cast("bigint")
        .alias("span_start"),
        (1 + F.expr("(h div 12) % 4")).cast("bigint").alias("span_len"),
        "tk",
        "n",
    )
    return spans.filter(
        F.col("span_start") + F.col("span_len") - 1 <= F.col("n")
    ).select(
        "doc_id",
        "mask_id",
        "span_start",
        "span_len",
        F.concat_ws(
            " ",
            F.slice(
                "tk",
                F.col("span_start").cast("int"),
                F.col("span_len").cast("int"),
            ),
        ).alias("span_text"),
    )
