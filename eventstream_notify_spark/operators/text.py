"""Text-analysis / dedup extension operators — SURVEY.md §2.F (X1, X2,
X4–X6) plus the training-data-pipeline text ops the north star adds
(token counting, quality scoring, language-ID heuristic, document
fingerprinting).

Scale design: every op is tokens-as-rows (explode) or tokens-as-array
(higher-order fns) — both JVM-side, no Python in the hot path. Pair
generation (near-dup) always goes through an inverted-index join on a
blocking key (shared token / MinHash band / LSH bucket), never an
O(n²) cross join: at 100 TB the candidate set is what you shuffle,
nothing else.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

TOKEN_RE = "[a-z0-9]+"

# Signed unigram lexicon for X6 — embedded as data (rules-as-data
# pattern); at scale this is a broadcast dim table.
SENTIMENT_LEXICON: dict[str, int] = {
    "fast": 2,
    "slow": -2,
    "small": -1,
    "large": 1,
    "merge": 1,
    "error": -3,
    "stream": 1,
    "batch": -1,
    "clean": 2,
    "stale": -2,
}

STOPWORDS = ("the", "a", "or", "and", "of", "to", "in")


def tokens_col(text_col: str = "text") -> F.Column:
    """Lowercased token array — the shared tokenizer of every text op."""
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def doc_tokens(df: DataFrame) -> DataFrame:
    """Tokens-as-rows view: (doc_id, term). One narrow explode."""
    return df.select("doc_id", F.explode(tokens_col()).alias("term"))


def _lexicon_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(SENTIMENT_LEXICON.items()), "term string, score int"
    )


def _lexicon_values_sql() -> str:
    rows = ", ".join(f"('{t}', {s})" for t, s in SENTIMENT_LEXICON.items())
    return f"(VALUES {rows}) lex(term, score)"


# ---------------------------------------------------------------- X1


@register(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — exact content dedup: group by content hash, keep the
    smallest doc_id. We group on sha2(text) so the shuffle key is 32
    bytes regardless of document size — at 100 TB you never shuffle
    the documents themselves to find duplicates (the oracle groups by
    raw text, which is equivalent absent a SHA-256 collision)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("copies"))
        .drop("__h")
    )


# ---------------------------------------------------------------- X2


JACCARD_T = 0.95


def _token_sets(d: DataFrame) -> DataFrame:
    """(doc_id, sorted distinct token array, set size) — built entirely
    SCAN-LOCAL (array_distinct + array_sort on the tokenizer's array),
    zero shuffles. The equivalent explode → distinct → groupBy/
    collect_list formulation costs two shuffles of every token row and
    was the expensive half of dedup_near."""
    return d.select(
        "doc_id",
        F.array_sort(F.array_distinct(tokens_col())).alias("toks"),
    ).withColumn("sz", F.size("toks").cast("long"))


def _verify_pairs(cand: DataFrame, docsets: DataFrame, t: float) -> DataFrame:
    """Exact Jaccard on candidate pairs via sorted-array intersection."""
    sa = docsets.alias("sa")
    sb = docsets.alias("sb")
    common = F.size(F.array_intersect(F.col("sa.toks"), F.col("sb.toks")))
    jac = common * 1.0 / (F.col("sa.sz") + F.col("sb.sz") - common)
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= t)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def jaccard_pairs_deletion(
    docsets: DataFrame, t: float = JACCARD_T
) -> DataFrame:
    """Deletion-neighborhood similarity join (exact when the symmetric
    difference implied by t is ≤ 1): key every token set by md5(set)
    and md5(each single-token deletion); J(A,B) ≥ t ⟹ sym-diff ≤ 1
    ⟹ A and B share a key.

    Verification needs NO set materialization: the kind of colliding
    keys determines the intersection exactly —
      full=full  ⟹ A=B           ⟹ |∩| = |A|
      full=del   ⟹ A ⊂ B, +1    ⟹ |∩| = |A|
      del=del    ⟹ sym-diff = 2 ⟹ |∩| = |A|-1
    so J comes from sizes alone (take the max |∩| when a pair collides
    multiple ways). The whole operator is: explode keys → equi-join on
    8-byte keys → size arithmetic. Nothing wide ever shuffles.

    Key construction is algebraic, O(|set|) per doc: the set key is
    the XOR of per-token xxhash64 values, and each single-deletion key
    is ``full ⊕ h(token)`` — no re-serialization of the set per
    deletion (the concat-the-slices formulation is O(|set|²) per doc
    and its codegen footprint dominated cold runs). Set equality via
    64-bit XOR equality is a hash proxy exactly like a digest of the
    serialized set; ~1e5 distinct keys give a ~4e-10 accidental
    collision probability on deterministic (non-adversarial) data."""
    tok_hashes = F.transform(F.col("toks"), lambda t: F.xxhash64(t))
    # r13 opt (guide §4.2/§7.2): hoist the full-set fold into a COLUMN
    # before the explode. Referencing the `full_key` EXPRESSION inside
    # the per-token transform lambda made Catalyst re-inline the whole
    # aggregate(transform(toks, xxhash64)) fold per array element —
    # O(|set|²) hashes per doc (visible in the before-plan's Generate
    # node), defeating the O(|set|) construction this docstring
    # promises. As a column it is evaluated once per row and the
    # lambda reads the attribute.
    keyed = docsets.withColumn("__th", tok_hashes).withColumn(
        "__fk",
        F.aggregate(
            "__th", F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
        ),
    )
    keys = keyed.select(
        "doc_id",
        "sz",
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("__fk").alias("key"), F.lit(1).alias("is_full")
                    )
                ),
                F.transform(
                    "__th",
                    lambda h: F.struct(
                        F.col("__fk").bitwiseXOR(h).alias("key"),
                        F.lit(0).alias("is_full"),
                    ),
                ),
            )
        ).alias("k"),
    ).select("doc_id", "sz", "k.key", "k.is_full")
    a, b = keys.alias("a"), keys.alias("b")
    common = (
        F.when((F.col("a.is_full") == 1) | (F.col("b.is_full") == 1),
               F.least("a.sz", "b.sz"))
        .otherwise(F.col("a.sz") - 1)
    )
    pairs = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(F.max(common).alias("common"))
    )
    jac = F.col("common") * 1.0 / (F.col("sza") + F.col("szb") - F.col("common"))
    return pairs.filter(jac >= t).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


def jaccard_pairs_prefix(docsets: DataFrame, t: float = JACCARD_T) -> DataFrame:
    """Prefix-filtered similarity join (PPJoin family): order tokens by
    ascending document frequency; if J(A,B) ≥ t the first
    |A| - ⌈t·|A|⌉ + 1 tokens of A must intersect B's prefix. The
    inverted index is built over prefix (rarest) tokens only. Exact
    for any t; the fallback when the deletion bound exceeds 1."""
    tok = docsets.select("doc_id", F.explode("toks").alias("term"))
    dfreq = tok.groupBy("term").agg(F.count("*").alias("dfreq"))
    wdoc = Window.partitionBy("doc_id").orderBy("dfreq", "term")
    ranked = (
        tok.join(dfreq, "term")
        .withColumn("pos", F.row_number().over(wdoc))
        .withColumn("sz", F.count("*").over(Window.partitionBy("doc_id")))
    )
    k = F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    # materialize the (small) prefix index: the candidate self-join
    # would otherwise recompute the dfreq-join + two windows once per
    # side — the index is |docs|·(1-t)·|set| rows, tiny next to that
    prefix = (
        ranked.filter(F.col("pos") <= k)
        .select("doc_id", "term")
        .localCheckpoint(eager=True)
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_pairs(cand, docsets, t)


@register(
    "dedup_near",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {JACCARD_T}
    """,
)
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (exact) — near-duplicate pairs by token-set Jaccard.

    The ORACLE is the naive all-pairs spec (fine at oracle scale); the
    engine picks its candidate-generation strategy from the data
    profile, both exact:

    - sym-diff bound δ = ⌊(1-t)·min(2·max_set_size, |vocab|)⌋ ≤ 1 →
      deletion-neighborhood keys (md5 of the set and of each single
      deletion): candidates are an equi-join on 16-byte keys. This is
      the only strategy that survives a tiny-vocabulary corpus, where
      every token's posting list is ~the whole corpus and any
      token-based blocking (including prefix filtering) degenerates to
      the cross join.
    - otherwise → prefix filtering over rarest-token inverted index
      (jaccard_pairs_prefix).

    Exactness of both strategies vs the naive spec is pinned by
    tests/test_prefix_filter.py. Approximate further-scale path:
    ``dedup_minhash``."""
    pairs, _docsets = near_dup_pairs(spark, sf_dir)
    return pairs


def class_pair_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The r14 shared kernel of the whole near-dup family: the
    identical-token-set CLASS decomposition and the exact CLASS-level
    pair graph, built WITHOUT ever materializing doc-level pairs.

    Jaccard depends only on the token SET, so the doc pair graph
    factors exactly through distinct sets: docs sharing a set form a
    pairwise-J=1 clique, and a cross-class doc pair exists iff the two
    CLASS sets satisfy J >= t. r13 already ran the iterative riders
    (CC/PageRank/k-core/triangles/link-prediction) on the class graph,
    but each rider still BUILT its class edges by tagging the doc pair
    frame — the one frame that grows ~83x per data decade on this
    corpus. Here the candidate join itself (deletion-neighborhood or
    prefix strategy, unchanged code) runs over ONE ROW PER DISTINCT
    SET, so nothing pair-count- or doc-count-quadratic is ever grouped
    or shuffled; doc pairs exist only where they ARE the output
    (dedup_near's expansion in near_dup_pairs), produced by narrow
    joins past the aggregation. Guide §1.1/§2.3 (first principles;
    shuffle a lightweight proxy, not the payload).

    Returns (cpairs, classes, cmap, docsets):
      cpairs:  (ca, cb, jaccard) — cross-class pairs with J >= t,
               keyed by class reps (ca < cb); lazily checkpointed
               (every rider and both expansion joins re-read it).
      classes: (ck, s) — one row per non-empty distinct set; ck = the
               class's MIN doc_id (so CC label seeding is the
               identity), s = member count.
      cmap:    (doc_id, ck) membership over non-empty sets.
      docsets: the checkpointed (doc_id, toks, sz) token-set frame.

    Exactness: the strategy profile (max set size, vocabulary) is
    computed over docs and is identical over class representatives
    (every doc's set IS some class's set); both strategies are
    set-algebra on (toks, sz) and blind to multiplicity; class reps
    are genuine doc_ids so the a.doc_id < b.doc_id candidate ordering
    stays valid. Class identity groups on the sorted-distinct array
    itself (exact set equality — strictly stronger than the previous
    md5-digest proxy)."""
    d = table(spark, sf_dir, "documents")
    # lazy checkpoint: the profiling action below is the FIRST action
    # over the token sets, so it materializes them as a side effect —
    # the class window then reuses the materialized sets instead of
    # re-running the tokenize pipeline (the expensive half)
    docsets = _token_sets(d).localCheckpoint(eager=False)
    # one scalar profiling action (cheap at any scale: partial
    # aggregation reduces it map-side) — max set size and vocabulary
    # size in a single job over the exploded token sets
    prof = (
        docsets.select("sz", F.explode_outer("toks").alias("term"))
        .agg(
            F.max("sz").alias("max_sz"),
            F.countDistinct("term").alias("vocab"),
        )
        .first()
    )
    max_sz, vocab = prof.max_sz or 0, prof.vocab or 0
    delta = int((1 - JACCARD_T) * min(2 * max_sz, vocab))
    # ONE shuffle keyed by the set itself assigns every doc its class
    # rep (min doc_id) and class size; the window's whole-partition
    # min/count need no ordering. Lazily checkpointed: cmap and
    # classes are both narrow reads of it.
    w = Window.partitionBy("toks")
    enriched = (
        docsets.filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            "toks",
            "sz",
            F.min("doc_id").over(w).alias("ck"),
            F.count(F.lit(1)).over(w).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    cmap = enriched.select("doc_id", "ck")
    cl_sets = enriched.filter(F.col("doc_id") == F.col("ck")).select(
        F.col("ck").alias("doc_id"), "toks", "sz"
    )
    classes = enriched.filter(F.col("doc_id") == F.col("ck")).select(
        "ck", "s"
    )
    cp = (
        jaccard_pairs_deletion(cl_sets, JACCARD_T)
        if delta <= 1
        else jaccard_pairs_prefix(cl_sets, JACCARD_T)
    )
    cpairs = cp.select(
        F.col("doc_a").alias("ca"), F.col("doc_b").alias("cb"), "jaccard"
    ).localCheckpoint(eager=False)
    return cpairs, classes, cmap, docsets


def near_dup_pairs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """dedup_near's kernel, returning BOTH the exact doc-level pair
    frame and the checkpointed token-set frame. r14: doc pairs are now
    the EXPANSION of the class-level pair graph — cross-class combos
    carry the class pair's jaccard, same-class pairs are J=1 cliques
    by construction — so the only aggregation (the candidate-key
    groupBy) runs over class pairs and the pair-count-sized frame is
    produced by narrow joins downstream of it, never shuffled."""
    cpairs, _classes, cmap, docsets = class_pair_frames(spark, sf_dir)
    ma = cmap.select(F.col("ck").alias("ca"), F.col("doc_id").alias("da"))
    mb = cmap.select(F.col("ck").alias("cb"), F.col("doc_id").alias("db"))
    cross = (
        cpairs.join(ma, "ca")
        .join(mb, "cb")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "jaccard",
        )
    )
    w1 = cmap.select(F.col("ck").alias("ka"), F.col("doc_id").alias("doc_a"))
    w2 = cmap.select(F.col("ck").alias("kb"), F.col("doc_id").alias("doc_b"))
    within = w1.join(
        w2,
        (F.col("ka") == F.col("kb")) & (F.col("doc_a") < F.col("doc_b")),
    ).select(
        "doc_a",
        "doc_b",
        # identical sets: common = sz, J = sz/(2*sz - sz) = exactly 1.0
        F.lit(1.0).alias("jaccard"),
    )
    return cross.unionByName(within), docsets


@register("dedup_minhash", extra=True)  # rows-only: LSH is approximate by design
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (scale path) — MinHash + banded LSH candidate generation,
    pure DataFrame ops (no spark.ml dependency, no vector UDT):

    1. per (doc, term): 8 independent hash values via xxhash64(term, seed)
    2. per doc: signature = min hash per seed  (map-side combinable agg)
    3. band the signature (2 rows/band × 4 bands), hash each band
    4. docs sharing a band bucket are candidate pairs

    The only shuffles are the signature agg and the band-bucket join —
    exactly the shape that survives 100 TB (bucket posting lists are
    the unit of work). Emits candidate pairs with their band; verified
    rows-only (hash functions differ across engines)."""
    d = table(spark, sf_dir, "documents")
    # pre-distinct (doc_id, term): min(hash) is idempotent under
    # duplicate tokens, but on a small-vocabulary corpus each doc
    # repeats terms heavily — deduping first makes the 16 seeded
    # hashes run on |distinct terms| rows, not |token instances|.
    # (Measured both; deriving the 16 functions from one hash via
    # universal multiply-add is NOT a valid shortcut here: with a tiny
    # hash domain the derived minima correlate and band collisions
    # explode.)
    tok = doc_tokens(d).distinct()
    # 4 bands x 4 rows: P(candidate) = 1-(1-J^4)^4 — steep S-curve
    # around J~0.8; 2-row bands drown high-similarity corpora in
    # candidates (measured: 4x fewer pairs on the test corpus)
    n_hashes, band_rows = 16, 4
    sig = tok.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("term"), F.lit(seed))).alias(f"h{seed}")
            for seed in range(n_hashes)
        ]
    )
    # --- signature-class compression --------------------------------
    # Docs with IDENTICAL signatures (rampant in near-dup corpora —
    # that's the point of dedup) collide in every band; generating
    # their doc-level pairs before dedup is O(k²) rows per hot bucket
    # (measured 22M pre-distinct rows at sf0.1, hottest bucket 2319
    # docs). Instead: band/join/dedup at the signature-CLASS level
    # (2227 classes for those 5000 docs), then expand each class pair
    # exactly once into doc pairs — the expansion emits each unordered
    # candidate pair once, so NO wide distinct shuffle ever runs.
    hcols = [f"h{s}" for s in range(n_hashes)]
    cls = sig.withColumn("cls", F.xxhash64(*[F.col(c) for c in hcols]))
    members = cls.groupBy("cls").agg(F.collect_list("doc_id").alias("docs"))
    class_sig = cls.select("cls", *hcols).distinct()
    bands = [
        F.xxhash64(
            F.lit(b), *[F.col(f"h{b * band_rows + r}") for r in range(band_rows)]
        ).alias(f"band{b}")
        for b in range(n_hashes // band_rows)
    ]
    stacked = (
        class_sig.select("cls", *bands)
        .select(
            "cls",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_no"),
                            F.col(f"band{b}").alias("bucket"),
                        )
                        for b in range(n_hashes // band_rows)
                    ]
                )
            ).alias("bb"),
        )
        .select("cls", "bb.band_no", "bb.bucket")
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    cls_pairs = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.cls") <= F.col("b.cls")),
        )
        .select(F.col("a.cls").alias("cls_a"), F.col("b.cls").alias("cls_b"))
        .distinct()
    )
    # expand class pairs -> doc pairs. (A,A) covers within-class dups;
    # da<db there (and least/greatest for A<B) yields each unordered
    # pair exactly once. At 100 TB, mega-classes (giant exact-dup
    # clusters) would cap their member arrays and report the cluster as
    # a unit instead of expanding it — the class layer is where that
    # policy hooks in.
    ma = members.select(F.col("cls").alias("cls_a"), F.col("docs").alias("docs_a"))
    mb = members.select(F.col("cls").alias("cls_b"), F.col("docs").alias("docs_b"))
    pairs = (
        cls_pairs.join(ma, "cls_a")
        .join(mb, "cls_b")
        .select(
            "cls_a",
            "cls_b",
            F.explode("docs_a").alias("da"),
            F.col("docs_b"),
        )
        .select(
            "cls_a", "cls_b", "da", F.explode("docs_b").alias("db")
        )
        .filter((F.col("cls_a") < F.col("cls_b")) | (F.col("da") < F.col("db")))
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
    )
    # emit per-doc candidate degree (bounded output; the raw pair set
    # is the intermediate you'd feed to an exact-Jaccard verifier)
    return pairs.groupBy("doc_a").agg(F.count("*").alias("n_candidates"))


_PAIRS_CTE = f"""
    tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM cand p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
        WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {JACCARD_T}
    )
"""


# Class-compressed connected components for doc-level CC oracles
# (r9 verdict #4's technique, shared): Jaccard >= T is a function of
# the token-SET pair, so the doc pair graph is a blow-up of the
# identical-token-set CLASS graph — the min-label recursion runs over
# ~4k classes instead of the doc graph whose reach table (sum of
# component sizes squared) blows the DuckDB spill budget at sf0.1.
# MATERIALIZED hints stop DuckDB re-evaluating the non-recursive CTEs
# once per recursion step. Yields cc(doc_id, cluster_id) over ALL
# documents (tokenless docs fall back to self-labeled singletons,
# exactly like the doc-level reach seeded from documents).
_CC_COMPRESSED_CTE = f"""
    tok AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    sig AS MATERIALIZED (
        SELECT doc_id, list(term ORDER BY term) AS ts
        FROM tok GROUP BY doc_id
    ),
    cls AS MATERIALIZED (
        SELECT MIN(doc_id) AS cls_id, CAST(COUNT(*) AS BIGINT) AS s,
               ANY_VALUE(ts) AS ts
        FROM sig GROUP BY ts
    ),
    ctok AS MATERIALIZED (
        SELECT cls_id, len(ts) AS sz, unnest(ts) AS term FROM cls
    ),
    cedges AS MATERIALIZED (
        SELECT ca, cb FROM (
            SELECT a.cls_id AS ca, b.cls_id AS cb, COUNT(*) AS common,
                   ANY_VALUE(a.sz) AS sa, ANY_VALUE(b.sz) AS sb
            FROM ctok a JOIN ctok b
              ON a.term = b.term AND a.cls_id < b.cls_id
            GROUP BY 1, 2
        ) WHERE common * 1.0 / (sa + sb - common) >= {JACCARD_T}
    ),
    csym AS MATERIALIZED (
        SELECT ca AS src, cb AS dst FROM cedges
        UNION ALL SELECT cb, ca FROM cedges
    ),
    creach(node, lab) AS (
        SELECT cls_id AS node, cls_id AS lab FROM cls
        UNION
        SELECT e.dst AS node, r.lab
        FROM creach r JOIN csym e ON e.src = r.node
    ),
    ccomp AS MATERIALIZED (
        SELECT node AS cls_id, MIN(lab) AS cluster_id
        FROM creach GROUP BY node
    ),
    cc AS MATERIALIZED (
        SELECT d.doc_id,
               COALESCE(cm.cluster_id, d.doc_id) AS cluster_id
        FROM documents d
        LEFT JOIN sig s ON s.doc_id = d.doc_id
        LEFT JOIN cls k ON k.ts = s.ts
        LEFT JOIN ccomp cm ON cm.cls_id = k.cls_id
    )
"""


def cc_class_labels(cpairs: DataFrame, classes: DataFrame) -> DataFrame:
    """Connected components over the CLASS graph by min-label
    propagation — the dedup_cluster kernel at class granularity.
    Returns (ck, lab) for every non-empty-set class; lab converges to
    the component's min doc_id. r14: the class edges come straight
    from class_pair_frames (the candidate join runs at class level),
    so the ~83x-per-decade doc pair frame is never built at all —
    r13 still paid one full doc-pair tagging pass here. Seeding is
    the identity (a class rep IS its min doc_id), and same-class docs
    are a clique, so the class fixpoint equals the oracle's doc-level
    min-label closure exactly. See dedup_cluster's docstring for the
    batching/convergence argument."""
    ce = cpairs.select("ca", "cb")
    # lazy checkpoint: the first probe action materializes the edge
    # union and the first 10 hops in one job instead of two
    edges = (
        ce.toDF("s", "d")
        .union(ce.select(F.col("cb"), F.col("ca")).toDF("s", "d"))
        .union(
            classes.select(F.col("ck").alias("s"), F.col("ck").alias("d"))
        )
        .localCheckpoint(eager=False)
    )
    labels = classes.select("ck", F.col("ck").alias("lab"))
    prev_sum = None
    for hops in [10] + [2] * 15:  # supports class-graph diameter <= 40
        for _hop in range(hops):
            labels = (
                edges.join(labels, edges.d == labels.ck)
                .groupBy(F.col("s").alias("node"))
                .agg(F.min("lab").alias("lab"))
                .withColumnRenamed("node", "ck")
            )
        labels = labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("lab")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def cc_labels(
    spark: SparkSession,
    sf_dir: str,
    cpairs: DataFrame,
    classes: DataFrame,
    cmap: DataFrame,
) -> DataFrame:
    """Doc-level connected-components labels: cc_class_labels expanded
    back over class membership. Returns (doc_id, cluster_id) over ALL
    documents — empty-token docs (no class) fall through as singletons
    via the coalesce. Lazily checkpointed: consumers reference the
    label frame several times."""
    d = table(spark, sf_dir, "documents")
    labels = cc_class_labels(cpairs, classes)
    return (
        d.select("doc_id")
        .join(cmap, "doc_id", "left")
        .join(labels, "ck", "left")
        .select(
            "doc_id",
            F.coalesce("lab", F.col("doc_id")).alias("cluster_id"),
        )
        .localCheckpoint(eager=False)
    )


@register(
    "dedup_cluster",
    extra=True,
    oracle=f"""
    WITH RECURSIVE {_CC_COMPRESSED_CTE}
    SELECT doc_id, cluster_id,
           CAST(cluster_id = doc_id AS INT) AS is_canonical
    FROM cc
    """,
)
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS — the step a training pipeline actually
    needs after pair generation: connected components over the exact
    Jaccard pair graph, each doc labeled with its component's min
    doc_id, canonical = the keeper row.

    Spark side: iterative min-label propagation (the standard
    large-graph CC shape — Hash-to-Min style) as pure DataFrame ops.
    Self-loops are folded into the edge set so one hop is a single
    join + min-agg with ONE reference to the label frame — plan size
    stays LINEAR in hops per job (the union formulation references
    labels twice per hop, i.e. 2^hops subplans, which caps batching).
    That lets many hops ride in each materialized plan: the wall
    clock at small per-round data is eager-JOB count, not work, and
    threshold-chained near-dup graphs have real diameter (~10 here,
    not the near-clique ~2). Schedule: 10 hops in the first job, then
    2-hop probe jobs until the label sum is unchanged. The sum is
    monotone non-increasing per hop, so `sum unchanged across a
    batch` ⟹ unchanged at every hop in it ⟹ fixpoint — batching
    keeps the convergence test exact. Each probe is the SAME action
    that materializes the lazy localCheckpoint (one job, not two);
    lineage stays bounded.

    Oracle: DuckDB's recursive CTE computes the true min-label closure
    — an exact cross-engine check of an ITERATIVE graph algorithm."""
    cpairs, classes, cmap, _docsets = class_pair_frames(spark, sf_dir)
    labels = cc_labels(spark, sf_dir, cpairs, classes, cmap)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).cast("int").alias(
            "is_canonical"
        ),
    )


@register(
    "dedup_quality_pick",
    extra=True,
    oracle=f"""
    WITH RECURSIVE {_CC_COMPRESSED_CTE},
    qual AS (
        SELECT doc_id,
               CAST(len(list_distinct(
                   regexp_extract_all(lower(text), '{TOKEN_RE}')))
                   AS BIGINT) AS q_distinct,
               CAST(n_chars AS BIGINT) AS q_chars
        FROM documents
    ),
    j AS (
        SELECT c.cluster_id, q.doc_id, q.q_distinct, q.q_chars
        FROM cc c JOIN qual q USING (doc_id)
    ),
    best AS (
        SELECT cluster_id, doc_id AS rep_doc_id, q_distinct
        FROM j
        QUALIFY row_number() OVER (
            PARTITION BY cluster_id
            ORDER BY q_distinct DESC, q_chars DESC, doc_id
        ) = 1
    )
    SELECT b.cluster_id, b.rep_doc_id, b.q_distinct,
           s.cluster_size, s.cluster_size - 1 AS n_dropped
    FROM best b
    JOIN (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM cc GROUP BY 1
    ) s USING (cluster_id)
    """,
)
def dedup_quality_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE representative selection per near-dup cluster —
    the curation step after clustering: instead of keeping the min-id
    doc (dedup_cluster's canonical), keep the HIGHEST-QUALITY member
    (most distinct tokens, then most chars, then smallest id) and drop
    the rest. This is what production dedup actually ships: first-seen
    keeps whichever crawl copy arrived first; quality-pick keeps the
    least-truncated / least-boilerplate copy (the Gopher/FineWeb
    practice of scoring before dropping).

    The quality key is deliberately ALL-INTEGER (distinct-token count,
    char count) so the per-cluster argmax is oracle-exact; swapping in
    a float model score is a one-line change whose ranking would then
    need the quantization discipline. Shape: rides dedup_cluster's
    converged labels (one pair-graph + min-label propagation), one
    per-cluster argmax window over cluster-sized groups, one size
    aggregation."""
    clusters = dedup_cluster(spark, sf_dir).select("doc_id", "cluster_id")
    d = table(spark, sf_dir, "documents")
    qual = d.select(
        "doc_id",
        F.size(F.array_distinct(tokens_col()))
        .cast("bigint")
        .alias("q_distinct"),
        F.col("n_chars").cast("bigint").alias("q_chars"),
    )
    j = clusters.join(qual, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("q_distinct").desc(), F.col("q_chars").desc(), F.col("doc_id")
    )
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            "q_distinct",
        )
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return best.join(sizes, "cluster_id").select(
        "cluster_id",
        "rep_doc_id",
        "q_distinct",
        "cluster_size",
        (F.col("cluster_size") - 1).alias("n_dropped"),
    )


NGRAM_T = 0.9  # shingle-Jaccard threshold (order-sensitive near-dup)


@register(
    "dedup_ngram",
    extra=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]))
                   AS term
        FROM toks
        WHERE len(ts) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {NGRAM_T}
    """,
)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (order-sensitive variant) — near-dup pairs by 3-gram SHINGLE
    Jaccard. Token-set Jaccard (dedup_near) is order-blind: two docs
    with the same vocabulary in different order score 1.0; shingling
    restores word order into the set universe (the n-gram-Jaccard
    modality of the dedup suite). Shingle sets feed the SAME exact
    prefix-filtered join machinery as tokens — candidate generation
    stays an inverted-index equi-join on the rarest shingles, never
    all-pairs. Oracle = naive all-pairs spec over the same shingles."""
    d = table(spark, sf_dir, "documents")
    # Tokenize ONCE per doc before shingling. Writing element_at(
    # tokens_col(), i) inline looks harmless, but Catalyst substitutes
    # the regexp_extract_all into EVERY element_at — ~150 regexp
    # evaluations per document (measured: 10 s of the query's 12 s).
    # A checkpointed (doc_id, ts) projection pins one evaluation.
    toked = (
        d.select("doc_id", tokens_col().alias("ts"))
        .filter(F.size("ts") >= 3)
        .localCheckpoint(eager=True)
    )
    shingles = toked.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("ts", i + 1),
                    F.element_at("ts", i + 2),
                    F.element_at("ts", i + 3),
                ),
            )
        ).alias("toks"),
    )
    docsets = shingles.select(
        "doc_id", F.array_sort("toks").alias("toks"), F.size("toks").alias("sz")
    )
    # materialize the shingle sets ONCE more: the prefix join reads
    # them in four subtrees (doc-frequency, ranked index, both verify
    # sides)
    docsets = docsets.localCheckpoint(eager=True)
    return jaccard_pairs_prefix(docsets, NGRAM_T)


@register("dedup_simhash", extra=True)  # rows-only: bit-mix differs across engines
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (variant) — 16-bit SimHash per document, computed entirely
    with built-in expressions: each distinct token votes its xxhash64
    bits, the sign of the per-bit vote sum forms the fingerprint.
    Hamming-close fingerprints ⇒ similar token sets. The fingerprint
    doubles as a blocking key for near-dup candidate joins."""
    d = table(spark, sf_dir, "documents")
    tok = doc_tokens(d).distinct().withColumn("h", F.xxhash64("term"))
    nbits = 16
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(nbits)
        ]
    )
    fingerprint = sum(
        [
            F.when(F.col(f"b{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
            for i in range(nbits)
        ],
        F.lit(0),
    )
    return votes.select(
        "doc_id", fingerprint.cast("bigint").alias("simhash")
    )


# ---------------------------------------------------------------- X4


@register(
    "text_tokenize_tf",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    tf AS (SELECT term, COUNT(*) AS freq FROM tok GROUP BY term)
    SELECT term, freq
    FROM tf
    ORDER BY freq DESC, term
    LIMIT 100
    """,
)
def text_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — tokenize + global term frequency, top-100 terms.
    Explode → partial+final count → TakeOrdered top-k."""
    d = table(spark, sf_dir, "documents")
    return (
        doc_tokens(d)
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term"))
        .limit(100)
    )


# ---------------------------------------------------------------- X5


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS BIGINT) * 1.0 / COUNT(*), 6) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — per-(lang, source) document stats. Integer sums are exact;
    the average derives from them (order-independent)."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars") * 1.0 / F.count("*"), 6).alias("avg_chars"),
    )


# ---------------------------------------------------------------- X6


@register(
    "text_sentiment_lex",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
        FROM documents
    ),
    hits AS (
        SELECT doc_id, CAST(SUM(score) AS BIGINT) AS sentiment
        FROM tok JOIN {_lexicon_values_sql()} USING (term)
        GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(h.sentiment, 0) AS sentiment
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def text_sentiment_lex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — lexicon-based sentiment: tokens joined against a broadcast
    signed lexicon, summed per document (pattern from 'Large Scale
    Sentiment Analysis on Twitter with Spark', EDBT 2016 — PAPERS.md).
    Every-token counting (not distinct): repeated words accumulate."""
    d = table(spark, sf_dir, "documents")
    lex = F.broadcast(_lexicon_df(spark))
    hits = (
        doc_tokens(d)
        .join(lex, "term")
        .groupBy("doc_id")
        .agg(F.sum("score").cast("bigint").alias("sentiment"))
    )
    return (
        d.select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id", F.coalesce("sentiment", F.lit(0)).alias("sentiment"))
    )


# ------------------------------------------- training-pipeline extras


# GPT-2-family pre-tokenizer shape: contractions, letter runs, digit
# runs, punctuation runs, whitespace runs — no lookarounds, so the
# pattern is portable between Java regex (Spark) and RE2 (DuckDB).
BPE_RE = "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"


@register(
    "text_token_count",
    extra=True,
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tokens,
           len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')))
               AS n_unique_tokens,
           len(regexp_extract_all(text, '{BPE_RE.replace(chr(39), chr(39) * 2)}'))
               AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, all JVM-side (contrast with udf_surface's
    pandas-UDF path): whitespace-word totals/uniques plus a BPE-style
    pre-tokenizer count (the GPT-2 split pattern) — the cheap proxy
    for 'how many LLM tokens is this corpus'."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
    )


@register(
    "text_quality",
    extra=True,
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks,
               len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           n_chars * 1.0 / len(toks) AS chars_per_token,
           len(list_filter(toks, x -> x IN {STOPWORDS!r})) * 1.0 / len(toks)
               AS stopword_ratio,
           n_punct * 1.0 / n_chars AS punct_ratio,
           len(list_distinct(toks)) * 1.0 / len(toks) AS unique_ratio
    FROM t
    WHERE len(toks) > 0
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for training-data filtering: length, stopword
    ratio, punctuation density, lexical diversity — the standard
    cheap-heuristic battery, all as one codegen'd projection."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    return (
        d.select(
            "doc_id",
            "n_chars",
            toks.alias("toks"),
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0)
            ).alias("n_punct"),
        )
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            (F.col("n_chars") * 1.0 / F.size("toks")).alias("chars_per_token"),
            (
                F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
                * 1.0
                / F.size("toks")
            ).alias("stopword_ratio"),
            (F.col("n_punct") * 1.0 / F.col("n_chars")).alias("punct_ratio"),
            (F.size(F.array_distinct("toks")) * 1.0 / F.size("toks")).alias(
                "unique_ratio"
            ),
        )
    )


@register(
    "text_readability",
    extra=True,
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))
                    AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS n_syllables,
               CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
                    AS BIGINT) AS n_sentences
        FROM documents
    )
    SELECT doc_id, n_words, n_syllables, n_sentences,
           ROUND(CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE) * (n_words / n_sentences)
                 - CAST(84.6 AS DOUBLE) * (n_syllables / n_words), 6)
               AS flesch_ease,
           ROUND(CAST(0.39 AS DOUBLE) * (n_words / n_sentences)
                 + CAST(11.8 AS DOUBLE) * (n_syllables / n_words)
                 - CAST(15.59 AS DOUBLE), 6) AS fk_grade
    FROM t WHERE n_words > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READABILITY scoring — Flesch reading ease + Flesch-Kincaid
    grade per document, the classic complexity heuristics next to
    zx_text_quality's ratio battery (curation stacks gate on both:
    quality ratios catch boilerplate, readability catches
    impenetrable or trivially-simple text).

    Syllables = vowel-group count ([aeiouy]+ runs) over the WHOLE
    lowered text in one regexp pass — word boundaries break vowel
    runs, so this equals the per-word sum without any explode; the
    whole operator is a single codegen'd projection over the scan
    (zero shuffles, zero UDFs). Sentences = [.!?]+ runs floored at 1.
    Counts are exact integers; the two formulas are deterministic
    double expressions over them with every literal CAST to DOUBLE
    (DuckDB folds bare decimal literals in DECIMAL arithmetic — the
    MMR lambda lesson), rounded 6 d.p. both engines."""
    d = table(spark, sf_dir, "documents")
    words = F.size(tokens_col()).cast("bigint")
    syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    ).cast("bigint")
    sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
    ).cast("bigint")
    return (
        d.select(
            "doc_id",
            words.alias("n_words"),
            syl.alias("n_syllables"),
            sent.alias("n_sentences"),
        )
        .filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            "n_syllables",
            "n_sentences",
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
                - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
                6,
            ).alias("flesch_ease"),
            F.round(
                F.lit(0.39) * (F.col("n_words") / F.col("n_sentences"))
                + F.lit(11.8) * (F.col("n_syllables") / F.col("n_words"))
                - F.lit(15.59),
                6,
            ).alias("fk_grade"),
        )
    )


@register(
    "text_langid",
    extra=True,
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN len(list_filter(toks, x -> x IN ('the', 'a', 'of'))) * 1.0
                  / greatest(len(toks), 1) > 0.05 THEN 'en'
             WHEN len(toks) = 0 THEN 'unknown'
             ELSE 'other'
           END AS guessed_lang
    FROM t
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-density rule (the degenerate
    1-gram case of n-gram-profile language ID — real profiles plug in
    as a broadcast dim keyed by character n-gram). Deterministic, so
    oracle-checkable; emits the labeled lang alongside for accuracy
    eval downstream."""
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    en_stops = F.array(F.lit("the"), F.lit("a"), F.lit("of"))
    density = (
        F.size(F.filter(toks, lambda x: F.array_contains(en_stops, x)))
        * 1.0
        / F.greatest(F.size(toks), F.lit(1))
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(density > 0.05, "en")
        .when(F.size(toks) == 0, "unknown")
        .otherwise("other")
        .alias("guessed_lang"),
    )


@register(
    "text_fingerprint",
    extra=True,
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
        FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(range(1, len(toks) - 1),
               i -> md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))
               AS fingerprint
    FROM t
    WHERE len(toks) >= 3
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-hash-of-shingles (the winnowing
    family's 1-fingerprint case) — md5 over rolling token 3-grams,
    keep the minimum. Identical fingerprints ⇒ near-identical prefixes
    of content; used as a cheap join key for dedup candidates. md5 is
    identical across engines, so this is oracle-checkable."""
    d = table(spark, sf_dir, "documents")
    # Tokenize ONCE per doc (the dedup_ngram lesson): without the
    # checkpoint barrier Catalyst collapses the projection and
    # re-evaluates regexp_extract_all inside every element_at of the
    # shingle transform — 3 regexp runs per token per doc (measured
    # ~6 s of this query's wall; ~1 s with the barrier).
    witht = (
        d.select("doc_id", tokens_col().alias("toks"))
        .filter(F.size("toks") >= 3)
        .localCheckpoint(eager=True)
    )
    shingle_hash = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at("toks", i),
                F.element_at("toks", i + 1),
                F.element_at("toks", i + 2),
            )
        ),
    )
    return witht.select(
        "doc_id", F.array_min(shingle_hash).alias("fingerprint")
    )


@register(
    "corpus_curation",
    extra=True,
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, n_chars,
               regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks,
               len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
        FROM documents
    ),
    quality AS (
        SELECT doc_id, lang, n_chars, toks
        FROM t
        WHERE len(toks) >= 20
          AND len(list_distinct(toks)) * 1.0 / len(toks) >= 0.3
          AND n_punct * 1.0 / n_chars < 0.1
    ),
    fp AS (
        SELECT doc_id, lang, n_chars,
               list_min(list_transform(range(1, len(toks) - 1),
                   i -> md5(toks[i] || ' ' || toks[i + 1] || ' '
                            || toks[i + 2]))) AS fingerprint
        FROM quality
        WHERE len(toks) >= 3
    ),
    canon AS (
        SELECT * FROM fp
        QUALIFY row_number() OVER (
            PARTITION BY fingerprint ORDER BY doc_id
        ) = 1
    ),
    sampled AS (
        SELECT * FROM canon
        WHERE (((doc_id * 2654435761 + 12345) % 100) + 100) % 100 <
              CASE lang
                   WHEN 'en' THEN 20 WHEN 'de' THEN 60
                   WHEN 'fr' THEN 60 WHEN 'es' THEN 60
                   ELSE 100 END
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM sampled
    GROUP BY lang
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data curation pipeline — the X-series
    composed the way a real corpus build runs it, in ONE declarative
    plan (one scan; every stage is a projection/filter/window over the
    previous one, so Catalyst fuses the gates into the scan):

      1. quality gate  (length / lexical diversity / punctuation
         density — text_quality's battery as predicates)
      2. near-dup canonicalization (keep the min doc per min-shingle
         fingerprint — text_fingerprint as a blocking dedup)
      3. stratified downsampling (sample_stratified's deterministic
         per-language hash-bucket rates)
      4. per-language audit counts (what survived).

    Deterministic end to end, so the whole composition oracle-checks.
    """
    from eventstream_notify_spark.operators.sampling import (
        _DEFAULT_RATE,
        _LANG_RATES,
        _bucket,
    )

    d = table(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id", "lang", "n_chars", tokens_col().alias("toks"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0)
        ).alias("n_punct"),
    )
    quality = toked.filter(
        (F.size("toks") >= 20)
        & (F.size(F.array_distinct("toks")) * 1.0 / F.size("toks") >= 0.3)
        & (F.col("n_punct") * 1.0 / F.col("n_chars") < 0.1)
    )
    fp = quality.filter(F.size("toks") >= 3).select(
        "doc_id",
        "lang",
        "n_chars",
        F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at("toks", i + 1),
                        F.element_at("toks", i + 2),
                        F.element_at("toks", i + 3),
                    )
                ),
            )
        ).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    canon = (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r))
            for lang, r in _LANG_RATES.items()
        ],
        F.lit(_DEFAULT_RATE),
    )
    sampled = canon.filter(_bucket("doc_id") < rate)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# ------------------------------------------------- LLM pipeline (r3)


def _shingle_rows(
    d: DataFrame, n: int, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra, term) rows of distinct word n-gram shingles.
    Tokenize once behind a checkpoint barrier (Catalyst inlines the
    regexp into every element_at otherwise — see dedup_ngram), then
    slide an n-window as a transform over positions. ``extra`` carries
    additional columns (e.g. source) through the projection so callers
    never need to re-join them back on doc_id — re-attaching source
    via an O(corpus) broadcast was a driver OOM at design scale."""
    toked = (
        d.select("doc_id", *extra, tokens_col().alias("ts"))
        .filter(F.size("ts") >= n)
        .localCheckpoint(eager=True)
    )
    return toked.select(
        "doc_id",
        *extra,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - n),
                    lambda i: F.concat_ws(
                        " ",
                        *[F.element_at("ts", i + k + 1) for k in range(n)],
                    ),
                )
            )
        ).alias("term"),
    )


_SHINGLE5_SQL = """
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ts) - 3),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                        || ts[i+3] || ' ' || ts[i+4])) AS term
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents)
        WHERE len(ts) >= 5
    )
"""


@register(
    "llm_decontaminate",
    extra=True,
    oracle=f"""
    WITH {_SHINGLE5_SQL}
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.term) AS BIGINT) AS n_shared_ngrams,
           CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
    FROM sh t JOIN sh e ON t.term = e.term
    WHERE t.doc_id % 10 <> 7 AND e.doc_id % 10 = 7
    GROUP BY t.doc_id
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the training-pipeline step that
    finds train documents sharing verbatim word 5-grams with the held
    -out eval split (here: doc_id % 10 == 7). Output per contaminated
    train doc: how many distinct shingles leak and how many eval docs
    they touch. The overlap is an inverted-index equi-join on the
    shingle — never a doc×doc comparison; at 100 TB the join key
    becomes the shingle's 8-byte hash and the eval side (benchmarks
    are small) broadcasts."""
    sh = _shingle_rows(table(spark, sf_dir, "documents"), 5)
    train = sh.filter(F.col("doc_id") % 10 != 7)
    ev = (
        sh.filter(F.col("doc_id") % 10 == 7)
        .select(F.col("doc_id").alias("eval_doc"), "term")
    )
    return (
        train.join(F.broadcast(ev), "term")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_shared_ngrams"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
    )


@register(
    "llm_pack_sequences",
    extra=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    AS BIGINT) AS n_tok
        FROM documents
    ),
    packed AS (
        SELECT doc_id, lang, n_tok,
               CAST(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok AS start_off
        FROM toks
    )
    SELECT doc_id, lang, n_tok,
           CAST(FLOOR(start_off / 512.0) AS BIGINT) AS seq_id,
           start_off % 512 AS seq_offset
    FROM packed
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign every document a starting slot in a
    stream of fixed 512-token training sequences (concat-then-chunk
    packing, the deterministic variant of greedy packing): per lang,
    docs concatenate in doc_id order; a doc's sequence is where its
    first token lands. One window cumsum per lang — at scale the
    partition key is (lang, shard) and sequence ids offset by shard
    base, keeping the window bounded. 512 is a power of two, so the
    floor-division is exact in both engines' doubles."""
    d = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = d.select(
        "doc_id", "lang", F.size(tokens_col()).cast("bigint").alias("n_tok")
    )
    packed = toks.withColumn(
        "start_off", F.sum("n_tok").over(w).cast("bigint") - F.col("n_tok")
    )
    return packed.select(
        "doc_id",
        "lang",
        "n_tok",
        F.floor(F.col("start_off") / F.lit(512.0)).cast("bigint").alias("seq_id"),
        (F.col("start_off") % 512).alias("seq_offset"),
    )


@register(
    "llm_boilerplate_ngrams",
    extra=True,
    oracle=f"""
    WITH {_SHINGLE5_SQL},
    df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
        FROM sh GROUP BY term
    ),
    total AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, doc_freq,
           doc_freq / (SELECT n_docs FROM total) AS doc_share
    FROM df
    ORDER BY doc_freq DESC, term
    LIMIT 20
    """,
)
def llm_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining — the most document-frequent word 5-grams
    (C4-style repeated-span detection feeds on exactly this table).
    Shingles are distinct per doc, so COUNT(*) per term IS document
    frequency; top-20 is TakeOrdered with the term as tie-break, and
    the share is one exactly-rounded IEEE division of exact integers."""
    d = table(spark, sf_dir, "documents")
    total = d.agg(F.count("*").cast("double").alias("n_docs"))
    df = _shingle_rows(d, 5).groupBy("term").agg(
        F.count("*").alias("doc_freq")
    )
    # the corpus size rides in as a broadcast 1-row frame — no driver
    # action anywhere in the operator path
    return (
        df.crossJoin(F.broadcast(total))
        .select(
            "term",
            "doc_freq",
            (F.col("doc_freq") / F.col("n_docs")).alias("doc_share"),
        )
        .orderBy(F.col("doc_freq").desc(), "term")
        .limit(20)
    )


@register(
    "llm_domain_mix",
    extra=True,
    oracle="""
    WITH toks AS (
        SELECT lang, source,
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
    )
    SELECT g.lang, g.source, g.n_docs, g.n_tokens,
           g.n_tokens / (SELECT total_tokens FROM tot) AS actual_share,
           (SELECT total_tokens FROM tot)
               / ((SELECT n_groups FROM tot) * 1.0 * g.n_tokens) AS mix_weight
    FROM grp g
    """,
)
def llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture weighting — per (lang, source) token counts,
    corpus share, and the resampling weight that would equalize the
    mixture across domains (weight = uniform_share / actual_share).
    Two narrow aggregations and a broadcast scalar join; the shares
    are single exactly-rounded divisions of exact integer sums, so
    they hash-match across engines."""
    d = table(spark, sf_dir, "documents")
    grp = (
        d.select("lang", "source", F.size(tokens_col()).cast("bigint").alias("n_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    tot = grp.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_groups"),
    )
    return grp.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("total_tokens")).alias("actual_share"),
        (
            F.col("total_tokens")
            / (F.col("n_groups") * F.lit(1.0) * F.col("n_tokens"))
        ).alias("mix_weight"),
    )


@register(
    "llm_lm_score",
    extra=True,
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents
    ),
    bg AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 2
    ),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        FROM bg GROUP BY w1
    ),
    v AS (
        SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v
        FROM (SELECT unnest(ts) AS term FROM t)
    ),
    dbg AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM bg GROUP BY doc_id, w1, w2
    ),
    scored AS (
        SELECT dbg.doc_id, dbg.n_occ,
               (1000000 * (c12.c12 + 1)) // (c1.c1 + v.v) AS p_micro
        FROM dbg
        JOIN c12 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN v
    )
    SELECT doc_id,
           CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
           CAST(SUM(n_occ * p_micro) AS BIGINT) AS sum_p_micro,
           CAST(SUM(n_occ * p_micro) AS DOUBLE)
               / CAST(SUM(n_occ) AS DOUBLE) AS lm_score
    FROM scored GROUP BY doc_id
    """,
)
def llm_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the KenLM-style
    quality gate of a pretraining pipeline (CCNet / RefinedWeb filter
    docs by LM score exactly this way): train add-one-smoothed bigram
    statistics ON the corpus itself, then score every document by its
    mean bigram likelihood. The likelihood is kept as an integer
    micro-probability ``(1e6·(c12+1)) div (c1+V)`` rather than a log
    perplexity: floor-division of exact integer counts is bit-identical
    cross-engine (ln is not guaranteed last-ulp-equal between JVM and
    libm), and mean-µ-probability is order-isomorphic to perplexity
    for ranking/thresholding — the same trade text_bm25 makes with its
    log-free Robertson idf.

    Shape for 100 TB: bigram occurrences are class-compressed per doc
    (``dbg`` carries distinct (doc,w1,w2) with a count) before joining
    the model, so the model join shuffles distinct-bigrams-per-doc,
    not token volume. The bigram table ``c12`` joins on its natural
    (w1,w2) key (co-partitioned shuffle join — this is the one heavy
    join and it is key-aligned); the unigram table and the vocab
    scalar ride in as broadcasts. Training and scoring are ONE
    declarative plan — no model materialization round-trip."""
    d = table(spark, sf_dir, "documents")
    tok_arr = d.select("doc_id", tokens_col().alias("ts"))
    bg = (
        tok_arr.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(ts[i - 1] AS w1, ts[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = tok_arr.select(F.explode("ts").alias("term")).agg(
        F.countDistinct("term").cast("bigint").alias("v")
    )
    dbg = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n_occ"))
    scored = (
        dbg.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "n_occ",
            F.expr("(1000000 * (c12 + 1)) div (c1 + v)").alias("p_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("p_micro"))
            .cast("bigint")
            .alias("sum_p_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_p_micro",
            (
                F.col("sum_p_micro").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("lm_score"),
        )
    )


@register(
    "llm_kn_score",
    extra=True,
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents
    ),
    bg AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 2
    ),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        FROM bg GROUP BY w1
    ),
    n1f AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1f
        FROM c12 GROUP BY w1
    ),
    n1b AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
        FROM c12 GROUP BY w2
    ),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM c12),
    dbg AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM bg GROUP BY doc_id, w1, w2
    ),
    scored AS (
        SELECT dbg.doc_id, dbg.n_occ,
               (1000000 * ((4 * c12.c12 - 3) * tt.t
                           + 3 * n1f.n1f * n1b.n1b))
                   // (4 * c1.c1 * tt.t) AS p_micro
        FROM dbg
        JOIN c12 USING (w1, w2)
        JOIN c1 USING (w1)
        JOIN n1f USING (w1)
        JOIN n1b USING (w2)
        CROSS JOIN tt
    )
    SELECT doc_id,
           CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
           CAST(SUM(n_occ * p_micro) AS BIGINT) AS sum_p_micro,
           CAST(SUM(n_occ * p_micro) AS DOUBLE)
               / CAST(SUM(n_occ) AS DOUBLE) AS kn_score
    FROM scored GROUP BY doc_id
    """,
)
def llm_kn_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the smoothing KenLM
    actually ships (Kneser & Ney '95; Chen & Goodman '98 found it
    dominant), next to zx_llm_lm_score's add-one baseline. KN's two
    ideas: absolute discounting (subtract a constant D from every
    observed bigram count instead of add-one's inflation) and the
    CONTINUATION unigram (back off to "how many distinct contexts
    does w2 follow?", not raw frequency — 'francisco' is frequent but
    only ever follows 'san', so its continuation probability is tiny):

        P(w2|w1) = (c12 − D)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/T

    Exactness trick: D = 3/4 is RATIONAL, so with the same integer
    micro-probability convention as lm_score the whole model is one
    floor division of exact bigint products —
    µP = 1e6·((4·c12−3)·T + 3·N1f·N1b) div (4·c1·T) — bit-identical
    cross-engine, no log, no float accumulation. (Observed bigrams
    always have c12 ≥ 1 > D, so the max(·,0) clamp never binds and is
    dropped.) At true 100 TB counts the products want decimal(38,0)
    headroom; bigint covers every test SF with 3+ orders to spare.

    Shape mirrors lm_score (SURVEY §2 text family): class-compressed
    per-doc bigrams (dbg) join the model on its natural (w1,w2) key —
    the one token-volume shuffle; the continuation tables N1+(w1·),
    N1+(·w2) and the type count T derive from the already-aggregated
    bigram-type table (tiny) and ride in as broadcasts."""
    d = table(spark, sf_dir, "documents")
    tok_arr = d.select("doc_id", tokens_col().alias("ts"))
    bg = (
        tok_arr.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(ts[i - 1] AS w1, ts[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    n1f = c12.groupBy("w1").agg(F.count("*").alias("n1f"))
    n1b = c12.groupBy("w2").agg(F.count("*").alias("n1b"))
    tt = c12.agg(F.count("*").cast("bigint").alias("t"))
    dbg = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n_occ"))
    scored = (
        dbg.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(n1f), "w1")
        .join(F.broadcast(n1b), "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            "n_occ",
            F.expr(
                "(1000000 * ((4 * c12 - 3) * t + 3 * n1f * n1b))"
                " div (4 * c1 * t)"
            ).alias("p_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("n_occ") * F.col("p_micro"))
            .cast("bigint")
            .alias("sum_p_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_p_micro",
            (
                F.col("sum_p_micro").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("kn_score"),
        )
    )


@register(
    "llm_ppl_buckets",
    extra=True,
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents
    ),
    bg AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
        WHERE len(ts) >= 2
    ),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        FROM bg GROUP BY w1
    ),
    n1f AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1f
        FROM c12 GROUP BY w1
    ),
    n1b AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
        FROM c12 GROUP BY w2
    ),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM c12),
    dbg AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM bg GROUP BY doc_id, w1, w2
    ),
    scored AS (
        SELECT dbg.doc_id, dbg.n_occ,
               (1000000 * ((4 * c12.c12 - 3) * tt.t
                           + 3 * n1f.n1f * n1b.n1b))
                   // (4 * c1.c1 * tt.t) AS p_micro
        FROM dbg
        JOIN c12 USING (w1, w2)
        JOIN c1 USING (w1)
        JOIN n1f USING (w1)
        JOIN n1b USING (w2)
        CROSS JOIN tt
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(n_occ * p_micro) AS DOUBLE)
                   / CAST(SUM(n_occ) AS DOUBLE) AS kn_score
        FROM scored GROUP BY doc_id
    )
    SELECT d.source,
           CASE NTILE(3) OVER (
               PARTITION BY d.source
               ORDER BY p.kn_score DESC, p.doc_id
           ) WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             ELSE 'tail' END AS ppl_bucket,
           p.doc_id, ROUND(p.kn_score, 6) AS kn_score
    FROM per_doc p JOIN documents d USING (doc_id)
    """,
)
def llm_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus-trained KN bigram model and split
    each SOURCE into head / middle / tail terciles by model score —
    the curation primitive behind 'train on head, sample middle, drop
    tail'. High mean bigram probability = low perplexity = head
    (order-isomorphic, same trade as lm_score's log-free ranking).

    Exact terciles via NTILE(3) per source with a deterministic
    (score DESC, doc_id) order — both engines fill earlier tiles
    first, so the split is bit-reproducible. The tercile window
    shuffles only (doc_id, source, score) — never text. At true
    100 TB CCNet itself switches to sampled thresholds (compute the
    two cut scores on a per-source sample, then assign by comparison
    — an embarrassingly parallel map); the NTILE form here is the
    exact-spec anchor that a sampled variant would be validated
    against. Docs with <2 tokens have no bigram evidence and are
    excluded (inner join), matching the scorer's domain."""
    sc = llm_kn_score(spark, sf_dir).select("doc_id", "kn_score")
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.col("kn_score").desc(), "doc_id"
    )
    return (
        sc.join(d, "doc_id")
        .withColumn("nt", F.ntile(3).over(w))
        .select(
            "source",
            F.when(F.col("nt") == 1, "head")
            .when(F.col("nt") == 2, "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
            "doc_id",
            F.round("kn_score", 6).alias("kn_score"),
        )
    )


# ------------------------------------------------ graph analytics (r3)

_PR_ITERS = 6
_PR_SCALE = 1_000_000_000_000  # fixed-point 1e12


def _pagerank_oracle() -> str:
    """Unrolled fixed-point PageRank SQL (``_PR_ITERS`` steps): each r{t} CTE is
    one exact integer step, so the chain is trivially correct and
    engine-independent (recursive CTEs with per-step aggregation are
    not portable; unrolling is)."""
    steps = []
    for t in range(_PR_ITERS):
        steps.append(f"""
    r{t + 1} AS (
        SELECT v.node,
               CAST({15 * _PR_SCALE} // 100
                    + 85 * COALESCE(s.acc, 0) // 100 AS BIGINT) AS r
        FROM verts v
        LEFT JOIN (
            SELECT e.d AS node, CAST(SUM(r{t}.r // deg.deg) AS BIGINT) AS acc
            FROM edges e
            JOIN r{t} ON r{t}.node = e.s
            JOIN deg ON deg.node = e.s
            GROUP BY e.d
        ) s ON s.node = v.node
    )""")
    return f"""
    WITH {_PAIRS_CTE},
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL
        SELECT doc_b AS s, doc_a AS d FROM pairs
    ),
    verts AS (SELECT DISTINCT s AS node FROM edges),
    deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY s),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM verts),
    {",".join(steps)}
    SELECT node AS doc_id, r AS rank_fp
    FROM r{_PR_ITERS}
    """


@register("pagerank_dedup_graph", extra=True, oracle=None)
def pagerank_dedup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate pair graph — ranks each doc by
    how centrally it sits in its duplication cluster (the keeper-
    selection signal a dedup pipeline uses beyond min-id). Iterative
    matrix-vector products as join + integer aggregation, 6 fixed
    iterations, lineage checkpointed every 3rd.

    DETERMINISTIC BY CONSTRUCTION: ranks are fixed-point integers
    (1e12 scale); each step is contrib = r DIV deg, summed exactly
    (integer sums commute), then r' = 15%·SCALE + 85%·sum with
    integer DIV — so the result is bit-identical in any engine,
    partitioning, or summation order, and the ORACLE (the same 6
    steps as unrolled SQL CTEs) hash-matches exactly. The vertex set
    is the pair graph's nodes (every node has deg ≥ 1 — no dangling
    mass). The floating-point formulation would be impossible to
    oracle-check: double sums over in-neighbors are partition-order
    dependent."""
    # r13 opt (class compression, the cc_labels/graph_triangles
    # discipline): identical token sets have uniform adjacency, all
    # members of a class carry IDENTICAL rank at every step (equal
    # init + identical in-neighborhoods), and the integer recurrence
    # factors exactly through the class graph:
    #   deg_X = (s_X - 1) + Σ_{Y~X} s_Y
    #   acc_X = (s_X - 1)·(r_X div deg_X) + Σ_{Y~X} s_Y·(r_Y div deg_Y)
    #   r'_X  = 15·SCALE div 100 + 85·acc_X div 100
    # Every iteration runs over class-count-sized frames (a few
    # hundred rows at sf0.1) instead of the ~380k doc edge rows — the
    # per-iteration cost is corpus-INDEPENDENT. r14: the class edges
    # come straight from class_pair_frames' class-level candidate
    # join, so the doc pair list (the ~83x-per-decade frame this
    # corpus grows) is never built at all — r13 still paid one full
    # doc-pair tagging pass here. Integer div/sums commute, so the
    # unrolled doc-level SQL oracle still hash-matches exactly.
    cpairs, classes, cmap, _docsets = class_pair_frames(spark, sf_dir)
    sizes = classes
    ce = cpairs.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
    und = ce.union(ce.select(F.col("y").alias("x"), F.col("x").alias("y")))
    ext = (
        und.join(
            F.broadcast(
                sizes.select(F.col("ck").alias("y"), F.col("s").alias("sy"))
            ),
            "y",
        )
        .groupBy("x")
        .agg(F.sum("sy").alias("ext"))
    )
    # base: one materialized class frame (ck, s, deg) — the vertex set
    # is exactly the pair graph's nodes' classes (deg >= 1)
    base = (
        sizes.join(ext.withColumnRenamed("x", "ck"), "ck", "left")
        .select(
            "ck",
            "s",
            (
                F.col("s") - 1 + F.coalesce("ext", F.lit(0))
            ).cast("bigint").alias("deg"),
        )
        .filter(F.col("deg") >= 1)
        .localCheckpoint(eager=False)
    )
    undc = und.localCheckpoint(eager=False)
    # the iteration state CARRIES (s, deg) so a round needs no join
    # against base — c is a narrow projection of the state
    r = base.select(
        "ck", "s", "deg", F.lit(_PR_SCALE).cast("bigint").alias("r")
    )
    for t in range(_PR_ITERS):
        c = r.select("ck", "s", "deg", F.expr("r div deg").alias("c"))
        nb = (
            undc.join(
                F.broadcast(
                    c.select(
                        F.col("ck").alias("y"),
                        (F.col("s") * F.col("c")).alias("syc"),
                    )
                ),
                "y",
            )
            .groupBy(F.col("x").alias("ck"))
            .agg(F.sum("syc").alias("nbs"))
        )
        r = (
            c.join(F.broadcast(nb), "ck", "left")
            .select(
                "ck",
                "s",
                "deg",
                (
                    F.expr(f"{15 * _PR_SCALE} div 100")
                    + F.expr(
                        "85 * ((s - 1) * c + coalesce(nbs, 0)) div 100"
                    )
                ).alias("r"),
            )
        )
        # the rank frame is class-count-sized; an EAGER checkpoint per
        # iteration keeps each broadcast side a materialized RDD scan
        # instead of a t-deep nest of broadcast-within-broadcast
        # subplans (measured r13: batching to every 3rd round was
        # SLOWER — un-materialized broadcast subtrees re-execute the
        # whole inner round chain per broadcast build)
        r = r.localCheckpoint(eager=True)
    return (
        cmap.join(r, "ck")
        .select("doc_id", F.col("r").alias("rank_fp"))
    )


# register the generated oracle after definition (it needs _PAIRS_CTE
# rendered once; @register's oracle= slot takes the string)
from eventstream_notify_spark import registry as _registry  # noqa: E402

_registry._REGISTRY["zx_pagerank_dedup_graph"] = _registry.Registered(
    name="zx_pagerank_dedup_graph",
    fn=pagerank_dedup_graph,
    oracle=_pagerank_oracle(),
)


@register(
    "dedup_incremental",
    extra=True,
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS toks
        FROM documents
    ),
    sized AS (SELECT doc_id, toks, len(toks) AS sz FROM tok),
    newb AS (SELECT * FROM sized WHERE doc_id % 5 = 4),
    corpus AS (SELECT * FROM sized WHERE doc_id % 5 <> 4),
    pairs AS (
        SELECT n.doc_id AS new_doc, c.doc_id AS corpus_doc,
               len(list_intersect(n.toks, c.toks)) AS common,
               n.sz AS nsz, c.sz AS csz
        FROM newb n JOIN corpus c
          ON len(list_intersect(n.toks, c.toks)) * 1.0
             / (n.sz + c.sz - len(list_intersect(n.toks, c.toks)))
             >= {JACCARD_T}
    )
    SELECT new_doc,
           MIN(corpus_doc) AS dup_of,
           CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM pairs
    GROUP BY new_doc
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup — the PRODUCTION dedup shape: a new
    batch (doc_id % 5 == 4 stands in for today's crawl) is checked
    against the existing corpus index, never corpus×corpus. Each new
    doc reports its lowest-id corpus duplicate and match count.

    The deletion-neighborhood index is ASYMMETRIC: corpus keys are
    built once (at 100 TB they LIVE as a bucketed table keyed by the
    8-byte set-hash; here rebuilt per run), the new batch explodes
    its keys and equi-joins in. Candidate volume is O(|new| ·
    collisions), independent of corpus size — re-running the full
    corpus self-join for every increment is exactly what this shape
    avoids. The oracle is the naive new×corpus spec."""
    d = table(spark, sf_dir, "documents")
    docsets = _token_sets(d).localCheckpoint(eager=False)
    newb = docsets.filter(F.col("doc_id") % 5 == 4)
    corpus = docsets.filter(F.col("doc_id") % 5 != 4)
    pairs = _deletion_join_asym(newb, corpus, JACCARD_T)
    return pairs.groupBy(F.col("doc_a").alias("new_doc")).agg(
        F.min("doc_b").alias("dup_of"),
        F.count("*").alias("n_matches"),
    )


def _deletion_join_asym(
    left: DataFrame, right: DataFrame, t: float
) -> DataFrame:
    """Deletion-neighborhood join between two DISTINCT frames (the
    incremental variant of ``jaccard_pairs_deletion``): same XOR key
    algebra, but sides are a (small) probe frame and a (large) index
    frame, and every (left, right) pair emits regardless of id order.
    Exact under the same sym-diff ≤ 1 bound."""

    def keyed(df: DataFrame) -> DataFrame:
        tok_hashes = F.transform(F.col("toks"), lambda tk: F.xxhash64(tk))
        full_key = F.aggregate(
            tok_hashes, F.lit(0).cast("long"), lambda a, h: a.bitwiseXOR(h)
        )
        return df.select(
            "doc_id",
            "sz",
            F.explode(
                F.concat(
                    F.array(
                        F.struct(full_key.alias("key"), F.lit(1).alias("is_full"))
                    ),
                    F.transform(
                        tok_hashes,
                        lambda h: F.struct(
                            full_key.bitwiseXOR(h).alias("key"),
                            F.lit(0).alias("is_full"),
                        ),
                    ),
                )
            ).alias("k"),
        ).select("doc_id", "sz", "k.key", "k.is_full")

    a, b = keyed(left).alias("a"), keyed(right).alias("b")
    common = F.when(
        (F.col("a.is_full") == 1) | (F.col("b.is_full") == 1),
        F.least("a.sz", "b.sz"),
    ).otherwise(F.col("a.sz") - 1)
    pairs = (
        a.join(b, F.col("a.key") == F.col("b.key"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sza"),
            F.col("b.sz").alias("szb"),
        )
        .agg(F.max(common).alias("common"))
    )
    jac = F.col("common") * 1.0 / (F.col("sza") + F.col("szb") - F.col("common"))
    return pairs.filter(jac >= t).select("doc_a", "doc_b")


CONTAIN_WITNESS_BUDGET = 16  # supers kept per subsumed doc: the
#   curation decision is "is A subsumed, and by whom" — B earliest
#   witnesses answer it; the full witness list is quadratic OUTPUT on
#   a duplicate-heavy corpus (measured at the 10x decade: 829M pairs,
#   100x per 10x docs; the audit's worst cell at 39.25x). First-B by
#   super_doc id is deterministic, coverage-preserving (every subsumed
#   doc keeps >=1 witness), and IN the oracle.


@register(
    "dedup_containment",
    extra=True,
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS toks
        FROM documents
    ),
    sized AS (SELECT doc_id, toks, len(toks) AS sz FROM tok),
    pairs AS (
        SELECT a.doc_id AS sub_doc, b.doc_id AS super_doc,
               len(list_intersect(a.toks, b.toks)) AS common,
               a.sz AS asz
        FROM sized a JOIN sized b ON a.doc_id <> b.doc_id
    ),
    qual AS (
        SELECT sub_doc, super_doc,
               ROUND(common * 1.0 / asz, 6) AS containment,
               row_number() OVER (
                   PARTITION BY sub_doc ORDER BY super_doc
               ) AS rnk
        FROM pairs
        WHERE common * 1.0 / asz >= 0.9 AND asz >= 5
    )
    SELECT sub_doc, super_doc, containment
    FROM qual WHERE rnk <= {CONTAIN_WITNESS_BUDGET}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join — ASYMMETRIC near-dup: doc A is subsumed by B
    when ≥90% of A's token set appears in B (|A∩B|/|A| ≥ 0.9),
    regardless of how much bigger B is. Jaccard misses exactly these
    pairs (a quote inside a long article scores near 0); curation
    pipelines drop the subsumed side. Candidate generation is the
    inverted-index equi-join on shared tokens with a COUNT reaching
    the per-A threshold — the count IS the intersection size, so
    verification needs no set re-materialization; tiny sets (<5
    tokens) are excluded as trivially contained. At 100 TB the token
    posting lists are the index you already built for dedup_near.

    Output is budgeted (the winnowing posture): each sub_doc reports
    its first CONTAIN_WITNESS_BUDGET super_docs by id — the decision
    a curation pipeline consumes ("subsumed, and by whom") is intact,
    while the emitted pair set is <= B*n instead of the quadratic
    full witness list a duplicate-heavy corpus produces (829M pairs
    at the 10x decade before the budget). On the bitmask path the
    budget is pushed INTO candidate generation: only each mask
    class's first B+1 docs can ever be witnesses, so the doc-attach
    join — the 829M-row stage — never materializes more than B+1
    supers per class pair."""
    d = table(spark, sf_dir, "documents")
    docsets = _token_sets(d).localCheckpoint(eager=False)
    # Strategy pick, like dedup_near: one profiling scalar decides.
    # On a BOUNDED vocabulary (≤62 tokens), token posting lists are
    # ~the whole corpus and the inverted-index formulation
    # degenerates to the cross join (measured: 165 s at sf0.1) — but
    # a token set IS a ≤62-bit bitmask, so containment becomes
    # bit_count(a&b)/bit_count(a) and the quadratic work collapses
    # onto DISTINCT MASKS (set equivalence classes — thousands, not
    # millions) as pure 64-bit ALU ops on a broadcast nested loop
    # (measured: 4 s). Docs re-attach per class only for qualifying
    # class pairs. Past 62 tokens the inverted-index path takes over
    # (posting lists are small exactly when the vocab is large).
    n_vocab = (
        docsets.select(F.explode("toks").alias("term"))
        .agg(F.countDistinct("term"))
        .first()[0]
    ) or 0
    if n_vocab > 62:
        return _containment_inverted(docsets)
    vocab = (
        docsets.select(F.explode("toks").alias("term"))
        .distinct()
        .withColumn(
            "bit",
            F.row_number().over(Window.orderBy("term")).cast("long") - 1,
        )
    )
    masks = (
        docsets.select("doc_id", "sz", F.explode("toks").alias("term"))
        .join(F.broadcast(vocab), "term")
        .groupBy("doc_id", "sz")
        .agg(
            F.sum(
                F.expr("shiftleft(cast(1 as bigint), cast(bit as int))")
            ).alias("mask")
        )
        .localCheckpoint(eager=False)
    )
    classes = masks.groupBy("mask").agg(F.count("*").alias("n")).select("mask")
    # repartition pins the broadcast-NL stream side at full core count:
    # the class frame is tiny (35k rows at the decade) so AQE coalesces
    # its shuffle to ~1 partition — which would run the classes^2 ALU
    # loop (1.2B cells at the decade) on ONE core
    par = spark.sparkContext.defaultParallelism
    # bca precomputed on the stream side + integer threshold compare:
    # the classes^2 NL loop (1.2B cells at the decade) then costs one
    # AND + one popcount + one integer compare per cell instead of two
    # popcounts and a double division; the containment VALUE is only
    # computed after the budget, on <= (B+1) x classes rows
    ca = (
        classes.select(
            F.col("mask").alias("ma"), F.bit_count("mask").alias("bca")
        )
        .filter(F.col("bca") >= 5)
        .repartition(par)
    )
    cb = classes.select(F.col("mask").alias("mb"))
    qual = (
        ca.crossJoin(F.broadcast(cb))
        .filter(
            F.bit_count(F.col("ma").bitwiseAND(F.col("mb"))) * 10
            >= F.col("bca") * 9
        )
        .select("ma", "mb")
    )
    # Witness-budget pushdown: a sub_doc's first-B supers (by id) can
    # only come from each qualifying class's first B+1 docs (B, plus
    # one slack slot in case the sub_doc itself is among them — every
    # class qualifies against its own mask at containment 1.0).
    # HOW matters as much as WHAT here: the qualifying class-pair set
    # is ~122M rows at the 10x decade, and a row_number window over it
    # is a 122M-row skewed sort (measured: 516 s). Instead the merge
    # of "B+1 smallest supers across qualifying classes" is ONE
    # map-side-combinable aggregate fused into the crossJoin stage —
    # slice(array_sort(collect_list)) per ma — so the class-pair set
    # is never sorted and never shuffled as rows (only per-ma partial
    # lists move, and each ma lives in exactly one stream-side
    # partition of the broadcast NL join, so the merge is local).
    # top_docs (<= B+1 per class) rides the same broadcast; measured
    # 39.7 s / 9.4x at the decade. Containment values are NOT carried
    # through the aggregate (halves the shuffled bytes) — they are
    # recomputed from the two masks after the merge, bit-identical
    # because bit_count algebra is exact integer math.
    budget = CONTAIN_WITNESS_BUDGET
    top_docs = (
        masks.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("mask").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") <= budget + 1)
        .select(F.col("mask").alias("mb"), F.col("doc_id").alias("super_doc"))
    )
    merged = (
        qual.join(F.broadcast(top_docs), "mb")
        .groupBy("ma")
        .agg(
            F.slice(
                F.array_sort(F.collect_list("super_doc")), 1, budget + 1
            ).alias("ws")
        )
    )
    sup = merged.select("ma", F.explode("ws").alias("super_doc")).join(
        masks.select(
            F.col("doc_id").alias("super_doc"), F.col("mask").alias("mb")
        ),
        "super_doc",
    )
    cont_v = (
        F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
        * 1.0
        / F.bit_count("ma")
    )
    da = masks.select(F.col("doc_id").alias("sub_doc"), F.col("mask").alias("ma"))
    return _witness_budget(
        sup.join(da, "ma")
        .filter(F.col("sub_doc") != F.col("super_doc"))
        .select("sub_doc", "super_doc", F.round(cont_v, 6).alias("containment"))
    )


def _witness_budget(pairs: DataFrame) -> DataFrame:
    """First CONTAIN_WITNESS_BUDGET supers per sub_doc, by super id —
    the deterministic output budget shared by both containment paths
    (mirrored verbatim in the DuckDB oracle's rnk filter)."""
    rn = F.row_number().over(
        Window.partitionBy("sub_doc").orderBy("super_doc")
    )
    return (
        pairs.withColumn("rn", rn)
        .filter(F.col("rn") <= CONTAIN_WITNESS_BUDGET)
        .select("sub_doc", "super_doc", "containment")
    )


def _containment_inverted(docsets: DataFrame) -> DataFrame:
    """General-vocab containment: inverted-index equi-join on shared
    tokens; the per-pair match count IS the intersection size. Sane
    when posting lists are small (large vocab); the bitmask path
    covers the bounded-vocab corpus where this degenerates."""
    sized = docsets.filter(F.col("sz") >= 5)
    tok = sized.select("doc_id", "sz", F.explode("toks").alias("term"))
    a = tok.select(
        F.col("doc_id").alias("sub_doc"), F.col("sz").alias("asz"), "term"
    )
    b = docsets.select("doc_id", F.explode("toks").alias("term")).select(
        F.col("doc_id").alias("super_doc"), "term"
    )
    pairs = (
        a.join(b, ["term"])
        .filter(F.col("sub_doc") != F.col("super_doc"))
        .groupBy("sub_doc", "super_doc", "asz")
        .agg(F.count("*").alias("common"))
    )
    cont = F.col("common") * 1.0 / F.col("asz")
    return _witness_budget(
        pairs.filter(cont >= 0.9).select(
            "sub_doc", "super_doc", F.round(cont, 6).alias("containment")
        )
    )


@register(
    "llm_repetition_filter",
    extra=True,
    oracle="""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents
    ),
    b AS (
        SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n_tok,
               CASE WHEN len(ts) >= 2
                    THEN list_transform(range(1, len(ts)),
                                        i -> ts[i] || ' ' || ts[i + 1])
                    ELSE [] END AS bg
        FROM t
    )
    SELECT doc_id, n_tok,
           CAST(len(bg) - len(list_distinct(bg)) AS BIGINT)
               AS n_dup_bigrams,
           CASE WHEN len(bg) > 0
                THEN (len(bg) - len(list_distinct(bg)))
                     / CAST(len(bg) AS DOUBLE)
                ELSE 0.0 END AS dup_bigram_frac,
           list_max(list_transform(list_distinct(ts),
                    tok -> len(list_filter(ts, x -> x = tok))))
               / CAST(n_tok AS DOUBLE) AS top_token_frac,
           CAST(CASE WHEN (CASE WHEN len(bg) > 0
                THEN (len(bg) - len(list_distinct(bg)))
                     / CAST(len(bg) AS DOUBLE)
                ELSE 0.0 END) <= 0.05
               AND list_max(list_transform(list_distinct(ts),
                       tok -> len(list_filter(ts, x -> x = tok))))
                   / CAST(n_tok AS DOUBLE) <= 0.15
               THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM b
    WHERE n_tok > 0
    """,
)
def llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate (Rae et al. 2021 §A1.1 —
    the 'repetitious documents' signals): per document, the fraction
    of duplicate word bigrams and the mass of the single most
    frequent token, plus the keep/drop verdict at the Gopher-shaped
    thresholds (dup-bigram <= 0.05, top-token <= 0.15 — scaled to
    this corpus' observed [0, 0.13] / [0.05, 0.3] ranges).

    Everything is SCAN-LOCAL: bigrams are a zip of the token array
    with its own tail, dup counting is array_distinct, and the top
    -token mass is a bounded transform over distinct tokens (O(V·n)
    per doc; V <= 62 on this corpus, and at 100 TB the same shape
    holds because V is the per-doc distinct count, not the global
    vocabulary). No shuffle anywhere — the filter runs at parquet
    -scan speed, which is exactly what a 100 TB curation gate needs.
    Fractions are exact integer ratios -> one IEEE division each ->
    bit-identical across engines; the keep flag compares those exact
    doubles against representable literals. Reference scope: the
    reference has no curation surface; this extends SURVEY §2.F per
    the LLM-pipeline mandate."""
    d = table(spark, sf_dir, "documents")
    n = F.size("ts")
    toks = d.select("doc_id", tokens_col().alias("ts")).filter(n > 0)
    bg = F.when(
        n >= 2,
        F.zip_with(
            F.slice("ts", 1, n - 1),
            F.slice("ts", 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    withbg = toks.select("doc_id", "ts", n.alias("n_tok"), bg.alias("bg"))
    nbg = F.size("bg")
    ndup = nbg - F.size(F.array_distinct("bg"))
    dup_frac = F.when(nbg > 0, ndup / nbg.cast("double")).otherwise(F.lit(0.0))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("ts"),
            lambda t: F.size(F.filter("ts", lambda x: x == t)),
        )
    )
    top_frac = top_cnt / F.col("n_tok").cast("double")
    return withbg.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        ndup.cast("bigint").alias("n_dup_bigrams"),
        dup_frac.alias("dup_bigram_frac"),
        top_frac.alias("top_token_frac"),
        ((dup_frac <= 0.05) & (top_frac <= 0.15))
        .cast("bigint")
        .alias("keep"),
    )


# BM25 constants — the Robertson/Sparck-Jones defaults. K1B1 = k1+1.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("merge", "spark", "window")  # fixed demo query


@register(
    "text_bm25",
    extra=True,
    oracle="""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM t),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(ts) AS term FROM t)
        WHERE term IN ('merge', 'spark', 'window')
        GROUP BY doc_id, term
    ),
    idf AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tf GROUP BY term
    ),
    scored AS (
        -- every fractional literal cast to DOUBLE: DuckDB otherwise
        -- parses 2.2/1.2 as DECIMAL and the exact-decimal product
        -- differs from Spark's double product in the last ulp
        SELECT tf.doc_id, tf.term,
               ((stats.n_docs - idf.df + 0.5::DOUBLE)
                / (idf.df + 0.5::DOUBLE))
               * ((tf.tf * 2.2::DOUBLE)
                  / (tf.tf + 1.2::DOUBLE
                     * (0.25::DOUBLE
                        + 0.75::DOUBLE * (dl.dl / stats.avgdl))))
                   AS s
        FROM tf
        JOIN idf ON tf.term = idf.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
    )
    SELECT doc_id,
           COALESCE(MAX(CASE WHEN term = 'merge' THEN s END), 0.0)
           + COALESCE(MAX(CASE WHEN term = 'spark' THEN s END), 0.0)
           + COALESCE(MAX(CASE WHEN term = 'window' THEN s END), 0.0)
               AS bm25,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for a fixed 3-term query — the retrieval
    scorer a training-data pipeline uses for quality-targeted corpus
    selection (and the classic search-engine op the reference's
    dashboard lacks). k1 = 1.2, b = 0.75; idf is the RAW Robertson
    ratio (N - df + 0.5)/(df + 0.5) WITHOUT the log wrapper — the
    ranking is order-isomorphic and, unlike log, every step is an
    IEEE-exact same-order operation in both engines, so the driver's
    value-hash gate can certify it bit-for-bit.

    Shape for 100 TB: tf rows exist only for (doc, query-term) hits
    — the scan filters terms BEFORE the groupBy, so the shuffle
    carries |q|-term postings, not the corpus. df and corpus stats
    ride in as broadcast one-row/|q|-row frames; the per-doc sum is
    a fixed-order 3-term expression (no float-sum reorder risk).
    Final top-20 is TakeOrdered with doc_id tiebreak."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col().alias("ts"))
    dl = toks.select("doc_id", F.size("ts").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
    )
    tf = (
        toks.select("doc_id", F.explode("ts").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    idf = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (
                    (F.col("tf") * 2.2)
                    / (
                        F.col("tf")
                        + 1.2
                        * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl")))
                    )
                )
            ).alias("s"),
        )
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
        )
        for t in _BM25_TERMS
    ]
    return (
        scored.groupBy("doc_id")
        .agg(
            (per_term[0] + per_term[1] + per_term[2]).alias("bm25"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@register(
    "graph_triangles",
    extra=True,
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT a, b FROM pairs p
        JOIN sizes sa ON p.a = sa.doc_id
        JOIN sizes sb ON p.b = sb.doc_id
        WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.95
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM edges e1
        JOIN edges e2 ON e2.a = e1.b
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT x AS doc_id FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
    GROUP BY doc_id
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the exact near-dup graph — the
    clustering-coefficient signal that separates tight duplicate
    cliques from chains of borderline matches (a triangle-dense node
    sits inside a real duplicate cluster; a triangle-free node with
    edges is a bridge the clusterer should be suspicious of).

    Shape: CLASS-COMPRESSED combinatorics, not enumeration. Jaccard
    similarity depends only on the token SET, so documents with
    identical sets form equivalence classes whose adjacency is
    uniform: a class is internally a clique (jaccard 1), and either
    every or no doc pair between two classes is an edge. Per-node
    triangle counts therefore have a closed form over the tiny class
    graph — for a node in class X with |X| = s:

        C(s-1, 2)                        both corners inside X
      + (s-1) * sum_{Y~X} |Y|            one corner in X, one in Y
      + sum_{Y~X} C(|Y|, 2)              both corners in one Y
      + sum_{Y<Z, Y~X, Z~X, Y~Z} |Y||Z|  corners in two classes

    The doc-level edge list (190,925 rows at sf0.1, one ~250-doc
    identical-set class) collapses to a few hundred class edges, and
    the 20.1M-triangle enumeration the wedge-join draft paid for
    (measured 5.7 s for the join alone; the adjacency-intersect
    variant 6.5 s) becomes integer algebra on broadcast-size frames
    — the whole operator now rides dedup_near's pair cost. At
    100 TB this is THE shape: near-dup graphs are union-of-near-
    cliques, and class compression turns O(triangles) into O(class-
    graph triangles). All arithmetic is exact bigints, so the
    brute-force SQL oracle still hash-matches.

    Pair-growth bound: the only super-linear stage left is the edge
    list itself, inherited from dedup_near's prefix-filter candidate
    join — bounded per block by the deletion-neighborhood/prefix
    blocking, and EXACT by contract (this oracle needs every >=0.95
    edge). The measured sf0.01->sf0.1 growth (~4.6x per 10x data) is
    genuine duplicate-pair volume, not a plan defect; when exactness
    can be traded, the budget lever is the approximate family's
    per-bucket candidate cap (vectors._embedding_nn bucket_cap /
    NN_BUCKET_CAP) or minhash banding, both of which bound pairs per
    bucket regardless of skew."""
    # token-less docs are NOT an internal clique: Jaccard over two
    # empty sets is 0/0 -> NULL in the oracle (and dedup_near emits no
    # such pair) — class_pair_frames already excludes empty sets from
    # classes, so the closed-form C(s-1,2) internal triangles never
    # see them. r14: class edges come straight from the kernel's
    # class-level candidate join; the doc pair frame is never built
    # (r13 still paid one full doc-pair tagging pass here). Edge
    # orientation x < y (class reps are doc_ids) is what the wedge
    # join below relies on — cpairs guarantees ca < cb.
    cpairs, classes, cmap, _docsets = class_pair_frames(spark, sf_dir)
    sizes = classes
    ce = cpairs.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
    und = ce.union(ce.select(F.col("y").alias("x"), F.col("x").alias("y")))
    szy = F.broadcast(sizes.select(F.col("ck").alias("y"), F.col("s").alias("sy")))
    nb = (
        und.join(szy, "y")
        .groupBy("x")
        .agg(
            F.sum("sy").alias("nb_sum"),
            F.sum(F.expr("sy * (sy - 1) div 2")).alias("nb_c2"),
        )
    )
    # class triangles {A,B,C}: A gains |B||C|, B gains |A||C|, C gains |A||B|
    cw = ce.join(
        ce.select(F.col("x").alias("y2"), F.col("y").alias("z")),
        F.col("y") == F.col("y2"),
    ).select("x", "y", "z")
    ctri = cw.join(
        ce.select(F.col("x").alias("ex"), F.col("y").alias("ez")),
        (F.col("x") == F.col("ex")) & (F.col("z") == F.col("ez")),
    ).select("x", "y", "z")
    pair_contrib = (
        ctri.select(
            F.explode(
                F.array(
                    F.struct(F.col("x").alias("ck"), F.col("y").alias("o1"), F.col("z").alias("o2")),
                    F.struct(F.col("y").alias("ck"), F.col("x").alias("o1"), F.col("z").alias("o2")),
                    F.struct(F.col("z").alias("ck"), F.col("x").alias("o1"), F.col("y").alias("o2")),
                )
            ).alias("t")
        )
        .select("t.*")
        .join(F.broadcast(sizes.select(F.col("ck").alias("o1"), F.col("s").alias("s1"))), "o1")
        .join(F.broadcast(sizes.select(F.col("ck").alias("o2"), F.col("s").alias("s2"))), "o2")
        .groupBy("ck")
        .agg(F.sum(F.col("s1") * F.col("s2")).alias("pair_sum"))
    )
    per_class = (
        sizes.join(nb.withColumnRenamed("x", "ck"), "ck", "left")
        .join(pair_contrib, "ck", "left")
        .select(
            "ck",
            (
                F.expr("(s - 1) * (s - 2) div 2")
                + (F.col("s") - 1) * F.coalesce(F.col("nb_sum"), F.lit(0))
                + F.coalesce(F.col("nb_c2"), F.lit(0))
                + F.coalesce(F.col("pair_sum"), F.lit(0))
            ).cast("bigint").alias("n_triangles"),
        )
        .filter(F.col("n_triangles") > 0)
    )
    return cmap.join(F.broadcast(per_class), "ck").select(
        "doc_id", "n_triangles"
    )



@register(
    "sql_recursive_paths",
    extra=True,
    oracle="""
    WITH RECURSIVE tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    near AS (
        SELECT doc_a, doc_b FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
        WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.95
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM near
        UNION ALL
        SELECT doc_b, doc_a FROM near
    ),
    reach(seed, doc, hops) AS (
        SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id % 100 = 0
        UNION ALL
        SELECT DISTINCT r.seed, e.b, r.hops + 1
        FROM reach r JOIN edges e ON e.a = r.doc
        WHERE r.hops < 2
    )
    SELECT seed, doc, CAST(MIN(hops) AS BIGINT) AS min_hops
    FROM reach GROUP BY seed, doc
    """,
)
def sql_recursive_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's RECURSIVE CTE surface doing real distributed graph
    traversal: bounded-hop reachability (<= 2 hops) from sampled seed
    documents across the near-dup graph, shortest hop count per
    reached doc. The recursion is UNION ALL with an explicit hop
    bound (cycle-safe on an undirected graph without engine-specific
    cycle detection), and the MIN(hops) dedup runs OUTSIDE the
    recursive term — the standard shape both engines agree on, so
    the whole query hash-matches DuckDB's recursive CTE. Each
    recursion step is one equi-join on the frontier — the same plan
    dedup_cluster builds by hand; here Catalyst's recursion operator
    drives the loop.

    The recursive step is SELECT DISTINCT: near-dup components are
    near-cliques, so a bag frontier carries one row per PATH (k^2
    per clique per hop) and blows Spark's recursion row limit at
    sf0.1 — the set frontier carries one row per (seed, doc, hop),
    bounded by seeds x component size. MIN(hops) is multiplicity-
    insensitive, so both engines' results are unchanged."""
    # the recursion operator RE-EXECUTES the edges CTE on every
    # recursive step (unlike a plain union, no ReusedExchange across
    # steps), so without a barrier the pair build runs up to 4x —
    # checkpoint it once (measured ~30% off the query)
    near = (
        dedup_near(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    near.createOrReplaceTempView("q_rcte_pairs")
    docs = table(spark, sf_dir, "documents").select("doc_id")
    docs.createOrReplaceTempView("q_rcte_docs")
    return spark.sql("""
        WITH RECURSIVE edges AS (
            SELECT doc_a AS a, doc_b AS b FROM q_rcte_pairs
            UNION ALL
            SELECT doc_b, doc_a FROM q_rcte_pairs
        ),
        reach(seed, doc, hops) AS (
            SELECT doc_id, doc_id, 0 FROM q_rcte_docs WHERE doc_id % 100 = 0
            UNION ALL
            SELECT DISTINCT r.seed, e.b, r.hops + 1
            FROM reach r JOIN edges e ON e.a = r.doc
            WHERE r.hops < 2
        )
        SELECT seed, doc, CAST(MIN(hops) AS BIGINT) AS min_hops
        FROM reach GROUP BY seed, doc
    """)


@register(
    "text_keywords",
    extra=True,
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2
    ),
    df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf * (SELECT n_docs FROM n) AS DOUBLE) / df.df
                   AS score
        FROM tf JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, score,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT doc_id, term, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
)
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction — top-3 TF-IDF terms (the
    tagging pass a corpus browser or topic sampler runs). The idf is
    the RAW ratio N/df without the log wrapper: per-term ranking
    within a doc is what matters, the score stays a single exact
    integer product and one IEEE division, and the hash gate can
    certify it bit-for-bit (log differs in last-ulp across libm
    implementations — same trade as text_bm25).

    Scale: tf and df are two hash aggregations over the token
    explosion (map-side partials apply); df rides back in as a
    broadcast join (vocabulary << corpus); top-3 is one window over
    doc_id — the partition key the rest of the text family already
    shuffles on — with (score, term) tiebreak for determinism."""
    d = table(spark, sf_dir, "documents")
    # tf and df each re-run the tokenize+explode scan; measured, that
    # beats pinning the 200x-wider exploded frame behind a checkpoint
    # barrier (which also costs the partial-agg pushdown)
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df = (
        tok.distinct()
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    n = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"))
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
    )

@register(
    "text_collocations",
    extra=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    bi AS (
        SELECT t.w1, t.w2
        FROM toks, unnest(list_transform(range(1, len(ts)),
                 i -> {{'w1': ts[i], 'w2': ts[i + 1]}})) AS u(t)
    ),
    uni AS (
        SELECT unnest(ts) AS w FROM toks
    ),
    uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
    n_uni AS (SELECT COUNT(*) AS nu FROM uni),
    bc AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bi GROUP BY 1, 2),
    n_bi AS (SELECT COUNT(*) AS nb FROM bi),
    scored AS (
        SELECT b.w1, b.w2, b.c_ab,
               ROUND(LN(((CAST(b.c_ab AS DOUBLE) * nu) * nu)
                        / ((CAST(nb AS DOUBLE) * a.c) * c2.c)), 6)
                   AS pmi
        FROM bc b
        CROSS JOIN n_uni
        CROSS JOIN n_bi
        JOIN uc a ON b.w1 = a.w
        JOIN uc c2 ON b.w2 = c2.w
        WHERE b.c_ab >= 5
    )
    SELECT w1, w2, c_ab, pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2
    LIMIT 100
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top adjacent bigrams by pointwise
    mutual information, PMI = ln(p(w1,w2) / (p(w1) p(w2))) — the
    classic signal for multi-word expressions ("new york") that a
    tokenizer should keep together, and a standard vocabulary-
    induction pass over a training corpus.

    Cross-engine float parity: all counts are exact integers and the
    PMI ratio is built with ONE fixed association order of IEEE
    multiplies/divides on both sides, then rounded — no accumulation-
    order hazard. Ranking keys on the rounded value with a (w1, w2)
    tie-break.

    Scale: bigram generation is a map-side transform (no explode-
    then-self-join); counting is two partial-aggregatable groupBys;
    the unigram side joins onto bigram counts — both already hash-
    partitioned by word — and the corpus-level totals ride in as
    broadcast 1-row frames. Top-100 is a TakeOrdered, not a sort."""
    # tokenize once behind a barrier: bigram and unigram branches both
    # read ts, and projection collapse would re-run the regexp per use
    d = (
        table(spark, sf_dir, "documents")
        .select(tokens_col().alias("ts"))
        .localCheckpoint(eager=False)
    )
    # guard single-token docs: Spark's sequence(1, 0) is DESCENDING
    # ([1, 0]), which would fabricate null bigrams where DuckDB's
    # range(1, 1) is simply empty
    bi = d.filter(F.size("ts") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1),"
                " i -> struct(ts[i - 1] AS w1, ts[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    uni = d.select(F.explode("ts").alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").alias("c"))
    n_uni = uni.agg(F.count("*").alias("nu"))
    bc = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    n_bi = bi.agg(F.count("*").alias("nb"))
    a = uc.alias("a")
    c2 = uc.alias("c2")
    scored = (
        bc.crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .join(a, F.col("w1") == F.col("a.w"))
        .join(c2, F.col("w2") == F.col("c2.w"))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log(
                    (
                        (
                            F.col("c_ab").cast("double") * F.col("nu")
                        )
                        * F.col("nu")
                    )
                    / (
                        (F.col("nb").cast("double") * F.col("a.c"))
                        * F.col("c2.c")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(100)


@register(
    "llm_bpe_pair_counts",
    extra=True,
    oracle=r"""
    WITH words AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      FROM documents
    ),
    wf AS (
      SELECT w, COUNT(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                 i -> substring(w, i, 2))) AS pair, f
      FROM wf
    )
    SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting kernel of BPE tokenizer training: corpus-weighted
    adjacent character-pair frequencies, top 20 — i.e. the statistic
    that picks each merge. (Full BPE iterates merge→recount; each
    round is exactly this plan over the rewritten vocab, so the kernel
    is the scale-relevant piece. Simplified: no end-of-word marker.)

    Scale: the fact collapses to the DISTINCT-WORD table (+counts) at
    the first exchange — pair explosion happens on vocabulary, not
    corpus (Zipf: vocab grows ~sqrt of corpus). Weighted counts then
    aggregate map-side; top-20 is a TakeOrdered, no global sort.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    wf = words.groupBy("w").agg(F.count("*").alias("f"))
    pairs = wf.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@register(
    "graph_degree_distribution",
    extra=True,
    oracle=f"""
    WITH {_PAIRS_CTE},
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT doc_a AS node FROM pairs
            UNION ALL
            SELECT doc_b AS node FROM pairs
        ) GROUP BY node
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the exact near-dup graph — completes the
    graph family (components, PageRank, triangles, bounded-hop paths):
    the first thing you look at before choosing a clustering strategy
    (a heavy tail means label propagation converges slowly and hub
    docs deserve salting).

    Degrees ride the pair generation's blocked equi-join (never
    all-pairs); the histogram is two tiny aggregates on top.
    """
    pairs = dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    nodes = pairs.select(F.col("doc_a").alias("node")).unionByName(
        pairs.select(F.col("doc_b").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


LINKPRED_TOPK = 5
RA_MICRO = 10**12  # integer micro-units for the resource-allocation score


@register(
    "graph_link_prediction",
    extra=True,
    oracle=f"""
    WITH {_PAIRS_CTE},
    adj AS (
        SELECT doc_a AS w, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY w),
    wedge AS (
        SELECT l.v AS a, r.v AS b, l.w AS w
        FROM adj l JOIN adj r ON l.w = r.w AND l.v < r.v
    ),
    nonedge AS (
        SELECT wg.a, wg.b, wg.w FROM wedge wg
        LEFT JOIN pairs p ON p.doc_a = wg.a AND p.doc_b = wg.b
        WHERE p.doc_a IS NULL
    ),
    scored AS (
        SELECT n.a AS doc_a, n.b AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS common_neighbors,
               CAST(SUM({RA_MICRO} // d.d) AS BIGINT) AS ra_micro
        FROM nonedge n JOIN deg d ON n.w = d.w
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, common_neighbors, ra_micro
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_a
              ORDER BY ra_micro DESC, common_neighbors DESC, doc_b) AS rn
          FROM scored)
    WHERE rn <= {LINKPRED_TOPK}
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION over the exact near-dup graph: for every
    non-adjacent doc pair at distance 2, the common-neighbor count and
    the resource-allocation index (Zhou/Lü/Zhang 2009 — each common
    neighbor w contributes 1/deg(w), so evidence through promiscuous
    hubs is discounted); top-{LINKPRED_TOPK} predicted partners per
    doc. The 'which near-dups did the threshold just miss' review
    queue of a dedup pipeline.

    Two determinism/scale moves:
    - The RA score is INTEGER micro-units (sum of 10^12 div deg(w)) —
      integer sums are order-free, so class compression below cannot
      perturb a float fold and the oracle hash-matches exactly.
    - CLASS COMPRESSION (the graph_triangles discipline): Jaccard
      depends only on the token set, so identical-set classes have
      uniform adjacency, every (a in X, b in Z) pair of a class pair
      shares the same score, and wedges enumerate on the CLASS graph
      (hundreds of rows) instead of the doc graph (the hot clique that
      makes doc-level wedge joins quadratic). Doc pairs expand once at
      the end, then a per-doc window takes the top-K.
    """
    # r14: class edges come straight from class_pair_frames' class-
    # level candidate join — the doc pair frame is never built (r13
    # still paid one full doc-pair tagging pass here); cpairs
    # guarantees x < y, which the wedge filter below relies on
    cpairs, classes, cmap, _docsets = class_pair_frames(spark, sf_dir)
    sizes = classes
    ce = cpairs.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
    und = ce.union(ce.select(F.col("y").alias("x"), F.col("x").alias("y")))
    # per-class doc degree (uniform inside a class):
    # deg_Y = (|Y| - 1) + sum of adjacent class sizes
    szy = F.broadcast(
        sizes.select(F.col("ck").alias("y"), F.col("s").alias("sy"))
    )
    degc = (
        und.join(szy, "y")
        .groupBy("x")
        .agg(F.sum("sy").alias("ext"))
        .join(sizes.select(F.col("ck").alias("x"), "s"), "x")
        .select(
            F.col("x").alias("ck"),
            (F.col("s") - 1 + F.col("ext")).alias("degc"),
        )
    )
    # class wedges X -Y- Z (X < Z), minus adjacent class pairs
    ua = und.select(F.col("x").alias("yk"), F.col("y").alias("cx"))
    ub = und.select(F.col("x").alias("yk"), F.col("y").alias("cz"))
    cls_cand = (
        ua.join(ub, "yk")
        .filter(F.col("cx") < F.col("cz"))
        .join(
            ce.select(F.col("x").alias("cx"), F.col("y").alias("cz")),
            ["cx", "cz"],
            "left_anti",
        )
    )
    scored_cls = (
        cls_cand.join(
            F.broadcast(
                degc.select(F.col("ck").alias("yk"), "degc")
            ),
            "yk",
        )
        .join(
            F.broadcast(sizes.select(F.col("ck").alias("yk"), "s")), "yk"
        )
        .groupBy("cx", "cz")
        .agg(
            F.sum("s").alias("common_neighbors"),
            F.sum(
                F.col("s") * F.expr(f"{RA_MICRO}L div degc")
            ).alias("ra_micro"),
        )
    )
    members = cmap.groupBy("ck").agg(F.collect_list("doc_id").alias("docs"))
    mx = members.select(F.col("ck").alias("cx"), F.col("docs").alias("dx"))
    mz = members.select(F.col("ck").alias("cz"), F.col("docs").alias("dz"))
    pairs = (
        scored_cls.join(mx, "cx")
        .join(mz, "cz")
        .select(
            "common_neighbors",
            "ra_micro",
            F.explode("dx").alias("da"),
            "dz",
        )
        .select(
            "common_neighbors",
            "ra_micro",
            "da",
            F.explode("dz").alias("db"),
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "common_neighbors",
            "ra_micro",
        )
    )
    w = Window.partitionBy("doc_a").orderBy(
        F.col("ra_micro").desc(), F.col("common_neighbors").desc(), "doc_b"
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LINKPRED_TOPK)
        .select("doc_a", "doc_b", "common_neighbors", "ra_micro")
    )


VOCAB_TOP_K = 16


@register(
    "llm_vocab_coverage",
    extra=True,
    oracle=rf"""
    WITH words AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      FROM documents
    ),
    wf AS (SELECT w, COUNT(*) AS f FROM words GROUP BY w),
    vocab AS (SELECT w FROM wf ORDER BY f DESC, w LIMIT {VOCAB_TOP_K}),
    tot AS (SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types FROM wf),
    cov AS (SELECT CAST(SUM(f) AS BIGINT) AS in_vocab
            FROM wf JOIN vocab USING (w))
    SELECT t.n_tokens, t.n_types, c.in_vocab,
           ROUND(CAST(c.in_vocab AS DOUBLE)
                 / CAST(t.n_tokens AS DOUBLE), 6) AS coverage
    FROM tot t CROSS JOIN cov c
    """,
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: what fraction of corpus tokens a
    top-K frequency vocabulary explains (the go/no-go statistic for a
    tokenizer's vocab size; pairs with zx_llm_bpe_pair_counts, which
    picks the merges). Computed on the distinct-vocab table —
    corpus-size-independent after the first count — with the top-K cut
    as a TakeOrdered and a broadcast semi-join back.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    wf = words.groupBy("w").agg(F.count("*").alias("f"))
    vocab = wf.orderBy(F.col("f").desc(), "w").limit(VOCAB_TOP_K).select("w")
    tot = wf.agg(
        F.sum("f").alias("n_tokens"), F.count("*").alias("n_types")
    )
    cov = wf.join(F.broadcast(vocab), "w").agg(
        F.sum("f").alias("in_vocab")
    )
    return tot.crossJoin(cov).select(
        "n_tokens",
        "n_types",
        "in_vocab",
        F.round(
            F.col("in_vocab").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("coverage"),
    )


@register(
    "graph_triangle_count",
    extra=True,
    oracle=f"""
    WITH {_PAIRS_CTE},
    tri AS (
        SELECT COUNT(*) AS n_tri
        FROM pairs e1
        JOIN pairs e2 ON e2.doc_a = e1.doc_b
        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT doc_a AS node FROM pairs
            UNION ALL
            SELECT doc_b AS node FROM pairs
        ) GROUP BY 1
    ),
    wed AS (
        SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg
    )
    SELECT CAST(t.n_tri AS BIGINT) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges,
           w.n_nodes, w.n_wedges,
           ROUND(CASE WHEN w.n_wedges > 0
                 THEN 3.0 * t.n_tri / w.n_wedges ELSE 0 END, 6)
               AS transitivity
    FROM tri t, wed w
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL triangle count + transitivity over the exact near-dup
    graph — the one-row cohesion readout before choosing a clustering
    strategy (high transitivity ⇒ near-cliques ⇒ min-label CC
    converges in ~2 hops; low ⇒ chains ⇒ budget diameter).

    Algorithm: MULTIPLICITY-WEIGHTED CLASS COMPRESSION. Jaccard
    similarity depends only on the token SET, so identical-set docs
    form equivalence classes that are internally cliques and have
    uniform cross-class adjacency. The first cut here was the classic
    oriented-edge enumeration e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) over the
    DOC-level pair list — correct, but the decade-scale audit showed
    why it can't ship: a saturated vocabulary grows identical-set
    cliques linearly in corpus size, a ~5,600-doc clique holds ~3e13
    triangles, and for a COUNT the enumeration join's cost is pure
    waste (the answer is one bigint). Compressing first makes every
    stage closed-form:

      n_edges  = Σ_A C(m_A,2) + Σ_{A~B} m_A·m_B
      n_tri    = Σ_A C(m_A,3)
               + Σ_{A~B} [C(m_A,2)·m_B + m_A·C(m_B,2)]
               + Σ_{A<B<C class-triangle} m_A·m_B·m_C
      deg(v∈A) = (m_A − 1) + Σ_{B~A} m_B
      n_wedges = Σ_A m_A·C(deg_A,2);  n_nodes = Σ_{deg_A ≥ 1} m_A

    The only enumeration left is class-triangles over the CLASS edge
    list — and the pair generation itself (deletion-neighborhood /
    prefix-filter, same strategy switch as dedup_near) runs on class
    REPRESENTATIVES, so the quadratic doc-pair list never
    materializes at all. All counts are exact bigints; the
    brute-force SQL oracle is unchanged. zx_graph_triangles reaches
    the per-node answer by the same compression — this is its global
    twin, sharing the insight but independently aggregated.

    Scale: candidate generation touches distinct token sets only
    (class count grows far slower than the corpus under duplication —
    the regime where triangle counting is interesting); everything
    downstream of the class edge list is integer algebra on
    class-graph-sized frames.
    """
    d = table(spark, sf_dir, "documents")
    # one class row per distinct token set: representative id = min
    # doc_id (deterministic), multiplicity m; lazy checkpoint because
    # the strategy probe, the pair join and three size joins all
    # consume it
    cs = (
        _token_sets(d)
        .withColumn("ck", F.md5(F.concat_ws(" ", "toks")))
        .groupBy("ck")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("toks", "doc_id").alias("toks"),
            F.count("*").alias("m"),
        )
        .withColumn("sz", F.size("toks").cast("long"))
        # token-less docs form no edges: Jaccard over two empty sets is
        # 0/0 -> NULL in the oracle's pair CTE and dedup_near emits no
        # pair either, so the empty-set class must contribute neither
        # internal-clique edges/triangles nor degrees here
        .filter(F.col("sz") >= 1)
        .select("doc_id", "toks", "sz", "m")
        .localCheckpoint(eager=False)
    )
    # same exactness-preserving strategy switch as dedup_near, probed
    # on the CLASS frame (one cheap scalar job)
    prof = (
        cs.select("sz", F.explode_outer("toks").alias("term"))
        .agg(
            F.max("sz").alias("max_sz"),
            F.countDistinct("term").alias("vocab"),
        )
        .first()
    )
    max_sz, vocab = prof.max_sz or 0, prof.vocab or 0
    delta = int((1 - JACCARD_T) * min(2 * max_sz, vocab))
    pair_fn = jaccard_pairs_deletion if delta <= 1 else jaccard_pairs_prefix
    ce = (
        pair_fn(cs.select("doc_id", "toks", "sz"), JACCARD_T)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint(eager=False)
    )
    sz_a = F.broadcast(cs.select(F.col("doc_id").alias("a"), F.col("m").alias("ma")))
    sz_b = F.broadcast(cs.select(F.col("doc_id").alias("b"), F.col("m").alias("mb")))
    sz_c = F.broadcast(cs.select(F.col("doc_id").alias("c"), F.col("m").alias("mc")))
    ce_m = ce.join(sz_a, "a").join(sz_b, "b")
    # cross-class contributions: edges and the 2-classes-of-3 triangles
    cross = ce_m.agg(
        F.coalesce(F.sum(F.col("ma") * F.col("mb")), F.lit(0)).alias(
            "cross_edges"
        ),
        F.coalesce(
            F.sum(
                F.expr("ma * (ma - 1) div 2") * F.col("mb")
                + F.col("ma") * F.expr("mb * (mb - 1) div 2")
            ),
            F.lit(0),
        ).alias("cross_tri"),
    )
    # class-triangle enumeration — over the CLASS edge list only
    cw = ce.join(
        ce.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    ctri = (
        cw.join(ce.select("a", F.col("b").alias("c")), ["a", "c"])
        .join(sz_a, "a")
        .join(sz_b, "b")
        .join(sz_c, "c")
        .agg(
            F.coalesce(
                F.sum(F.col("ma") * F.col("mb") * F.col("mc")), F.lit(0)
            ).alias("tri3")
        )
    )
    # per-class degree: internal clique + neighbor multiplicities
    nbr = (
        ce.select("a", F.col("b").alias("n"))
        .union(ce.select(F.col("b").alias("a"), F.col("a").alias("n")))
        .join(
            F.broadcast(
                cs.select(F.col("doc_id").alias("n"), F.col("m").alias("mn"))
            ),
            "n",
        )
        .groupBy("a")
        .agg(F.sum("mn").alias("nb_sum"))
    )
    per_class = (
        cs.select(F.col("doc_id").alias("a"), "m")
        .join(nbr, "a", "left")
        .select(
            "m",
            (
                (F.col("m") - 1) + F.coalesce(F.col("nb_sum"), F.lit(0))
            ).alias("deg"),
        )
    )
    totals = per_class.agg(
        F.sum(F.expr("m * (m - 1) div 2")).alias("int_edges"),
        F.sum(F.expr("m * (m - 1) * (m - 2) div 6")).alias("int_tri"),
        F.sum(F.expr("m * (deg * (deg - 1) div 2)")).alias("n_wedges"),
        F.sum(F.when(F.col("deg") >= 1, F.col("m")).otherwise(0)).alias(
            "n_nodes"
        ),
    )
    return (
        totals.crossJoin(F.broadcast(cross))
        .crossJoin(F.broadcast(ctri))
        .select(
            (F.col("int_tri") + F.col("cross_tri") + F.col("tri3"))
            .cast("bigint")
            .alias("n_triangles"),
            (F.col("int_edges") + F.col("cross_edges"))
            .cast("bigint")
            .alias("n_edges"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_wedges").cast("bigint").alias("n_wedges"),
        )
        .select(
            "n_triangles",
            "n_edges",
            "n_nodes",
            "n_wedges",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("transitivity"),
        )
    )


# ------------------------------------------------- BPE merge loop


_BPE_ROUNDS = 8


def bpe_reference_merges(word_freqs: dict, rounds: int) -> list:
    """Pure-python BPE trainer (the exact reference the distributed
    loop must reproduce): greedy highest-count pair per round,
    lexicographic tie-break, merges applied left-to-right."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    out = []
    for _ in range(rounds):
        counts: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        best_cnt = max(counts.values())
        best = min(p for p, c in counts.items() if c == best_cnt)
        out.append(("".join(best), best_cnt))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            merged = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + f
        vocab = new_vocab
    return out


def _merge_pair_expr(col: F.Column, a: str, b: str, mt: str) -> F.Column:
    """Greedy left-to-right (a, b) -> mt adjacent-pair merge as a pure
    JVM ``aggregate`` fold over the symbol array — bit-identical to the
    ``i += 2`` python scan (the ``skip`` flag reproduces the
    non-overlap rule on runs like a=b over 'aaaa').

    r13 opt (guide §4.1): the training loops applied each round's
    merge through a mapInPandas kernel — one JVM->Python->JVM round
    trip per round over the vocab-TYPE table. The fold keeps the merge
    inside codegen, so a lazily-chained round costs string algebra on
    a vocab-sized frame instead of a Python worker exchange."""
    n = F.size(col)
    return F.when(n < 2, col).otherwise(
        F.aggregate(
            F.sequence(F.lit(0), n - 1),
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(False).alias("skip"),
            ),
            lambda acc, i: F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                (i < n - 1)
                & (F.element_at(col, i + 1) == a)
                & (F.element_at(col, i + 2) == b),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(mt))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        acc["out"], F.array(F.element_at(col, i + 1))
                    ).alias("out"),
                    F.lit(False).alias("skip"),
                )
            ),
            lambda acc: acc["out"],
        )
    )


def _bpe_train_pairs(spark: SparkSession, sf_dir: str) -> list:
    """The BPE TRAINING LOOP (zx_llm_bpe_pair_counts is one counting
    round of it): 8 greedy merge rounds over the corpus vocabulary —
    per round, count adjacent symbol pairs weighted by word frequency
    (explode + sum — distributed), pick the max-count pair
    (lexicographic tie-break; 1-row argmax), apply the merge to every
    word's symbol sequence (Arrow ``applyInPandas`` kernel over the
    vocab — the inherently sequential left-to-right scan), repeat.
    Emits (round, merge, pair_count).

    Rows-only by design (an 8-round greedy loop is not one SQL
    query); the kernel+loop is pinned EXACTLY by a pure-python
    reference test over literal corpora.

    Scale: everything after the first DISTINCT runs on the VOCAB
    table (size = distinct words, independent of corpus row count);
    pair counting shuffles (symbol, symbol) pairs, never text.
    """
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.expr(rf"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .select(F.expr("transform(split(w, ''), x -> x)").alias("syms"), "f")
        .select(F.filter("syms", lambda x: x != "").alias("syms"), "f")
        .localCheckpoint(eager=True)
    )
    results = []
    vocab = words
    for rnd in range(_BPE_ROUNDS):
        pairs = (
            vocab.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(x, i) -> struct(x AS a, syms[i + 1] AS b))"
                    )
                ).alias("p"),
                "f",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        results.append((rnd + 1, a, b, cnt))

        # JVM merge fold (r13, guide §4.1): partition-local, zero
        # shuffle, zero Python exchange — see _merge_pair_expr
        vocab = vocab.select(
            _merge_pair_expr(F.col("syms"), a, b, a + b).alias("syms"),
            "f",
        )
        if rnd % 3 == 2:
            vocab = vocab.localCheckpoint(eager=True)
    return results



# Recursive-CTE twin of the BPE training loop (r10: rows-only ->
# oracle). Everything is INTEGER (pair counts, frequencies) or exact
# string algebra: the greedy argmax is max count then lexicographic
# min, and the left-to-right merge application is the replace-last-
# if-match fold (provably identical to the i+=2 scan: a merged token
# can never equal its own left operand, so a fold cell never double-
# merges). The vocab table (distinct words) is carried IN the
# recursion as a list of (syms, f) structs — corpus size only enters
# through the one word-count aggregation.
_BPE_TRAIN_CTE = f""" wf AS MATERIALIZED (
    SELECT list(struct_pack(
               syms := list_transform(range(1, length(w) + 1),
                                      i -> w[i]),
               f := f)) AS vocab
    FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(regexp_extract_all(lower(text),
                  '{TOKEN_RE}')) AS w FROM documents)
        WHERE length(w) >= 2 GROUP BY w
    )
),
it AS (
    SELECT 0 AS rnd, vocab, CAST(NULL AS VARCHAR) AS ma,
           CAST(NULL AS VARCHAR) AS mb, CAST(NULL AS BIGINT) AS cnt
    FROM wf
    UNION ALL
    SELECT rnd + 1,
           list_transform(vocab, v -> struct_pack(
               syms := list_reduce(
                   list_prepend(CAST([] AS VARCHAR[]),
                       list_transform(v.syms, s -> [s])),
                   (acc, e) -> CASE
                       WHEN len(acc) > 0 AND acc[-1] = ba
                            AND e[1] = bb
                       THEN list_append(
                           list_slice(acc, 1, len(acc) - 1), ba || bb)
                       ELSE list_append(acc, e[1]) END),
               f := v.f)),
           ba, bb, bcnt
    FROM (
        SELECT rnd, vocab, best.a AS ba, best.b AS bb,
               best.cnt AS bcnt
        FROM (
            SELECT rnd, vocab,
                   list_reduce(counts, (x, y) -> CASE
                       WHEN y.cnt > x.cnt
                            OR (y.cnt = x.cnt
                                AND (y.a < x.a
                                     OR (y.a = x.a AND y.b < x.b)))
                       THEN y ELSE x END) AS best
            FROM (
                SELECT rnd, vocab,
                       list_transform(dp, d -> struct_pack(
                           a := string_split(d, chr(1))[1],
                           b := string_split(d, chr(1))[2],
                           cnt := list_sum(list_transform(prs, pe ->
                               CASE WHEN pe.a = string_split(d, chr(1))[1]
                                     AND pe.b = string_split(d, chr(1))[2]
                                    THEN pe.f
                                    ELSE CAST(0 AS BIGINT) END))))
                           AS counts
                FROM (
                    SELECT rnd, vocab, prs,
                           -- list_distinct over STRUCTs is
                           -- unimplemented; chr(1) never occurs in
                           -- TOKEN_RE tokens, so the packed string
                           -- is a faithful pair key
                           list_distinct(list_transform(prs, pe ->
                               pe.a || chr(1) || pe.b)) AS dp
                    FROM (
                        SELECT rnd, vocab,
                               flatten(list_transform(vocab, v ->
                                   list_transform(
                                       range(1, len(v.syms)), i ->
                                       struct_pack(a := v.syms[i],
                                           b := v.syms[i + 1],
                                           f := v.f)))) AS prs
                        FROM it WHERE rnd < {_BPE_ROUNDS}
                    ) WHERE len(prs) > 0
                )
            )
        )
    )
)
"""


BPE_TRAIN_ORACLE = f"""
WITH RECURSIVE {_BPE_TRAIN_CTE}
SELECT CAST(rnd AS INT) AS round, ma || mb AS merge,
       cnt AS pair_count
FROM it WHERE rnd >= 1
"""

@register("llm_bpe_train", extra=True, oracle=BPE_TRAIN_ORACLE)
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training surface: the distributed merge loop
    (``_bpe_train_pairs``) as (round, merge, pair_count) rows; pinned
    EXACTLY by the pure-python reference test AND (r10) hash-matched
    by a recursive-CTE DuckDB twin — the loop is pure integer/string
    algebra, so the greedy argmax and the merge application replay
    exactly."""
    rows = [(r, a + b, c) for r, a, b, c in _bpe_train_pairs(spark, sf_dir)]
    return spark.createDataFrame(
        rows, "round int, merge string, pair_count bigint"
    )


def bpe_reference_encode(word: str, merges: list) -> list:
    """Canonical BPE encode (Sennrich '16 / GPT-2 ``bpe()``): start
    from characters; repeatedly find the LOWEST-RANK merge whose pair
    is present and apply it to every occurrence left-to-right, until
    no ranked pair remains. Shared by the Spark kernel and its test
    reference — rank-iterated, so merges that only become applicable
    after a later merge creates one of their operands are still
    taken (a single in-order pass would miss those)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merges[best]
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# Twin of the rank-iterated BPE encode (r10: rows-only -> oracle):
# re-derives the merge table with the training recursion, then a
# second recursion encodes each DISTINCT word — per step, the lowest
# applicable rank (list_min over the merge table) applies to every
# occurrence via the same replace-last-if-match fold as training.
# Each step strictly shrinks the word, so the recursion is bounded by
# word length; a word's final state is its max-step row.
BPE_ENCODE_ORACLE = f"""
WITH RECURSIVE {_BPE_TRAIN_CTE},
merges AS MATERIALIZED (
    SELECT list(struct_pack(a := ma, b := mb, r := rnd)
                ORDER BY rnd) AS ml
    FROM it WHERE rnd >= 1
),
dw AS MATERIALIZED (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
    FROM documents
),
enc AS (
    SELECT w,
           list_transform(range(1, length(w) + 1), ii -> w[ii])
               AS syms,
           ml, 0 AS step
    FROM (SELECT DISTINCT w FROM dw), merges
    UNION ALL
    SELECT w,
           list_reduce(
               list_prepend(CAST([] AS VARCHAR[]),
                   list_transform(syms, s -> [s])),
               (acc, e) -> CASE
                   WHEN len(acc) > 0 AND acc[-1] = bm.a
                        AND e[1] = bm.b
                   THEN list_append(
                       list_slice(acc, 1, len(acc) - 1),
                       bm.a || bm.b)
                   ELSE list_append(acc, e[1]) END),
           ml, step + 1
    FROM (
        SELECT w, syms, ml, step, ml[br] AS bm
        FROM (
            SELECT w, syms, ml, step,
                   list_min(list_transform(ml, m ->
                       CASE WHEN len(list_filter(
                                range(1, len(syms)), ii ->
                                syms[ii] = m.a
                                AND syms[ii + 1] = m.b)) > 0
                            THEN m.r ELSE NULL END)) AS br
            FROM enc
        ) WHERE br IS NOT NULL
    )
),
fin AS MATERIALIZED (
    SELECT w, syms FROM enc
    QUALIFY row_number() OVER (PARTITION BY w ORDER BY step DESC) = 1
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(f.syms)) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(length(d.w)) AS BIGINT)
             / CAST(SUM(len(f.syms)) AS DOUBLE), 6) AS chars_per_token
FROM dw d JOIN fin f USING (w)
GROUP BY d.doc_id
"""


@register("llm_bpe_encode", extra=True, oracle=BPE_ENCODE_ORACLE)
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the other half of the tokenizer lifecycle
    (llm_bpe_train learns merges; this applies them): encode every
    document with the corpus-trained merge table and emit per-doc
    token accounting (word count, BPE token count, chars-per-token
    compression) — the cost model behind every 'how many tokens is my
    corpus' question in LLM data work.

    Shape: the merge table is driver-sized (8 rounds here, ~30k in
    production — always broadcastable); encoding runs ONCE PER
    DISTINCT WORD (the vocab table, independent of corpus row count),
    as an Arrow ``mapInPandas`` kernel over the vocab — the canonical
    rank-iterated encode (see ``bpe_reference_encode``); per-doc
    totals are then one broadcast join of (word -> n_tokens) onto the
    exploded doc-words frame plus a doc-keyed hash agg. Text bodies
    never shuffle. Rows-only: the encode recurrence is not one SQL
    query; the kernel is pinned exactly by the python reference
    test."""
    import pandas as pd

    merges = [(a, b) for _, a, b, _ in _bpe_train_pairs(spark, sf_dir)]
    d = table(spark, sf_dir, "documents")
    doc_words = d.select(
        "doc_id",
        F.explode(
            F.expr(rf"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("w"),
    )
    vocab = doc_words.select("w").distinct()

    def encode_batches(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_tok": [
                        len(bpe_reference_encode(w, merges))
                        for w in pdf["w"]
                    ],
                }
            )

    enc = vocab.mapInPandas(encode_batches, "w string, n_tok int")
    return (
        doc_words.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_chars") / F.col("n_tokens").cast("double"), 6
            ).alias("chars_per_token"),
        )
    )


# ------------------------------------------------- phrase search


# ------------------------------------------------- WordPiece family

_WP_ROUNDS = 8


def wordpiece_syms(word: str) -> list:
    """Initial WordPiece symbolization: first char bare, continuation
    chars carry the ## prefix (the BERT convention)."""
    return [word[0]] + ["##" + c for c in word[1:]]


def _wp_merge_token(a: str, b: str) -> str:
    return a + (b[2:] if b.startswith("##") else b)


def wordpiece_reference_merges(word_freqs: dict, rounds: int) -> list:
    """Pure-python WordPiece trainer (the exact reference the
    distributed loop must reproduce): per round pick the pair with the
    highest LIKELIHOOD score count(pair) / (count(a) * count(b)) —
    the criterion that separates WordPiece from BPE's raw-count greedy
    (Schuster & Nakajima 2012; the HF tokenizers formulation). Score
    compared as the identical float64 expression the Spark side
    computes; ties break on the lexicographically smallest pair."""
    vocab = {tuple(wordpiece_syms(w)): f for w, f in word_freqs.items()}
    out = []
    for rnd in range(rounds):
        pair_c: dict = {}
        unit_c: dict = {}
        for syms, f in vocab.items():
            for s in syms:
                unit_c[s] = unit_c.get(s, 0) + f
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_c[p] = pair_c.get(p, 0) + f
        if not pair_c:
            break
        def score(p):
            return float(pair_c[p]) / (
                float(unit_c[p[0]]) * float(unit_c[p[1]])
            )
        best_s = max(score(p) for p in pair_c)
        best = min(p for p in pair_c if score(p) == best_s)
        a, b = best
        out.append((rnd + 1, a, b, pair_c[best], best_s))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(_wp_merge_token(a, b))
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return out


def wordpiece_reference_encode(word: str, vocab: set) -> list:
    """Canonical WordPiece encode: greedy LONGEST-MATCH-FIRST against
    the vocab, continuation pieces ##-prefixed; a position with no
    matching piece makes the whole word [UNK] (the BERT rule)."""
    toks = []
    i = 0
    while i < len(word):
        j = len(word)
        cur = None
        while j > i:
            piece = word[i:j] if i == 0 else "##" + word[i:j]
            if piece in vocab:
                cur = piece
                break
            j -= 1
        if cur is None:
            return ["[UNK]"]
        toks.append(cur)
        i = j
    return toks


def _wordpiece_train(spark: SparkSession, sf_dir: str):
    """Distributed WordPiece training loop: per round, one distributed
    pair count + one distributed unit count over the word-TYPE table
    (vocab-sized, corpus-row-count-independent), score = pair /
    (unit_a * unit_b) as one deterministic double expression, 1-row
    argmax, merge applied by a partition-local JVM fold
    (_merge_pair_expr) — the _bpe_train_pairs shape with the
    likelihood argmax swapped in. Returns (merge rows, base units)."""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.expr(rf"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .select(
            F.expr(
                "transform(filter(split(w, ''), x -> x != ''),"
                " (x, i) -> IF(i = 0, x, concat('##', x)))"
            ).alias("syms"),
            "f",
        )
        .localCheckpoint(eager=True)
    )
    base_units = [
        r.s
        for r in words.select(F.explode("syms").alias("s"))
        .distinct()
        .collect()
    ]
    results = []
    vocab = words
    for rnd in range(_WP_ROUNDS):
        units = vocab.select(F.explode("syms").alias("s"), "f").groupBy(
            "s"
        ).agg(F.sum("f").alias("uc"))
        pairs = (
            vocab.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(x, i) -> struct(x AS a, syms[i + 1] AS b))"
                    )
                ).alias("p"),
                "f",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("cnt"))
            .join(
                F.broadcast(units.select(F.col("s").alias("a"), F.col("uc").alias("ua"))),
                "a",
            )
            .join(
                F.broadcast(units.select(F.col("s").alias("b"), F.col("uc").alias("ub"))),
                "b",
            )
            .select(
                "a",
                "b",
                "cnt",
                (
                    F.col("cnt").cast("double")
                    / (F.col("ua").cast("double") * F.col("ub").cast("double"))
                ).alias("score"),
            )
        )
        best = (
            pairs.orderBy(F.col("score").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        results.append(
            (rnd + 1, a, b, int(best[0]["cnt"]), float(best[0]["score"]))
        )

        # JVM merge fold (r13, guide §4.1): same kernel as the BPE
        # loop — no per-round Python exchange. Checkpoint cadence
        # matches _bpe_train_pairs (every 3rd round): the per-round
        # eager checkpoint paid one extra materialization JOB per
        # round; a lazily-chained JVM merge is string algebra on a
        # vocab-sized frame, so re-deriving <=2 pending merges inside
        # the next round's argmax action is cheaper than the job.
        vocab = vocab.select(
            _merge_pair_expr(
                F.col("syms"), a, b, _wp_merge_token(a, b)
            ).alias("syms"),
            "f",
        )
        if rnd % 3 == 2:
            vocab = vocab.localCheckpoint(eager=True)
    return results, base_units


_WP_TRAIN_CTE = f"""wf AS MATERIALIZED (
    SELECT list(struct_pack(
               syms := list_transform(range(1, length(w) + 1),
                   ii -> CASE WHEN ii = 1 THEN w[ii]
                         ELSE '##' || w[ii] END),
               f := f)) AS vocab
    FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(regexp_extract_all(lower(text),
                  '{TOKEN_RE}')) AS w FROM documents)
        WHERE length(w) >= 2 GROUP BY w
    )
),
wit AS (
    SELECT 0 AS rnd, vocab, CAST(NULL AS VARCHAR) AS ma,
           CAST(NULL AS VARCHAR) AS mb, CAST(NULL AS BIGINT) AS cnt,
           CAST(NULL AS DOUBLE) AS score
    FROM wf
    UNION ALL
    SELECT rnd + 1,
           list_transform(vocab, v -> struct_pack(
               syms := list_reduce(
                   list_prepend(CAST([] AS VARCHAR[]),
                       list_transform(v.syms, s -> [s])),
                   (acc, e) -> CASE
                       WHEN len(acc) > 0 AND acc[-1] = ba
                            AND e[1] = bb
                       THEN list_append(
                           list_slice(acc, 1, len(acc) - 1),
                           ba || CASE WHEN bb LIKE '##%'
                                      THEN bb[3:] ELSE bb END)
                       ELSE list_append(acc, e[1]) END),
               f := v.f)),
           ba, bb, bcnt, bscore
    FROM (
        SELECT rnd, vocab, best.a AS ba, best.b AS bb,
               best.cnt AS bcnt, best.score AS bscore
        FROM (
            SELECT rnd, vocab,
                   list_reduce(counts, (x, y) -> CASE
                       WHEN y.score > x.score
                            OR (y.score = x.score
                                AND (y.a < x.a
                                     OR (y.a = x.a AND y.b < x.b)))
                       THEN y ELSE x END) AS best
            FROM (
                SELECT rnd, vocab,
                       list_transform(c0, c -> struct_pack(
                           a := c.a, b := c.b, cnt := c.cnt,
                           score := CAST(c.cnt AS DOUBLE)
                               / (CAST(list_sum(list_transform(us,
                                      u -> CASE WHEN u.s = c.a
                                           THEN u.f ELSE CAST(0 AS
                                           BIGINT) END)) AS DOUBLE)
                                  * CAST(list_sum(list_transform(us,
                                      u -> CASE WHEN u.s = c.b
                                           THEN u.f ELSE CAST(0 AS
                                           BIGINT) END)) AS DOUBLE))))
                           AS counts
                FROM (
                    SELECT rnd, vocab, us,
                           list_transform(dp, dk -> struct_pack(
                               a := string_split(dk, chr(1))[1],
                               b := string_split(dk, chr(1))[2],
                               cnt := list_sum(list_transform(prs,
                                   pe -> CASE WHEN pe.a =
                                           string_split(dk, chr(1))[1]
                                         AND pe.b =
                                           string_split(dk, chr(1))[2]
                                        THEN pe.f
                                        ELSE CAST(0 AS BIGINT) END))))
                               AS c0
                    FROM (
                        SELECT rnd, vocab, prs, us,
                               list_distinct(list_transform(prs, pe ->
                                   pe.a || chr(1) || pe.b)) AS dp
                        FROM (
                            SELECT rnd, vocab,
                                   flatten(list_transform(vocab, v ->
                                       list_transform(
                                           range(1, len(v.syms)),
                                           ii -> struct_pack(
                                               a := v.syms[ii],
                                               b := v.syms[ii + 1],
                                               f := v.f)))) AS prs,
                                   flatten(list_transform(vocab, v ->
                                       list_transform(v.syms, s ->
                                           struct_pack(s := s,
                                               f := v.f)))) AS us
                            FROM wit WHERE rnd < {_WP_ROUNDS}
                        ) WHERE len(prs) > 0
                    )
                )
            )
        )
    )
)"""


# Recursive-CTE twin of the WordPiece trainer (r10: rows-only ->
# oracle). Same replay structure as BPE_TRAIN_ORACLE; the argmax
# criterion is the likelihood score cnt/(unit_a*unit_b) computed as
# the IDENTICAL float64 expression over exact integer counts in both
# engines (int->double conversions are IEEE nearest-even, one multiply
# and one divide — no accumulation), so even the emitted unrounded
# score hash-matches.
WP_TRAIN_ORACLE = f"""
WITH RECURSIVE {_WP_TRAIN_CTE}
SELECT CAST(rnd AS INT) AS round,
       ma || CASE WHEN mb LIKE '##%' THEN mb[3:] ELSE mb END AS merge,
       cnt AS pair_count, score
FROM wit WHERE rnd >= 1
"""


# Twin of the greedy longest-match-first WordPiece encode: vocab =
# initial symbols of the TRAINING words + the learned merge tokens;
# per word the recursion advances one matched piece per step (longest
# piece in vocab at the cursor, ## continuation prefix), whole word
# [UNK] = 1 token on a dead position. Terminal state per word = the
# max-step row.
WP_ENCODE_ORACLE = f"""
WITH RECURSIVE {_WP_TRAIN_CTE},
vs AS MATERIALIZED (
    SELECT list_distinct(
               flatten(list_transform(wf.vocab, v -> v.syms))
               || (SELECT COALESCE(list(ma || CASE WHEN mb LIKE '##%'
                       THEN mb[3:] ELSE mb END), [])
                   FROM wit WHERE rnd >= 1)) AS vset
    FROM wf
),
dw AS MATERIALIZED (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
    FROM documents
),
wenc AS (
    SELECT w, 1 AS pos, 0 AS ntok, FALSE AS dead, 0 AS step, vset
    FROM (SELECT DISTINCT w FROM dw), vs
    UNION ALL
    SELECT w,
           CASE WHEN ml IS NULL THEN pos ELSE pos + ml END,
           CASE WHEN ml IS NULL THEN 1 ELSE ntok + 1 END,
           ml IS NULL,
           step + 1,
           vset
    FROM (
        SELECT w, pos, ntok, step, vset,
               list_max(list_filter(
                   range(1, length(w) - pos + 2), L ->
                   list_contains(vset,
                       CASE WHEN pos = 1 THEN w[pos:pos + L - 1]
                            ELSE '##' || w[pos:pos + L - 1]
                       END))) AS ml
        FROM wenc WHERE NOT dead AND pos <= length(w)
    )
),
wfin AS MATERIALIZED (
    SELECT w, ntok FROM wenc
    QUALIFY row_number() OVER (PARTITION BY w ORDER BY step DESC) = 1
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(f.ntok) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(length(d.w)) AS BIGINT)
             / CAST(SUM(f.ntok) AS DOUBLE), 6) AS chars_per_token
FROM dw d JOIN wfin f USING (w)
GROUP BY d.doc_id
"""


@register("llm_wordpiece_train", extra=True, oracle=WP_TRAIN_ORACLE)
def llm_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece TRAINING (Schuster & Nakajima 2012) — the third
    subword family next to zx_llm_bpe_train (count-greedy) and
    zx_llm_unigram_train (EM pruning), completing the triad every
    production tokenizer stack draws from. Identical distributed
    shape to the BPE loop; the difference is the ARGMAX CRITERION —
    likelihood gain count(pair)/(count(a)*count(b)) instead of raw
    count, computed as one deterministic double over exact integer
    counts (both the kernel and the pure-python reference evaluate
    the same float64 expression, so ties and ordering agree exactly).
    Emits (round, merge, pair_count, score); pinned by the reference
    twin test."""
    rows = [
        (r, _wp_merge_token(a, b), c, s)
        for r, a, b, c, s in _wordpiece_train(spark, sf_dir)[0]
    ]
    return spark.createDataFrame(
        rows, "round int, merge string, pair_count bigint, score double"
    )


@register("llm_wordpiece_encode", extra=True, oracle=WP_ENCODE_ORACLE)
def llm_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece ENCODING — greedy longest-match-first against the
    trained vocab (base units + merge tokens), ##-prefixed
    continuations, whole-word [UNK] on a dead position (the BERT
    rule). Same deployment shape as zx_llm_bpe_encode: encode once
    per DISTINCT word via mapInPandas, broadcast the (word ->
    n_tokens) map back onto exploded doc-words, one doc-keyed agg —
    text bodies never shuffle; directly comparable per-doc
    chars-per-token against the BPE and unigram encoders on the same
    corpus."""
    import pandas as pd

    merges, base_units = _wordpiece_train(spark, sf_dir)
    vocab = set(base_units)
    for _, a, b, _, _ in merges:
        vocab.add(_wp_merge_token(a, b))
    d = table(spark, sf_dir, "documents")
    doc_words = d.select(
        "doc_id",
        F.explode(
            F.expr(rf"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("w"),
    )
    wvocab = doc_words.select("w").distinct()

    def encode_batches(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_tok": [
                        len(wordpiece_reference_encode(w, vocab))
                        for w in pdf["w"]
                    ],
                }
            )

    enc = wvocab.mapInPandas(encode_batches, "w string, n_tok int")
    return (
        doc_words.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_chars") / F.col("n_tokens").cast("double"), 6
            ).alias("chars_per_token"),
        )
    )


_PHRASES = ("table value", "fast spark", "agg row scan")


def _phrase_oracle() -> str:
    parts = []
    for ph in _PHRASES:
        ws = ph.split()
        conds = " AND ".join(
            f"ts[i + {j}] = '{w}'" for j, w in enumerate(ws)
        )
        parts.append(f"""
        SELECT '{ph}' AS phrase,
               CAST(COUNT(CASE WHEN cnt > 0 THEN 1 END) AS BIGINT)
                   AS n_docs,
               CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_matches
        FROM (
            SELECT doc_id,
                   list_sum(list_transform(
                       range(1, len(ts) - {len(ws) - 2}),
                       i -> CASE WHEN {conds} THEN 1 ELSE 0 END
                   )) AS cnt
            FROM (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                FROM documents
            )
        )""")
    return " UNION ALL ".join(parts)


@register("fts_phrase_search", extra=True, oracle=_phrase_oracle())
def fts_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL PHRASE SEARCH — the inverted-index plan every
    full-text engine runs for quoted queries: tokenize to positional
    postings (doc_id, term, pos), then a phrase of k words is k-1
    EQUI-JOINS on (doc_id, pos − offset) between term-filtered
    postings — adjacency becomes a join key, so the intersection is
    hash-join shaped and scales with the RAREST term's posting list,
    never with the corpus (the term filters push into the postings
    scan; the standard rarest-first optimization would reorder the
    join chain by df(term) — declared, not needed at bench scale).
    Counts are per-position, so overlapping occurrences of
    self-repeating phrases count correctly (which is exactly what the
    oracle's positional list-scan computes; a regex oracle could not
    — RE2 has no lookahead for overlaps). Complements zx_text_bm25
    (bag-of-words ranking) with exact-phrase semantics.

    Emits (phrase, n_docs, n_matches) for three fixed query phrases
    of lengths 2, 2, 3."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.expr(rf"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("pos", "term"),
    )
    outs = []
    for ph in _PHRASES:
        ws = ph.split()
        m = toks.filter(F.col("term") == ws[0]).select("doc_id", "pos")
        for i, w in enumerate(ws[1:], 1):
            nxt = toks.filter(F.col("term") == w).select(
                "doc_id", (F.col("pos") - i).alias("pos")
            )
            m = m.join(nxt, ["doc_id", "pos"])
        outs.append(
            m.groupBy()
            .agg(
                F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                F.count("*").cast("bigint").alias("n_matches"),
            )
            .select(F.lit(ph).alias("phrase"), "n_docs", "n_matches")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------- r7:
# span-level substring-dedup coverage + oracle-exact PageRank

_SPAN_N = 5  # shingle width; 50 in Lee et al. '22 (docs here are short)


@register(
    "llm_dedup_substring_spans",
    extra=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    pos AS (
        SELECT doc_id, u.i - 1 AS i,
               ts[u.i] || ' ' || ts[u.i+1] || ' ' || ts[u.i+2] || ' '
               || ts[u.i+3] || ' ' || ts[u.i+4] AS term
        FROM toks, UNNEST(generate_series(1, len(ts) - 4)) u(i)
        WHERE len(ts) >= {_SPAN_N}
    ),
    firsts AS (
        SELECT term, MIN(doc_id) AS fd
        FROM (SELECT DISTINCT doc_id, term FROM pos) GROUP BY term
    ),
    dup AS (
        SELECT p.doc_id, p.i FROM pos p JOIN firsts f USING (term)
        WHERE f.fd < p.doc_id
    ),
    isl AS (
        SELECT doc_id, i,
               CASE WHEN LAG(i) OVER w IS NULL
                    OR i - LAG(i) OVER w > {_SPAN_N - 1} THEN 1
                    ELSE 0 END AS nw
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    g AS (
        SELECT doc_id, i,
               SUM(nw) OVER (PARTITION BY doc_id ORDER BY i) AS gid
        FROM isl
    ),
    spans AS (
        SELECT doc_id, gid, MAX(i) - MIN(i) + {_SPAN_N} AS len
        FROM g GROUP BY doc_id, gid
    ),
    cov AS (
        SELECT doc_id, CAST(SUM(len) AS BIGINT) AS covered_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           COALESCE(c.n_spans, 0) AS n_spans,
           ROUND(COALESCE(c.covered_tokens, 0) * 1.0
                 / GREATEST(len(t.ts), 1), 6) AS coverage_ratio
    FROM toks t LEFT JOIN cov c USING (doc_id)
    """,
)
def llm_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. '22's HEADLINE metric: the fraction of each
    document's tokens lying inside a duplicated span — a maximal run
    of token positions covered by >=1 word 5-gram that appears
    verbatim in an earlier document. llm_dedup_substring counts
    leaking shingles; this one merges their [i, i+4] extents into
    spans (gaps-and-islands over duplicated start positions, new
    island when starts are > 4 apart) and reports exact covered-token
    counts. All integers until the final rounded share.

    Scale: the inverted-index min-owner aggregation is the shingle
    shuffle dedup_substring already pays; the island window is
    per-document (bounded by doc length), never global."""
    d = table(spark, sf_dir, "documents")
    toked = (
        d.select("doc_id", tokens_col().alias("ts"))
        .localCheckpoint(eager=True)
    )
    pos = toked.filter(F.size("ts") >= _SPAN_N).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - _SPAN_N),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("ts", i + k + 1) for k in range(_SPAN_N)],
                ),
            )
        ).alias("i", "term"),
    )
    firsts = (
        pos.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.min("doc_id").alias("fd"))
    )
    dup = (
        pos.join(firsts, "term")
        .filter(F.col("fd") < F.col("doc_id"))
        .select("doc_id", "i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    isl = dup.withColumn(
        "nw",
        F.when(
            F.lag("i").over(w).isNull()
            | (F.col("i") - F.lag("i").over(w) > _SPAN_N - 1),
            1,
        ).otherwise(0),
    ).withColumn("gid", F.sum("nw").over(w))
    cov = (
        isl.groupBy("doc_id", "gid")
        .agg((F.max("i") - F.min("i") + _SPAN_N).alias("len"))
        .groupBy("doc_id")
        .agg(
            F.sum("len").cast("bigint").alias("covered_tokens"),
            F.count("*").cast("bigint").alias("n_spans"),
        )
    )
    return (
        toked.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ts").cast("bigint").alias("n_tokens"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.round(
                F.coalesce("covered_tokens", F.lit(0))
                * 1.0
                / F.greatest(F.size("ts"), F.lit(1)),
                6,
            ).alias("coverage_ratio"),
        )
    )



# ------------------------------------------------------- winnowing

WINNOW_K = 3  # k-gram length (tokens per shingle)
WINNOW_W = 4  # window: every W consecutive k-gram hashes yield >=1 fp
WINNOW_MIN_SHARED = 2  # pair report floor (shared fingerprints)
WINNOW_MAX_DF_FRAC = 0.01  # boilerplate cut: fp in >max(5, 1%) docs
WINNOW_BUCKET_BUDGET = 16  # pairs per bucket: first-B members only
#   (the NN_BUCKET_CAP posture). Measured at the 10x decade: full
#   quadratic emission grows 93x per 10x docs on the saturated-vocab
#   corpus (32.1M pairs, GC-bound); first-B keeps every doc paired
#   with its bucket's earliest members and bounds growth at B*df per
#   bucket — asymptotically linear in corpus.


@register(
    "text_winnowing",
    extra=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{TOKEN_RE}') AS ts
        FROM documents
    ),
    base AS (
        SELECT doc_id, ts FROM toks
        WHERE len(ts) >= {WINNOW_K + WINNOW_W - 1}
    ),
    fps AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   range(1, len(ts) - {WINNOW_K + WINNOW_W - 3}),
                   j -> list_min(list_transform(
                       range(0, {WINNOW_W}),
                       o -> md5(ts[j + o] || ' ' || ts[j + o + 1]
                                || ' ' || ts[j + o + 2]))))) AS fp
        FROM base
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM base),
    keep AS (
        SELECT fp FROM fps, n
        GROUP BY fp, n_docs
        HAVING COUNT(*) BETWEEN 2 AND
               GREATEST(5, CAST(CEIL(n_docs * {WINNOW_MAX_DF_FRAC}) AS BIGINT))
    ),
    ranked AS (
        SELECT doc_id, fp,
               row_number() OVER (
                   PARTITION BY fp ORDER BY doc_id
               ) AS rnk
        FROM fps JOIN keep USING (fp)
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS shared_fps
        FROM ranked a
        JOIN ranked b
          ON a.fp = b.fp AND a.rnk < b.rnk
         AND a.rnk <= {WINNOW_BUCKET_BUDGET}
        GROUP BY 1, 2
        HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    )
    SELECT doc_a, doc_b, shared_fps FROM pairs
    """,
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD
    2003 — the MOSS algorithm), set form: hash every token k-gram,
    slide a window of W consecutive hashes, keep each window's
    minimum. Guarantee: any shared token run of length >= K+W-1
    (here 6) between two documents yields at least one SHARED
    fingerprint — position-robust partial-overlap detection, where
    `text_fingerprint` (the global-min W=infinity case) only catches
    whole-document near-identity and `dedup_ngram` needs high whole-
    set Jaccard. Density is ~2/(W+1) of k-grams, so the shuffled
    fingerprint volume is a tunable fraction of the corpus; text
    never shuffles.

    Scale posture: candidate pairs come from an inverted-index
    equi-join on fingerprints, never all-pairs; fingerprints above a
    relative document-frequency ceiling (max(5, 1% of docs)) are
    boilerplate and dropped BEFORE any bucket materializes, and each
    surviving bucket emits pairs only against its first
    WINNOW_BUCKET_BUDGET members — B*df per bucket, measured
    necessary at the 10x decade where full quadratic emission grew
    93x per 10x docs on the saturated-vocab corpus. shared_fps is
    therefore a CO-CANDIDATE count under the budget. md5 window-
    minima are lexicographic string mins — identical in DuckDB, so
    the full pipeline (budget included) is oracle-checkable.

    Reference scope: beyond-reference extension (the reference has no
    text processing; north-star training-data curation surface)."""
    d = table(spark, sf_dir, "documents")
    # Tokenize ONCE per doc (the dedup_ngram lesson: inline
    # element_at(tokens_col(), i) re-runs the regexp per element).
    # Repartition first: a compact parquet corpus arrives as ONE
    # split, and the checkpoint would pin the whole window-min
    # expansion to a single core (the dedup_near_embedding lesson).
    par = spark.sparkContext.defaultParallelism
    toked = (
        d.select("doc_id", tokens_col().alias("ts"))
        .filter(F.size("ts") >= WINNOW_K + WINNOW_W - 1)
        .repartition(par, "doc_id")
        .localCheckpoint(eager=True)
    )
    # Window j's fingerprint = min md5 of its W k-grams. The k-gram
    # hashes are recomputed per covering window (<=W times each): a
    # bounded constant factor that avoids materializing a second
    # hash array per row.
    starts = F.sequence(
        F.lit(1), F.size("ts") - F.lit(WINNOW_K + WINNOW_W - 2)
    )
    window_min = lambda j: F.array_min(  # noqa: E731
        F.transform(
            F.sequence(F.lit(0), F.lit(WINNOW_W - 1)),
            lambda o: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at("ts", j + o),
                    F.element_at("ts", j + o + 1),
                    F.element_at("ts", j + o + 2),
                )
            ),
        )
    )
    # Materialize the per-doc fingerprint set ONCE: three consumers
    # (doc-frequency agg, both self-join sides) would otherwise each
    # re-run the full window-min expansion and its distinct shuffle.
    fps = (
        toked.select(
            "doc_id", F.explode(F.transform(starts, window_min)).alias("fp")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Relative boilerplate ceiling needs the corpus doc count: a
    # 1-row broadcast, not a collect.
    n_docs = toked.agg(F.count("*").alias("n_docs"))
    keep = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .join(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= 2)
            & (
                F.col("df")
                <= F.greatest(
                    F.lit(5),
                    F.ceil(F.col("n_docs") * WINNOW_MAX_DF_FRAC),
                )
            )
        )
        .select("fp")
    )
    # Pair emission: group the SURVIVING fingerprints (bucket size is
    # bounded <= max_df by the filter above, so the per-group list is
    # capped by construction) and enumerate pairs with array HOFs —
    # one shuffle, vs two for a fp self-join. Only the bucket's FIRST
    # WINNOW_BUCKET_BUDGET members pair with later members, so pair
    # volume is B*df per bucket (linear in corpus), not df^2 — every
    # doc still reaches its bucket's earliest members (coverage).
    kept = fps.join(keep, "fp")
    ds = F.sort_array(F.collect_list("doc_id"))
    pair_structs = F.flatten(
        F.transform(
            F.slice(F.col("ds"), 1, WINNOW_BUCKET_BUDGET),
            lambda a, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size("ds")),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    return (
        kept.groupBy("fp")
        .agg(ds.alias("ds"))
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_MIN_SHARED)
    )


# ------------------------------------------- unigram LM tokenizer

_UNI_SUB_MAX = 4  # candidate piece max length (chars)
_UNI_SEED = 48  # multi-char seed pieces kept (plus all single chars)
_UNI_ROUNDS = 3  # EM rounds
_UNI_PRUNE_FRAC = 0.25  # multi-char pieces pruned per round (by count)
_UNI_WORD_MAX = 16  # lattice length cap (SentencePiece's
#                      max_sentencepiece_length posture)
_UNI_Q = 10**9  # expected-count fixed-point quantum


def unigram_expected_counts(
    word: str, probs: dict[str, float]
) -> dict[str, float]:
    """Forward-backward expected piece occupancy for one word under a
    unigram LM (Kudo 2018 §3.2): alpha[j] sums path mass ending at j,
    beta[i] mass from i to the end; a span (j,i) with piece p
    contributes alpha[j]*P(p)*beta[i]/Z expected occurrences. Shared
    by the Spark E-step kernel and the test reference (the BPE-kernel
    precedent)."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for j in range(max(0, i - _UNI_SUB_MAX), i):
            p = probs.get(word[j:i])
            if p:
                s += alpha[j] * p
        alpha[i] = s
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for j in range(n - 1, -1, -1):
        s = 0.0
        for i in range(j + 1, min(n, j + _UNI_SUB_MAX) + 1):
            p = probs.get(word[j:i])
            if p:
                s += p * beta[i]
        beta[j] = s
    z = alpha[n]
    out: dict[str, float] = {}
    if z <= 0.0:
        return out
    for j in range(n):
        for i in range(j + 1, min(n, j + _UNI_SUB_MAX) + 1):
            piece = word[j:i]
            p = probs.get(piece)
            if p:
                out[piece] = out.get(piece, 0.0) + alpha[j] * p * beta[i] / z
    return out


def _unigram_em(words: list[tuple[str, int]]) -> list[tuple[str, int, int]]:
    """The driver-side EM schedule over an already-aggregated word-type
    table: seed -> (E, M, prune) x rounds -> (piece, q_count, rank).
    Pure python so the pytest reference can run the IDENTICAL schedule
    on locally-counted words; the Spark operator distributes only the
    corpus-scale stages (word counting, E-step) around it."""
    # Seed: substring counts weighted by word frequency.
    seed: dict[str, int] = {}
    for w, f in words:
        n = len(w)
        for j in range(n):
            for i in range(j + 1, min(n, j + _UNI_SUB_MAX) + 1):
                piece = w[j:i]
                seed[piece] = seed.get(piece, 0) + f
    singles = {p for p in seed if len(p) == 1}
    multi = sorted(
        (p for p in seed if len(p) > 1),
        key=lambda p: (-seed[p], p),
    )[:_UNI_SEED]
    vocab = sorted(singles | set(multi))
    counts = {p: float(seed[p]) for p in vocab}
    q_counts: dict[str, int] = {}
    for _ in range(_UNI_ROUNDS):
        total = sum(counts.values())
        probs = {p: c / total for p, c in counts.items() if c > 0}
        # E-step (the Spark operator runs this part distributed):
        # per-word expected counts, fixed-point-quantized BEFORE the
        # cross-word sum so the aggregation is an integer sum —
        # order-independent under any shuffle.
        q_counts = {p: 0 for p in probs}
        for w, f in words:
            for piece, e in unigram_expected_counts(w, probs).items():
                # floor(x + 0.5): the PORTABLE half-up quantizer — python round()
                # is half-even, DuckDB ROUND half-away; floor(+0.5) is the
                # same IEEE op sequence in both engines (r10 oracle flip)
                q_counts[piece] += int(math.floor(e * _UNI_Q + 0.5)) * f
        # M-step + prune: drop the lowest-count quartile of multi-char
        # pieces (never singles — they keep every word segmentable).
        alive = [p for p, c in q_counts.items() if c > 0 or len(p) == 1]
        multi_alive = sorted(
            (p for p in alive if len(p) > 1),
            key=lambda p: (q_counts[p], p),
        )
        n_drop = int(len(multi_alive) * _UNI_PRUNE_FRAC)
        dropped = set(multi_alive[:n_drop])
        vocab = sorted(p for p in alive if p not in dropped)
        counts = {p: q_counts[p] / _UNI_Q for p in vocab}
    ranked = sorted(vocab, key=lambda p: (-q_counts.get(p, 0), p))
    return [
        (p, q_counts.get(p, 0), r + 1) for r, p in enumerate(ranked)
    ]


def _unigram_train_table(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, int, int]]:
    """UNIGRAM-LM TOKENIZER TRAINING (Kudo 2018; the SentencePiece
    default) — the other major subword family next to BPE
    (zx_llm_bpe_train): seed candidate pieces from substring counts,
    then EM rounds where the E-step computes forward-backward
    expected piece occupancies per word and the M-step renormalizes,
    pruning the lowest-count quartile of multi-char pieces each round
    (single chars are never pruned, keeping every word segmentable).
    Emits the final piece table (piece, q_count, rank).

    Distribution of each stage follows its data size: word counting
    is the only corpus-scale stage (one shuffle; everything after
    runs on the word-TYPE table, independent of corpus row count);
    the E-step runs as a mapInPandas kernel over the type table with
    the piece table a closure broadcast (a tokenizer vocab always
    fits); expected counts quantize to 1e9 fixed-point integers PER
    WORD before the cross-word sum, so the aggregated counts are
    order-independent under any shuffle (the als_implicit trick) and
    the whole trainer is bit-deterministic. Rows-only by design (a
    3-round EM loop is not one SQL query); pinned EXACTLY by a
    pure-python reference test running the identical schedule.

    Reference scope: beyond-reference extension (north-star
    training-data tokenizer surface)."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    words_df = (
        d.select(F.explode(tokens_col()).alias("w"))
        .filter(F.length("w") <= _UNI_WORD_MAX)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .localCheckpoint(eager=True)
    )

    # Seed counts: substring explode over the TYPE table (array HOF,
    # JVM-side), weighted by word frequency.
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda j: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(_UNI_SUB_MAX), F.length("w") - j + 1),
                ),
                lambda ln: F.substring(F.col("w"), j, ln),
            ),
        )
    )
    seed_counts = (
        words_df.select(F.explode(subs).alias("piece"), "f")
        .groupBy("piece")
        .agg(F.sum("f").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    singles = seed_counts.filter(F.length("piece") == 1)
    multi = (
        seed_counts.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(_UNI_SEED)
    )
    # Vocab-bounded collect: the candidate table (<= SEED + alphabet).
    counts = {
        r["piece"]: float(r["cnt"])
        for r in singles.union(multi).collect()
    }

    q_counts: dict[str, int] = {}
    for _ in range(_UNI_ROUNDS):
        total = sum(counts.values())
        probs = {p: c / total for p, c in counts.items() if c > 0}

        def e_step(batches, probs=probs):
            for pdf in batches:
                ps, eq, fs = [], [], []
                for w, f in zip(pdf["w"], pdf["f"]):
                    for piece, e in unigram_expected_counts(
                        w, probs
                    ).items():
                        ps.append(piece)
                        eq.append(int(math.floor(e * _UNI_Q + 0.5)))
                        fs.append(int(f))
                yield pd.DataFrame({"piece": ps, "eq": eq, "f": fs})

        # eq <= word_len * Q fits int64 per word; the freq-weighted
        # cross-word sum runs as decimal(38,0) so a 100 TB corpus
        # (token counts ~1e14) can't overflow the accumulator.
        got = (
            words_df.mapInPandas(
                e_step, "piece string, eq bigint, f bigint"
            )
            .groupBy("piece")
            .agg(
                F.sum(
                    F.col("eq").cast("decimal(38,0)") * F.col("f")
                ).alias("qc")
            )
            .collect()
        )
        q_counts = {p: 0 for p in probs}
        for r in got:
            q_counts[r["piece"]] = int(r["qc"])
        alive = [p for p, c in q_counts.items() if c > 0 or len(p) == 1]
        multi_alive = sorted(
            (p for p in alive if len(p) > 1),
            key=lambda p: (q_counts[p], p),
        )
        n_drop = int(len(multi_alive) * _UNI_PRUNE_FRAC)
        dropped = set(multi_alive[:n_drop])
        vocab = sorted(p for p in alive if p not in dropped)
        counts = {p: q_counts[p] / _UNI_Q for p in vocab}

    ranked = sorted(counts, key=lambda p: (-q_counts.get(p, 0), p))
    return [(p, q_counts.get(p, 0), r + 1) for r, p in enumerate(ranked)]


# Recursive-CTE twin of the unigram-LM EM trainer (r10: rows-only ->
# oracle). Replayable because every float in the loop is either (a) a
# sum of INTEGER-valued doubles (round-1 totals), (b) an ORDERED fold
# over the piece-sorted vocab (later totals), or (c) the per-word
# forward-backward lattice — a written-down sequential recurrence the
# CTE replays with the identical op order (alpha: j ascending; beta:
# reversed build; occupancy: span-scan order; absent pieces contribute
# an IEEE-exact +0.0). Expected counts quantize via floor(x*Q + 0.5)
# — the portable half-up — BEFORE the cross-word sum, so aggregation
# is pure integers. Caveat (documented): counts re-float as
# CAST(q AS DOUBLE)/Q; python's int/int true division is correctly
# rounded while this double-rounds — they agree while q < 2^53
# (~9e15; this corpus peaks ~1e15 per piece).
_UNI_BASE_CTES = f""" words0 AS MATERIALIZED (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS f
    FROM (SELECT unnest(regexp_extract_all(lower(text),
              '{TOKEN_RE}')) AS w FROM documents)
    WHERE length(w) <= {_UNI_WORD_MAX}
    GROUP BY w
),
uw AS MATERIALIZED (
    SELECT list(struct_pack(w := w, f := f) ORDER BY w) AS ws
    FROM words0
),
seed AS MATERIALIZED (
    SELECT piece, CAST(SUM(f) AS BIGINT) AS cnt
    FROM (
        SELECT w[CAST(jv AS INT) : CAST(jv + lnn - 1 AS INT)] AS piece,
               f
        FROM words0,
             LATERAL (SELECT unnest(range(1, length(w) + 1)) AS jv) tj,
             LATERAL (SELECT unnest(range(1,
                 least({_UNI_SUB_MAX}, length(w) - jv + 1) + 1))
                 AS lnn) tl
    ) GROUP BY piece
),
plist0 AS MATERIALIZED (
    SELECT list(struct_pack(piece := piece,
                            c := CAST(cnt AS DOUBLE),
                            qc := CAST(0 AS BIGINT))
                ORDER BY piece) AS plist
    FROM (
        SELECT piece, cnt FROM seed WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM seed WHERE length(piece) > 1
            QUALIFY row_number() OVER (ORDER BY cnt DESC, piece)
                <= {_UNI_SEED}
        )
    )
),
"""

_UNI_EM_RECURSION = f"""
    SELECT 0 AS rnd, plist, ws FROM plist0, uw
    UNION ALL
    SELECT rnd + 1,
           list_sort(list_transform(
               list_filter(alive, q ->
                   NOT list_contains(dropped, q.piece)),
               q -> struct_pack(piece := q.piece,
                   c := CAST(q.qc AS DOUBLE) / {_UNI_Q}.0::DOUBLE,
                   qc := q.qc))),
           ws
    FROM (
        SELECT rnd, ws, alive,
               list_transform(list_slice(msorted, 1,
                   CAST(trunc(CAST(len(msorted) AS DOUBLE)
                              * {_UNI_PRUNE_FRAC}) AS BIGINT)),
                   x -> x.piece) AS dropped
        FROM (
            SELECT rnd, ws, alive,
                   list_sort(list_transform(
                       list_filter(alive, q -> length(q.piece) > 1),
                       q -> struct_pack(qc := q.qc, piece := q.piece)))
                       AS msorted
            FROM (
                SELECT rnd, ws,
                       list_filter(qlist, q ->
                           q.qc > 0 OR length(q.piece) = 1) AS alive
                FROM (
                    SELECT rnd, ws,
                           list_transform(probs, pr -> struct_pack(
                               piece := pr.piece,
                               qc := COALESCE(list_sum(
                                   list_transform(ec, m ->
                                       CASE WHEN m.piece = pr.piece
                                            THEN m.v
                                            ELSE CAST(0 AS BIGINT)
                                       END)), CAST(0 AS BIGINT))))
                               AS qlist
                    FROM (
                        SELECT rnd, ws, probs,
                               flatten(list_transform(ws, wd ->
    list_transform([struct_pack(
        nn := length(wd.w),
        spanlist := flatten(list_transform(
            range(0, length(wd.w)), j0 ->
            list_transform(range(j0 + 1,
                least(length(wd.w), j0 + {_UNI_SUB_MAX}) + 1), iv ->
                struct_pack(j0 := j0, iv := iv)))),
        al := list_reduce(list_prepend([1.0::DOUBLE],
            list_transform(range(1, length(wd.w) + 1),
                tv -> [CAST(tv AS DOUBLE)])),
            (acc, e) -> list_append(acc,
                list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(range(
                        GREATEST(CAST(e[1] AS BIGINT)
                                 - {_UNI_SUB_MAX}, 0),
                        CAST(e[1] AS BIGINT)), jv ->
                        acc[CAST(jv AS INT) + 1]
                        * COALESCE(list_filter(probs, pq ->
                              pq.piece = wd.w[CAST(jv + 1 AS INT)
                                  : CAST(e[1] AS INT)])[1].p,
                              0.0))),
                    (sa, tb) -> sa + tb))),
        bt := list_reduce(list_prepend([1.0::DOUBLE],
            list_transform(range(2, length(wd.w) + 2),
                tv -> [CAST(tv AS DOUBLE)])),
            (acc, e) -> list_append(acc,
                list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(range(1,
                        least(CAST({_UNI_SUB_MAX} AS BIGINT),
                              CAST(e[1] AS BIGINT) - 1) + 1), dv ->
                        COALESCE(list_filter(probs, pq ->
                            pq.piece = wd.w[
                                CAST(length(wd.w) - e[1] + 2 AS INT)
                                : CAST(length(wd.w) - e[1] + 1 + dv
                                       AS INT)])[1].p, 0.0)
                        * acc[CAST(e[1] - dv AS INT)])),
                    (sa, tb) -> sa + tb)))
    )], st ->
        list_transform([struct_pack(
            zz := st.al[CAST(st.nn AS INT) + 1])], st2 ->
            CASE WHEN st2.zz <= 0.0
            THEN CAST([] AS STRUCT(piece VARCHAR, v BIGINT)[])
            ELSE list_transform(
                list_distinct(list_transform(
                    list_filter(st.spanlist, sp ->
                        len(list_filter(probs, pq -> pq.piece =
                            wd.w[CAST(sp.j0 + 1 AS INT)
                                 : CAST(sp.iv AS INT)])) > 0),
                    sp -> wd.w[CAST(sp.j0 + 1 AS INT)
                               : CAST(sp.iv AS INT)])),
                pc -> struct_pack(
                    piece := pc,
                    v := CAST(FLOOR(
                        list_reduce(list_prepend(0.0::DOUBLE,
                            list_transform(st.spanlist, sp ->
                                CASE WHEN wd.w[
                                        CAST(sp.j0 + 1 AS INT)
                                        : CAST(sp.iv AS INT)] = pc
                                THEN ((st.al[CAST(sp.j0 AS INT) + 1]
                                       * COALESCE(list_filter(probs,
                                             pq -> pq.piece = pc)[1].p,
                                             0.0))
                                      * st.bt[CAST(st.nn - sp.iv + 1
                                              AS INT)])
                                     / st2.zz
                                ELSE 0.0 END)),
                            (sa, tb) -> sa + tb)
                        * {_UNI_Q}.0::DOUBLE + 0.5::DOUBLE)
                        AS BIGINT) * wd.f))
            END)[1])[1]
                               )) AS ec
                        FROM (
                            SELECT rnd, ws,
                                   list_transform(
                                       list_filter(plist,
                                           q -> q.c > 0),
                                       q -> struct_pack(
                                           piece := q.piece,
                                           p := q.c / total)) AS probs
                            FROM (
                                SELECT rnd, ws, plist,
                                       list_reduce(
                                           list_prepend(0.0::DOUBLE,
                                               list_transform(plist,
                                                   q -> q.c)),
                                           (sa, tb) -> sa + tb)
                                           AS total
                                FROM uit WHERE rnd < {_UNI_ROUNDS}
                            )
                        )
                    )
                )
            )
        )
    )
"""

UNI_TRAIN_ORACLE = f"""
WITH RECURSIVE {_UNI_BASE_CTES}
uit AS (
{_UNI_EM_RECURSION}
)
SELECT q.piece, q.qc AS q_count,
       CAST(row_number() OVER (ORDER BY q.qc DESC, q.piece) AS INT)
           AS rank
FROM (SELECT unnest(plist) AS q FROM uit WHERE rnd = {_UNI_ROUNDS})
"""

@register("llm_unigram_train", extra=True, oracle=UNI_TRAIN_ORACLE)
def llm_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM training surface: the distributed EM loop
    (``_unigram_train_table``) as (piece, q_count, rank) rows; pinned
    EXACTLY by the pure-python reference test AND (r10) hash-matched
    by a recursive-CTE DuckDB twin — the loop is pure integer/string
    algebra, so the greedy argmax and the merge application replay
    exactly."""
    return spark.createDataFrame(
        _unigram_train_table(spark, sf_dir),
        "piece string, q_count bigint, rank int",
    )


def unigram_viterbi_encode(
    word: str, logp: dict[str, float]
) -> list[str]:
    """Viterbi segmentation under a trained unigram LM: maximize the
    summed piece log-probability; ties prefer the LONGER last piece
    (smaller split point), so the result is deterministic. Shared by
    the Spark encode kernel and its test reference."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [-1] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - _UNI_SUB_MAX), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == NEG:
                continue
            s = best[j] + lp
            # strict > with ascending j: ties keep the SMALLEST j
            # (longest last piece)
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == NEG:  # unsegmentable (char outside the vocab)
        return list(word)
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


# Twin of the Viterbi unigram encode: re-derives the trained piece
# table (the train recursion), builds logp = ln(qc/total) per piece
# (qc and total are exact integers < 2^53, so the double division
# matches python's correctly-rounded int/int; ln() resolves to the
# same platform libm as python's math.log on this container — the one
# platform-shared assumption, pinned by the hash check itself), then
# replays the per-word Viterbi as a fold carrying (best, ntok) pairs:
# inner j ascending with strict >, so ties keep the smallest split —
# the reference rule. Unsegmentable words fall back to char count.
UNI_ENCODE_ORACLE = f"""
WITH RECURSIVE {_UNI_BASE_CTES}
uit AS (
{_UNI_EM_RECURSION}
),
fin0 AS MATERIALIZED (
    SELECT plist FROM uit WHERE rnd = {_UNI_ROUNDS}
),
tsum AS MATERIALIZED (
    SELECT CAST(SUM(x.qc) AS BIGINT) AS tq
    FROM (SELECT unnest(plist) AS x FROM fin0) WHERE x.qc > 0
),
lp AS MATERIALIZED (
    SELECT list(struct_pack(piece := q.piece,
               logp := ln(CAST(q.qc AS DOUBLE)
                          / CAST(tsum.tq AS DOUBLE)))) AS lps
    FROM (SELECT unnest(plist) AS q FROM fin0), tsum
    WHERE q.qc > 0
),
dw AS MATERIALIZED (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
    FROM documents
),
venc AS MATERIALIZED (
    SELECT w,
           list_transform([list_reduce(
               list_prepend(
                   [struct_pack(b := 0.0::DOUBLE,
                                t := CAST(0 AS BIGINT))],
                   list_transform(range(1, length(w) + 1), tv ->
                       [struct_pack(b := CAST(tv AS DOUBLE),
                                    t := CAST(0 AS BIGINT))])),
               (acc, e) -> list_append(acc,
                   list_reduce(
                       list_prepend(
                           struct_pack(
                               b := '-Infinity'::DOUBLE,
                               t := CAST(-1 AS BIGINT)),
                           list_transform(range(
                               GREATEST(CAST(e[1].b AS BIGINT)
                                        - {_UNI_SUB_MAX}, 0),
                               CAST(e[1].b AS BIGINT)), jv ->
                               CASE WHEN len(list_filter(lps, pq ->
                                        pq.piece = w[
                                            CAST(jv + 1 AS INT)
                                            : CAST(e[1].b AS INT)]))
                                        > 0
                                    AND acc[CAST(jv AS INT) + 1].b
                                        > '-Infinity'::DOUBLE
                               THEN struct_pack(
                                   b := acc[CAST(jv AS INT) + 1].b
                                        + list_filter(lps, pq ->
                                            pq.piece = w[
                                                CAST(jv + 1 AS INT)
                                                : CAST(e[1].b AS INT)]
                                          )[1].logp,
                                   t := acc[CAST(jv AS INT) + 1].t
                                        + 1)
                               ELSE struct_pack(
                                   b := '-Infinity'::DOUBLE,
                                   t := CAST(-1 AS BIGINT))
                               END)),
                       (x, y) -> CASE WHEN y.b > x.b
                                      THEN y ELSE x END)))],
               vit -> CASE
                   WHEN vit[CAST(length(w) AS INT) + 1].b
                        = '-Infinity'::DOUBLE
                   THEN CAST(length(w) AS BIGINT)
                   ELSE vit[CAST(length(w) AS INT) + 1].t
               END)[1] AS n_tok
    FROM (SELECT DISTINCT w FROM dw), lp
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_tok) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(length(d.w)) AS BIGINT)
             / CAST(SUM(v.n_tok) AS DOUBLE), 6) AS chars_per_token
FROM dw d JOIN venc v USING (w)
GROUP BY d.doc_id
"""


@register("llm_unigram_encode", extra=True, oracle=UNI_ENCODE_ORACLE)
def llm_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIGRAM-LM ENCODING — the lifecycle's second half
    (llm_unigram_train learns the piece table; this applies it):
    Viterbi-segment every document with the corpus-trained pieces and
    emit per-doc token accounting (word count, subword token count,
    chars-per-token compression), mirroring zx_llm_bpe_encode so the
    two tokenizer families are directly comparable on the same
    corpus.

    Shape (the BPE-encode posture): the piece table is driver-sized
    (a tokenizer vocab always fits); encoding runs ONCE PER DISTINCT
    WORD as an Arrow mapInPandas kernel over the vocab table
    (independent of corpus row count); per-doc totals are a broadcast
    join of (word -> n_tokens) onto the exploded doc-words frame plus
    one doc-keyed agg. Text bodies never shuffle. Rows-only: the
    Viterbi recurrence is not one SQL query; the kernel is pinned
    exactly by the python reference test."""
    import math

    import pandas as pd

    trained = _unigram_train_table(spark, sf_dir)
    total = sum(qc for _, qc, _ in trained if qc > 0)
    logp = {
        p: math.log(qc / total) for p, qc, _ in trained if qc > 0
    }

    d = table(spark, sf_dir, "documents")
    doc_words = d.select(
        "doc_id", F.explode(tokens_col()).alias("w")
    )
    vocab = doc_words.select("w").distinct()

    def encode_batches(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_tok": [
                        len(unigram_viterbi_encode(w, logp))
                        for w in pdf["w"]
                    ],
                }
            )

    enc = vocab.mapInPandas(encode_batches, "w string, n_tok int")
    return (
        doc_words.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_chars") / F.col("n_tokens").cast("double"), 6
            ).alias("chars_per_token"),
        )
    )


# ----------------------------------------- naive Bayes lang classifier

# Held-out split: doc_id % NB_TEST_MOD == 0 is the test fold.
NB_TEST_MOD = 5


def _mn_log(x: F.Column) -> F.Column:
    """ln(x) integer-scaled to micro-nats — the house cross-engine
    encoding (survival_km precedent): one double ln + one ROUND per
    DISTINCT input, then every downstream sum is an exact BIGINT."""
    return F.round(F.lit(1000000.0) * F.log(x)).cast("bigint")


def _mn_scalar(x: float) -> int:
    """Driver twin of _mn_log for scalar constants (Decimal HALF_UP
    mirrors Spark/DuckDB ROUND; floor(y + 0.5) is wrong for negative
    halves)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(1000000.0 * math.log(x)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


@register(
    "text_nb_lang_classifier",
    extra=True,
    oracle=rf"""
    WITH train AS (
        SELECT * FROM documents WHERE doc_id % {NB_TEST_MOD} <> 0
    ),
    test AS (
        SELECT * FROM documents WHERE doc_id % {NB_TEST_MOD} = 0
    ),
    tw AS (
        SELECT lang, unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9]+')) AS w
        FROM train
    ),
    tl AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tw GROUP BY lang, w
    ),
    vsz AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tl),
    lt AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM tl
           GROUP BY lang),
    pri AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd FROM train
            GROUP BY lang),
    nall AS (SELECT CAST(SUM(nd) AS BIGINT) AS ndall FROM pri),
    langs AS (
        SELECT l.lang, l.tot,
               CAST(ROUND(1000000.0 * LN(CAST(p.nd AS DOUBLE)
                   / (SELECT ndall FROM nall))) AS BIGINT) AS prior_mn,
               CAST(ROUND(1000000.0 * LN(1.0
                   / CAST(l.tot + (SELECT v FROM vsz) AS DOUBLE)))
                   AS BIGINT) AS dflt_mn
        FROM lt l JOIN pri p USING (lang)
    ),
    llp AS (
        SELECT t.lang, t.w,
               CAST(ROUND(1000000.0 * LN(CAST(t.c + 1 AS DOUBLE)
                   / CAST(l.tot + (SELECT v FROM vsz) AS DOUBLE)))
                   AS BIGINT) AS mn
        FROM tl t JOIN lt l USING (lang)
    ),
    tstw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS w
        FROM test
    ),
    sc AS (
        SELECT tw2.doc_id, lg.lang,
               COALESCE(p.mn, lg.dflt_mn) AS mn
        FROM tstw tw2
        CROSS JOIN langs lg
        LEFT JOIN llp p ON p.lang = lg.lang AND p.w = tw2.w
    ),
    per AS (
        SELECT s.doc_id, s.lang,
               SUM(s.mn) + MIN(lg.prior_mn) AS score
        FROM sc s JOIN langs lg ON lg.lang = s.lang
        GROUP BY s.doc_id, s.lang
    ),
    pred AS (
        SELECT doc_id, lang AS pred_lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, lang ASC) AS rn
        FROM per
    )
    SELECT t.lang AS actual_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM test t JOIN pred p ON t.doc_id = p.doc_id AND p.rn = 1
    GROUP BY t.lang, p.pred_lang
    """,
)
def text_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NAIVE BAYES text classifier, trained and evaluated
    in one plan — the fastText/CCNet-style curation-classifier shape
    (GPT-3's quality filter, CCNet's language buckets are exactly
    this: a linear bag-of-words model whose training IS a groupBy):
    train token-given-class counts with Laplace smoothing on the
    doc_id-hash train fold, score the held-out fold, and emit the
    confusion matrix (actual x predicted langs, <= |langs|^2 rows).

    Cross-engine exactness: every log factor (smoothed likelihood,
    unseen-token default, class prior) is computed ONCE per distinct
    (token, class) and integer-scaled to micro-nats, so each doc's
    class score is an order-independent BIGINT sum; argmax breaks
    ties on lang ASC in both engines.

    100 TB shape: training is one (token, lang) aggregation — map-side
    combinable, output proportional to VOCABULARY x classes, never
    corpus rows (the model table is what a tokenizer vocab is: always
    broadcast-able). Scoring is a broadcast left join onto the
    exploded test tokens (one narrow x|langs| fan-out, no shuffle of
    text), one (doc, lang) agg and a 1-shuffle argmax. The vocab-size
    scalar is a bounded 1-row driver fold (house pattern)."""
    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % NB_TEST_MOD != 0)
    test = d.filter(F.col("doc_id") % NB_TEST_MOD == 0)

    tl = (
        train.select("lang", F.explode(tokens_col()).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    # Class-level constants as BOUNDED driver folds (<= |langs| rows
    # each, house pattern): keeping them as lazy branches re-scans the
    # fact once for the priors and again for their total — 2 extra
    # full passes at 100 TB for 5-row tables.
    v = tl.select("w").distinct().count()  # vocab size: 1-row fold
    lt_rows = {
        r["lang"]: int(r["tot"])
        for r in tl.groupBy("lang").agg(F.sum("c").alias("tot")).collect()
    }
    pri_rows = {
        r["lang"]: int(r["nd"])
        for r in train.groupBy("lang")
        .agg(F.count("*").alias("nd"))
        .collect()
    }
    ndall = sum(pri_rows.values())
    langs = spark.createDataFrame(
        [
            (
                lang,
                tot,
                _mn_scalar(pri_rows[lang] / ndall),
                _mn_scalar(1.0 / (tot + v)),
            )
            for lang, tot in sorted(lt_rows.items())
        ],
        "lang string, tot bigint, prior_mn bigint, dflt_mn bigint",
    )
    llp = tl.join(F.broadcast(langs.select("lang", "tot")), "lang").select(
        "lang",
        "w",
        _mn_log(
            (F.col("c") + 1).cast("double")
            / (F.col("tot") + F.lit(v)).cast("double")
        ).alias("mn"),
    )

    # actual_lang rides the exploded tokens (one narrow column) so the
    # argmax chain never joins back on doc_id — saves a corpus-keyed
    # shuffle join vs the textbook predict-then-join shape
    test_words = test.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        F.explode(tokens_col()).alias("w"),
    )
    per = (
        test_words.crossJoin(F.broadcast(langs))
        .join(F.broadcast(llp), ["lang", "w"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            (
                F.sum(F.coalesce("mn", "dflt_mn")) + F.min("prior_mn")
            ).alias("score"),
            F.min("actual_lang").alias("actual_lang"),
        )
    )
    pred = (
        per.groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"), F.col("lang").alias("l")
                )
            ).alias("m"),
            F.min("actual_lang").alias("actual_lang"),
        )
        .select("actual_lang", F.col("m.l").alias("pred_lang"))
    )
    return pred.groupBy("actual_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


# ------------------------------------------------- exact ROC-AUC eval

_AUC_POS_LANG = "en"
_AUC_BUCKETS = 64


@register(
    "eval_auc_roc",
    extra=True,
    oracle=rf"""
    WITH train AS (
        SELECT * FROM documents WHERE doc_id % {NB_TEST_MOD} <> 0
    ),
    test AS (
        SELECT * FROM documents WHERE doc_id % {NB_TEST_MOD} = 0
    ),
    tw AS (
        SELECT CASE WHEN lang = '{_AUC_POS_LANG}' THEN 1 ELSE 0 END
                   AS cls,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM train
    ),
    tc AS (
        SELECT w,
               CAST(SUM(cls) AS BIGINT) AS c1,
               CAST(SUM(1 - cls) AS BIGINT) AS c0
        FROM tw GROUP BY w
    ),
    consts AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tc) AS v,
               (SELECT CAST(SUM(c1) AS BIGINT) FROM tc) AS tot1,
               (SELECT CAST(SUM(c0) AS BIGINT) FROM tc) AS tot0,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM train
                WHERE lang = '{_AUC_POS_LANG}') AS nd1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM train) AS ndall
    ),
    lo AS (
        SELECT w,
               CAST(ROUND(1000000.0 * LN(CAST(c1 + 1 AS DOUBLE)
                   / CAST(tot1 + v AS DOUBLE))) AS BIGINT)
               - CAST(ROUND(1000000.0 * LN(CAST(c0 + 1 AS DOUBLE)
                   / CAST(tot0 + v AS DOUBLE))) AS BIGINT) AS w_lo
        FROM tc CROSS JOIN consts
    ),
    k AS (
        SELECT CAST(ROUND(1000000.0 * LN(1.0
                   / CAST(tot1 + v AS DOUBLE))) AS BIGINT)
               - CAST(ROUND(1000000.0 * LN(1.0
                   / CAST(tot0 + v AS DOUBLE))) AS BIGINT) AS dflt_lo,
               CAST(ROUND(1000000.0 * LN(CAST(nd1 AS DOUBLE)
                   / ndall)) AS BIGINT)
               - CAST(ROUND(1000000.0 * LN(CAST(ndall - nd1 AS DOUBLE)
                   / ndall)) AS BIGINT) AS prior_lo
        FROM consts
    ),
    tstw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS w
        FROM test
    ),
    per AS (
        SELECT t.doc_id,
               SUM(COALESCE(l.w_lo, (SELECT dflt_lo FROM k)))
                   + MIN((SELECT prior_lo FROM k)) AS s
        FROM tstw t LEFT JOIN lo l ON l.w = t.w
        GROUP BY t.doc_id
    ),
    lab AS (
        SELECT p.s,
               CASE WHEN t.lang = '{_AUC_POS_LANG}' THEN 1 ELSE 0 END
                   AS y
        FROM per p JOIN test t ON t.doc_id = p.doc_id
    ),
    hist AS (
        SELECT s,
               CAST(SUM(y) AS BIGINT) AS pos_s,
               CAST(SUM(1 - y) AS BIGINT) AS neg_s
        FROM lab GROUP BY s
    ),
    c AS (
        SELECT pos_s, neg_s,
               CAST(COALESCE(SUM(neg_s) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cnb
        FROM hist
    )
    SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           CAST(SUM(neg_s) AS BIGINT) AS n_neg,
           ROUND(CAST(SUM(pos_s * (2 * cnb + neg_s)) AS DOUBLE)
               / (2.0 * SUM(pos_s) * SUM(neg_s)), 6) AS auc
    FROM c
    """,
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC for a trained classifier — the evaluation half
    every curation classifier needs (pairs with the NB trainer the
    way zx_retrieval_eval_mrr/ndcg pair with the ANN family). The
    scored model is the binary Naive Bayes log-odds (positive class =
    lang '{pos}') on the held-out fold; AUC is the Mann-Whitney
    rank-sum with the standard half-credit tie handling, computed
    EXACTLY: AUC = sum_s pos_s*(2*cum_neg_below + neg_s) / (2*P*N)
    over the SCORE HISTOGRAM, never per-pair.

    Cross-engine exactness: scores are BIGINT micro-nat sums (each
    log factor rounded once per distinct token), so ties align
    bit-for-bit across engines and the U statistic is an exact
    integer in both.

    100 TB shape: scoring is the NB broadcast-join plan; the AUC
    reduction runs on the DISTINCT-SCORE histogram, and the running
    below-score negative count uses the bucket-prefix pattern (range
    bucket off a 1-row min/max fold + <=64-row driver prefix fold +
    bucket-partitioned local window) — no single-partition global
    window anywhere, unlike the textbook rank-based AUC."""
    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % NB_TEST_MOD != 0)
    test = d.filter(F.col("doc_id") % NB_TEST_MOD == 0)
    is_pos = (F.col("lang") == _AUC_POS_LANG).cast("int")

    tc = (
        train.select(is_pos.alias("cls"), F.explode(tokens_col()).alias("w"))
        .groupBy("w")
        .agg(
            F.sum("cls").cast("bigint").alias("c1"),
            F.sum(1 - F.col("cls")).cast("bigint").alias("c0"),
        )
        .localCheckpoint(eager=True)
    )
    # bounded driver folds (house pattern): vocab size + class totals
    crow = tc.agg(
        F.count("*").alias("v"),
        F.sum("c1").alias("tot1"),
        F.sum("c0").alias("tot0"),
    ).first()
    prow = train.agg(
        F.sum(is_pos).alias("nd1"), F.count("*").alias("ndall")
    ).first()
    if not int(crow.v or 0):
        # EMPTY train fold (degenerate corpus): the oracle's lo CTE
        # is empty, every test doc scores NULL, and the histogram is
        # one NULL-score group — n_pos/n_neg are the test totals and
        # AUC is 0.5 (one tied group) or NULL if either class is
        # absent. Mirror that closed form instead of 0-dividing.
        t = test.agg(
            F.sum(is_pos).cast("bigint").alias("n_pos"),
            F.sum(1 - is_pos).cast("bigint").alias("n_neg"),
        )
        return t.select(
            "n_pos",
            "n_neg",
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.lit(0.5),
            ).alias("auc"),
        )
    v, tot1, tot0 = int(crow.v), int(crow.tot1 or 0), int(crow.tot0 or 0)
    nd1, ndall = int(prow.nd1 or 0), int(prow.ndall)

    dflt_lo = _mn_scalar(1.0 / (tot1 + v)) - _mn_scalar(1.0 / (tot0 + v))
    prior_lo = _mn_scalar(nd1 / ndall) - _mn_scalar((ndall - nd1) / ndall)

    lo = tc.select(
        "w",
        (
            _mn_log((F.col("c1") + 1).cast("double") / F.lit(float(tot1 + v)))
            - _mn_log(
                (F.col("c0") + 1).cast("double") / F.lit(float(tot0 + v))
            )
        ).alias("w_lo"),
    )
    per = (
        test.select("doc_id", F.explode(tokens_col()).alias("w"))
        .join(F.broadcast(lo), "w", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.coalesce("w_lo", F.lit(dflt_lo)))
                + F.lit(prior_lo)
            ).alias("s")
        )
    )
    hist = (
        per.join(test.select("doc_id", is_pos.alias("y")), "doc_id")
        .groupBy("s")
        .agg(
            F.sum("y").cast("bigint").alias("pos_s"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg_s"),
        )
        .localCheckpoint(eager=True)
    )
    lohi = hist.agg(
        F.min("s").alias("lo"), F.max("s").alias("hi")
    ).first()
    if lohi.lo is None:  # empty TEST fold: all-NULL aggregate row,
        return hist.agg(  # exactly the oracle's empty-c SELECT
            F.sum("pos_s").cast("bigint").alias("n_pos"),
            F.sum("neg_s").cast("bigint").alias("n_neg"),
            F.lit(None).cast("double").alias("auc"),
        )
    slo, shi = float(lohi.lo), float(lohi.hi)
    width = (shi - slo) / _AUC_BUCKETS if shi > slo else 1.0
    b = hist.withColumn(
        "_bk",
        F.least(
            F.floor((F.col("s").cast("double") - slo) / width),
            F.lit(_AUC_BUCKETS - 1),
        ).cast("int"),
    )
    from eventstream_notify_spark.functions.ranking import bucket_prefix_expr

    bneg = b.groupBy("_bk").agg(F.sum("neg_s").alias("nb"))
    off = bucket_prefix_expr(bneg, "_bk", "nb", op="sum")
    w_local = (
        Window.partitionBy("_bk")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = b.select(
        "pos_s",
        "neg_s",
        (
            F.coalesce(off, F.lit(0))
            + F.coalesce(F.sum("neg_s").over(w_local), F.lit(0))
        ).alias("cnb"),
    )
    return c.agg(
        F.sum("pos_s").cast("bigint").alias("n_pos"),
        F.sum("neg_s").cast("bigint").alias("n_neg"),
        F.round(
            F.sum(
                F.col("pos_s") * (F.lit(2) * F.col("cnb") + F.col("neg_s"))
            ).cast("double")
            / (F.lit(2.0) * F.sum("pos_s") * F.sum("neg_s")),
            6,
        ).alias("auc"),
    )


# ------------------------------------------------ k-core decomposition

KCORE_K = 3  # the fixed core order under audit
KCORE_MAX_ITERS = 64


@register(
    "graph_kcore",
    extra=True,
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTE},
    adjl AS MATERIALIZED (
        SELECT w AS node, list(v ORDER BY v) AS nbrs
        FROM (SELECT doc_a AS w, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs)
        GROUP BY w
    ),
    peel AS (
        SELECT 0 AS it,
               (SELECT list(node ORDER BY node) FROM adjl) AS nodes,
               CAST(NULL AS BIGINT[]) AS prev,
               (SELECT list({{'node': node, 'nbrs': nbrs}} ORDER BY node)
                FROM adjl) AS al
        UNION ALL
        SELECT it + 1,
               list_sort(list_transform(list_filter(al,
                   a -> list_contains(nodes, a.node)
                        AND len(list_filter(a.nbrs,
                                nb -> list_contains(nodes, nb)))
                            >= {KCORE_K}),
                   a -> a.node)),
               nodes,
               al
        FROM peel
        WHERE it < {KCORE_MAX_ITERS} AND (prev IS NULL OR nodes <> prev)
    ),
    core AS (SELECT nodes FROM peel ORDER BY it DESC LIMIT 1)
    SELECT a.node AS doc_id,
           CAST(len(list_filter(a.nbrs,
                nb -> list_contains(c.nodes, nb))) AS BIGINT)
               AS core_degree
    FROM adjl a, core c
    WHERE list_contains(c.nodes, a.node)
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE of the exact near-dup graph (K=3): iteratively
    peel nodes with fewer than K surviving neighbors until fixpoint —
    the densest-region extractor that separates REAL duplicate
    clusters from chains of borderline matches (a doc in the 3-core
    has 3+ mutually-surviving near-dups; bridges and tails peel
    away). Emits each core member with its within-core degree.

    The k-core is UNIQUE (peeling is confluent), so the driver-side
    Spark loop and the DuckDB recursive CTE converge to the identical
    set regardless of iteration schedule — integers end to end, no
    float anywhere. Scale shape: each peel round is one broadcast
    semi-join of the shrinking node set against the edge list + one
    degree aggregate (the PageRank/label-propagation iteration
    pattern); rounds are bounded (64) and real dedup
    graphs peel in a handful because cliques stabilize immediately.
    """
    # r13 opt (class compression, the cc_labels/pagerank discipline):
    # identical-token-set classes have uniform adjacency, so all
    # members of a class carry the SAME degree every round and peel
    # together — peeling factors exactly through the class graph:
    #   deg(x in X) = (s_X - 1) + Σ_{Y~X, Y alive} s_Y
    # Each peel round runs over class-count-sized frames; the doc
    # pair list (the one super-linear frame) is touched exactly once.
    # r14: class edges come straight from class_pair_frames' class-
    # level candidate join — the doc pair frame is never built (r13
    # still paid one full doc-pair tagging pass here)
    cpairs, classes, cmap, _docsets = class_pair_frames(spark, sf_dir)
    sizes = classes
    ce = cpairs.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
    und = (
        ce.union(ce.select(F.col("y").alias("x"), F.col("x").alias("y")))
        .localCheckpoint(eager=False)
    )
    # initial alive set = the pair graph's classes (doc degree >= 1):
    # internal-clique classes (s >= 2) plus classes with any class
    # edge — membership expressed directly via a distinct edge-
    # endpoint marker, not a degree count whose value is unused
    verts = und.select(F.col("x").alias("ck")).distinct()
    alive = (
        sizes.join(verts.withColumn("_e", F.lit(1)), "ck", "left")
        .filter((F.col("s") >= 2) | F.col("_e").isNotNull())
        .select("ck", "s")
        .localCheckpoint(eager=False)
    )
    n_prev = alive.count()

    # live-neighbor size sum: join und against the ALIVE frame itself
    # (it carries s), so no separate sizes subtree — and therefore no
    # second Exchange — appears in the consuming plans
    def _ext_of(alive_df: DataFrame) -> DataFrame:
        return (
            und.join(
                F.broadcast(
                    alive_df.select(
                        F.col("ck").alias("y2"), F.col("s").alias("sy")
                    )
                ),
                F.col("y") == F.col("y2"),
            )
            .groupBy(F.col("x").alias("ck"))
            .agg(F.sum("sy").alias("ext"))
        )

    for _ in range(KCORE_MAX_ITERS):
        ext = _ext_of(alive)
        keep = (
            alive.join(F.broadcast(ext), "ck", "left")
            .filter(
                F.col("s") - 1 + F.coalesce("ext", F.lit(0)) >= KCORE_K
            )
            .select("ck", "s")
            .localCheckpoint(eager=False)
        )
        n_new = keep.count()
        alive = keep
        if n_new == n_prev:
            break
        n_prev = n_new
    # within-core degree per doc: uniform per class by construction
    ext_core = _ext_of(alive)
    deg = alive.join(F.broadcast(ext_core), "ck", "left").select(
        "ck",
        (F.col("s") - 1 + F.coalesce("ext", F.lit(0)))
        .cast("bigint")
        .alias("core_degree"),
    )
    # deg is (core-class-count)-sized — broadcast keeps the expansion
    # join exchange-free (the shuffle budget pins this plan at <=1)
    return cmap.join(F.broadcast(deg), "ck").select(
        "doc_id", "core_degree"
    )


# --------------------------------------------------- token drift (TV)


TOKEN_DRIFT_ORACLE = f"""
WITH toks AS (
    SELECT doc_id % 2 AS half,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
    FROM documents
), counts AS (
    SELECT term,
           SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c_a,
           SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c_b
    FROM toks GROUP BY term
), totals AS (
    SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM counts
), scored AS (
    SELECT term, c_a, c_b, n_a, n_b,
           abs(c_a * n_b - c_b * n_a) AS delta_num
    FROM counts, totals
), tv AS (
    SELECT SUM(delta_num) AS tv_num, ANY_VALUE(n_a) AS n_a,
           ANY_VALUE(n_b) AS n_b
    FROM scored
)
SELECT s.term,
       CAST(s.c_a AS BIGINT) AS n_a, CAST(s.c_b AS BIGINT) AS n_b,
       ROUND(CAST(s.c_a AS DOUBLE) / s.n_a
             - CAST(s.c_b AS DOUBLE) / s.n_b, 6) AS share_delta,
       ROUND(CAST(t.tv_num AS DOUBLE) / (2.0 * t.n_a * t.n_b), 6)
           AS tv_distance
FROM scored s, tv t
ORDER BY s.delta_num DESC, s.term LIMIT 15
"""


@register("token_drift_tv", extra=True, oracle=TOKEN_DRIFT_ORACLE)
def token_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-DISTRIBUTION DRIFT by exact total-variation distance —
    the token-level member of the drift triad (zx_ks_drift_test
    watches scalar values, zx_embedding_drift_mmd watches the
    representation space; this watches the vocabulary): split the
    corpus into two snapshots (doc_id parity — the deterministic
    stand-in for consecutive crawls), compare unigram distributions,
    report TV = 1/2 * sum_t |p_t - q_t| plus the 15 largest movers.

    Exactness: TV's float sum over the vocabulary is an ORDER TRAP
    (1e5 addends in shuffle order), so the sum runs on the integer
    |c_a*N_b - c_b*N_a| — cross-multiplied counts, order-free — and
    divides by 2*N_a*N_b ONCE at the end; per-term share deltas are
    two exact divisions and one subtraction, rounded at 6 d.p.

    Scale: the canonical word-count shape — one narrow explode, ONE
    token-key shuffle (partial counts combine map-side), a 1-row
    totals aggregate broadcast back, TakeOrdered for the movers. The
    vocabulary is the only shuffled axis; 100 TB of text with a 10M-
    term vocab moves 10M rows, not the corpus."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(tokens_col()).alias("term"),
    )
    # three consumers (totals, movers, TV fold) — checkpoint so the
    # explode + token shuffle run ONCE, not per consumer
    counts = (
        toks.groupBy("term")
        .agg(
            F.sum((F.col("half") == 0).cast("bigint")).alias("c_a"),
            F.sum((F.col("half") == 1).cast("bigint")).alias("c_b"),
        )
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    scored = counts.join(F.broadcast(totals)).withColumn(
        "delta_num",
        F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a")),
    )
    tv = scored.agg(
        F.sum("delta_num").alias("tv_num"),
        F.any_value("n_a").alias("t_n_a"),
        F.any_value("n_b").alias("t_n_b"),
    )
    return (
        scored.join(F.broadcast(tv))
        .orderBy(F.col("delta_num").desc(), "term")
        .limit(15)
        .select(
            "term",
            F.col("c_a").cast("bigint").alias("n_a"),
            F.col("c_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("c_a").cast("double") / F.col("n_a")
                - F.col("c_b").cast("double") / F.col("n_b"),
                6,
            ).alias("share_delta"),
            F.round(
                F.col("tv_num").cast("double")
                / (2.0 * F.col("t_n_a") * F.col("t_n_b")),
                6,
            ).alias("tv_distance"),
        )
    )


# --------------------------------------------------- graph modularity


MODULARITY_ORACLE = f"""
-- CLASS-COMPRESSED twin (r9 verdict #4): Jaccard is a function of
-- the token-SET pair, so the doc pair graph is a blow-up of the
-- identical-token-set CLASS graph. Compressing first shrinks the
-- recursion from doc-level label propagation (reach rows ~ sum of
-- component sizes squared — past the DuckDB spill budget at sf0.1)
-- to the ~4k-node class graph, and every cluster aggregate has a
-- closed integer form over class sizes: within-class edges
-- s*(s-1)/2, cross-class edges s_i*s_j, degree_sum = 2*m_c (all
-- pair-graph edges are intra-cluster by definition of components).
-- MATERIALIZED hints keep the non-recursive CTEs from re-evaluating
-- once per recursion step (measured 35.4 s -> 9.1 s at sf0.1).
WITH RECURSIVE tok AS MATERIALIZED (
    SELECT DISTINCT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
    FROM documents
),
sig AS MATERIALIZED (
    SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY doc_id
),
cls AS MATERIALIZED (
    SELECT MIN(doc_id) AS cls_id, CAST(COUNT(*) AS BIGINT) AS s,
           ANY_VALUE(ts) AS ts
    FROM sig GROUP BY ts
),
ctok AS MATERIALIZED (
    SELECT cls_id, len(ts) AS sz, unnest(ts) AS term FROM cls
),
cedges AS MATERIALIZED (
    SELECT ca, cb FROM (
        SELECT a.cls_id AS ca, b.cls_id AS cb, COUNT(*) AS common,
               ANY_VALUE(a.sz) AS sa, ANY_VALUE(b.sz) AS sb
        FROM ctok a JOIN ctok b
          ON a.term = b.term AND a.cls_id < b.cls_id
        GROUP BY 1, 2
    ) WHERE common * 1.0 / (sa + sb - common) >= {JACCARD_T}
),
sym AS MATERIALIZED (
    SELECT ca AS src, cb AS dst FROM cedges
    UNION ALL SELECT cb, ca FROM cedges
),
reach(node, lab) AS (
    SELECT cls_id AS node, cls_id AS lab FROM cls
    UNION
    SELECT e.dst AS node, r.lab FROM reach r JOIN sym e ON e.src = r.node
),
comp AS MATERIALIZED (
    SELECT node AS cls_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
),
within AS MATERIALIZED (
    SELECT c.cluster_id, SUM(k.s * (k.s - 1) // 2) AS e_within,
           SUM(k.s) AS n_docs
    FROM cls k JOIN comp c USING (cls_id) GROUP BY 1
),
cross_e AS MATERIALIZED (
    SELECT c.cluster_id, SUM(ka.s * kb.s) AS e_cross
    FROM cedges e
    JOIN cls ka ON ka.cls_id = e.ca
    JOIN cls kb ON kb.cls_id = e.cb
    JOIN comp c ON c.cls_id = e.ca
    GROUP BY 1
),
percomp AS MATERIALIZED (
    -- clusters with zero edges (a size-1 class with no neighbor)
    -- have no pair-graph endpoints and are excluded, matching the
    -- engine's degs-driven cluster set
    SELECT w.cluster_id, CAST(w.n_docs AS BIGINT) AS n_nodes,
           CAST(w.e_within + COALESCE(x.e_cross, 0) AS BIGINT) AS m_c
    FROM within w LEFT JOIN cross_e x USING (cluster_id)
    WHERE w.e_within + COALESCE(x.e_cross, 0) > 0
),
m AS MATERIALIZED (SELECT CAST(SUM(m_c) AS BIGINT) AS m FROM percomp),
contrib AS MATERIALIZED (
    SELECT p.cluster_id, p.n_nodes, p.m_c AS internal_edges,
           2 * p.m_c AS degree_sum,
           4 * m.m * p.m_c - (2 * p.m_c) * (2 * p.m_c)
               AS contribution_x4m2
    FROM percomp p CROSS JOIN m
)
SELECT c.cluster_id, c.n_nodes, c.internal_edges, c.degree_sum,
       c.contribution_x4m2,
       ROUND(CAST((SELECT SUM(contribution_x4m2) FROM contrib)
                  AS DOUBLE)
             / CAST(4 * m.m * m.m AS DOUBLE), 6) AS modularity_q
FROM contrib c CROSS JOIN m
"""

@register("graph_modularity", extra=True, oracle=MODULARITY_ORACLE)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODULARITY of the near-dup partition — the graph-quality gate
    on dedup clustering (Newman Q): how much denser are the clusters
    than a degree-preserving random graph? Q near 0 means the
    'clusters' are an artifact; high Q certifies the pair threshold
    carved real communities. Completes the graph family's audit arc:
    degree distribution (skew), triangles (density), k-core
    (robustness), modularity (partition quality).

    Exactness: Q's textbook form is a float sum of per-cluster
    fractions — an order trap. Scaled by 4m^2 it is PURE INTEGERS:
    contribution = 4*m*m_c - d_c^2 per cluster, one division at the
    end. Nodes = pair-graph endpoints (every node has degree >= 1,
    so d_c > 0 and the empty-token ambiguity never enters).

    Scale: r14 — the whole computation factors through the CLASS
    graph, so no doc-level (let alone pair-level) frame is ever built.
    Every dedup_near edge joins two docs of the SAME component, hence
    per cluster: internal_edges = all of the cluster's pairs
    m_c = Σ_{class edges in L} s_a·s_b + Σ_{classes in L} C(s,2),
    degree_sum = 2·m_c, n_nodes = Σ_{classes in L} s (every class in
    an edge-bearing cluster is an endpoint class), m = Σ_L m_c — all
    integer algebra over class-count-sized frames. Clusters without
    any edge (s=1 singleton classes, empty-token docs) never appear,
    exactly as in the doc-level formulation where they have no pair
    row to count. Guide §1.1 (the ideal plan touches only the class
    graph)."""
    cpairs, classes, _cmap, _docsets = class_pair_frames(spark, sf_dir)
    clabels = cc_class_labels(cpairs, classes).localCheckpoint(
        eager=False
    )
    # cross-class pair weights per cluster: s_a·s_b per class edge
    # (ca's label == cb's label at the CC fixpoint by definition)
    sz_a = classes.select(F.col("ck").alias("ca"), F.col("s").alias("sa"))
    sz_b = classes.select(F.col("ck").alias("cb"), F.col("s").alias("sb"))
    lab_a = clabels.select(F.col("ck").alias("ca"), "lab")
    ew = (
        cpairs.select("ca", "cb")
        .join(F.broadcast(sz_a), "ca")
        .join(F.broadcast(sz_b), "cb")
        .join(F.broadcast(lab_a), "ca")
        .groupBy("lab")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("xw"))
    )
    # within-class cliques + node counts per cluster
    iw = (
        classes.join(clabels, "ck")
        .groupBy("lab")
        .agg(
            F.sum(F.expr("s * (s - 1) div 2")).alias("inw"),
            F.sum("s").alias("nn"),
        )
    )
    percl = (
        iw.join(ew, "lab", "left")
        .select(
            F.col("lab").alias("cluster_id"),
            F.col("nn").cast("bigint").alias("n_nodes"),
            (F.coalesce("xw", F.lit(0)) + F.col("inw"))
            .cast("bigint")
            .alias("internal_edges"),
        )
        .filter(F.col("internal_edges") >= 1)
    )
    # m rides in-plan as a 1-row broadcast (no dedicated count action)
    m1 = percl.agg(F.sum("internal_edges").cast("bigint").alias("m"))
    contrib = (
        percl.join(F.broadcast(m1))
        .select(
            "cluster_id",
            "n_nodes",
            "internal_edges",
            (2 * F.col("internal_edges"))
            .cast("bigint")
            .alias("degree_sum"),
            (
                4 * F.col("m") * F.col("internal_edges")
                - (2 * F.col("internal_edges"))
                * (2 * F.col("internal_edges"))
            )
            .cast("bigint")
            .alias("contribution_x4m2"),
            "m",
        )
        .localCheckpoint(eager=False)
    )
    total = contrib.agg(
        F.sum("contribution_x4m2").alias("tot"),
        F.any_value("m").alias("m"),
    ).select(
        F.round(
            F.col("tot").cast("double")
            / (4 * F.col("m") * F.col("m")).cast("double"),
            6,
        ).alias("modularity_q")
    )
    return contrib.drop("m").join(F.broadcast(total))
