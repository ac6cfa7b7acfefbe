"""Deduplication operators over ``documents`` / ``embeddings`` — the
training-data-pipeline extension family (no reference analog; mandated by
BASELINE.json's north star).

Five schemes, all expressed with built-in column expressions (higher-order
array functions, md5, explode/join) — no Python UDFs, so everything stays
JVM-side and distributes:

- exact: hash-groupBy on normalized content. One shuffle on the md5 key.
- minhash_lsh: shingle → K minhashes → B bands → band-bucket self-join →
  exact Jaccard verify on candidates. The self-join is on (band, band_hash),
  i.e. only colliding docs meet — the standard sub-quadratic near-dup plan
  at 100 TB. Minhash uses *double hashing*: one md5 per shingle split into
  two 32-bit ints (h1, h2), hash_j = (h1 + j·h2) mod P, sig[j] = min — both
  engines derive (h1, h2) from the same md5 hex, which is what makes the
  oracle hash-match.
- ngram_jaccard: exact Jaccard via a shingle inverted index (explode →
  join on shingle → count shared / union) — no N² pair enumeration.
- simhash: 16-bit sign-of-sum fingerprint from per-token md5 bits.
- embedding_cosine_pairs: exact all-pairs cosine *verifier helper* (not a
  registered query); the registered scale path is
  similarity.dedup_embedding_lsh (bucket first, verify inside buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.registry import query

SHINGLE_W = 3          # words per shingle
NUM_HASHES = 16        # minhash signature length
NUM_BANDS = 8          # LSH bands (rows per band = 16/8 = 2)
JACCARD_THRESH = 0.18  # near-dup cutoff (tuned to the synthetic corpus)
COSINE_THRESH = 0.35   # embedding near-dup cutoff (max pair cos on the corpus ≈ 0.51)
MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def _norm(col: str = "text") -> Column:
    return F.regexp_replace(F.lower(F.col(col)), r"\s+", " ")


def _tokens(col: str = "text") -> Column:
    return F.filter(F.split(F.lower(F.col(col)), " "), lambda w: w != "")


def shingle_rows(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, s): one row per W-word shingle occurrence, built entirely
    from codegen-able scalar/window ops — ``posexplode(split(...))`` then
    window ``lead`` for token adjacency. A doc shorter than W words
    contributes its whole (normalized) text as one shingle; ``concat_ws``
    skipping NULL leads yields exactly that on the doc's first token row.

    Why long format and no array column: the obvious
    ``transform(sequence(...), i -> ...)`` array formulation is a
    HigherOrderFunction — *interpreted*, never codegen — and exploding such
    an array makes Generate re-evaluate the interpreted expression per
    output row (measured 6.4s vs 0.26s over materialized arrays at sf0.1).
    Here every expression is JVM-codegen'd and evaluated once.

    Scale shape: hash-repartition by doc_id up front (a no-op on real
    multi-row-group inputs, see ensure_parallelism) — the windows and every
    downstream per-doc aggregation then reuse that one exchange."""
    from pyspark.sql import Window

    from serverless_mapreduce_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(docs.sparkSession, docs, "doc_id")
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.lower(F.col(col)), " ")).alias("pos", "w")
    ).filter(F.col("w") != "")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    wc = Window.partitionBy("doc_id")
    x = tok.select(
        "doc_id",
        F.concat_ws(
            " ", "w", F.lead("w", 1).over(wd), F.lead("w", 2).over(wd)
        ).alias("s"),
        F.lead("w", SHINGLE_W - 1).over(wd).isNotNull().alias("is_full"),
        F.row_number().over(wd).alias("rn"),
        F.count("*").over(wc).alias("n_tok"),
    )
    return x.filter(
        F.col("is_full") | ((F.col("rn") == 1) & (F.col("n_tok") < SHINGLE_W))
    ).select("doc_id", "s")


# SQL twins of the helpers above (DuckDB dialect).
_SQL_TOKS = "list_filter(string_split(lower(text), ' '), w -> w <> '')"
_SQL_SHINGLES = f"""
  CASE WHEN len({_SQL_TOKS}) >= {SHINGLE_W}
       THEN list_distinct(list_transform(range(1, len({_SQL_TOKS}) - {SHINGLE_W - 2}),
              i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1] || ' ' || {_SQL_TOKS}[i+2]))
       ELSE [array_to_string({_SQL_TOKS}, ' ')]
  END
"""


# --- exact dedup ---------------------------------------------------------------

@query(
    "dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_key,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized content, keep min doc_id.
    At scale: one shuffle keyed by a 128-bit digest — uniformly distributed,
    skew-free by construction."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5(_norm()).alias("content_key"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


# --- MinHash + LSH near-dedup ----------------------------------------------------

def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles, sig[NUM_HASHES]) — double hashing: one md5 per
    shingle split into two 32-bit ints (h1, h2); hash_j = (h1 + j·h2) mod P.
    sig[j] = min over shingles.

    Physical shape: long-format shingle rows (see shingle_rows — no arrays,
    no interpreted HOFs anywhere in this pipeline), hash each shingle once
    with plain scalar expressions, then one hash aggregation per doc
    computing the NUM_HASHES mins (plus collect_set to carry the distinct
    shingle set for the verify stage; duplicate shingle occurrences don't
    change a min). The groupBy shuffles on doc_id — high-cardinality,
    skew-free — and reuses shingle_rows' existing doc_id partitioning."""
    base = shingle_rows(docs)
    hexint = lambda pos: F.conv(F.substring(F.md5("s"), pos, 8), 16, 10).cast("long")  # noqa: E731
    hashed = base.select("doc_id", "s", hexint(1).alias("h1"), hexint(9).alias("h2"))
    mins = [
        F.min((F.col("h1") + j * F.col("h2")) % MINHASH_PRIME).alias(f"m{j}")
        for j in range(NUM_HASHES)
    ]
    agg = hashed.groupBy("doc_id").agg(F.collect_set("s").alias("shingles"), *mins)
    return agg.select(
        "doc_id", "shingles", F.array(*[f"m{j}" for j in range(NUM_HASHES)]).alias("sig")
    )


_SQL_SIG = f"""
  list_transform(range(0, {NUM_HASHES}),
    j -> list_min(list_transform(range(1, len({{sh}}) + 1),
           i -> (CAST('0x' || substr(md5({{sh}}[i]), 1, 8) AS BIGINT)
                 + j * CAST('0x' || substr(md5({{sh}}[i]), 9, 8) AS BIGINT))
                % {MINHASH_PRIME})))
"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM documents
    ), sigs AS (
      SELECT doc_id, shingles,
             {_SQL_SIG.format(sh='shingles')} AS sig
      FROM base
    ), bands AS (
      SELECT doc_id, b.band_idx,
             md5(CAST(sig[b.band_idx * 2 + 1] AS VARCHAR) || ','
                 || CAST(sig[b.band_idx * 2 + 2] AS VARCHAR)) AS band_hash
      FROM sigs, (SELECT unnest(range(0, {NUM_BANDS})) AS band_idx) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.doc_a
    JOIN sigs sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= {JACCARD_THRESH}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dedup: only documents agreeing on a whole band meet
    in the self-join (shuffle keyed by (band_idx, band_hash)), then exact
    Jaccard verifies candidates. Sub-quadratic: cost ∝ docs·bands +
    collisions, never N²."""
    docs = table(spark, sf_dir, "documents")
    # Materialize signatures once: the plan references them three times
    # (bands, both verify sides), and Catalyst's CollapseProject would
    # otherwise inline the whole shingle+minhash expression into every
    # downstream row (~16× recompute — measured 31.5s → 3.6s at sf0.1).
    # At 100 TB this persist is a written signature table.
    sigs = minhash_signatures(docs).persist()

    bands = sigs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(NUM_BANDS - 1))).alias("band_idx"),
        F.col("sig"),
    ).select(
        "doc_id",
        "band_idx",
        F.md5(
            F.concat(
                F.element_at("sig", F.col("band_idx") * 2 + 1).cast("string"),
                F.lit(","),
                F.element_at("sig", F.col("band_idx") * 2 + 2).cast("string"),
            )
        ).alias("band_hash"),
    )

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sh = sigs.select("doc_id", "shingles")
    jac = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn(
            "jaccard_raw",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_distinct(F.concat("sh_a", "sh_b"))),
        )
    )
    return (
        jac.filter(F.col("jaccard_raw") >= JACCARD_THRESH)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


# --- exact n-gram Jaccard via inverted index -------------------------------------

@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
    ), inv AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM base
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared), 6) AS jaccard
    FROM shared
    WHERE CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) >= {JACCARD_THRESH}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing ≥1 shingle, via an
    inverted index: explode shingles → self-join on the shingle → shared
    count; |A∪B| = |A|+|B|-shared. The join shuffles on the shingle (high
    cardinality → well distributed); hot shingles are the skew risk at
    scale — AQE skew-join splits them (a stopword-shingle filter would be
    the preprocessing answer)."""
    from pyspark.sql import Window

    rows = shingle_rows(table(spark, sf_dir, "documents"))
    # Occurrences → distinct (doc, shingle) pairs, then the per-doc distinct
    # count as an unordered window. Both reuse shingle_rows' doc_id
    # partitioning (hashpartitioning(doc_id) satisfies clustering on
    # (doc_id, s)), so neither adds an exchange. Persisted because the index
    # feeds both sides of the self-join.
    inv = (
        rows.dropDuplicates(["doc_id", "s"])
        .select(
            "doc_id",
            F.col("s").alias("shingle"),
            F.count("*").over(Window.partitionBy("doc_id")).alias("n_sh"),
        )
        .persist()
    )
    a, b = inv.alias("a"), inv.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        shared.filter(jac >= JACCARD_THRESH)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- SimHash fingerprint ----------------------------------------------------------

SIMHASH_BITS = 16


@query(
    "simhash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_SQL_TOKS}) AS toks FROM documents
    )
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT), range(0, {SIMHASH_BITS})),
             (acc, i) -> acc + CASE WHEN
                 list_reduce(list_prepend(0,
                   list_transform(toks,
                     t -> CASE WHEN contains('89abcdef', substr(md5(t), CAST(i AS INT) + 1, 1))
                               THEN 1 ELSE -1 END)),
                   (x, y) -> x + y) > 0
               THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END
           ) AS BIGINT) AS simhash
    FROM t
    """,
)
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: bit i is the sign of Σ_tokens (±1 by bit i of the
    token's md5 — here the top bit of hex digit i). Near-dups then differ in
    ≤ d bits; pairing by hamming distance buckets on the fingerprint is a
    follow-up join keyed by simhash bands. The md5 is computed once per
    token in a separate projection step (round 1 re-hashed every token at
    every one of the 16 bit positions), then the per-bit majority votes are
    integer folds over the cached hex strings — one narrow pass."""
    hashed = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(F.array_distinct(_tokens()), lambda t: F.md5(t)).alias("tmd5"),
    )
    # For each bit position i, a majority vote over tokens, then set bit i.
    sim = F.aggregate(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.aggregate(
                F.col("tmd5"),
                F.lit(0),
                lambda a, h: a
                + F.when(
                    F.lit("89abcdef").contains(F.substring(h, i + 1, 1)), 1
                ).otherwise(-1),
            )
            > 0,
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return hashed.select("doc_id", sim.alias("simhash"))


# --- embedding cosine near-dup ------------------------------------------------------

def _cosine_sql(a: str, b: str) -> str:
    """DuckDB cosine between two list<float> columns, computed with explicit
    double casts + sequential folds so it matches Spark bit-for-bit after
    ROUND(…, 6)."""
    dot = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
    )
    na = (
        f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (x, y) -> x + y))"
    )
    nb = (
        f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (x, y) -> x + y))"
    )
    return f"({dot} / ({na} * {nb}))"


def vec_dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns in double math."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def vec_norm(a: Column) -> Column:
    """L2 norm of an array<float> column in double math — precompute this
    per *vector* (N evaluations) so the per-*pair* verify computes only the
    dot: the aggregate/zip_with folds are interpreted HOFs, and cosine
    evaluates three of them; hoisting the two norms cuts the per-pair
    interpreter work ~3x with bit-identical results (same fold, same
    operation order)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    return F.sqrt(
        F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> columns (double math)."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine ≥ τ — the exact O(N²) *verifier*, intentionally
    NOT a registered query: its inequality-only join condition plans as a
    BroadcastNestedLoopJoin, fine as ground truth on a sample but never the
    shipped dedup path. The registered plan is ``dedup_embedding_lsh``
    (similarity.py): LSH-bucket first, then run exactly this verify inside
    buckets."""
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cs = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        pairs.withColumn("cos_raw", cs)
        .filter(F.col("cos_raw") >= COSINE_THRESH)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )
