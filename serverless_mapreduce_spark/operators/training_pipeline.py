"""End-to-end training-data curation pipeline: the composition query that
shows the extension operators working *together* the way a 100 TB corpus run
would chain them (quality gate → exact dedup → enriched output).

Stage shapes (and why the composition scales):
1. quality gate — per-row expressions, narrow, prunes early so everything
   downstream sees less data (the cheap-filter-first rule of data curation);
2. exact dedup — one shuffle keyed by the md5 content digest (skew-free);
   keeps the minimum doc_id per content group;
3. enrichment — per-row token stats + fingerprint on the survivors only.

One shuffle total (the dedup groupBy/join); all other stages fuse into the
scans under WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.registry import query

MIN_TOKENS = 20
MAX_TOKENS = 1000

_SQL_TOKS = "list_filter(string_split(lower(text), ' '), w -> w <> '')"
_SQL_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"


@query(
    "training_data_pipeline",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, lang, text,
             len({_SQL_TOKS}) AS n_tokens,
             md5({_SQL_NORM}) AS content_key
      FROM documents
      WHERE len({_SQL_TOKS}) BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
    ), keepers AS (
      SELECT content_key, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      FROM gated GROUP BY 1
    )
    SELECT g.doc_id, g.lang, g.n_tokens, g.content_key, k.n_copies,
           length(g.text) AS n_chars
    FROM gated g JOIN keepers k
      ON g.content_key = k.content_key AND g.doc_id = k.keeper_id
    """,
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality gate → exact dedup (keep min doc_id) → enriched survivors.
    The gate runs before the dedup shuffle so only passing docs are hashed
    and shuffled; the keeper join is on the digest both sides (broadcast at
    small N, shuffle-on-key at scale — either way skew-free)."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    gated = (
        table(spark, sf_dir, "documents")
        .withColumn("n_tokens", F.size(toks))
        .filter(F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.md5(norm).alias("content_key"),
            F.length("text").alias("n_chars"),
        )
    )
    keepers = gated.groupBy("content_key").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies")
    )
    g, k = gated.alias("g"), keepers.alias("k")
    return g.join(
        k,
        (F.col("g.content_key") == F.col("k.content_key"))
        & (F.col("g.doc_id") == F.col("k.keeper_id")),
    ).select(
        "g.doc_id",
        "g.lang",
        "g.n_tokens",
        F.col("g.content_key").alias("content_key"),
        "k.n_copies",
        "g.n_chars",
    )
