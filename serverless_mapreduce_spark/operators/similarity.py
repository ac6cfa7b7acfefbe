"""Similarity search over the ``embeddings`` table (array<float> column).

Two plans for top-k cosine neighbors:
- ``ann_topk_bruteforce``: broadcast the (small) query set against every
  vector, score, per-query top-k via a window. Exact; scales linearly in the
  corpus (the broadcast keeps the big side shuffle-free — the scan is the
  only pass over the 100 TB table).
- ``ann_lsh_topk``: random-hyperplane LSH — deterministic ±1 hyperplanes
  derived from md5 parity, P sign bits → bucket id; candidates = same-bucket
  vectors only, then exact cosine top-k inside the bucket. Approximate, and
  the 100 TB path: the corpus is bucketed once (could be written
  partitioned-by-bucket), queries probe one bucket each.

Everything is built-in expressions (zip_with/aggregate folds) so scoring is
JVM-side; cosine math matches dedup.cosine (see there for the determinism
contract with the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from serverless_mapreduce_spark.catalog import table
from serverless_mapreduce_spark.operators.dedup import _cosine_sql, cosine
from serverless_mapreduce_spark.registry import query

TOP_K = 5
QUERY_MOD = 100  # vec_id % QUERY_MOD == 0 → query vector
LSH_PLANES = 8


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {QUERY_MOD} = 0
    ), scored AS (
      SELECT q.q_id, e.vec_id,
             ROUND({_cosine_sql('q.q_emb', 'e.embedding')}, 6) AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cos_sim,
           rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector. The query set is
    tiny → Catalyst broadcasts it (no shuffle of the corpus); ranking
    windows over q_id partitions are small (corpus rows per query only after
    local top-k pushdown via WindowGroupLimit in Spark 3.5+)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )


def lsh_bucket(emb: Column) -> Column:
    """P-bit random-hyperplane signature: plane p has deterministic ±1
    weights w(p,d) = +1 iff hex digit d of md5('p:<p>:<d>') has its top bit
    set; bit p = sign(Σ_d emb[d]·w(p,d)). Same expression is reproduced in
    the oracle SQL, so bucket ids match across engines exactly (sign of a
    sum only flips within ~1e-13 of 0 — not observed on this data)."""
    dims = F.sequence(F.lit(1), F.size(emb))
    proj = lambda p: F.aggregate(  # noqa: E731
        F.zip_with(
            emb,
            dims,
            lambda x, d: x.cast("double")
            * F.when(
                F.lit("89abcdef").contains(
                    F.substring(
                        F.md5(F.concat(F.lit("p:"), p.cast("string"), F.lit(":"), d.cast("string"))),
                        1,
                        1,
                    )
                ),
                1.0,
            ).otherwise(-1.0),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(LSH_PLANES - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(proj(p) > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )


_SQL_PROJ = """
  list_reduce(list_prepend(CAST(0 AS DOUBLE),
    list_transform(range(1, len({e}) + 1),
      d -> CAST({e}[d] AS DOUBLE) *
           CASE WHEN contains('89abcdef',
                  substr(md5('p:' || CAST({p} AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1))
                THEN 1.0 ELSE -1.0 END)),
    (x, y) -> x + y)
"""

_SQL_BUCKET = f"""
  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, {LSH_PLANES})),
    (acc, p) -> acc + CASE WHEN {_SQL_PROJ.format(e='embedding', p='p')} > 0
                           THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT)
"""


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM bucketed
      WHERE vec_id % {QUERY_MOD} = 0
    ), scored AS (
      SELECT q.q_id, e.vec_id,
             ROUND({_cosine_sql('q.q_emb', 'e.embedding')}, 6) AS cos_sim
      FROM q JOIN bucketed e ON e.bucket = q.bucket AND e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cos_sim, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket vectors. The join key
    is the bucket id → the corpus shuffles once on bucket (or is stored
    pre-bucketed), each query touches ~N/2^P vectors instead of N."""
    emb = table(spark, sf_dir, "embeddings").withColumn("bucket", lsh_bucket(F.col("embedding")))
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("bucket") == F.col("q_bucket"), "inner")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )
