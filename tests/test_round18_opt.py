"""Round-18 OPTIMIZATION pins: the batched closure-UDF nearest-centroid
assignment (`functions.vector.nearest_centroid_udf`, wired through
`similarity._centroid_assigner`) must be BITWISE-identical to the
broadcast-join + ``max(struct(c_cos, -c_id))`` aggregate it replaces —
same chosen centroid on exact cosine ties (lowest c_id), same raw
c_cos double bits (the downstream 6-decimal rounding must never be the
thing hiding a numeric drift).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from serverless_mapreduce_spark.functions.vector import cosine
from serverless_mapreduce_spark.operators.similarity import _centroid_assigner


def _fixture(spark):
    """Embeddings with exact-tie bait: vectors 100/101 are scalar
    multiples of centroid directions so several centroids score
    bit-equal cosines and the tie-break is actually exercised."""
    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(8).astype(np.float32)])
        for i in range(40)
    ]
    # centroid ids 0, 10, 20, 30 (mod 10); make two centroids IDENTICAL
    # directions so every vector ties on them bitwise
    base = [float(x) for x in rng.randn(8).astype(np.float32)]
    rows[20] = (20, base)
    rows[30] = (30, [x * 2.0 for x in base])  # same direction, scaled
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    cent = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    return emb, cent


def _old_assign(emb, cent):
    """The replaced r17 shape, verbatim."""
    return (
        emb.join(F.broadcast(cent))
        .withColumn("c_cos", cosine(F.col("embedding"), F.col("c_emb")))
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("c_cos"), (-F.col("c_id")).alias("nid"), F.col("c_id")
                )
            ).alias("b"),
            F.first("embedding").alias("embedding"),
        )
        .select(
            "vec_id",
            F.col("b.c_id").alias("centroid"),
            F.col("b.c_cos").alias("c_cos"),
        )
    )


def test_batched_assign_bitwise_matches_join_aggregate(spark):
    emb, cent = _fixture(spark)
    old = (
        _old_assign(emb, cent)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    new = (
        _centroid_assigner(cent)(emb)
        .select("vec_id", "centroid", "c_cos")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (old["vec_id"].values == new["vec_id"].values).all()
    assert (old["centroid"].values == new["centroid"].values).all()
    # raw double BITS, not approx: the rounding contract downstream is
    # 6 decimals, but the assignment argmax consumes the raw value
    assert (
        old["c_cos"].values.view(np.int64)
        == new["c_cos"].values.view(np.int64)
    ).all()
    # the tie bait really tied: vectors on the shared direction must
    # pick the LOWER centroid id (20, not 30)
    tied = new.loc[new["vec_id"].isin([20, 30]), "centroid"]
    assert (tied == 20).all()


def test_batched_assign_keep_columns_ride(spark):
    emb, cent = _fixture(spark)
    emb_l = emb.withColumn("label", (F.col("vec_id") % 3).cast("bigint"))
    out = _centroid_assigner(cent)(emb_l, keep=("label",))
    assert out.columns == ["vec_id", "embedding", "label", "centroid", "c_cos"]
    got = out.select("vec_id", "label").toPandas()
    assert (got["label"].values == got["vec_id"].values % 3).all()


def test_batched_assign_empty_codebook_yields_no_rows(spark):
    emb, cent = _fixture(spark)
    out = _centroid_assigner(cent.filter(F.lit(False)))(emb)
    assert out.count() == 0
    assert out.columns == ["vec_id", "embedding", "centroid", "c_cos"]


def test_jaccard_inclusion_exclusion_bitwise(spark):
    """_jaccard_sets (|A∩B| / (|A|+|B|−|A∩B|)) must be bit-identical to
    the replaced size(array_distinct(concat(...)))-denominator form on
    DISTINCT-element arrays — including empty-vs-empty (NaN both ways)
    and disjoint sets (0.0)."""
    import numpy as np

    from serverless_mapreduce_spark.operators.dedup import _jaccard_sets

    rows = [
        (["a", "b", "c"], ["b", "c", "d"]),
        (["a"], ["a"]),
        (["a", "b"], ["c", "d"]),  # disjoint -> 0.0
        (["x"], []),  # one empty -> 0.0
        (["a b", "b c", "c d"], ["b c"]),
        ([f"s{i}" for i in range(200)], [f"s{i}" for i in range(100, 350)]),
    ]
    df = spark.createDataFrame(
        rows, "sh_a ARRAY<STRING>, sh_b ARRAY<STRING>"
    )
    out = df.select(
        (
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
        ).alias("old"),
        _jaccard_sets("sh_a", "sh_b").alias("new"),
    ).toPandas()
    a = out["old"].values.view(np.int64)
    b = out["new"].values.view(np.int64)
    assert (a == b).all(), out
