"""Vectorized vector math over ``array<float>`` columns.

The interpreted alternative — ``F.aggregate(F.zip_with(a, b, *), …)`` — is a
higher-order function chain that Catalyst never compiles (interpreted eval,
one closure call per element per row). For *per-pair* scoring in the
similarity family that fold was the single hottest expression in the bench
(dedup_embedding_lsh 4.46 s at sf0.1, VERDICT r2). This module moves the dot
product to an Arrow-batched ``pandas_udf``: the array column crosses to
Python once per batch as contiguous Arrow buffers and the dot is one numpy
``einsum`` over a (batch, dim) matrix — SIMD, no per-element interpreter.

Numeric contract: numpy's pairwise/SIMD summation and the engines'
sequential folds differ by O(1e-16) relative error; every consumer rounds to
6 decimals (registry.py determinism contract), orders of magnitude above
that, so oracle hash-matching is preserved.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


@lru_cache(maxsize=1)
def _dot_arrow():
    # Constructed lazily: pandas_udf parses its DDL return type eagerly,
    # which requires an active SparkContext — a module-level decorator
    # would break any import that happens before the session exists.
    @pandas_udf("double")
    def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        av = np.asarray(a.tolist(), dtype=np.float64)
        bv = np.asarray(b.tolist(), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", av, bv))

    return dot_udf


@lru_cache(maxsize=1)
def _cosine_arrow():
    @pandas_udf("double")
    def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        av = np.asarray(a.tolist(), dtype=np.float64)
        bv = np.asarray(b.tolist(), dtype=np.float64)
        dots = np.einsum("ij,ij->i", av, bv)
        na = np.sqrt(np.einsum("ij,ij->i", av, av))
        nb = np.sqrt(np.einsum("ij,ij->i", bv, bv))
        return pd.Series(dots / (na * nb))

    return cosine_udf


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length ``array<float>`` columns (double)."""
    return _dot_arrow()(a, b)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<float>`` columns (double math),
    one numpy pass per Arrow batch for dot and both norms."""
    return _cosine_arrow()(a, b)


def nearest_centroid_udf(cents):
    """Batched nearest-centroid assignment against a SMALL codebook:
    ``cents`` is a sequence of ``(c_id, embedding)`` pairs (any order;
    sorted by c_id here) and the returned pandas_udf maps an
    ``array<float>`` embedding column to ``struct<c_cos: double,
    c_id: bigint>`` — the (raw cosine, id) of the best centroid, ties
    to the LOWEST c_id.

    This replaces the former broadcast-join + ``max(struct(c_cos,
    -c_id))`` aggregate (guide §4/§8): the codebook was already
    collected driver-side to build the broadcast, but the join shipped
    every embedding across the Python boundary once PER CANDIDATE
    CENTROID and then shuffled the argmax; here the codebook rides the
    task closure, each embedding crosses exactly once, and the
    assignment is a narrow map — no join, no exchange. Numerics are
    bitwise-identical to functions.vector.cosine over the joined pairs:
    the per-(row, centroid) contraction is the same einsum over the
    same f64 operands, and ``np.argmax``'s first-max-wins matches the
    struct-max's (-c_id) tie-break (verified bitwise on the fixtures,
    tests/test_round18_opt.py)."""
    cents = sorted(cents, key=lambda c: c[0])
    ids = np.asarray([c for c, _ in cents], dtype=np.int64)
    vecs = [np.asarray(v, dtype=np.float64) for _, v in cents]
    norms = [np.sqrt(np.einsum("j,j->", v, v)) for v in vecs]

    @pandas_udf("c_cos double, c_id bigint")
    def nearest(a: pd.Series) -> pd.DataFrame:
        if len(a) == 0 or not vecs:
            return pd.DataFrame(
                {
                    "c_cos": pd.Series(np.empty(0, dtype=np.float64)),
                    "c_id": pd.Series(np.empty(0, dtype=np.int64)),
                }
            )
        av = np.asarray(a.tolist(), dtype=np.float64)
        na = np.sqrt(np.einsum("ij,ij->i", av, av))
        sims = np.empty((av.shape[0], len(vecs)), dtype=np.float64)
        for j, cv in enumerate(vecs):
            dots = np.einsum("ij,j->i", av, cv)
            sims[:, j] = dots / (na * norms[j])
        best = np.argmax(sims, axis=1)
        rows = np.arange(av.shape[0])
        return pd.DataFrame({"c_cos": sims[rows, best], "c_id": ids[best]})

    return nearest


@lru_cache(maxsize=1)
def _l2sq_arrow():
    @pandas_udf("double")
    def l2sq_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        av = np.asarray(a.tolist(), dtype=np.float64)
        bv = np.asarray(b.tolist(), dtype=np.float64)
        d = av - bv
        return pd.Series(np.einsum("ij,ij->i", d, d))

    return l2sq_udf


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance of two ``array<float>`` columns — computed as
    the diff-square-sum directly (NOT |a|²+|b|²-2ab), matching the
    oracles' sequential squared-difference folds to the usual O(1e-16)."""
    return _l2sq_arrow()(a, b)
