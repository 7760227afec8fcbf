"""Vector math over ArrayType embedding columns — all JVM-side
higher-order functions (no Python boundary, no shuffle).

The i3cols analog is a Numba kernel over a ragged float column
(i3cols/phys.py pattern); here the per-row reduction compiles into
whole-stage codegen.  Elements are widened float→double (exact) before
arithmetic so results match a DuckDB oracle operating on DOUBLE.

Scale note (100 TB): these are embarrassingly parallel per-row ops —
the scan dominates.  For pairwise work see operators/similarity.py
(blocking + LSH bucketing keep the join from going quadratic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    """float[] → double[] (exact widening)."""
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential in-order dot product (matches DuckDB list summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_l2(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = norm_l2(a), norm_l2(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def lsh_bucket(arr: Column | str, hyperplanes: list[list[float]]) -> Column:
    """Random-hyperplane (SimHash) LSH bucket id: bit j = sign of the
    dot product with hyperplane j.

    ``hyperplanes`` are plain Python literals so the identical numbers
    can be embedded in a SQL oracle — and, at scale, so every executor
    evaluates the same deterministic expression with no broadcast
    variable.  Writing this bucket as a partition column turns ANN
    search into partition pruning (SURVEY §4.3).
    """
    bucket = F.lit(0)
    for j, h in enumerate(hyperplanes):
        hcol = F.array(*[F.lit(float(v)) for v in h])
        bucket = bucket + F.when(dot(arr, hcol) >= 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket.cast("int")
