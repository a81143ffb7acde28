"""Vector arithmetic helpers shared by dedup and similarity operators.

Two dot-product strategies with IDENTICAL numeric results:
  * ``dot_unrolled(a, b, dim)`` — an explicit left-associated sum of
    element products. Pure codegen arithmetic (no higher-order functions),
    ~10× faster than the fold below; requires the dimension statically.
  * ``dot_fold(a, b)`` — aggregate(zip_with(...)) sequential fold for
    unknown dimensions.

Both accumulate left-to-right from index 0, which is also how DuckDB's
list_dot_product accumulates — so results are bit-identical across the
three paths (the fold's leading 0.0+x0 is exact), and the oracle gate can
hash-match either.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_fold(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    out: Column | None = None
    for i in range(1, dim + 1):
        term = F.element_at(a, i) * F.element_at(b, i)
        out = term if out is None else (out + term)
    assert out is not None
    return out


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_unrolled(a, b, dim) if dim else dot_fold(a, b)


def norm(v: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(v, v, dim))
