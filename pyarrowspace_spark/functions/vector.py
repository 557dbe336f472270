"""Vector math as native Spark SQL column expressions.

Everything here compiles to JVM-side higher-order functions
(``zip_with`` / ``aggregate`` / ``transform``) so the hot path stays
inside whole-stage codegen — no Python UDFs. These are the building
blocks for the reference's scoring math:

- rectified cosine distance  d = 1 - max(0, cos)   (GRAPH_VARIABLES.md:7)
- kernel weight              w = 1/(1+(d/sigma)^p) (GRAPH_VARIABLES.md:9)
- lambda proximity           1/(1+|la-lb|)          (TAUMODE.md:33)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two array<double> columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an array<double> (reference pre-normalizes items,
    GRAPH_VARIABLES.md:3)."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)


def scale(a: Column | str, s: float | Column) -> Column:
    """Scalar magnitude rescale (reference ×12/×100 tuning,
    tests/test_2_CVE_db.py:154)."""
    a = F.col(a) if isinstance(a, str) else a
    s = F.lit(s) if not isinstance(s, Column) else s
    return F.transform(a, lambda x: x * s)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def rectified_cosine_distance(a: Column | str, b: Column | str) -> Column:
    """d(i,j) = 1 - max(0, cos(x_i, x_j)) — reference GRAPH_VARIABLES.md:7."""
    return F.lit(1.0) - F.greatest(cosine_similarity(a, b), F.lit(0.0))


def kernel_weight(dist: Column | str, sigma: float, p: float) -> Column:
    """w = 1 / (1 + (d/sigma)^p) — reference GRAPH_VARIABLES.md:9."""
    dist = F.col(dist) if isinstance(dist, str) else dist
    return F.lit(1.0) / (F.lit(1.0) + F.pow(dist / F.lit(float(sigma)), F.lit(float(p))))


def lambda_proximity(la: Column | str, lb: Column | str) -> Column:
    """1 / (1 + |lambda_a - lambda_b|) — reference TAUMODE.md:33."""
    la = F.col(la) if isinstance(la, str) else la
    lb = F.col(lb) if isinstance(lb, str) else lb
    return F.lit(1.0) / (F.lit(1.0) + F.abs(la - lb))


def blended_score(cos: Column, la: Column, lb: Column, tau: float) -> Column:
    """score = tau*cos + (1-tau)*lambda_proximity — reference
    src/lib.rs:172-173, TAUMODE.md:33."""
    t = F.lit(float(tau))
    return t * cos + (F.lit(1.0) - t) * lambda_proximity(la, lb)


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def nan_inf_count(a: Column | str) -> Column:
    """Count of NaN/Inf entries (reference tolerates but reports them,
    src/helpers.rs:31-44)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.size(F.filter(a, lambda x: F.isnan(x) | (F.abs(x) == float("inf"))))
