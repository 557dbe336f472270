"""Driver-side matrix collection helpers for the small-N fast paths.

Every "collect X and broadcast it" tier in the engine (exact kNN scan,
driver-BLAS / broadcast-gather Laplacian, TwoNN, IVF training) needs the
corpus as an (ids, X) numpy pair. Collecting Spark Row objects for that
is catastrophically slow for wide array columns — each of N rows
materializes an F-element Python list (~60 s at N=78k, F=384). The
Arrow path (`toPandas`, enabled in session.py) moves the same data
columnar and lands it as numpy in ~2 s: same contract, 30x less wall.

`positions_of` replaces per-edge Python dict lookups with a vectorized
sorted-search: works for arbitrary int64 ids (including 60-bit hashes),
no densification assumption.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def collect_id_matrix(
    df: DataFrame, id_col: str, feat_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Collect (ids int64, X float64 N x F) via the Arrow columnar path."""
    pdf = df.select(id_col, feat_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    X = np.stack(pdf[feat_col].to_numpy()).astype(np.float64)
    return ids, X


def sorted_index(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Precompute (sorted_ids, order) for `positions_of` lookups."""
    order = np.argsort(ids, kind="stable").astype(np.int64)
    return ids[order], order


def positions_of(
    keys: np.ndarray, sorted_ids: np.ndarray, order: np.ndarray
) -> np.ndarray:
    """Row positions of `keys` in the original ids array (vectorized).

    Raises KeyError on any key absent from the ids — without the check
    `searchsorted` silently gathers the wrong row (or IndexErrors only
    past the array end), which would corrupt a future caller's frame
    join invisibly."""
    pos = np.searchsorted(sorted_ids, keys)
    pos_c = np.minimum(pos, len(sorted_ids) - 1)
    if not np.array_equal(sorted_ids[pos_c], keys):
        missing = np.asarray(keys)[(pos >= len(sorted_ids))
                                   | (sorted_ids[pos_c] != keys)]
        raise KeyError(
            f"{missing.size} edge id(s) absent from the items array "
            f"(first few: {missing[:5].tolist()})")
    return order[pos_c]
