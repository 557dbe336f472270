"""Deterministic synthetic embedding corpora for scale benchmarks.

The reference's published throughput anchors (BASELINE.md) are CVE
description embeddings, N∈{78,580 … 313,841}, F=384, inputs ×12 —
a *clustered* corpus (near-duplicate vulnerability texts), which is
what makes its kNN graph meaningful. We mirror that shape: C Gaussian
clusters on the unit sphere, items = normalize(center + σ·noise) × 12,
so same-cluster cosine ≈ 1/(1+σ²) and cross-cluster cosine ≈ 0.

Everything is seeded and written once to a cache directory; the bench
reads the parquet like any other source (the generator is NOT part of
the timed path).
"""

from __future__ import annotations

import os

import numpy as np


def ensure_clustered_corpus(
    cache_dir: str,
    n: int,
    f: int = 384,
    cluster_size: int = 200,
    noise: float = 0.45,
    scale: float = 12.0,
    seed: int = 42,
) -> str:
    """Write (or reuse) a clustered corpus parquet; returns its path.

    Columns: item_id int64, features array<double>. Deterministic in
    (n, f, cluster_size, noise, scale, seed).
    """
    name = f"synth_n{n}_f{f}_c{cluster_size}_s{noise}_x{scale}_seed{seed}"
    path = os.path.join(cache_dir, name + ".parquet")
    if os.path.exists(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_clusters = max(1, n // cluster_size)
    centers = rng.standard_normal((n_clusters, f))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)

    # Stream in blocks so even N in the millions never holds more than
    # one block in memory. Write to a tmp name and rename at the end:
    # the existence check above treats the file as complete, and a
    # killed/crashed generator otherwise leaves a footerless parquet
    # that poisons every later run (r11: a mid-write SIGKILL at N=1M
    # cost a relaunch).
    # Unique tmp name (ADVICE r11): a deterministic path + '.tmp' lets
    # two concurrent generators of the same corpus clobber each
    # other's in-progress file and os.replace a half-written parquet
    # into place — recreating the poisoned cache this staging exists
    # to prevent. pid+uuid suffix keeps writers disjoint; the last
    # completed os.replace wins atomically with identical content
    # (same seed/shape).
    import uuid as _uuid

    block = 100_000
    tmp_path = f"{path}.tmp.{os.getpid()}.{_uuid.uuid4().hex[:8]}"
    writer = None
    try:
        for b0 in range(0, n, block):
            b1 = min(n, b0 + block)
            idx = assign[b0:b1]
            X = centers[idx] + noise * rng.standard_normal(
                (b1 - b0, f)) / np.sqrt(f)
            X = X / np.linalg.norm(X, axis=1, keepdims=True) * scale
            tbl = pa.table({
                "item_id": pa.array(np.arange(b0, b1, dtype=np.int64)),
                "features": pa.array(list(X), type=pa.list_(pa.float64())),
            })
            if writer is None:
                writer = pq.ParquetWriter(tmp_path, tbl.schema)
            # 2048-row row groups (~6 MB at F=384): a row group is
            # Spark's real unit of scan parallelism, and the old
            # whole-block groups (100k rows ≈ 300 MB) made the corpus
            # effectively unsplittable — every scan-fed stage ran on
            # ONE task (r13-opt; values are unchanged, only the
            # layout). 2048 keeps ≥32 groups from N≈66k up, so the
            # bench scan parallelizes without even a repartition.
            writer.write_table(tbl, row_group_size=2048)
        if writer is not None:
            writer.close()
            writer = None
            os.replace(tmp_path, path)
    finally:
        if writer is not None:
            writer.close()
        if os.path.exists(tmp_path):
            try:
                os.remove(tmp_path)
            except OSError:
                pass
    return path
