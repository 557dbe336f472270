"""Streaming exact-dedup via applyInPandasWithState
(SURVEY §7.1 additive; the reference has no streaming surface).

Streaming twin of operators/dedup.exact_duplicates: documents arrive on
a stream, the keyed state is the first-seen doc id per content
fingerprint, and each micro-batch emits every incoming doc tagged
``keep`` (first occurrence of its fingerprint, stream-order by doc id
within a batch) or not — the online form of the training-export
keep-list (operators/dedup.dedup_keeplist) for ingestion pipelines that
cannot wait for a batch pass.

Scale notes: state is ONE long per distinct fingerprint, partitioned by
the 60-bit fingerprint itself — the same shuffle key as the batch
groupBy, so the stream and batch plans shuffle identically. Per-batch
work is O(batch); state size is O(distinct docs seen), the inherent
floor for exact online dedup (probabilistic footprints — a Bloom-filter
state — would bolt on the same skeleton).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

from ..functions import text as T

OUT_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("fingerprint", LongType(), False),
    StructField("keep", BooleanType(), False),
])

# state: first-seen doc id for this fingerprint
STATE_SCHEMA = StructType([
    StructField("keep_id", LongType(), True),
])


def dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs must be a streaming DataFrame with (id_col, text_col).
    Returns one row per incoming doc: [doc_id, fingerprint, keep]."""
    if not docs.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    fp = docs.select(
        F.col(id_col).alias("doc_id"),
        T.content_fingerprint(text_col).alias("fingerprint"),
    )

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (fingerprint,) = key
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(i) for i in pdf["doc_id"])
        ids.sort()
        (keep_id,) = state.get if state.exists else (None,)
        out_keep = []
        for i in ids:
            if keep_id is None:
                keep_id = i
                out_keep.append(True)
            else:
                out_keep.append(i == keep_id)
        state.update((keep_id,))
        yield pd.DataFrame({
            "doc_id": ids,
            "fingerprint": [fingerprint] * len(ids),
            "keep": out_keep,
        })

    return fp.groupBy("fingerprint").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
