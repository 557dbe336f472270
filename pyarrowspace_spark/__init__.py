"""pyarrowspace-spark: a PySpark-native spectral vector-search and
data-processing engine with the capabilities of tuned-org-uk/pyarrowspace,
re-expressed Spark-first (DataFrame/SQL/Structured Streaming).

Public API mirrors the reference binding (src/lib.rs:379-386):
ArrowSpaceBuilder / ArrowSpaceIndex / search functions, plus the
LLM-data-pipeline operator extensions (dedup, similarity search,
text analysis, multimodal columns).
"""

from .params import GraphParams, EnergyParams
from .builder import ArrowSpaceBuilder, ArrowSpaceIndex
from .session import get_spark, set_debug

__version__ = "0.1.0"

__all__ = [
    "ArrowSpaceBuilder",
    "ArrowSpaceIndex",
    "GraphParams",
    "EnergyParams",
    "get_spark",
    "set_debug",
]
