"""Executes every ```python block in USAGE.md, in order, in ONE shared
namespace — the quickstart is guaranteed runnable, not aspirational
(r7 verdict task #7). The first snippet's get_spark() returns the
session fixture's context (getOrCreate), so no second context spins up.
"""

import os
import re

import pytest


def _python_blocks(md_path: str) -> list[str]:
    text = open(md_path).read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.mark.usefixtures("spark")
def test_usage_snippets_run_in_order(spark):
    md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "USAGE.md")
    blocks = _python_blocks(md)
    assert len(blocks) >= 7, "USAGE.md lost its snippets"
    ns: dict = {}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"USAGE.md:block{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"USAGE.md block {i} failed: {e!r}\n---\n{src}")
    # the quickstart actually built both index flavors
    assert ns["idx"].nitems > 0
    assert ns["eidx"].centroids.count() > 0
