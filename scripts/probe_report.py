"""Probe-normalized bench comparison (r11 stretch task, load-bearing
since r12: three consecutive rounds of host churn mean every wall
number needs manual attribution at verdict time — this turns that
argument into a table).

Usage:
    python scripts/probe_report.py BENCH_A.json BENCH_B.json

Reads two bench artifacts (bench.py sidecar format: {"queries": {...},
"extra": {...}}) and prints, for every query present in both:

    query | A sec | B sec | ratio B/A | ratio normalized by host factor

The HOST FACTOR estimate is the geometric mean of the probe ratios
(gemm inverted, warm memcpy inverted, diskwrite inverted — each probe
is a rate, so a slower host has ratio > 1 after inversion). A
normalized ratio near 1.0 means the query moved WITH the host; a
normalized ratio well above 1.0 is a candidate code regression that
the probes cannot explain. Queries under MIN_SEC in both runs are
noise-dominated and skipped from the summary stats (still printed).

measure_1m artifacts work too (they carry the same probe trio); their
phase timings are top-level floats ending in _sec.
"""

from __future__ import annotations

import json
import math
import sys

MIN_SEC = 1.0

PROBES = [
    # (key, invert): probes are rates — invert so >1 always means
    # "B's host is slower than A's"
    ("host_gemm_gflops", True),
    ("host_memcpy_warm_gbps", True),
    ("host_diskwrite_mbps", True),
]


def _load(path: str) -> tuple[dict, dict]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        queries = dict(d["queries"])
        extra = d.get("extra", {})
    else:  # measure_1m artifact: top-level *_sec floats
        queries = {k: v for k, v in d.items()
                   if k.endswith("_sec") and "per_sec" not in k
                   and isinstance(v, (int, float))}
        extra = d
    return queries, extra


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    pa, pb = sys.argv[1], sys.argv[2]
    qa, ea = _load(pa)
    qb, eb = _load(pb)

    print(f"A = {pa}")
    print(f"B = {pb}")
    print()
    print("probe ratios (B vs A; >1 = B's host slower):")
    ratios = []
    for key, invert in PROBES:
        va, vb = ea.get(key), eb.get(key)
        if not va or not vb:
            print(f"  {key:24s}  A={va}  B={vb}  (missing — skipped)")
            continue
        r = (va / vb) if invert else (vb / va)
        ratios.append(r)
        print(f"  {key:24s}  A={va:>8}  B={vb:>8}  ratio={r:.2f}x")
    host = math.exp(sum(math.log(r) for r in ratios) / len(ratios)) \
        if ratios else 1.0
    print(f"\nhost factor (geomean of probe ratios): {host:.2f}x")
    # A single scalar only attributes anything when the probes AGREE on
    # the direction/size of the host change. The r13 800k pair measured
    # gemm 11x slower while diskwrite ran 8x faster — a geomean over
    # that is noise dressed as a number. Flag it instead of printing a
    # confident-looking table (resource-specific attribution: compare
    # each query against the probe matching its known bottleneck —
    # gemm for build/λ stages, diskwrite for spool-heavy ones).
    if ratios and max(ratios) / min(ratios) > 10.0:
        print("  WARNING: probe ratios span "
              f"{max(ratios) / min(ratios):.0f}x — the hosts differ "
              "per-RESOURCE, the scalar host factor and 'norm' column "
              "are unreliable for this pair; attribute per query "
              "against the probe matching its bottleneck.")
    la, lb = ea.get("loadavg_start"), eb.get("loadavg_start")
    print(f"loadavg_start: A={la}  B={lb}\n")

    common = [k for k in qa if k in qb]
    print(f"{'query':42s} {'A sec':>9} {'B sec':>9} {'B/A':>6} "
          f"{'norm':>6}")
    norm_ratios = []
    for k in common:
        va, vb = qa[k], qb[k]
        if va <= 0:
            continue
        r = vb / va
        nr = r / host
        flag = ""
        if va >= MIN_SEC or vb >= MIN_SEC:
            norm_ratios.append(nr)
            if nr > 1.3:
                flag = "  <-- beyond host factor"
        print(f"{k:42s} {va:9.2f} {vb:9.2f} {r:6.2f} {nr:6.2f}{flag}")
    if norm_ratios:
        norm_ratios.sort()
        med = norm_ratios[len(norm_ratios) // 2]
        print(f"\nmedian normalized ratio over {len(norm_ratios)} "
              f"non-noise queries: {med:.2f} "
              f"(≈1.0 means the suite moved with the host)")


if __name__ == "__main__":
    main()
