"""Typed parameter objects mirroring the reference's config dicts.

GraphParams mirrors ``parse_graph_params`` (reference src/helpers.rs:48-77):
required eps/k/topk/p, sigma defaulting to ``eps * 0.5`` (the binding's
default — note the docs say sigma=eps; we follow the binding,
reference src/helpers.rs:69-72 vs GRAPH_VARIABLES.md:10).

EnergyParams mirrors ``parse_energy_params`` (reference
src/energyparams.rs:6-46, defaults documented src/lib.rs:310-323).
"""

from __future__ import annotations

from dataclasses import dataclass, asdict


@dataclass(frozen=True)
class GraphParams:
    """λτ-graph build parameters (reference src/helpers.rs:48-77)."""

    eps: float
    k: int
    topk: int
    p: float = 2.0
    sigma: float | None = None
    # Reference builder default is normalise=false (DEBUG log
    # tests/output/1760705545_v0_16/suggested_eps.md:3; the pyo3 binding
    # doesn't parse the key at all, src/helpers.rs:48-77). When True the
    # builder stores unit-normalized vectors — graph topology is
    # cosine-invariant to this, but e_raw/λ change downstream
    # (NORMALISATION.md "Downstream Spectral Analysis").
    normalise: bool = False
    seed: int = 42

    def __post_init__(self) -> None:
        if self.eps <= 0:
            raise ValueError("eps must be > 0")
        if self.k <= 0 or self.topk <= 0:
            raise ValueError("k and topk must be > 0")
        if self.sigma is None:
            # Binding default: sigma = eps * 0.5 (src/helpers.rs:69-72).
            object.__setattr__(self, "sigma", self.eps * 0.5)

    @classmethod
    def from_dict(cls, d: dict) -> "GraphParams":
        required = {"eps", "k", "topk", "p"}
        missing = required - set(d)
        if missing:
            raise ValueError(f"graph_params missing required keys: {sorted(missing)}")
        return cls(**{k: v for k, v in d.items() if k in
                      {"eps", "k", "topk", "p", "sigma", "normalise", "seed"}})

    def to_dict(self) -> dict:
        return asdict(self)


@dataclass(frozen=True)
class EnergyParams:
    """Energy/diffusion pipeline parameters (reference src/lib.rs:310-323)."""

    optical_tokens: int | None = 40
    trim_quantile: float = 0.1
    eta: float = 0.05
    steps: int = 4
    split_quantile: float = 0.9
    neighbor_k: int = 12
    split_tau: float = 0.15
    w_lambda: float = 1.0
    w_disp: float = 0.5
    w_dirichlet: float = 0.25
    candidate_m: int = 40

    @classmethod
    def from_dict(cls, d: dict | None) -> "EnergyParams":
        if not d:
            return cls()
        known = {f for f in cls.__dataclass_fields__}  # noqa: C416
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_dict(self) -> dict:
        return asdict(self)
