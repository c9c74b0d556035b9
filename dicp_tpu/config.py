"""Configuration for the TPU-native ICP engine.

The reference reads one YAML file at construction time (dICP/ICP.py:16-27,
config/dICP_config.yaml:1-20).  Here the canonical configuration object is a
frozen, hashable dataclass so it can be passed as a static argument to
``jax.jit`` — every distinct config compiles a specialized XLA program (loss
choice, icp type, dim, and iteration budget are all trace-time constants,
which is what lets XLA fuse the whole Gauss-Newton step).  A YAML loader for
the reference's exact schema is provided for drop-in compatibility.
"""

from __future__ import annotations

import dataclasses
import os.path as osp
from typing import Optional

import yaml

DEFAULT_CONFIG_PATH = osp.join(osp.dirname(osp.abspath(__file__)), "configs", "dicp_config.yaml")


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Static solver configuration.

    Field semantics mirror the reference's constructor and YAML keys
    (dICP/ICP.py:30-44, config/dICP_config.yaml).  Extra TPU-specific knobs:
    ``tikhonov`` (normal-equation damping; the reference hardcodes 1e-12 at
    dICP/ICP.py:200 which is below float32 resolution of the problem — None
    auto-selects by dtype), ``driver`` (scan = differentiable fixed-bound
    loop with converged-skip, while = non-differentiable early-exit loop),
    and ``remat`` (rematerialize the GN step in reverse mode).
    """

    icp_type: str = "pt2pl"  # 'pt2pl' | 'pt2pt' | 'symmetric'
    max_iterations: int = 100
    tolerance: float = 1e-12
    differentiable: bool = True

    # per-call options in the reference icp() signature (dICP/ICP.py:46)
    dim: int = 3
    trim_dist: Optional[float] = None
    loss_name: Optional[str] = None  # one of losses.VALID_LOSSES
    loss_metric: float = 1.0

    # YAML-sourced parameters (config/dICP_config.yaml)
    tanh_steepness: float = 5.0
    target_pad_val: float = 1000.0
    source_zeroes_are_pad: bool = False
    const_iter: bool = False
    use_gumbel: bool = False
    gumbel_eps: float = 1e-10
    gumbel_tau: float = 0.1
    verbose: bool = False
    match_ratio_thresh: float = 0.0

    # TPU-native knobs (no reference counterpart)
    tikhonov: Optional[float] = None
    driver: str = "auto"  # 'auto' | 'scan' | 'while'
    remat: bool = False
    # False: skip the per-iteration costs/deltas/weights histories (the
    # result carries length-1 placeholders holding the final values).  The
    # weight history alone is O(T*N*P) HBM traffic — at B=4096 it dominates
    # the solve; inference/training-throughput paths should disable it.
    collect_histories: bool = True
    use_pallas_nn: Optional[bool] = None
    # Correspondence search backend:
    #   'dense'   brute-force (N, n, m) distance matrix (XLA)
    #   'pallas'  tiled brute-force kernel, no (n, m) materialization
    #   'cluster' Hilbert cluster-pruned exact search (ops/cluster_knn) —
    #             index built ONCE per solve (the target is loop-constant);
    #             per-iteration cost O(n * probes * group) instead of O(n*m)
    #   'auto'    dense small, pallas mid, cluster for large targets
    # use_pallas_nn (legacy) maps True->'pallas', False->'dense' when
    # nn_method is 'auto'.
    nn_method: str = "auto"  # 'auto' | 'dense' | 'pallas' | 'cluster'
    # Measured on-chip sweet spot (100k x 100k): g=128/P=32 -> 12 ms,
    # 99.98% agreement with brute force, 99.3% certified-exact (BENCH.md).
    cluster_group: int = 128
    cluster_probes: int = 32
    # In-solver exactness escalation: brute-force up to this many
    # UNCERTIFIED cluster queries per iteration against the full target, so
    # default-config correspondences match brute force exactly (the
    # reference is exact, dICP/nn.py:32-38).  None = auto budget
    # (n/64, clamped to [256, 4096] — measured uncertified fraction is
    # 0.02-0.7% at 100k, far below n/64); 0 disables (fastest, results may
    # be inexact for ~0.02% of queries).
    cluster_fixup: Optional[int] = None
    # Process batches bigger than this in sequential lax.map chunks of this
    # size.  Solver throughput on one chip peaks near B~1024 and REGRESSES
    # ~40% by B=4096 (XLA fusion strategies degrade past the VMEM-friendly
    # footprint; measured in benchmarks/exp_batch.py) — chunking keeps every
    # chunk at the measured knee.  Results are bitwise identical (batch
    # elements are independent).
    batch_chunk: Optional[int] = None
    # Whole-solve fused Pallas kernel for small pairs (ops/fused_gn): the
    # ENTIRE while-driver iteration loop — correspondences, robust weights,
    # normal equations, closed-form solve, retraction, bookkeeping — runs as
    # ONE kernel, every iterate living in VMEM.  The XLA while driver
    # launches ~15-25 fused kernels per GN iteration (~110 us/iter at B=256
    # on 65-point pairs — dispatch/fusion-bound, not FLOP-bound; BENCH.md).
    # None = auto = OFF: the on-chip A/B (benchmarks/exp_fused_gn.py,
    # 2026-08-19, v5e) measured the fused kernel SLOWER than the XLA while
    # driver — forward-only 1.89 ms vs 0.76 ms, IFT fwd+bwd 2.50 ms vs
    # 1.58 ms at B=256, raw kernel ~1.8 ms across bt=8/16 (bt>=32 exceeds
    # VMEM).  The Mosaic loop serializes work XLA overlaps across fusions,
    # so the dispatch savings never materialize.  Kept for parity tests
    # (True forces; interpret mode off-TPU), False disables.
    fused_small: Optional[bool] = None
    # Normal-equation solve: 'closed' = pivot-free Cramer/Schur closed form
    # (fuses to VPU elementwise ops; valid because A is SPD), 'lu' = XLA's
    # generic batched LU (the reference's torch.linalg.inv analogue).
    solve_method: str = "closed"  # 'closed' | 'lu'
    scan_unroll: int = 1  # lax.scan unroll factor for the diff driver
    # Anderson acceleration (dicp_tpu.anderson): > 0 enables type-II AA
    # mixing over the last anderson_m iterates in the inference/IFT-forward
    # while driver.  Measured: pt2pt 25 -> 10 iterations on the reference
    # pair; pt2pl (near-quadratic) pays 1-3 extra evaluations — enable for
    # slow-converging configs.  Requires collect_histories=False (the AA
    # iterate sequence has no reference-contract history semantics).
    anderson_m: int = 0
    anderson_cap: float = 5.0
    # v2 fused cluster kernel INSIDE the map-sharded shard_map body
    # (parallel/sharding).  None = auto = follow cluster_nn's own backend
    # rule (ON for TPU, interpret-mode on CPU); False pins the XLA
    # candidate path (the pre-round-5 default, kept for A/B); True forces.
    # Unpinned in round 5: parity is exact on the 8-virtual-device CPU mesh
    # (tests/test_parallel.py::test_map_sharded_fused_parity) and on-chip
    # inside a real shard_map (benchmarks/exp_shardmap_fused.py: 45.2 ms vs
    # 50.9 ms XLA per sharded 100k solve, pose diff 0.0, 2026-08-20).
    sharded_fused: Optional[bool] = None

    def __post_init__(self):
        if self.icp_type not in ("pt2pt", "pt2pl", "symmetric"):
            raise ValueError(
                f"icp_type must be pt2pt|pt2pl|symmetric, got {self.icp_type}")
        if self.dim not in (2, 3):
            raise ValueError("dim must be 2 or 3")  # dICP/ICP.py:79
        if self.loss_name is not None:
            from dicp_tpu.losses import VALID_LOSSES

            # single source of truth; 'trim' is valid here too (the reference
            # dispatches loss_fn={'name': 'trim'} the same way, dICP/loss.py:16)
            if self.loss_name not in VALID_LOSSES:
                raise ValueError(f"loss_name must be one of {VALID_LOSSES}, "
                                 f"got {self.loss_name}")
        if self.driver not in ("auto", "scan", "while"):
            raise ValueError(f"driver must be auto|scan|while, got {self.driver}")
        if self.nn_method not in ("auto", "dense", "pallas", "cluster"):
            raise ValueError(f"nn_method must be auto|dense|pallas|cluster, "
                             f"got {self.nn_method}")
        if self.solve_method not in ("closed", "lu"):
            raise ValueError(f"solve_method must be closed|lu, got {self.solve_method}")
        if self.anderson_m < 0:
            raise ValueError(f"anderson_m must be >= 0, got {self.anderson_m}")
        if self.anderson_m > 0 and self.collect_histories:
            raise ValueError("anderson_m > 0 requires collect_histories="
                             "False: the accelerated iterate sequence has no "
                             "reference-contract per-iteration histories")
        if self.anderson_m > 0 and self.const_iter:
            raise ValueError("anderson_m > 0 is an early-exit acceleration; "
                             "const_iter (fixed trip count) contradicts it")
        if self.anderson_m > 0 and self.use_gumbel and self.differentiable:
            raise ValueError("anderson_m > 0 requires a deterministic "
                             "correspondence backend (Gumbel soft-NN "
                             "resamples every evaluation)")
        if (self.anderson_m > 0 and self.differentiable
                and self.resolved_driver() == "scan"):
            # Without this check the failure surfaces deep inside JAX as
            # "Reverse-mode differentiation does not work for lax.while_loop"
            # when jax.grad hits the AA driver.
            raise ValueError(
                "anderson_m > 0 replaces the unrolled scan driver with a "
                "while-loop AA driver, which reverse-mode AD cannot flow "
                "through; for gradients use dicp_tpu.ift (IFT backward, "
                "driver='while'), or drop anderson_m for unrolled gradients")

    def resolved_driver(self) -> str:
        if self.driver != "auto":
            return self.driver
        # Reverse-mode AD cannot flow through lax.while_loop; scan for diff.
        return "scan" if self.differentiable else "while"

    def resolved_nn_method(self, n: int, m: int, on_cpu: bool) -> str:
        """Concrete correspondence backend for an (n, m) problem."""
        if self.nn_method != "auto":
            return self.nn_method
        if self.use_pallas_nn is not None:      # legacy switch
            return "pallas" if self.use_pallas_nn else "dense"
        from dicp_tpu.knn import _PALLAS_THRESHOLD

        if n * m <= _PALLAS_THRESHOLD:
            return "dense"
        # cluster needs enough groups for pruning to pay; pallas covers the
        # mid range (and CPU interpret-mode pallas is slow -> cluster there)
        if m >= 16384 or on_cpu:
            return "cluster"
        return "pallas"

    def resolved_cluster_fixup(self, n: int) -> int:
        """Concrete uncertified-query brute-force budget for n queries."""
        if self.cluster_fixup is not None:
            return min(int(self.cluster_fixup), n)
        return min(min(4096, max(256, n // 64)), n)

    def with_(self, **kw) -> "ICPConfig":
        return dataclasses.replace(self, **kw)


def load_yaml_config(config_path: Optional[str] = None) -> dict:
    """Load the reference YAML schema (dICP/ICP.py:21-27)."""
    if config_path is None:
        config_path = DEFAULT_CONFIG_PATH
    with open(config_path, "r") as f:
        return yaml.safe_load(f)


def config_from_yaml(
    config_path: Optional[str] = None,
    icp_type: str = "pt2pl",
    max_iterations: int = 100,
    tolerance: float = 1e-12,
    differentiable: bool = True,
) -> ICPConfig:
    """Build an :class:`ICPConfig` the way the reference constructor does
    (dICP/ICP.py:15-44): YAML supplies the parameter/functionality/logging
    blocks, constructor kwargs supply the rest."""
    raw = load_yaml_config(config_path)["dICP"]
    params = raw["parameters"]
    func = raw["functionality"]
    logging = raw["logging"]
    return ICPConfig(
        icp_type=icp_type,
        max_iterations=max_iterations,
        tolerance=tolerance,
        differentiable=differentiable,
        tanh_steepness=params["tanh_steepness"],
        target_pad_val=params["target_pad_val"],
        source_zeroes_are_pad=params["source_zeroes_are_pad"],
        const_iter=params["const_iter"],
        use_gumbel=func["gumbel"],
        gumbel_eps=func["gumbel_eps"],
        gumbel_tau=func["gumbel_tau"],
        verbose=logging["verbose"],
        match_ratio_thresh=logging["matched_ratio_thresh"],
    )
