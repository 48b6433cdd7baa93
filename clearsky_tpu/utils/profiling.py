"""Tracing and kernel cost accounting.

The reference has no profiling beyond progress bars (SURVEY.md §5); here
profiling is first-class because the speed-of-light claim needs numbers:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace directory.
* :func:`linesum_cost` — analytic FLOP/byte model of the line-sum kernel (the
  framework's hot op), from the static banding plan.
* :func:`speed_of_light_report` — measured rate vs the roofline implied by
  the cost model and the chip's peak numbers.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np

__all__ = ["trace", "linesum_cost", "speed_of_light_report", "CHIP_PEAKS"]

# (peak f32 vector FLOP/s, HBM bytes/s) per chip generation — public figures.
CHIP_PEAKS = {
    "v5e": (0.394e15 / 2 / 2, 0.8e12),  # bf16 MXU 394 TF/s; f32 VPU class ~1e14
    "v5p": (0.459e15 / 2 / 2, 2.8e12),
    "cpu": (5e10, 5e10),
}

# FLOPs of one Voigt profile evaluation in the branch-free Humlicek kernel:
# all four regions computed per lane (region arithmetic ~ 130 flops) plus
# scaling/masking (~25) — an engineering estimate used for roofline context.
VOIGT_FLOPS_PER_EVAL = 155.0


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block: ``with trace('/tmp/trace'): run()`` -> TensorBoard dir."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class KernelCost:
    flops: float          # dense FLOPs actually executed
    useful_flops: float   # FLOPs on in-window (physically counted) pairs
    bytes_moved: float    # HBM traffic (inputs + outputs, gathered slabs)
    evals: int            # in-window line evaluations (the north-star count)

    @property
    def intensity(self) -> float:
        """Arithmetic intensity [FLOP/byte]."""
        return self.flops / max(self.bytes_moved, 1.0)


def linesum_cost(plan, n_states: int, chunk: int = 8, dtype_bytes: int = 4) -> KernelCost:
    """Cost model of ``sigma_from_lines_pallas`` for a given banding plan.

    Dense work walks ceil(count/chunk)*chunk lines per block (dynamic trip
    count); useful work is the in-window pair count. ``chunk`` is the line
    granularity: 8 for the default sublane-grouped strategy, 128 for the
    lane-major variants. Bytes: the gathered per-block line slabs (4 arrays)
    x states for (S, alpha, gamma) + shared line positions + the output
    stripe.
    """
    counts = np.asarray(plan.count, dtype=np.int64)
    walked = np.ceil(counts / chunk).astype(np.int64) * chunk
    dense_pairs = int(walked.sum()) * plan.block * n_states
    # block-granular in-window pair count (each block evaluates its whole slab
    # of candidate lines for each of its grid points)
    useful_pairs = int(counts.sum()) * plan.block * n_states
    slab = int(plan.slab)
    bytes_slabs = plan.n_blocks * slab * dtype_bytes * (1 + 3 * n_states)
    bytes_out = plan.n_blocks * plan.block * n_states * dtype_bytes
    return KernelCost(
        flops=dense_pairs * VOIGT_FLOPS_PER_EVAL,
        useful_flops=useful_pairs * VOIGT_FLOPS_PER_EVAL,
        bytes_moved=float(bytes_slabs + bytes_out),
        evals=useful_pairs,
    )


def speed_of_light_report(
    plan, n_states: int, seconds: float, chip: str = "v5e", chunk: int = 8
) -> dict:
    """Roofline context for a measured line-sum run.

    Returns achieved FLOP/s, the compute- and bandwidth-roofs, and the
    fraction of the binding roof achieved. ``chunk`` is the kernel's line
    granularity (8 for the default sublane-grouped strategy, 128 for the
    lane-major variant) — it sets the dense-work model.
    """
    cost = linesum_cost(plan, n_states, chunk=chunk)
    peak_flops, peak_bw = CHIP_PEAKS[chip]
    achieved = cost.flops / seconds
    roof = min(peak_flops, peak_bw * cost.intensity)
    return {
        "achieved_flops": achieved,
        "peak_flops": peak_flops,
        "intensity_flop_per_byte": cost.intensity,
        "binding_roof_flops": roof,
        "fraction_of_roof": achieved / roof,
        "dense_evals_per_s": cost.flops / VOIGT_FLOPS_PER_EVAL / seconds,
        "useful_evals_per_s": cost.evals / seconds,
    }
