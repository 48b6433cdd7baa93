"""Multi-chip scale-out: device meshes, spectral sharding, collective flux sums.

See SURVEY.md §2.3 — the reference's only parallel axis is shared-memory
threading over wavenumber; here that becomes a ('batch', 'nu') device mesh
with contiguous spectral blocks per chip and a single all-reduce (the spectral
integral) as the entire communication budget.
"""

from .mesh import (
    init_multihost,
    spectral_mesh,
    trapz_weights,
    shard_spectral,
    replicate,
    nu_spec,
    spectral_pspecs,
)
from .spectral import (
    pad_nu,
    shard_lbl,
    sharded_radiate,
    make_sharded_heating,
    make_sharded_step,
)
from ..absorption.sharded import ShardedLineGas, shard_line_gas

__all__ = [
    "init_multihost",
    "spectral_mesh",
    "trapz_weights",
    "shard_spectral",
    "replicate",
    "nu_spec",
    "spectral_pspecs",
    "pad_nu",
    "shard_lbl",
    "shard_line_gas",
    "ShardedLineGas",
    "sharded_radiate",
    "make_sharded_heating",
    "make_sharded_step",
]
