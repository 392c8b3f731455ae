"""TPU-native framework for learning ocean-column turbulence parameterizations.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
CliMA/ClimateParameterizations.jl (a.k.a. OceanParameterizations.jl):

- ``core``     : staggered z-grid, stencil differentiation operators, feature
                 scaling, coarse-graining, smoothing filters.
- ``ops``      : batched numerical kernels (Thomas tridiagonal solve in
                 pure-XLA and Pallas variants).
- ``physics``  : convective adjustment, modified Pacanowski-Philander (mPP)
                 Ri-dependent diffusivity, K-profile parameterization (KPP),
                 TKE mass-flux column models.
- ``closures`` : MLP flux closures and exact Gaussian-process regression.
- ``models``   : fused column RHS (free-convection and wind-mixing NDEs) and
                 lax.scan timesteppers (explicit + operator-split implicit).
- ``data``     : LESbrary JLD2/HDF5 readers, dataset registries, synthetic-LES
                 generators, coarse-graining + scaling pipelines.
- ``train``    : optax training loops (direct flux regression, NDE training
                 through the scan, mPP calibration, KPP calibration),
                 checkpoint/resume.
- ``parallel`` : device-mesh sharding (pjit/shard_map) over simulations and
                 column ensembles.
- ``eval``     : NDE-profile evaluation harness, loss matrices, animations.
- ``embed``    : host-model embedding (column ensembles, double gyre).

Everything in the compute path is jittable, vmappable, and static-shape; the
hot loops run as a single fused ``lax.scan`` per simulation batch.
"""

__version__ = "0.1.0"

from climateparameterizations_jl_tpu.core.grid import ColumnGrid
from climateparameterizations_jl_tpu.core.operators import (
    d_face_to_center,
    d_center_to_face,
    cell_to_cell_derivative,
)
from climateparameterizations_jl_tpu.core.scalings import (
    ZeroMeanUnitVarianceScaling,
    MinMaxScaling,
    fit_scaling,
)
from climateparameterizations_jl_tpu.core.coarse_grain import (
    coarse_grain_center,
    coarse_grain_face,
    coarse_grain_linear_interpolation,
)
from climateparameterizations_jl_tpu.core.filters import smoothing_filter
from climateparameterizations_jl_tpu.core.convective_adjust import convective_adjust_profile
from climateparameterizations_jl_tpu.ops.tridiagonal import (
    tridiagonal_solve,
    implicit_diffusion_step,
)

__all__ = [
    "ColumnGrid",
    "d_face_to_center",
    "d_center_to_face",
    "cell_to_cell_derivative",
    "ZeroMeanUnitVarianceScaling",
    "MinMaxScaling",
    "fit_scaling",
    "coarse_grain_center",
    "coarse_grain_face",
    "coarse_grain_linear_interpolation",
    "smoothing_filter",
    "convective_adjust_profile",
    "tridiagonal_solve",
    "implicit_diffusion_step",
    "__version__",
]
