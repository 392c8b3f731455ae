from climateparameterizations_jl_tpu.core.grid import ColumnGrid
from climateparameterizations_jl_tpu.core.operators import (
    d_face_to_center,
    d_center_to_face,
    cell_to_cell_derivative,
    D_center_matrix,
    D_face_matrix,
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

__all__ = [
    "ColumnGrid",
    "d_face_to_center",
    "d_center_to_face",
    "cell_to_cell_derivative",
    "D_center_matrix",
    "D_face_matrix",
    "ZeroMeanUnitVarianceScaling",
    "MinMaxScaling",
    "fit_scaling",
    "coarse_grain_center",
    "coarse_grain_face",
    "coarse_grain_linear_interpolation",
    "smoothing_filter",
    "convective_adjust_profile",
]
