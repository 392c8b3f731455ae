from climateparameterizations_jl_tpu.models.timestepper import solve_fixed_step, rk4_step, euler_step, heun_step
from climateparameterizations_jl_tpu.models.wind_mixing import (
    WindMixingModel,
    WindMixingScalings,
    BoundaryConditions,
    FluxNNs,
    PackedFluxNNs,
    pack_flux_nns,
    wind_mixing_rhs,
    predict_flux,
    solve_wind_mixing_nde,
    solve_wind_mixing_split,
)
from climateparameterizations_jl_tpu.models.free_convection import (
    FreeConvectionModel,
    free_convection_rhs,
    solve_free_convection_nde,
)

__all__ = [
    "solve_fixed_step",
    "rk4_step",
    "euler_step",
    "heun_step",
    "WindMixingModel",
    "WindMixingScalings",
    "BoundaryConditions",
    "FluxNNs",
    "PackedFluxNNs",
    "pack_flux_nns",
    "wind_mixing_rhs",
    "predict_flux",
    "solve_wind_mixing_nde",
    "solve_wind_mixing_split",
    "FreeConvectionModel",
    "free_convection_rhs",
    "solve_free_convection_nde",
]
