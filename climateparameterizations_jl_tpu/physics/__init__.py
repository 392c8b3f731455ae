from climateparameterizations_jl_tpu.physics.richardson import (
    local_richardson,
    local_richardson_scaled,
    sanitize_richardson,
    richardson_profile,
)
from climateparameterizations_jl_tpu.physics.mpp import (
    MPPParameters,
    tanh_step,
    mpp_diffusivity,
)
from climateparameterizations_jl_tpu.physics.convective_adjustment import (
    convective_adjustment_flux,
    convective_adjustment_implicit_step,
)
from climateparameterizations_jl_tpu.physics.kpp import (
    KPPParameters,
    KPPForcing,
    KPPState,
    solve_kpp,
    boundary_layer_depth,
)
from climateparameterizations_jl_tpu.physics.tke import (
    TKEParameters,
    TKEState,
    solve_tke,
)

__all__ = [
    "local_richardson",
    "local_richardson_scaled",
    "sanitize_richardson",
    "richardson_profile",
    "MPPParameters",
    "tanh_step",
    "mpp_diffusivity",
    "convective_adjustment_flux",
    "convective_adjustment_implicit_step",
    "KPPParameters",
    "KPPForcing",
    "KPPState",
    "solve_kpp",
    "boundary_layer_depth",
    "TKEParameters",
    "TKEState",
    "solve_tke",
]
