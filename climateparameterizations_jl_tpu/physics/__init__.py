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
]
