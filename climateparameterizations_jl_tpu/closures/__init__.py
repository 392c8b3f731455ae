from climateparameterizations_jl_tpu.closures.mlp import (
    MLP,
    mlp_init,
    mlp_apply,
    free_convection_mlp,
    wind_mixing_mlp,
    destructure,
)

__all__ = [
    "MLP",
    "mlp_init",
    "mlp_apply",
    "free_convection_mlp",
    "wind_mixing_mlp",
    "destructure",
]
