from climateparameterizations_jl_tpu.ops.tridiagonal import (
    tridiagonal_solve,
    implicit_diffusion_matrix,
    implicit_diffusion_step,
)

__all__ = [
    "tridiagonal_solve",
    "implicit_diffusion_matrix",
    "implicit_diffusion_step",
]
