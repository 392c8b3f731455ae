"""Utilities: prediction helpers, basis decomposition, profiling/timing.

- :mod:`predict`    -> ``src/predict.jl:12-34``
- :mod:`polynomial` -> ``src/polynomial_decomposition.jl:6-65``
- :mod:`profiling`  -> the reference's ad-hoc BenchmarkTools scripts
  (``wind_mixing/Benchmarking.jl``), as first-class timing + jax-profiler
  trace helpers.
"""

from climateparameterizations_jl_tpu.utils.predict import predict
from climateparameterizations_jl_tpu.utils.polynomial import (
    basis_functions,
    polynomial_decomposition,
    reconstruct,
)
from climateparameterizations_jl_tpu.utils.profiling import Timer, time_fn, trace

__all__ = [
    "predict",
    "basis_functions",
    "polynomial_decomposition",
    "reconstruct",
    "Timer",
    "time_fn",
    "trace",
]
