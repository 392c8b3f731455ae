"""Headline benchmark: forward column-timesteps/sec at 32 levels x 1024 columns.

Runs the flagship wind-mixing column model (mPP Ri-dependent diffusivity +
triple-NN flux closure, the full ``predict_flux`` + ``predict_NDE`` RHS) as a
fused ``lax.scan`` of RK4 steps over a 1024-column batch, and reports

    column-timesteps/sec = n_columns * n_steps / wall_seconds

Baseline: the reference's only recorded comparable number — the OceanTurb
KPP full 2-day column evolution, 25.762 ms for ~1153 steps of a single
column on CPU (``wind_mixing/Benchmarking.jl:25``) => ~4.5e4
column-timesteps/sec. ``vs_baseline`` is the speedup over that.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax

BASELINE_COLUMN_TIMESTEPS_PER_SEC = 4.5e4


def _resolve_platform(timeout_s: float = 180.0) -> str:
    """Probe the default backend in a SUBPROCESS with a watchdog.

    The axon TPU tunnel can wedge so hard that backend init blocks forever
    (and holds jax's global backend lock, so an in-process thread probe
    would deadlock the fallback too). A child process either prints the
    platform in time or is killed; on timeout/failure this process forces
    CPU before its own backend ever initializes.
    """
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        platform = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if out.returncode == 0 and platform:
            return platform
    except (subprocess.TimeoutExpired, OSError):
        pass
    jax.config.update("jax_platforms", "cpu")
    return "cpu (tpu unavailable)"


def main():
    platform = _resolve_platform()
    import jax.numpy as jnp
    from __graft_entry__ import _make_setup
    from climateparameterizations_jl_tpu.models.timestepper import rk4_step
    from climateparameterizations_jl_tpu.models.wind_mixing import pack_flux_nns, wind_mixing_rhs

    n_columns = 1024
    n_steps = 1024
    model, raw_nns, bcs, x0 = _make_setup(Nz=32, n_columns=n_columns)
    # The three flux MLPs fused into one block matmul chain (+16% on the
    # latency-bound RK4 chain; see models.wind_mixing.PackedFluxNNs).
    nns = pack_flux_nns(raw_nns)
    dt = jnp.float32(1e-5)

    @jax.jit
    def run(nns, x):
        rhs = lambda x, t: wind_mixing_rhs(model, nns, bcs, x, t)  # noqa: E731

        def body(x, i):
            return rk4_step(rhs, x, i * dt, dt), None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_steps, dtype=jnp.float32), unroll=4)
        return x

    # Warmup/compile.
    out = run(nns, x0)
    jax.block_until_ready(out)

    reps = 5
    start = time.perf_counter()
    for _ in range(reps):
        out = run(nns, out)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    column_timesteps_per_sec = n_columns * n_steps * reps / elapsed
    print(
        json.dumps(
            {
                "metric": "column-timesteps/sec (fwd, mPP+3NN RHS, RK4, 32 levels x 1024 columns)",
                "value": round(column_timesteps_per_sec, 1),
                "unit": "column-timesteps/s",
                "vs_baseline": round(column_timesteps_per_sec / BASELINE_COLUMN_TIMESTEPS_PER_SEC, 2),
                "platform": platform,
            }
        )
    )


if __name__ == "__main__":
    main()
