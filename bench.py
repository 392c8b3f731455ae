"""Headline benchmark: forward column-timesteps/sec at 32 levels x 1024 columns.

Runs the flagship wind-mixing column model (mPP Ri-dependent diffusivity +
triple-NN flux closure, the full ``predict_flux`` + ``predict_NDE`` RHS) as a
fused ``lax.scan`` of RK4 steps over a 1024-column batch, and reports

    column-timesteps/sec = n_columns * n_steps / wall_seconds

Baseline: the reference's only recorded comparable number — the OceanTurb
KPP full 2-day column evolution, 25.762 ms single-column CPU
(``wind_mixing/Benchmarking.jl:25``). The model steps at the dataset's
save spacing (``k_profile_parameterization.jl:67``), so the 2-day run is
~288 steps at 600 s => ~1.1e4 column-timesteps/s; the 4.5e4 constant kept
here reads the run as 1153 steps — GENEROUS to the reference by ~4x, so
every ``vs_baseline`` this prints is conservative.

Prints ONE JSON line.
"""

from __future__ import annotations

import json

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
    import time

    # A caller that already forced CPU (e.g. `climparam --platform cpu
    # benchmark` sets jax_platforms in-process before exec'ing main()) must
    # not be second-guessed: probing the DEFAULT backend from a subprocess
    # would label the headline with a backend the parent never computes on,
    # and would block for minutes on the excluded TPU tunnel. (The ambient
    # container default is "axon,cpu", so only a cpu-FIRST value means the
    # caller opted out of the tunnel.)
    configured = jax.config.jax_platforms or ""
    if configured.split(",")[0] == "cpu":
        return "cpu"

    # The tunnel's wedges are often transient (it serializes clients);
    # probe a few times before surrendering the round's headline number
    # to the CPU fallback. Only a TIMEOUT is worth retrying — an instant
    # non-zero exit (broken install, import error) is deterministic.
    for attempt in range(5):
        if attempt:
            time.sleep(120.0)
        try:
            out = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=timeout_s,
            )
            platform = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            if out.returncode == 0 and platform:
                return platform
            break  # fast deterministic failure: no point sleeping and re-probing
        except subprocess.TimeoutExpired:
            pass
        except OSError:
            break
    jax.config.update("jax_platforms", "cpu")
    return "cpu (tpu unavailable)"


def main():
    platform = _resolve_platform()
    # ONE implementation of the headline configuration: bench_nde_forward
    # (benchmarks.py) runs the identical packed-NN RK4 scan at 1024 columns
    # x 1024 steps with pipelined timing — a second copy here could silently
    # drift from the suite's.
    from climateparameterizations_jl_tpu.benchmarks import bench_nde_forward

    stats = bench_nde_forward(n_columns=1024, n_steps=1024, packed=True, unroll=4)
    column_timesteps_per_sec = stats["column_timesteps_per_sec"]
    # Label the headline with the backend that actually produced the number
    # (safe here: the run completed, so the parent's backend is initialized;
    # the probe's answer could in principle differ from the parent's).
    actual = jax.devices()[0].platform
    platform = actual if "unavailable" not in platform else f"{actual} (tpu unavailable)"
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
