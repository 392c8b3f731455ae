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

Tunnel robustness: the axon TPU tunnel can wedge so hard that backend init
— or a dispatch mid-benchmark — blocks forever. When the TPU is in play,
the WHOLE benchmark therefore runs in a child process under a watchdog
(``python bench.py --child``): the parent retries a few times (wedges are
often transient; the tunnel serializes clients) and finally falls back to
an in-process CPU run, so the driver always gets its one JSON line. A
caller that already forced CPU (e.g. ``climparam --platform cpu
benchmark`` sets jax_platforms cpu-first before exec'ing main()) keeps the
direct in-process path — no subprocess, no tunnel.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys

import jax

BASELINE_COLUMN_TIMESTEPS_PER_SEC = 4.5e4

# One child attempt must cover first-compile (20-40 s) + the pipelined
# timed run with generous slack; a healthy run finishes in ~1-2 min.
CHILD_TIMEOUT_S = 600.0
CHILD_ATTEMPTS = 3
RETRY_SLEEP_S = 90.0


def _run_headline() -> dict:
    """Compute the headline stats on the CURRENT default backend."""
    # ONE implementation of the headline configuration: bench_nde_forward
    # (benchmarks.py) runs the identical packed-NN RK4 scan at 1024 columns
    # x 1024 steps with pipelined timing — a second copy here could silently
    # drift from the suite's.
    from climateparameterizations_jl_tpu.benchmarks import bench_nde_forward

    stats = bench_nde_forward(n_columns=1024, n_steps=1024, packed=True, unroll=4)
    return {
        "value": stats["column_timesteps_per_sec"],
        "platform": jax.devices()[0].platform,
    }


def _payload(value: float, platform: str) -> dict:
    return {
        "metric": "column-timesteps/sec (fwd, mPP+3NN RHS, RK4, 32 levels x 1024 columns)",
        "value": round(value, 1),
        "unit": "column-timesteps/s",
        "vs_baseline": round(value / BASELINE_COLUMN_TIMESTEPS_PER_SEC, 2),
        "platform": platform,
    }


def _child_main() -> None:
    r = _run_headline()
    print(json.dumps(_payload(r["value"], r["platform"])))


def main():
    # A cpu-FIRST jax_platforms means the caller opted out of the tunnel
    # (the ambient container default is "axon,cpu"): run in-process.
    configured = jax.config.jax_platforms or ""
    if configured.split(",")[0] == "cpu":
        r = _run_headline()
        print(json.dumps(_payload(r["value"], r["platform"])))
        return

    import subprocess
    import time

    cpu_fallback_line = None
    for attempt in range(CHILD_ATTEMPTS):
        if attempt:
            time.sleep(RETRY_SLEEP_S)
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--child"],
                capture_output=True, text=True, timeout=CHILD_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            continue  # wedged tunnel: transient more often than not — retry
        except OSError:
            break
        lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
        if out.returncode == 0 and lines:
            payload = json.loads(lines[-1])
            # A fast-failing tunnel makes jax fall back to cpu INSIDE the
            # child ("axon,cpu" default), which exits 0 with a cpu-labeled
            # number. That is a degraded result, not a success: keep it as
            # a last resort but retry for the chip.
            if payload.get("platform") == "cpu":
                payload["platform"] = "cpu (tpu unavailable)"
                cpu_fallback_line = json.dumps(payload)
                continue
            print(lines[-1])
            return
        # Fast deterministic failure (import error, broken install): no
        # point burning the retry budget on it.
        break

    if cpu_fallback_line is not None:
        print(cpu_fallback_line)
        return

    # TPU unreachable: force CPU in THIS process (its backend was never
    # initialized — only children touched the tunnel) and record the
    # degradation in the platform label.
    jax.config.update("jax_platforms", "cpu")
    r = _run_headline()
    print(json.dumps(_payload(r["value"], f"{r['platform']} (tpu unavailable)")))


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        _child_main()
    else:
        main()
