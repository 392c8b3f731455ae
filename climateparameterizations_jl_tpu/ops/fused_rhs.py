"""Fused wind-mixing RHS + multi-step RK4 as a single Pallas TPU kernel.

The forward hot loop of the framework is the wind-mixing NDE right-hand side
(``models/wind_mixing.py`` — parity ``wind_mixing/src/NDE_training.jl:83-165``)
called 4x per RK4 step inside a ``lax.scan``. This kernel runs an entire
RK4 trajectory segment (``n_steps`` steps) inside one ``pallas_call``:
state, packed weights, and every intermediate live in VMEM for the whole
segment, with a single HBM read of ``x0`` and one write of the result per
column tile.

Layout choices (measured on TPU):

- **Columns on sublanes, features on lanes** ``(C, 96)`` — the natural
  array layout. All d/dz stencils are *lane* slices of one packed gradient
  (one ``x[:, 1:] - x[:, :-1]`` computes du/dz, dv/dz, dT/dz together; the
  two junk columns at the u|v|T seams are sliced away). The
  features-on-sublanes variant is ~20x slower: every stencil becomes an
  unaligned sublane shift.
- **One matmul chain per RHS**: the three flux MLPs (each 96->50->20->31)
  are packed into block matrices ``(96, 150)``, ``(150, 60)`` (block-diag),
  ``(60, 93)`` (block-diag) — 3 MXU contractions instead of 9.

Performance note (measured, TPU via axon): the sequential RK4 chain is
op-issue *latency*-bound (~25 dependent small ops per RHS), where XLA's
scan scheduler currently beats this kernel (5.9e7 vs 3.5e7 col-ts/s at 1k
columns; 1.4e8 vs 4.3e7 at 16k) — so the framework's default forward path
stays on XLA (``bench.py``). The block-packing trick below also pays on
the XLA path: ``models.wind_mixing.PackedFluxNNs`` applies the same
3-matmul chain under jit/scan (7.5e7 col-ts/s at 1k columns with
``unroll=4``, +24% over per-flux MLPs) and is the headline configuration. The kernel remains as (a) the zero-HBM-traffic
template for fusing column physics (valuable when interleaved with
HBM-pressured work), and (b) a correctness-validated Pallas reference.
Raw Pallas matmul on this backend reaches ~100 TFLOP/s (f32) vs ~16 for
XLA, so MXU-bound kernels (GP Gram matrices) are where Pallas pays off.
Use :func:`make_fused_runner` for repeated segments — per-call weight
re-upload through the remote-TPU tunnel otherwise dominates (8e6 col-ts/s).

Scope: non-diurnal, zero_weights=True flux semantics (the flagship
benchmark configuration). Scalar coefficients are baked into the kernel at
trace time (call outside jit). Forward-only — training uses the
differentiable XLA path. Validated against ``wind_mixing_rhs`` in
interpret mode (``tests/test_fused_rhs.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_block_weights(nns, Nz: int, dtype=np.float32):
    """Pack the three flux MLPs into right-multiply block matrices.

    Returns ``(A1, b1, A2, b2, A3, b3)`` with ``A1 (3Nz, 3h1)``,
    ``A2 (3h1, 3h2)`` / ``A3 (3h2, 3(Nz-1))`` block-diagonal, and biases as
    ``(1, n)`` rows, so the chain is ``y = mish(mish(x@A1+b1)@A2+b2)@A3+b3``.
    """
    mlps = [nns.uw, nns.vw, nns.wT]
    h1 = mlps[0].weights[0].shape[0]
    h2 = mlps[0].weights[1].shape[0]
    n_out = mlps[0].weights[2].shape[0]
    assert n_out == Nz - 1, "flux MLPs must output Nz-1 interior faces"

    A1 = np.concatenate([np.asarray(m.weights[0], dtype).T for m in mlps], axis=1)  # (3Nz, 3h1)
    b1 = np.concatenate([np.asarray(m.biases[0], dtype) for m in mlps])[None, :]
    A2 = np.zeros((3 * h1, 3 * h2), dtype)
    b2 = np.concatenate([np.asarray(m.biases[1], dtype) for m in mlps])[None, :]
    A3 = np.zeros((3 * h2, 3 * n_out), dtype)
    b3 = np.concatenate([np.asarray(m.biases[2], dtype) for m in mlps])[None, :]
    for i, m in enumerate(mlps):
        A2[i * h1 : (i + 1) * h1, i * h2 : (i + 1) * h2] = np.asarray(m.weights[1], dtype).T
        A3[i * h2 : (i + 1) * h2, i * n_out : (i + 1) * n_out] = np.asarray(m.weights[2], dtype).T
    return (A1, b1, A2, b2, A3, b3), (h1, h2, n_out)


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _scalar_constants(model, bcs) -> tuple:
    """Extract the hashable scalar tuple that parameterizes the kernel."""
    s = model.scalings
    Hga = float(model.H) * float(model.g) * float(model.alpha)
    z_u, z_v, z_T = float(s.uw.scale(0.0)), float(s.vw.scale(0.0)), float(s.wT.scale(0.0))
    return (
        Hga,
        float(s.u.sigma), float(s.v.sigma), float(s.T.sigma),
        float(s.u.mu), float(s.v.mu),
        float(s.uw.sigma), float(s.vw.sigma), float(s.wT.sigma),
        float(model.mpp.nu_0), float(model.mpp.nu_minus),
        float(model.mpp.Ri_c), float(model.mpp.delta_Ri), float(model.mpp.Pr),
        float(model.H), float(model.tau), float(model.f),
        float(bcs.uw_bot) - z_u, float(bcs.uw_top) - z_u,
        float(bcs.vw_bot) - z_v, float(bcs.vw_top) - z_v,
        float(bcs.wT_bot) - z_T, float(bcs.wT_top) - z_T,
    )


def _make_kernel(consts: tuple, dt: float, n_steps: int, Nz: int, activation: str):
    """Build the kernel body with all scalar coefficients baked in."""
    dz = 1.0 / Nz  # non-dimensional dz_hat
    eps = 1e-7
    (
        Hga, sig_u, sig_v, sig_T, mu_u, mu_v, sig_uw, sig_vw, sig_wT,
        nu0, nu1, Ric, dRi, Pr, H, tau, fcor,
        uw_bot, uw_top, vw_bot, vw_top, wT_bot, wT_top,
    ) = consts
    cu = sig_u / sig_uw / H
    cv = sig_v / sig_vw / H
    cT = sig_T / sig_wT / H / Pr
    r = tau / H

    if activation == "mish":
        act = _mish
    elif activation == "relu":
        act = jax.nn.relu
    else:
        # Silent substitution would quietly diverge from the validated XLA
        # path (closures/mlp supports tanh/gelu/swish too).
        raise NotImplementedError(
            f"fused RK4 kernel supports activation 'mish' or 'relu', got {activation!r}; "
            "use the XLA path (wind_mixing_rhs) for other activations"
        )
    ni = Nz - 1

    def rhs(x, A1, b1, A2, b2, A3, b3):
        """x: (C, 3Nz) — returns dx/dt_hat, same shape.

        Per-variable lane slices at 32-lane offsets; a "packed" variant that
        differenced all three variables in one op measured ~4x slower (the
        seam-offset slices/concats force cross-lane repacking).
        """
        u = x[:, 0:Nz]
        v = x[:, Nz : 2 * Nz]
        T = x[:, 2 * Nz : 3 * Nz]
        dudz = (u[:, 1:] - u[:, :-1]) / dz
        dvdz = (v[:, 1:] - v[:, :-1]) / dz
        dTdz = (T[:, 1:] - T[:, :-1]) / dz

        # eps regularizes the Ri gradients only (NDE_training.jl:115-119).
        Ri = Hga * sig_T * (dTdz + eps) / ((sig_u * (dudz + eps)) ** 2 + (sig_v * (dvdz + eps)) ** 2)
        nu = nu0 + nu1 * (1.0 - jnp.tanh((Ri - Ric) / dRi)) * 0.5

        # NN interior fluxes: one packed matmul chain (3 MXU ops).
        a1 = act(jnp.dot(x, A1, preferred_element_type=jnp.float32) + b1)
        a2 = act(jnp.dot(a1, A2, preferred_element_type=jnp.float32) + b2)
        y = jnp.dot(a2, A3, preferred_element_type=jnp.float32) + b3  # (C, 3 ni)

        # Total interior face fluxes (NN - mPP downgradient).
        uw_i = y[:, 0:ni] - cu * nu * dudz
        vw_i = y[:, ni : 2 * ni] - cv * nu * dvdz
        wT_i = y[:, 2 * ni : 3 * ni] - cT * nu * dTdz

        def div(flux_i, bot, top):
            # faces [bot, flux_i, top]; cell divergence (f[k+1] - f[k]) / dz.
            interior = (flux_i[:, 1:] - flux_i[:, :-1]) / dz
            first = (flux_i[:, 0:1] - bot) / dz
            last = (top - flux_i[:, -1:]) / dz
            return jnp.concatenate([first, interior, last], axis=1)  # (C, Nz)

        dudt = -r * sig_uw / sig_u * div(uw_i, uw_bot, uw_top) + fcor * tau / sig_u * (sig_v * v + mu_v)
        dvdt = -r * sig_vw / sig_v * div(vw_i, vw_bot, vw_top) - fcor * tau / sig_v * (sig_u * u + mu_u)
        dTdt = -r * sig_wT / sig_T * div(wT_i, wT_bot, wT_top)
        return jnp.concatenate([dudt, dvdt, dTdt], axis=1)

    def kernel(x_ref, A1_ref, b1_ref, A2_ref, b2_ref, A3_ref, b3_ref, out_ref):
        A1, b1 = A1_ref[:], b1_ref[:]
        A2, b2 = A2_ref[:], b2_ref[:]
        A3, b3 = A3_ref[:], b3_ref[:]

        def step(_, x):
            k1 = rhs(x, A1, b1, A2, b2, A3, b3)
            k2 = rhs(x + 0.5 * dt * k1, A1, b1, A2, b2, A3, b3)
            k3 = rhs(x + 0.5 * dt * k2, A1, b1, A2, b2, A3, b3)
            k4 = rhs(x + dt * k3, A1, b1, A2, b2, A3, b3)
            return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        out_ref[:] = jax.lax.fori_loop(0, n_steps, step, x_ref[:])

    return kernel


@functools.lru_cache(maxsize=32)
def _compiled_multistep(consts: tuple, dt: float, n_steps: int, Nz: int, activation: str, n_columns: int, cb: int, interpret: bool):
    """Build + jit one pallas_call per (constants, shapes) key.

    Without this cache every call would rebuild the kernel closure and
    recompile (~seconds); with it, repeated calls hit the jit cache.
    """
    kernel = _make_kernel(consts, dt, n_steps, Nz, activation)
    nF = 3 * Nz
    grid = (pl.cdiv(n_columns, cb),)
    weight_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((cb, nF), lambda j: (j, 0), memory_space=pltpu.VMEM),
            weight_spec(), weight_spec(), weight_spec(),
            weight_spec(), weight_spec(), weight_spec(),
        ],
        out_specs=pl.BlockSpec((cb, nF), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_columns, nF), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(call)


def make_fused_runner(
    model,
    nns,
    bcs,
    dt: float,
    n_steps: int,
    n_columns: int,
    column_block: int = 512,
    interpret: bool = False,
):
    """Build ``run(x0) -> x_final`` with weights packed and device-resident.

    Packing + host->device upload of the block weights happens ONCE here;
    per-call overhead is a single input/output array round-trip. Use this
    for repeated segments (benchmarks, long ensembles, serving).

    Call OUTSIDE jit: scalar model constants are baked into the kernel
    (concrete floats), which is what makes the body a straight-line VMEM
    program.
    """
    assert not model.diurnal, "fused kernel covers the non-diurnal configuration"
    assert model.use_mpp and model.zero_weights, "fused kernel implements the mPP + zero_weights flux path"
    Nz = model.Nz
    (A1, b1, A2, b2, A3, b3), _ = _pack_block_weights(nns, Nz)
    weights = tuple(jax.device_put(jnp.asarray(a)) for a in (A1, b1, A2, b2, A3, b3))

    cb = min(column_block, n_columns)
    call = _compiled_multistep(
        _scalar_constants(model, bcs), float(dt), int(n_steps), Nz,
        nns.uw.activation, n_columns, cb, interpret,
    )

    def run(x0):
        return call(jnp.asarray(x0, jnp.float32), *weights)

    return run


def fused_wind_mixing_multistep(
    model,
    nns,
    bcs,
    x0,
    dt: float,
    n_steps: int,
    column_block: int = 512,
    interpret: bool = False,
):
    """One-shot convenience wrapper around :func:`make_fused_runner`."""
    run = make_fused_runner(model, nns, bcs, dt, n_steps, x0.shape[0], column_block, interpret)
    return run(x0)
