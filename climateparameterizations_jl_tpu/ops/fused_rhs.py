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

Round-2 additions attacking the latency-bound chain (awaiting chip A/B,
``studies/fused_kernel_sweep.py``):

- :func:`make_fused_runner_mxu` — the MXU-assembly kernel variant: packed
  stencil gradients via one roll-by-1 subtract, flux divergence + tendency
  scalings as a single baked bidiagonal matmul (:func:`divergence_matrix`),
  Coriolis as two aligned ``Nz``-lane rolls; ~13-deep dependent chain vs
  ~25 for v1, tunable ``column_block`` (v1 measured at cb=512 only, where
  per-op tile work is too small to amortize issue latency).
- :func:`make_fast_rhs` — the same assembly on the plain XLA path
  (jit/scan/vmap/grad-safe), A/B-able against ``PackedFluxNNs`` +
  ``wind_mixing_rhs`` via ``benchmarks.bench_nde_forward(rhs_variant=...)``.
- The split stepper reuses the divergence/BC-row machinery via
  ``models.wind_mixing.solve_wind_mixing_split(fast_assembly=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_block_weights(nns, Nz: int, dtype=np.float32, pad_to_block: bool = False):
    """Pack the three flux MLPs into right-multiply block matrices.

    Returns ``(A1, b1, A2, b2, A3, b3)`` with ``A1 (3Nz, 3h1)``,
    ``A2 (3h1, 3h2)`` / ``A3`` block-diagonal, and biases as ``(1, n)``
    rows, so the chain is ``y = mish(mish(x@A1+b1)@A2+b2)@A3+b3``.

    With ``pad_to_block=False`` the last layer writes the compact
    ``(C, 3 (Nz-1))`` layout. With ``pad_to_block=True`` it writes the
    block-aligned ``(C, 3 Nz)`` layout instead: block ``b`` occupies lanes
    ``[b Nz, (b+1) Nz)`` with the interior-face fluxes in lanes ``0..Nz-2``
    and a structural zero in the seam lane — the layout the MXU-assembly
    kernel keeps everything on (aligned 32-lane offsets are the cheap ones
    on the VPU, and the flux array feeds the divergence matmul without
    repacking).
    """
    mlps = [nns.uw, nns.vw, nns.wT]
    h1 = mlps[0].weights[0].shape[0]
    h2 = mlps[0].weights[1].shape[0]
    n_out = mlps[0].weights[2].shape[0]
    assert n_out == Nz - 1, "flux MLPs must output Nz-1 interior faces"
    stride = Nz if pad_to_block else n_out

    A1 = np.concatenate([np.asarray(m.weights[0], dtype).T for m in mlps], axis=1)  # (3Nz, 3h1)
    b1 = np.concatenate([np.asarray(m.biases[0], dtype) for m in mlps])[None, :]
    A2 = np.zeros((3 * h1, 3 * h2), dtype)
    b2 = np.concatenate([np.asarray(m.biases[1], dtype) for m in mlps])[None, :]
    A3 = np.zeros((3 * h2, 3 * stride), dtype)
    b3 = np.zeros((1, 3 * stride), dtype)
    for i, m in enumerate(mlps):
        A2[i * h1 : (i + 1) * h1, i * h2 : (i + 1) * h2] = np.asarray(m.weights[1], dtype).T
        A3[i * h2 : (i + 1) * h2, i * stride : i * stride + n_out] = np.asarray(m.weights[2], dtype).T
        b3[0, i * stride : i * stride + n_out] = np.asarray(m.biases[2], dtype)
    return (A1, b1, A2, b2, A3, b3), (h1, h2, n_out)


def _resolve_activation(activation: str):
    """Map the MLP activation name to its jnp form; raise on unsupported.

    Silent substitution would quietly diverge from the validated XLA path
    (``closures/mlp`` supports tanh/gelu/swish too).
    """
    if activation == "mish":
        return _mish
    if activation == "relu":
        return jax.nn.relu
    raise NotImplementedError(
        f"fused RHS paths support activation 'mish' or 'relu', got {activation!r}; "
        "use the XLA path (wind_mixing_rhs) for other activations"
    )


def _assert_fused_config(model):
    """The configuration every fused/fast path implements (and nothing else)."""
    assert not model.diurnal, "fused kernels cover the non-diurnal configuration"
    assert model.use_mpp and model.zero_weights, "fused kernels implement the mPP + zero_weights flux path"
    assert not model.smooth_NN and not model.smooth_Ri, (
        "fused kernels do not apply the NN/Ri smoothing filters; "
        "use the XLA path (wind_mixing_rhs) for smoothed models"
    )


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _scalar_constants(model, bcs=None) -> tuple:
    """Extract the hashable scalar tuple that parameterizes the kernel.

    ``bcs=None`` zeroes the BC tail — for callers that build the BC row
    from traced (possibly batched) BC arrays instead of baking scalars
    (``models.wind_mixing._fast_full_rhs``); the RHS body ignores the tail.
    """
    s = model.scalings
    Hga = float(model.H) * float(model.g) * float(model.alpha)
    # scale(0) computed in pure Python: a jnp op here would become a tracer
    # when this runs at trace time inside a jitted training step (the model
    # leaves are concrete closure constants — float() on them is fine, jnp
    # arithmetic on them is not).
    z_u = (0.0 - float(s.uw.mu)) / float(s.uw.sigma)
    z_v = (0.0 - float(s.vw.mu)) / float(s.vw.sigma)
    z_T = (0.0 - float(s.wT.mu)) / float(s.wT.sigma)
    if bcs is None:
        bc_tail = (0.0,) * 6
    else:
        bc_tail = (
            float(bcs.uw_bot) - z_u, float(bcs.uw_top) - z_u,
            float(bcs.vw_bot) - z_v, float(bcs.vw_top) - z_v,
            float(bcs.wT_bot) - z_T, float(bcs.wT_top) - z_T,
        )
    return (
        Hga,
        float(s.u.sigma), float(s.v.sigma), float(s.T.sigma),
        float(s.u.mu), float(s.v.mu),
        float(s.uw.sigma), float(s.vw.sigma), float(s.wT.sigma),
        float(model.mpp.nu_0), float(model.mpp.nu_minus),
        float(model.mpp.Ri_c), float(model.mpp.delta_Ri), float(model.mpp.Pr),
        float(model.H), float(model.tau), float(model.f),
    ) + bc_tail


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

    act = _resolve_activation(activation)
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


def tendency_coefficients(tau, H, sig_uw, sig_vw, sig_wT, sig_u, sig_v, sig_T):
    """``(R_u, R_v, R_T) = tau/H * sigma_flux / sigma_var``.

    The nondimensionalization convention of ``predict_NDE``
    (``NDE_training.jl:149-165``) — the ONE implementation behind
    ``_assembly_constants``, ``models.wind_mixing._tendency_coefficients``,
    and every Dr/BC-row assembly site.
    """
    r = tau / H
    return r * sig_uw / sig_u, r * sig_vw / sig_v, r * sig_wT / sig_T


def divergence_matrix(Ru: float, Rv: float, RT: float, Nz: int, dtype=np.float32) -> np.ndarray:
    """``(3 Nz, 3 Nz)`` matrix: packed interior-face fluxes -> scaled tendencies.

    Input lane ``b Nz + j`` (``j <= Nz - 2``) holds interior face ``j + 1``
    of variable ``b`` (seam lanes ``b Nz + Nz - 1`` have zero rows, so junk
    or padding there never reaches the output). Output lane ``b Nz + k`` is
    ``-R_b * (F[k+1] - F[k]) / dz`` — boundary faces excluded (they are
    constants; fold them into a separate row, e.g. ``Krow`` /
    ``models.wind_mixing._split_bc_row``).
    """
    dz = 1.0 / Nz
    R = (Ru, Rv, RT)
    Dr = np.zeros((3 * Nz, 3 * Nz), dtype)
    for b in range(3):
        o = b * Nz
        for k in range(Nz - 1):  # face k+1 feeds cells k (as F[k+1]) and k+1 (as F[k])
            Dr[o + k, o + k] = -R[b] / dz
            Dr[o + k, o + k + 1] = +R[b] / dz
    return Dr


def bc_tendency_row(Ru, Rv, RT, bots, tops, Nz: int):
    """The boundary-face BC contribution to the packed tendencies.

    ``sum_b R_b * Nz * (bot_b x e_{b Nz} - top_b x e_{b Nz + Nz - 1})`` —
    i.e. ``+R_b bot_b / dz`` at cell 0 and ``-R_b top_b / dz`` at cell
    ``Nz - 1`` of each variable block. ``bots``/``tops`` are 3-sequences of
    scalars or arrays already expanded to broadcast against a trailing
    ``(3 Nz,)`` axis. The ONE implementation behind both the fused kernels'
    baked ``Krow`` (:func:`_assembly_constants`) and the split stepper's
    batched/traced row (``models.wind_mixing._split_bc_row``).
    """
    K = None
    for b, R in enumerate((Ru, Rv, RT)):
        e_bot = np.zeros(3 * Nz, np.float32)
        e_bot[b * Nz] = 1.0
        e_top = np.zeros(3 * Nz, np.float32)
        e_top[b * Nz + Nz - 1] = 1.0
        term = (R * Nz) * (bots[b] * e_bot - tops[b] * e_top)
        K = term if K is None else K + term
    return K


def _assembly_constants(consts: tuple, Nz: int, dtype=np.float32):
    """Constant matrices/rows for the MXU-assembled RHS.

    Returns ``(Dr, Krow, w1, w2)``:

    - ``Dr (3 Nz, 3 Nz)``: total-flux lanes -> scaled flux-divergence
      tendencies. Input lane ``b Nz + j`` (``j <= Nz-2``) holds interior face
      ``j + 1`` of variable ``b``; seam lanes have zero rows, so the junk the
      roll-based gradient leaves there never reaches the output.
    - ``Krow (1, 3 Nz)``: the constant tendency — boundary-face BC fluxes
      (already in the ``bc - scale(0)`` convention) plus the Coriolis mean
      terms ``+f tau mu_v / sig_u`` / ``-f tau mu_u / sig_v``.
    - ``w1/w2 (1, 3 Nz)``: lane masks x coefficients for the rotation terms
      ``w1 * roll(x, -Nz) + w2 * roll(x, +Nz)`` (v into the u block, u into
      the v block; T lanes zero).
    """
    (
        Hga, sig_u, sig_v, sig_T, mu_u, mu_v, sig_uw, sig_vw, sig_wT,
        nu0, nu1, Ric, dRi, Pr, H, tau, fcor,
        uw_bot, uw_top, vw_bot, vw_top, wT_bot, wT_top,
    ) = consts
    R = tendency_coefficients(tau, H, sig_uw, sig_vw, sig_wT, sig_u, sig_v, sig_T)
    bots = (uw_bot, vw_bot, wT_bot)
    tops = (uw_top, vw_top, wT_top)
    cf_u = fcor * tau / sig_u
    cf_v = fcor * tau / sig_v

    Dr = divergence_matrix(R[0], R[1], R[2], Nz, dtype)
    Krow = np.asarray(bc_tendency_row(R[0], R[1], R[2], bots, tops, Nz), dtype)[None, :].copy()
    w1 = np.zeros((1, 3 * Nz), dtype)
    w2 = np.zeros((1, 3 * Nz), dtype)
    Krow[0, 0:Nz] += cf_u * mu_v
    Krow[0, Nz : 2 * Nz] += -cf_v * mu_u
    w1[0, 0:Nz] = cf_u * sig_v
    w2[0, Nz : 2 * Nz] = -cf_v * sig_u
    return Dr, Krow, w1, w2


def fold_divergence_constants(consts: tuple, Nz: int, dtype=np.float32):
    """Lane-coefficient vectors replacing the ``mpp @ Dr`` matmul.

    ``Dr`` is bidiagonal within each variable block, so its action on the
    mPP flux lanes collapses to a roll-subtract with per-lane constants:

        ``mpp @ Dr == C2a * roll(nud, 1) - C2b * nud``

    where ``nud = concat([nu * du, nu * dv, nu * dT])`` (raw differences x
    nu, the per-variable mPP coefficients ``c_b`` folded into the vectors).
    ``C2b`` zeroes the seam input lanes (``b Nz + Nz - 1``, junk
    differences); ``C2a`` zeroes each block's first output lane (no
    ``k - 1`` face) — which also kills the cross-block leak of the previous
    block's seam lane under the packed roll. Used by the
    ``fold_divergence`` variant of :func:`_make_mxu_rhs`.
    """
    (
        Hga, sig_u, sig_v, sig_T, mu_u, mu_v, sig_uw, sig_vw, sig_wT,
        nu0, nu1, Ric, dRi, Pr, H, tau, fcor,
        *_bcs,
    ) = consts
    dz = 1.0 / Nz
    R = tendency_coefficients(tau, H, sig_uw, sig_vw, sig_wT, sig_u, sig_v, sig_T)
    c = (sig_u / sig_uw / H / dz, sig_v / sig_vw / H / dz, sig_T / sig_wT / H / Pr / dz)
    C2a = np.zeros(3 * Nz, dtype)
    C2b = np.zeros(3 * Nz, dtype)
    for b in range(3):
        o = b * Nz
        coef = R[b] / dz * c[b]
        C2a[o + 1 : o + Nz] = coef  # output lane k>=1 reads input lane k-1 (<= Nz-2)
        C2b[o : o + Nz - 1] = coef  # output lane k<=Nz-2 reads input lane k
    return C2a, C2b


def _make_mxu_rhs(consts: tuple, Nz: int, activation: str, matmul_dtype=None, fold_divergence: bool = False):
    """The MXU-assembly RHS body, shared by the Pallas kernel and the XLA twin.

    Replaces the v1 kernel's slice/concat divergence + Coriolis chains with
    one matmul against the baked bidiagonal ``Dr`` plus two aligned
    ``Nz``-lane rolls, and computes all three stencil gradients with a
    single roll-by-1 subtraction in the packed ``(..., 3 Nz)`` layout (seam
    junk stays in the per-block pad lane, zeroed by ``Dr``'s rows). The
    dependent-op chain per RHS is ~13 deep vs ~25 for v1.

    ``matmul_dtype`` (e.g. ``jnp.bfloat16``) casts the NN matmul inputs,
    with f32 accumulation; ``None`` keeps them f32. Returns
    ``rhs(x, A1, b1, A2, b2, A3, b3, Dr, Krow, w1, w2)`` acting on the last
    axis (any leading batch shape).

    ``fold_divergence=True`` removes the ``(..., 3 Nz) @ (3 Nz, 3 Nz)``
    divergence matmul from the chain entirely (~24% of the matmul FLOPs at
    MXU-bound batch sizes): the NN side precomposes into the last layer
    (caller passes ``A3f = A3 @ Dr``, ``b3f = b3 @ Dr``) and the mPP side
    collapses to a roll-subtract with the :func:`fold_divergence_constants`
    lane vectors. Returned signature becomes
    ``rhs(x, A1, b1, A2, b2, A3f, b3f, C2a, C2b, Krow, w1, w2)``.
    """
    dz = 1.0 / Nz
    eps = 1e-7
    (
        Hga, sig_u, sig_v, sig_T, mu_u, mu_v, sig_uw, sig_vw, sig_wT,
        nu0, nu1, Ric, dRi, Pr, H, tau, fcor,
        *_bcs,
    ) = consts
    # Ri on raw (un-divided) differences d = x[k+1] - x[k]:
    #   Ri = aT (dT + eps dz) / (au (du + eps dz)^2 + av (dv + eps dz)^2)
    epsdz = eps * dz
    au = (sig_u / dz) ** 2
    av = (sig_v / dz) ** 2
    aT = Hga * sig_T / dz
    # nu = n_a + n_b * tanh(t_a Ri + t_b)
    n_a = nu0 + 0.5 * nu1
    n_b = -0.5 * nu1
    t_a = 1.0 / dRi
    t_b = -Ric / dRi
    # mPP interior flux on raw differences: c_b * nu * d  (c folds 1/dz)
    cu = sig_u / sig_uw / H / dz
    cv = sig_v / sig_vw / H / dz
    cT = sig_T / sig_wT / H / Pr / dz

    act = _resolve_activation(activation)
    mdt = matmul_dtype

    def mm(x, A):
        if mdt is None:
            # Follow the state dtype: this body also serves the differentiable
            # f64 training path (models.wind_mixing._fast_full_rhs), where a
            # hardcoded f32 preference would silently downcast every matmul.
            return jnp.dot(x, A, preferred_element_type=x.dtype)
        return jnp.dot(x.astype(mdt), A, preferred_element_type=jnp.float32)

    def rhs(x, A1, b1, A2, b2, A3, b3, Dr, Krow, w1, w2):
        d = jnp.roll(x, -1, axis=-1) - x  # packed raw differences; seam lanes junk
        du = d[..., 0:Nz]
        dv = d[..., Nz : 2 * Nz]
        dT = d[..., 2 * Nz : 3 * Nz]
        eu = du + epsdz
        ev = dv + epsdz
        eT = dT + epsdz
        Ri = aT * eT / (au * eu * eu + av * ev * ev)
        nu = n_a + n_b * jnp.tanh(t_a * Ri + t_b)

        a1 = act(mm(x, A1) + b1)
        a2 = act(mm(a1, A2) + b2)
        y = mm(a2, A3) + b3  # (..., 3 Nz), seam lanes structurally zero

        mpp = jnp.concatenate([cu * (nu * du), cv * (nu * dv), cT * (nu * dT)], axis=-1)
        flux = y - mpp
        cor = w1 * jnp.roll(x, -Nz, axis=-1) + w2 * jnp.roll(x, Nz, axis=-1)
        return jnp.dot(flux, Dr, preferred_element_type=flux.dtype) + cor + Krow

    def rhs_folded(x, A1, b1, A2, b2, A3f, b3f, C2a, C2b, Krow, w1, w2):
        d = jnp.roll(x, -1, axis=-1) - x  # packed raw differences; seam lanes junk
        du = d[..., 0:Nz]
        dv = d[..., Nz : 2 * Nz]
        dT = d[..., 2 * Nz : 3 * Nz]
        eu = du + epsdz
        ev = dv + epsdz
        eT = dT + epsdz
        Ri = aT * eT / (au * eu * eu + av * ev * ev)
        nu = n_a + n_b * jnp.tanh(t_a * Ri + t_b)

        a1 = act(mm(x, A1) + b1)
        a2 = act(mm(a1, A2) + b2)
        ydiv = mm(a2, A3f) + b3f  # NN flux divergence: Dr precomposed into the last layer

        nud = jnp.concatenate([nu * du, nu * dv, nu * dT], axis=-1)
        mppdiv = C2a * jnp.roll(nud, 1, axis=-1) - C2b * nud
        cor = w1 * jnp.roll(x, -Nz, axis=-1) + w2 * jnp.roll(x, Nz, axis=-1)
        return ydiv - mppdiv + cor + Krow

    return rhs_folded if fold_divergence else rhs


def _make_kernel_mxu(consts: tuple, dt: float, n_steps: int, Nz: int, activation: str, matmul_dtype, loop_unroll: int = 1):
    """Pallas kernel body around :func:`_make_mxu_rhs` (RK4 x ``n_steps``).

    ``loop_unroll`` unrolls the fori_loop body (more scheduling freedom for
    Mosaic on the dependent chain, at the cost of program size).
    """
    rhs = _make_mxu_rhs(consts, Nz, activation, matmul_dtype)

    def kernel(x_ref, A1_ref, b1_ref, A2_ref, b2_ref, A3_ref, b3_ref,
               Dr_ref, Krow_ref, w1_ref, w2_ref, out_ref):
        ws = (
            A1_ref[:], b1_ref[:], A2_ref[:], b2_ref[:], A3_ref[:], b3_ref[:],
            Dr_ref[:], Krow_ref[:], w1_ref[:], w2_ref[:],
        )

        def step(_, x):
            k1 = rhs(x, *ws)
            k2 = rhs(x + 0.5 * dt * k1, *ws)
            k3 = rhs(x + 0.5 * dt * k2, *ws)
            k4 = rhs(x + dt * k3, *ws)
            return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        out_ref[:] = jax.lax.fori_loop(0, n_steps, step, x_ref[:], unroll=loop_unroll)

    return kernel


@functools.lru_cache(maxsize=32)
def _compiled_multistep_mxu(consts: tuple, dt: float, n_steps: int, Nz: int, activation: str,
                            n_columns: int, cb: int, matmul_dtype_name: str, interpret: bool,
                            loop_unroll: int = 1):
    matmul_dtype = jnp.dtype(matmul_dtype_name)
    kernel = _make_kernel_mxu(consts, dt, n_steps, Nz, activation, matmul_dtype, loop_unroll)
    nF = 3 * Nz
    grid = (pl.cdiv(n_columns, cb),)
    weight_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((cb, nF), lambda j: (j, 0), memory_space=pltpu.VMEM)]
        + [weight_spec() for _ in range(10)],
        out_specs=pl.BlockSpec((cb, nF), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_columns, nF), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(call)


def make_fused_runner_mxu(
    model,
    nns,
    bcs,
    dt: float,
    n_steps: int,
    n_columns: int,
    column_block: int = 2048,
    matmul_dtype: str = "float32",
    interpret: bool = False,
    loop_unroll: int = 1,
):
    """MXU-assembly variant of :func:`make_fused_runner`.

    ``matmul_dtype="bfloat16"`` stores the NN block weights in bf16 and
    feeds the MXU bf16 inputs with f32 accumulation (the divergence matmul
    stays f32 — it carries the physics). Same restrictions as the v1
    runner: non-diurnal, ``use_mpp`` + ``zero_weights``, no smoothing,
    call outside jit.
    """
    _assert_fused_config(model)
    Nz = model.Nz
    consts = _scalar_constants(model, bcs)
    (A1, b1, A2, b2, A3, b3), _ = _pack_block_weights(nns, Nz, pad_to_block=True)
    Dr, Krow, w1, w2 = _assembly_constants(consts, Nz)
    wdt = jnp.dtype(matmul_dtype)
    weights = tuple(
        jax.device_put(jnp.asarray(a, dtype))
        for a, dtype in (
            (A1, wdt), (b1, jnp.float32), (A2, wdt), (b2, jnp.float32),
            (A3, wdt), (b3, jnp.float32),
            (Dr, jnp.float32), (Krow, jnp.float32), (w1, jnp.float32), (w2, jnp.float32),
        )
    )

    cb = min(column_block, n_columns)
    call = _compiled_multistep_mxu(
        consts, float(dt), int(n_steps), Nz, nns.uw.activation,
        n_columns, cb, str(wdt), interpret, int(loop_unroll),
    )

    def run(x0):
        return call(jnp.asarray(x0, jnp.float32), *weights)

    return run


def fused_wind_mixing_multistep_mxu(model, nns, bcs, x0, dt, n_steps,
                                    column_block: int = 2048,
                                    matmul_dtype: str = "float32",
                                    interpret: bool = False,
                                    loop_unroll: int = 1):
    """One-shot convenience wrapper around :func:`make_fused_runner_mxu`."""
    run = make_fused_runner_mxu(model, nns, bcs, dt, n_steps, x0.shape[0],
                                column_block, matmul_dtype, interpret, loop_unroll)
    return run(x0)


def make_fast_rhs(model, nns, bcs, fold_divergence: bool = False):
    """The MXU-assembly RHS on the plain XLA path (jit/scan/vmap/grad-safe).

    Same math as :func:`_make_kernel_mxu` — roll-based packed gradients,
    divergence + scalings as one baked bidiagonal matmul, Coriolis as two
    aligned rolls — but built from ``jnp`` ops so it composes with the
    standard solvers. Restricted to the fused kernels' configuration
    (non-diurnal, mPP + zero_weights); validated against
    :func:`~climateparameterizations_jl_tpu.models.wind_mixing.wind_mixing_rhs`
    in ``tests/test_fused_rhs.py``. Returns ``rhs(x, t)``.

    ``fold_divergence=True`` precomposes ``Dr`` into the last NN layer and
    replaces the mPP divergence matmul with the
    :func:`fold_divergence_constants` roll-subtract (constants folded in
    f64 before the f32 cast) — same math, one less ``(C, 3 Nz) x (3 Nz,
    3 Nz)`` matmul per RHS evaluation.
    """
    _assert_fused_config(model)
    Nz = model.Nz
    consts = _scalar_constants(model, bcs)
    (A1, b1, A2, b2, A3, b3), _ = _pack_block_weights(nns, Nz, dtype=np.float64, pad_to_block=True)
    Dr, Krow, w1, w2 = _assembly_constants(consts, Nz, dtype=np.float64)
    if fold_divergence:
        C2a, C2b = fold_divergence_constants(consts, Nz, dtype=np.float64)
        raw = (A1, b1, A2, b2, A3 @ Dr, b3 @ Dr, C2a, C2b, Krow, w1, w2)
    else:
        raw = (A1, b1, A2, b2, A3, b3, Dr, Krow, w1, w2)
    # Row constants as 1-D vectors: (1, n) rows would broadcast a leading
    # axis onto unbatched (3 Nz,) states.
    mats = tuple(
        jnp.asarray(a[0] if getattr(a, "ndim", 0) == 2 and a.shape[0] == 1 else a, jnp.float32)
        for a in raw
    )
    body = _make_mxu_rhs(consts, Nz, nns.uw.activation, fold_divergence=fold_divergence)

    def rhs(x, t):
        del t
        return body(x, *mats)

    return rhs


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
    _assert_fused_config(model)
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
