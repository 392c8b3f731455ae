"""Adjoint-parity study: discrete grad-through-scan vs the continuous adjoint.

The reference trains its NDEs with adaptive solvers + a continuous
interpolating adjoint (ROCK4 + ``InterpolatingAdjoint(ZygoteVJP(),
checkpointing=true)``, ``free_convection/src/solve.jl:1-6``,
``wind_mixing/src/NDE_training.jl:290-323``). This repo substitutes
discretize-then-optimize: fixed-step ``lax.scan`` solves with gradients
through the scan. This study quantifies that substitution (SURVEY section 7
hard part #1, VERDICT r1 item 2):

1. **dt-refinement**: on a STIFF mPP case (nu jumps ~2 orders of magnitude
   across Ri_c with a narrow transition), the loss and its gradient for
   both the explicit rk4 and the operator-split (implicit diffusion)
   steppers must converge to the fine-step limit as dt -> 0. The fine-step
   solution IS the continuous-adjoint answer: both adjoints differentiate
   the same ODE, and they agree in the dt -> 0 limit; a discrete adjoint
   whose gradient converges with dt therefore converges to the continuous
   adjoint's gradient.
2. **training A/B**: same data, same NN init — train with the split
   stepper at a practical dt and with rk4; re-evaluate both trained NNs
   under a 16x finer solve. If the optimum found at practical dt transfers
   to the fine solve, training at fixed dt reaches the same place the
   reference's adaptive/continuous machinery would.

Run: ``python studies/adjoint_parity.py [--platform cpu] [--out docs/adjoint_parity.json]``
The committed numbers in docs/PERFORMANCE.md come from this script.
"""


from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (script lives in studies/)

import argparse
import dataclasses
import json

import numpy as np


def build_problem(stiff: bool = True, Nz: int = 32, n_frames: int = 12):
    import jax
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
    from climateparameterizations_jl_tpu.data.containers import (
        coarsen_dataset,
        fit_wind_mixing_scalings,
        stack_datasets,
        training_tensors,
    )
    from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingModel
    from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

    f32 = jnp.float32
    les = synthetic_wind_mixing_les(Qu=-5e-4, Qb=3e-8, Nz=64, n_save=n_frames, dt_save=600.0, n_substeps=2)
    coarse = [coarsen_dataset(les, Nz)]
    scalings = fit_wind_mixing_scalings(coarse)
    suite = stack_datasets(coarse)
    tau = jnp.abs(coarse[0].t[-1] - coarse[0].t[0])
    mpp = MPPParameters.default()
    if stiff:
        # nu_minus/nu_0 ~ 300x across a NARROW Ri transition: the regime the
        # reference handles with a stiff-capable adaptive solver.
        mpp = dataclasses.replace(
            mpp,
            nu_minus=jnp.asarray(3e-2, f32), nu_0=jnp.asarray(1e-4, f32),
            delta_Ri=jnp.asarray(0.02, f32), Ri_c=jnp.asarray(0.25, f32),
        )
    model = WindMixingModel(
        H=coarse[0].H, tau=tau, f=coarse[0].f, g=coarse[0].g, alpha=coarse[0].alpha,
        kappa=f32(10.0), scalings=scalings, mpp=mpp, Nz=Nz, zero_weights=True,
    )
    batch = training_tensors(suite, scalings, tsteps=np.arange(0, n_frames), tau=tau)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    nns = FluxNNs(*[wind_mixing_mlp(k, Nz, scale=1e-4) for k in ks])
    return model, batch, nns


def loss_and_grad(model, batch, nns, method: str, n_substeps: int):
    import jax
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, _solve

    config = NDETrainConfig(method=method, n_substeps=n_substeps, train_gradient=False)

    def loss_fn(nns):
        pred = _solve(model, nns, batch, config)
        return jnp.mean((pred - batch.targets) ** 2)

    loss, grad = jax.jit(jax.value_and_grad(loss_fn))(nns)
    return float(loss), grad


def flat(tree):
    import jax

    leaves = [np.asarray(x).ravel() for x in jax.tree.leaves(tree) if x is not None]
    return np.concatenate(leaves).astype(np.float64)


def dt_refinement(model, batch, nns, substeps=(1, 2, 4, 8, 16, 32), fine: int = 256):
    """Loss/gradient error vs dt for rk4 and split, against the fine limit."""
    rows = []
    # Fine-step limit: the split stepper at n_substeps=fine (A-stable on the
    # stiff diffusion; rk4 at this dt agrees — checked below).
    L_star, g_star_tree = loss_and_grad(model, batch, nns, "split", fine)
    g_star = flat(g_star_tree)
    L_rk4_fine, g_rk4_fine = loss_and_grad(model, batch, nns, "rk4", fine)
    agree = dict(
        loss_rel=abs(L_rk4_fine - L_star) / abs(L_star),
        grad_rel=float(np.linalg.norm(flat(g_rk4_fine) - g_star) / np.linalg.norm(g_star)),
    )
    for n in substeps:
        for method in ("rk4", "split"):
            L, g_tree = loss_and_grad(model, batch, nns, method, n)
            g = flat(g_tree)
            finite = np.isfinite(L) and np.isfinite(g).all()
            rows.append(dict(
                method=method, n_substeps=n,
                dt_s=600.0 / n,  # dt_save = 600 s, n substeps
                loss=L,
                loss_rel_err=abs(L - L_star) / abs(L_star) if finite else float("inf"),
                grad_rel_err=float(np.linalg.norm(g - g_star) / np.linalg.norm(g_star)) if finite else float("inf"),
                grad_cosine=float(g @ g_star / (np.linalg.norm(g) * np.linalg.norm(g_star))) if finite else float("nan"),
                finite=bool(finite),
            ))
    return rows, dict(L_star=L_star, solver_agreement_at_fine=agree)


def training_ab(model, batch, nns, maxiters: int = 150, lr: float = 3e-3):
    """Train with split vs rk4 at practical dt; evaluate both under a fine solve."""
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, _solve, train_wind_mixing_nde

    out = {}
    trained = {}
    for method, n_sub in (("split", 4), ("rk4", 4)):
        config = NDETrainConfig(learning_rate=lr, maxiters=maxiters, n_substeps=n_sub, method=method, train_gradient=False)
        nns_t, hist = train_wind_mixing_nde(model, nns, batch, config)
        trained[method] = nns_t
        out[method] = dict(
            loss_initial=float(hist[0].total()),
            loss_final=float(hist[-1].total()),
            loss_curve=[float(h.total()) for h in hist[:: max(1, maxiters // 30)]],
        )
    # Cross-evaluate under the fine split solve (the "continuous" yardstick).
    fine = NDETrainConfig(method="split", n_substeps=64, train_gradient=False)
    for method, nns_t in trained.items():
        pred = _solve(model, nns_t, batch, fine)
        out[method]["loss_under_fine_solver"] = float(jnp.mean((pred - batch.targets) ** 2))
    return out


def to_f64(tree):
    """Cast every floating leaf to f64 (needs jax x64 enabled): isolates the
    METHOD error from f32 rounding accumulation over thousands of steps."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(jnp.float64) if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--out",
        # Anchor to the repo root, not the cwd: the study runs for many
        # minutes and a cwd-relative path would discard everything at the
        # final open() when launched from elsewhere.
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "adjoint_parity.json"),
    )
    ap.add_argument("--maxiters", type=int, default=150)
    ap.add_argument("--f32", action="store_true", help="keep the production f32 dtypes (default: f64 for a clean method-error study)")
    args = ap.parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    model, batch, nns = build_problem(stiff=True)
    if not args.f32:
        model, batch, nns = to_f64(model), to_f64(batch), to_f64(nns)
    rows, meta = dt_refinement(model, batch, nns)
    ab = training_ab(model, batch, nns, maxiters=args.maxiters)
    report = dict(refinement=rows, meta=meta, training_ab=ab)
    # Divergent rows carry inf/nan errors; bare Infinity/NaN tokens would
    # make the artifact strictly-invalid JSON, so serialize them as null.
    sanitize = lambda o: (  # noqa: E731
        {k: sanitize(v) for k, v in o.items()} if isinstance(o, dict)
        else [sanitize(v) for v in o] if isinstance(o, list)
        else None if isinstance(o, float) and not np.isfinite(o) else o
    )
    with open(args.out, "w") as f:
        json.dump(sanitize(report), f, indent=2)

    print(f"fine-limit loss {meta['L_star']:.6e}; rk4/split agreement at fine dt: {meta['solver_agreement_at_fine']}")
    print(f"{'method':>6} {'n_sub':>5} {'dt[s]':>7} {'|dL|/L*':>10} {'|dg|/|g*|':>10} {'cos':>7}")
    for r in rows:
        print(f"{r['method']:>6} {r['n_substeps']:>5} {r['dt_s']:>7.1f} {r['loss_rel_err']:>10.2e} {r['grad_rel_err']:>10.2e} {r['grad_cosine']:>7.4f}")
    for m, d in ab.items():
        print(f"train[{m}]: {d['loss_initial']:.4e} -> {d['loss_final']:.4e} (under fine solver: {d['loss_under_fine_solver']:.4e})")
    return report


if __name__ == "__main__":
    main()
