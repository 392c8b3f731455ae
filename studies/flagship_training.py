"""Reference-scale flagship NDE training (VERDICT r1 item 3).

Reproduces the reference's flagship wind-mixing run at full problem scale
(``wind_mixing/train_NDE_args.jl``): the 18-simulation wind+cooling /
wind+heating suite, 8-day simulations saved every 600 s (1153 frames),
trained through the coupled triple-NN NDE with the mPP base closure,
auto-balanced 6-channel loss (T = 0.8, dT/dz = 0.8, profile = 0.5,
``train_NDE_args.jl:174``), zero-weights BC mode, and curriculum staging to
the full ``1:9:1153`` trange (``train_NDE_args.jl:197``; the fresh-run
staging pattern follows ``train_NDE.jl:138`` / the free-convection
``1:20 -> 1:40:801`` progression).

Each NDE stage keeps the inner step at dt = 600 s (the LES save spacing):
stride-s saveat with n_substeps = s. The final stage therefore integrates
all 1,152 inner steps of the 8 days per iteration, per simulation — the
trajectory length that stresses remat, curriculum, and stability.

Modes:
  ``--mode train``      full flagship run (TPU; ~minutes)
  ``--mode step-bench`` measure ONE final-stage train step (compile +
                         steady-state), for the TPU-vs-single-thread-CPU
                         speedup methodology (BASELINE.json's >= 50x NDE
                         training target; the reference trained
                         single-threaded, BLAS.set_num_threads(1),
                         ``train_NDE.jl:11``). Run it once on TPU and once
                         under ``taskset -c 0`` with CPU platform.

Results are written to ``--out`` (JSON) and summarized in docs/RESULTS.md.
"""


from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (script lives in studies/)

import argparse
import json
import time

import numpy as np

TRAIN_FILES = [  # train_NDE_args.jl:39-59
    "wind_-5e-4_cooling_3e-8_new", "wind_-5e-4_cooling_1e-8_new",
    "wind_-2e-4_cooling_3e-8_new", "wind_-2e-4_cooling_1e-8_new",
    "wind_-5e-4_heating_-3e-8_new", "wind_-2e-4_heating_-1e-8_new",
    "wind_-2e-4_heating_-3e-8_new", "wind_-5e-4_heating_-1e-8_new",
    "wind_-3.5e-4_cooling_2e-8_new", "wind_-3.5e-4_heating_-2e-8_new",
    "wind_-5e-4_cooling_2e-8_new", "wind_-3.5e-4_cooling_3e-8_new",
    "wind_-3.5e-4_cooling_1e-8_new", "wind_-2e-4_cooling_2e-8_new",
    "wind_-3.5e-4_heating_-3e-8_new", "wind_-3.5e-4_heating_-1e-8_new",
    "wind_-2e-4_heating_-2e-8_new", "wind_-5e-4_heating_-2e-8_new",
]
# Held-out: interpolation members of the same forcing grids (the reference's
# test lists draw from these axes, train_NDE_args.jl:230+).
TEST_FILES = ["wind_-4.5e-4_cooling_2.5e-8", "wind_-2.5e-4_cooling_1.5e-8", "wind_-4.5e-4_heating_-2.5e-8"]

# --suite diurnal: the reference's 8-day diurnal grids (data_containers.jl:8-127
# registers wind x diurnal-amplitude suites alongside the constant-flux ones);
# train on the full 3x5 grid, hold out interpolation members of both axes.
TRAIN_FILES_DIURNAL = [
    f"wind_{w}_diurnal_{c}"
    for w in ("-5e-4", "-3.5e-4", "-2e-4")
    for c in ("1e-8", "2e-8", "3e-8", "3.5e-8", "5e-8")
]
TEST_FILES_DIURNAL = ["wind_-4.5e-4_diurnal_4e-8", "wind_-3e-4_diurnal_2e-8", "wind_-2e-4_diurnal_4e-8"]

# Frozen copies of the standard suite so main() can resolve --suite/--extra-train
# from a fixed base each call (the mutable TRAIN_FILES/TEST_FILES globals are
# what build()/step_bench()/save_nns read).
TRAIN_FILES_STANDARD = tuple(TRAIN_FILES)
TEST_FILES_STANDARD = tuple(TEST_FILES)

# --suite mixed: BOTH families in ONE training run (33 sims on one batch
# axis; the per-sim diurnal_amplitude keeps constant members' BCs frozen
# while diurnal members resolve the cycle) — the reference trains these as
# separate scripts. Held-out: interpolation members of each family.

N_FRAMES = 1153  # 8 days at 600 s saves
# (window, stride, maxiters, lr): keep dt = stride * 600 / n_substeps = 600 s.
# Final stage = the reference's flagship 1:9:1153 x 130 iters
# (train_NDE_args.jl:196-198) followed by a decayed-lr burn-in on the same
# window (the free-convection recipe's final stage,
# train_free_convection_nde.jl:259-266).
STAGES = [(200, 20, 150, 1e-2), (577, 12, 100, 3e-3), (1153, 9, 130, 1e-3), (1153, 9, 200, 2e-4)]


# --data-dir: read reference-layout .jld2 files (e.g. the 3-D-LES-generated
# suite from studies/generate_wm_les.sh) instead of the synthetic stand-ins.
DATA_DIR = None


def load_suite(names, Nz=32):
    from climateparameterizations_jl_tpu.cli.main import _load_suite

    if DATA_DIR is not None:
        import os

        from climateparameterizations_jl_tpu.data.registry import lesbrary_relative_path

        missing = [n for n in names if not os.path.exists(os.path.join(DATA_DIR, lesbrary_relative_path(n)))]
        if missing:
            raise SystemExit(
                f"--data-dir {DATA_DIR}: {len(missing)} suite members missing "
                f"(e.g. {missing[0]}); generate them with studies/generate_wm_les.sh "
                "— silently falling back to synthetic stand-ins would fake the provenance"
            )
    return _load_suite(names, Nz, DATA_DIR, N_FRAMES - 1, 600.0)


def build(Nz=32, seed=0, diurnal=False):
    import jax

    from climateparameterizations_jl_tpu.cli.main import _wind_model
    from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs

    ds = load_suite(TRAIN_FILES, Nz)
    model = _wind_model(ds, Nz, diurnal=diurnal)
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    nns = FluxNNs(*[wind_mixing_mlp(k, Nz, scale=1e-5) for k in ks])
    return ds, model, nns


def pretrain(ds, model, nns, epochs=150, lr=1e-3):
    """Flux pre-training on direct (state -> flux) pairs, per flux NN
    (the reference warm-starts its NDE from direct NN training)."""
    from climateparameterizations_jl_tpu.data.containers import direct_regression_pairs
    from climateparameterizations_jl_tpu.train.nn import train_flux_nn

    out = {}
    t0 = time.perf_counter()
    for flux in ("uw", "vw", "wT"):
        x, y = direct_regression_pairs(ds, model.scalings, flux)
        nn, hist = train_flux_nn(getattr(nns, flux), x, y, learning_rate=lr, epochs=epochs)
        nns = nns._replace(**{flux: nn})
        out[flux] = (float(hist[0]), float(hist[-1]))
    return nns, out, time.perf_counter() - t0


def calibrate_mpp(ds, model, optimizer="lbfgs", maxiters=60, window=200, stride=20):
    """Pre-calibrate the 5 mPP parameters on the training suite.

    The reference's flagship run does NOT use default mPP parameters: it
    loads them from a prior 5-parameter optimisation
    (``train_NDE_args.jl:64-108`` reads ``parameter_optimisation_18sim_...``)
    produced by BFGS/LBFGS (``optimise_modified_pacanowski_philander_args.jl:66-72``).
    """
    import dataclasses

    from climateparameterizations_jl_tpu.data.containers import training_tensors
    from climateparameterizations_jl_tpu.train.mpp_calibration import optimise_mpp_parameters
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

    t0 = time.perf_counter()
    config = NDETrainConfig(
        learning_rate=0.05, maxiters=maxiters, n_substeps=stride, method="split",
        train_gradient=False, optimizer=optimizer,
    )
    batch = training_tensors(ds, model.scalings, np.arange(0, window, stride), tau=model.tau)
    fitted, history = optimise_mpp_parameters(model, batch, config)
    info = dict(
        optimizer=optimizer, loss_initial=history[0][0], loss_final=min(h[0] for h in history),
        wall_s=time.perf_counter() - t0,
        params={k: float(getattr(fitted, k)) for k in ("nu_0", "nu_minus", "delta_Ri", "Ri_c", "Pr")},
    )
    return dataclasses.replace(model, mpp=fitted), info


def nde_train(ds, model, nns, stages=STAGES, fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
              tridiag_backend="auto", fast_assembly="auto", shooting=0, shooting_hybrid=False,
              host_matched_substeps=False):
    from climateparameterizations_jl_tpu.data.containers import (
        multiple_shooting_tensors,
        training_tensors,
    )
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, train_wind_mixing_nde

    # Staging is hand-rolled here (rather than train_wind_mixing_nde's
    # stages=[CurriculumStage(...)] path) to record per-stage wall-clock and
    # loss curves for RESULTS.md. Deliberate consequence: the optimizer state
    # resets at each stage boundary — matching the reference's flagship
    # scripts, which construct a fresh optimizer per training stage
    # (train_free_convection_nde.jl:246-266 re-enters train! per epoch block).
    report = []
    for i, (window, stride, maxiters, lr) in enumerate(stages):
        # --host-matched-substeps: train at the EMBEDDED HOST's time
        # discretization (dt ~ 540 s, i.e. 10 substeps per stride-9 save
        # interval) instead of the reference's dt = 600 s — the r4 ablation
        # isolating whether the a-posteriori 0.3x "NN hurts the host"
        # finding is a substep/dt mismatch or a solver-formulation gap
        # (VERDICT r3 item 2b).
        n_sub = max(stride + 1, round(stride * 10 / 9)) if host_matched_substeps else stride
        config = NDETrainConfig(
            learning_rate=lr, maxiters=maxiters, n_substeps=n_sub, method="split",
            training_fractions=fractions,
            tridiag_backend=tridiag_backend, fast_assembly=fast_assembly,
        )
        tsteps = np.arange(0, window, stride)
        # --shooting K: window-parallel final stages — every (sim, window)
        # pair on the batch axis, truth-anchored (VERDICT r2 item 2). Only
        # the full-window stages qualify (K must divide their intervals).
        K = shooting if (shooting and window == N_FRAMES and (len(tsteps) - 1) % shooting == 0) else 0
        if shooting_hybrid and i == len(stages) - 1:
            # Hybrid: window-parallel for the bulk full-window stage(s),
            # SEQUENTIAL final burn-in — short windows fit 10x lower train
            # loss but generalize worse to full-horizon rollouts (measured,
            # r3 A/B); the cheap burn-in restores the rollout objective.
            K = 0
        if K:
            batch = multiple_shooting_tensors(ds, model.scalings, tsteps, K, tau=model.tau)
        else:
            batch = training_tensors(ds, model.scalings, tsteps, tau=model.tau)
        t0 = time.perf_counter()
        nns, hist = train_wind_mixing_nde(model, nns, batch, config)
        wall = time.perf_counter() - t0
        inner = int((len(tsteps) - 1) * stride)
        report.append(dict(
            window=window, stride=stride, maxiters=maxiters, lr=lr, shooting=K,
            n_saveat=len(tsteps), inner_steps=inner // K if K else inner,
            loss_initial=float(hist[0].total()), loss_final=float(hist[-1].total()),
            wall_s=wall, s_per_iter=wall / maxiters,
            loss_curve=[float(h.total()) for h in hist[:: max(1, maxiters // 25)]],
        ))
        print(f"stage window={window} stride={stride}{f' shooting={K}' if K else ''}: "
              f"{report[-1]['loss_initial']:.4e} -> "
              f"{report[-1]['loss_final']:.4e} in {wall:.1f} s ({wall / maxiters * 1e3:.0f} ms/iter)", flush=True)
    return nns, report


def build_ensemble_members(n_members, Nz=32, seed=0):
    """K independently-seeded flagship FluxNNs triples (same init scale)."""
    import jax

    from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs

    members = []
    for key in jax.random.split(jax.random.PRNGKey(seed), n_members):
        ks = jax.random.split(key, 3)
        members.append(FluxNNs(*[wind_mixing_mlp(k, Nz, scale=1e-5) for k in ks]))
    return members


def pretrain_ensemble(ds, model, members, epochs=150, lr=1e-3):
    """All K members x 3 fluxes pre-train as ONE vmapped scanned program.

    The per-member host loop was tunnel-latency-bound (measured 778 s for
    K=4 on the chip: 12 runs x 150 per-epoch blocking transfers); stacking
    the 3K same-architecture nets on one axis and scanning the epochs inside
    the jit turns that into a single dispatch. Numerics per net are
    identical to the solo pretraining (adam is elementwise).
    """
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.data.containers import direct_regression_pairs
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs
    from climateparameterizations_jl_tpu.train.deep_ensemble import stack_members, unstack_members
    from climateparameterizations_jl_tpu.train.nn import train_flux_nn_ensemble

    t0 = time.perf_counter()
    fluxes = ("uw", "vw", "wT")
    ys = {}
    for i, f in enumerate(fluxes):
        xf, ys[f] = direct_regression_pairs(ds, model.scalings, f)
        if i == 0:
            x = xf  # the predictor block is flux-independent; build it once
    nets = [getattr(m, f) for m in members for f in fluxes]
    targets = jnp.stack([ys[f] for m in members for f in fluxes])
    stacked, hist = train_flux_nn_ensemble(stack_members(nets), x, targets, learning_rate=lr, epochs=epochs)
    flat = unstack_members(stacked)
    out_members = [FluxNNs(*flat[i * 3 : (i + 1) * 3]) for i in range(len(members))]
    info = {
        f"m{i}": {f: (float(hist[i * 3 + j][0]), float(hist[i * 3 + j][-1])) for j, f in enumerate(fluxes)}
        for i in range(len(members))
    }
    return out_members, info, time.perf_counter() - t0


def nde_train_ensemble(ds, model, members, stages=STAGES,
                       fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
                       tridiag_backend="auto", fast_assembly="auto",
                       shooting=0, shooting_hybrid=False, member_fold=False):
    """Deep-ensemble flagship training: ONE jitted step advances all K members.

    Same staging as :func:`nde_train`; per-stage report carries member-MEAN
    losses (training is provably member-independent, so each member's curve
    equals its solo run's). ``shooting``/``shooting_hybrid`` compose the
    window-parallel batches with the member axis (VERDICT r3 item 4: the
    chip's batch dimension takes sims x K windows x M members at once —
    ``_solve`` is batch-shape-agnostic and the member vmap sits outside it).
    """
    from climateparameterizations_jl_tpu.data.containers import (
        multiple_shooting_tensors,
        training_tensors,
    )
    from climateparameterizations_jl_tpu.train.deep_ensemble import (
        stack_members,
        train_wind_mixing_deep_ensemble,
    )
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

    stacked = stack_members(members)
    report = []
    for i, (window, stride, maxiters, lr) in enumerate(stages):
        config = NDETrainConfig(
            learning_rate=lr, maxiters=maxiters, n_substeps=stride, method="split",
            training_fractions=fractions,
            tridiag_backend=tridiag_backend, fast_assembly=fast_assembly,
        )
        tsteps = np.arange(0, window, stride)
        K = shooting if (shooting and window == N_FRAMES and (len(tsteps) - 1) % shooting == 0) else 0
        if shooting_hybrid and i == len(stages) - 1:
            K = 0  # sequential burn-in restores the rollout objective (r3 A/B)
        if K:
            batch = multiple_shooting_tensors(ds, model.scalings, tsteps, K, tau=model.tau)
        else:
            batch = training_tensors(ds, model.scalings, tsteps, tau=model.tau)
        t0 = time.perf_counter()
        stacked, hist = train_wind_mixing_deep_ensemble(model, stacked, batch, config,
                                                        member_fold=member_fold)
        wall = time.perf_counter() - t0
        inner = int((len(tsteps) - 1) * stride)
        report.append(dict(
            window=window, stride=stride, maxiters=maxiters, lr=lr, shooting=K,
            n_saveat=len(tsteps), inner_steps=inner // K if K else inner,
            loss_initial=float(hist[0].total()), loss_final=float(hist[-1].total()),
            wall_s=wall, s_per_iter=wall / maxiters,
        ))
        print(f"[ensemble] stage window={window} stride={stride}{f' shooting={K}' if K else ''}: "
              f"member-mean {report[-1]['loss_initial']:.4e} -> {report[-1]['loss_final']:.4e} "
              f"in {wall:.1f} s ({wall / maxiters * 1e3:.0f} ms/iter)", flush=True)
    return stacked, report


def evaluate_ensemble(model, stacked, Nz=32):
    """Held-out deep-ensemble eval: predictive bands + ensemble-mean wins.

    Per held-out sim: member 0 runs the full NDE_profile harness (mPP/KPP
    baselines come from there), the vmapped UQ solve adds per-member losses,
    the ensemble-MEAN-prediction loss, and the 2-sigma band coverage of the
    dimensional truth.

    Band calibration (VERDICT r2 item 4): the FIRST held-out sim is the
    VALIDATION member — a scalar variance inflation is fit on its T bands
    (``eval/uq_calibration.py``) and applied unchanged to the remaining
    (test) sims, whose before/after coverage is reported.
    """
    from climateparameterizations_jl_tpu.eval.ensemble_uq import nde_ensemble_uq
    from climateparameterizations_jl_tpu.eval.profile import nde_profile
    from climateparameterizations_jl_tpu.eval.uq_calibration import (
        band_report,
        fit_band_calibration,
    )
    from climateparameterizations_jl_tpu.train.deep_ensemble import unstack_members

    member0 = unstack_members(stacked)[0]
    tsteps = np.arange(0, N_FRAMES, 9)
    out = {}
    calibration = None
    for name in TEST_FILES:
        ds = load_suite([name], Nz)
        ev = nde_profile(model, member0, ds, tsteps, solver="split", n_substeps=9,
                         include_kpp=True, include_embedded=False, kpp_n_substeps=9)
        uq = nde_ensemble_uq(model, stacked, ds, tsteps, solver="split", n_substeps=9)
        truth = np.asarray(ev["truth_T"]).reshape(uq["ensemble_T_mean"].shape)
        band = 2.0 * uq["ensemble_T_std"]
        abs_err = np.abs(truth - uq["ensemble_T_mean"])
        # Spread-skill: does the predictive band width TRACK the actual
        # error cell-by-cell? (Pearson r over all frames x levels; the
        # standard ensemble-forecast calibration diagnostic alongside
        # coverage.)
        sd_flat = uq["ensemble_T_std"].ravel()
        degenerate = float(sd_flat.std()) == 0.0 or float(abs_err.std()) == 0.0
        # corrcoef of a constant vector is 0/0 = NaN (e.g. K=1 or identical
        # members); report null instead of poisoning the JSON.
        spread_skill = None if degenerate else float(np.corrcoef(sd_flat, abs_err.ravel())[0, 1])
        row = dict(
            nde_member0=float(np.mean(ev["losses_nde_T"])),
            nde_members=[float(v) for v in uq["losses_member_T"].mean(axis=1)],
            nde_ensemble_mean=float(np.mean(uq["losses_ensemble_mean_T"])),
            mpp=float(np.mean(ev["losses_mpp_T"])),
            kpp=float(np.mean(ev["losses_kpp_T"])),
            coverage_2sigma=float(np.mean(abs_err <= band)),
            mean_band_K=float(np.mean(band)),
            spread_skill_r=spread_skill,
        )
        row["win_vs_mpp"] = row["mpp"] / row["nde_ensemble_mean"]
        row["win_vs_kpp"] = row["kpp"] / row["nde_ensemble_mean"]
        row["win_vs_best_member"] = min(row["nde_members"]) / row["nde_ensemble_mean"]
        if calibration is None:
            # First held-out sim = the calibration validation member.
            calibration = fit_band_calibration(truth, uq["ensemble_T_mean"], uq["ensemble_T_std"])
            row["calibration_role"] = "validation (inflation fit here)"
            row["lam_nll"] = calibration.lam_nll
            row["lam_coverage"] = calibration.lam_coverage
        else:
            row["calibration_role"] = "test"
        row["calibrated"] = band_report(
            truth, uq["ensemble_T_mean"], uq["ensemble_T_std"], lam=calibration.lam
        )
        out[name] = row
        print(f"eval[{name}]: ens-mean {row['nde_ensemble_mean']:.4e} "
              f"(members {min(row['nde_members']):.3e}..{max(row['nde_members']):.3e}, "
              f"{row['win_vs_best_member']:.2f}x vs best) | mPP {row['win_vs_mpp']:.1f}x, "
              f"KPP@600s {row['win_vs_kpp']:.1f}x | 2-sigma coverage {row['coverage_2sigma']:.2f} "
              f"-> {row['calibrated']['coverage']:.2f} calibrated (lam={calibration.lam:.2f}, "
              f"{row['calibration_role'].split(' ')[0]}; mean band {row['mean_band_K']:.3f} K, spread-skill r="
              f"{'n/a' if row['spread_skill_r'] is None else format(row['spread_skill_r'], '.2f')})", flush=True)
    return out


def evaluate_embedded(model, nns, Nz=32, embedded_substeps=10):
    """Held-out EMBEDDED eval: host column +NN vs its physics-only twin.

    The deployment metric the a-posteriori arm targets — the same
    ``include_embedded`` harness `evaluate --embedded` uses (dimensional
    host, implicit mPP, dt = save spacing / substeps), scored on the
    8-day held-out sims. ``nde`` is recorded alongside so fine-tuning's
    effect on the training-time NDE metric is visible too."""
    from climateparameterizations_jl_tpu.eval.profile import nde_profile

    tsteps = np.arange(0, N_FRAMES, 9)
    out = {}
    for name in TEST_FILES:
        ds = load_suite([name], Nz)
        ev = nde_profile(model, nns, ds, tsteps, solver="split", n_substeps=9,
                         include_kpp=False, include_embedded=True,
                         embedded_substeps=embedded_substeps)
        row = dict(
            embedded=float(np.mean(ev["losses_embedded_T"])),
            embedded_twin=float(np.mean(ev["losses_embedded_baseline_T"])),
            nde=float(np.mean(ev["losses_nde_T"])),
            mpp=float(np.mean(ev["losses_mpp_T"])),
        )
        row["win_vs_twin"] = row["embedded_twin"] / row["embedded"]
        out[name] = row
        print(f"embedded[{name}]: +NN {row['embedded']:.4e} vs twin {row['embedded_twin']:.4e} "
              f"({row['win_vs_twin']:.1f}x) | NDE {row['nde']:.4e}", flush=True)
    return out


def aposteriori_finetune(ds, model, nns, maxiters=60, lr=3e-4, window=N_FRAMES,
                         stride=9, substeps=10, tridiag_backend="auto"):
    """Fine-tune the flux NNs THROUGH the embedded host column (the
    capability the reference lacks — ``train/embedded.py``): same 6-channel
    auto-balanced loss, full 8-day window, host discretization identical to
    the eval harness's (substeps=10 -> dt=540 s)."""
    from climateparameterizations_jl_tpu.train.embedded import train_embedded_wind_mixing
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

    config = NDETrainConfig(
        learning_rate=lr, maxiters=maxiters, n_substeps=substeps,
        training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        tridiag_backend=tridiag_backend,
    )
    tsteps = np.arange(0, window, stride)
    t0 = time.perf_counter()
    nns, hist = train_embedded_wind_mixing(model, nns, ds, config, tsteps=tsteps)
    wall = time.perf_counter() - t0
    info = dict(
        maxiters=maxiters, lr=lr, window=window, stride=stride, substeps=substeps,
        n_saveat=len(tsteps), inner_steps=int((len(tsteps) - 1) * substeps),
        loss_initial=float(hist[0].total()), loss_final=float(hist[-1].total()),
        wall_s=wall, s_per_iter=wall / maxiters,
        loss_curve=[float(h.total()) for h in hist[:: max(1, maxiters // 25)]],
    )
    print(f"a-posteriori: {info['loss_initial']:.4e} -> {info['loss_final']:.4e} "
          f"in {wall:.1f} s ({wall / maxiters * 1e3:.0f} ms/iter)", flush=True)
    return nns, info


def _kpp_loss_at(model, ds, tsteps, kpp_n_substeps):
    """Mean scaled-T MSE of the KPP baseline at the given substepping.

    Mirrors nde_profile's KPP block (eval/profile.py) WITHOUT re-solving the
    dominant-cost NDE/mPP trajectories — re-running the whole profile a
    second time just for this number doubled held-out eval wall time.
    """
    import jax
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.physics.kpp import (
        KPPForcing,
        KPPParameters,
        KPPState,
        solve_kpp,
    )

    if ds.T.ndim > 2:  # singleton stacked suite (same squeeze as nde_profile)
        ds = jax.tree.map(lambda a: a[0], ds)
    tsteps = np.asarray(tsteps)
    i0 = int(tsteps[0])
    t_dim = np.asarray(jnp.take(ds.t, jnp.asarray(tsteps)))
    kpp = solve_kpp(
        KPPState(U=ds.u[..., i0, :], V=ds.v[..., i0, :], T=ds.T[..., i0, :]),
        t_dim, KPPParameters.default(),
        KPPForcing(Fu=ds.u_top, Fb=ds.theta_top * ds.g * ds.alpha, dTdz_bottom=ds.theta_bottom),
        model.H, model.Nz, ds.f, ds.g, ds.alpha,
        n_substeps=kpp_n_substeps, diurnal=model.diurnal,
    )
    s = model.scalings.T
    truth = jnp.take(ds.T, jnp.asarray(tsteps), axis=-2)
    return float(jnp.mean((s.scale(kpp.T) - s.scale(truth)) ** 2))


def evaluate(model, nns, Nz=32, include_kpp=True):
    """Held-out NDE vs mPP-only vs KPP over the full 8 days (NDE_profile)."""
    from climateparameterizations_jl_tpu.eval.profile import nde_profile

    tsteps = np.arange(0, N_FRAMES, 9)
    out = {}
    for name in TEST_FILES:
        ds = load_suite([name], Nz)
        ev = nde_profile(model, nns, ds, tsteps, solver="split", n_substeps=9,
                         include_kpp=include_kpp, include_embedded=False,
                         # KPP at its reference-native 600 s step (FAIR
                         # baseline). The reference's own harness steps KPP
                         # at the strided 5400 s spacing (column_model_1D_kpp
                         # takes dt = times[2]-times[1]); kpp_ref below
                         # records that reference-matched number too.
                         kpp_n_substeps=9)
        row = {}
        for member in ("nde", "mpp") + (("kpp",) if include_kpp else ()):
            # Mean over time of the T-channel per-timestep loss (the
            # headline channel; u/v available in the same dict).
            row[member] = float(np.mean(ev[f"losses_{member}_T"]))
        row["win_vs_mpp"] = row["mpp"] / row["nde"]
        if include_kpp:
            row["win_vs_kpp"] = row["kpp"] / row["nde"]
            row["kpp_ref_dt"] = _kpp_loss_at(model, ds, tsteps, kpp_n_substeps=1)
            row["win_vs_kpp_ref_dt"] = row["kpp_ref_dt"] / row["nde"]
        out[name] = row
        msg = f"eval[{name}]: NDE {row['nde']:.4e} vs mPP {row['mpp']:.4e} ({row['win_vs_mpp']:.1f}x)"
        if include_kpp:
            msg += (f" vs KPP@600s {row['kpp']:.4e} ({row['win_vs_kpp']:.1f}x)"
                    f" [KPP@save-spacing {row['kpp_ref_dt']:.4e}, {row['win_vs_kpp_ref_dt']:.1f}x]")
        print(msg, flush=True)
    return out


def save_nns(nns, out_dir, ensemble=0, model=None):
    """CLI-compatible checkpoint so `evaluate`/`ensemble` can reuse it."""
    from climateparameterizations_jl_tpu.cli.main import _mpp_meta, _save_nns

    from climateparameterizations_jl_tpu.cli.main import _suite_diurnal_flags

    # any(): per-sim amplitudes keep constant members of a mixed suite
    # frozen, so enabling the cycle whenever ANY member is diurnal is the
    # CLI's own semantics (cmd_train_nde) — and registry flags, not name
    # substrings, are the source of truth.
    meta = {"command": "studies/flagship_training.py", "sims": ",".join(TRAIN_FILES),
            "nz": 32, "diurnal": any(_suite_diurnal_flags(TRAIN_FILES)),
            "ensemble": int(ensemble)}
    if model is not None:
        # A checkpoint trained over CALIBRATED mPP must record it — the r3
        # a-posteriori arm evaluated a calibrated-base checkpoint over the
        # rebuilt DEFAULT base and scored 500x worse (wrong closure).
        meta["mpp"] = _mpp_meta(model)
    _save_nns(out_dir, nns, meta)
    return out_dir


def step_bench(n_timed=10, tridiag_backend="auto", split_unroll=1, fast_assembly=False, implicit_solve_grad=True, diurnal=False, shooting=0, n_repeats=1, ensemble=0, member_fold=False):
    """Compile + steady-state time of ONE final-stage train step.

    ``n_repeats`` > 1 re-times the ``n_timed``-iteration block that many
    times and reports min/median/max of the per-iteration time — the tunnel's
    run-to-run swing on this step measured 45% between sessions (VERDICT r3
    weak #3), so a single block is not an honest number.

    ``ensemble=M`` composes M stacked members with the (optionally shooting)
    batch: the r4 batch-axis scaling measurement (sims x K windows x M
    members in one step).
    """
    import jax

    from climateparameterizations_jl_tpu.data.containers import (
        multiple_shooting_tensors,
        training_tensors,
    )
    from climateparameterizations_jl_tpu.train.loss import apply_loss_scalings, nde_loss_channels
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, _solve, determine_loss_scalings
    import optax

    # diurnal must reach the model here too or the time-varying top-BC path
    # is compiled out and the benchmark silently measures different dynamics
    # than --mode train trains (the CLAUDE.md diurnal rule).
    ds, model, nns = build(diurnal=diurnal)
    window, stride, _, lr = STAGES[-1]
    config = NDETrainConfig(learning_rate=lr, n_substeps=stride, method="split",
                            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
                            tridiag_backend=tridiag_backend, split_unroll=split_unroll,
                            fast_assembly=fast_assembly, implicit_solve_grad=implicit_solve_grad)
    tsteps = np.arange(0, window, stride)
    if shooting:
        batch = multiple_shooting_tensors(ds, model.scalings, tsteps, shooting, tau=model.tau)
    else:
        batch = training_tensors(ds, model.scalings, tsteps, tau=model.tau)
    if ensemble:
        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            ensemble_loss_scalings,
            make_ensemble_loss_fn,
            make_folded_ensemble_loss_fn,
            stack_members,
        )

        nns = stack_members(build_ensemble_members(ensemble))
        scalings = ensemble_loss_scalings(model, nns, batch, config)
        make_loss = make_folded_ensemble_loss_fn if member_fold else make_ensemble_loss_fn
        ens_loss = make_loss(model, batch, scalings, config)

        def loss_fn(nns):
            return ens_loss(nns)[0]
    else:
        scalings = determine_loss_scalings(model, nns, batch, config)

        def loss_fn(nns):
            pred = _solve(model, nns, batch, config)
            ch = nde_loss_channels(pred, batch.targets, model.Nz, config.train_gradient)
            return apply_loss_scalings(ch, scalings).total()

    opt = optax.adam(lr)
    state = opt.init(nns)

    @jax.jit
    def step(nns, state):
        loss, g = jax.value_and_grad(loss_fn)(nns)
        up, state = opt.update(g, state, nns)
        return optax.apply_updates(nns, up), state, loss

    t0 = time.perf_counter()
    nns, state, loss = step(nns, state)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    samples = []
    for _ in range(max(1, n_repeats)):
        t0 = time.perf_counter()
        for _ in range(n_timed):
            nns, state, loss = step(nns, state)
        jax.block_until_ready(loss)
        samples.append((time.perf_counter() - t0) / n_timed)
    per_iter = float(np.median(samples))
    # Work per iteration is shooting-invariant: S*K windows x inner/K steps
    # = S x inner column-timesteps, so throughput stays comparable; each
    # ensemble member multiplies the column work.
    sims, inner = len(TRAIN_FILES), (len(tsteps) - 1) * stride
    from climateparameterizations_jl_tpu.train.nde import resolve_tridiag_backend

    # What "auto" actually ran as, for this mode's window length (the solve
    # sees batch.t's per-window save count x stride inner steps).
    resolved = resolve_tridiag_backend(tridiag_backend, (batch.t.shape[0] - 1) * stride)
    return dict(
        backend=jax.default_backend(), compile_s=compile_s, s_per_iter=per_iter,
        tridiag_backend_resolved=resolved,
        s_per_iter_min=float(min(samples)), s_per_iter_max=float(max(samples)),
        n_repeats=len(samples),
        sims=sims, inner_steps=inner, shooting=shooting, ensemble=ensemble,
        batch_columns=sims * max(1, shooting) * max(1, ensemble),
        column_timesteps_per_s=sims * inner * max(1, ensemble) / per_iter,
    )


def resolve_suite(suite, extra_train=None):
    """Resolve ``(train_files, test_files, diurnal)`` from FROZEN base lists.

    Idempotent by construction (a second in-process ``main()`` must not
    compound the previous call's suite). ``diurnal`` follows suite
    MEMBERSHIP, not the --suite enum: an ``--extra-train`` diurnal member on
    the standard suite must still resolve the cycle (otherwise its BC
    freezes at sin(0)=0 while the checkpoint meta records diurnal=true —
    the exact train/eval mismatch the cmd_optimise_mpp comment warns about).
    """
    from climateparameterizations_jl_tpu.cli.main import _sims, _suite_diurnal_flags

    if suite == "diurnal":
        train, test = list(TRAIN_FILES_DIURNAL), list(TEST_FILES_DIURNAL)
    elif suite == "mixed":
        train = list(TRAIN_FILES_STANDARD) + TRAIN_FILES_DIURNAL
        test = list(TEST_FILES_STANDARD) + TEST_FILES_DIURNAL
    else:
        train, test = list(TRAIN_FILES_STANDARD), list(TEST_FILES_STANDARD)
    if extra_train:
        train = train + _sims(extra_train)
    return train, test, any(_suite_diurnal_flags(train))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train",
                    choices=["train", "step-bench", "aposteriori", "embedded-eval"])
    ap.add_argument("--pretrain-epochs", type=int, default=150,
                    help="flux pre-training epochs per NN (0 skips the phase — the zero-init NDE A/B)")
    ap.add_argument("--suite", default="standard", choices=["standard", "diurnal", "mixed"],
                    help="standard = the 18-sim wind+cooling/heating '_new' suite; "
                         "diurnal = the 15-sim 8-day diurnal grid (held-out interpolation members); "
                         "mixed = both families as ONE 33-sim run (per-sim diurnal amplitudes)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true", help="3-iteration stages (correctness flush before the real run)")
    ap.add_argument("--tridiag-backend", default="auto", choices=["auto", "scan", "pcr"])
    ap.add_argument("--split-unroll", type=int, default=1)
    ap.add_argument("--fast-assembly", nargs="?", const="on", default="off",
                    choices=["on", "off", "fold"],
                    help="matmul-assembled explicit split tendencies (A/B vs default); "
                         "pass 'fold' to also precompose the divergence matrix into the last NN layer")
    ap.add_argument("--no-ift", action="store_true", help="direct autodiff through the implicit solves instead of the IFT default (A/B)")
    ap.add_argument("--calibrate-mpp", action="store_true", help="pre-calibrate the 5 mPP parameters (the reference's pipeline order)")
    ap.add_argument("--shooting-hybrid", action="store_true",
                    help="with --shooting K: keep the FINAL burn-in stage sequential "
                         "(windows fit easier but rollout worse; the burn-in restores it)")
    ap.add_argument("--shooting", type=int, default=0,
                    help="window-parallel (multiple-shooting) FINAL stages: split the "
                         "1:9:1153 window into K truth-anchored segments batched with the "
                         "sims (K must divide 128). 0 = the sequential reference staging")
    ap.add_argument("--data-dir", default=None,
                    help="read the suite from reference-layout .jld2 files under this dir "
                         "(e.g. runs/les3d_wm from studies/generate_wm_les.sh) instead of "
                         "synthetic stand-ins; missing members are an error")
    ap.add_argument("--extra-train", default=None,
                    help="comma-separated catalog names APPENDED to the training suite "
                         "(grid-augmentation studies, e.g. sampling an extrapolation "
                         "regime the base grid misses)")
    ap.add_argument("--save-nns", default=None, help="save the trained NNs as a CLI-compatible checkpoint dir")
    ap.add_argument("--ensemble", type=int, default=0,
                    help="train a K-member deep ensemble at flagship scale (one jitted step "
                         "advances all members; eval adds predictive bands + coverage)")
    ap.add_argument("--member-fold", action="store_true",
                    help="lower the ensemble member axis into the solve's native batch "
                         "dimension via one block-diagonal chain (MemberPackedFluxNNs) "
                         "instead of the member vmap — same math, faster layout on TPU")
    ap.add_argument("--eval-checkpoint", default=None,
                    help="skip training: evaluate a saved (solo or ensemble) checkpoint "
                         "dir against the suite's held-out sims")
    ap.add_argument("--ft-maxiters", type=int, default=60, help="a-posteriori fine-tune iterations")
    ap.add_argument("--ft-lr", type=float, default=3e-4)
    ap.add_argument("--ft-substeps", type=int, default=10,
                    help="host steps per save interval (match evaluate --embedded's 10; "
                         "9 = the NDE's own dt=600s discretization, the r4 ablation arm)")
    ap.add_argument("--bench-repeats", type=int, default=3,
                    help="step-bench timing blocks (min/median/max reported)")
    ap.add_argument("--host-matched-substeps", action="store_true",
                    help="train the NDE at the embedded host's dt (~540 s, 10 substeps per "
                         "stride-9 save) instead of the reference's 600 s — the r4 ablation "
                         "arm isolating the a-posteriori 0.3x discretization hypothesis")
    ap.add_argument("--finish-aposteriori", action="store_true",
                    help="end the training pipeline with the a-posteriori (through-the-host) "
                         "fine-tune so the SHIPPED checkpoint is the one that helps its "
                         "deployment host (the NDE-stage checkpoint is kept alongside as "
                         "<save-nns>_nde_stage)")
    args = ap.parse_args(argv)
    if args.finish_aposteriori and args.ensemble:
        # Fail in milliseconds, not after the chip-hours ensemble pipeline:
        # the late check (post-training) used to discard the run it just paid
        # for (ADVICE r4).
        ap.error("--finish-aposteriori takes a solo run (extract an ensemble member first)")
    args.fast_assembly = {"on": True, "off": False}.get(args.fast_assembly, args.fast_assembly)
    global TRAIN_FILES, TEST_FILES, DATA_DIR
    DATA_DIR = args.data_dir
    TRAIN_FILES, TEST_FILES, suite_diurnal = resolve_suite(args.suite, args.extra_train)
    if args.smoke:
        global STAGES
        STAGES = [(w, s, 3, lr) for w, s, _, lr in STAGES]
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.mode == "step-bench":
        result = step_bench(tridiag_backend=args.tridiag_backend, split_unroll=args.split_unroll,
                            fast_assembly=args.fast_assembly, implicit_solve_grad=not args.no_ift,
                            diurnal=suite_diurnal, shooting=args.shooting,
                            ensemble=args.ensemble, n_repeats=args.bench_repeats,
                            member_fold=args.member_fold)
        result["tridiag_backend"] = args.tridiag_backend
        result["fast_assembly"] = args.fast_assembly
        result["implicit_solve_grad"] = not args.no_ift
        result["split_unroll"] = args.split_unroll
        result["member_fold"] = args.member_fold
        print(json.dumps(result))
    elif args.mode == "embedded-eval":
        # Eval-only a-posteriori ablation arm (VERDICT r3 item 2a): score a
        # checkpoint in the embedded host at an ARBITRARY host substep count
        # (--ft-substeps 9 = the NDE's own dt = 600 s) without fine-tuning,
        # to separate "the host's dt differs" from "the host's solver
        # formulation differs" as the cause of the pre-fine-tune 0.3x.
        from climateparameterizations_jl_tpu.cli.main import _load_nns

        if not args.eval_checkpoint:
            raise SystemExit("--mode embedded-eval needs --eval-checkpoint")
        _, model, _ = build(diurnal=suite_diurnal)
        nns, ckpt_meta = _load_nns(args.eval_checkpoint)
        if ckpt_meta.get("mpp"):
            import dataclasses as _dc

            from climateparameterizations_jl_tpu.cli.main import _restore_mpp

            model = _dc.replace(model, **_restore_mpp(ckpt_meta))
            print(f"restored TRAINING-time mPP parameters from checkpoint meta: {ckpt_meta['mpp']}", flush=True)
        print(f"held-out embedded eval at substeps={args.ft_substeps} "
              f"(dt={9 * 600 / args.ft_substeps:.0f} s):", flush=True)
        held_out = evaluate_embedded(model, nns, embedded_substeps=args.ft_substeps)
        result = dict(eval_checkpoint=args.eval_checkpoint,
                      embedded_substeps=args.ft_substeps, held_out=held_out)
    elif args.mode == "aposteriori":
        # Fine-tune a flagship checkpoint THROUGH the embedded host column
        # (deployment-model-in-the-loop), held-out embedded eval before/after.
        from climateparameterizations_jl_tpu.cli.main import _load_nns

        if not args.eval_checkpoint:
            raise SystemExit("--mode aposteriori needs --eval-checkpoint (the flagship init)")
        wall0 = time.perf_counter()
        ds, model, _ = build(diurnal=suite_diurnal)
        nns, ckpt_meta = _load_nns(args.eval_checkpoint)
        if int(ckpt_meta.get("ensemble", 0) or 0):
            raise SystemExit("--mode aposteriori takes a solo checkpoint; extract a member first")
        if ckpt_meta.get("mpp"):
            import dataclasses as _dc

            from climateparameterizations_jl_tpu.cli.main import _restore_mpp

            model = _dc.replace(model, **_restore_mpp(ckpt_meta))
            print(f"restored TRAINING-time mPP parameters from checkpoint meta: {ckpt_meta['mpp']}", flush=True)
        print("held-out embedded eval BEFORE fine-tune:", flush=True)
        before = evaluate_embedded(model, nns, embedded_substeps=args.ft_substeps)
        nns, ft = aposteriori_finetune(
            ds, model, nns, maxiters=3 if args.smoke else args.ft_maxiters,
            lr=args.ft_lr, substeps=args.ft_substeps, tridiag_backend=args.tridiag_backend,
        )
        if args.save_nns:
            save_nns(nns, args.save_nns, model=model)
            print(f"a-posteriori checkpoint saved to {args.save_nns}", flush=True)
        print("held-out embedded eval AFTER fine-tune:", flush=True)
        after = evaluate_embedded(model, nns, embedded_substeps=args.ft_substeps)
        improvement = {
            name: dict(
                embedded_before=before[name]["embedded"], embedded_after=after[name]["embedded"],
                improvement=before[name]["embedded"] / after[name]["embedded"],
                win_vs_twin_after=after[name]["win_vs_twin"],
                nde_before=before[name]["nde"], nde_after=after[name]["nde"],
            )
            for name in after
        }
        for name, row in improvement.items():
            print(f"a-posteriori[{name}]: embedded {row['embedded_before']:.4e} -> "
                  f"{row['embedded_after']:.4e} ({row['improvement']:.2f}x better); "
                  f"NDE {row['nde_before']:.4e} -> {row['nde_after']:.4e}", flush=True)
        result = dict(
            init_checkpoint=args.eval_checkpoint, finetune=ft,
            held_out_before=before, held_out_after=after, improvement=improvement,
            total_wall_s=time.perf_counter() - wall0,
        )
    elif args.eval_checkpoint:
        from climateparameterizations_jl_tpu.cli.main import _load_nns

        _, model, _ = build(diurnal=suite_diurnal)
        loaded, ckpt_meta = _load_nns(args.eval_checkpoint)
        if ckpt_meta.get("mpp"):
            import dataclasses as _dc

            from climateparameterizations_jl_tpu.cli.main import _restore_mpp

            model = _dc.replace(model, **_restore_mpp(ckpt_meta))
            print(f"restored TRAINING-time mPP parameters from checkpoint meta: {ckpt_meta['mpp']}", flush=True)
        if ckpt_meta.get("ensemble"):
            held_out = evaluate_ensemble(model, loaded)
        else:
            held_out = evaluate(model, loaded)
        result = dict(eval_checkpoint=args.eval_checkpoint,
                      ensemble=int(ckpt_meta.get("ensemble", 0) or 0), held_out=held_out)
    else:
        wall0 = time.perf_counter()
        t0 = time.perf_counter()
        ds, model, nns = build(diurnal=suite_diurnal)
        data_s = time.perf_counter() - t0
        mpp_info = None
        if args.calibrate_mpp:
            model, mpp_info = calibrate_mpp(ds, model, maxiters=5 if args.smoke else 60)
            print(f"mPP calibration ({mpp_info['wall_s']:.1f} s, {mpp_info['optimizer']}): "
                  f"{mpp_info['loss_initial']:.4e} -> {mpp_info['loss_final']:.4e}; {mpp_info['params']}", flush=True)
        pre, pre_s = {}, 0.0
        if args.ensemble:
            members = build_ensemble_members(args.ensemble)
            if args.pretrain_epochs:
                members, pre, pre_s = pretrain_ensemble(
                    ds, model, members, epochs=5 if args.smoke else args.pretrain_epochs
                )
                print(f"pretrain x{args.ensemble} ({pre_s:.1f} s, one vmapped scan)", flush=True)
            stacked, stages = nde_train_ensemble(ds, model, members,
                                                 tridiag_backend=args.tridiag_backend,
                                                 fast_assembly=args.fast_assembly or "auto",
                                                 shooting=args.shooting,
                                                 shooting_hybrid=args.shooting_hybrid,
                                                 member_fold=args.member_fold)
            if args.save_nns:
                save_nns(stacked, args.save_nns, ensemble=args.ensemble, model=model)
                print(f"ensemble checkpoint saved to {args.save_nns}", flush=True)
            held_out = evaluate_ensemble(model, stacked)
        else:
            if args.pretrain_epochs:
                nns, pre, pre_s = pretrain(ds, model, nns, epochs=5 if args.smoke else args.pretrain_epochs)
                print(f"pretrain ({pre_s:.1f} s): " + ", ".join(f"{k} {a:.3e}->{b:.3e}" for k, (a, b) in pre.items()), flush=True)
            nns, stages = nde_train(ds, model, nns, tridiag_backend=args.tridiag_backend,
                                    fast_assembly=args.fast_assembly or "auto",
                                    shooting=args.shooting, shooting_hybrid=args.shooting_hybrid,
                                    host_matched_substeps=args.host_matched_substeps)
            if args.save_nns:
                nde_stage_dir = args.save_nns + ("_nde_stage" if args.finish_aposteriori else "")
                save_nns(nns, nde_stage_dir if args.finish_aposteriori else args.save_nns, model=model)
                print(f"{'NDE-stage ' if args.finish_aposteriori else ''}checkpoint saved to "
                      f"{nde_stage_dir if args.finish_aposteriori else args.save_nns}", flush=True)
            held_out = evaluate(model, nns)
        result = dict(
            sims=len(TRAIN_FILES), frames=N_FRAMES, data_s=data_s, mpp_calibration=mpp_info,
            ensemble=args.ensemble, shooting=args.shooting, data_dir=DATA_DIR,
            host_matched_substeps=args.host_matched_substeps,
            pretrain=pre, pretrain_s=pre_s, stages=stages, held_out=held_out,
            total_wall_s=time.perf_counter() - wall0,
        )
        if args.finish_aposteriori:
            # Deployment-first pipeline (VERDICT r3 item 2): the flagship's
            # FINAL stage is the through-the-host fine-tune, so the shipped
            # checkpoint is the one that HELPS the deployment host (the
            # NDE-stage checkpoint measured 0.3-0.4x vs its physics twin on
            # LES data before this stage).
            print("held-out embedded eval BEFORE the a-posteriori stage:", flush=True)
            before = evaluate_embedded(model, nns, embedded_substeps=args.ft_substeps)
            nns, ft = aposteriori_finetune(
                ds, model, nns, maxiters=3 if args.smoke else args.ft_maxiters,
                lr=args.ft_lr, substeps=args.ft_substeps, tridiag_backend=args.tridiag_backend,
            )
            if args.save_nns:
                save_nns(nns, args.save_nns, model=model)
                print(f"deployment (a-posteriori) checkpoint saved to {args.save_nns}", flush=True)
            print("held-out embedded eval AFTER the a-posteriori stage:", flush=True)
            after = evaluate_embedded(model, nns, embedded_substeps=args.ft_substeps)
            result["aposteriori"] = dict(
                finetune=ft, held_out_before=before, held_out_after=after,
                improvement={name: dict(
                    embedded_before=before[name]["embedded"], embedded_after=after[name]["embedded"],
                    improvement=before[name]["embedded"] / after[name]["embedded"],
                    win_vs_twin_after=after[name]["win_vs_twin"],
                ) for name in after},
            )
            result["total_wall_s"] = time.perf_counter() - wall0
        print(f"TOTAL wall: {result['total_wall_s']:.1f} s")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
