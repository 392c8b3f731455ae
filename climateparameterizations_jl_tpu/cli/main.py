"""CLI implementation. See the package docstring for the subcommand map."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


# ----------------------------------------------------------------------------
# shared helpers
# ----------------------------------------------------------------------------


def _load_config(path: str | None) -> dict:
    if not path:
        return {}
    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            return yaml.safe_load(f) or {}
        return json.load(f)


def _apply_config(args: argparse.Namespace, config: dict, parser_defaults: dict, explicit: set | None = None):
    """Config overrides defaults; explicit CLI flags override config.

    ``explicit`` names the dests actually typed on the command line —
    comparing values against parser defaults alone cannot tell
    ``--nz 32`` (typed, equal to the default) from an omitted flag, and the
    config would silently override the user's explicit choice.
    """
    explicit = explicit or set()
    for key, value in config.items():
        attr = key.replace("-", "_")
        if attr in explicit:
            continue
        if hasattr(args, attr) and getattr(args, attr) == parser_defaults.get(attr):
            setattr(args, attr, value)
    return args


def _sims(arg: str) -> list[str]:
    return [s.strip() for s in arg.split(",") if s.strip()]


def _suite_diurnal_flags(names) -> list:
    from climateparameterizations_jl_tpu.data.registry import simulation_parameters

    flags = []
    for n in names:
        try:
            flags.append(bool(simulation_parameters(n).diurnal))
        except KeyError:
            flags.append(False)
    return flags


def _load_suite(names, Nz: int, data_dir=None, n_save=288, dt_save=600.0, Nz_les=128):
    from climateparameterizations_jl_tpu.data.containers import (
        coarsen_dataset,
        enforce_surface_fluxes,
        stack_datasets,
    )
    from climateparameterizations_jl_tpu.data.registry import load_simulation

    diurnal = _suite_diurnal_flags(names)
    datasets = []
    for n, is_diurnal in zip(names, diurnal):
        ds = coarsen_dataset(load_simulation(n, data_dir=data_dir, Nz_les=Nz_les, n_save=n_save, dt_save=dt_save), Nz)
        # Diurnal sims carry a time-VARYING top wT face; pinning it to the
        # constant amplitude would erase the cycle.
        datasets.append(ds if is_diurnal else enforce_surface_fluxes(ds))
    return stack_datasets(datasets) if len(datasets) > 1 else datasets[0]


def _wind_model(ds, Nz: int, **overrides):
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.data.containers import fit_wind_mixing_scalings
    from climateparameterizations_jl_tpu.models.wind_mixing import WindMixingModel
    from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

    scalings = fit_wind_mixing_scalings(ds)
    first = lambda x: x.reshape(-1)[0]  # noqa: E731 — suite-stacked constants are identical
    t_row = ds.t.reshape(-1, ds.t.shape[-1])[0]
    kw = dict(
        H=first(ds.H), tau=jnp.abs(t_row[-1] - t_row[0]), f=first(ds.f), g=first(ds.g),
        alpha=first(ds.alpha), kappa=jnp.float32(10.0), scalings=scalings,
        mpp=MPPParameters.default(), Nz=Nz,
    )
    kw.update(overrides)
    return WindMixingModel(**kw)


def _base_closure_overrides(name: str) -> dict:
    """WindMixingModel flags for a --base-closure name (also read back from
    checkpoint meta so evaluate/ensemble rebuild the training-time dynamics).

    Parity: the reference's base-closure variants — mPP (``train_NDE.jl``),
    convective adjustment (``train_NDE_2DaySuite_SWNH_convective_adjustment.jl``),
    bare NNs (``NDE_training.jl`` with both toggles off).
    """
    table = {
        "mpp": dict(use_mpp=True, use_conv_adj=False),
        "conv-adj": dict(use_mpp=False, use_conv_adj=True),
        "none": dict(use_mpp=False, use_conv_adj=False),
    }
    try:
        return table[name]
    except KeyError:
        raise SystemExit(f"unknown base closure {name!r} (expected one of {sorted(table)})") from None


_MPP_FIELDS = ("nu_0", "nu_minus", "Ri_c", "delta_Ri", "Pr")


def _mpp_meta(model) -> dict:
    """The model's mPP parameters as plain floats for checkpoint meta.

    Always recorded: a checkpoint trained over CALIBRATED mPP parameters is
    a different closure than the same NNs over the defaults — evaluating it
    over a default-mPP model silently scores garbage (caught on the r3
    flagship: the calibrated-base fold checkpoint evaluated 500x worse under
    the rebuilt default base)."""
    return {k: float(getattr(model.mpp, k)) for k in _MPP_FIELDS}


def _restore_mpp(meta: dict, override_path: str | None = None) -> dict:
    """``_wind_model`` overrides restoring the TRAINING-time mPP parameters.

    ``override_path`` (an ``optimise-mpp`` ``mpp_parameters.json``) wins over
    the checkpoint meta; absent both, returns {} (defaults)."""
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

    params = None
    if override_path:
        with open(override_path) as f:
            params = json.load(f)
    elif meta.get("mpp"):
        params = meta["mpp"]
    if params is None:
        return {}
    return {"mpp": MPPParameters(**{k: jnp.float32(params[k]) for k in _MPP_FIELDS})}


def _save_nns(output: str, nns, meta: dict):
    from climateparameterizations_jl_tpu.train.checkpoint import save_checkpoint

    arch_src = nns
    if meta.get("ensemble"):
        # Stacked deep ensemble: the arch is per-member (sizes read from the
        # member-0 slice; the stacked tree itself is what gets saved).
        import jax as _jax

        arch_src = _jax.tree.map(lambda x: x[0], nns)
    arch = {}
    for name in ("uw", "vw", "wT"):
        nn = getattr(arch_src, name, None)
        if nn is not None:
            arch[name] = {"sizes": list(nn.sizes), "activation": nn.activation}
    save_checkpoint(output, nns, {**meta, "arch": arch})


def _load_nns(directory: str):
    import jax

    from climateparameterizations_jl_tpu.closures.mlp import mlp_init
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs
    from climateparameterizations_jl_tpu.train.checkpoint import load_checkpoint

    with open(os.path.join(directory, "meta.json")) as f:
        meta = json.load(f)
    arch = meta["arch"]
    skeleton = FluxNNs(
        **{
            name: (
                mlp_init(jax.random.PRNGKey(0), arch[name]["sizes"], arch[name]["activation"])
                if name in arch
                else None
            )
            for name in ("uw", "vw", "wT")
        }
    )
    if meta.get("ensemble"):
        from climateparameterizations_jl_tpu.train.deep_ensemble import stack_members

        skeleton = stack_members([skeleton] * int(meta["ensemble"]))
    return load_checkpoint(directory, skeleton)


def _resolve_train_state(directory: str | None) -> str | None:
    """Accept either a run output dir (containing ``train_state/``) or the
    train-state dir itself for ``--resume-from``."""
    if directory is None:
        return None
    nested = os.path.join(directory, "train_state")
    return nested if os.path.isdir(nested) else directory


def cmd_generate_les(args) -> int:
    """Run the 3-D LES and save horizontally-averaged training data (.npz).

    Parity: the reference's LES driver ``wind_mixing/wind_mixing.jl:1-143``
    (256^3 Oceananigans GPU run -> AveragedField output), as one jitted scan.
    """
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.data.les import LESConfig, run_les, stable_dt

    # Diurnal forcing: explicit flag, or inferred from the catalog name so a
    # "--jld2-name wind_*_diurnal_*" file actually carries the cycle the
    # downstream loader will assume from that name. Validate the name and
    # the flag/name agreement BEFORE the (long) LES run.
    diurnal = getattr(args, "diurnal", False)
    if args.jld2_name:
        from climateparameterizations_jl_tpu.data.registry import (
            lesbrary_relative_path,
            simulation_parameters,
        )

        spec = simulation_parameters(args.jld2_name)  # raises on a bad name NOW
        lesbrary_relative_path(args.jld2_name)
        if diurnal and not spec.diurnal:
            raise SystemExit(
                f"--diurnal with constant-flux catalog name {args.jld2_name!r}: downstream "
                "loaders would pin the cyclic data to a constant amplitude; use a *_diurnal_* name"
            )
        diurnal = diurnal or bool(spec.diurnal)
        # A file written under a catalog name must carry that name's forcing
        # (downstream name-based tooling assumes it): default Qu/Qb/f from
        # the spec, and refuse a contradicting explicit flag. Signed Qu like
        # the registry stand-ins (negative = eastward; 2DaySuite entries
        # store magnitudes).
        spec_qu = -abs(spec.Qu) if spec.Qu != 0.0 else 0.0
        for flag, value, spec_value in (("--qu", args.qu, spec_qu), ("--qb", args.qb, spec.Qb)):
            if value is not None and abs(value - spec_value) > 1e-12 * max(abs(spec_value), 1e-30):
                raise SystemExit(
                    f"{flag}={value} contradicts catalog entry {args.jld2_name!r} ({flag[2:]}={spec_value}); "
                    "drop the flag (the spec's value is the default) or use a matching name"
                )
        qu = spec_qu if args.qu is None else args.qu
        qb = spec.Qb if args.qb is None else args.qb
        f_cor = spec.f
    else:
        qu = args.qu if args.qu is not None else -5e-4
        qb = args.qb if args.qb is not None else 3e-8
        f_cor = 1e-4
    config = LESConfig.default(Nx=args.n_horizontal, Ny=args.n_horizontal, Nz=args.nz_les, Qu=qu, Qb=qb, f=f_cor, diurnal=diurnal)
    cfl = 0.6 if args.les_method == "rk3" else 0.2
    dt = args.dt if args.dt else stable_dt(config, u_max=args.u_max, cfl=cfl)
    save_every = max(1, int(round(args.dt_save / dt)))
    ds = run_les(
        config, dt=dt, n_save=args.n_save, save_every=save_every, method=args.les_method,
        max_frames_per_dispatch=args.max_frames_per_dispatch,
        max_steps_per_dispatch=args.max_steps_per_dispatch,
    )
    from climateparameterizations_jl_tpu.data.free_convection import save_column_npz

    os.makedirs(args.output, exist_ok=True)
    path = os.path.join(args.output, "les_profiles.npz")
    save_column_npz(path, ds)
    result = {
        "output": path, "dt": float(dt), "save_every": save_every,
        "frames": int(ds.t.shape[-1]),
    }
    if args.jld2_name:
        # Reference-compatible .jld2 under the catalog layout, so the file
        # feeds any --data-dir pipeline under that catalog name.
        from climateparameterizations_jl_tpu.data.lesbrary import write_les_profiles
        from climateparameterizations_jl_tpu.data.registry import lesbrary_relative_path

        jld2_path = os.path.join(args.output, lesbrary_relative_path(args.jld2_name))
        result["jld2"] = write_les_profiles(jld2_path, ds)
    T = np.asarray(ds.T)
    result["T_final_range"] = [float(T[-1].min()), float(T[-1].max())]
    result["finite"] = bool(np.isfinite(T).all())
    print(json.dumps(result))
    return 0


def _load_fc_nn(directory: str):
    """Load a free-convection NN checkpoint (MLP or ConvMLP) by its meta arch."""
    import jax

    from climateparameterizations_jl_tpu.closures.mlp import (
        free_convection_conv_mlp,
        mlp_init,
    )
    from climateparameterizations_jl_tpu.train.checkpoint import load_checkpoint

    with open(os.path.join(directory, "meta.json")) as f:
        meta = json.load(f)
    arch = meta["arch"]
    if "conv_width" in arch:
        Nz = arch["sizes"][-1] + 1
        skeleton = free_convection_conv_mlp(
            jax.random.PRNGKey(0), Nz, conv_width=arch["conv_width"],
            activation=arch.get("activation", "relu"),
        )
    else:
        skeleton = mlp_init(jax.random.PRNGKey(0), arch["sizes"], arch["activation"])
    if meta.get("ensemble"):
        from climateparameterizations_jl_tpu.train.deep_ensemble import stack_members

        skeleton = stack_members([skeleton] * int(meta["ensemble"]))
    nn, _ = load_checkpoint(directory, skeleton)
    return nn, meta


def cmd_evaluate_fc(args) -> int:
    """Free-convection test harness across simulation ids.

    Parity: ``free_convection/test_free_convection_nde.jl:110-165`` — truth
    vs NDE vs conv-adj vs KPP vs TKE (vs embedded) for every id, plus the
    loss matrix over the suite.
    """
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
    from climateparameterizations_jl_tpu.data.free_convection import (
        build_free_convection_model,
        load_free_convection_simulation,
    )
    from climateparameterizations_jl_tpu.eval.animations import plot_loss_matrix
    from climateparameterizations_jl_tpu.eval.profile import free_convection_profile

    nn, meta = _load_fc_nn(args.checkpoint)
    ensemble_nn = None
    if meta.get("ensemble"):
        from climateparameterizations_jl_tpu.train.deep_ensemble import unstack_members

        ensemble_nn = nn
        nn = unstack_members(nn)[0]
        print(f"deep-ensemble checkpoint (K={int(meta['ensemble'])}): "
              f"'nde' channels show member 0; uncertainty_sim*.npz / 'nde_ensemble_mean' "
              f"carry the ensemble", flush=True)
    ids = [int(s) for s in _sims(args.sim_ids)]
    if getattr(args, "netcdf", False) and not args.embedded:
        raise SystemExit("--netcdf requires --embedded (it writes the embedded pair)")
    os.makedirs(args.output, exist_ok=True)

    # Reuse the TRAINING scalings and base closure from the checkpoint meta
    # (the reference's override_scalings semantics): the NN is only valid
    # under the normalization it was trained with. Old checkpoints without
    # recorded scalings fall back to refitting, with a warning.
    saved = meta.get("scalings")
    base_closure = meta.get("base_closure", "convective_adjustment")
    if saved is None:
        print("warning: checkpoint has no recorded training scalings; refitting per sim (results not comparable to training)")

    # "base" is the NN-free member of base_closure="none" checkpoints
    # (free_convection_profile labels it honestly instead of "conv_adj").
    members = ("nde", "conv_adj", "base", "kpp", "tke", "embedded", "embedded_baseline")
    matrix: dict = {}
    for i in ids:
        ds = load_free_convection_simulation(
            i, args.data_dir, args.nz, n_save=args.n_save, dt_save=args.dt_save,
            source=args.source, les_cache_dir=args.les_cache_dir,
        )
        if saved is not None:
            T_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(saved["T"]["mu"]), jnp.float32(saved["T"]["sigma"]))
            wT_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(saved["wT"]["mu"]), jnp.float32(saved["wT"]["sigma"]))
        else:
            T_scaling = ZeroMeanUnitVarianceScaling.fit(ds.T.reshape(-1))
            wT_scaling = ZeroMeanUnitVarianceScaling.fit(ds.wT.reshape(-1))
        model = build_free_convection_model(ds, T_scaling, wT_scaling, base_closure=base_closure)
        tsteps = np.arange(0, min(args.n_eval_steps, int(ds.t.shape[-1])), args.eval_stride)
        ev = free_convection_profile(
            model, nn, ds, tsteps, n_substeps=args.n_substeps, include_embedded=args.embedded,
            kpp_n_substeps=args.kpp_n_substeps,
        )
        np.savez(os.path.join(args.output, f"sim{i}.npz"), **ev.to_dict())
        if getattr(args, "netcdf", False):
            # Reference-layout NetCDF pair (oceananigans_nn.jl:174-192):
            # baseline T and +NN T/wT, one directory per simulation.
            from climateparameterizations_jl_tpu.data.netcdf import write_paired_column_netcdf

            sim_dir = os.path.join(args.output, f"sim{i}")
            os.makedirs(sim_dir, exist_ok=True)
            write_paired_column_netcdf(
                sim_dir, ev["zc"], ev["zf"], ev["t"],
                ev["embedded_baseline_T"], ev["embedded_T"], ev["embedded_wT"],
                attrs={"simulation_id": i},
            )
        if ensemble_nn is not None:
            from climateparameterizations_jl_tpu.eval.ensemble_uq import fc_ensemble_uq

            uq = fc_ensemble_uq(model, ensemble_nn, ds, tsteps, n_substeps=args.n_substeps)
            np.savez(os.path.join(args.output, f"uncertainty_sim{i}.npz"), **uq)
            matrix.setdefault("nde_ensemble_mean", []).append(float(np.mean(uq["losses_ensemble_mean_T"])))
            if i == ids[0]:
                from climateparameterizations_jl_tpu.eval.animations import plot_nde_ensemble_uncertainty

                plot_nde_ensemble_uncertainty(
                    uq, ev["truth_T"], os.path.join(args.output, "nde_uncertainty.png")
                )
        for m in members:
            key = f"losses_{m}_T"
            if key in ev.keys():
                matrix.setdefault(m, []).append(float(np.mean(ev[key])))

    matrix = {m: np.asarray(v) for m, v in matrix.items()}
    plot_loss_matrix(matrix, [f"sim{i}" for i in ids], os.path.join(args.output, "loss_matrix.png"))
    summary = {m: float(np.mean(v)) for m, v in matrix.items()}
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


def cmd_ensemble(args) -> int:
    """Perturbed-IC column ensemble, sharded over the device mesh (UQ).

    The capability extension SURVEY.md section 5 mandates: thousands of
    columns as one sharded program, ensemble mean/std saved per variable.
    """
    import jax
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.data.containers import training_tensors
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs
    from climateparameterizations_jl_tpu.parallel.sharding import (
        make_mesh,
        make_sharded_ensemble_solver,
    )
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

    names = _sims(args.sims)
    ds = _load_suite(names, args.nz, args.data_dir, args.n_save, args.dt_save)
    if args.checkpoint:
        nns, ckpt_meta = _load_nns(args.checkpoint)
        if ckpt_meta.get("ensemble"):
            # Deep-ensemble checkpoint: this command quantifies INITIAL-
            # CONDITION spread, which needs one closure — member 0 (parameter
            # spread is `evaluate`'s uncertainty_*.npz output).
            from climateparameterizations_jl_tpu.train.deep_ensemble import unstack_members

            nns = unstack_members(nns)[0]
            print(f"deep-ensemble checkpoint (K={int(ckpt_meta['ensemble'])}): "
                  f"perturbed-IC ensemble runs member 0", flush=True)
    else:
        nns, ckpt_meta = FluxNNs(uw=None, vw=None, wT=None), {}
    flags = _suite_diurnal_flags(names)
    # CLAUDE.md diurnal rule: thread diurnal_amplitude through
    # training_tensors AND set model.diurnal, or the cycling surface flux
    # silently freezes at its frame-0 value (sin(0) = 0: no heat flux at all).
    # Fallback any(flags): amplitude is per-sim, so constant members keep
    # their frozen BC either way — all(flags) would drop the cycle whenever
    # a meta-less checkpoint rides a mixed suite.
    diurnal = bool(ckpt_meta.get("diurnal", any(flags)))
    model = _wind_model(
        ds, args.nz, diurnal=diurnal,
        smooth_NN=bool(ckpt_meta.get("smooth_NN", False)),
        smooth_Ri=bool(ckpt_meta.get("smooth_Ri", False)),
        **_base_closure_overrides(ckpt_meta.get("base_closure", "mpp")),
        **_restore_mpp(ckpt_meta, getattr(args, "mpp_params", None)),
    )
    from climateparameterizations_jl_tpu.models.wind_mixing import pack_flux_nns

    packed = pack_flux_nns(nns)
    if packed is not None:  # one fused matmul chain per RHS (PackedFluxNNs)
        nns = packed

    tsteps = np.arange(0, min(args.n_steps, int(ds.t.shape[-1])))
    batch = training_tensors(ds, model.scalings, tsteps, tau=model.tau, diurnal=diurnal)
    E = args.n_members
    key = jax.random.PRNGKey(args.seed)
    # Ensemble members perturb the FIRST simulation's initial column (and
    # use its BCs); with a multi-sim --sims suite the later sims only
    # contribute to the scalings.
    x0_base = batch.x0.reshape(-1, 3 * args.nz)[0]
    x0 = x0_base[None, :] + args.perturbation * jax.random.normal(key, (E, 3 * args.nz), jnp.float32)
    bcs = jax.tree.map(lambda b: jnp.broadcast_to(jnp.reshape(b, (-1,))[0], (E,)), batch.bcs)

    mesh = make_mesh()
    config = NDETrainConfig(n_substeps=args.n_substeps, method="split")
    solver = make_sharded_ensemble_solver(model, config, mesh)
    t = np.asarray(batch.t)
    with mesh:
        traj = solver(nns, bcs, x0, jnp.float32(t[0]), jnp.float32(t[1] - t[0]), len(t) - 1)
        traj = np.asarray(traj)  # (Nt, E, 3Nz)

    os.makedirs(args.output, exist_ok=True)
    mean, std = traj.mean(axis=1), traj.std(axis=1)
    np.savez(os.path.join(args.output, "ensemble.npz"), mean=mean, std=std, t=t * float(model.tau))
    print(json.dumps({
        "members": E, "frames": int(traj.shape[0]),
        "final_mean_spread": float(std[-1].mean()),
        "finite": bool(np.isfinite(traj).all()),
    }))
    return 0


def cmd_extract(args) -> int:
    from climateparameterizations_jl_tpu.train.checkpoint import extract_checkpoint

    extract_checkpoint(args.run_dir, args.out_dir)
    print(f"extracted {args.run_dir} -> {args.out_dir}")
    return 0


def _parse_curriculum(spec, n_frames: int, n_substeps: int, maxiters: int, lr: float, default_window: int):
    """Parse "w[:s],w[:s],..." into :class:`CurriculumStage` objects.

    The ONE implementation for both NDE trainers (the wind/fc copies had
    diverged and dropped the stride scaling on single-stage runs): windows
    clamp to the available frames, and each stage's ``n_substeps`` scales by
    its stride so the inner physical step stays at ``dt_save / n_substeps``
    (the reference's ``1:9:1153`` tranges are strided saveat ranges —
    ``train_NDE_args.jl:197``, ``train_free_convection_nde.jl:244,258``).
    """
    from climateparameterizations_jl_tpu.train.nde import CurriculumStage

    def parse_stage(x: str):
        w, _, s = x.partition(":")
        return int(w), int(s) if s else 1

    windows = [parse_stage(x) for x in spec.split(",")] if spec else [(default_window, 1)]
    if any(w > n_frames for w, _ in windows):
        print(f"warning: clamping training windows {windows} to {n_frames} available frames")
        windows = [(min(w, n_frames), s) for w, s in windows]
    return [
        CurriculumStage(tsteps=np.arange(0, w, s), maxiters=maxiters, learning_rate=lr, n_substeps=n_substeps * s)
        for w, s in windows
    ]


def _history_writer(output: str, print_every: int = 10):
    from climateparameterizations_jl_tpu.train.checkpoint import history_path

    hist = history_path(output)

    def callback(i, total, channels=None, *_rest):
        rec = {"iter": int(i), "loss": float(total)}
        if channels is not None:
            for field in ("u", "v", "T", "dudz", "dvdz", "dTdz"):
                if hasattr(channels, field):
                    rec[field] = float(getattr(channels, field))
        hist.append(rec)
        # Per-iteration channel percentages, the reference's training
        # callback observability (NDE_training.jl:343-369).
        if print_every and i % print_every == 0 and channels is not None:
            parts = {k: v for k, v in rec.items() if k not in ("iter", "loss")}
            s = sum(parts.values())
            if s > 0:
                pct = " ".join(f"{k} {100.0 * v / s:.1f}%" for k, v in parts.items())
                print(f"  iter {i}: loss {total:.4e} | {pct}", flush=True)

    return callback


# ----------------------------------------------------------------------------
# subcommand handlers
# ----------------------------------------------------------------------------


def cmd_catalog(args) -> int:
    from climateparameterizations_jl_tpu.data.registry import (
        FREE_CONVECTION_IDS,
        WIND_MIXING_CATALOG,
    )

    print("# wind_mixing catalog (%d simulations)" % len(WIND_MIXING_CATALOG))
    for name in WIND_MIXING_CATALOG:
        print(name)
    print("# free_convection ids:", ", ".join(str(i) for i in FREE_CONVECTION_IDS))
    return 0


def cmd_fetch(args) -> int:
    """Download the 9 MIT-hosted free-convection datasets (DataDeps parity,
    ``free_convection/src/data.jl:3-12``). Graceful offline failure."""
    from climateparameterizations_jl_tpu.data.registry import fetch_free_convection

    ids = [int(s) for s in _sims(args.sim_ids)]
    failures = 0
    for i in ids:
        try:
            path = fetch_free_convection(i, args.data_dir, timeout=args.timeout, force=args.force)
            print(f"fetch[{i}]: {path}")
        except ConnectionError as e:
            failures += 1
            print(f"fetch[{i}]: FAILED — {e}")
    if failures:
        print(f"fetch: {failures}/{len(ids)} downloads failed (offline stand-ins remain available)")
    return 1 if failures == len(ids) else 0


def cmd_train_nn(args) -> int:
    import jax

    from climateparameterizations_jl_tpu.closures.mlp import mlp_init
    from climateparameterizations_jl_tpu.data.containers import (
        direct_regression_pairs,
        fit_wind_mixing_scalings,
    )
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs
    from climateparameterizations_jl_tpu.train.nn import train_flux_nn

    ds = _load_suite(_sims(args.sims), args.nz, args.data_dir, args.n_save, args.dt_save)
    scalings = fit_wind_mixing_scalings(ds)
    key = jax.random.PRNGKey(args.seed)
    trained = {}
    for flux in _sims(args.fluxes):
        x, y = direct_regression_pairs(ds, scalings, flux)
        key, k = jax.random.split(key)
        nn = mlp_init(k, [3 * args.nz, args.hidden, args.nz - 1], args.activation)
        nn, history = train_flux_nn(
            nn, x, y, learning_rate=args.lr, epochs=args.epochs,
            gradient_scaling=args.gradient_scaling, dz_hat=1.0 / args.nz,
            causality=args.spatial_causality,
        )
        trained[flux] = nn
        print(f"train-nn[{flux}]: loss {history[0]:.4e} -> {history[-1]:.4e}")
    nns = FluxNNs(uw=trained.get("uw"), vw=trained.get("vw"), wT=trained.get("wT"))
    _save_nns(args.output, nns, {"command": "train-nn", "sims": args.sims, "nz": args.nz})
    print(f"saved checkpoint to {args.output}")
    return 0


def cmd_train_nde(args) -> int:
    import jax

    # Normalize the CLI spellings (config files may also set booleans directly).
    if args.fast_assembly in ("off", False):
        args.fast_assembly = False
    elif args.fast_assembly in ("on", True):
        args.fast_assembly = True
    # Fail fast on EXPLICIT --fast-assembly misconfiguration (before any data
    # loads; the deep solver check would only fire at the first jit trace).
    # "auto" never errors: it resolves to the default path when unsupported
    # (models.wind_mixing.resolve_fast_assembly).
    if args.fast_assembly and args.fast_assembly != "auto":
        if args.smooth_nn:
            raise SystemExit("train-nde: --fast-assembly does not apply the NN smoothing filter; drop --smooth-nn")
        if args.method not in ("split", "rk4"):
            raise SystemExit(f"train-nde: --fast-assembly supports --method split or rk4 (got {args.method!r})")
        if args.method == "rk4" and args.smooth_ri:
            raise SystemExit("train-nde: --fast-assembly with --method rk4 does not apply the Ri smoothing filter; drop --smooth-ri")
    if getattr(args, "ensemble", 0) and args.optimizer not in ("adam", "sgd"):
        raise SystemExit(
            f"train-nde: --ensemble requires an elementwise optimizer (adam/sgd); "
            f"{args.optimizer} couples members through its shared linesearch"
        )

    from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
    from climateparameterizations_jl_tpu.data.containers import multiple_shooting_tensors, training_tensors
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs
    from climateparameterizations_jl_tpu.train.nde import (
        CurriculumStage,
        NDETrainConfig,
        train_wind_mixing_nde,
    )

    names = _sims(args.sims)
    ds = _load_suite(names, args.nz, args.data_dir, args.n_save, args.dt_save)
    flags = _suite_diurnal_flags(names)
    # Mixed suites are fine: amplitude is per-sim (constant-flux members
    # carry 0 and keep their frozen BC in _effective_bcs), so the model's
    # diurnal flag just enables the time-resolved path for the members
    # that need it.
    diurnal = any(flags)
    model = _wind_model(
        ds, args.nz, diurnal=diurnal,
        smooth_NN=args.smooth_nn, smooth_Ri=args.smooth_ri,
        **_base_closure_overrides(args.base_closure),
        # --mpp-params (an optimise-mpp json) trains over the CALIBRATED
        # base closure; the parameters are recorded in the checkpoint meta
        # so evaluate/ensemble rebuild the same dynamics.
        **_restore_mpp({}, getattr(args, "mpp_params", None)),
    )
    ensemble = int(getattr(args, "ensemble", 0) or 0)

    def _init_member(key):
        ks = jax.random.split(key, 3)
        return FluxNNs(*[wind_mixing_mlp(k, args.nz, scale=args.init_scale) for k in ks])

    if args.init_from:
        nns, init_meta = _load_nns(args.init_from)
        if int(init_meta.get("ensemble", 0) or 0) != ensemble:
            raise SystemExit(
                f"train-nde: --init-from checkpoint ensemble size "
                f"{init_meta.get('ensemble', 0) or 0} does not match --ensemble {ensemble}"
            )
    elif ensemble:
        from climateparameterizations_jl_tpu.train.deep_ensemble import init_ensemble

        nns = init_ensemble(jax.random.PRNGKey(args.seed), ensemble, _init_member)
    else:
        nns = _init_member(jax.random.PRNGKey(args.seed))

    config = NDETrainConfig(
        learning_rate=args.lr, maxiters=args.maxiters, n_substeps=args.n_substeps,
        method=args.method, gradient_scaling=args.gradient_scaling,
        optimizer=args.optimizer, tridiag_backend=args.tridiag_backend,
        fast_assembly=args.fast_assembly,
        training_fractions=(
            {"T": args.fraction_T, "dTdz": args.fraction_dTdz, "profile": args.fraction_profile}
            if args.auto_balance
            else None
        ),
    )
    n_frames = ds.t.reshape(-1, ds.t.shape[-1]).shape[-1] if ds.t.ndim > 1 else ds.t.shape[-1]
    stages = _parse_curriculum(
        args.curriculum, n_frames, args.n_substeps, args.maxiters, args.lr,
        default_window=args.n_train_steps,
    )
    if len(stages) == 1:
        # Single stage: thread the stride-scaled n_substeps through the
        # config (stages=None below bypasses the per-stage override — a
        # bare `--curriculum 1153:9` must not integrate 9x-coarser physics).
        import dataclasses as _dc

        config = _dc.replace(config, n_substeps=stages[0].n_substeps)
    def batch_fn(tsteps):
        # --shooting K: window-parallel (multiple-shooting) batches for
        # stages whose save-interval count K divides — every (sim, window)
        # pair rides the batch axis instead of one long sequential scan
        # (the curriculum's SHORT stages keep the plain batch: splitting a
        # 10-interval window is all overhead).
        t_arr = np.asarray(tsteps)
        K = getattr(args, "shooting", 0)
        if K and len(t_arr) > K and (len(t_arr) - 1) % K == 0:
            return multiple_shooting_tensors(ds, model.scalings, t_arr, K, tau=model.tau, diurnal=diurnal)
        return training_tensors(ds, model.scalings, tsteps, tau=model.tau, diurnal=diurnal)

    batch = batch_fn(stages[0].tsteps)

    import contextlib

    from climateparameterizations_jl_tpu.utils.profiling import trace

    if ensemble:
        from climateparameterizations_jl_tpu.train.deep_ensemble import train_wind_mixing_deep_ensemble as _train
    else:
        _train = train_wind_mixing_nde
    with trace(args.trace) if args.trace else contextlib.nullcontext():
        nns, history = _train(
            model, nns, batch, config,
            stages=stages if len(stages) > 1 else None,
            full_batch_fn=batch_fn if len(stages) > 1 else None,
            callback=_history_writer(args.output),
            checkpoint_dir=os.path.join(args.output, "train_state"),
            resume_from=_resolve_train_state(args.resume_from),
        )
    _save_nns(args.output, nns, {
        "command": "train-nde", "sims": args.sims, "nz": args.nz,
        # evaluate/ensemble must rebuild the EXACT training-time dynamics.
        "smooth_NN": bool(args.smooth_nn), "smooth_Ri": bool(args.smooth_ri),
        "diurnal": bool(diurnal), "base_closure": args.base_closure,
        "ensemble": ensemble, "mpp": _mpp_meta(model),
    })
    print(f"train-nde: loss {history[0].total():.4e} -> {history[-1].total():.4e}; saved to {args.output}")
    return 0


def cmd_train_embedded(args) -> int:
    """A-posteriori training: optimize the flux NNs THROUGH the embedded host
    column (the model `evaluate --embedded` scores). The reference cannot do
    this — Zygote does not differentiate through Oceananigans — so its
    closures always deploy into dynamics they were never trained against.
    See ``train/embedded.py``.
    """
    import jax

    from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs
    from climateparameterizations_jl_tpu.train.embedded import train_embedded_wind_mixing
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

    init_meta: dict = {}
    nns = None
    if args.init_from:
        nns, init_meta = _load_nns(args.init_from)
        if int(init_meta.get("ensemble", 0) or 0):
            raise SystemExit("train-embedded: deep-ensemble checkpoints are not supported yet; extract a member first")

    # Training sims default to the checkpoint's own suite (the common case:
    # fine-tune a checkpoint against the host on the data it trained on).
    if args.sims:
        names = _sims(args.sims)
    elif init_meta.get("sims"):
        names = _sims(init_meta["sims"])
    else:
        raise SystemExit("train-embedded: pass --sims (or --init-from a checkpoint that records its sims)")
    ds = _load_suite(names, args.nz, args.data_dir, args.n_save, args.dt_save)

    # Scaling context: the checkpoint's NNs expect their ORIGINAL training
    # scalings (override-scaling semantics, same resolution as evaluate).
    if args.scaling_sims:
        scaling_names, scaling_src = _sims(args.scaling_sims), "--scaling-sims"
    elif init_meta.get("sims"):
        scaling_names, scaling_src = _sims(init_meta["sims"]), "checkpoint meta"
    else:
        scaling_names, scaling_src = names, "training sims"
    scaling_ds = ds if scaling_names == names else _load_suite(scaling_names, args.nz, args.data_dir, args.n_save, args.dt_save)

    flags = _suite_diurnal_flags(names)
    diurnal = bool(init_meta.get("diurnal", any(flags))) or any(flags)
    base_closure = init_meta.get("base_closure", args.base_closure)
    model = _wind_model(
        scaling_ds, args.nz, diurnal=diurnal,
        smooth_NN=bool(init_meta.get("smooth_NN", False)),
        smooth_Ri=bool(init_meta.get("smooth_Ri", False)),
        **_base_closure_overrides(base_closure),
        **_restore_mpp(init_meta, getattr(args, "mpp_params", None)),
    )
    if nns is None:
        ks = jax.random.split(jax.random.PRNGKey(args.seed), 3)
        nns = FluxNNs(*[wind_mixing_mlp(k, args.nz, scale=args.init_scale) for k in ks])

    config = NDETrainConfig(
        learning_rate=args.lr, maxiters=args.maxiters, n_substeps=args.substeps,
        gradient_scaling=args.gradient_scaling,
        optimizer=args.optimizer, tridiag_backend=args.tridiag_backend,
        training_fractions=(
            {"T": args.fraction_T, "dTdz": args.fraction_dTdz, "profile": args.fraction_profile}
            if args.auto_balance
            else None
        ),
    )
    n_frames = ds.t.reshape(-1, ds.t.shape[-1]).shape[-1] if ds.t.ndim > 1 else ds.t.shape[-1]
    stages = _parse_curriculum(
        args.curriculum, n_frames, args.substeps, args.maxiters, args.lr,
        default_window=args.n_train_steps,
    )
    print(f"train-embedded: {len(names)} sim(s), {len(stages)} stage(s), "
          f"scaling context from {scaling_src} ({len(scaling_names)} sim(s))", flush=True)
    nns, history = train_embedded_wind_mixing(
        model, nns, ds, config,
        stages=stages,
        callback=_history_writer(args.output),
        checkpoint_dir=os.path.join(args.output, "train_state"),
        resume_from=_resolve_train_state(args.resume_from),
    )
    _save_nns(args.output, nns, {
        "command": "train-embedded",
        # evaluate resolves its scaling context from "sims" — record the
        # SCALING suite there (the NNs' feature space), training sims aside.
        "sims": ",".join(scaling_names), "train_sims": ",".join(names), "nz": args.nz,
        "smooth_NN": bool(init_meta.get("smooth_NN", False)),
        "smooth_Ri": bool(init_meta.get("smooth_Ri", False)),
        "diurnal": bool(diurnal), "base_closure": base_closure,
        "ensemble": 0, "mpp": _mpp_meta(model),
    })
    print(f"train-embedded: loss {history[0].total():.4e} -> {history[-1].total():.4e}; saved to {args.output}")
    return 0


def cmd_train_embedded_fc(args) -> int:
    """FC a-posteriori training: optimize the heat-flux NN THROUGH the
    embedded conv-adj host column (the model ``evaluate-fc --embedded``
    scores) — the free-convection counterpart of ``train-embedded``. The
    reference cannot do this (Zygote does not differentiate Oceananigans);
    see ``train/embedded.py``.
    """
    import jax
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp
    from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
    from climateparameterizations_jl_tpu.data.containers import stack_datasets
    from climateparameterizations_jl_tpu.data.free_convection import (
        FREE_CONVECTION_IDS,
        build_free_convection_model,
        load_free_convection_simulation,
    )
    from climateparameterizations_jl_tpu.train.checkpoint import save_checkpoint
    from climateparameterizations_jl_tpu.train.embedded import train_embedded_free_convection
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

    init_meta: dict = {}
    nn = None
    if args.init_from:
        nn, init_meta = _load_fc_nn(args.init_from)
        if int(init_meta.get("ensemble", 0) or 0):
            raise SystemExit("train-embedded-fc: deep-ensemble checkpoints are not supported yet; extract a member first")
        if init_meta["arch"]["sizes"][-1] + 1 != args.nz:
            raise SystemExit(
                f"train-embedded-fc: checkpoint arch is Nz={init_meta['arch']['sizes'][-1] + 1}, got --nz {args.nz}"
            )

    # Training sims default to the checkpoint's own suite (fine-tune against
    # the host on the data the NN trained on).
    if args.sim_ids:
        ids = [int(s) for s in _sims(args.sim_ids)]
    elif init_meta.get("sim_ids"):
        ids = [int(s) for s in init_meta["sim_ids"]]
    else:
        raise SystemExit("train-embedded-fc: pass --sim-ids (or --init-from a checkpoint that records its sims)")
    bad = sorted(set(ids) - set(FREE_CONVECTION_IDS))
    if bad:
        print(f"warning: unknown simulation ids {bad} (valid: {sorted(FREE_CONVECTION_IDS)})")
    datasets = [
        load_free_convection_simulation(
            i, args.data_dir, args.nz, n_save=args.n_save, dt_save=args.dt_save,
            source=args.source, les_cache_dir=args.les_cache_dir,
        )
        for i in ids
    ]
    ds = stack_datasets(datasets) if len(datasets) > 1 else datasets[0]

    # Scaling context: the checkpoint NN expects its ORIGINAL training
    # scalings (override-scaling semantics, same resolution as evaluate-fc).
    saved = init_meta.get("scalings")
    if saved is not None:
        T_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(saved["T"]["mu"]), jnp.float32(saved["T"]["sigma"]))
        wT_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(saved["wT"]["mu"]), jnp.float32(saved["wT"]["sigma"]))
    else:
        T_scaling = ZeroMeanUnitVarianceScaling.fit(ds.T.reshape(-1))
        wT_scaling = ZeroMeanUnitVarianceScaling.fit(ds.wT.reshape(-1))
    base_closure = init_meta.get("base_closure", args.base_closure)
    model = build_free_convection_model(ds, T_scaling, wT_scaling, base_closure=base_closure)

    if nn is None:
        nn = free_convection_mlp(jax.random.PRNGKey(args.seed), args.nz)

    config = NDETrainConfig(
        learning_rate=args.lr, maxiters=args.maxiters, n_substeps=args.substeps,
        optimizer=args.optimizer, tridiag_backend=args.tridiag_backend,
    )
    n_frames = int(ds.t.shape[-1])
    stages = _parse_curriculum(
        args.curriculum, n_frames, args.substeps, args.maxiters, args.lr,
        default_window=min(args.n_train_steps, n_frames),
    )
    print(f"train-embedded-fc: {len(ids)} sim(s), {len(stages)} stage(s), base '{base_closure}', "
          f"scalings from {'checkpoint' if saved else 'training sims'}", flush=True)
    nn, history = train_embedded_free_convection(
        model, nn, ds, config, stages=stages,
        callback=_history_writer(args.output),
        checkpoint_dir=os.path.join(args.output, "train_state"),
        resume_from=_resolve_train_state(args.resume_from),
    )
    # evaluate-fc-compatible checkpoint (same meta layout as train-fc-nde).
    meta = {
        "command": "train-embedded-fc", "sim_ids": ids,
        "conv": init_meta.get("conv", 0), "ensemble": 0,
        "base_closure": base_closure,
        "scalings": {
            "T": {"mu": float(T_scaling.mu), "sigma": float(T_scaling.sigma)},
            "wT": {"mu": float(wT_scaling.mu), "sigma": float(wT_scaling.sigma)},
        },
    }
    if hasattr(nn, "sizes"):
        meta["arch"] = {"sizes": list(nn.sizes), "activation": nn.activation}
    else:
        meta["arch"] = {"sizes": list(nn.mlp.sizes), "activation": nn.mlp.activation, "conv_width": nn.width}
    save_checkpoint(args.output, nn, meta)
    print(f"train-embedded-fc: loss {history[0].total():.4e} -> {history[-1].total():.4e}; saved to {args.output}")
    return 0


def cmd_train_fc_nde(args) -> int:
    import jax
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.closures.mlp import (
        free_convection_conv_mlp,
        free_convection_mlp,
    )
    from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
    from climateparameterizations_jl_tpu.data.containers import stack_datasets
    from climateparameterizations_jl_tpu.data.free_convection import (
        build_free_convection_model,
        free_convection_regression_pairs,
        load_free_convection_simulation,
    )
    from climateparameterizations_jl_tpu.train.checkpoint import save_checkpoint
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, train_free_convection_nde
    from climateparameterizations_jl_tpu.train.nn import train_flux_nn

    ids = [int(s) for s in _sims(args.sim_ids)]
    # Held-out ids are the complement by CLI convention, so the reference's
    # overlap/unused warnings (data.jl:14-30) are structurally impossible
    # here — passing the complement as a fake "test set" would just disable
    # them while looking like validation. Only out-of-range is meaningful.
    from climateparameterizations_jl_tpu.data.free_convection import FREE_CONVECTION_IDS

    bad = sorted(set(ids) - set(FREE_CONVECTION_IDS))
    if bad:
        print(f"warning: unknown simulation ids {bad} (valid: {sorted(FREE_CONVECTION_IDS)})")
    datasets = [
        load_free_convection_simulation(
            i, args.data_dir, args.nz, n_save=args.n_save, dt_save=args.dt_save,
            source=args.source, les_cache_dir=args.les_cache_dir,
        )
        for i in ids
    ]
    ds = stack_datasets(datasets) if len(datasets) > 1 else datasets[0]
    T_scaling = ZeroMeanUnitVarianceScaling.fit(ds.T.reshape(-1))
    wT_scaling = ZeroMeanUnitVarianceScaling.fit(ds.wT.reshape(-1))
    t_row = ds.t.reshape(-1, ds.t.shape[-1])[0] if ds.t.ndim > 1 else ds.t
    tau = jnp.abs(t_row[-1] - t_row[0])
    # Per-sim BC fluxes on the suite axis — each member trains against its
    # own surface forcing, as the reference's per-simulation NDEs do.
    model = build_free_convection_model(ds, T_scaling, wT_scaling, base_closure=args.base_closure)
    ensemble = int(getattr(args, "ensemble", 0) or 0)

    def _init_fc(key):
        if args.conv > 1:
            return free_convection_conv_mlp(key, args.nz, conv_width=args.conv)
        return free_convection_mlp(key, args.nz)

    if ensemble:
        keys = jax.random.split(jax.random.PRNGKey(args.seed), ensemble)
        members = [_init_fc(k) for k in keys]
    else:
        members = [_init_fc(jax.random.PRNGKey(args.seed))]

    if args.pretrain_epochs > 0:
        # Flux pre-training: T -> wT regression before the NDE stage
        # (train_free_convection_nde.jl:210-216). Ensemble members pretrain
        # independently (tiny regressions; a host loop is fine here — the
        # expensive NDE stage below is the one jitted stacked step).
        x, y = free_convection_regression_pairs(ds, T_scaling, wT_scaling)
        for mi in range(len(members)):
            members[mi], pre_hist = train_flux_nn(
                members[mi], x, y, learning_rate=args.lr, epochs=args.pretrain_epochs,
                causality=args.spatial_causality,
            )
            tag = f"[pretrain m{mi}]" if ensemble else "[pretrain]"
            print(f"train-fc-nde{tag}: loss {pre_hist[0]:.4e} -> {pre_hist[-1]:.4e}")
    nn = members[0]

    n_frames = int(ds.t.shape[-1])

    # Spatial causality through the NDE stage: "hard" masks the weights now
    # and re-projects after every optimizer update (the mask does not
    # survive updates otherwise); "soft" is a pretraining-only penalty (the
    # reference's usage, train_free_convection_nde.jl:184-200).
    project = None
    if args.spatial_causality == "hard":
        from climateparameterizations_jl_tpu.closures.mlp import apply_spatial_causality_mask

        members = [apply_spatial_causality_mask(m) for m in members]
        nn = members[0]
        project = apply_spatial_causality_mask
    elif args.spatial_causality == "soft" and args.pretrain_epochs == 0:
        print("warning: --spatial-causality soft only acts during flux pretraining; set --pretrain-epochs > 0 or it is a no-op")

    stages = _parse_curriculum(
        args.curriculum, n_frames, args.n_substeps, args.maxiters, args.lr,
        default_window=min(args.n_train_steps, n_frames),
    )

    def stage_tensors(tsteps):
        T_sel = jnp.take(ds.T, jnp.asarray(tsteps), axis=-2)
        T0 = T_scaling.scale(T_sel[..., 0, :])
        targets = T_scaling.scale(T_sel)
        if T0.ndim == 1:
            T0, targets = T0[None], targets[None]
        t = jnp.take(t_row, jnp.asarray(tsteps)) / tau
        return T0, targets, t

    # Staged curriculum over growing windows + full-span burn-in at decayed
    # LR (train_free_convection_nde.jl:246-266). Each stage's n_substeps is
    # pre-scaled by its stride (same physical inner step).
    history = []
    if ensemble:
        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            stack_members,
            train_free_convection_deep_ensemble,
            unstack_members,
        )

        nn = stack_members(members)
        _fc_train = train_free_convection_deep_ensemble
    else:
        _fc_train = train_free_convection_nde
    for stage_i, stage in enumerate(stages):
        lr = args.lr * (args.burn_in_lr_decay if stage_i == len(stages) - 1 and len(stages) > 1 else 1.0)
        config = NDETrainConfig(learning_rate=lr, maxiters=args.maxiters, n_substeps=stage.n_substeps, method=args.method)
        T0, targets, t = stage_tensors(stage.tsteps)
        nn, h = _fc_train(model, nn, T0, targets, t, config, callback=_history_writer(args.output), project=project)
        history.extend(h)
    meta = {
        "command": "train-fc-nde", "sim_ids": ids, "conv": args.conv,
        "ensemble": ensemble,
        # Everything evaluate-fc needs to rebuild the EXACT training-time
        # model: the NN only makes sense under the scalings and base
        # closure it was trained with.
        "base_closure": args.base_closure,
        "scalings": {
            "T": {"mu": float(T_scaling.mu), "sigma": float(T_scaling.sigma)},
            "wT": {"mu": float(wT_scaling.mu), "sigma": float(wT_scaling.sigma)},
        },
    }
    arch_src = unstack_members(nn)[0] if ensemble else nn
    if hasattr(arch_src, "sizes"):
        meta["arch"] = {"sizes": list(arch_src.sizes), "activation": arch_src.activation}
    else:
        meta["arch"] = {"sizes": list(arch_src.mlp.sizes), "activation": arch_src.mlp.activation, "conv_width": arch_src.width}
    save_checkpoint(args.output, nn, meta)
    print(f"train-fc-nde: loss {history[0].total():.4e} -> {history[-1].total():.4e}; saved to {args.output}")
    return 0


def cmd_optimise_mpp(args) -> int:
    from climateparameterizations_jl_tpu.data.containers import training_tensors
    from climateparameterizations_jl_tpu.train.mpp_calibration import (
        calibrate_mpp_eki,
        optimise_mpp_parameters,
    )
    from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

    names = _sims(args.sims)
    ds = _load_suite(names, args.nz, args.data_dir, args.n_save, args.dt_save)
    # CLAUDE.md diurnal rule: without model.diurnal the cycling surface flux
    # freezes at its frame-0 value (sin(0) = 0 — NO heat flux at all) and
    # mPP parameters calibrate against wrong physics with no error.
    model = _wind_model(ds, args.nz, diurnal=any(_suite_diurnal_flags(names)))
    batch = training_tensors(ds, model.scalings, np.arange(0, args.n_train_steps), tau=model.tau)
    config = NDETrainConfig(learning_rate=args.lr, maxiters=args.maxiters, n_substeps=args.n_substeps, method=args.method, optimizer=args.optimizer)
    if args.calibration_method == "eki":
        params, eki = calibrate_mpp_eki(
            model, batch, config, n_ensemble=args.n_ensemble, n_iterations=args.n_eki_iters,
            inflation=args.eki_inflation,
        )
        # Same flat-parameter schema as the gradient path (consumers read
        # result["nu_0"] as a float either way) + the EKI posterior spread.
        result = {name: float(getattr(params, name)) for name in eki.names}
        result["posterior_std"] = {
            name: float(s) for name, s in zip(eki.names, np.asarray(eki.theta_std))
        }
        result["misfit_initial"] = eki.misfit_history[0]
        result["misfit_final"] = eki.misfit_history[-1]
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "mpp_parameters.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        return 0
    params, history = optimise_mpp_parameters(model, batch, config)
    result = {
        "nu_0": float(params.nu_0), "nu_minus": float(params.nu_minus),
        "Ri_c": float(params.Ri_c), "delta_Ri": float(params.delta_Ri), "Pr": float(params.Pr),
        # loss_final = the best evaluated loss: optimise_mpp_parameters
        # returns the best ITERATE's parameters, so this is the loss the
        # adopted parameters actually achieved.
        "loss_initial": float(history[0][0]), "loss_final": float(min(h[0] for h in history)),
    }
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "mpp_parameters.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


def cmd_calibrate_kpp(args) -> int:
    ds = _load_suite(_sims(args.sims), args.nz, args.data_dir, args.n_save, args.dt_save)
    tsteps = np.arange(0, min(args.n_train_steps, ds.t.shape[-1]))
    if args.calibration_method == "eki":
        from climateparameterizations_jl_tpu.train.eki import calibrate_kpp_eki

        params, eki = calibrate_kpp_eki(
            ds, tsteps, args.nz, n_ensemble=args.n_ensemble, n_iterations=args.n_eki_iters,
            inflation=args.eki_inflation,
        )
        result = {
            name: {"mean": float(m), "std": float(s)}
            for name, m, s in zip(eki.names, np.asarray(eki.theta_mean), np.asarray(eki.theta_std))
        }
        result["misfit"] = eki.misfit_history[-1]
    else:
        from climateparameterizations_jl_tpu.train.kpp_calibration import calibrate_kpp

        params, info = calibrate_kpp(
            ds, tsteps, args.nz,
            n_plugin=args.n_plugin, n_line_search=args.n_line_search,
            refine="gradient" if args.calibration_method == "gradient" else "line-search",
        )
        result = {name: float(v) for name, v in zip(info["names"], np.asarray(info["values"]))}
        result["loss"] = info["final_loss"]
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "kpp_parameters.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


def cmd_train_gp(args) -> int:
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.closures.gp import (
        GPKernel,
        error_per_gamma,
        gp_fit_multi,
        gp_predict,
        gp_uncertainty,
        select_best_kernel,
    )
    from climateparameterizations_jl_tpu.data.containers import (
        direct_regression_pairs,
        fit_wind_mixing_scalings,
    )

    train_names = _sims(args.sims)
    train_ds = _load_suite(train_names, args.nz, args.data_dir, args.n_save, args.dt_save)
    test_ds = _load_suite(_sims(args.test_sims), args.nz, args.data_dir, args.n_save, args.dt_save)
    scalings = fit_wind_mixing_scalings(train_ds)
    z = jnp.linspace(0.0, 1.0, 3 * args.nz)
    kernel_ids = tuple(int(k) for k in _sims(args.kernel_ids))
    log_gammas = np.linspace(-1.5, 1.5, 10)
    os.makedirs(args.output, exist_ok=True)
    report = {}
    fitted: dict = {}
    # --integrate needs all three flux GPs; fit the union once.
    fluxes = list(_sims(args.fluxes))
    fit_fluxes = sorted(set(fluxes) | ({"uw", "vw", "wT"} if args.integrate else set()))

    def _sub(x, y):
        return (x[:: args.subsample], y[:: args.subsample]) if args.subsample > 1 else (x, y)

    # Kernel selection must never see the reporting test set. The reference
    # sweeps kernels against held-out *training* files before final
    # evaluation (optimize_GP_kernels.jl:41-62, leave-one-out with errors
    # accumulated across splits); here: explicit --val-sims if given, else
    # leave-one-out over the training sims, else (single sim) a tail time
    # split of the training pairs.
    if args.val_sims:
        val_ds = _load_suite(_sims(args.val_sims), args.nz, args.data_dir, args.n_save, args.dt_save)
        splits = [(train_ds, scalings, val_ds)]
    elif len(train_names) > 1:
        # Slice the already-loaded suite along its sims axis (stack_datasets
        # stacks every field on a leading axis) — re-loading per split paid
        # ~n^2 dataset builds, each a column-model/LES integration for
        # synthetic/les3d stand-ins.
        import jax

        splits = []
        for i in range(len(train_names)):
            keep = np.array([j for j in range(len(train_names)) if j != i])
            sub_ds = jax.tree.map(lambda a, k=keep: a[k], train_ds)
            held_ds = jax.tree.map(lambda a, idx=i: a[idx], train_ds)
            splits.append((sub_ds, fit_wind_mixing_scalings(sub_ds), held_ds))
    else:
        splits = None

    selected, x_by_flux, y_by_flux, test_pairs = {}, {}, {}, {}
    for flux in fit_fluxes:
        x_tr, y_tr = _sub(*direct_regression_pairs(train_ds, scalings, flux))
        test_pairs[flux] = direct_regression_pairs(test_ds, scalings, flux)
        errors = {kid: np.zeros(len(log_gammas)) for kid in kernel_ids}
        if splits is None:
            n_val = max(1, int(0.2 * x_tr.shape[0]))
            sel_sets = [(x_tr[:-n_val], y_tr[:-n_val], x_tr[-n_val:], y_tr[-n_val:])]
        else:
            sel_sets = [
                (*_sub(*direct_regression_pairs(sub_ds, sub_scl, flux)), *direct_regression_pairs(held_ds, sub_scl, flux))
                for sub_ds, sub_scl, held_ds in splits
            ]
        for xs, ys, xv, yv in sel_sets:
            for kid in kernel_ids:
                errors[kid] += np.asarray(error_per_gamma(xs, ys, xv, yv, z, kid, log_gammas, args.metric))
        kernel, _ = select_best_kernel(errors, log_gammas, args.metric, 0.0, jnp.asarray(x_tr).dtype)
        if args.optimize_hyperparams:
            # ML-II refinement beyond the reference's gamma-only grid
            # (GaussianProcesses.jl:30-49): gradient-descend the marginal
            # likelihood through the Cholesky from the grid winner.
            # --gram-backend pallas runs the MXU-fused Gram forward with its
            # analytic custom-VJP backward (f32); the final fit below is
            # always the f64 XLA path regardless.
            import dataclasses as _dc

            from climateparameterizations_jl_tpu.closures.gp import optimize_kernel_hyperparameters

            # Only GPKernel carries a Gram backend field; the spectral-mixture
            # winner (id 6) optimizes on its XLA path directly.
            if isinstance(kernel, GPKernel):
                kernel = _dc.replace(kernel, backend=args.gram_backend)
            kernel, ml_losses = optimize_kernel_hyperparameters(
                x_tr, y_tr, kernel, z,
                iters=args.hyperopt_iters,
            )
            if isinstance(kernel, GPKernel):
                kernel = _dc.replace(kernel, backend="xla")
            print(f"train-gp[{flux}]: ML-II {ml_losses[0]:.4e} -> {ml_losses[-1]:.4e} ({args.hyperopt_iters} iters)")
        selected[flux] = kernel
        x_by_flux[flux], y_by_flux[flux] = x_tr, y_tr
    # The final fits share predictors, so they run as ONE fused multi-fit
    # (shared distance matrix + batched Cholesky, gp_fit_multi) instead of
    # three sequential builds.
    models = gp_fit_multi(
        x_by_flux[fit_fluxes[0]], [y_by_flux[f] for f in fit_fluxes],
        [selected[f] for f in fit_fluxes], z,
    ) if fit_fluxes else []
    for flux, model in zip(fit_fluxes, models):
        fitted[flux] = model
        if flux in fluxes:
            kernel = selected[flux]
            x_te, y_te = test_pairs[flux]
            pred = gp_predict(model, x_te)
            mse = float(jnp.mean((pred - y_te) ** 2))
            # Posterior variance (reference plots `uncertainty`,
            # gaussian_process.jl:130-139) — reported and drawn as bands.
            unc = gp_uncertainty(model, x_te)
            name = kernel.family if isinstance(kernel, GPKernel) else "spectral_mixture"
            report[flux] = {"kernel": name, "mse": mse,
                            "mean_posterior_variance": float(jnp.mean(unc)),
                            "max_posterior_variance": float(jnp.max(unc))}
            if isinstance(kernel, GPKernel):
                report[flux]["log_gamma"] = float(jnp.log10(kernel.gamma))
            from climateparameterizations_jl_tpu.eval.animations import plot_gp_uncertainty

            plot_gp_uncertainty(
                np.asarray(pred), np.asarray(y_te), np.asarray(unc),
                os.path.join(args.output, f"gp_uncertainty_{flux}.png"), flux=flux,
            )
            print(f"train-gp[{flux}]: kernel {name}, mse {mse:.4e}, mean posterior var {report[flux]['mean_posterior_variance']:.3e}")

    if args.integrate:
        # GP-closure DE on the held-out sim (run_GP_DE.jl:181-192): the three
        # fitted GPs drive the column equation; report trajectory MSE.
        from climateparameterizations_jl_tpu.data.containers import scaled_state_array
        from climateparameterizations_jl_tpu.models.gp_closure import FluxGPs, solve_gp_closure

        gps = {flux: fitted[flux] for flux in ("uw", "vw", "wT")}
        model = _wind_model(train_ds, args.nz)
        x_true = scaled_state_array(test_ds, scalings)
        x_true = x_true.reshape(-1, x_true.shape[-2], x_true.shape[-1])[0]
        n_frames = min(args.n_integrate_steps, x_true.shape[0] - 1)
        t_row = test_ds.t.reshape(-1, test_ds.t.shape[-1])[0] if test_ds.t.ndim > 1 else test_ds.t
        dt_hat = float((t_row[1] - t_row[0]) / model.tau)
        traj = solve_gp_closure(model, FluxGPs(**gps), x_true[0], 0.0, dt_hat, n_frames, n_substeps=args.n_substeps)
        de_mse = float(jnp.mean((traj - x_true[: n_frames + 1]) ** 2))
        report["gp_de"] = {"trajectory_mse": de_mse, "frames": int(n_frames + 1)}
        print(f"train-gp[DE]: trajectory mse {de_mse:.4e}")

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "gp_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return 0


def cmd_evaluate(args) -> int:
    from climateparameterizations_jl_tpu.eval.animations import (
        animate_profiles_fluxes_comparison,
        plot_final_profiles,
        plot_loss,
        plot_loss_matrix,
        plot_training_regions,
    )
    from climateparameterizations_jl_tpu.eval.profile import nde_profile

    test_sims = _sims(args.test_sims)
    nns, ckpt_meta = _load_nns(args.checkpoint)
    ensemble_nns = None
    if ckpt_meta.get("ensemble"):
        # Deep-ensemble checkpoint: member 0 drives the standard per-member
        # harness (fluxes/Ri are per-member diagnostics); the UQ block below
        # adds predictive mean/std bands + the ensemble-mean-prediction loss.
        from climateparameterizations_jl_tpu.train.deep_ensemble import unstack_members

        ensemble_nns = nns
        nns = unstack_members(nns)[0]
        print(f"deep-ensemble checkpoint (K={int(ckpt_meta['ensemble'])}): "
              f"'nde' channels show member 0; uncertainty_*.npz / 'nde_ensemble_mean' "
              f"carry the ensemble", flush=True)
    # Scaling context resolution: evaluation must use the TRAINING suite's
    # scalings (override-scaling semantics). The checkpoint records its
    # training sims, so an omitted --sims defaults to those instead of the
    # evaluated sims — passing a 20-sim training list by hand for every
    # extrapolation scan was the footgun this closes.
    if args.sims:
        train_names, sims_src = _sims(args.sims), "--sims"
    elif ckpt_meta.get("sims"):
        train_names, sims_src = _sims(ckpt_meta["sims"]), "checkpoint meta"
    else:
        train_names, sims_src = test_sims, "test sims (checkpoint records none)"
    train_ds = _load_suite(train_names, args.nz, args.data_dir, args.n_save, args.dt_save)
    flags = _suite_diurnal_flags(train_names)
    # The checkpoint records the TRAINING-time diurnal mode (a checkpoint
    # trained on a diurnal suite must evaluate with the cycle even when
    # --sims is left at its default); older checkpoints fall back to the
    # --sims name flags (any(): per-sim amplitudes keep constant members
    # frozen, so enabling the cycle for a mixed suite is always safe).
    diurnal = bool(ckpt_meta.get("diurnal", any(flags)))
    model = _wind_model(
        train_ds, args.nz, diurnal=diurnal,  # TRAINING scalings (override semantics)
        smooth_NN=bool(ckpt_meta.get("smooth_NN", False)),
        smooth_Ri=bool(ckpt_meta.get("smooth_Ri", False)),
        **_base_closure_overrides(ckpt_meta.get("base_closure", "mpp")),
        **_restore_mpp(ckpt_meta, getattr(args, "mpp_params", None)),
    )
    tsteps = np.arange(0, args.n_train_steps, args.eval_stride)
    if getattr(args, "write_jld2", False) and not args.embedded:
        raise SystemExit("--write-jld2 requires --embedded (it writes the embedded pair)")
    os.makedirs(args.output, exist_ok=True)
    # Early echo: long evals otherwise run minutes with no sign of WHAT is
    # being evaluated (the --sims / --test-sims split is an easy footgun —
    # --sims alone changes only the scaling context, not the evaluated sims).
    print(f"evaluating {len(test_sims)} sim(s) over {len(tsteps)} frames "
          f"(window {args.n_train_steps}, stride {args.eval_stride}): {', '.join(test_sims)}", flush=True)
    print(f"scaling context from {sims_src}: {len(train_names)} sim(s)", flush=True)

    # Forcing-space coverage figure (plot_training_regions.jl parity);
    # returns None (no file) if no name parses as a catalog entry.
    plot_training_regions(train_names, test_sims, os.path.join(args.output, "training_regions.png"))

    members = ("nde", "mpp", "kpp", "embedded", "embedded_baseline")
    matrix: dict = {}
    summary: dict = {}
    all_evs: dict = {}
    for sim_i, name in enumerate(test_sims):
        ds = _load_suite([name], args.nz, args.data_dir, args.n_save, args.dt_save)
        ev = nde_profile(
            model, nns, ds, tsteps, solver=args.method, n_substeps=args.n_substeps,
            include_embedded=args.embedded, kpp_n_substeps=args.kpp_n_substeps,
        )
        # Keep only what the final-profiles figure needs (last frame per
        # member + coordinates) — retaining full ProfileEvaluations for a
        # large suite would hold O(10 MB) x n_sims until the loop ends.
        # Exclude losses_* channels: they end in "_T" too, but the figure
        # reads only "{member}_T" profile keys.
        all_evs[name] = {
            k: (v[-1:] if getattr(v, "ndim", 0) >= 1 and k not in ("zc", "zf") else v)
            for k, v in ev.to_dict().items()
            if k in ("t", "zc", "zf")
            or (k.endswith(("_u", "_v", "_T")) and not k.startswith("losses_"))
        }
        all_evs[name]["t"] = np.asarray(ev["t"])[-1:]
        np.savez(os.path.join(args.output, f"evaluation_{name}.npz"), **ev.to_dict())
        if getattr(args, "write_jld2", False):
            # Reference behavior: the embedded pair goes to disk as
            # LESbrary-layout .jld2 sims (JLD2OutputWriter in
            # NDE_oceananigans.jl:421-454; read back by NDE_profile_oceananigans).
            # Our reader round-trips these files.
            from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries
            from climateparameterizations_jl_tpu.data.lesbrary import write_les_profiles

            sim_dir = os.path.join(args.output, name)
            os.makedirs(sim_dir, exist_ok=True)
            Nt = ev["t"].shape[0]
            first = lambda a: float(np.reshape(np.asarray(a), (-1,))[0])  # noqa: E731
            for tag, m in (("baseline", "embedded_baseline"), ("neural_network", "embedded")):
                cts = ColumnTimeSeries(
                    u=np.reshape(ev[f"{m}_u"], (Nt, args.nz)),
                    v=np.reshape(ev[f"{m}_v"], (Nt, args.nz)),
                    T=np.reshape(ev[f"{m}_T"], (Nt, args.nz)),
                    uw=np.reshape(ev[f"{m}_uw"], (Nt, args.nz + 1)),
                    vw=np.reshape(ev[f"{m}_vw"], (Nt, args.nz + 1)),
                    wT=np.reshape(ev[f"{m}_wT"], (Nt, args.nz + 1)),
                    t=np.asarray(ev["t"]),
                    H=first(ds.H), f=first(ds.f), g=first(ds.g), alpha=first(ds.alpha),
                    beta=first(ds.beta), u_top=first(ds.u_top),
                    theta_top=first(ds.theta_top), theta_bottom=first(ds.theta_bottom),
                )
                write_les_profiles(os.path.join(sim_dir, f"{tag}.jld2"), cts)
        if ensemble_nns is not None:
            from climateparameterizations_jl_tpu.eval.ensemble_uq import nde_ensemble_uq

            uq = nde_ensemble_uq(
                model, ensemble_nns, ds, tsteps,
                solver=args.method, n_substeps=args.n_substeps,
            )
            np.savez(os.path.join(args.output, f"uncertainty_{name}.npz"), **uq)
            matrix.setdefault("nde_ensemble_mean", []).append(float(np.mean(uq["losses_ensemble_mean_T"])))
            if sim_i == 0:
                from climateparameterizations_jl_tpu.eval.animations import plot_nde_ensemble_uncertainty

                plot_nde_ensemble_uncertainty(
                    uq, ev["truth_T"], os.path.join(args.output, "nde_uncertainty.png")
                )
        for m in members:
            key = f"losses_{m}_T"
            if key in ev.keys():
                matrix.setdefault(m, []).append(float(np.mean(ev[key])))
        if sim_i == 0:
            # Detailed figures for the first test sim (the reference plots
            # one sim at a time; the matrix covers the rest).
            plot_loss(
                {m: ev[f"losses_{m}_T"] for m in members if f"losses_{m}_T" in ev.keys()},
                ev["t"], os.path.join(args.output, "loss.png"),
            )
            if args.animate:
                anim_models = ("truth", "nde", "mpp", "kpp") + (("embedded",) if args.embedded else ())
                animate_profiles_fluxes_comparison(ev, os.path.join(args.output, f"comparison.{args.animation_format}"), stride=args.gif_stride, models=anim_models)

    plot_final_profiles(all_evs, os.path.join(args.output, "final_profiles.png"))
    if len(test_sims) > 1:
        plot_loss_matrix(
            {m: np.asarray(v) for m, v in matrix.items()}, test_sims,
            os.path.join(args.output, "loss_matrix.png"),
        )
    summary = {m: float(np.mean(v)) for m, v in matrix.items()}
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump({"per_sim": matrix, "mean": summary}, f, indent=2)
    print(json.dumps(summary))
    return 0


def cmd_double_gyre(args) -> int:
    import jax

    from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
    from climateparameterizations_jl_tpu.embed.double_gyre import (
        DoubleGyreModel,
        DoubleGyreState,
        barotropic_streamfunction,
        run_double_gyre,
    )

    model = DoubleGyreModel.default(
        Nx=args.nx, Ny=args.ny, Nz=args.nz_gyre,
        advection=args.advection, momentum_advection=args.momentum_advection,
    )
    state0 = DoubleGyreState.rest(model)
    nn = T_scaling = wT_scaling = None
    if args.checkpoint:
        import jax.numpy as jnp

        # Shared loader: handles MLP and ConvMLP checkpoints alike.
        nn, meta = _load_fc_nn(args.checkpoint)
        saved = meta.get("scalings")
        if saved is not None:
            # The NN is only valid under its TRAINING normalization.
            T_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(saved["T"]["mu"]), jnp.float32(saved["T"]["sigma"]))
            wT_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(saved["wT"]["mu"]), jnp.float32(saved["wT"]["sigma"]))
        else:
            print("warning: checkpoint has no recorded scalings; using --T-mu/--T-sigma/--wT-sigma flags")
            T_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(args.T_mu), jnp.float32(args.T_sigma))
            wT_scaling = ZeroMeanUnitVarianceScaling(jnp.float32(0.0), jnp.float32(args.wT_sigma))

    T_remap = None
    if nn is not None and args.nn_T_remap != "none":
        # The reference remaps basin temperatures into the closure's training
        # range before the NN sees them (``T_profile = 19.65 + T_profile/20``,
        # double_gyre_nn.jl:155) — the basin spans ~20 K, the training columns
        # ~1 K, and the unguarded extrapolation NaNs multi-month runs. "auto"
        # derives (a, b) from the checkpoint's own scalings so the basin's
        # restoring range [T_north, T_south] maps to mu +- sigma of training.
        if args.nn_T_remap == "auto":
            mu, sigma = float(T_scaling.mu), float(T_scaling.sigma)
            t_lo, t_hi = float(model.T_north), float(model.T_south)
            b = (t_hi - t_lo) / (2.0 * sigma)
            a = mu - 0.5 * (t_lo + t_hi) / b
        else:
            a, b = (float(s) for s in args.nn_T_remap.split(","))
        T_remap = (a, b)
        print(f"NN T remap: T -> {a:.4g} + T/{b:.4g}")

    nn_stability_gate = None
    if nn is not None and args.nn_stability_gate != "none":
        # Multi-decade drift guard (see embed.double_gyre.nn_closure_forcing):
        # taper the NN flux by sigmoid(-dT/dz / s). "auto" = a tenth of the
        # basin's bulk stratification (T_south - T_north over the depth), so
        # even weakly stable columns suppress the convective closure while
        # unstable/neutral ones keep it at full strength.
        if args.nn_stability_gate == "auto":
            nn_stability_gate = 0.1 * float(model.T_south - model.T_north) / float(model.H)
        else:
            nn_stability_gate = float(args.nn_stability_gate)
        if not nn_stability_gate > 0:
            # s = 0 makes the sigmoid 0/0 = NaN at exactly-neutral faces
            # (which every mixed column crosses); s < 0 silently INVERTS the
            # gate, suppressing the convective regime instead of the stable.
            raise SystemExit(f"--nn-stability-gate must be a positive stratification scale in K/m "
                             f"(or 'auto'/'none'); got {nn_stability_gate}")
        print(f"NN stability gate: sigmoid(-dT/dz / {nn_stability_gate:.4g} K/m)")

    n_steps = int(args.days * 86400.0 / args.dt)
    save_every = max(1, n_steps // max(args.n_frames, 1))
    traj = run_double_gyre(
        model, state0, dt=args.dt, n_save=max(1, n_steps // save_every), save_every=save_every,
        nn=nn, T_scaling=T_scaling, wT_scaling=wT_scaling, T_remap=T_remap,
        max_steps_per_dispatch=args.max_steps_per_dispatch,
        tridiag_backend=args.tridiag_backend,
        nn_stability_gate=nn_stability_gate,
    )
    psi = np.asarray(barotropic_streamfunction(model, traj.u[-1])) / 1e6
    os.makedirs(args.output, exist_ok=True)
    np.savez(
        os.path.join(args.output, "double_gyre.npz"),
        T=np.asarray(traj.T), eta=np.asarray(traj.eta), psi=psi,
        u_surface=np.asarray(traj.u[..., -1]), v_surface=np.asarray(traj.v[..., -1]),
    )
    if args.animate:
        from climateparameterizations_jl_tpu.eval.animations import animate_double_gyre

        animate_double_gyre(traj, model, os.path.join(args.output, f"double_gyre.{args.animation_format}"))
    print(json.dumps({"psi_min_Sv": float(psi.min()), "psi_max_Sv": float(psi.max()), "frames": int(traj.T.shape[0])}))
    return 0


def cmd_benchmark(args) -> int:
    if args.suite:
        from climateparameterizations_jl_tpu.benchmarks import run_suite

        print(json.dumps(run_suite(quick=args.quick), indent=2))
        return 0
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()
    return 0


# ----------------------------------------------------------------------------
# parser
# ----------------------------------------------------------------------------


def _add_common(p, with_sims=True):
    p.add_argument("--config", default=None, help="YAML/JSON config file (flags override)")
    if with_sims:
        p.add_argument("--sims", default="strong_wind", help="comma-separated catalog names")
        p.add_argument("--data-dir", default=None, help="root of local LESbrary .jld2 files (synthetic fallback otherwise)")
        p.add_argument("--nz", type=int, default=32)
        p.add_argument("--n-save", type=int, default=96, help="LES frames to generate/load")
        p.add_argument("--dt-save", type=float, default=600.0)
    p.add_argument("--output", default="runs/latest")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--animation-format", default="gif", choices=["gif", "mp4"],
                   help="container for animation outputs (mp4 via OpenCV — the "
                        "reference's animation suite writes mp4, animation.jl:14-56)")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="climateparameterizations_jl_tpu", description=__doc__)
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="force the JAX backend (overrides env; use cpu for offline runs)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("catalog", help="list dataset catalog names").set_defaults(fn=cmd_catalog)

    p = sub.add_parser("fetch", help="download the free-convection LESbrary datasets (DataDeps parity)")
    p.add_argument("--sim-ids", default="1,2,3,4,5,6,7,8,9")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--timeout", type=float, default=60.0)
    p.add_argument("--force", action="store_true", help="re-download even if the file exists")
    p.set_defaults(fn=cmd_fetch)

    p = sub.add_parser("train-nn", help="direct flux regression")
    _add_common(p)
    p.add_argument("--fluxes", default="uw,vw,wT")
    p.add_argument("--hidden", type=int, default=400)
    p.add_argument("--activation", default="relu")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gradient-scaling", type=float, default=0.0)
    p.add_argument("--spatial-causality", default="none", choices=["none", "soft", "hard"])
    p.set_defaults(fn=cmd_train_nn)

    p = sub.add_parser("train-nde", help="wind-mixing triple-NN NDE training")
    _add_common(p)
    p.add_argument("--mpp-params", default=None, metavar="JSON",
                   help="optimise-mpp mpp_parameters.json: build the base closure from these "
                        "calibrated parameters (checkpoints record/restore them)")
    p.add_argument("--init-from", default=None, help="checkpoint dir to warm-start NNs")
    p.add_argument("--init-scale", type=float, default=1e-5)
    p.add_argument("--lr", type=float, default=2e-2)
    p.add_argument("--maxiters", type=int, default=50)
    p.add_argument("--n-substeps", type=int, default=4)
    p.add_argument("--method", default="split", choices=["split", "rk4", "heun", "euler"])
    p.add_argument("--n-train-steps", type=int, default=32)
    p.add_argument("--curriculum", default=None, help="comma-separated window lengths, e.g. 8,16,32")
    p.add_argument("--shooting", type=int, default=0, metavar="K",
                   help="window-parallel (multiple-shooting) training: split stages whose "
                        "save-interval count K divides into K truth-anchored segments batched "
                        "with the sims (trades sequential scan length for batch width — the "
                        "chip absorbs it; see PERFORMANCE.md). 0 = sequential (default)")
    p.add_argument("--gradient-scaling", type=float, default=5e-3)
    p.add_argument("--smooth-nn", action="store_true", help="tri-band running-mean filter on the NN flux outputs (smooth_NN)")
    p.add_argument("--smooth-ri", action="store_true", help="same filter on the Ri profile before the mPP diffusivity (smooth_Ri)")
    p.add_argument("--base-closure", default="mpp", choices=["mpp", "conv-adj", "none"],
                   help="physics base under the NN fluxes: mPP Ri-diffusivity (default), "
                        "convective adjustment (train_NDE_*_convective_adjustment.jl), or bare NNs")
    p.add_argument("--auto-balance", action="store_true")
    p.add_argument("--fraction-T", type=float, default=0.8)
    p.add_argument("--fraction-dTdz", type=float, default=0.8)
    p.add_argument("--fraction-profile", type=float, default=0.5)
    p.add_argument("--resume-from", default=None, help="checkpoint dir with params + optimizer state to resume")
    p.add_argument("--trace", default=None, help="write a jax profiler trace to this dir (TensorBoard/Perfetto)")
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd", "lbfgs"])
    p.add_argument("--ensemble", type=int, default=0, metavar="K",
                   help="train a K-member deep ensemble (independently-seeded members stacked "
                        "on a leading axis, all trained by ONE jitted step; evaluate surfaces "
                        "predictive mean/std bands). 0 = single closure (default)")
    p.add_argument("--tridiag-backend", default="auto", choices=["auto", "scan", "pcr"],
                   help="split stepper's implicit solve; auto resolves per window length "
                        "(PCR for long sequential windows, scan for short shooting windows; "
                        "train.nde.resolve_tridiag_backend)")
    p.add_argument("--fast-assembly", nargs="?", const="on", default="auto",
                   choices=["on", "off", "auto", "fold"],
                   help="matmul-assembled RHS/tendencies for split or rk4 (fewer tiny ops per substep; "
                        "incompatible with --smooth-nn); 'fold' also precomposes the divergence "
                        "matrix into the last NN layer (one less matmul per RHS). Default 'auto' "
                        "picks 'fold' when the configuration supports it, else the default path; "
                        "'off' forces the default stencil path; bare --fast-assembly means 'on'")
    p.set_defaults(fn=cmd_train_nde)

    p = sub.add_parser(
        "train-embedded",
        help="a-posteriori training: optimize the flux NNs through the embedded host column",
    )
    _add_common(p, with_sims=False)
    p.add_argument("--mpp-params", default=None, metavar="JSON",
                   help="optimise-mpp mpp_parameters.json: build the base closure from these "
                        "calibrated parameters (checkpoints record/restore them)")
    p.add_argument("--sims", default=None, help="comma-separated catalog names (default: the --init-from checkpoint's sims)")
    p.add_argument("--data-dir", default=None, help="root of local LESbrary .jld2 files (synthetic fallback otherwise)")
    p.add_argument("--nz", type=int, default=32)
    p.add_argument("--n-save", type=int, default=96, help="LES frames to generate/load")
    p.add_argument("--dt-save", type=float, default=600.0)
    p.add_argument("--init-from", default=None, help="checkpoint dir to fine-tune (train-nde output); omit for a fresh init")
    p.add_argument("--scaling-sims", default=None, help="override the scaling-context suite (default: the checkpoint's recorded sims)")
    p.add_argument("--init-scale", type=float, default=1e-5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--maxiters", type=int, default=50)
    p.add_argument("--substeps", type=int, default=10,
                   help="host steps per save interval (evaluate --embedded uses 10)")
    p.add_argument("--n-train-steps", type=int, default=32)
    p.add_argument("--curriculum", default=None, help="comma-separated window lengths w[:stride], e.g. 8,16,32")
    p.add_argument("--gradient-scaling", type=float, default=5e-3)
    p.add_argument("--base-closure", default="mpp", choices=["mpp", "conv-adj", "none"],
                   help="host base physics for a FRESH init (--init-from checkpoints carry their own)")
    p.add_argument("--auto-balance", action="store_true")
    p.add_argument("--fraction-T", type=float, default=0.8)
    p.add_argument("--fraction-dTdz", type=float, default=0.8)
    p.add_argument("--fraction-profile", type=float, default=0.5)
    p.add_argument("--resume-from", default=None, help="checkpoint dir with params + optimizer state to resume")
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd", "lbfgs"])
    p.add_argument("--tridiag-backend", default="auto", choices=["auto", "scan", "pcr"],
                   help="host column's implicit solve (auto: per-window resolution)")
    p.set_defaults(fn=cmd_train_embedded)

    p = sub.add_parser(
        "train-embedded-fc",
        help="FC a-posteriori training: optimize the heat-flux NN through the embedded conv-adj host column",
    )
    _add_common(p, with_sims=False)
    p.add_argument("--sim-ids", default=None, help="comma-separated free-convection ids (default: the --init-from checkpoint's)")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--source", default="auto", choices=["auto", "synthetic", "les3d"], help="les3d GENERATES the data with the 3-D LES")
    p.add_argument("--les-cache-dir", default=None,
                   help="cache dir for les3d-generated profiles (skip identical LES re-runs)")
    p.add_argument("--nz", type=int, default=32)
    p.add_argument("--n-save", type=int, default=96)
    p.add_argument("--dt-save", type=float, default=600.0)
    p.add_argument("--init-from", default=None, help="train-fc-nde checkpoint to fine-tune; omit for a fresh init")
    p.add_argument("--base-closure", default="convective_adjustment", choices=["convective_adjustment", "none"],
                   help="host base physics for a FRESH init (--init-from checkpoints carry their own)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--maxiters", type=int, default=50)
    p.add_argument("--substeps", type=int, default=10,
                   help="host steps per save interval (evaluate-fc --embedded uses 10)")
    p.add_argument("--n-train-steps", type=int, default=32)
    p.add_argument("--curriculum", default=None, help="comma-separated window lengths w[:stride], e.g. 8,16,32")
    p.add_argument("--resume-from", default=None, help="checkpoint dir with params + optimizer state to resume")
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd", "lbfgs"])
    p.add_argument("--tridiag-backend", default="auto", choices=["auto", "scan", "pcr"],
                   help="host column's implicit solve (auto: per-window resolution)")
    p.set_defaults(fn=cmd_train_embedded_fc)

    p = sub.add_parser("evaluate-fc", help="free-convection comparison across sim ids + loss matrix")
    p.add_argument("--checkpoint", required=True, help="train-fc-nde output dir")
    p.add_argument("--sim-ids", default="1,2", help="comma-separated free-convection ids to evaluate")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--source", default="auto", choices=["auto", "synthetic", "les3d"], help="les3d GENERATES the data with the 3-D LES")
    p.add_argument("--les-cache-dir", default=None,
                   help="cache dir for les3d-generated profiles (skip identical LES re-runs)")
    p.add_argument("--nz", type=int, default=32)
    p.add_argument("--n-save", type=int, default=96)
    p.add_argument("--dt-save", type=float, default=600.0)
    p.add_argument("--n-eval-steps", type=int, default=96)
    p.add_argument("--eval-stride", type=int, default=4)
    p.add_argument("--n-substeps", type=int, default=8)
    p.add_argument("--embedded", action="store_true")
    p.add_argument("--netcdf", action="store_true", help="also write the reference-layout oceananigans_*.nc pair per sim (requires --embedded)")
    p.add_argument("--output", default="runs/eval_fc")
    p.add_argument("--kpp-n-substeps", type=int, default=1,
                   help="inner KPP (and TKE) steps per save interval: 1 = the reference harness's "
                        "behavior (baselines stepped at the save spacing); pass the eval stride "
                        "for the reference-native 600 s step on strided evaluations")
    p.set_defaults(fn=cmd_evaluate_fc)

    p = sub.add_parser("ensemble", help="sharded perturbed-IC column-ensemble forward run (UQ)")
    _add_common(p)
    p.add_argument("--mpp-params", default=None, metavar="JSON",
                   help="optimise-mpp mpp_parameters.json: build the base closure from these "
                        "calibrated parameters (checkpoints record/restore them)")
    p.add_argument("--checkpoint", default=None, help="trained NNs (default: physics-only)")
    p.add_argument("--n-members", type=int, default=256)
    p.add_argument("--perturbation", type=float, default=1e-2, help="IC noise in scaled units")
    p.add_argument("--n-steps", type=int, default=32)
    p.add_argument("--n-substeps", type=int, default=4)
    p.set_defaults(fn=cmd_ensemble)

    p = sub.add_parser("generate-les", help="run the 3-D LES and save averaged training profiles")
    p.add_argument("--n-horizontal", type=int, default=32)
    p.add_argument("--nz-les", type=int, default=32)
    p.add_argument("--qu", type=float, default=None,
                   help="surface momentum flux [m2/s2]; default -5e-4, or the catalog value when --jld2-name is given (a mismatch with the named entry is refused)")
    p.add_argument("--qb", type=float, default=None,
                   help="surface buoyancy flux [m2/s3]; default 3e-8, or the catalog value when --jld2-name is given")
    p.add_argument("--dt", type=float, default=None, help="LES step [s] (default: stability bound)")
    p.add_argument("--u-max", type=float, default=0.2, help="velocity scale for the stability bound")
    p.add_argument("--dt-save", type=float, default=600.0)
    p.add_argument("--n-save", type=int, default=48)
    p.add_argument("--les-method", default="rk3", choices=["euler", "rk3"])
    p.add_argument("--max-frames-per-dispatch", type=int, default=256,
                   help="host-chunk the frame loop (keep each device program under the tunnel's ~60 s watchdog)")
    p.add_argument("--max-steps-per-dispatch", type=int, default=None,
                   help="cap on LES substeps per device program; default derives from grid size (~40 s of device time per dispatch), so 256^3 runs auto-chunk")
    p.add_argument("--diurnal", action="store_true", help="sinusoidal daily surface-flux cycle (Qb = amplitude); inferred from a diurnal --jld2-name")
    p.add_argument("--jld2-name", default=None, help="also write a reference-layout .jld2 under this catalog name")
    p.add_argument("--output", default="runs/les")
    p.set_defaults(fn=cmd_generate_les)

    p = sub.add_parser("extract", help="compact a run dir into an extracted checkpoint")
    p.add_argument("run_dir")
    p.add_argument("out_dir")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("train-fc-nde", help="free-convection NDE training")
    _add_common(p, with_sims=False)
    p.add_argument("--sim-ids", default="1", help="comma-separated LESbrary free-convection ids (1..9)")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--source", default="auto", choices=["auto", "synthetic", "les3d"], help="les3d GENERATES the data with the 3-D LES")
    p.add_argument("--les-cache-dir", default=None,
                   help="cache dir for les3d-generated profiles (skip identical LES re-runs)")
    p.add_argument("--nz", type=int, default=32)
    p.add_argument("--n-save", type=int, default=96)
    p.add_argument("--dt-save", type=float, default=600.0)
    p.add_argument("--base-closure", default="convective_adjustment", choices=["convective_adjustment", "none"])
    p.add_argument("--conv", type=int, default=0, help="conv front-end width (> 1 enables the conv variant)")
    p.add_argument("--spatial-causality", default="none", choices=["none", "soft", "hard"])
    p.add_argument("--pretrain-epochs", type=int, default=0, help="flux-regression pre-training epochs")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--maxiters", type=int, default=50)
    p.add_argument("--n-substeps", type=int, default=4)
    p.add_argument("--method", default="split", choices=["split", "rk4", "heun", "euler"])
    p.add_argument("--n-train-steps", type=int, default=32)
    p.add_argument("--curriculum", default=None, help="comma-separated growing window lengths, e.g. 8,16,32")
    p.add_argument("--burn-in-lr-decay", type=float, default=0.1, help="LR factor for the final curriculum stage")
    p.add_argument("--ensemble", type=int, default=0, metavar="K",
                   help="train a K-member deep ensemble (stacked members, one jitted NDE step; "
                        "evaluate-fc surfaces predictive mean/std bands). 0 = single closure")
    p.set_defaults(fn=cmd_train_fc_nde)

    p = sub.add_parser("optimise-mpp", help="mPP diffusivity parameter calibration")
    _add_common(p)
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd", "lbfgs"], help="reference uses BFGS/LBFGS (optimise_modified_pacanowski_philander_args.jl:66-72)")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--maxiters", type=int, default=100)
    p.add_argument("--n-substeps", type=int, default=4)
    p.add_argument("--method", default="split", choices=["split", "rk4", "heun", "euler"])
    p.add_argument("--n-train-steps", type=int, default=32)
    p.add_argument("--calibration-method", default="gradient", choices=["gradient", "eki"])
    p.add_argument("--n-ensemble", type=int, default=64)
    p.add_argument("--n-eki-iters", type=int, default=8)
    p.add_argument("--eki-inflation", type=float, default=1.0, help="multiplicative covariance inflation per EKI iteration (1.0 = off, the library default; the tempered updates already prevent collapse)")
    p.set_defaults(fn=cmd_optimise_mpp)

    p = sub.add_parser("calibrate-kpp", help="KPP parameter search (random, exact-gradient, or ensemble-Kalman)")
    _add_common(p)
    p.add_argument("--calibration-method", default="random", choices=["random", "gradient", "eki"],
                   help="random = reference recipe (plugin + FD line search); gradient = plugin + projected Adam with exact gradients through the solve; eki = ensemble Kalman inversion")
    p.add_argument("--n-plugin", type=int, default=64)
    p.add_argument("--n-line-search", type=int, default=20)
    p.add_argument("--n-ensemble", type=int, default=64, help="EKI ensemble size")
    p.add_argument("--n-eki-iters", type=int, default=8)
    p.add_argument("--eki-inflation", type=float, default=1.0, help="multiplicative covariance inflation per EKI iteration (1.0 = off, the library default; the tempered updates already prevent collapse)")
    p.add_argument("--n-train-steps", type=int, default=32)
    p.set_defaults(fn=cmd_calibrate_kpp)

    p = sub.add_parser("train-gp", help="GP kernel grid search + fit + test MSE")
    _add_common(p)
    p.add_argument("--test-sims", default="strong_wind_weak_cooling")
    p.add_argument("--val-sims", default=None, help="sims for kernel selection; default: leave-one-out over --sims (never the test set)")
    p.add_argument("--kernel-ids", default="1,2,3,4", help="kernel families to sweep (1-5 stationary, 6 spectral-mixture)")
    p.add_argument("--fluxes", default="wT")
    p.add_argument("--metric", default="euclidean", choices=["euclidean", "derivative", "antiderivative"])
    p.add_argument("--subsample", type=int, default=4)
    p.add_argument("--integrate", action="store_true", help="also integrate the GP-closure DE on the test sim")
    p.add_argument("--optimize-hyperparams", action="store_true",
                   help="ML-II refine the grid-selected kernel (gradient through the Cholesky)")
    p.add_argument("--hyperopt-iters", type=int, default=80)
    p.add_argument("--gram-backend", default="xla", choices=["xla", "pallas"],
                   help="Gram backend for the ML-II loop (pallas = fused MXU forward + analytic VJP, f32)")
    p.add_argument("--n-integrate-steps", type=int, default=32)
    p.add_argument("--n-substeps", type=int, default=4)
    p.set_defaults(fn=cmd_train_gp)

    p = sub.add_parser("evaluate", help="NDE-profile comparison vs baselines")
    _add_common(p)
    p.add_argument("--mpp-params", default=None, metavar="JSON",
                   help="optimise-mpp mpp_parameters.json: build the base closure from these "
                        "calibrated parameters (checkpoints record/restore them)")
    # --sims here is the SCALING context (training suite), not the evaluated
    # sims; default None = resolve from the checkpoint's recorded sims.
    p.set_defaults(sims=None)
    p.add_argument("--test-sims", default="strong_wind_weak_cooling")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--method", default="split", choices=["split", "rk4", "heun", "euler"])
    p.add_argument("--n-substeps", type=int, default=4)
    p.add_argument("--n-train-steps", type=int, default=32)
    p.add_argument("--eval-stride", type=int, default=2)
    p.add_argument("--animate", action="store_true")
    p.add_argument("--gif-stride", type=int, default=4)
    p.add_argument("--embedded", action="store_true", help="also run the host column model (baseline + NN)")
    p.add_argument("--write-jld2", action="store_true", help="write the embedded pair as LESbrary-layout .jld2 sims (requires --embedded)")
    p.add_argument("--kpp-n-substeps", type=int, default=1,
                   help="inner KPP steps per save interval: 1 = the reference harness's behavior "
                        "(KPP stepped at the save spacing); pass the eval stride for KPP's "
                        "reference-native 600 s step on strided evaluations")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("double-gyre", help="3-D basin run with optional NN closure")
    _add_common(p, with_sims=False)
    p.add_argument("--nx", type=int, default=96)
    p.add_argument("--ny", type=int, default=96)
    p.add_argument("--nz-gyre", type=int, default=32)
    p.add_argument("--days", type=float, default=30.0)
    p.add_argument("--dt", type=float, default=1800.0)
    p.add_argument("--n-frames", type=int, default=10)
    p.add_argument("--checkpoint", default=None, help="free-convection NN checkpoint dir")
    p.add_argument("--T-mu", type=float, default=10.0)
    p.add_argument("--T-sigma", type=float, default=5.0)
    p.add_argument("--wT-sigma", type=float, default=1e-5)
    p.add_argument("--max-steps-per-dispatch", type=int, default=None,
                   help="cap on inner steps per device program (remote-TPU tunnels kill "
                        "programs running >60-90 s; sparsely-saved multi-year runs need this; "
                        "default derives from grid size, ~40 s of device time per dispatch)")
    p.add_argument("--nn-T-remap", default="auto",
                   help="basin-T -> NN-input remap 'a + T/b': 'auto' (derive from checkpoint "
                        "scalings), 'none' (raw T), or 'A,B' (the reference hardcodes 19.65,20 "
                        "at double_gyre_nn.jl:155)")
    p.add_argument("--nn-stability-gate", default="none",
                   help="taper the NN flux by sigmoid(-dT/dz / s): 'none' (the reference's "
                        "ungated behavior), 'auto' (s = 0.1 x bulk basin stratification), or "
                        "a value s in K/m — the multi-decade drift guard (a free-convection "
                        "closure should be inactive in stably stratified columns)")
    p.add_argument("--animate", action="store_true")
    p.add_argument("--tridiag-backend", default="scan", choices=["scan", "pcr"],
                   help="implicit vertical-mixing solve; pcr is 1.27x faster basin steps on TPU "
                        "(0.75 -> 0.59 ms/step at 96x96x32, PERFORMANCE.md); scan wins on CPU")
    p.add_argument("--advection", default="weno5", choices=["weno5", "centered"],
                   help="tracer advection scheme (the reference passes WENO5 model-wide)")
    p.add_argument("--momentum-advection", default="weno5", choices=["weno5", "centered"],
                   help="momentum advection scheme (A/B: 2nd-order advective form vs WENO5 flux form)")
    p.set_defaults(fn=cmd_double_gyre)

    p = sub.add_parser("benchmark", help="run the repo benchmark (bench.py) or the full suite")
    p.add_argument("--config", default=None)
    p.add_argument("--suite", action="store_true", help="KPP/TKE/GP/NDE suite (Benchmarking.jl parity)")
    p.add_argument("--quick", action="store_true", help="reduced sizes for CI/CPU")
    p.set_defaults(fn=cmd_benchmark)

    return parser


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    config = _load_config(getattr(args, "config", None))
    # Backend choice must land before the first computation initializes a
    # backend: CLI flag wins, then a config-file "platform" key (loading the
    # YAML touches no backend, so reading it first is safe). jax.config wins
    # over JAX_PLATFORMS (container site hooks may overwrite the env var
    # after the user exported it).
    platform = getattr(args, "platform", None) or (config or {}).get("platform")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    if config:
        import sys

        tokens = list(sys.argv[1:] if argv is None else argv)
        actions = [a for sp in parser._subparsers._group_actions for a in getattr(sp.choices.get(args.command), "_actions", [])]  # noqa: SLF001
        defaults = {a.dest: a.default for a in actions}
        # Which dests were ACTUALLY typed: re-parse the same argv against a
        # fresh parser whose defaults are all SUPPRESS — only provided flags
        # land in the namespace. Token-matching option strings misses
        # argparse prefix abbreviations (--maxit for --maxiters), letting a
        # config value silently override a flag the user explicitly typed.
        probe = build_parser()
        for sp_action in probe._subparsers._group_actions:  # noqa: SLF001
            for sub in sp_action.choices.values():
                for a in sub._actions:  # noqa: SLF001
                    a.default = argparse.SUPPRESS
        for a in probe._actions:  # noqa: SLF001
            a.default = argparse.SUPPRESS
        probe._defaults.clear()  # noqa: SLF001 — set_defaults(fn=...) entries
        for sp_action in probe._subparsers._group_actions:  # noqa: SLF001
            for sub in sp_action.choices.values():
                sub._defaults.clear()  # noqa: SLF001
        explicit = set(vars(probe.parse_known_args(tokens)[0]))
        _apply_config(args, config, defaults, explicit)
    return args.fn(args)


if __name__ == "__main__":  # `python -m climateparameterizations_jl_tpu.cli.main`
    import sys

    sys.exit(main(sys.argv[1:]))
