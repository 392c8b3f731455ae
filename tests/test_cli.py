"""CLI tests: every subcommand runs end-to-end at tiny sizes."""

import json
import os

import numpy as np
import pytest

from climateparameterizations_jl_tpu.cli import main

TINY = ["--nz", "16", "--n-save", "12", "--dt-save", "600"]


@pytest.fixture(scope="module")
def nn_ckpt(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt") / "nn")
    rc = main([
        "train-nn", "--sims", "strong_wind", *TINY,
        "--epochs", "5", "--hidden", "32", "--output", out,
    ])
    assert rc == 0
    return out


def test_catalog(capsys):
    assert main(["catalog"]) == 0
    out = capsys.readouterr().out
    assert "strong_wind" in out and "wind_-5e-4_cooling_3e-8_new" in out


def test_module_invocation_runs_main():
    """`python -m ...cli.main` must actually run (it used to import-and-exit 0
    silently — no __main__ guard — so long evals launched that way were no-ops)."""
    import subprocess
    import sys

    # NOTE: the container sitecustomize CLOBBERS JAX_PLATFORMS (CLAUDE.md), so
    # the env var would be inert — force CPU with the CLI's own global flag
    # (in-process config update, applied before any backend init).
    r = subprocess.run(
        [sys.executable, "-m", "climateparameterizations_jl_tpu.cli.main", "--platform", "cpu", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0
    assert "usage" in r.stdout.lower()


def test_train_nn_checkpoint(nn_ckpt):
    assert os.path.exists(os.path.join(nn_ckpt, "state.npz"))
    with open(os.path.join(nn_ckpt, "meta.json")) as f:
        meta = json.load(f)
    assert set(meta["arch"]) == {"uw", "vw", "wT"}


def test_train_nde_strided_curriculum(tmp_path, capsys):
    # Regression: a "window:stride" stage must scale n_substeps by the
    # stride (inner step stays dt_save / n_substeps); before the fix the
    # strided stage silently integrated stride-x coarser physics.
    out = str(tmp_path / "nde_strided")
    rc = main([
        "train-nde", "--sims", "strong_wind", *TINY,
        "--maxiters", "2", "--curriculum", "6,12:3", "--n-substeps", "2",
        "--output", out,
    ])
    assert rc == 0
    lines = capsys.readouterr().out
    assert "train-nde: loss" in lines
    # Loss finite through the strided stage.
    last = [json.loads(ln) for ln in open(os.path.join(out, "history.jsonl"))][-1]
    assert np.isfinite(sum(v for v in last.values() if isinstance(v, float)))


def test_train_nde_shooting(tmp_path, capsys):
    # --shooting K applies window-parallel batches to stages whose interval
    # count K divides (here the 12:2 stage: 5 intervals... no — 12:2 gives
    # 6 saveat points = 5 intervals; use 11:2 -> 6 points, 5 intervals —
    # pick K that divides; 13:2 -> 7 points, 6 intervals, K=3 divides).
    out = str(tmp_path / "nde_shoot")
    rc = main([
        "train-nde", "--sims", "strong_wind", *TINY,
        "--maxiters", "2", "--curriculum", "6,13:2", "--shooting", "3",
        "--n-substeps", "2", "--output", out,
    ])
    assert rc == 0
    assert "train-nde: loss" in capsys.readouterr().out
    last = [json.loads(ln) for ln in open(os.path.join(out, "history.jsonl"))][-1]
    assert np.isfinite(sum(v for v in last.values() if isinstance(v, float)))


def test_mpp_params_checkpoint_roundtrip(tmp_path, capsys):
    # Regression (r3 flagship): a checkpoint trained over CALIBRATED mPP
    # evaluated over the rebuilt DEFAULT base scores garbage (wrong
    # closure). train-nde --mpp-params must record the parameters in meta,
    # and evaluate must restore them.
    mpp_file = tmp_path / "mpp_parameters.json"
    calibrated = {"nu_0": 2.5e-4, "nu_minus": 0.05, "Ri_c": 0.3, "delta_Ri": 0.8, "Pr": 1.2}
    with open(mpp_file, "w") as f:
        json.dump(calibrated, f)
    out = str(tmp_path / "nde_mpp")
    rc = main([
        "train-nde", "--sims", "strong_wind", *TINY,
        "--maxiters", "1", "--mpp-params", str(mpp_file), "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    for k, v in calibrated.items():
        assert meta["mpp"][k] == pytest.approx(v, rel=1e-6)
    # evaluate restores the training-time base from meta (no flag needed).
    from climateparameterizations_jl_tpu.cli.main import _restore_mpp

    restored = _restore_mpp(meta)["mpp"]
    for k, v in calibrated.items():
        assert float(getattr(restored, k)) == pytest.approx(v, rel=1e-6)
    rc = main([
        "evaluate", "--checkpoint", out, "--test-sims", "strong_wind", *TINY,
        "--n-train-steps", "6", "--eval-stride", "2", "--output", str(tmp_path / "ev_mpp"),
    ])
    assert rc == 0


def test_train_nde_and_evaluate(tmp_path, nn_ckpt, capsys):
    out = str(tmp_path / "nde")
    rc = main([
        "train-nde", "--sims", "strong_wind", *TINY,
        "--maxiters", "3", "--n-train-steps", "8", "--n-substeps", "2",
        "--output", out,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "history.jsonl"))
    capsys.readouterr()

    eval_out = str(tmp_path / "eval")
    rc = main([
        "evaluate", "--sims", "strong_wind", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--checkpoint", out, "--n-train-steps", "8", "--n-substeps", "2",
        "--eval-stride", "2", "--output", eval_out,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"nde", "mpp", "kpp"} <= set(summary)
    assert os.path.exists(os.path.join(eval_out, "evaluation_strong_wind_weak_cooling.npz"))
    assert os.path.exists(os.path.join(eval_out, "loss.png"))
    assert os.path.exists(os.path.join(eval_out, "summary.json"))
    assert os.path.exists(os.path.join(eval_out, "final_profiles.png"))
    assert os.path.exists(os.path.join(eval_out, "training_regions.png"))

    # --embedded --write-jld2: the embedded pair lands on disk in the
    # LESbrary layout and round-trips through our reader.
    eval_out2 = str(tmp_path / "eval_jld2")
    rc = main([
        "evaluate", "--sims", "strong_wind", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--checkpoint", out, "--n-train-steps", "8", "--n-substeps", "2",
        "--eval-stride", "2", "--embedded", "--write-jld2", "--output", eval_out2,
    ])
    assert rc == 0
    from climateparameterizations_jl_tpu.data.lesbrary import read_les_profiles

    back = read_les_profiles(os.path.join(eval_out2, "strong_wind_weak_cooling", "neural_network.jld2"))
    ev = np.load(os.path.join(eval_out2, "evaluation_strong_wind_weak_cooling.npz"))
    np.testing.assert_allclose(
        np.asarray(back.T), ev["embedded_T"].reshape(back.T.shape), rtol=1e-5
    )
    assert os.path.exists(os.path.join(eval_out2, "strong_wind_weak_cooling", "baseline.jld2"))

    # The saved-sims evaluation path (parity: NDE_profile_oceananigans)
    # reproduces the in-memory embedded channels from the files alone.
    from climateparameterizations_jl_tpu.cli.main import _load_suite, _wind_model
    from climateparameterizations_jl_tpu.eval.profile import nde_profile_from_saved

    train_ds = _load_suite(["strong_wind"], 16, None, 12, 600.0)
    model = _wind_model(train_ds, 16)
    truth_ds = _load_suite(["strong_wind_weak_cooling"], 16, None, 12, 600.0)
    ev2 = nde_profile_from_saved(
        os.path.join(eval_out2, "strong_wind_weak_cooling"), model, truth_ds, np.arange(0, 8, 2),
    )
    np.testing.assert_allclose(
        ev2["embedded_T"].reshape(-1, 16), ev["embedded_T"].reshape(-1, 16), rtol=1e-5
    )
    assert np.all(np.isfinite(ev2["losses_embedded_T"]))

    # Omitting --sims resolves the scaling context from the checkpoint's
    # recorded training sims (NOT the evaluated sims) — bitwise-identical
    # summary to the explicit --sims run above.
    eval_out3 = str(tmp_path / "eval_meta_sims")
    rc = main([
        "evaluate", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--checkpoint", out, "--n-train-steps", "8", "--n-substeps", "2",
        "--eval-stride", "2", "--output", eval_out3,
    ])
    assert rc == 0
    assert "scaling context from checkpoint meta: 1 sim(s)" in capsys.readouterr().out
    with open(os.path.join(eval_out, "summary.json")) as f:
        explicit = json.load(f)
    with open(os.path.join(eval_out3, "summary.json")) as f:
        from_meta = json.load(f)
    assert from_meta == explicit


def test_train_nde_deep_ensemble_and_evaluate(tmp_path, capsys):
    out = str(tmp_path / "nde_ens")
    rc = main([
        "train-nde", "--sims", "strong_wind", *TINY,
        "--ensemble", "2", "--init-scale", "1.0",
        "--maxiters", "2", "--n-train-steps", "8", "--n-substeps", "2",
        "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["ensemble"] == 2
    capsys.readouterr()

    eval_out = str(tmp_path / "eval_ens")
    rc = main([
        "evaluate", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--checkpoint", out, "--n-train-steps", "8", "--n-substeps", "2",
        "--eval-stride", "2", "--output", eval_out,
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "deep-ensemble checkpoint (K=2)" in text
    summary = json.loads(text.strip().splitlines()[-1])
    assert "nde_ensemble_mean" in summary and np.isfinite(summary["nde_ensemble_mean"])
    uq = np.load(os.path.join(eval_out, "uncertainty_strong_wind_weak_cooling.npz"))
    assert uq["losses_member_T"].shape[0] == 2
    assert float(uq["ensemble_T_std"].max()) > 0  # distinct members -> real band
    assert os.path.exists(os.path.join(eval_out, "nde_uncertainty.png"))

    # Warm-starting requires a matching ensemble size.
    with pytest.raises(SystemExit):
        main([
            "train-nde", "--sims", "strong_wind", *TINY,
            "--ensemble", "3", "--init-from", out,
            "--maxiters", "1", "--n-train-steps", "8", "--output", str(tmp_path / "x"),
        ])
    # lbfgs couples members through its linesearch: refused up front.
    with pytest.raises(SystemExit):
        main([
            "train-nde", "--sims", "strong_wind", *TINY,
            "--ensemble", "2", "--optimizer", "lbfgs",
            "--maxiters", "1", "--output", str(tmp_path / "y"),
        ])


def test_train_nde_conv_adj_base_and_evaluate(tmp_path, capsys):
    """--base-closure conv-adj trains the wind-mixing NDE over a convective-
    adjustment base (train_NDE_2DaySuite_SWNH_convective_adjustment.jl) and
    evaluate rebuilds the SAME dynamics from the checkpoint meta, embedding
    over a conv-adj host (not an mPP one the NNs never saw)."""
    out = str(tmp_path / "nde_ca")
    rc = main([
        "train-nde", "--sims", "strong_wind", *TINY,
        "--maxiters", "2", "--n-train-steps", "6", "--n-substeps", "2",
        "--base-closure", "conv-adj", "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["base_closure"] == "conv-adj"
    capsys.readouterr()

    eval_out = str(tmp_path / "eval_ca")
    rc = main([
        "evaluate", "--sims", "strong_wind", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--checkpoint", out, "--n-train-steps", "6", "--n-substeps", "2",
        "--eval-stride", "2", "--embedded", "--output", eval_out,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(summary["nde"]) and np.isfinite(summary["embedded"])
    # The "physics-only" twin is the conv-adj base here, and the base-closure
    # change must actually alter the dynamics vs an mPP-base evaluation.
    from climateparameterizations_jl_tpu.cli.main import _base_closure_overrides

    assert _base_closure_overrides("conv-adj") == {"use_mpp": False, "use_conv_adj": True}
    ev = np.load(os.path.join(eval_out, "evaluation_strong_wind_weak_cooling.npz"))
    assert np.all(np.isfinite(ev["embedded_T"]))


def test_train_fc_nde(tmp_path):
    out = str(tmp_path / "fc")
    rc = main([
        "train-fc-nde", "--nz", "16", "--n-save", "12", "--dt-save", "600",
        "--maxiters", "3", "--n-train-steps", "8", "--n-substeps", "4", "--output", out,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "state.npz"))

    # evaluate-fc --embedded --netcdf writes the reference-layout .nc pair.
    eval_out = str(tmp_path / "fc_eval")
    rc = main([
        "evaluate-fc", "--checkpoint", out, "--sim-ids", "1", "--nz", "16",
        "--n-save", "12", "--dt-save", "600", "--n-eval-steps", "12",
        "--eval-stride", "4", "--n-substeps", "4",
        "--embedded", "--netcdf", "--output", eval_out,
    ])
    assert rc == 0
    from climateparameterizations_jl_tpu.data.netcdf import read_netcdf

    variables, coords, attrs = read_netcdf(os.path.join(eval_out, "sim1", "oceananigans_neural_network.nc"))
    assert set(variables) == {"T", "wT"}
    dims_T, T = variables["T"]
    dims_wT, wT = variables["wT"]
    assert dims_T == ("time", "zC") and dims_wT == ("time", "zF")
    assert T.shape == (len(coords["time"]), len(coords["zC"]))
    assert wT.shape == (len(coords["time"]), len(coords["zF"]))
    assert len(coords["zF"]) == len(coords["zC"]) + 1
    base_vars, _, _ = read_netcdf(os.path.join(eval_out, "sim1", "oceananigans_convective_adjustment.nc"))
    assert set(base_vars) == {"T"}


def test_train_fc_nde_deep_ensemble_and_evaluate(tmp_path, capsys):
    out = str(tmp_path / "fc_ens")
    rc = main([
        "train-fc-nde", "--nz", "16", "--n-save", "12", "--dt-save", "600",
        "--ensemble", "2", "--pretrain-epochs", "3",
        "--maxiters", "2", "--n-train-steps", "8", "--n-substeps", "4", "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["ensemble"] == 2
    capsys.readouterr()

    eval_out = str(tmp_path / "fc_ens_eval")
    rc = main([
        "evaluate-fc", "--checkpoint", out, "--sim-ids", "1", "--nz", "16",
        "--n-save", "12", "--dt-save", "600", "--n-eval-steps", "12",
        "--eval-stride", "4", "--n-substeps", "4", "--output", eval_out,
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "deep-ensemble checkpoint (K=2)" in text
    summary = json.loads(text.strip().splitlines()[-1])
    assert "nde_ensemble_mean" in summary and np.isfinite(summary["nde_ensemble_mean"])
    uq = np.load(os.path.join(eval_out, "uncertainty_sim1.npz"))
    assert uq["losses_member_T"].shape[0] == 2
    assert os.path.exists(os.path.join(eval_out, "nde_uncertainty.png"))


def test_generate_les_diurnal_name_carries_cycle(tmp_path, capsys):
    """A diurnal --jld2-name must produce data with the daily flux cycle
    (generate-les infers the flag from the catalog name)."""
    out = str(tmp_path / "les")
    rc = main([
        "generate-les", "--jld2-name", "wind_-3.5e-4_diurnal_2e-8",
        "--n-horizontal", "8", "--nz-les", "8",
        "--qu=-3.5e-4", "--qb=2e-8", "--n-save", "6", "--dt-save", "7200",
        "--output", out,
    ])
    assert rc == 0
    capsys.readouterr()
    import glob

    from climateparameterizations_jl_tpu.data.lesbrary import read_les_profiles

    (path,) = glob.glob(os.path.join(out, "**", "*.jld2"), recursive=True)
    ds = read_les_profiles(path)
    top = np.asarray(ds.wT)[..., -1]
    # The surface heat flux must VARY over the half-day (sin ramps 0 -> 1 -> 0),
    # not sit at the constant amplitude.
    assert np.std(top) > 0.1 * np.max(np.abs(top)), top


def test_ensemble(tmp_path, nn_ckpt, capsys):
    out = str(tmp_path / "ens")
    rc = main([
        "ensemble", "--sims", "strong_wind", *TINY,
        "--checkpoint", nn_ckpt, "--n-members", "16", "--n-steps", "8",
        "--n-substeps", "2", "--output", out,
    ])
    assert rc == 0
    data = np.load(os.path.join(out, "ensemble.npz"))
    assert data["mean"].shape[-1] == 3 * 16  # (u, v, T) x Nz levels
    assert np.isfinite(data["std"]).all()


def test_optimise_mpp(tmp_path, capsys):
    out = str(tmp_path / "mpp")
    rc = main([
        "optimise-mpp", "--sims", "strong_wind", *TINY,
        "--maxiters", "3", "--n-train-steps", "6", "--n-substeps", "2", "--output", out,
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["nu_0"] > 0 and np.isfinite(result["loss_final"])

    # EKI mode: per-parameter posterior mean/std + decreasing misfit.
    rc = main([
        "optimise-mpp", "--sims", "strong_wind", *TINY,
        "--n-train-steps", "6", "--n-substeps", "2",
        "--calibration-method", "eki", "--n-ensemble", "8", "--n-eki-iters", "2",
        "--output", str(tmp_path / "mpp_eki"),
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["nu_0"] > 0.0  # same flat schema as the gradient path
    assert result["posterior_std"]["nu_0"] >= 0.0
    assert result["misfit_final"] < result["misfit_initial"]


def test_calibrate_kpp(tmp_path, capsys):
    out = str(tmp_path / "kpp")
    rc = main([
        "calibrate-kpp", "--sims", "strong_wind", *TINY,
        "--n-plugin", "4", "--n-line-search", "2", "--n-train-steps", "6", "--output", out,
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 < result["CSL"] < 1.0 and np.isfinite(result["loss"])


def test_train_gp(tmp_path, capsys):
    out = str(tmp_path / "gp")
    rc = main([
        "train-gp", "--sims", "strong_wind", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--fluxes", "wT", "--subsample", "8", "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "gp_report.json")) as f:
        report = json.load(f)
    assert np.isfinite(report["wT"]["mse"])
    # Posterior uncertainty is surfaced (gaussian_process.jl:130-139).
    assert report["wT"]["mean_posterior_variance"] >= 0.0
    assert os.path.exists(os.path.join(out, "gp_uncertainty_wT.png"))


def test_train_gp_ml2_hyperopt(tmp_path, capsys):
    # --optimize-hyperparams refines the grid winner by gradient ML-II
    # (beyond the reference's gamma-only grid, GaussianProcesses.jl:30-49);
    # the run must improve the marginal-likelihood loss and still report a
    # finite test MSE.
    out = str(tmp_path / "gp_ml2")
    rc = main([
        "train-gp", "--sims", "strong_wind", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--fluxes", "wT", "--subsample", "12", "--kernel-ids", "1,2",
        "--optimize-hyperparams", "--hyperopt-iters", "15", "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "gp_report.json")) as f:
        report = json.load(f)
    assert np.isfinite(report["wT"]["mse"])
    lines = [ln for ln in capsys.readouterr().out.splitlines() if "ML-II" in ln]
    assert lines, "ML-II refinement line not printed"


def test_train_gp_ml2_hyperopt_sm_winner(tmp_path, capsys):
    # Regression: when the spectral-mixture kernel (id 6) wins the sweep,
    # --optimize-hyperparams must not crash on the backend-field replace
    # (SpectralMixtureKernel has no Gram backend; it optimizes on XLA).
    out = str(tmp_path / "gp_ml2_sm")
    rc = main([
        "train-gp", "--sims", "strong_wind", "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--fluxes", "wT", "--subsample", "12", "--kernel-ids", "6",
        "--optimize-hyperparams", "--hyperopt-iters", "3", "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "gp_report.json")) as f:
        report = json.load(f)
    assert report["wT"]["kernel"] == "spectral_mixture"
    assert np.isfinite(report["wT"]["mse"])


def test_train_gp_loo_selection_and_sm_kernel(tmp_path, capsys):
    # Two training sims -> leave-one-out kernel selection (never the test
    # set); the sweep includes the spectral-mixture family (id 6).
    out = str(tmp_path / "gp_loo")
    rc = main([
        "train-gp", "--sims", "strong_wind,free_convection",
        "--test-sims", "strong_wind_weak_cooling", *TINY,
        "--fluxes", "wT", "--subsample", "12", "--kernel-ids", "1,2,6",
        "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "gp_report.json")) as f:
        report = json.load(f)
    assert np.isfinite(report["wT"]["mse"])
    assert report["wT"]["kernel"] in ("squared_exponential", "matern12", "spectral_mixture")


def test_double_gyre(tmp_path, capsys):
    out = str(tmp_path / "gyre")
    rc = main([
        "double-gyre", "--nx", "16", "--ny", "16", "--nz-gyre", "8",
        "--days", "2", "--dt", "1800", "--n-frames", "2", "--output", out,
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["psi_min_Sv"])
    data = np.load(os.path.join(out, "double_gyre.npz"))
    assert np.all(np.isfinite(data["T"]))


def test_config_file_overrides(tmp_path):
    cfg = tmp_path / "run.yaml"
    cfg.write_text("epochs: 2\nhidden: 16\nfluxes: wT\n")
    out = str(tmp_path / "nn_cfg")
    rc = main([
        "train-nn", "--sims", "strong_wind", *TINY,
        "--config", str(cfg), "--output", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert list(meta["arch"]) == ["wT"]
    assert meta["arch"]["wT"]["sizes"][1] == 16


def test_diurnal_suite_preserves_flux_cycle():
    """_load_suite must not pin a diurnal sim's top wT face to a constant."""
    import numpy as np

    from climateparameterizations_jl_tpu.cli.main import _load_suite, _suite_diurnal_flags

    assert _suite_diurnal_flags(["wind_-5e-4_diurnal_5e-8", "strong_wind"]) == [True, False]
    ds = _load_suite(["wind_-5e-4_diurnal_5e-8"], 16, None, 30, 600.0)
    top = np.asarray(ds.wT[..., -1]).reshape(-1)
    # The sinusoidal cycle must survive loading: the face varies over time.
    assert top.std() > 0.1 * (np.abs(top).max() + 1e-30)


def test_diurnal_training_batch_carries_amplitude():
    import numpy as np

    from climateparameterizations_jl_tpu.cli.main import _load_suite, _wind_model
    from climateparameterizations_jl_tpu.data.containers import training_tensors

    ds = _load_suite(["wind_-5e-4_diurnal_5e-8"], 16, None, 20, 600.0)
    model = _wind_model(ds, 16, diurnal=True)
    batch = training_tensors(ds, model.scalings, np.arange(10), tau=model.tau, diurnal=True)
    assert float(np.abs(np.asarray(batch.bcs.diurnal_amplitude)).max()) > 0.0


def test_config_does_not_override_explicit_flags(tmp_path):
    """An explicitly-typed flag that happens to equal the parser default must
    beat the config file (value comparison alone cannot tell them apart)."""
    import yaml

    from climateparameterizations_jl_tpu.cli.main import build_parser, _apply_config, _load_config

    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.safe_dump({"nz": 64, "maxiters": 7}))
    parser = build_parser()
    argv = ["train-nde", "--sims", "strong_wind", "--config", str(cfg), "--nz", "32"]
    args = parser.parse_args(argv)
    actions = [a for sp in parser._subparsers._group_actions for a in getattr(sp.choices.get(args.command), "_actions", [])]  # noqa: SLF001
    defaults = {a.dest: a.default for a in actions}
    explicit = {a.dest for a in actions if any(t == o or t.startswith(o + "=") for o in a.option_strings for t in argv)}
    _apply_config(args, _load_config(str(cfg)), defaults, explicit)
    assert args.nz == 32  # typed on the CLI (equal to the default) -> config must not win
    assert args.maxiters == 7  # not typed -> config wins over the default


def test_config_does_not_override_abbreviated_flags(tmp_path):
    """argparse prefix abbreviations (--maxit for --maxiters) are explicit
    flags too: the config must not override them. Token-matching option
    strings missed abbreviations; the SUPPRESS re-parse catches them.
    Runs through main() so the real detection path is exercised."""
    import yaml

    cfg = tmp_path / "c.yaml"
    # maxiters: typed (abbreviated) equal to the parser default 50 -> must
    # beat the config's 500.
    cfg.write_text(yaml.safe_dump({"maxiters": 500}))
    out = str(tmp_path / "nde_abbrev")
    rc = main([
        "train-nde", "--sims", "strong_wind", *TINY,
        "--config", str(cfg), "--output", out,
        "--maxit", "50", "--curriculum", "6:1",
    ])
    assert rc == 0
    hist = [json.loads(line) for line in open(os.path.join(out, "history.jsonl"))]
    iters = max(h["iter"] for h in hist if "iter" in h) + 1
    assert iters <= 60, f"config overrode the explicitly typed --maxit 50 (ran {iters} iters)"


def test_ensemble_diurnal_carries_cycle(tmp_path, capsys):
    """Regression: an ensemble over a diurnal suite used to integrate with
    the surface flux frozen at sin(0) = 0 (diurnal_amplitude never threaded).
    The ensemble-mean surface temperature must respond to the cycle — with
    the flux frozen at zero the top cell only mixes (monotone tiny drift)."""
    out = str(tmp_path / "ens_diurnal")
    rc = main([
        "ensemble", "--sims", "wind_-5e-4_diurnal_5e-8", *TINY,
        "--n-members", "8", "--n-steps", "12", "--n-substeps", "2",
        "--output", out,
    ])
    assert rc == 0
    data = np.load(os.path.join(out, "ensemble.npz"))
    mean = data["mean"]  # (Nt, 3*Nz)
    top_T = mean[:, -1]  # T top cell
    assert np.isfinite(mean).all()
    # The daily cycle (amplitude 5e-8 buoyancy flux) must move the surface
    # temperature measurably within the window.
    assert float(np.abs(np.diff(top_T)).max()) > 1e-6, top_T
