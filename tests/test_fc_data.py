"""Free-convection data helpers + FC CLI flux-pretraining path."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.cli import main
from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.data.free_convection import (
    free_convection_regression_pairs,
    load_data,
    load_free_convection_simulation,
    validate_simulation_ids,
)


class TestFreeConvectionData:
    def test_validate_ids(self, caplog):
        import logging

        with caplog.at_level(logging.WARNING):
            assert validate_simulation_ids([1, 2, 3, 4, 5, 6], [7, 8, 9])
            assert not validate_simulation_ids([1, 2], [2, 3])  # overlap
            assert not validate_simulation_ids([1], [2])  # unused
            assert not validate_simulation_ids([1, 42], list(range(2, 10)))  # bad id

    def test_load_by_id_distinct_forcings(self):
        ds1 = load_free_convection_simulation(1, Nz=16, n_save=8)
        ds5 = load_free_convection_simulation(5, Nz=16, n_save=8)
        assert ds1.T.shape == (9, 16)
        assert float(ds5.theta_top) > float(ds1.theta_top)  # stronger cooling
        with pytest.raises(KeyError):
            load_free_convection_simulation(10)

    def test_load_data_partition(self):
        train, test = load_data([1, 2], [3], Nz=16, n_save=8)
        assert set(train) == {1, 2} and set(test) == {3}

    def test_regression_pairs_shapes(self):
        ds = load_free_convection_simulation(2, Nz=16, n_save=8)
        T_s = ZeroMeanUnitVarianceScaling.fit(ds.T.reshape(-1))
        wT_s = ZeroMeanUnitVarianceScaling.fit(ds.wT.reshape(-1))
        x, y = free_convection_regression_pairs(ds, T_s, wT_s)
        assert x.shape == (9, 16) and y.shape == (9, 17)
        assert np.all(np.isfinite(np.asarray(x)))


class TestBuildFreeConvectionModel:
    def test_stacked_suite_uses_per_sim_fluxes(self):
        """Regression: multi-sim FC training used to bake sim 0's surface
        flux into a shared scalar, training every other member against the
        wrong forcing (Qb spans 10x across the suite)."""
        import dataclasses

        import jax

        from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp
        from climateparameterizations_jl_tpu.data.containers import stack_datasets
        from climateparameterizations_jl_tpu.data.free_convection import build_free_convection_model
        from climateparameterizations_jl_tpu.models.free_convection import free_convection_rhs

        d1 = load_free_convection_simulation(1, Nz=16, n_save=8)
        d5 = load_free_convection_simulation(5, Nz=16, n_save=8)
        ds = stack_datasets([d1, d5])
        T_s = ZeroMeanUnitVarianceScaling.fit(ds.T.reshape(-1))
        wT_s = ZeroMeanUnitVarianceScaling.fit(ds.wT.reshape(-1))
        stacked = build_free_convection_model(ds, T_s, wT_s)
        assert stacked.top_flux.shape == (2,) and stacked.bottom_flux.shape == (2,)
        np.testing.assert_allclose(
            np.asarray(stacked.top_flux),
            np.asarray(wT_s.scale(jnp.stack([d1.theta_top, d5.theta_top]))),
        )
        assert float(stacked.top_flux[0]) != float(stacked.top_flux[1])

        # The stacked RHS must equal each member's own per-sim model RHS
        # under the shared suite scalings (the eval path's construction).
        nn = free_convection_mlp(jax.random.PRNGKey(0), 16)
        T0 = T_s.scale(jnp.stack([d1.T[0], d5.T[0]]))
        rhs_stacked = free_convection_rhs(stacked, nn, T0, 0.0)
        for i, d in enumerate([d1, d5]):
            m = build_free_convection_model(d, T_s, wT_s)
            assert m.top_flux.shape == ()
            np.testing.assert_allclose(
                np.asarray(rhs_stacked[i]),
                np.asarray(free_convection_rhs(m, nn, T0[i], 0.0)),
                rtol=1e-6, atol=1e-8,
            )

        # Members disagreeing on the scalar-prefactor constants must refuse,
        # not silently pick member 0.
        ds_bad = stack_datasets([d1, dataclasses.replace(d5, H=2.0 * d5.H)])
        with pytest.raises(ValueError, match="column depth H"):
            build_free_convection_model(ds_bad, T_s, wT_s)


class TestFCCLI:
    def test_pretrain_and_conv_variant(self, tmp_path, capsys):
        out = str(tmp_path / "fc_conv")
        rc = main([
            "train-fc-nde", "--sim-ids", "1,2", "--nz", "16", "--n-save", "10",
            "--pretrain-epochs", "5", "--conv", "2", "--maxiters", "2",
            "--n-train-steps", "6", "--n-substeps", "4", "--output", out,
        ])
        assert rc == 0
        printed = capsys.readouterr().out
        assert "pretrain" in printed
        with open(os.path.join(out, "meta.json")) as f:
            meta = json.load(f)
        assert meta["arch"]["conv_width"] == 2
        assert meta["sim_ids"] == [1, 2]


class TestGyreAnimation:
    def test_animate_double_gyre(self, tmp_path):
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            run_double_gyre,
        )
        from climateparameterizations_jl_tpu.eval.animations import animate_double_gyre

        model = DoubleGyreModel.default(Nx=12, Ny=12, Nz=4)
        traj = run_double_gyre(model, DoubleGyreState.rest(model), dt=1800.0, n_save=2, save_every=4)
        path = animate_double_gyre(traj, model, str(tmp_path / "gyre.gif"))
        assert os.path.getsize(path) > 0


class TestFCLes3DSource:
    def test_fc_id_generates_via_les3d(self):
        from climateparameterizations_jl_tpu.data.free_convection import (
            load_free_convection_simulation,
        )

        ds = load_free_convection_simulation(1, Nz=8, Nz_les=16, n_save=2, dt_save=60.0, source="les3d")
        import numpy as np

        assert ds.T.shape == (3, 8)
        assert np.all(np.isfinite(np.asarray(ds.T)))
        assert float(ds.theta_top) > 0.0  # surface cooling

    def test_les3d_cache_round_trip(self, tmp_path, monkeypatch):
        """Second load with les_cache_dir hits the npz cache (no LES re-run)
        and returns the identical coarse dataset."""
        import numpy as np

        import climateparameterizations_jl_tpu.data.free_convection as fc

        first = fc.load_free_convection_simulation(
            2, Nz=8, Nz_les=16, n_save=2, dt_save=60.0, source="les3d",
            les_cache_dir=str(tmp_path),
        )
        assert len(list(tmp_path.glob("les3d_sim2_*.npz"))) == 1

        def boom(*a, **k):  # the cache hit must not re-enter the LES
            raise AssertionError("run_les called despite a warm cache")

        monkeypatch.setattr("climateparameterizations_jl_tpu.data.les.run_les", boom)
        second = fc.load_free_convection_simulation(
            2, Nz=8, Nz_les=16, n_save=2, dt_save=60.0, source="les3d",
            les_cache_dir=str(tmp_path),
        )
        for name in ("u", "v", "T", "uw", "vw", "wT", "t", "theta_top"):
            np.testing.assert_array_equal(np.asarray(getattr(first, name)), np.asarray(getattr(second, name)))
        # A different save grid is a different cache key, not a stale hit.
        import pytest

        with pytest.raises(AssertionError, match="run_les"):
            fc.load_free_convection_simulation(
                2, Nz=8, Nz_les=16, n_save=3, dt_save=60.0, source="les3d",
                les_cache_dir=str(tmp_path),
            )

    def test_les3d_corrupt_cache_regenerates(self, tmp_path):
        """A truncated/corrupt cache file must fall through to the LES re-run
        (and be atomically replaced with a good one), not crash every later
        load with BadZipFile."""
        import numpy as np

        import climateparameterizations_jl_tpu.data.free_convection as fc

        first = fc.load_free_convection_simulation(
            2, Nz=8, Nz_les=16, n_save=2, dt_save=60.0, source="les3d",
            les_cache_dir=str(tmp_path),
        )
        (cache,) = tmp_path.glob("les3d_sim2_*.npz")
        cache.write_bytes(cache.read_bytes()[: cache.stat().st_size // 2])  # truncate

        again = fc.load_free_convection_simulation(
            2, Nz=8, Nz_les=16, n_save=2, dt_save=60.0, source="les3d",
            les_cache_dir=str(tmp_path),
        )
        np.testing.assert_array_equal(np.asarray(first.T), np.asarray(again.T))
        # The regeneration healed the cache in place (atomic replace, no tmp litter).
        assert len(list(tmp_path.glob("les3d_sim2_*.npz"))) == 1
        assert list(tmp_path.glob("*.npz")) and not list(tmp_path.glob("tmp*"))
        fc.load_column_npz(str(cache))  # readable again


def test_offline_ids_sharing_qb_are_distinct():
    """Regression: ids sharing a surface flux differ only in stratification;
    the offline synthetic stand-in used to drop it, making e.g. held-out id
    7 byte-identical to training id 3 (silent train/test leakage)."""
    from climateparameterizations_jl_tpu.data.free_convection import (
        load_free_convection_simulation,
    )

    a = load_free_convection_simulation(3, Nz=16, Nz_les=32, n_save=4, dt_save=600.0)
    b = load_free_convection_simulation(7, Nz=16, Nz_les=32, n_save=4, dt_save=600.0)
    assert float(jnp.abs(a.T - b.T).max()) > 1e-6
    assert float(a.theta_bottom) != float(b.theta_bottom)
