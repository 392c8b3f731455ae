"""Compiled-HLO audit of the sharded paths: assert XLA actually partitions.

Numerical equivalence tests (``test_parallel.py``, ``test_gyre_sharding.py``)
cannot distinguish real data parallelism from silently replicated redundant
compute: ``jax.jit`` DROPS the shardings of closure-captured arrays, so a
"sharded" step whose batch lives in a closure compiles to every device
computing the FULL batch with zero collectives — correct numbers, no scaling
(the bug class fixed in ``make_sharded_nde_train_step``). These tests inspect
the post-GSPMD compiled HLO instead:

- the data-parallel train step must hold only ``S / n_dev`` simulations per
  device and reduce gradients with all-reduces whose operands are
  O(parameters) — communication independent of batch and trajectory size;
- the ensemble forward solver must be embarrassingly parallel (zero
  collectives);
- the y-decomposed gyre stepper must exchange halos (collective-permutes
  from the ±1 y-stencils), i.e. be genuinely partitioned.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from helpers import make_wind_batch, make_wind_model_nns

from climateparameterizations_jl_tpu.models.wind_mixing import BoundaryConditions
from climateparameterizations_jl_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_ensemble_solver,
    make_sharded_nde_train_step,
    replicate,
    shard_training_batch,
)
from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

f32 = jnp.float32

# Matches real collective instructions. The result type may be a single
# shape (`f32[8]{0}`) or a TUPLE (`(f32[8]{0}, f32[4]{0})` for variadic
# all-reduces and async `-start` forms), which contains spaces — match both
# explicitly; plain substring search would also hit get-tuple-element lines
# referencing a collective by name.
_COLLECTIVE_RE = re.compile(
    r"=\s*(?:\([^)]*\)|\S+)\s+"
    r"((?:all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)(?:-start)?)\("
)


def _collective_ops(hlo_text: str) -> list:
    return _COLLECTIVE_RE.findall(hlo_text)


def _all_reduce_result_elems(hlo_text: str) -> list:
    """Element counts of every all-reduce result (tuple members flattened)."""
    counts = []
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(.*?)\s+all-reduce(?:-start)?\(", line)
        if not m:
            continue
        for dims in re.findall(r"\w+\[([0-9,]*)\]", m.group(1)):
            counts.append(int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1)
    return counts


@pytest.fixture(scope="module")
def setup():
    # Shared with test_parallel.py: the HLO audit inspects the SAME
    # configuration whose numerics the equivalence tests pin.
    return make_wind_model_nns()


_make_batch = make_wind_batch


class TestDataParallelTrainStepHLO:
    def test_batch_partitioned_and_grads_reduced(self, setup):
        model, nns = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        optimizer = optax.adam(1e-3)
        mesh = make_mesh(8)
        with mesh:
            sharded = shard_training_batch(_make_batch(8), mesh)
            nns_r = replicate(nns, mesh)
            step = make_sharded_nde_train_step(model, sharded, config, optimizer)
            txt = step.lower(nns_r, optimizer.init(nns_r)).compile().as_text()

        # Each device computes its 1-simulation shard, never the full batch
        # (full-batch shapes reappearing = the closure-capture regression:
        # replicated redundant compute with no collectives).
        assert "f32[1,96]" in txt and "f32[1,5,96]" in txt
        assert "f32[8,96]" not in txt and "f32[8,5,96]" not in txt

        ops = _collective_ops(txt)
        assert any(op.startswith("all-reduce") for op in ops), "gradient psum missing"
        assert all(op.startswith("all-reduce") for op in ops), f"unexpected collectives: {ops}"

        # Communication is O(parameters): every all-reduce operand is at most
        # the full parameter vector (packed grads + scalar loss channels),
        # never O(batch x trajectory).
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(nns))
        assert max(_all_reduce_result_elems(txt)) <= n_params


class TestEmbeddedTrainStepHLO:
    def test_aposteriori_batch_partitioned_and_grads_reduced(self):
        """The a-posteriori (embedded) DP step: per-sim data lives in BOTH
        trees (EmbeddedBatch + host surface fluxes). The numerical test
        (``test_parallel.py::TestShardedEmbeddedTrainStep``) cannot catch the
        closure-capture silent-replication mode — pin the compiled HLO."""
        from helpers import make_embedded_wind_problem

        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_sharded_embedded_train_step,
            shard_embedded_problem,
        )

        _, nns, host, batch = make_embedded_wind_problem(8)
        config = NDETrainConfig(n_substeps=2)
        optimizer = optax.adam(1e-3)
        mesh = make_mesh(8)
        with mesh:
            host_sh, batch_sh = shard_embedded_problem(host, batch, mesh)
            nns_r = replicate(nns, mesh)
            step = make_sharded_embedded_train_step(host_sh, batch_sh, config, optimizer)
            txt = step.lower(nns_r, optimizer.init(nns_r)).compile().as_text()

        # One-sim shards of the (8, 5, 96) targets / (8, 32) host states;
        # full-batch shapes reappearing = replicated redundant compute.
        assert "f32[1,5,96]" in txt and "f32[1,32]" in txt
        assert "f32[8,5,96]" not in txt and "f32[8,32]" not in txt

        ops = _collective_ops(txt)
        assert any(op.startswith("all-reduce") for op in ops), "gradient psum missing"
        assert all(op.startswith("all-reduce") for op in ops), f"unexpected collectives: {ops}"

        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(nns))
        assert max(_all_reduce_result_elems(txt)) <= n_params


class TestEnsembleSolverHLO:
    def test_embarrassingly_parallel(self, setup):
        model, nns = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        E = 16
        batch = _make_batch(E)
        mesh = make_mesh(8)
        solver = make_sharded_ensemble_solver(model, config, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        with mesh:
            sh = NamedSharding(mesh, P("batch"))
            x0 = jax.device_put(batch.x0, sh)
            bcs = jax.tree.map(lambda b: jax.device_put(b, sh), batch.bcs)
            txt = solver.lower(nns, bcs, x0, f32(0.0), f32(1e-3), 3).compile().as_text()

        assert _collective_ops(txt) == []
        assert "f32[2,96]" in txt  # E/8 members per device
        assert "f32[16,96]" not in txt


class TestSuiteEnsembleSolverHLO:
    def test_2d_mesh_embarrassingly_parallel(self, setup):
        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_mesh_2d,
            make_sharded_suite_ensemble_solver,
        )

        model, nns = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        S, E = 4, 2
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=(S, E, 96)) * 0.1, f32)
        zeros = jnp.zeros((S,), f32)
        bcs = BoundaryConditions(
            uw_bot=zeros, uw_top=zeros - 0.5, vw_bot=zeros, vw_top=zeros,
            wT_bot=zeros, wT_top=zeros + 0.3, diurnal_amplitude=zeros,
        )
        mesh = make_mesh_2d(S, E)
        solver = make_sharded_suite_ensemble_solver(model, config, mesh)
        with mesh:
            txt = solver.lower(nns, bcs, x0, f32(0.0), f32(1e-3), 3).compile().as_text()

        assert _collective_ops(txt) == []
        assert "f32[1,1,96]" in txt  # one (sim, member) tile per device
        assert "f32[4,2,96]" not in txt


class TestLESStepperHLO:
    def test_halo_exchange_not_replication(self):
        from climateparameterizations_jl_tpu.data.les import LESConfig, initial_state
        from climateparameterizations_jl_tpu.parallel.les_sharding import (
            make_les_mesh,
            make_sharded_les_stepper,
            shard_les_state,
        )

        config = LESConfig.default(Nx=16, Ny=16, Nz=8)
        mesh = make_les_mesh(8)
        stepper = make_sharded_les_stepper(config, mesh, 1.0, n_substeps=2)
        state = shard_les_state(initial_state(config), mesh)
        txt = stepper.lower(state, jnp.zeros(())).compile().as_text()

        ops = _collective_ops(txt)
        assert any(op.startswith("collective-permute") for op in ops)
        # Per-device y-tiles (Ny/8 = 2 rows), never the full 3-D fields.
        assert "f32[2,16,8]" in txt
        assert "f32[16,16,8]" not in txt


class TestShardedGPSearchHLO:
    def test_gamma_grid_partitioned_no_collectives(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from climateparameterizations_jl_tpu.closures.gp import _error_per_gamma_vmapped

        rng = np.random.default_rng(0)
        x_tr = jnp.asarray(rng.normal(size=(64, 33)))
        y_tr = jnp.asarray(rng.normal(size=(64,)))
        x_va = jnp.asarray(rng.normal(size=(32, 33)))
        y_va = jnp.asarray(rng.normal(size=(32,)))
        mesh = make_mesh(8)
        repl = NamedSharding(mesh, P())
        lg = jax.device_put(jnp.linspace(-1.5, 1.5, 16), NamedSharding(mesh, P("batch")))
        args = [jax.device_put(a, repl) for a in (x_tr, y_tr, x_va, y_va)]
        with mesh:
            txt = _error_per_gamma_vmapped.lower(*args, None, lg, 1, "euclidean", 0.0).compile().as_text()

        # Each device factorizes its 2-gamma slice of the grid independently.
        assert _collective_ops(txt) == []
        dt = "f64" if jax.config.jax_enable_x64 else "f32"
        assert f"{dt}[2,64,64]" in txt  # per-device batched-Cholesky tile
        assert f"{dt}[16,64,64]" not in txt


class TestGyreStepperHLO:
    def test_halo_exchange_not_replication(self):
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
        )
        from climateparameterizations_jl_tpu.parallel.gyre_sharding import (
            make_gyre_mesh,
            make_sharded_gyre_stepper,
            shard_gyre_state,
        )

        model = DoubleGyreModel.default(Nx=16, Ny=24, Nz=8)
        mesh = make_gyre_mesh(8)
        stepper = make_sharded_gyre_stepper(model, mesh, 1800.0, n_substeps=2)
        state = shard_gyre_state(DoubleGyreState.rest(model), mesh)
        txt = stepper.lower(state).compile().as_text()

        ops = _collective_ops(txt)
        # The +-1 y-stencils must lower to halo collective-permutes — their
        # absence would mean GSPMD replicated the basin on every device.
        assert any(op.startswith("collective-permute") for op in ops)
        # Per-device tiles of the y-sharded 3-D fields (Ny/8 = 3 rows).
        assert "f32[3,16,8]" in txt
        # Unlike the LES stepper, full-basin tensors DO legitimately appear
        # here: `v` sits on Ny+1 faces (not mesh-divisible) and is stored
        # replicated, and the DCT free-surface solve is global — so GSPMD
        # emits a small, fixed number of full-field all-gathers feeding those
        # (3 at this config). Bound them so a regression that gathers the
        # whole basin into the hot loop (destroying scaling while halo
        # permutes remain) cannot pass; halo permutes must dominate.
        n_gather = sum(op.startswith("all-gather") for op in ops)
        n_permute = sum(op.startswith("collective-permute") for op in ops)
        assert n_gather <= 6, f"full-field all-gathers crept into the hot loop: {n_gather}"
        assert n_permute > 10 * n_gather, (ops, n_permute, n_gather)
