"""CI pin of the adjoint-parity study (docs/PERFORMANCE.md, VERDICT r1 #2).

The full study is ``studies/adjoint_parity.py``; this runs a reduced
version and asserts the properties that make the discrete adjoint a valid
substitute for the reference's continuous InterpolatingAdjoint
(``free_convection/src/solve.jl:1-6``):

- the split stepper's gradient error vs the fine-step limit DECREASES
  under dt refinement and is small at the production setting;
- rk4's gradient is already converged at coarse dt;
- gradients of the two stepper families point the same way (cosine ~ 1).

Tests run in f64 (conftest enables x64), so the measured errors are method
error, not rounding noise.
"""

import numpy as np

from studies.adjoint_parity import build_problem, dt_refinement, flat, loss_and_grad, to_f64


class TestAdjointParity:
    def setup_method(self):
        model, batch, nns = build_problem(stiff=True, Nz=32, n_frames=8)
        self.model, self.batch, self.nns = to_f64(model), to_f64(batch), to_f64(nns)

    def test_split_gradient_converges_with_dt(self):
        rows, meta = dt_refinement(self.model, self.batch, self.nns, substeps=(1, 4, 16), fine=64)
        split = {r["n_substeps"]: r for r in rows if r["method"] == "split"}
        errs = [split[n]["grad_rel_err"] for n in (1, 4, 16)]
        assert all(np.isfinite(errs)), errs
        assert errs[0] > errs[1] > errs[2], errs  # monotone refinement
        assert errs[2] < 0.05, errs  # near the continuous-adjoint limit
        assert split[16]["grad_cosine"] > 0.999
        assert split[16]["loss_rel_err"] < 0.05

    def test_rk4_gradient_converged_at_coarse_dt(self):
        L1, g1 = loss_and_grad(self.model, self.batch, self.nns, "rk4", 1)
        L8, g8 = loss_and_grad(self.model, self.batch, self.nns, "rk4", 8)
        a, b = flat(g1), flat(g8)
        assert np.linalg.norm(a - b) / np.linalg.norm(b) < 0.03
        assert abs(L1 - L8) / abs(L8) < 0.01

    def test_stepper_families_agree_at_fine_dt(self):
        _, g_rk4 = loss_and_grad(self.model, self.batch, self.nns, "rk4", 64)
        _, g_split = loss_and_grad(self.model, self.batch, self.nns, "split", 64)
        a, b = flat(g_rk4), flat(g_split)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, cos
