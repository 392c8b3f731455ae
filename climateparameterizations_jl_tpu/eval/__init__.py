"""Evaluation harness: NDE-profile comparisons, loss matrices, animations.

TPU-native re-design of the reference's evaluation layer:

- :mod:`profile`     -> ``wind_mixing/src/training_postprocessing.jl:250-632``
  (``NDE_profile``: NDE vs mPP-only vs KPP vs LES truth with per-timestep
  losses, flux decompositions, and Ri diagnostics).
- :mod:`loss_matrix` -> ``free_convection/src/testing.jl:186-231``
  (``plot_loss_matrix``) and ``compute_nde_solution_history``.
- :mod:`animations`  -> ``free_convection/src/animations.jl``,
  ``wind_mixing/src/animation.jl`` (matplotlib, GIF via pillow).
- :mod:`report`      -> ``wind_mixing/src/animation.jl:832-962``
  (``animate_training_results``: the one-call post-training orchestrator).
"""

from climateparameterizations_jl_tpu.eval.profile import (
    ProfileEvaluation,
    nde_profile,
    nde_profile_from_saved,
    free_convection_profile,
)
from climateparameterizations_jl_tpu.eval.ensemble_uq import fc_ensemble_uq, nde_ensemble_uq
from climateparameterizations_jl_tpu.eval.loss_matrix import (
    loss_matrix,
    solution_history,
)

def __getattr__(name):
    # Lazy: report pulls in matplotlib; keep it off the hot import path.
    if name == "training_report":
        from climateparameterizations_jl_tpu.eval.report import training_report

        return training_report
    raise AttributeError(name)


__all__ = [
    "ProfileEvaluation",
    "nde_profile",
    "nde_profile_from_saved",
    "free_convection_profile",
    "nde_ensemble_uq",
    "fc_ensemble_uq",
    "loss_matrix",
    "solution_history",
    "training_report",
]
