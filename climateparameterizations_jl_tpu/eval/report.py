"""Training-results report: the one-call evaluation orchestrator.

TPU-native equivalent of ``animate_training_results``
(``wind_mixing/src/animation.jl:832-962``), which chains: load extracted
checkpoint -> plot the training-loss history -> run the embedded
(Oceananigans) evaluation -> solve the NDE with an explicit AND an implicit
integrator -> assemble the 4-way comparison video. Here:

- the training-loss history comes from the run's ``history.jsonl``,
- the embedded host-column pair rides inside :func:`nde_profile`
  (``include_embedded=True``),
- the explicit ("rk4") and operator-split semi-implicit ("split") solver
  variants replace ROCK4 / RadauIIA5,
- figures/GIFs come from :mod:`eval.animations`.

Everything is pure file-out orchestration; the solves themselves stay
jitted scans.
"""

from __future__ import annotations

import json
import os

import numpy as np

from climateparameterizations_jl_tpu.eval.animations import (
    animate_profiles_fluxes_comparison,
    plot_epoch_loss,
    plot_loss,
)
from climateparameterizations_jl_tpu.eval.profile import nde_profile


def training_report(
    model,
    nns,
    ds_test,
    tsteps,
    output_dir: str,
    *,
    history: list | None = None,
    solvers=("rk4", "split"),
    n_substeps: int = 4,
    include_embedded: bool = True,
    animate: bool = True,
    gif_stride: int = 4,
    animation_format: str = "gif",
) -> dict:
    """Produce the full post-training report for one held-out simulation.

    ``history``: list of per-iteration records (dicts with a ``loss`` key),
    e.g. from ``TrainingHistory.read()``. Returns ``{name: filepath}`` plus a
    ``summary`` of time-mean temperature losses per solution member.
    """
    os.makedirs(output_dir, exist_ok=True)
    outputs: dict = {}

    if history:
        totals = [rec.get("loss", rec.get("T", np.nan)) for rec in history]
        outputs["training_loss"] = plot_epoch_loss(
            np.asarray(totals, dtype=np.float64), os.path.join(output_dir, "training_loss.png")
        )

    members = ("nde", "mpp", "kpp", "embedded", "embedded_baseline")
    summary: dict = {}
    for solver in solvers:
        ev = nde_profile(
            model, nns, ds_test, tsteps, solver=solver, n_substeps=n_substeps,
            include_embedded=include_embedded and solver == solvers[0],
        )
        tag = f"profile_{solver}"
        np.savez(os.path.join(output_dir, f"{tag}.npz"), **ev.to_dict())
        outputs[tag] = os.path.join(output_dir, f"{tag}.npz")
        outputs[f"loss_{solver}"] = plot_loss(
            {m: ev[f"losses_{m}_T"] for m in members if f"losses_{m}_T" in ev.keys()},
            ev["t"], os.path.join(output_dir, f"loss_{solver}.png"),
        )
        for m in members:
            if f"losses_{m}_T" in ev.keys():
                summary[f"{m}_{solver}"] = float(np.mean(ev[f"losses_{m}_T"]))
        if animate and solver == solvers[0]:
            outputs["comparison"] = animate_profiles_fluxes_comparison(
                ev, os.path.join(output_dir, f"comparison.{animation_format}"), stride=gif_stride
            )

    outputs["summary"] = summary
    with open(os.path.join(output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return outputs
