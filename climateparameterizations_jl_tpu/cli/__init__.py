"""Unified typed CLI: the framework's entry-point layer.

Replaces the reference's ~60 ad-hoc entry scripts and its three config
styles — ArgParse tables (``train_free_convection_nde.jl:21-70``), raw
``ARGS`` (``wind_mixing/train_NDE_args.jl:15-19``), and in-script dicts
(``train_NDE.jl:114-131``) — with one subcommand CLI whose defaults can be
overridden by a YAML config file (``--config run.yaml``) and/or flags
(flags win). Every run directory gets a checkpoint (params + meta) and an
append-only ``history.jsonl``.

Subcommands:

- ``catalog``        list dataset catalog names
- ``train-nn``       direct flux regression           (train_NN.jl)
- ``train-nde``      wind-mixing triple-NN NDE        (train_NDE.jl)
- ``train-fc-nde``   free-convection NDE              (train_free_convection_nde.jl)
- ``optimise-mpp``   mPP 5-parameter calibration      (optimise_modified_pacanowski_philander.jl)
- ``calibrate-kpp``  KPP parameter search             (train_kpp.jl)
- ``train-gp``       GP kernel grid search + fit      (optimize_GP_kernels.jl / run_GP_DE.jl)
- ``evaluate``       NDE-profile comparison + figures (test_free_convection_nde.jl / NDE_profile)
- ``double-gyre``    3-D basin run with NN closure    (double_gyre_nn.jl)
- ``benchmark``      forward-throughput benchmark     (Benchmarking.jl)
"""

from climateparameterizations_jl_tpu.cli.main import main

__all__ = ["main"]
