from climateparameterizations_jl_tpu.data.containers import (
    ColumnTimeSeries,
    TrainingBatch,
    coarsen_dataset,
    fit_wind_mixing_scalings,
    scaled_state_array,
    scaled_flux_arrays,
    training_tensors,
    stack_datasets,
)
from climateparameterizations_jl_tpu.data.synthetic import (
    synthetic_wind_mixing_les,
    synthetic_free_convection_les,
    three_layer_profile,
)
from climateparameterizations_jl_tpu.data.flux_reconstruction import reconstruct_flux_profiles
from climateparameterizations_jl_tpu.data.les import LESConfig, LESState, initial_state, run_les, stable_dt
from climateparameterizations_jl_tpu.data.registry import (
    WIND_MIXING_CATALOG,
    TWO_DAY_SUITE,
    FREE_CONVECTION_IDS,
    simulation_parameters,
    lesbrary_relative_path,
    free_convection_url,
)

__all__ = [
    "ColumnTimeSeries",
    "TrainingBatch",
    "LESConfig",
    "LESState",
    "initial_state",
    "run_les",
    "stable_dt",
    "coarsen_dataset",
    "fit_wind_mixing_scalings",
    "scaled_state_array",
    "scaled_flux_arrays",
    "training_tensors",
    "stack_datasets",
    "synthetic_wind_mixing_les",
    "synthetic_free_convection_les",
    "three_layer_profile",
    "reconstruct_flux_profiles",
    "WIND_MIXING_CATALOG",
    "TWO_DAY_SUITE",
    "FREE_CONVECTION_IDS",
    "simulation_parameters",
    "lesbrary_relative_path",
    "free_convection_url",
]
