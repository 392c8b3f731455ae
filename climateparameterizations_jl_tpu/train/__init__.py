from climateparameterizations_jl_tpu.train.loss import (
    LossChannels,
    calculate_loss_scalings,
    apply_loss_scalings,
    nde_loss_channels,
    loss_per_timestep,
)
from climateparameterizations_jl_tpu.train.nde import (
    NDETrainConfig,
    train_wind_mixing_nde,
    train_free_convection_nde,
    make_wind_mixing_loss_fn,
)
from climateparameterizations_jl_tpu.train.deep_ensemble import (
    init_ensemble,
    stack_members,
    unstack_members,
    ensemble_size,
    train_wind_mixing_deep_ensemble,
    train_free_convection_deep_ensemble,
)
from climateparameterizations_jl_tpu.train.nn import train_flux_nn, train_flux_nn_ensemble, flux_nn_loss
from climateparameterizations_jl_tpu.train.mpp_calibration import optimise_mpp_parameters
from climateparameterizations_jl_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    TrainingHistory,
)

__all__ = [
    "LossChannels",
    "calculate_loss_scalings",
    "apply_loss_scalings",
    "nde_loss_channels",
    "loss_per_timestep",
    "NDETrainConfig",
    "train_wind_mixing_nde",
    "train_free_convection_nde",
    "make_wind_mixing_loss_fn",
    "init_ensemble",
    "stack_members",
    "unstack_members",
    "ensemble_size",
    "train_wind_mixing_deep_ensemble",
    "train_free_convection_deep_ensemble",
    "train_flux_nn",
    "train_flux_nn_ensemble",
    "flux_nn_loss",
    "optimise_mpp_parameters",
    "save_checkpoint",
    "load_checkpoint",
    "TrainingHistory",
]
