"""Diffusion process factory (mirrors diffusion/__init__.py:10-46)."""

from __future__ import annotations

import numpy as np

from diffma_tpu.diffusion.gaussian import (  # noqa: F401
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    discretized_gaussian_log_likelihood,
    get_named_beta_schedule,
    mean_flat,
    normal_kl,
    space_timesteps,
)
from diffma_tpu.diffusion.timestep_samplers import (  # noqa: F401
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)

__all__ = [
    "create_diffusion",
    "GaussianDiffusion",
    "space_timesteps",
    "LossType",
    "ModelMeanType",
    "ModelVarType",
    "UniformSampler",
    "LossSecondMomentResampler",
    "create_named_schedule_sampler",
]


def create_diffusion(
    timestep_respacing,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
) -> GaussianDiffusion:
    """Defaults match the reference exactly: 1000-step linear schedule,
    epsilon prediction, learned-range sigma, hybrid MSE loss."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]

    mean_type = ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON
    var_type = (
        ModelVarType.LEARNED_RANGE
        if learn_sigma
        else (ModelVarType.FIXED_SMALL if sigma_small else ModelVarType.FIXED_LARGE)
    )

    use_timesteps = space_timesteps(diffusion_steps, timestep_respacing)
    # Respacing: rebuild betas from the retained alphas_cumprod
    # (respace.py:73-86) and carry the timestep map.
    base_alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    last = 1.0
    new_betas, timestep_map = [], []
    for i, acp in enumerate(base_alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - acp / last)
            last = acp
            timestep_map.append(i)

    identity_map = timestep_map == list(range(diffusion_steps))
    return GaussianDiffusion.create(
        betas=np.array(new_betas),
        model_mean_type=mean_type,
        model_var_type=var_type,
        loss_type=loss_type,
        timestep_map=None if identity_map else timestep_map,
        original_num_steps=diffusion_steps,
    )
