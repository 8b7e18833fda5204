"""Gaussian diffusion as pure functions over precomputed coefficient tables.

Functional JAX re-design of the reference's OpenAI-lineage implementation
(diffusion/gaussian_diffusion.py, 875 LoC).  Coefficients are computed once
in float64 numpy (matching gaussian_diffusion.py:166-201) and stored as jnp
arrays; every routine is jittable, RNG is explicit, and the sampling loops
are single ``lax.scan`` programs instead of 250 sequential host round-trips
(gaussian_diffusion.py:498-511).

Timestep respacing (diffusion/respace.py) is folded in: a respaced process
carries a ``timestep_map`` and remaps model timesteps exactly like
``_WrappedModel`` (respace.py:117-129).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Any, Callable, Dict, Optional, Sequence, Set, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ModelMeanType",
    "ModelVarType",
    "LossType",
    "GaussianDiffusion",
    "get_named_beta_schedule",
    "space_timesteps",
    "normal_kl",
    "discretized_gaussian_log_likelihood",
    "mean_flat",
]


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


# ---------------------------------------------------------------------------
# Beta schedules (gaussian_diffusion.py:58-141)
# ---------------------------------------------------------------------------


def _warmup_beta(beta_start, beta_end, num_steps, warmup_frac):
    betas = beta_end * np.ones(num_steps, dtype=np.float64)
    warmup_time = int(num_steps * warmup_frac)
    betas[:warmup_time] = np.linspace(beta_start, beta_end, warmup_time, dtype=np.float64)
    return betas


def get_beta_schedule(beta_schedule, *, beta_start, beta_end, num_diffusion_timesteps):
    n = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, n, dtype=np.float64)
    elif beta_schedule == "warmup10":
        betas = _warmup_beta(beta_start, beta_end, n, 0.1)
    elif beta_schedule == "warmup50":
        betas = _warmup_beta(beta_start, beta_end, n, 0.5)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(n, dtype=np.float64)
    elif beta_schedule == "jsd":
        betas = 1.0 / np.linspace(n, 1, n, dtype=np.float64)
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (n,)
    return betas


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999):
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def get_named_beta_schedule(schedule_name, num_diffusion_timesteps):
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return get_beta_schedule(
            "linear",
            beta_start=scale * 0.0001,
            beta_end=scale * 0.02,
            num_diffusion_timesteps=num_diffusion_timesteps,
        )
    if schedule_name == "squaredcos_cap_v2":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


# ---------------------------------------------------------------------------
# Timestep respacing (respace.py:12-62)
# ---------------------------------------------------------------------------


def space_timesteps(num_timesteps: int, section_counts) -> Set[int]:
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {num_timesteps} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        taken = []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += frac_stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


# ---------------------------------------------------------------------------
# Math utilities (diffusion/diffusion_utils.py)
# ---------------------------------------------------------------------------


def mean_flat(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians (diffusion_utils.py:10-36)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Discretised decoder NLL (diffusion_utils.py:62-88)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, 1e-12, None))
        ),
    )


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast over trailing dims
    (the jittable form of gaussian_diffusion.py:864-876)."""
    out = jnp.take(arr, t)
    return out.reshape(out.shape + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# The diffusion process
# ---------------------------------------------------------------------------

ModelFn = Callable[..., jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Coefficient tables + typed behaviour.  All tables are jnp f32 arrays
    derived in f64 (gaussian_diffusion.py:166-201); instances are pytrees so
    they can cross jit boundaries."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    log_betas: jax.Array
    fixed_large_variance: jax.Array
    fixed_large_log_variance: jax.Array
    timestep_map: Optional[jax.Array]  # respacing (None => identity)
    model_mean_type: ModelMeanType = dataclasses.field(
        metadata=dict(static=True), default=ModelMeanType.EPSILON
    )
    model_var_type: ModelVarType = dataclasses.field(
        metadata=dict(static=True), default=ModelVarType.LEARNED_RANGE
    )
    loss_type: LossType = dataclasses.field(
        metadata=dict(static=True), default=LossType.MSE
    )
    original_num_steps: int = dataclasses.field(metadata=dict(static=True), default=1000)

    # -- construction -------------------------------------------------------

    @staticmethod
    def create(
        betas: np.ndarray,
        model_mean_type: ModelMeanType = ModelMeanType.EPSILON,
        model_var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
        loss_type: LossType = LossType.MSE,
        timestep_map: Optional[Sequence[int]] = None,
        original_num_steps: Optional[int] = None,
    ) -> "GaussianDiffusion":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        alphas = 1.0 - betas
        acp = np.cumprod(alphas, axis=0)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        post_logvar = (
            np.log(np.append(post_var[1], post_var[1:]))
            if len(post_var) > 1
            else np.array([])
        )
        fl_var = np.append(post_var[1], betas[1:])
        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        return GaussianDiffusion(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            alphas_cumprod_next=f32(acp_next),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(post_logvar),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
            log_betas=f32(np.log(betas)),
            fixed_large_variance=f32(fl_var),
            fixed_large_log_variance=f32(np.log(fl_var)),
            timestep_map=(
                jnp.asarray(list(timestep_map), jnp.int32)
                if timestep_map is not None
                else None
            ),
            model_mean_type=model_mean_type,
            model_var_type=model_var_type,
            loss_type=loss_type,
            original_num_steps=original_num_steps or len(betas),
        )

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    def _map_t(self, t: jax.Array) -> jax.Array:
        """Respacing remap (respace.py:117-129)."""
        return t if self.timestep_map is None else jnp.take(self.timestep_map, t)

    # -- q distributions -----------------------------------------------------

    def q_mean_variance(self, x_start, t):
        nd = x_start.ndim
        mean = _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        variance = _extract(self.posterior_variance, t, nd)
        log_variance = _extract(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    # -- p distributions -----------------------------------------------------

    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        nd = x_t.ndim
        c1 = _extract(1.0 / self.posterior_mean_coef1, t, nd)
        c2 = _extract(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, nd)
        return c1 * xprev - c2 * x_t

    def p_mean_variance(
        self,
        model: Union[ModelFn, jax.Array],
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn=None,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, jax.Array]:
        """p(x_{t-1} | x_t) stats (gaussian_diffusion.py:254-332).  ``model``
        may be a callable (given the *remapped* timesteps) or a precomputed
        output tensor (the frozen-output trick of training_losses)."""
        model_kwargs = model_kwargs or {}
        B, C = x.shape[:2]
        if callable(model):
            model_output = model(x, self._map_t(t), **model_kwargs)
        else:
            model_output = model
        nd = x.ndim

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, nd)
                max_log = _extract(self.log_betas, t, nd)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            model_variance = _extract(self.fixed_large_variance, t, nd)
            model_log_variance = _extract(self.fixed_large_log_variance, t, nd)
        else:  # FIXED_SMALL
            model_variance = _extract(self.posterior_variance, t, nd)
            model_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)

        def process_xstart(v):
            if denoised_fn is not None:
                v = denoised_fn(v)
            if clip_denoised:
                v = jnp.clip(v, -1.0, 1.0)
            return v

        if self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        elif self.model_mean_type == ModelMeanType.EPSILON:
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x, t, model_output)
            )
        else:  # PREVIOUS_X
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output)
            )
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # -- guidance ------------------------------------------------------------

    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Shift the posterior mean by ``variance * grad(log p(y|x))``
        (Sohl-Dickstein conditioning, gaussian_diffusion.py:346-356).  As in
        the reference's respaced process, ``cond_fn`` receives the *remapped*
        timesteps (respace.py:99-100)."""
        gradient = cond_fn(x, self._map_t(t), **(model_kwargs or {}))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Condition the score function instead of the mean (Song et al 2020;
        gaussian_diffusion.py:358-374): shift eps by
        ``-sqrt(1-alpha_bar) * grad``, then rederive pred_xstart and the
        posterior mean.  ``cond_fn`` gets remapped timesteps
        (respace.py:102-103)."""
        nd = x.ndim
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(
            x, self._map_t(t), **(model_kwargs or {})
        )
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # -- sampling ------------------------------------------------------------

    def p_sample(
        self, model, x, t, rng, clip_denoised=True, denoised_fn=None,
        cond_fn=None, model_kwargs=None,
    ):
        out = self.p_mean_variance(
            model, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        mean = out["mean"]
        if cond_fn is not None:
            mean = self.condition_mean(cond_fn, out, x, t, model_kwargs=model_kwargs)
        sample = mean + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self, model, shape, rng, noise=None, clip_denoised=True,
        denoised_fn=None, cond_fn=None, model_kwargs=None,
    ) -> jax.Array:
        """Full ancestral sampler as one lax.scan (replaces the host loop at
        gaussian_diffusion.py:419-511)."""
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape)
        T = self.num_timesteps

        def step(carry, i):
            img = carry
            t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
            out = self.p_sample(
                model, img, t, jax.random.fold_in(rng, i),
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs,
            )
            return out["sample"], None

        img, _ = jax.lax.scan(step, img, jnp.arange(T))
        return img

    def ddim_sample(
        self, model, x, t, rng, clip_denoised=True, denoised_fn=None,
        cond_fn=None, model_kwargs=None, eta=0.0,
    ):
        out = self.p_mean_variance(
            model, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            # gaussian_diffusion.py:536-537 — DDIM conditions the score, not
            # the mean.
            out = self.condition_score(cond_fn, out, x, t, model_kwargs=model_kwargs)
        nd = x.ndim
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng, x.shape, x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self, model, x, t, clip_denoised=True, denoised_fn=None, cond_fn=None,
        model_kwargs=None,
    ):
        """Deterministic forward ODE step (gaussian_diffusion.py:562-598)."""
        out = self.p_mean_variance(
            model, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            # gaussian_diffusion.py:585-586
            out = self.condition_score(cond_fn, out, x, t, model_kwargs=model_kwargs)
        nd = x.ndim
        eps = (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x - out["pred_xstart"]
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, nd)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self, model, shape, rng, noise=None, clip_denoised=True,
        denoised_fn=None, cond_fn=None, model_kwargs=None, eta=0.0,
    ) -> jax.Array:
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape)
        T = self.num_timesteps

        def step(carry, i):
            t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
            out = self.ddim_sample(
                model, carry, t, jax.random.fold_in(rng, i),
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs, eta=eta,
            )
            return out["sample"], None

        img, _ = jax.lax.scan(step, img, jnp.arange(T))
        return img

    def p_sample_loop_progressive(
        self, model, shape, rng, noise=None, clip_denoised=True,
        denoised_fn=None, cond_fn=None, model_kwargs=None,
    ) -> Dict[str, jax.Array]:
        """Ancestral sampler that also returns every intermediate.  The
        reference yields per-step dicts from a Python generator
        (gaussian_diffusion.py:464-511); the jittable equivalent is one
        ``lax.scan`` whose stacked outputs carry the same per-step values:
        ``sample[i]`` / ``pred_xstart[i]`` correspond to the i-th yielded dict
        (i.e. timestep ``T-1-i``)."""
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape)
        T = self.num_timesteps

        def step(carry, i):
            t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
            out = self.p_sample(
                model, carry, t, jax.random.fold_in(rng, i),
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs,
            )
            return out["sample"], (out["sample"], out["pred_xstart"])

        final, (samples, pred_xstarts) = jax.lax.scan(step, img, jnp.arange(T))
        return {"sample": samples, "pred_xstart": pred_xstarts, "final": final}

    def ddim_sample_loop_progressive(
        self, model, shape, rng, noise=None, clip_denoised=True,
        denoised_fn=None, cond_fn=None, model_kwargs=None, eta=0.0,
    ) -> Dict[str, jax.Array]:
        """DDIM counterpart of :meth:`p_sample_loop_progressive`
        (gaussian_diffusion.py:633-680)."""
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape)
        T = self.num_timesteps

        def step(carry, i):
            t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
            out = self.ddim_sample(
                model, carry, t, jax.random.fold_in(rng, i),
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs, eta=eta,
            )
            return out["sample"], (out["sample"], out["pred_xstart"])

        final, (samples, pred_xstarts) = jax.lax.scan(step, img, jnp.arange(T))
        return {"sample": samples, "pred_xstart": pred_xstarts, "final": final}

    # -- losses ---------------------------------------------------------------

    def _vb_terms_bpd(
        self, model, x_start, x_t, t, clip_denoised=True, model_kwargs=None
    ):
        true_mean, _, true_logvar = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model, x_t, t, clip_denoised=clip_denoised, model_kwargs=model_kwargs
        )
        kl = normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self, model: ModelFn, x_start, t, rng, model_kwargs=None, noise=None
    ) -> Dict[str, jax.Array]:
        """Hybrid MSE + VB loss (gaussian_diffusion.py:715-790)."""
        model_kwargs = model_kwargs or {}
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        terms: Dict[str, jax.Array] = {}

        if self.loss_type.is_vb():
            terms["loss"] = self._vb_terms_bpd(
                model, x_start, x_t, t, clip_denoised=False, model_kwargs=model_kwargs
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = model(x_t, self._map_t(t), **model_kwargs)
        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            eps_pred, var_values = jnp.split(model_output, 2, axis=1)
            # Learn the variance with the VB bound without letting it move the
            # mean prediction (gaussian_diffusion.py:758-768).
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(eps_pred), var_values], axis=1
            )
            terms["vb"] = self._vb_terms_bpd(
                frozen, x_start, x_t, t, clip_denoised=False
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)
            model_output = eps_pred

        target = {
            ModelMeanType.PREVIOUS_X: lambda: self.q_posterior_mean_variance(
                x_start, x_t, t
            )[0],
            ModelMeanType.START_X: lambda: x_start,
            ModelMeanType.EPSILON: lambda: noise,
        }[self.model_mean_type]()
        terms["mse"] = mean_flat(jnp.square(target - model_output))
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    # -- evaluation ------------------------------------------------------------

    def _prior_bpd(self, x_start):
        B = x_start.shape[0]
        t = jnp.full((B,), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_logvar = self.q_mean_variance(x_start, t)
        kl = normal_kl(qt_mean, qt_logvar, 0.0, 0.0)
        return mean_flat(kl) / np.log(2.0)

    def calc_bpd_loop(
        self, model, x_start, rng, clip_denoised=True, model_kwargs=None,
        noise=None,
    ):
        """Full VLB in bits/dim over all timesteps, as a lax.scan
        (gaussian_diffusion.py:808-861).

        ``noise``: optional (T, *x_start.shape) array; ``noise[i]`` is the
        q_sample noise used at loop step i, i.e. at t = T-1-i -- the same
        order the reference draws ``th.randn_like`` in its t-descending
        Python loop (gaussian_diffusion.py:830-832).  When None, noise is
        drawn from ``rng`` (fold_in per step)."""
        B = x_start.shape[0]
        T = self.num_timesteps

        def step(_, i):
            t = jnp.full((B,), T - 1 - i, jnp.int32)
            if noise is None:
                eps_in = jax.random.normal(jax.random.fold_in(rng, i), x_start.shape)
            else:
                eps_in = noise[i]
            x_t = self.q_sample(x_start, t, eps_in)
            out = self._vb_terms_bpd(
                model, x_start, x_t, t, clip_denoised=clip_denoised,
                model_kwargs=model_kwargs,
            )
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            return None, (
                out["output"],
                mean_flat(jnp.square(out["pred_xstart"] - x_start)),
                mean_flat(jnp.square(eps - eps_in)),
            )

        _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, jnp.arange(T))
        # column j corresponds to t = T-1-j, matching the reference's stacking
        # order (gaussian_diffusion.py:830-851)
        vb, xstart_mse, mse = (jnp.swapaxes(a, 0, 1) for a in (vb, xstart_mse, mse))
        prior_bpd = self._prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }
