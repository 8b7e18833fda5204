"""Diffusion-math tests: coefficient tables, respacing, losses, samplers.

Where /root/reference is mounted, the torch-based upstream implementation is
imported directly (it only needs numpy+torch) and used as a numerical oracle
with identical fake models and pre-drawn noise.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.diffusion import (
    GaussianDiffusion,
    LossSecondMomentResampler,
    UniformSampler,
    create_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "diffusion"))


def _fake_model_np(x, t):
    """Deterministic 'model': eps = tanh(x), var values = 0.1*x."""
    return np.concatenate([np.tanh(x), 0.1 * x], axis=1)


def test_linear_schedule_values():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4)
    np.testing.assert_allclose(betas[-1], 0.02)
    d = create_diffusion("")
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(d.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d.posterior_mean_coef1),
        betas * np.sqrt(np.append(1.0, acp[:-1])) / (1 - acp),
        rtol=1e-5,
    )


def test_space_timesteps_sets():
    assert space_timesteps(1000, "250") == space_timesteps(1000, [250])
    assert len(space_timesteps(1000, "250")) == 250
    assert len(space_timesteps(1000, "ddim50")) == 50
    assert space_timesteps(1000, "ddim50") == set(range(0, 1000, 20))
    assert space_timesteps(300, [10, 15, 20]) is not None


def test_respaced_diffusion_has_map():
    d = create_diffusion("250")
    assert d.num_timesteps == 250
    assert d.timestep_map is not None and d.timestep_map.shape == (250,)
    full = create_diffusion("")
    assert full.timestep_map is None and full.num_timesteps == 1000


def test_q_sample_and_posterior_match_formulas():
    d = create_diffusion("")
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 999])
    xt = np.asarray(d.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    acp = np.asarray(d.alphas_cumprod)
    expect = (
        np.sqrt(acp[t])[:, None, None, None] * x0
        + np.sqrt(1 - acp[t])[:, None, None, None] * noise
    )
    np.testing.assert_allclose(xt, expect, rtol=1e-5, atol=1e-5)


def test_training_losses_structure_and_vb_freeze():
    d = create_diffusion("")
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8, 8)), jnp.float32)
    t = jnp.array([10, 500])

    def model(x, tt):
        return jnp.concatenate([jnp.tanh(x), 0.1 * x], axis=1)

    terms = d.training_losses(model, x0, t, jax.random.PRNGKey(0))
    assert set(terms) == {"loss", "mse", "vb"}
    assert terms["loss"].shape == (2,)
    np.testing.assert_allclose(
        np.asarray(terms["loss"]),
        np.asarray(terms["mse"] + terms["vb"]),
        rtol=1e-6,
    )


def test_p_sample_loop_runs_and_is_deterministic():
    d = create_diffusion("4", noise_schedule="squaredcos_cap_v2", diffusion_steps=16)

    def model(x, tt):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=1)

    rng = jax.random.PRNGKey(42)
    s1 = d.p_sample_loop(model, (2, 4, 8, 8), rng, clip_denoised=False)
    s2 = d.p_sample_loop(model, (2, 4, 8, 8), rng, clip_denoised=False)
    assert s1.shape == (2, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    s3 = d.ddim_sample_loop(model, (2, 4, 8, 8), rng, clip_denoised=False)
    assert np.isfinite(np.asarray(s3)).all()


def test_uniform_sampler():
    d = create_diffusion("")
    s = UniformSampler(d)
    t, w = s.sample(64, jax.random.PRNGKey(0))
    assert t.shape == (64,) and w.shape == (64,)
    np.testing.assert_allclose(np.asarray(w), 1.0)
    assert int(t.max()) < 1000 and int(t.min()) >= 0


def test_loss_second_moment_resampler_warmup():
    d = create_diffusion("4", noise_schedule="squaredcos_cap_v2", diffusion_steps=8)
    s = LossSecondMomentResampler(d, history_per_term=2)
    np.testing.assert_allclose(s.weights(), 1.0)
    for _ in range(2):
        s.update_with_all_losses(list(range(4)), [1.0, 2.0, 3.0, 4.0])
    w = s.weights()
    assert w.shape == (4,)
    assert w[3] > w[0]  # higher loss => more weight
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# Oracle tests against the reference torch implementation
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestAgainstReferenceTorch:
    @classmethod
    def setup_class(cls):
        sys.path.insert(0, REF)
        import importlib

        cls.ref_diff = importlib.import_module("diffusion")

    def _pair(self, respacing=""):
        ref = self.ref_diff.create_diffusion(respacing)
        ours = create_diffusion(respacing)
        return ref, ours

    def test_coefficients_match(self):
        ref, ours = self._pair()
        for name in (
            "betas",
            "alphas_cumprod",
            "posterior_variance",
            "posterior_log_variance_clipped",
            "posterior_mean_coef1",
            "posterior_mean_coef2",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(ours, name)),
                getattr(ref, name).astype(np.float32),
                rtol=1e-5,
                atol=1e-7,
                err_msg=name,
            )

    def test_respaced_betas_match(self):
        ref, ours = self._pair("250")
        np.testing.assert_allclose(
            np.asarray(ours.betas), ref.betas.astype(np.float32), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(ours.timestep_map), ref.timestep_map)

    def test_training_losses_match(self):
        import torch

        ref, ours = self._pair()
        rng = np.random.default_rng(1)
        x0 = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
        noise = rng.normal(size=x0.shape).astype(np.float32)
        t = np.array([7, 900])

        ref_terms = ref.training_losses(
            lambda x, tt, **kw: torch.from_numpy(_fake_model_np(x.numpy(), tt)),
            torch.from_numpy(x0),
            torch.from_numpy(t),
            noise=torch.from_numpy(noise),
        )
        our_terms = ours.training_losses(
            lambda x, tt: jnp.asarray(_fake_model_np(np.asarray(x), tt)),
            jnp.asarray(x0),
            jnp.asarray(t),
            rng=jax.random.PRNGKey(0),
            noise=jnp.asarray(noise),
        )
        for k in ("mse", "vb", "loss"):
            np.testing.assert_allclose(
                np.asarray(our_terms[k]),
                ref_terms[k].numpy(),
                rtol=2e-4,
                atol=2e-5,
                err_msg=k,
            )

    def test_p_mean_variance_matches_respaced(self):
        import torch

        ref, ours = self._pair("50")
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
        t = np.array([0, 49])

        ref_out = ref.p_mean_variance(
            ref._wrap_model(
                lambda xx, tt, **kw: torch.from_numpy(_fake_model_np(xx.numpy(), tt))
            ),
            torch.from_numpy(x),
            torch.from_numpy(t),
            clip_denoised=False,
        )
        our_out = ours.p_mean_variance(
            lambda xx, tt: jnp.asarray(_fake_model_np(np.asarray(xx), tt)),
            jnp.asarray(x),
            jnp.asarray(t),
            clip_denoised=False,
        )
        for k in ("mean", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(our_out[k]),
                ref_out[k].numpy(),
                rtol=2e-4,
                atol=2e-5,
                err_msg=k,
            )

    def test_ddim_sample_matches(self):
        import torch

        ref, ours = self._pair("ddim25")
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
        t = np.array([13])
        ref_out = ref.ddim_sample(
            ref._wrap_model(
                lambda xx, tt, **kw: torch.from_numpy(_fake_model_np(xx.numpy(), tt))
            ),
            torch.from_numpy(x),
            torch.from_numpy(t),
            clip_denoised=False,
            eta=0.0,
        )
        our_out = ours.ddim_sample(
            lambda xx, tt: jnp.asarray(_fake_model_np(np.asarray(xx), tt)),
            jnp.asarray(x),
            jnp.asarray(t),
            rng=jax.random.PRNGKey(0),
            clip_denoised=False,
            eta=0.0,
        )
        # eta=0 => deterministic, rngs irrelevant
        np.testing.assert_allclose(
            np.asarray(our_out["sample"]),
            ref_out["sample"].numpy(),
            rtol=2e-4,
            atol=2e-5,
        )
