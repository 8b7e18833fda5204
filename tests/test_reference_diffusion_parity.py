"""End-to-end diffusion parity against the reference's own diffusion package.

The reference's ``diffusion/`` is pure numpy/torch (no CUDA kernels), so it
imports here and serves as the oracle (SURVEY.md §4.3).  With a shared
deterministic denoiser and identical initial noise, the eta=0 DDIM chain is
fully deterministic -- trajectories must agree to fp32 tolerance, which is
exactly the BASELINE.json north star (DDIM pixel MAE < 1e-3).  p_mean_variance
is compared pointwise across the respaced DDPM chain as well (covers
respacing, learned-range variance, posterior coefficients).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
    from diffusion import create_diffusion as ref_create_diffusion
except Exception:  # reference not mounted
    ref_create_diffusion = None

from diffma_tpu.diffusion import create_diffusion

pytestmark = pytest.mark.skipif(
    ref_create_diffusion is None, reason="reference repo not mounted"
)

SHAPE = (2, 8, 7, 7)  # learn_sigma model: 2*4 output channels


def _tol(base):
    """TPU fp32 transcendentals (exp/log/tanh) are approximated; vs torch CPU
    the chains accumulate ~5e-4 absolute, amplified to ~1e-3 relative where
    pred_xstart divides by sqrt(alpha_cum) ~ 1e-2 at the chain end.  The
    <1e-3 DDIM MAE north star stays strict."""
    return base if jax.default_backend() != "tpu" else 2e-3


def _model_jax(x, t, **kw):
    """Deterministic toy denoiser, 8-channel (eps + raw variance)."""
    tt = (t.astype(jnp.float32) / 100.0)[:, None, None, None]
    eps = jnp.tanh(x) * (1.0 + 0.1 * tt)
    var = jnp.sin(x + tt)
    return jnp.concatenate([eps, var], axis=1)


def _model_torch(x, t, **kw):
    tt = (t.float() / 100.0)[:, None, None, None]
    eps = torch.tanh(x) * (1.0 + 0.1 * tt)
    var = torch.sin(x + tt)
    return torch.cat([eps, var], dim=1)


def _x0():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 4, 7, 7)).astype(np.float32)


def test_ddim_chain_matches_reference():
    steps = "ddim10"
    ours = create_diffusion(steps)
    ref = ref_create_diffusion(steps)
    z = _x0()

    got = ours.ddim_sample_loop(
        _model_jax, z.shape[:1] + (4, 7, 7), jax.random.PRNGKey(0),
        noise=jnp.asarray(z), clip_denoised=False, eta=0.0,
    )
    want = ref.ddim_sample_loop(
        _model_torch, z.shape[:1] + (4, 7, 7), noise=torch.from_numpy(z),
        clip_denoised=False, eta=0.0, device="cpu",
    )
    mae = np.abs(np.asarray(got) - want.numpy()).mean()
    assert mae < 1e-3, f"DDIM pixel MAE {mae} vs north star 1e-3"
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=_tol(1e-4), atol=_tol(1e-4)
    )


def _cond_jax(x, t, **kw):
    """Synthetic grad(log p(y|x)) — deterministic, timestep-dependent."""
    return 0.05 * jnp.cos(x) * (1.0 + t.astype(jnp.float32) / 50.0)[:, None, None, None]


def _cond_torch(x, t, **kw):
    return 0.05 * torch.cos(x) * (1.0 + t.float() / 50.0)[:, None, None, None]


def test_ddim_cond_fn_chain_matches_reference():
    """condition_score in the DDIM path (gaussian_diffusion.py:536-537,
    respace.py:102-103 remap) — eta=0 keeps the chain deterministic."""
    steps = "ddim10"
    ours = create_diffusion(steps)
    ref = ref_create_diffusion(steps)
    z = _x0()

    got = ours.ddim_sample_loop(
        _model_jax, z.shape[:1] + (4, 7, 7), jax.random.PRNGKey(0),
        noise=jnp.asarray(z), clip_denoised=False, cond_fn=_cond_jax, eta=0.0,
    )
    # model_kwargs={} explicitly: the reference's condition_score does
    # ``**model_kwargs`` without a None guard (gaussian_diffusion.py:369).
    want = ref.ddim_sample_loop(
        _model_torch, z.shape[:1] + (4, 7, 7), noise=torch.from_numpy(z),
        clip_denoised=False, cond_fn=_cond_torch, eta=0.0, device="cpu",
        model_kwargs={},
    )
    mae = np.abs(np.asarray(got) - want.numpy()).mean()
    assert mae < 1e-3, f"conditioned DDIM pixel MAE {mae}"


def test_condition_mean_and_score_match_reference_pointwise():
    """Both conditioning strategies, respaced so the t-remap in cond_fn is
    exercised (reference wraps cond_fn too, respace.py:99-103)."""
    ours = create_diffusion("25")
    ref = ref_create_diffusion("25")
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 7, 7)).astype(np.float32)
    t = np.array([3, 20], np.int64)

    got_pmv = ours.p_mean_variance(
        _model_jax, jnp.asarray(x), jnp.asarray(t), clip_denoised=False
    )
    want_pmv = ref.p_mean_variance(
        _model_torch, torch.from_numpy(x), torch.from_numpy(t), clip_denoised=False
    )

    got_mean = ours.condition_mean(
        _cond_jax, got_pmv, jnp.asarray(x), jnp.asarray(t)
    )
    want_mean = ref.condition_mean(
        _cond_torch, want_pmv, torch.from_numpy(x), torch.from_numpy(t),
        model_kwargs={},
    )
    np.testing.assert_allclose(
        np.asarray(got_mean), want_mean.numpy(), rtol=_tol(2e-5), atol=_tol(2e-5)
    )

    got_s = ours.condition_score(_cond_jax, got_pmv, jnp.asarray(x), jnp.asarray(t))
    want_s = ref.condition_score(
        _cond_torch, want_pmv, torch.from_numpy(x), torch.from_numpy(t),
        model_kwargs={},
    )
    for k in ("mean", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(got_s[k]), want_s[k].numpy(),
            rtol=_tol(2e-5), atol=_tol(2e-5), err_msg=k,
        )


def test_progressive_loops_match_reference_generators():
    """Stacked lax.scan intermediates == the reference's yielded dicts
    (gaussian_diffusion.py:464-511,633-680), for the deterministic DDIM case
    and for DDPM pred_xstart (noise-free quantity) per step."""
    steps = "ddim10"
    ours = create_diffusion(steps)
    ref = ref_create_diffusion(steps)
    z = _x0()

    got = ours.ddim_sample_loop_progressive(
        _model_jax, z.shape[:1] + (4, 7, 7), jax.random.PRNGKey(0),
        noise=jnp.asarray(z), clip_denoised=False, eta=0.0,
    )
    want = list(
        ref.ddim_sample_loop_progressive(
            _model_torch, z.shape[:1] + (4, 7, 7), noise=torch.from_numpy(z),
            clip_denoised=False, eta=0.0, device="cpu",
        )
    )
    assert got["sample"].shape[0] == len(want) == ours.num_timesteps
    for i in (0, len(want) // 2, len(want) - 1):
        for k in ("sample", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(got[k][i]), want[i][k].numpy(),
                rtol=_tol(5e-4), atol=_tol(5e-4), err_msg=f"step {i} {k}",
            )
    np.testing.assert_array_equal(
        np.asarray(got["final"]), np.asarray(got["sample"][-1])
    )

    # DDPM progressive: compare pred_xstart at step 0 (before any sampled
    # noise enters the trajectory).
    got_p = ours.p_sample_loop_progressive(
        _model_jax, z.shape[:1] + (4, 7, 7), jax.random.PRNGKey(0),
        noise=jnp.asarray(z), clip_denoised=False,
    )
    gen = ref.p_sample_loop_progressive(
        _model_torch, z.shape[:1] + (4, 7, 7), noise=torch.from_numpy(z),
        clip_denoised=False, device="cpu",
    )
    first = next(gen)
    gen.close()
    np.testing.assert_allclose(
        np.asarray(got_p["pred_xstart"][0]), first["pred_xstart"].numpy(),
        rtol=_tol(5e-4), atol=_tol(5e-4),
    )


@pytest.mark.parametrize("respacing", ["", "25"])
def test_p_mean_variance_matches_reference(respacing):
    ours = create_diffusion(respacing)
    ref = ref_create_diffusion(respacing)
    assert ours.num_timesteps == ref.num_timesteps

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 7, 7)).astype(np.float32)
    for t_val in [0, 1, ours.num_timesteps // 2, ours.num_timesteps - 1]:
        t = np.full((2,), t_val, np.int64)
        got = ours.p_mean_variance(
            _model_jax, jnp.asarray(x), jnp.asarray(t), clip_denoised=False
        )
        want = ref.p_mean_variance(
            _model_torch, torch.from_numpy(x), torch.from_numpy(t),
            clip_denoised=False,
        )
        for k in ("mean", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(got[k]), want[k].numpy(),
                rtol=_tol(2e-5), atol=_tol(2e-5),
                err_msg=f"{k} @ t={t_val} respacing={respacing!r}",
            )


def test_training_losses_match_reference():
    ours = create_diffusion("")
    ref = ref_create_diffusion("")
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((2, 4, 7, 7)).astype(np.float32)
    noise = rng.standard_normal((2, 4, 7, 7)).astype(np.float32)
    t = np.array([3, 700], np.int64)

    got = ours.training_losses(
        _model_jax, jnp.asarray(x0), jnp.asarray(t), jax.random.PRNGKey(0),
        noise=jnp.asarray(noise),
    )
    want = ref.training_losses(
        _model_torch, torch.from_numpy(x0), torch.from_numpy(t),
        noise=torch.from_numpy(noise),
    )
    for k in ("loss", "mse", "vb"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=_tol(3e-5), atol=_tol(3e-5),
            err_msg=k,
        )


def test_ddim_reverse_sample_matches_reference_pointwise():
    """Forward-ODE step (gaussian_diffusion.py:562-598), respaced so the
    alphas_cumprod_next table and t-remap are exercised; with and without
    the cond_fn branch (:585-586)."""
    ours = create_diffusion("25")
    ref = ref_create_diffusion("25")
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 4, 7, 7)).astype(np.float32)
    # include t = T-1 (alphas_cumprod_next == 0.0 edge) and t = 0
    for tvals in ([0, 12], [20, 24]):
        t = np.array(tvals, np.int64)
        for cond_jax, cond_torch in ((None, None), (_cond_jax, _cond_torch)):
            got = ours.ddim_reverse_sample(
                _model_jax, jnp.asarray(x), jnp.asarray(t),
                clip_denoised=False, cond_fn=cond_jax,
            )
            want = ref.ddim_reverse_sample(
                _model_torch, torch.from_numpy(x), torch.from_numpy(t),
                clip_denoised=False, cond_fn=cond_torch,
                model_kwargs={} if cond_torch is not None else None,
            )
            for k in ("sample", "pred_xstart"):
                np.testing.assert_allclose(
                    np.asarray(got[k]), want[k].numpy(),
                    rtol=_tol(2e-5), atol=_tol(2e-5),
                    err_msg=f"{k} t={tvals} cond={cond_jax is not None}",
                )


def test_calc_bpd_loop_matches_reference():
    """Full VLB loop (gaussian_diffusion.py:808-861): total_bpd/prior_bpd and
    the [N, T] vb/xstart_mse/mse stacks incl. their t-descending column
    order.  Identical per-step q_sample noise is injected on both sides (ours
    via the explicit ``noise`` arg; the reference by patching th.randn_like,
    which calc_bpd_loop calls once per step, t = T-1 .. 0)."""
    ours = create_diffusion("25")
    ref = ref_create_diffusion("25")
    T = ours.num_timesteps
    assert T == 25
    rng = np.random.default_rng(13)
    x0 = rng.standard_normal((2, 4, 7, 7)).astype(np.float32)
    noise_seq = rng.standard_normal((T,) + x0.shape).astype(np.float32)

    got = ours.calc_bpd_loop(
        _model_jax, jnp.asarray(x0), jax.random.PRNGKey(0),
        clip_denoised=False, noise=jnp.asarray(noise_seq),
    )

    calls = {"i": 0}

    def _fake_randn_like(t, **kw):
        out = torch.from_numpy(noise_seq[calls["i"]])
        calls["i"] += 1
        return out

    real = torch.randn_like
    torch.randn_like = _fake_randn_like
    try:
        want = ref.calc_bpd_loop(
            _model_torch, torch.from_numpy(x0), clip_denoised=False
        )
    finally:
        torch.randn_like = real
    assert calls["i"] == T

    for k in ("total_bpd", "prior_bpd", "vb", "xstart_mse", "mse"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(),
            rtol=_tol(3e-5), atol=_tol(3e-5), err_msg=k,
        )
