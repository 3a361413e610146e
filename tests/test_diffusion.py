"""Golden tests: scan-based samplers vs a straightforward numpy step loop.

The numpy loop re-derives the reference equations (ddim.py:165-204,
plms.py:119-236) independently; the jitted scan must match it to fp32
accuracy. This pins scan ordering, schedule indexing, and CFG math.
"""
import jax
import jax.numpy as jnp
import numpy as np

from celebbasis_tpu.diffusion import ddpm
from celebbasis_tpu.diffusion.sampler import (SamplerConfig, ddim_sample,
                                              plms_sample)
from celebbasis_tpu.diffusion.schedules import (make_ddim_schedule,
                                                make_schedule)
import pytest

SHAPE = (2, 4, 4, 3)


def _toy_eps_model():
    """A deterministic, time-dependent linear eps model (pure numpy/jnp)."""
    rng = np.random.default_rng(0)
    W = rng.standard_normal((3, 3)).astype(np.float32) * 0.2

    # per-example conditioning term: must not mix across the CFG-doubled batch
    def eps_np(x, t, ctx):
        return np.tanh(x @ W) * (1.0 + t.reshape(-1, 1, 1, 1) / 1000.0) \
            + 0.01 * ctx.mean(axis=(1, 2)).reshape(-1, 1, 1, 1)

    def eps_jnp(x, t, ctx):
        return jnp.tanh(x @ W) * (1.0 + t.reshape(-1, 1, 1, 1) / 1000.0) \
            + 0.01 * ctx.mean(axis=(1, 2)).reshape(-1, 1, 1, 1)

    return eps_np, eps_jnp


def _numpy_ddim(eps_np, ddim, x, cond, uncond, scale):
    """Reference-equation DDIM loop in plain numpy, descending time."""
    S = ddim.num_steps
    for i in range(S - 1, -1, -1):
        t = np.full((x.shape[0],), ddim.timesteps[i], np.int64)
        e_u = eps_np(x, t, uncond)
        e_c = eps_np(x, t, cond)
        e = e_u + scale * (e_c - e_u)
        a_t, a_prev = ddim.alphas[i], ddim.alphas_prev[i]
        sqrt_oma = ddim.sqrt_one_minus_alphas[i]
        pred_x0 = (x - sqrt_oma * e) / np.sqrt(a_t)
        dir_xt = np.sqrt(1.0 - a_prev) * e
        x = np.sqrt(a_prev) * pred_x0 + dir_xt
    return x


def test_ddim_matches_numpy_loop():
    sched = make_schedule()
    ddim = make_ddim_schedule(sched, 10, eta=0.0)
    eps_np, eps_jnp = _toy_eps_model()

    rng = jax.random.key(42)
    x_T = np.asarray(jax.random.normal(rng, SHAPE), np.float32)
    cond = np.ones((2, 5, 8), np.float32)
    uncond = np.zeros((2, 5, 8), np.float32)

    ref = _numpy_ddim(eps_np, ddim, x_T.copy(), cond, uncond, scale=7.5)

    got = jax.jit(lambda xT: ddim_sample(
        eps_jnp, ddim, rng=jax.random.key(7), shape=SHAPE,
        cond=jnp.asarray(cond), uncond=jnp.asarray(uncond),
        cfg=SamplerConfig(guidance_scale=7.5, eta=0.0),
        x_T=xT))(jnp.asarray(x_T))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.smoke
def test_ddim_deterministic_eta0():
    sched = make_schedule()
    ddim = make_ddim_schedule(sched, 5, eta=0.0)
    _, eps_jnp = _toy_eps_model()
    f = jax.jit(lambda k: ddim_sample(eps_jnp, ddim, rng=k, shape=SHAPE,
                                      cond=jnp.ones((2, 5, 8)),
                                      cfg=SamplerConfig(guidance_scale=1.0)))
    a = f(jax.random.key(0))
    b = f(jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = f(jax.random.key(1))
    assert not np.allclose(a, c)


def test_plms_matches_numpy_loop():
    sched = make_schedule()
    ddim = make_ddim_schedule(sched, 6, eta=0.0)
    eps_np, eps_jnp = _toy_eps_model()

    def x_prev(x, e, i):
        a_t, a_prev = ddim.alphas[i], ddim.alphas_prev[i]
        sqrt_oma = ddim.sqrt_one_minus_alphas[i]
        pred_x0 = (x - sqrt_oma * e) / np.sqrt(a_t)
        return np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * e

    rng = jax.random.key(3)
    x = np.asarray(jax.random.normal(rng, SHAPE), np.float32)
    x0 = x.copy()
    cond = np.ones((2, 5, 8), np.float32)
    old = []
    S = ddim.num_steps
    for n, i in enumerate(range(S - 1, -1, -1)):
        t = np.full((2,), ddim.timesteps[i], np.int64)
        t_next = np.full((2,), ddim.timesteps[i - 1] if i > 0 else 0, np.int64)
        e = eps_np(x, t, cond)
        if n == 0:
            e_next = eps_np(x_prev(x, e, i), t_next, cond)
            ep = (e + e_next) / 2
        elif n == 1:
            ep = (3 * e - old[-1]) / 2
        elif n == 2:
            ep = (23 * e - 16 * old[-1] + 5 * old[-2]) / 12
        else:
            ep = (55 * e - 59 * old[-1] + 37 * old[-2] - 9 * old[-3]) / 24
        x = x_prev(x, ep, i)
        old.append(e)

    got = jax.jit(lambda xT: plms_sample(
        eps_jnp, ddim, rng=jax.random.key(9), shape=SHAPE,
        cond=jnp.asarray(cond), cfg=SamplerConfig(guidance_scale=1.0),
        x_T=xT))(jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-4)


def _numpy_ddpm(eps_np, sched, x, cond, uncond, scale, clip=True):
    """Reference-equation ancestral loop (ddpm.py:830-880), noise-free."""
    for t in range(sched.num_timesteps - 1, -1, -1):
        tb = np.full((x.shape[0],), t, np.int64)
        e_u = eps_np(x, tb, uncond)
        e_c = eps_np(x, tb, cond)
        e = e_u + scale * (e_c - e_u)
        x0 = (sched.sqrt_recip_alphas_cumprod[t] * x
              - sched.sqrt_recipm1_alphas_cumprod[t] * e)
        if clip:
            x0 = np.clip(x0, -1.0, 1.0)
        x = (sched.posterior_mean_coef1[t] * x0
             + sched.posterior_mean_coef2[t] * x)
    return x.astype(np.float32)


def test_ddpm_ancestral_matches_numpy_loop():
    from celebbasis_tpu.diffusion.sampler import ddpm_sample
    sched = make_schedule(n_timestep=20)
    eps_np, eps_jnp = _toy_eps_model()
    rng = jax.random.key(3)
    x_T = np.asarray(jax.random.normal(rng, SHAPE), np.float32)
    cond = np.ones((2, 5, 8), np.float32)
    uncond = np.zeros((2, 5, 8), np.float32)

    # temperature=0 removes the posterior noise -> exact numpy comparison
    ref = _numpy_ddpm(eps_np, sched, x_T.copy(), cond, uncond, scale=4.0)
    got = jax.jit(lambda xT: ddpm_sample(
        eps_jnp, sched, rng=jax.random.key(9), shape=SHAPE,
        cond=jnp.asarray(cond), uncond=jnp.asarray(uncond),
        cfg=SamplerConfig(guidance_scale=4.0, temperature=0.0),
        x_T=xT))(jnp.asarray(x_T))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_ddpm_ancestral_stochastic_and_progressive():
    from celebbasis_tpu.diffusion.sampler import ddpm_sample
    sched = make_schedule(n_timestep=20)
    _, eps_jnp = _toy_eps_model()
    f = jax.jit(lambda k: ddpm_sample(
        eps_jnp, sched, rng=k, shape=SHAPE, cond=jnp.ones((2, 5, 8)),
        cfg=SamplerConfig(guidance_scale=1.0)))
    a, b, c = f(jax.random.key(0)), f(jax.random.key(0)), f(jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(a, c)   # posterior noise varies with the key
    # progressive mode: one x̂0 snapshot per 5-step segment
    x, x0s = ddpm_sample(eps_jnp, sched, rng=jax.random.key(0), shape=SHAPE,
                         cond=jnp.ones((2, 5, 8)),
                         cfg=SamplerConfig(guidance_scale=1.0),
                         return_x0_every=5)
    assert x.shape == SHAPE and x0s.shape == (4,) + SHAPE
    # eager segmented scan vs the jitted single scan: same chain, fp32 fuzz
    np.testing.assert_allclose(np.asarray(x), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.smoke
def test_q_sample_and_reconstruct():
    sched = make_schedule()
    arrs = ddpm.ScheduleArrays.from_schedule(sched)
    x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 4))
    noise = jax.random.normal(jax.random.key(1), x0.shape)
    t = jnp.array([0, 100, 500, 999])
    x_t = ddpm.q_sample(arrs, x0, t, noise)
    x0_rec = ddpm.predict_x0_from_eps(arrs, x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.smoke
def test_schedule_values():
    """Pin the schedule numerics to the SD v1 constants."""
    sched = make_schedule()
    assert sched.num_timesteps == 1000
    np.testing.assert_allclose(sched.betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(sched.betas[-1], 0.0120, rtol=1e-6)
    # sqrt-space interpolation, not linear in beta
    mid = (0.00085 ** 0.5 + 0.012 ** 0.5) / 2
    np.testing.assert_allclose(sched.betas[499],
                               np.linspace(0.00085**0.5, 0.012**0.5, 1000)[499]**2)
    ddim = make_ddim_schedule(sched, 50)
    assert ddim.timesteps[0] == 1 and ddim.timesteps[-1] == 981
    assert ddim.num_steps == 50


def test_per_sample_keys_batch_independent():
    """(B,) rng keys: each row's output depends only on its own key — a
    sample's pixels must not change with batch position or co-batched
    neighbours (the serving batcher's determinism contract), for both
    eta=0 and the eta>0 step-noise path, and for PLMS."""
    sched = make_schedule()
    _, eps_jnp = _toy_eps_model()
    cond3 = jnp.ones((3, 5, 8))
    cond2 = jnp.ones((2, 5, 8))
    for sampler, eta in ((ddim_sample, 0.0), (ddim_sample, 1.0),
                        (plms_sample, 0.0)):
        ddim = make_ddim_schedule(sched, 5, eta=eta)
        cfg = SamplerConfig(guidance_scale=1.0, eta=eta)
        keys = jax.vmap(jax.random.key)(jnp.arange(3, dtype=jnp.uint32))
        out3 = np.asarray(sampler(eps_jnp, ddim, rng=keys,
                                  shape=(3,) + SHAPE[1:], cond=cond3,
                                  cfg=cfg))
        # same key 1, different position + different neighbours
        keys2 = jax.vmap(jax.random.key)(jnp.asarray([9, 1], jnp.uint32))
        out2 = np.asarray(sampler(eps_jnp, ddim, rng=keys2,
                                  shape=(2,) + SHAPE[1:], cond=cond2,
                                  cfg=cfg))
        np.testing.assert_array_equal(out2[1], out3[1])
        assert not np.allclose(out3[0], out3[1])   # distinct keys differ
