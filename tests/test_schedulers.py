"""Scheduler golden tests: our functional JAX schedulers vs the vendored
torch diffusers (numerical oracle), in the diffusers test idiom of full-loop
trajectory checks (/root/reference/diffusers/tests/schedulers/
test_scheduler_ddim.py:114-132)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rollingdepth_tpu.schedulers import (
    DDIMConfig,
    DDIMScheduler,
    DPMSolverConfig,
    DPMSolverMultistepScheduler,
    EulerAncestralConfig,
    EulerAncestralScheduler,
)


def toy_model_output(sample, t):
    # deterministic fake denoiser: mixes sample with a fixed pattern
    return 0.1 * sample + 0.01 * float(t)


@pytest.mark.parametrize("spacing", ["leading", "trailing", "linspace"])
@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("steps", [1, 10])
def test_ddim_matches_torch(torch_oracle, spacing, pred, steps):
    import torch
    from diffusers import DDIMScheduler as TorchDDIM

    kwargs = dict(
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        clip_sample=False,
        set_alpha_to_one=False,
        steps_offset=1,
        prediction_type=pred,
        timestep_spacing=spacing,
    )
    ref = TorchDDIM(**kwargs)
    ours = DDIMScheduler(DDIMConfig(**kwargs))

    ref.set_timesteps(steps)
    ts_ref = ref.timesteps.numpy()
    ts_ours = ours.timesteps(steps)
    np.testing.assert_array_equal(ts_ref, ts_ours)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 4, 8, 8).astype(np.float32)
    sample_t = torch.from_numpy(sample.copy())
    sample_j = jnp.asarray(sample)

    for t in ts_ours:
        out = toy_model_output(sample, t)
        prev_t = ref.step(torch.from_numpy(out), int(t), sample_t).prev_sample
        prev_j, _ = ours.step(jnp.asarray(out), int(t), sample_j, num_inference_steps=steps)
        np.testing.assert_allclose(np.asarray(prev_j), prev_t.numpy(), rtol=2e-5, atol=2e-5)
        sample_t = prev_t
        sample_j = prev_j
        sample = np.asarray(prev_j)


def test_ddim_add_noise_matches_torch(torch_oracle):
    import torch
    from diffusers import DDIMScheduler as TorchDDIM

    ref = TorchDDIM(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    ours = DDIMScheduler(DDIMConfig(beta_schedule="scaled_linear"))
    rng = np.random.RandomState(1)
    x0 = rng.randn(2, 4, 4, 4).astype(np.float32)
    noise = rng.randn(2, 4, 4, 4).astype(np.float32)
    t = np.array([999, 500], dtype=np.int64)
    ref_out = ref.add_noise(torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(t))
    our_out = ours.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("karras", [False, True])
@pytest.mark.parametrize("algo", ["dpmsolver++", "sde-dpmsolver++"])
def test_dpm_matches_torch(torch_oracle, karras, algo):
    import torch
    from diffusers import DPMSolverMultistepScheduler as TorchDPM

    kwargs = dict(
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        algorithm_type=algo,
        use_karras_sigmas=karras,
        steps_offset=1,
    )
    ref = TorchDPM(**kwargs)
    ours = DPMSolverMultistepScheduler(DPMSolverConfig(**kwargs))

    steps = 8
    ref.set_timesteps(steps)
    ts_ours, sigmas_ours = ours.schedule(steps)
    np.testing.assert_array_equal(ref.timesteps.numpy(), ts_ours)
    np.testing.assert_allclose(ref.sigmas.numpy(), sigmas_ours, rtol=1e-5, atol=1e-7)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 4, 8, 8).astype(np.float32)
    sample_t = torch.from_numpy(sample.copy())
    sample_j = jnp.asarray(sample)

    from rollingdepth_tpu.schedulers.dpmsolver import DPMState

    state = DPMState.init(sample.shape)
    for i, t in enumerate(ts_ours):
        out = toy_model_output(np.asarray(sample_j), t)
        # shared variance noise so torch and jax take the same SDE path
        noise = rng.randn(*sample.shape).astype(np.float32)
        prev_t = ref.step(
            torch.from_numpy(out), int(t), sample_t,
            variance_noise=torch.from_numpy(noise),
        ).prev_sample
        # inject identical noise by monkeypatching the normal draw
        import rollingdepth_tpu.schedulers.dpmsolver as dpm_mod

        orig_normal = jax.random.normal
        try:
            jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.asarray(noise)  # type: ignore
            prev_j, state = ours.step(
                jnp.asarray(out), i, sample_j, sigmas_ours, steps, state,
                rng=jax.random.PRNGKey(0),
            )
        finally:
            jax.random.normal = orig_normal
        np.testing.assert_allclose(
            np.asarray(prev_j), prev_t.numpy(), rtol=3e-4, atol=3e-5,
            err_msg=f"step {i} (t={t})",
        )
        sample_t = prev_t
        sample_j = prev_j


def test_euler_ancestral_matches_torch(torch_oracle):
    import torch
    from diffusers import EulerAncestralDiscreteScheduler as TorchEA

    kwargs = dict(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
                  beta_schedule="scaled_linear", steps_offset=1)
    ref = TorchEA(**kwargs)
    ours = EulerAncestralScheduler(EulerAncestralConfig(**kwargs))

    steps = 6
    ref.set_timesteps(steps)
    ts, sigmas = ours.schedule(steps)
    np.testing.assert_allclose(ref.timesteps.numpy(), ts, atol=1e-4)
    np.testing.assert_allclose(ref.sigmas.numpy(), sigmas, rtol=1e-5, atol=1e-7)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 4, 8, 8).astype(np.float32) * float(sigmas[0])
    sample_t = torch.from_numpy(sample.copy())
    sample_j = jnp.asarray(sample)

    for i in range(steps):
        scaled_t = ref.scale_model_input(sample_t, ref.timesteps[i])
        scaled_j = ours.scale_model_input(sample_j, jnp.float32(sigmas[i]))
        np.testing.assert_allclose(np.asarray(scaled_j), scaled_t.numpy(), rtol=1e-5, atol=1e-6)
        out = toy_model_output(np.asarray(scaled_j), ts[i])
        noise = rng.randn(*sample.shape).astype(np.float32)

        class _G:
            pass

        # torch: feed identical noise via generator-free monkeypatch
        import diffusers.schedulers.scheduling_euler_ancestral_discrete as ea_mod

        orig = ea_mod.randn_tensor
        ea_mod.randn_tensor = lambda shape, dtype=None, device=None, generator=None: torch.from_numpy(noise)
        try:
            prev_t = ref.step(torch.from_numpy(out), ref.timesteps[i], sample_t).prev_sample
        finally:
            ea_mod.randn_tensor = orig

        orig_normal = jax.random.normal
        try:
            jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.asarray(noise)  # type: ignore
            prev_j, _ = ours.step(jnp.asarray(out), i, sample_j, sigmas, jax.random.PRNGKey(0))
        finally:
            jax.random.normal = orig_normal

        np.testing.assert_allclose(np.asarray(prev_j), prev_t.numpy(), rtol=2e-4, atol=2e-5)
        sample_t = prev_t
        sample_j = prev_j


def test_presets():
    from rollingdepth_tpu import resolve_preset

    fast = resolve_preset("fast")
    assert fast.dilations == [1, 25] and fast.refine_step == 0 and fast.res == 768
    paper = resolve_preset("paper")
    assert paper.dtype == "fp32" and not paper.cap_dilation and paper.refine_step == 10
    full = resolve_preset("full", {"res": 768})
    assert full.res == 768 and full.dilations == [1, 10, 25]


def test_euler_ancestral_zero_snr_sigmas_finite(torch_oracle):
    """rescale_betas_zero_snr makes the terminal alphas_cumprod exactly 0;
    diffusers patches it to 2**-24 (scheduling_euler_ancestral_discrete.py:204)
    so sigma[0] is finite.  Regression: the patch was missing here and every
    step output was NaN."""
    from diffusers import EulerAncestralDiscreteScheduler as TorchEA

    kwargs = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="linear")
    ours = EulerAncestralScheduler(
        EulerAncestralConfig(rescale_betas_zero_snr=True, **kwargs)
    )
    timesteps, sigmas = ours.schedule(10)
    assert np.isfinite(sigmas).all(), sigmas

    ref = TorchEA(rescale_betas_zero_snr=True, **kwargs)
    ref.set_timesteps(10)
    np.testing.assert_allclose(
        sigmas, ref.sigmas.numpy().astype(np.float32), rtol=1e-5, atol=1e-6
    )


def test_dpm_non_pp_rejects_zero_final_sigma():
    """final_sigmas_type='zero' (default) with the non-++ algorithms would
    make the last update 0*inf=NaN; diffusers raises the same ValueError
    (scheduling_dpmsolver_multistep.py:267-269)."""
    import pytest as _pytest

    for algo in ("dpmsolver", "sde-dpmsolver"):
        with _pytest.raises(ValueError, match="final_sigmas_type"):
            DPMSolverMultistepScheduler(DPMSolverConfig(algorithm_type=algo))
    # sigma_min is the supported combination
    DPMSolverMultistepScheduler(
        DPMSolverConfig(algorithm_type="dpmsolver", final_sigmas_type="sigma_min")
    )
