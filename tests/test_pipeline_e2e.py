"""Minimum end-to-end slice: cleaner(stub) -> ControlLDM -> sampler -> decode.

CPU-runnable tiny config; checks shapes, dtype, determinism, and that the
sampler/CFG/noise-aug paths all execute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.pipeline import IdentityCleanerPipeline
from diffbir_tpu.schedule import Schedule


@pytest.fixture(scope="module")
def tiny_pipe():
    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), (8, 8)
    )
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    return IdentityCleanerPipeline(
        None, cldm, params, schedule, tokenizer=None, min_cond_size=64
    )


def test_e2e_spaced(tiny_pipe):
    lq = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    out = tiny_pipe.run(lq, steps=3, cfg_scale=2.0, sampler_type="spaced", seed=7)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    # deterministic for a fixed seed
    out2 = tiny_pipe.run(lq, steps=3, cfg_scale=2.0, sampler_type="spaced", seed=7)
    np.testing.assert_array_equal(out, out2)
    # different seed changes the sample
    out3 = tiny_pipe.run(lq, steps=3, cfg_scale=2.0, sampler_type="spaced", seed=8)
    assert np.any(out3 != out)


def test_e2e_ddim_no_cfg(tiny_pipe):
    lq = np.random.default_rng(1).integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    out = tiny_pipe.run(
        lq, steps=4, cfg_scale=1.0, sampler_type="ddim",
        start_point_type="cond", noise_aug=10,
    )
    assert out.shape == (2, 64, 64, 3)


def test_e2e_nonsquare_padding(tiny_pipe):
    # 72x96 -> cleaner keeps size (>=64), pad to 128x128 multiples of 64 inside
    lq = np.random.default_rng(2).integers(0, 255, (1, 72, 96, 3), dtype=np.uint8)
    out = tiny_pipe.run(lq, steps=2, cfg_scale=1.5, sampler_type="spaced")
    assert out.shape == (1, 72, 96, 3)


def test_e2e_size_bucket_cond_padding(tiny_pipe):
    """size_bucket pads the COND image (stage-2 compile shape), not the LQ
    by the bucket (which under an upscaling cleaner would inflate the
    diffusion cost by upscale^2 — the on-chip fidelity dry-run OOM)."""
    lq = np.random.default_rng(3).integers(0, 255, (1, 72, 96, 3), dtype=np.uint8)
    # LQ pads x64 -> 128x128 cond; bucket 96 -> stage-2 runs at 192x192
    out = tiny_pipe.run(
        lq, steps=2, cfg_scale=1.5, sampler_type="spaced", size_bucket=96
    )
    assert out.shape == (1, 72, 96, 3)
    # bucket-aligned input is a no-op pad and keeps exact shapes
    lq2 = np.random.default_rng(4).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    out2 = tiny_pipe.run(
        lq2, steps=2, cfg_scale=1.5, sampler_type="spaced", size_bucket=64
    )
    assert out2.shape == (1, 64, 64, 3)


def test_bsrnet_pipeline_upscale8():
    """BASELINE config 4 shape: x4 SR cleaner + upscale-8 output (tiny)."""
    from diffbir_tpu.models.bsrnet import RRDBNet
    from diffbir_tpu.pipeline import BSRNetPipeline

    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (8, 8))
    schedule = Schedule.create(timesteps=50)
    rrdb = RRDBNet(nf=8, nb=1, gc=4, sf=4)
    rp = jax.jit(rrdb.init)(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    pipe = BSRNetPipeline(
        cleaner_apply=jax.jit(lambda x: jnp.clip(rrdb.apply(rp, x), 0, 1)),
        cldm=cldm, params=params, schedule=schedule, upscale=8.0,
        min_cond_size=64,
    )
    lq = np.random.default_rng(0).integers(0, 255, (1, 16, 16, 3), dtype=np.uint8)
    out = pipe.run(lq, steps=2, cfg_scale=1.0, sampler_type="spaced")
    assert out.shape == (1, 128, 128, 3)  # 16 * 8


def test_bsrnet_size_bucket_does_not_inflate_cond():
    """Under an upscaling cleaner the bucket must pad the COND, not the LQ:
    LQ-side bucketing multiplies the pad by the upscale (the fidelity
    dry-run OOM — a 512-bucketed LQ became a 2560x2048 condition). The
    observable contract: stage-2 sees the x64-LQ-derived cond (256x256
    here), never an lq-bucket-inflated one (512x512 under the old
    semantics), and the output crops back to the original aspect."""
    from diffbir_tpu.models.bsrnet import RRDBNet
    from diffbir_tpu.pipeline import BSRNetPipeline

    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (8, 8))
    schedule = Schedule.create(timesteps=50)
    rrdb = RRDBNet(nf=8, nb=1, gc=4, sf=4)
    rp = jax.jit(rrdb.init)(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    pipe = BSRNetPipeline(
        cleaner_apply=jax.jit(lambda x: jnp.clip(rrdb.apply(rp, x), 0, 1)),
        cldm=cldm, params=params, schedule=schedule, upscale=4.0,
        min_cond_size=64,
    )
    seen = []
    orig = pipe.apply_cldm

    def spy(cond_img, *a, **k):
        seen.append(tuple(cond_img.shape[1:3]))
        return orig(cond_img, *a, **k)

    pipe.apply_cldm = spy
    lq = np.random.default_rng(5).integers(0, 255, (1, 18, 21, 3), dtype=np.uint8)
    out = pipe.run(lq, steps=2, cfg_scale=1.0, sampler_type="spaced",
                   size_bucket=128)
    # LQ 18x21 pads x64 -> 64x64; cond = 256x256; bucket 128 -> no pad.
    # Old LQ-side semantics would have padded the LQ to 128x128 -> cond
    # 512x512 (4x the stage-2 pixels).
    assert seen == [(256, 256)]
    # output crops back to the original aspect: 18*4 x 21*4
    assert out.shape == (1, 72, 84, 3)


def test_scunet_pipeline_denoise():
    from diffbir_tpu.models.scunet import SCUNet
    from diffbir_tpu.pipeline import SCUNetPipeline

    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (8, 8))
    schedule = Schedule.create(timesteps=50)
    scu = SCUNet(config=(1, 1, 1, 1, 1, 1, 1), dim=64)
    sp = jax.jit(scu.init)(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    pipe = SCUNetPipeline(
        cleaner_apply=jax.jit(lambda x: jnp.clip(scu.apply(sp, x), 0, 1)),
        cldm=cldm, params=params, schedule=schedule, min_cond_size=64,
    )
    lq = np.random.default_rng(1).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    out = pipe.run(lq, steps=2, cfg_scale=1.0, sampler_type="spaced")
    assert out.shape == (1, 64, 64, 3)


def test_turbo_control_interval(tiny_pipe):
    """interval=1 turbo must equal the plain path exactly; interval=3 runs
    and differs only slightly (cached ControlNet residuals)."""
    lq = np.random.default_rng(5).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    base = tiny_pipe.run(lq, steps=4, cfg_scale=2.0, sampler_type="spaced", seed=9)
    same = tiny_pipe.run(
        lq, steps=4, cfg_scale=2.0, sampler_type="spaced", seed=9, control_interval=1
    )
    np.testing.assert_array_equal(base, same)
    turbo = tiny_pipe.run(
        lq, steps=4, cfg_scale=2.0, sampler_type="spaced", seed=9, control_interval=2
    )
    assert turbo.shape == base.shape
    # at init the ControlNet residuals are ~zero-ish after the +0.01 perturb?
    # outputs stay finite and close in scale
    assert np.all(np.isfinite(turbo.astype(np.float32)))

    # the other stateful-scan samplers + turbo also run
    for s in ("ddim", "edm_dpm++_2m_sde", "edm_euler_a"):
        turbo_s = tiny_pipe.run(
            lq, steps=4, cfg_scale=2.0, sampler_type=s, seed=9, control_interval=2
        )
        assert turbo_s.shape == base.shape
        assert np.all(np.isfinite(turbo_s.astype(np.float32)))


def test_turbo_encoder_caching(tiny_pipe):
    out = tiny_pipe.run(
        lq=np.random.default_rng(6).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8),
        steps=4, cfg_scale=2.0, sampler_type="spaced", seed=9,
        control_interval=2, turbo_encoder=True,
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(out.astype(np.float32)))


def test_turbo_with_x8_padded_latent(tiny_pipe):
    """Regression: vae_encoder_tiled pads the condition to x8 only, so the
    UNet latent gets padded to x8 inside generate(); the turbo cache buffers
    must be built at the PADDED size or the scan carry mismatches."""
    lq = np.random.default_rng(3).integers(0, 255, (1, 72, 88, 3), dtype=np.uint8)
    out = tiny_pipe.run(
        lq, steps=4, cfg_scale=2.0, sampler_type="spaced",
        vae_encoder_tiled=True, vae_encoder_tile_size=64,
        control_interval=2,
    )
    assert out.shape == (1, 72, 88, 3)


def test_batch_sync_gn_decoder_falls_back(tiny_pipe):
    """Regression: sync_gn VAE tiling is batch-1 only; a batch-2 run with a
    tiled DECODER must fall back to blend instead of tripping the assert."""
    lq = np.random.default_rng(4).integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    out = tiny_pipe.run(
        lq, steps=2, cfg_scale=1.5, sampler_type="spaced",
        vae_decoder_tiled=True, vae_decoder_tile_size=32,
        vae_tile_mode="sync_gn",
    )
    assert out.shape == (2, 64, 64, 3)


def test_e2e_dpm_adaptive(tiny_pipe):
    """--sampler edm_dpm_adaptive through the FULL jitted pipeline (VERDICT r3
    weak #6): the PID step-size controller runs as a lax.while_loop inside
    generate(); steps only sets the sigma range."""
    lq = np.random.default_rng(5).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    out = tiny_pipe.run(
        lq, steps=4, cfg_scale=2.0, sampler_type="edm_dpm_adaptive",
        order=3, eta=0.0, seed=11,
    )
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    assert np.all(np.isfinite(out.astype(np.float32)))


def test_e2e_token_cap_auto_tiles(tiny_pipe, monkeypatch, capsys):
    """Above DIFFBIR_TPU_MAX_COND_TOKENS the diffusion auto-switches to
    per-step latent tiling (serving-envelope cap: the 81920-token single
    program deterministically killed the axon TPU worker during remote
    compile — r4b + r5 fidelity dry-runs; STRESS_FLASH.json clears every
    component shape in isolation)."""
    lq = np.random.default_rng(3).integers(0, 255, (1, 128, 128, 3), dtype=np.uint8)
    base = tiny_pipe.run(lq, steps=2, cfg_scale=1.5, sampler_type="spaced", seed=5)
    # 128x128 cond -> 16x16 latent = 256 tokens; cap of 128 forces tiling
    monkeypatch.setenv("DIFFBIR_TPU_MAX_COND_TOKENS", "128")
    out = tiny_pipe.run(
        lq, steps=2, cfg_scale=1.5, sampler_type="spaced", seed=5,
        cldm_tile_size=64, cldm_tile_stride=32,
    )
    assert "auto-tiling the diffusion" in capsys.readouterr().out
    assert out.shape == base.shape == (1, 128, 128, 3)
    # cap off -> no tiling message
    monkeypatch.setenv("DIFFBIR_TPU_MAX_COND_TOKENS", "0")
    tiny_pipe.run(lq, steps=2, cfg_scale=1.5, sampler_type="spaced", seed=5)
    assert "auto-tiling" not in capsys.readouterr().out


def test_e2e_chunked_dispatch_exact(tiny_pipe, monkeypatch, capsys):
    """DIFFBIR_TPU_DISPATCH_TOKEN_STEPS splits the denoise scan into
    bounded-duration dispatches (axon worker watchdog kills single
    dispatches past ~100 s — r5 bisect, scripts/repro_monster.py).
    Chunking must be EXACT vs the single-scan program: same ops, same
    order, same rng chain threaded through the carry. (The sampler-level
    segment scan is bit-identical; end-to-end we allow 1 uint8 level —
    XLA compiles the split programs with slightly different fusions than
    the monolithic one, a last-ulp effect at the quantization boundary.)"""

    def assert_1lsb(a, b):
        assert int(np.max(np.abs(a.astype(int) - b.astype(int)))) <= 1
    lq = np.random.default_rng(4).integers(0, 255, (1, 128, 128, 3), dtype=np.uint8)
    monkeypatch.setenv("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", "0")
    base = tiny_pipe.run(lq, steps=6, cfg_scale=2.0, sampler_type="spaced", seed=9)
    # 16x16 latent = 256 tokens; budget 512 -> max 2 steps/dispatch -> 3 segs
    monkeypatch.setenv("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", "512")
    out = tiny_pipe.run(lq, steps=6, cfg_scale=2.0, sampler_type="spaced", seed=9)
    assert "splitting the denoise into 3 dispatches" in capsys.readouterr().out
    assert_1lsb(out, base)
    # noise_aug + start_point=cond path through the chunked prep
    out2 = tiny_pipe.run(
        lq, steps=6, cfg_scale=2.0, sampler_type="spaced", seed=9,
        start_point_type="cond", noise_aug=5,
    )
    monkeypatch.setenv("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", "0")
    base2 = tiny_pipe.run(
        lq, steps=6, cfg_scale=2.0, sampler_type="spaced", seed=9,
        start_point_type="cond", noise_aug=5,
    )
    assert_1lsb(out2, base2)


def test_spaced_scan_tables_segments_bitexact():
    """Sampler-level guarantee: scan_tables over table slices with the
    carry threaded through is BIT-identical to one sample() call."""
    import jax
    import jax.numpy as jnp

    from diffbir_tpu.sampler.spaced import SpacedSampler

    sch = Schedule.create(timesteps=100, parameterization="eps")
    s = SpacedSampler(sch.betas, sch.parameterization, False)

    def model_fn(x, t, c):
        return 0.1 * x + 0.01 * t[:, None, None, None] + c["c_img"] * 0.001

    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4), jnp.float32)
    cond = {"c_img": jnp.ones((1, 8, 8, 4))}
    unc = {"c_img": jnp.ones((1, 8, 8, 4)) * 0.5}
    rng = jax.random.PRNGKey(7)
    base = jax.jit(
        lambda xT, r: s.sample(model_fn, xT, cond, unc, 2.0, 7, r)
    )(x_T, rng)
    tables_np = s.make_tables(7, 2.0, None)
    seg = jax.jit(lambda carry, tbl: s.scan_tables(model_fn, carry, tbl, cond, unc))
    carry, lo = (x_T, rng, None), 0
    for sz in (3, 2, 2):  # uneven split exercises both segment lengths
        tbl = {k: jnp.asarray(v[lo:lo + sz]) for k, v in tables_np.items()}
        carry = seg(carry, tbl)
        lo += sz
    np.testing.assert_array_equal(np.asarray(carry[0]), np.asarray(base))


def test_e2e_chunked_dispatch_ddim(tiny_pipe, monkeypatch, capsys):
    """DDIM shares the chunked-dispatch driver (make_tables/scan_tables)."""
    lq = np.random.default_rng(5).integers(0, 255, (1, 128, 128, 3), dtype=np.uint8)
    monkeypatch.setenv("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", "0")
    base = tiny_pipe.run(lq, steps=6, cfg_scale=2.0, sampler_type="ddim", seed=3)
    monkeypatch.setenv("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", "512")
    out = tiny_pipe.run(lq, steps=6, cfg_scale=2.0, sampler_type="ddim", seed=3)
    assert "splitting the denoise into 3 dispatches" in capsys.readouterr().out
    assert int(np.max(np.abs(out.astype(int) - base.astype(int)))) <= 1


def test_e2e_chunked_dispatch_edm(tiny_pipe, monkeypatch, capsys):
    """The EDM scan solvers (the default CLI family) share the chunked-
    dispatch protocol; carry holds the multistep history tensors."""
    lq = np.random.default_rng(7).integers(0, 255, (1, 128, 128, 3), dtype=np.uint8)
    for sampler in ("edm_dpm++_3m_sde", "edm_euler_a"):
        monkeypatch.setenv("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", "0")
        base = tiny_pipe.run(lq, steps=6, cfg_scale=2.0, sampler_type=sampler, seed=11)
        monkeypatch.setenv("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", "512")
        out = tiny_pipe.run(lq, steps=6, cfg_scale=2.0, sampler_type=sampler, seed=11)
        assert "splitting the denoise into 3 dispatches" in capsys.readouterr().out
        assert int(np.max(np.abs(out.astype(int) - base.astype(int)))) <= 1, sampler
