import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.ops.attention import _xla_attention
from rollingdepth_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("b,lq,lk,h,d", [
    (1, 128, 128, 2, 64),
    (2, 300, 300, 1, 64),   # non-multiple of block: exercises padding/masking
    (1, 1024, 1024, 2, 64),
    (1, 257, 513, 2, 128),
])
def test_flash_matches_xla(b, lq, lk, h, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, lq, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, lk, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, lk, h, d), dtype=jnp.float32)

    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("lq,lk", [
    (1025, 1025),   # odd l_k in [1025, 2047]: pre-fix, block_k shrank to the
    (2047, 2047),   # ragged length and subs=2 silently dropped the last key
    (300, 1537),    # ragged q + multi-tile ragged k
    (1024, 4096),   # multiple full k blocks through the packed kernel
])
def test_flash_packed_production_config(lq, lk):
    """Production config — packed d<128 kernel, subs=2, PV-fused ones-column
    normalizer, block_k>=1024, ragged last block — vs XLA (ADVICE r2)."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (1, lq, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, lk, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, lk, 2, 64), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, None, 1024, 2048, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("lq,lk", [(300, 1537), (1025, 1025), (1024, 4096)])
def test_flash_nomax_production_config(lq, lk):
    """The max-free production kernel (UNet dispatch path: block 512/4096,
    no running max — bounded-score contract) vs XLA, incl. ragged lengths."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(kq, (1, lq, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, lk, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, lk, 2, 64), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, None, 512, 4096, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("l,h,d", [
    (300, 2, 40),     # SD1.5 level-0 heads (relight UNet, lane-unaligned d)
    (1380, 2, 80),    # SD1.5 level-1 + ragged multi-tile k
    (360, 1, 160),    # SD1.5 level-2/mid: wide kernel at non-lane-multiple d
])
def test_flash_sd15_head_dims(l, h, d):
    """The relight (gen-4) UNet is SD1.5: 8 heads of d=40/80/160 at every
    level — none lane-aligned, and d=160 takes the wide kernel.  Production
    dispatch config (block 512/4096, no_max) vs XLA."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(15), 3)
    q = jax.random.normal(kq, (1, l, h, d), jnp.float32)
    k = jax.random.normal(kk, (1, l, h, d), jnp.float32)
    v = jax.random.normal(kv, (1, l, h, d), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, None, 512, 4096, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_flash_matches_torch_sdpa(torch_oracle):
    import torch

    b, l, h, d = 1, 200, 3, 32
    rng = np.random.RandomState(0)
    q = rng.randn(b, l, h, d).astype(np.float32)
    k = rng.randn(b, l, h, d).astype(np.float32)
    v = rng.randn(b, l, h, d).astype(np.float32)

    # torch sdpa expects [B, H, L, D]
    tq, tk, tv = (torch.from_numpy(x.transpose(0, 2, 1, 3)) for x in (q, k, v))
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
    ref = ref.numpy().transpose(0, 2, 1, 3)

    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    out2 = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=2e-5, atol=2e-5)


def test_chunked_attention_matches_dense():
    from rollingdepth_tpu.ops.attention import _chunked_attention

    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 1000, 2, 16))
    k = jax.random.normal(kk, (2, 700, 2, 16))
    v = jax.random.normal(kv, (2, 700, 2, 16))
    ref = _xla_attention(q, k, v)
    out = _chunked_attention(q, k, v, block_q=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_conv3x3_matches_xla():
    from rollingdepth_tpu.ops.conv3x3 import conv3x3_same

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 20, 24, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    out = conv3x3_same(x, w, b, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # odd height exercising row padding
    x2 = jnp.asarray(rng.randn(1, 13, 24, 8).astype(np.float32))
    ref2 = jax.lax.conv_general_dilated(
        x2, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    out2 = conv3x3_same(x2, w, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-4, atol=1e-4)


def test_pallas_conv3x3_db_importable():
    # the double-buffered variant is TPU-only (DMA prefetch semantics differ
    # in the interpreter); compiled-mode correctness is shape-dependent on
    # the current Mosaic build — see the module docstring warning
    from rollingdepth_tpu.ops.conv3x3 import conv3x3_same_db

    assert callable(conv3x3_same_db)


def test_flash_attention_gradients():
    """Custom VJP: grads through the flash kernel (interpret mode) must match
    grads of the XLA reference at a seq>=256 training shape."""
    import jax

    from rollingdepth_tpu.ops.attention import _xla_attention
    from rollingdepth_tpu.ops.flash_attention import flash_attention

    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(5), 4)
    shape = (1, 384, 2, 8)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    cot = jax.random.normal(kg, shape, jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 128, True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) * cot)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_attn_backend_env_override(monkeypatch):
    """ROLLINGDEPTH_ATTN=xla must route around the flash kernel even for
    shapes the auto heuristic would tile (serving fallback knob); =flash must
    force the kernel path."""
    import rollingdepth_tpu.ops.attention as attn_mod

    calls = {"flash": 0}

    def fake_flash(q, k, v, scale=None, block_q=None, block_k=None, no_max=False, interpret=False):
        calls["flash"] += 1
        return attn_mod._xla_attention(q, k, v, scale)

    import rollingdepth_tpu.ops.flash_attention as flash_mod

    monkeypatch.setattr(flash_mod, "flash_attention", fake_flash)
    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(21), 3)
    q = jax.random.normal(kq, (1, 512, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 512, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 512, 2, 64), jnp.float32)

    monkeypatch.setenv("ROLLINGDEPTH_ATTN", "xla")
    attn_mod.dot_product_attention(q, k, v)
    assert calls["flash"] == 0

    monkeypatch.setenv("ROLLINGDEPTH_ATTN", "flash")
    attn_mod.dot_product_attention(q, k, v)
    assert calls["flash"] == 1


def test_nomax_score_calibration_routes_to_safe_kernel(monkeypatch):
    """VERDICT r3 weak #4: the max-free kernel's bounded-score contract must
    be enforced at load time.  A healthy tiny checkpoint calibrates to
    no_max=True; the same checkpoint with 1e3-scaled attention projections
    exceeds NOMAX_SCORE_LIMIT and must demonstrably route the dispatch to
    the safe online-softmax (running-max) kernel, with the backend tag (the
    pipelines' program-cache key component) flipping so cached programs
    retrace."""
    import dataclasses

    import jax.tree_util as jtu

    import rollingdepth_tpu.ops.attention as attn_mod
    import rollingdepth_tpu.ops.flash_attention as flash_mod
    from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
    from rollingdepth_tpu.ops.score_probe import calibrate_nomax

    cfg = dataclasses.replace(UNetConfig.tiny(in_channels=8), cross_attention_dim=16)
    unet = UNet2DCondition(cfg)
    params = unet.init(jax.random.PRNGKey(0))

    seen = {"no_max": None}

    def fake_flash(q, k, v, scale=None, block_q=None, block_k=None,
                   no_max=False, interpret=False):
        seen["no_max"] = no_max
        return attn_mod._xla_attention(q, k, v, scale)

    monkeypatch.setattr(flash_mod, "flash_attention", fake_flash)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (1, 512, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 512, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 512, 2, 64), jnp.float32)

    try:
        bound = calibrate_nomax(unet, params)
        assert bound < attn_mod.NOMAX_SCORE_LIMIT / 2.0
        assert attn_mod.nomax_allowed()
        assert "+safemax" not in attn_mod.backend_tag()
        attn_mod.dot_product_attention(q, k, v, use_flash=True)
        assert seen["no_max"] is True

        def scale_qk(path, leaf):
            p = "/".join(str(getattr(kk_, "key", kk_)) for kk_ in path)
            if "attn" in p and ("to_q" in p or "to_k" in p) and p.endswith("kernel"):
                return leaf * 1e3
            return leaf

        bad = jtu.tree_map_with_path(scale_qk, params)
        bound_bad = calibrate_nomax(unet, bad)
        assert bound_bad * 2.0 >= attn_mod.NOMAX_SCORE_LIMIT
        assert not attn_mod.nomax_allowed()
        assert attn_mod.backend_tag().endswith("+safemax")
        attn_mod.dot_product_attention(q, k, v, use_flash=True)
        assert seen["no_max"] is False  # demonstrably on the safe kernel
    finally:
        attn_mod.set_nomax_allowed(True)  # process-global: never leak


def test_auto_select_gates_on_head_dim(monkeypatch):
    """Degenerate head dims must NOT auto-route to the Pallas kernel: the
    kernel is validated at d=40..160 (+ the wide-head VAE tiling), tiles
    [block, d] onto 128 MXU lanes (d=2 runs at 2/128 efficiency), and a
    d=2 / L=345k launch faulted the v5e worker (2026-08-19 relight-CLI
    verify).  d>=32 still auto-selects flash; explicit ROLLINGDEPTH_ATTN
    =flash remains an override."""
    import rollingdepth_tpu.ops.attention as attn_mod
    import rollingdepth_tpu.ops.flash_attention as flash_mod

    calls = {"flash": 0}

    def fake_flash(q, k, v, scale=None, block_q=None, block_k=None,
                   no_max=False, interpret=False):
        calls["flash"] += 1
        return attn_mod._xla_attention(q, k, v, scale)

    monkeypatch.setattr(flash_mod, "flash_attention", fake_flash)
    monkeypatch.setattr(attn_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("ROLLINGDEPTH_ATTN", raising=False)

    def mk(d):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
        return (jax.random.normal(kq, (1, 512, 2, d), jnp.float32),
                jax.random.normal(kk, (1, 512, 2, d), jnp.float32),
                jax.random.normal(kv, (1, 512, 2, d), jnp.float32))

    attn_mod.dot_product_attention(*mk(2))
    assert calls["flash"] == 0, "d=2 must take the XLA path under auto"
    attn_mod.dot_product_attention(*mk(16))
    assert calls["flash"] == 0, "d=16 must take the XLA path under auto"
    attn_mod.dot_product_attention(*mk(40))
    assert calls["flash"] == 1, "d=40 (production SD1.5) must auto-flash"
    monkeypatch.setenv("ROLLINGDEPTH_ATTN", "flash")
    attn_mod.dot_product_attention(*mk(2))
    assert calls["flash"] == 2, "explicit =flash overrides the gate"
