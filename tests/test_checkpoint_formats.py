"""Released-checkpoint container formats (VERDICT r3 missing #2).

The real released repos the reference loads (prs-eth/rollingdepth-v1-0,
RealisticVision SD1.5, IC-Light fbc offsets; /root/reference/run_video.py
:530-532, rollingimg_pipeline.py:84-89) come in container layouts the tiny
test fixtures don't naturally produce: multi-file sharded safetensors with a
hub ``*.index.json`` weight map, dtype-variant file naming
(``diffusion_pytorch_model.fp16.safetensors``), and torch ``.bin`` shards.
No egress exists in this environment, so these tests restructure the tiny
diffusers-written checkpoint into each released layout byte-for-byte and
assert the converter produces the identical pytree.
"""

import json
import os
import shutil

import jax
import numpy as np
import pytest

from rollingdepth_tpu.io.weights import load_module_state_dict

pytestmark = pytest.mark.slow


def _unet_weight_file(ckpt: str) -> str:
    return os.path.join(ckpt, "unet", "diffusion_pytorch_model.safetensors")


def _read_all(path: str):
    from safetensors.numpy import load_file

    return load_file(path)


def _shard(sd: dict, d: str, stem: str, ext: str, n: int = 2):
    """Split a state dict into n hub-style shard files + index.json."""
    keys = sorted(sd)
    per = (len(keys) + n - 1) // n
    weight_map = {}
    for i in range(n):
        shard_keys = keys[i * per : (i + 1) * per]
        name = f"{stem}-{i + 1:05d}-of-{n:05d}{ext}"
        shard = {k: sd[k] for k in shard_keys}
        if ext == ".safetensors":
            from safetensors.numpy import save_file

            save_file(shard, os.path.join(d, name))
        else:
            import torch

            torch.save(
                {k: torch.from_numpy(np.asarray(v)) for k, v in shard.items()},
                os.path.join(d, name),
            )
        weight_map.update({k: name for k in shard_keys})
    with open(os.path.join(d, f"{stem}{ext}.index.json"), "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)


def _trees_equal(a, b, atol=0.0):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=0)


@pytest.fixture()
def ckpt_copy(tiny_checkpoint, tmp_path):
    dst = str(tmp_path / "ckpt")
    shutil.copytree(tiny_checkpoint, dst)
    return dst


def test_sharded_safetensors_unet(tiny_checkpoint, ckpt_copy):
    """2-file safetensors shards + index.json load to the identical pytree."""
    from rollingdepth_tpu.io.pretrained import load_unet

    single = _read_all(_unet_weight_file(ckpt_copy))
    os.remove(_unet_weight_file(ckpt_copy))
    _shard(single, os.path.join(ckpt_copy, "unet"),
           "diffusion_pytorch_model", ".safetensors")

    _, want = load_unet(tiny_checkpoint)
    _, got = load_unet(ckpt_copy)
    _trees_equal(want, got)


def test_sharded_bin_unet(tiny_checkpoint, ckpt_copy):
    """torch .bin shards with .bin.index.json (transformers layout)."""
    from rollingdepth_tpu.io.pretrained import load_unet

    single = _read_all(_unet_weight_file(ckpt_copy))
    os.remove(_unet_weight_file(ckpt_copy))
    _shard(single, os.path.join(ckpt_copy, "unet"),
           "diffusion_pytorch_model", ".bin")

    _, want = load_unet(tiny_checkpoint)
    _, got = load_unet(ckpt_copy)
    _trees_equal(want, got)


def test_fp16_variant_fallback(tiny_checkpoint, ckpt_copy):
    """Only a .fp16.safetensors variant present -> loads via the variant
    fallback, matching the base weights to fp16 precision."""
    from safetensors.numpy import save_file

    from rollingdepth_tpu.io.pretrained import load_unet

    single = _read_all(_unet_weight_file(ckpt_copy))
    os.remove(_unet_weight_file(ckpt_copy))
    save_file(
        {k: v.astype(np.float16) for k, v in single.items()},
        os.path.join(ckpt_copy, "unet", "diffusion_pytorch_model.fp16.safetensors"),
    )

    _, want = load_unet(tiny_checkpoint)
    _, got = load_unet(ckpt_copy)
    # fp16 storage quantization only
    la = jax.tree_util.tree_leaves(want)
    lb = jax.tree_util.tree_leaves(got)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-3, rtol=1e-2)


def test_sharded_missing_tensor_raises(ckpt_copy):
    d = os.path.join(ckpt_copy, "unet")
    single = _read_all(_unet_weight_file(ckpt_copy))
    os.remove(_unet_weight_file(ckpt_copy))
    _shard(single, d, "diffusion_pytorch_model", ".safetensors")
    # index promises a tensor no shard carries
    idx = os.path.join(d, "diffusion_pytorch_model.safetensors.index.json")
    with open(idx) as f:
        index = json.load(f)
    index["weight_map"]["ghost.weight"] = next(iter(index["weight_map"].values()))
    with open(idx, "w") as f:
        json.dump(index, f)
    with pytest.raises(ValueError, match="missing tensors"):
        load_module_state_dict(ckpt_copy, "unet")


def test_full_pipeline_from_released_layout(tiny_checkpoint, ckpt_copy):
    """End-to-end load_pipeline over a checkpoint restructured into the
    released container formats: sharded unet, fp16-variant vae, sharded
    text encoder — the exact mix a hub snapshot download can produce."""
    from safetensors.numpy import save_file

    from rollingdepth_tpu.io.pretrained import load_pipeline

    # unet -> 2 safetensors shards
    unet_sd = _read_all(_unet_weight_file(ckpt_copy))
    os.remove(_unet_weight_file(ckpt_copy))
    _shard(unet_sd, os.path.join(ckpt_copy, "unet"),
           "diffusion_pytorch_model", ".safetensors")
    # vae -> fp16 variant only
    vae_file = os.path.join(ckpt_copy, "vae", "diffusion_pytorch_model.safetensors")
    vae_sd = _read_all(vae_file)
    os.remove(vae_file)
    save_file({k: v.astype(np.float16) for k, v in vae_sd.items()},
              os.path.join(ckpt_copy, "vae", "diffusion_pytorch_model.fp16.safetensors"))
    # text encoder -> 2 shards (transformers "model" stem)
    te_file = os.path.join(ckpt_copy, "text_encoder", "model.safetensors")
    te_sd = _read_all(te_file)
    os.remove(te_file)
    _shard(te_sd, os.path.join(ckpt_copy, "text_encoder"), "model", ".safetensors")

    ref = load_pipeline(tiny_checkpoint, dtype="fp32")
    got = load_pipeline(ckpt_copy, dtype="fp32")
    _trees_equal(ref.unet_params, got.unet_params)
    la = jax.tree_util.tree_leaves(ref.vae_params)
    lb = jax.tree_util.tree_leaves(got.vae_params)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-3, rtol=1e-2)


def test_relight_unet_from_sharded_base(tiny_sd15_checkpoint, tmp_path):
    """IC-Light conv_in surgery + offset merge on top of a SHARDED base
    checkpoint produces the same merged params as the single-file layout
    (reference merge semantics: rollingimg_pipeline.py:1068-1087)."""
    from rollingdepth_tpu.io.pretrained_relight import load_relight_unet

    dst = str(tmp_path / "sd15")
    shutil.copytree(tiny_sd15_checkpoint, dst)
    offset = os.path.join(dst, "iclight_sd15_fbc.safetensors")

    single = _read_all(_unet_weight_file(dst))
    os.remove(_unet_weight_file(dst))
    _shard(single, os.path.join(dst, "unet"),
           "diffusion_pytorch_model", ".safetensors")

    _, want_merged, _, want_base = load_relight_unet(
        tiny_sd15_checkpoint,
        os.path.join(tiny_sd15_checkpoint, "iclight_sd15_fbc.safetensors"),
    )
    _, got_merged, _, got_base = load_relight_unet(dst, offset)
    _trees_equal(want_base, got_base)
    _trees_equal(want_merged, got_merged)
