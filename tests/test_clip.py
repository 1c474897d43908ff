"""CLIP text encoder + tokenizer parity vs transformers (torch oracle)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.io.tokenizer import CLIPTokenizer, bytes_to_unicode
from rollingdepth_tpu.io.weights import state_dict_to_pytree
from rollingdepth_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_clip_text_model_parity(torch_oracle, act):
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=99, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=24, hidden_act=act,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    cfg = CLIPTextConfig(vocab_size=99, hidden_size=16, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=24, hidden_act=act)
    ours = CLIPTextModel(cfg)

    def key_filter(k):
        # transformers prefixes with text_model.
        return k.removeprefix("text_model.") if "position_ids" not in k else None

    params = state_dict_to_pytree(hf.state_dict(), key_filter=key_filter)

    ids = np.array([[49 % 99, 3, 7, 98 % 99], [2, 1, 5, 9]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _synthetic_clip_vocab(tmp_path):
    """Tiny but structurally valid CLIP vocab: all byte tokens + </w> forms +
    a few merges + specials, written in HF layout."""
    byte_units = list(bytes_to_unicode().values())
    vocab = {}
    for u in byte_units:
        vocab[u] = len(vocab)
    for u in byte_units:
        vocab[u + "</w>"] = len(vocab)
    merges = [
        ("h", "e"), ("l", "l"), ("o</w>", ""), ("he", "ll"), ("hell", "o</w>"),
        ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
    ]
    merges = [m for m in merges if all(m)]
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    d = tmp_path / "tokenizer"
    d.mkdir()
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(tmp_path)


def test_tokenizer_matches_transformers(tmp_path):
    from transformers import CLIPTokenizer as HFTok

    model_dir = _synthetic_clip_vocab(tmp_path)
    hf = HFTok(
        vocab_file=os.path.join(model_dir, "tokenizer", "vocab.json"),
        merges_file=os.path.join(model_dir, "tokenizer", "merges.txt"),
    )
    ours = CLIPTokenizer.from_pretrained(model_dir)

    for text in [
        "", "hello world", "Hello,   WORLD!", "hello hello x", "a b c",
        # digit/underscore pre-tokenization: letters-only runs, per-digit
        # splits, '_' as punctuation (HF pattern [\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+)
        "4k room2 a_b", "photo_2 of 4k tv", "x_1 23abc __init__", "set 1080p60",
    ]:
        ref = hf(text, padding="do_not_pad").input_ids
        got = ours(text, padding="do_not_pad")
        assert got == ref, f"{text!r}: {got} != {ref}"

    # empty prompt must be exactly [bos, eos] — the [1,2,D] embed path
    assert len(ours("")) == 2
