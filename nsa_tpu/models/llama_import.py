"""HF Llama checkpoint -> nsa_tpu parameter converter.

The reference's adapter line wraps HF Llama-3.2-1B (reference:
sparse_attention/sparse_attention_model.py:127-236).  This environment has
no network access, so the converter is offline-only: point it at a local
``LlamaForCausalLM`` checkpoint directory (safetensors/pytorch_model.bin)
and it produces (params, ModelConfig) in this framework's full-attention
layout, ready to be used as the frozen teacher for
:mod:`nsa_tpu.models.adapter`.

Layout mapping (HF -> ours):
  model.embed_tokens.weight            -> token_emb            [V, D]
  layers.i.input_layernorm.weight      -> layers[i].attn.norm_scale
  layers.i.self_attn.{q,k,v}_proj      -> layers[i].attn.w_{q,k,v}  (transposed)
  layers.i.self_attn.o_proj            -> layers[i].attn.w_out     (transposed)
  layers.i.post_attention_layernorm    -> layers[i].ff.norm_scale
  layers.i.mlp.{gate,up,down}_proj     -> layers[i].ff (SwiGLU: w1=gate, w3=up, w2=down)
  model.norm.weight                    -> norm_scale
  lm_head.weight                       -> to_logits (transposed)

Note: Llama uses SwiGLU FF and no FF biases; the byte-GPT FF here is
GELU+bias.  ``ff_kind='swiglu'`` on the converted config selects the
SwiGLU path in ``_ff_apply``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a local HF checkpoint (safetensors preferred)."""
    st_files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st_files:
        from safetensors.numpy import load_file

        sd: Dict[str, np.ndarray] = {}
        for f in sorted(st_files):
            sd.update(load_file(os.path.join(path, f)))
        return sd
    bin_files = [f for f in os.listdir(path) if f.endswith(".bin")]
    if bin_files:
        import torch

        sd = {}
        for f in sorted(bin_files):
            for k, v in torch.load(
                os.path.join(path, f), map_location="cpu", weights_only=True
            ).items():
                sd[k] = v.float().numpy()
        return sd
    raise FileNotFoundError(f"no safetensors/bin weights under {path}")


def _half_split_to_interleaved(w: jnp.ndarray, num_heads: int,
                               dim_head: int) -> jnp.ndarray:
    """Permute q/k projection columns from HF's half-split RoPE layout to
    the interleaved-pair layout our rotary uses.

    HF ``rotate_half`` pairs feature j with j + d/2; ops/rotary.py pairs 2j
    with 2j+1 (both at frequency theta^(-2j/d)).  Mapping column 2j <- j and
    2j+1 <- j + d/2 per head makes our interleaved rotary act on exactly
    the pairs HF's rotary would, so converted attention matches the source
    checkpoint numerically (q and k permute together, so q.k is invariant).
    """
    d = dim_head
    perm = np.empty(d, np.int64)
    perm[0::2] = np.arange(d // 2)
    perm[1::2] = np.arange(d // 2) + d // 2
    w = w.reshape(w.shape[0], num_heads, d)[:, :, perm]
    return w.reshape(w.shape[0], num_heads * d)


def convert_llama_checkpoint(path: str) -> Tuple[Dict, ModelConfig]:
    """Convert a local HF Llama checkpoint directory to (params, config)."""
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = ModelConfig(
        vocab_size=hf["vocab_size"],
        dim=hf["hidden_size"],
        depth=hf["num_hidden_layers"],
        dim_head=hf["hidden_size"] // hf["num_attention_heads"],
        heads=hf["num_attention_heads"],
        kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        ff_expansion_factor=hf["intermediate_size"] / hf["hidden_size"],
        use_sparse_attn=False,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        ff_kind="swiglu",
    )
    sd = _load_state_dict(path)

    def t(name):
        return jnp.asarray(np.asarray(sd[name]), jnp.float32)

    layers = []
    for i in range(cfg.depth):
        p = f"model.layers.{i}."
        layers.append({
            "attn": {
                "norm_scale": t(p + "input_layernorm.weight"),
                "w_q": _half_split_to_interleaved(
                    t(p + "self_attn.q_proj.weight").T, cfg.heads, cfg.dim_head
                ),
                "w_k": _half_split_to_interleaved(
                    t(p + "self_attn.k_proj.weight").T, cfg.kv_heads, cfg.dim_head
                ),
                "w_v": t(p + "self_attn.v_proj.weight").T,
                "w_out": t(p + "self_attn.o_proj.weight").T,
            },
            "ff": {
                "norm_scale": t(p + "post_attention_layernorm.weight"),
                "w1": t(p + "mlp.gate_proj.weight").T,
                "w3": t(p + "mlp.up_proj.weight").T,
                "w2": t(p + "mlp.down_proj.weight").T,
            },
        })
    lm_head = (
        t("lm_head.weight").T
        if "lm_head.weight" in sd
        else t("model.embed_tokens.weight").T  # tied embeddings
    )
    params = {
        "token_emb": t("model.embed_tokens.weight"),
        "layers": layers,
        "norm_scale": t("model.norm.weight"),
        "to_logits": lm_head,
    }
    return params, cfg
