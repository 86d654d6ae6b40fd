"""Sparse-attention adapters + distillation (reference F1-F3).

TPU-native equivalent of the reference's Llama adapter / distillation line
(reference: sparse_attention/sparse_attention_model.py and
sparse_distillation_model.py):

* ``init_adapter_from_attention``  — one NSA layer whose q/k/v/out
  projections are initialized from a frozen teacher attention layer
  (reference: sparse_attention_model.py:85-110); the adapter runs without
  its own input norm (norm folded into the host model, reference:
  SparseAttentionAdapter norm=Identity, :64).
* ``adapted_forward``              — frozen base transformer with trainable
  NSA adapters replacing each attention block: frozen-MLP residual stream
  with stop-gradient, so only adapter params receive gradients
  (reference: sparse_attention_model.py:239-267).
* ``distillation_loss``            — teacher/student losses:
  'kl_output_only' / 'kl_logits' / 'mse_hidden' / 'mixed' / 'ce' with
  temperature scaling, logit clamping, label-masked KL, and layerwise MSE
  over scale-free layernormed hiddens (reference:
  sparse_distillation_model.py:86-343).
* ``verify_gradient_flow``         — asserts adapters get gradients and the
  frozen base does not (reference: sparse_attention_model.py:352-399).

The teacher here is any full-attention ``nsa_tpu`` transformer (the
reference used HF Llama-3.2-1B; this environment has no network access, so
the same machinery is exercised against our own pretrained byte-level GPT —
the architecture is identical modulo scale, and a converter for HF Llama
weights can slot in where ``teacher_params`` come from).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.common import rms_norm
from ..ops.nsa import init_sparse_attention, sparse_attention_forward
from .transformer import _ff_apply


def init_adapter_from_attention(
    key: jax.Array, cfg: ModelConfig, attn_params: Dict
) -> Dict:
    """NSA adapter initialized from a teacher attention layer's projections.

    Copies w_q/w_k/w_v and the output projection so the adapter starts
    close to the teacher's attention function (reference:
    sparse_attention_model.py:85-110, which splits the teacher's q/k/v/o
    into the fused projections).
    """
    adapter = init_sparse_attention(key, cfg)
    for name in ("w_q", "w_k", "w_v", "w_out"):
        if name in attn_params:
            adapter[name] = attn_params[name]
    # norm handled by the host model's layernorm; neutralize the adapter's
    adapter["norm_scale"] = jnp.ones_like(adapter["norm_scale"])
    return adapter


def init_adapters(key: jax.Array, cfg: ModelConfig, teacher_params: Dict):
    """One adapter per teacher layer."""
    keys = jax.random.split(key, len(teacher_params["layers"]))
    return [
        init_adapter_from_attention(k, cfg, layer["attn"])
        for k, layer in zip(keys, teacher_params["layers"])
    ]


def adapted_forward(
    adapters,
    teacher_params: Dict,
    cfg: ModelConfig,
    ids: jnp.ndarray,
    *,
    output_hidden_states: bool = False,
    impl: Optional[str] = None,
):
    """Frozen base + trainable NSA adapters -> logits (and hiddens).

    Mirrors the reference's manual layer loop: input_layernorm -> adapter ->
    residual; frozen MLP under stop-gradient + detached residual
    (reference: sparse_attention_model.py:239-267).
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    frozen = jax.lax.stop_gradient(teacher_params)
    x = frozen["token_emb"][ids].astype(dtype)
    hiddens = [x]
    for adapter, layer in zip(adapters, frozen["layers"]):
        # adapter applies its own (neutral) norm internally; the host norm
        # weights are folded in by scaling with the frozen norm_scale
        normed_in = rms_norm(x, layer["attn"]["norm_scale"], cfg.norm_eps)
        attn_out = sparse_attention_forward(adapter, cfg, normed_in, impl=impl)
        x = x + attn_out
        # frozen MLP: no gradient through the MLP path, residual keeps grads
        x = x + jax.lax.stop_gradient(_ff_apply(layer["ff"], cfg, x))
        hiddens.append(x)
    x = rms_norm(x, frozen["norm_scale"], cfg.norm_eps)
    logits = (x @ frozen["to_logits"].astype(dtype)).astype(jnp.float32)
    if output_hidden_states:
        return logits, hiddens
    return logits


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]):
    if mask is None:
        return x.mean()
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def _scale_free_norm(h: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm without learned affine (reference uses
    nn.LayerNorm(elementwise_affine=False), sparse_distillation_model.py)."""
    mu = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + eps)


def distillation_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    mode: str = "kl_output_only",
    labels: Optional[jnp.ndarray] = None,
    label_mask: Optional[jnp.ndarray] = None,
    student_hiddens=None,
    teacher_hiddens=None,
    temperature: float = 2.0,
    logit_clamp: float = 30.0,
    mix_alpha: float = 0.5,
) -> jnp.ndarray:
    """Teacher/student losses (reference: sparse_distillation_model.py:86-343).

    Modes: 'kl_output_only' (KL on final logits), 'kl_logits' (alias with
    temperature), 'mse_hidden' (layerwise MSE over scale-free-normed
    hiddens), 'mixed' (alpha * KL + (1 - alpha) * hidden MSE), 'ce' (plain
    cross-entropy on labels).
    """
    sl = jnp.clip(student_logits, -logit_clamp, logit_clamp)
    tl = jnp.clip(jax.lax.stop_gradient(teacher_logits), -logit_clamp, logit_clamp)

    def kl():
        t = max(temperature, 1e-4)
        logp_s = jax.nn.log_softmax(sl / t, axis=-1)
        p_t = jax.nn.softmax(tl / t, axis=-1)
        kl_tok = (p_t * (jnp.log(jnp.clip(p_t, 1e-9, None)) - logp_s)).sum(-1)
        return _masked_mean(kl_tok, label_mask) * (t * t)

    def hidden_mse():
        assert student_hiddens is not None and teacher_hiddens is not None
        losses = [
            jnp.mean(
                (_scale_free_norm(hs) - _scale_free_norm(
                    jax.lax.stop_gradient(ht))) ** 2
            )
            for hs, ht in zip(student_hiddens, teacher_hiddens)
        ]
        return jnp.mean(jnp.stack(losses))

    def ce():
        assert labels is not None
        logp = jax.nn.log_softmax(student_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return _masked_mean(nll, label_mask)

    if mode in ("kl_output_only", "kl_logits"):
        return kl()
    if mode == "mse_hidden":
        return hidden_mse()
    if mode == "mixed":
        return mix_alpha * kl() + (1.0 - mix_alpha) * hidden_mse()
    if mode == "ce":
        return ce()
    raise ValueError(f"unknown distillation mode '{mode}'")


def distillation_step_loss(
    adapters,
    teacher_params,
    cfg_student: ModelConfig,
    cfg_teacher: ModelConfig,
    ids: jnp.ndarray,
    label_mask: Optional[jnp.ndarray] = None,
    mode: str = "kl_output_only",
    **loss_kw,
):
    """One distillation forward: shared frozen base as teacher (reference:
    sparse_distillation_model.py:52-55,114-124) + adapted student."""
    from .transformer import transformer_forward

    need_hiddens = mode in ("mse_hidden", "mixed")
    teacher_logits = jax.lax.stop_gradient(
        transformer_forward(teacher_params, cfg_teacher, ids)
    )
    if need_hiddens:
        student_logits, s_h = adapted_forward(
            adapters, teacher_params, cfg_student, ids,
            output_hidden_states=True,
        )
        # teacher hiddens: rerun base transformer capturing the stream
        t_h = _teacher_hiddens(teacher_params, cfg_teacher, ids)
    else:
        student_logits = adapted_forward(
            adapters, teacher_params, cfg_student, ids
        )
        s_h = t_h = None
    labels = ids
    return distillation_loss(
        student_logits, teacher_logits, mode=mode, labels=labels,
        label_mask=label_mask, student_hiddens=s_h, teacher_hiddens=t_h,
        **loss_kw,
    )


def _teacher_hiddens(params, cfg: ModelConfig, ids):
    from .transformer import _full_attn_forward

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = params["token_emb"][ids].astype(dtype)
    hiddens = [x]
    for layer in params["layers"]:
        x = x + _full_attn_forward(layer["attn"], cfg, x)
        x = x + _ff_apply(layer["ff"], cfg, x)
        hiddens.append(x)
    return hiddens


def verify_gradient_flow(
    adapters, teacher_params, cfg_student, cfg_teacher, ids
) -> Tuple[bool, dict]:
    """Adapters must receive gradients; the frozen base must not
    (reference: sparse_attention_model.py:352-399)."""
    def loss_fn(ad, tp):
        return distillation_step_loss(
            ad, tp, cfg_student, cfg_teacher, ids, mode="kl_output_only"
        )

    g_ad, g_tp = jax.grad(loss_fn, argnums=(0, 1))(adapters, teacher_params)
    ad_norms = [
        float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(a))))
        for a in g_ad
    ]
    tp_norm = float(
        jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(g_tp)))
    )
    ok = all(n > 0 for n in ad_norms) and tp_norm == 0.0
    return ok, {"adapter_grad_norms": ad_norms, "teacher_grad_norm": tp_norm}
