"""Byte-level GPT with full or native-sparse attention.

TPU-native reimplementation of the reference ``Transformer``
(reference: sparse_attention/native_sparse_attention_pytorch/transformer.py):

* token embed -> depth x (attention + prenorm GELU FF x4) -> RMSNorm ->
  logits; cross-entropy on shifted ids (reference: transformer.py:314-411);
* full-attention baseline ``Attention`` with GQA + rotary + rotated-KV
  decode cache (reference: transformer.py:65-186);
* autoregressive sampling with greedy or top-k + Gumbel
  (reference: transformer.py:44-61,273-312) — but implemented as a single
  jitted ``lax.scan`` over a static-shape decode step instead of the
  reference's per-token Python loop (its decode HOT loop, SURVEY.md
  section 3.2).

The model is a pure function over an explicit parameter pytree; the decode
cache is an explicit pytree threaded through ``decode_step``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import attend, full_attention, full_attention_chunked
from ..ops.common import (
    mask_value,
    merge_heads,
    rms_norm,
    round_up_mult,
    split_heads,
)
from ..ops.nsa import (
    NSADecodeCache,
    init_decode_cache,
    init_sparse_attention,
    sparse_attention_decode,
    sparse_attention_forward,
)
from ..ops.rotary import rotate_at_offset, rotate_qk


class KVDecodeCache(NamedTuple):
    """Full-attention layer cache: rotated K and V, packed along features
    ([..., :d] = key, [..., d:] = value) so one cache write per step serves
    both (reference caches them separately: transformer.py:108-128)."""

    kv: jnp.ndarray  # [b, kvh, max_len, 2*d]


LayerCache = Union[NSADecodeCache, KVDecodeCache]


class ModelCache(NamedTuple):
    layers: Tuple[LayerCache, ...]
    seq_len: jnp.ndarray  # scalar int32: number of cached tokens


def _layers_homogeneous(params) -> bool:
    """True when every layer has the same pytree structure and leaf shapes
    (required for stacking them into a lax.scan over layers)."""
    layers = params["layers"]
    if len(layers) < 2:
        return True
    ref = jax.tree_util.tree_structure(layers[0])
    ref_shapes = [x.shape for x in jax.tree_util.tree_leaves(layers[0])]
    for layer in layers[1:]:
        if jax.tree_util.tree_structure(layer) != ref:
            return False
        if [x.shape for x in jax.tree_util.tree_leaves(layer)] != ref_shapes:
            return False
    return True


def _uniform(key, shape, fan_in):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_full_attention(key, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "norm_scale": jnp.ones((cfg.dim,), jnp.float32),
        "w_q": _uniform(ks[0], (cfg.dim, cfg.dim_inner), cfg.dim),
        "w_k": _uniform(ks[1], (cfg.dim, cfg.dim_kv_inner), cfg.dim),
        "w_v": _uniform(ks[2], (cfg.dim, cfg.dim_kv_inner), cfg.dim),
        "w_out": _uniform(ks[3], (cfg.dim_inner, cfg.dim), cfg.dim_inner),
    }


def _init_ff(key, cfg: ModelConfig) -> dict:
    hidden = int(cfg.dim * cfg.ff_expansion_factor)
    ks = jax.random.split(key, 4)
    return {
        "norm_scale": jnp.ones((cfg.dim,), jnp.float32),
        "w1": _uniform(ks[0], (cfg.dim, hidden), cfg.dim),
        "b1": _uniform(ks[1], (hidden,), cfg.dim),
        "w2": _uniform(ks[2], (hidden, cfg.dim), hidden),
        "b2": _uniform(ks[3], (cfg.dim,), hidden),
    }


def init_transformer(key: jax.Array, cfg: ModelConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 2)
    layers = []
    for i in range(cfg.depth):
        ka, kf = jax.random.split(keys[i])
        attn = (
            init_sparse_attention(ka, cfg)
            if cfg.use_sparse_attn
            else _init_full_attention(ka, cfg)
        )
        layers.append({"attn": attn, "ff": _init_ff(kf, cfg)})
    return {
        "token_emb": jax.random.normal(keys[-2], (cfg.vocab_size, cfg.dim)),
        "layers": layers,
        "norm_scale": jnp.ones((cfg.dim,), jnp.float32),
        "to_logits": _uniform(keys[-1], (cfg.dim, cfg.vocab_size), cfg.dim),
    }


def fuse_decode_params(params: dict, cfg: ModelConfig) -> dict:
    """Precompute the per-layer fused/packed decode weights ONCE.

    The decode step concatenates w_q|w_k|w_v|gate_w (~1 MB) and packs the
    compressor weights (pos_kv, w2, b2) + dtype casts EVERY step per layer
    — XLA does not hoist these out of the decode scan and the bs-1 xprof
    shows them as real per-step device ops (exp_result/r4/trace_bs1.log).
    Returns a new params pytree with ``layer["attn"]["decode_fused"]``
    added; `sparse_attention_decode` picks it up when present (the key's
    presence is static per jit trace), training paths never see it.  Call
    it once wherever params are long-lived (serving engine, benchmark
    scans, samplers) — NOT inside a jitted step.
    """
    if not cfg.use_sparse_attn:
        return params
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    new_layers = []
    for layer in params["layers"]:
        attn = dict(layer["attn"])
        kc, vc = attn["k_compress"], attn["v_compress"]
        attn["decode_fused"] = {
            "w_qkvg": jnp.concatenate(
                [attn["w_q"], attn["w_k"], attn["w_v"], attn["gate_w"]],
                axis=1,
            ).astype(dtype),
            "pos_kv": jnp.concatenate(
                [attn["k_pos"], attn["v_pos"]], axis=-1
            ).astype(dtype),
            "w1k": kc["w1"].astype(dtype),
            "w1v": vc["w1"].astype(dtype),
            "w2": jnp.concatenate([kc["w2"], vc["w2"]], axis=-1).astype(dtype),
            "b2": jnp.concatenate([kc["b2"], vc["b2"]], axis=-1),
            "mem_kv": attn["mem_kv"].astype(dtype),
        }
        new_layers.append({**layer, "attn": attn})
    return {**params, "layers": new_layers}


def use_mega_decode(cfg: ModelConfig, batch: int) -> bool:
    """Whether the whole-model decode megakernel applies (one Pallas
    launch per token chunk, ops/pallas/nsa_megakernel.py).

    Scope: scalar-position decode at small batch, Pallas impl, gelu FF,
    the GroupedMLP compressor and shared-KV selection (same constraints
    as the 2-kernel fused path).  DEFAULT ON for b <= 8 per the r5
    on-chip A/B (max_len 4096, gen 200, trained config): bs 1 mega
    0.126 ms/step vs fused 0.18 (+28%); bs 8 mega 50,934 tok/s vs fused
    19,494 vs full-attention 14,743 (3.45x) — the serial op-issue
    floor is batch-invariant, so batching rides nearly free (the r5
    head-batched body compounds this: bs 8 52,910 tok/s = 3.85x).

    bs 9-16 additionally requires the ``NSA_SCOPED_VMEM_KIB=98304``
    opt-in: the launch-resident caches measure ~75 MB there (measured
    66,946 tok/s = 3.41x at bs 16), but making 96 MiB the process-wide
    DEFAULT degraded unrelated same-process programs ~13x after a
    megakernel run (see ops/common.tpu_compiler_options), so the limit
    raise must be deliberate.  bs 32's launch-resident ckv alone
    (~102 MB) is out of VMEM reach, and the r2 batched-gather path wins
    there anyway.  Opt out with ``NSA_MEGA_DECODE=0``;
    ``NSA_MEGA_MAX_B`` moves the batch cutover (ragged serving keeps
    the fused path — the megakernel is scalar-position only)."""
    import os

    nsa = cfg.nsa
    if os.environ.get("NSA_MEGA_DECODE", "") == "0":
        return False
    cap = 16 if int(os.environ.get("NSA_SCOPED_VMEM_KIB", "0")) >= 98304 else 8
    max_b = int(os.environ.get("NSA_MEGA_MAX_B", str(cap)))
    return (
        cfg.use_sparse_attn
        and cfg.attn_impl == "pallas"
        and cfg.ff_kind == "gelu"
        and nsa.query_heads_share_selected_kv
        and nsa.num_compress_per_fine > 1
        and nsa.num_selected_blocks > 0
        and nsa.compressor == "mlp"
        and batch <= min(max_b, 16)
    )


def pack_mega_params(params: dict, cfg: ModelConfig) -> dict:
    """Stack per-layer weights into the [L, ...] arrays the decode
    megakernel's layer-grid BlockSpecs consume.  Call ONCE wherever params
    are long-lived (never inside a jitted step).  All weights are cast to
    the model compute dtype; see ops/pallas/nsa_megakernel.py for the
    layout contract."""
    from ..ops.pallas.nsa_megakernel import swap_matrix

    assert cfg.use_sparse_attn and cfg.ff_kind == "gelu"
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    def stack(fn):
        return jnp.stack([fn(layer) for layer in params["layers"]])

    def cat_qkvg(layer):
        a = layer["attn"]
        return jnp.concatenate(
            [a["w_q"], a["w_k"], a["w_v"], a["gate_w"]], axis=1
        ).astype(dtype)

    return {
        "token_emb": params["token_emb"].astype(dtype),
        "to_logits": params["to_logits"].astype(dtype),
        "out_norm": params["norm_scale"][None].astype(dtype),
        "pswap": swap_matrix(cfg.dim_inner),
        # per-layer VECTORS carry a singleton middle dim: a [L, X] array
        # blocked (1, X) is Mosaic-illegal (last-two block dims must divide
        # (8, 128) or equal the array dims); [L, 1, X] blocked (1, 1, X) is
        "attn_norm": stack(
            lambda l: l["attn"]["norm_scale"][None].astype(dtype)),
        "w_qkvg": stack(cat_qkvg),
        "gate_b": stack(lambda l: l["attn"]["gate_b"][None].astype(dtype)),
        # mem_kv stays f32: its [.., M=2, d] block puts M on the sublane
        # dim, and bf16's (2,1) sublane packing makes the extent-1 slices
        # Mosaic emits for the tiny sim_m matmul illegal ("slice shape
        # along dimension 3 must be aligned to tiling (2)", r4c smoke);
        # _select_math upcasts it immediately and it is ~4 KB total.
        "mem_kv": stack(lambda l: l["attn"]["mem_kv"].astype(jnp.float32)),
        "pos_kv": stack(lambda l: jnp.concatenate(
            [l["attn"]["k_pos"], l["attn"]["v_pos"]], axis=-1
        ).astype(dtype)),
        "b1k": stack(lambda l: l["attn"]["k_compress"]["b1"].astype(dtype)),
        "b1v": stack(lambda l: l["attn"]["v_compress"]["b1"].astype(dtype)),
        "b2c": stack(lambda l: jnp.concatenate(
            [l["attn"]["k_compress"]["b2"], l["attn"]["v_compress"]["b2"]],
            axis=-1,
        ).astype(dtype)),
        "w1k": stack(lambda l: l["attn"]["k_compress"]["w1"].astype(dtype)),
        "w1v": stack(lambda l: l["attn"]["v_compress"]["w1"].astype(dtype)),
        "w2c": stack(lambda l: jnp.concatenate(
            [l["attn"]["k_compress"]["w2"], l["attn"]["v_compress"]["w2"]],
            axis=-1,
        ).astype(dtype)),
        "w_out": stack(lambda l: l["attn"]["w_out"].astype(dtype)),
        "ff_norm": stack(lambda l: l["ff"]["norm_scale"][None].astype(dtype)),
        "fw1": stack(lambda l: l["ff"]["w1"].astype(dtype)),
        "fb1": stack(lambda l: l["ff"]["b1"][None].astype(dtype)),
        "fw2": stack(lambda l: l["ff"]["w2"].astype(dtype)),
        "fb2": stack(lambda l: l["ff"]["b2"][None].astype(dtype)),
    }


def stack_decode_caches(cache: ModelCache):
    """ModelCache (per-layer NSADecodeCache tuple) -> stacked
    (kv [L, ...], ckv [L, ...], ring [L, ...]) for the megakernel."""
    kv = jnp.stack([lc.kv for lc in cache.layers])
    ckv = jnp.stack([lc.ckv for lc in cache.layers])
    ring = jnp.stack([lc.ring for lc in cache.layers])
    return kv, ckv, ring


def transformer_decode_step_mega(
    mp: dict, cfg: ModelConfig, token: jnp.ndarray, kv, ckv, ring, t,
    greedy: bool = False, steps: int = 1, resident: bool | None = None,
    headbatch: bool | None = None,
):
    """Whole-model decode through the megakernel:
    -> (logits [b, vocab] f32, kv, ckv, ring), or with ``greedy=True``
    -> (logits, tokens [b, steps], kv, ckv, ring) with the argmax sampled
    in-kernel (``steps > 1`` decodes a whole greedy chunk in ONE launch).
    ``mp`` from pack_mega_params; caches from stack_decode_caches
    (updated in place)."""
    from ..ops.pallas.nsa_megakernel import decode_step_mega

    nsa = cfg.nsa
    Bs = nsa.selection_block_size
    return decode_step_mega(
        mp, kv, ckv, ring, token, t,
        depth=cfg.depth, heads=cfg.heads, kv_heads=cfg.kv_heads,
        dim_head=cfg.dim_head, stride=nsa.compress_block_sliding_stride,
        sel_block=Bs, num_sel=nsa.num_selected_blocks,
        n_slide=-(-nsa.sliding_window_size // Bs) + 1,
        window=nsa.sliding_window_size, scale=cfg.dim_head ** -0.5,
        eps=cfg.norm_eps, theta=cfg.rope_theta, greedy=greedy, steps=steps,
        resident=resident, headbatch=headbatch,
    )


def _ff_apply(params, cfg: ModelConfig, x):
    h = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    if cfg.ff_kind == "swiglu":
        gate = jax.nn.silu(h @ params["w1"].astype(h.dtype))
        up = h @ params["w3"].astype(h.dtype)
        return (gate * up) @ params["w2"].astype(h.dtype)
    h = jax.nn.gelu(
        h @ params["w1"].astype(h.dtype) + params["b1"].astype(h.dtype),
        approximate=False,
    )
    return h @ params["w2"].astype(h.dtype) + params["b2"].astype(h.dtype)


def _full_attn_forward(
    params, cfg: ModelConfig, x, *, return_cache_max_len: Optional[int] = None
):
    b, n, _ = x.shape
    normed = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    q = split_heads(normed @ params["w_q"].astype(x.dtype), cfg.dim_head)
    k = split_heads(normed @ params["w_k"].astype(x.dtype), cfg.dim_head)
    v = split_heads(normed @ params["w_v"].astype(x.dtype), cfg.dim_head)
    q, k = rotate_qk(q, k, cfg.rope_theta)
    out = full_attention_chunked(
        q, k, v, causal=cfg.causal, chunk=max(cfg.attn_chunk_size, 128)
    )
    out = merge_heads(out) @ params["w_out"].astype(x.dtype)
    if return_cache_max_len is None:
        return out
    max_len = return_cache_max_len
    pad = [(0, 0), (0, 0), (0, max_len - n), (0, 0)]
    return out, KVDecodeCache(
        kv=jnp.concatenate([jnp.pad(k, pad), jnp.pad(v, pad)], axis=-1)
    )


def _full_attn_decode(params, cfg: ModelConfig, x, cache: KVDecodeCache, seq_len):
    b = x.shape[0]
    d, kvh, g = cfg.dim_head, cfg.kv_heads, cfg.num_grouped_queries
    max_len = cache.kv.shape[2]
    seq_len = jnp.asarray(seq_len, jnp.int32)
    ragged = seq_len.ndim == 1                    # per-row positions [b]
    normed = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    # fused q/k/v projection (one matmul; weight concat is loop-invariant)
    w_fused = jnp.concatenate(
        [params["w_q"], params["w_k"], params["w_v"]], axis=1
    ).astype(x.dtype)
    proj = (normed @ w_fused)[:, 0]
    q = proj[:, : cfg.dim_inner].reshape(b, cfg.heads, d)
    k = proj[:, cfg.dim_inner: cfg.dim_inner + cfg.dim_kv_inner].reshape(b, kvh, d)
    v = proj[:, cfg.dim_inner + cfg.dim_kv_inner:].reshape(b, kvh, d)
    qk = jnp.concatenate([q, k], axis=1)[:, :, None]
    if ragged:
        from ..ops.rotary import rotate_at_row_offsets

        rot = rotate_at_row_offsets(qk, seq_len, cfg.rope_theta)[:, :, 0]
    else:
        rot = rotate_at_offset(qk, seq_len, cfg.rope_theta)[:, :, 0]
    rq, rk = rot[:, : cfg.heads], rot[:, cfg.heads:]
    kv_row = jnp.concatenate([rk, v], axis=-1)
    if ragged:
        kv_cache = cache.kv.at[
            jnp.arange(b)[:, None], jnp.arange(kvh)[None, :],
            seq_len[:, None]
        ].set(kv_row)
    else:
        kv_cache = jax.lax.dynamic_update_slice(
            cache.kv, kv_row[:, :, None], (0, 0, seq_len, 0)
        )
    sim = jnp.einsum(
        "bhgd,bhjd->bhgj", rq.reshape(b, kvh, g, d), kv_cache[..., :d],
        preferred_element_type=jnp.float32,
    ) * (d ** -0.5)
    if ragged:
        valid = (jnp.arange(max_len) <= seq_len[:, None])[:, None, None, :]
    else:
        valid = (jnp.arange(max_len) <= seq_len)[None, None, None]
    sim = jnp.where(valid, sim, mask_value(jnp.float32))
    attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhgj,bhjd->bhgd", attn, kv_cache[..., d:]
    ).reshape(b, cfg.heads, d)
    out = merge_heads(out[:, :, None]) @ params["w_out"].astype(x.dtype)
    # both decode fns return the UPDATED residual stream (x + attn_out) so
    # the fused sparse kernel path can fold projection + residual in-kernel
    return x + out, KVDecodeCache(kv=kv_cache)


# -- model-level entry points ---------------------------------------------

def transformer_forward(
    params,
    cfg: ModelConfig,
    ids: jnp.ndarray,
    *,
    impl: Optional[str] = None,
    return_cache_max_len: Optional[int] = None,
    true_len: Optional[jnp.ndarray] = None,
):
    """Forward over token ids [b, n] -> logits [b, n, vocab].

    With ``return_cache_max_len`` also returns a ``ModelCache`` (prefill).
    ``true_len`` marks the real prompt length when ids are right-padded to
    a bucket (exact bucketed prefill; see sparse_attention_forward).
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = params["token_emb"][ids].astype(dtype)
    build_cache = return_cache_max_len is not None

    if not build_cache and cfg.scan_layers and _layers_homogeneous(params):
        # training path: one remat'd lax.scan over stacked layer params so
        # each attention kernel (XLA or Pallas fwd+bwd) lowers exactly once
        # regardless of depth — residuals are one [b, n, dim] per layer
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params["layers"]
        )

        def layer_step(h, layer):
            if cfg.use_sparse_attn:
                attn_out = sparse_attention_forward(
                    layer["attn"], cfg, h, impl=impl
                )
            else:
                attn_out = _full_attn_forward(layer["attn"], cfg, h)
            h = h + attn_out
            h = h + _ff_apply(layer["ff"], cfg, h)
            return h, None

        x, _ = jax.lax.scan(jax.checkpoint(layer_step), x, stacked)
        x = rms_norm(x, params["norm_scale"], cfg.norm_eps)
        return (x @ params["to_logits"].astype(dtype)).astype(jnp.float32)

    layer_caches = []
    for layer in params["layers"]:
        if cfg.use_sparse_attn:
            res = sparse_attention_forward(
                layer["attn"], cfg, x, impl=impl,
                return_cache_max_len=return_cache_max_len,
                true_len=true_len,
            )
        else:
            res = _full_attn_forward(
                layer["attn"], cfg, x, return_cache_max_len=return_cache_max_len
            )
        if build_cache:
            attn_out, lc = res
            layer_caches.append(lc)
        else:
            attn_out = res
        x = x + attn_out
        x = x + _ff_apply(layer["ff"], cfg, x)
    x = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    logits = (x @ params["to_logits"].astype(dtype)).astype(jnp.float32)
    if not build_cache:
        return logits
    seq_len = (
        jnp.asarray(ids.shape[1], jnp.int32)
        if true_len is None
        else jnp.asarray(true_len, jnp.int32)
    )
    if seq_len.ndim:
        # per-row true lengths (batched serving admission): the pooled
        # engine tracks per-slot lengths itself, so the scalar cache
        # pointer is only an upper bound
        seq_len = jnp.max(seq_len)
    cache = ModelCache(layers=tuple(layer_caches), seq_len=seq_len)
    return logits, cache


def transformer_loss(params, cfg: ModelConfig, ids: jnp.ndarray, *, impl=None):
    """Cross-entropy on shifted ids (reference: transformer.py:329-330,411)."""
    inp, labels = ids[:, :-1], ids[:, 1:]
    logits = transformer_forward(params, cfg, inp, impl=impl)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return nll.mean()


def init_model_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.float32
) -> ModelCache:
    if cfg.use_sparse_attn:
        layers = tuple(
            init_decode_cache(cfg, batch, max_len, dtype) for _ in range(cfg.depth)
        )
    else:
        d, kvh = cfg.dim_head, cfg.kv_heads
        z = jnp.zeros((batch, kvh, max_len, 2 * d), dtype)
        layers = tuple(KVDecodeCache(kv=z) for _ in range(cfg.depth))
    return ModelCache(layers=layers, seq_len=jnp.asarray(0, jnp.int32))


def transformer_prefill(
    params, cfg: ModelConfig, ids: jnp.ndarray, max_len: int, *, impl=None,
    true_len: Optional[jnp.ndarray] = None,
):
    """Prefill: forward over the prompt, building the decode cache.

    ``true_len`` enables exact bucketed prefill over right-padded ids
    (one jit compile per bucket shape instead of per prompt length)."""
    return transformer_forward(
        params, cfg, ids, impl=impl, return_cache_max_len=max_len,
        true_len=true_len,
    )


def transformer_decode_step(
    params, cfg: ModelConfig, token: jnp.ndarray, cache: ModelCache
) -> Tuple[jnp.ndarray, ModelCache]:
    """One token step. token: [b] int32 -> logits [b, vocab], new cache."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = params["token_emb"][token][:, None].astype(dtype)   # [b, 1, dim]
    t = cache.seq_len
    new_layers = []
    for layer, lc in zip(params["layers"], cache.layers):
        # decode fns return the post-residual stream x + attn_out directly;
        # for gelu-FF sparse layers the decode step owns the FF block too
        # (run in-kernel on the fused path)
        if cfg.use_sparse_attn:
            ffp = layer["ff"] if cfg.ff_kind == "gelu" else None
            x, new_lc = sparse_attention_decode(
                layer["attn"], cfg, x, lc, t, ff_params=ffp
            )
            if ffp is None:
                x = x + _ff_apply(layer["ff"], cfg, x)
        else:
            x, new_lc = _full_attn_decode(layer["attn"], cfg, x, lc, t)
            x = x + _ff_apply(layer["ff"], cfg, x)
        new_layers.append(new_lc)
    x = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    logits = (x[:, 0] @ params["to_logits"].astype(dtype)).astype(jnp.float32)
    return logits, ModelCache(layers=tuple(new_layers), seq_len=t + 1)


def transformer_decode_step_ragged(
    params, cfg: ModelConfig, tokens: jnp.ndarray, layer_caches,
    seq_lens: jnp.ndarray, page_table=None,
) -> Tuple[jnp.ndarray, Tuple[LayerCache, ...]]:
    """One RAGGED token step over a slot pool: every row decodes at its own
    cache position.  tokens [b] int32, seq_lens [b] int32; layer_caches is
    a tuple of per-layer caches with leading [b] on every leaf.

    This is the continuous-batching engine's hot step (serve.py): unlike a
    vmap of ``transformer_decode_step`` (whose batched scalar-prefetch
    args force pallas_call into an explicit per-slot loop — one kernel
    launch per SLOT per layer), all per-position math here is batched
    natively, so the device-op count is independent of the pool size.

    With ``page_table`` ([b, max_pages] int32, shared by every layer) the
    kv leaf of each layer cache is a physical page pool instead of
    per-slot dense rows (serve.py paged mode; sparse-attention only).
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = params["token_emb"][tokens][:, None].astype(dtype)   # [b, 1, dim]
    t = jnp.asarray(seq_lens, jnp.int32)
    new_layers = []
    for layer, lc in zip(params["layers"], layer_caches):
        if cfg.use_sparse_attn:
            ffp = layer["ff"] if cfg.ff_kind == "gelu" else None
            x, new_lc = sparse_attention_decode(
                layer["attn"], cfg, x, lc, t, ff_params=ffp,
                page_table=page_table,
            )
            if ffp is None:
                x = x + _ff_apply(layer["ff"], cfg, x)
        else:
            if page_table is not None:
                raise NotImplementedError(
                    "paged KV serving is sparse-attention only"
                )
            x, new_lc = _full_attn_decode(layer["attn"], cfg, x, lc, t)
            x = x + _ff_apply(layer["ff"], cfg, x)
        new_layers.append(new_lc)
    x = rms_norm(x, params["norm_scale"], cfg.norm_eps)
    logits = (x[:, 0] @ params["to_logits"].astype(dtype)).astype(jnp.float32)
    return logits, tuple(new_layers)


def _sample_from_logits(logits, rng, temperature: float, filter_thres: float):
    """Greedy (temperature <= 0) or top-k + Gumbel (reference:
    transformer.py:44-61)."""
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    vocab = logits.shape[-1]
    k = max(1, -int(-((1.0 - filter_thres) * vocab) // 1))  # ceil
    vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    filtered = jnp.where(logits >= kth, logits, -jnp.inf)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20) + 1e-20)
    return jnp.argmax(filtered / temperature + gumbel, axis=-1).astype(jnp.int32)


def transformer_sample(
    params,
    cfg: ModelConfig,
    prompt: jnp.ndarray,
    gen_len: int,
    *,
    temperature: float = 0.0,
    filter_thres: float = 0.9,
    rng: Optional[jax.Array] = None,
    max_len: Optional[int] = None,
    impl=None,
):
    """Autoregressive generation: prefill + jitted scan of decode steps.

    prompt: [b, prompt_len] int32. Returns [b, gen_len] sampled ids.
    """
    b, prompt_len = prompt.shape
    stride = cfg.nsa.compress_block_sliding_stride if cfg.use_sparse_attn else 1
    need = prompt_len + gen_len
    if max_len is None:
        max_len = round_up_mult(need, max(stride, cfg.nsa.selection_block_size, 128))
    rng = jax.random.PRNGKey(0) if rng is None else rng

    logits, cache = transformer_prefill(params, cfg, prompt, max_len, impl=impl)
    first = _sample_from_logits(logits[:, -1], rng, temperature, filter_thres)

    if gen_len == 0:
        return jnp.zeros((b, 0), jnp.int32)
    rngs = jax.random.split(rng, gen_len)

    if cfg.use_sparse_attn and use_mega_decode(cfg, b):
        # whole-model megakernel scan: greedy samples in-kernel; tempered
        # sampling keeps one XLA sampling op per step over the kernel's
        # logits output
        mp = pack_mega_params(params, cfg)
        kv, ckv, ring = stack_decode_caches(cache)
        t0 = cache.seq_len

        def mega_step(carry, xs):
            i, rng_i = xs
            token, kv, ckv, ring = carry
            if temperature <= 0:
                _, nxt, kv, ckv, ring = transformer_decode_step_mega(
                    mp, cfg, token, kv, ckv, ring, t0 + i, greedy=True)
                nxt = nxt[:, 0]
            else:
                lg, kv, ckv, ring = transformer_decode_step_mega(
                    mp, cfg, token, kv, ckv, ring, t0 + i)
                nxt = _sample_from_logits(lg, rng_i, temperature, filter_thres)
            return (nxt, kv, ckv, ring), token

        (_, _, _, _), tokens = jax.lax.scan(
            mega_step, (first, kv, ckv, ring),
            (jnp.arange(gen_len), rngs))
        return jnp.moveaxis(tokens, 0, 1)  # [b, gen_len]

    def step(carry, rng_i):
        token, cache = carry
        logits, cache = transformer_decode_step(params, cfg, token, cache)
        nxt = _sample_from_logits(logits, rng_i, temperature, filter_thres)
        return (nxt, cache), token

    # each step emits the token it consumes, so the stacked outputs are
    # exactly the gen_len sampled tokens starting with `first`
    (_, _), tokens = jax.lax.scan(step, (first, cache), rngs, length=gen_len)
    return jnp.moveaxis(tokens, 0, 1)  # [b, gen_len]
