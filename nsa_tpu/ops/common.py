"""Shared numerical helpers: norms, masking values, shape utilities."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def tpu_compiler_options():
    """Per-jit compile options for TPU backends (None on CPU).

    The fused decode kernels' per-program VMEM blocks exceed the default
    16 MiB scoped-vmem budget at batch 64 x max_len 4096 (decode_select_emit
    streams the [kvh, 520, 128] ckv cache block through VMEM); v5e has
    128 MiB of VMEM, so raising the scoped limit is safe.  XLA_FLAGS cannot
    carry this flag here: the env var is parsed client-side, which rejects
    TPU-only flags under the remote (axon) compile plugin — per-jit
    compiler_options ship through PJRT.  Same rule as the Pallas fwd+bwd
    training path (train/pretrain.py:tpu_compiler_options).
    """
    if jax.default_backend() == "cpu":
        return None
    # 64 MiB default.  The r5 attempt to default this to 96 MiB (for the
    # bs-16 megakernel's ~75 MB of launch-resident scratch) coincided
    # with ~13x degradations of programs run AFTER a megakernel in the
    # same process (full-attn decode: 13.2k tok/s isolated at either
    # limit, ~1.0k post-megakernel under the 96 MiB default, twice; the
    # r5 session measured full at 0.085 ms/step post-megakernel under
    # 64 MiB).  The backend also showed megakernel-free degradation
    # windows the same day, so the attribution is not airtight — but
    # 64 MiB is the long-proven default and nothing on the default path
    # needs more, so the bs-16 megakernel requires the explicit
    # NSA_SCOPED_VMEM_KIB=98304 opt-in (use_mega_decode gates on it).
    import os

    return {"xla_tpu_scoped_vmem_limit_kib":
            os.environ.get("NSA_SCOPED_VMEM_KIB", "65536")}


def lazy_jit(fn=None, /, **jit_kwargs):
    """``jax.jit`` with TPU compiler options resolved at FIRST CALL.

    ``compiler_options`` must depend on the backend, but decorating at
    import time would force backend init (and tests flip the platform to
    CPU after import).  The wrapper jits once, lazily, then delegates.
    """
    def wrap(f):
        cell = []

        @functools.wraps(f)
        def call(*a, **k):
            if not cell:
                opts = tpu_compiler_options()
                cell.append(jax.jit(
                    f, compiler_options=opts, **jit_kwargs
                ) if opts else jax.jit(f, **jit_kwargs))
            return cell[0](*a, **k)

        return call

    return wrap(fn) if fn is not None else wrap


def round_down_mult(n: int, mult: int) -> int:
    return (n // mult) * mult


def round_up_mult(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def mask_value(dtype) -> float:
    """Large negative fill for masked attention logits.

    The reference fills masked logits with ``-finfo.max // 10`` (reference:
    native_sparse_attention.py:168-171) so that masked compressed-attention
    logits stay finite when reused as importance scores; we keep the same
    behavior.
    """
    return float(jnp.finfo(dtype).max) * -0.1


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with learned scale (reference uses torch.nn.RMSNorm)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    normed = x * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(dtype)


def split_heads(x: jnp.ndarray, dim_head: int) -> jnp.ndarray:
    """[b, n, h*d] -> [b, h, n, d]"""
    b, n, hd = x.shape
    return x.reshape(b, n, hd // dim_head, dim_head).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, n, d] -> [b, n, h*d]"""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def repeat_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[b, kvh, n, d] -> [b, kvh*groups, n, d] (GQA head repeat).

    Matches the reference's einops ``repeat(t, 'b h ... -> b (h gh) ...')``
    layout where grouped query heads of one KV head are adjacent.
    """
    if groups == 1:
        return x
    b, h, n, d = x.shape
    x = jnp.broadcast_to(x[:, :, None], (b, h, groups, n, d))
    return x.reshape(b, h * groups, n, d)


def straight_through(t: jnp.ndarray, target) -> jnp.ndarray:
    """Value of ``target``, gradient of ``t`` (reference:
    native_sparse_attention.py:148-149)."""
    target = jnp.broadcast_to(jnp.asarray(target, t.dtype), t.shape)
    return t + jax.lax.stop_gradient(target - t)
