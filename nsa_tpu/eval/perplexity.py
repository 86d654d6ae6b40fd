"""Perplexity evaluation: in-distribution (byte corpus) + OOD (CS441 QA).

Equivalent of the reference's E2 benchmark (reference:
evaluation/perplexity.py): chunk the token stream into non-overlapping
windows of ``seq_len + 1``, accumulate summed NLL in nats over predicted
tokens, report PPL = exp(total_nll / total_tokens) (reference:
evaluation/perplexity.py:205-327).  Both the fast dense path and the exact
incremental KV-cache path are provided; unlike the reference (whose two
paths can disagree), ours are tested equivalent.

Output rows use the same CSV schema as the reference
(``ppl_step5000.csv``): model_type, seq_len, ppl_id, ppl_ood, ...
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.transformer import (
    transformer_decode_step,
    transformer_forward,
    transformer_prefill,
)
from ..ops.common import round_up_mult
from ..utils.metrics import CSVLogger


@partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, cfg: ModelConfig, window: jnp.ndarray, valid: jnp.ndarray):
    """Summed NLL over one batch of windows. window [b, L+1], valid [b, L]."""
    inp, labels = window[:, :-1], window[:, 1:]
    logits = transformer_forward(params, cfg, inp)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid), jnp.sum(valid)


def compute_ppl(
    params,
    cfg: ModelConfig,
    tokens: np.ndarray,
    seq_len: int,
    batch_size: int = 8,
    max_tokens: Optional[int] = 1_000_000,
) -> Tuple[float, int]:
    """PPL over non-overlapping windows of seq_len+1 (dense path).

    Matches the reference chunking (evaluation/perplexity.py:214-249):
    windows of seq_len+1 bytes, each contributing seq_len predictions; a
    final partial window is padded and masked.
    """
    if max_tokens is not None:
        tokens = tokens[: max_tokens]
    n = len(tokens)
    win = seq_len + 1
    num_windows = max((n + seq_len - 1) // seq_len, 1)

    total_nll, total_cnt = 0.0, 0
    windows, valids = [], []
    for w in range(num_windows):
        start = w * seq_len
        chunk = tokens[start:start + win]
        if len(chunk) < 2:
            continue
        pad = win - len(chunk)
        valid = np.zeros(win - 1, np.float32)
        valid[: len(chunk) - 1] = 1.0
        if pad:
            chunk = np.concatenate([chunk, np.zeros(pad, chunk.dtype)])
        windows.append(chunk)
        valids.append(valid)

    for i in range(0, len(windows), batch_size):
        wb = np.stack(windows[i:i + batch_size]).astype(np.int32)
        vb = np.stack(valids[i:i + batch_size])
        # pad the batch dimension so every call shares one compiled shape
        if len(wb) < batch_size:
            pad = batch_size - len(wb)
            wb = np.concatenate([wb, np.zeros((pad, win), np.int32)])
            vb = np.concatenate([vb, np.zeros((pad, win - 1), np.float32)])
        nll, cnt = _window_nll(params, cfg, jnp.asarray(wb), jnp.asarray(vb))
        total_nll += float(nll)
        total_cnt += int(cnt)

    ppl = float(np.exp(total_nll / max(total_cnt, 1)))
    return ppl, total_cnt


def compute_ppl_incremental(
    params,
    cfg: ModelConfig,
    tokens: np.ndarray,
    seq_len: int,
    max_tokens: Optional[int] = 4096,
) -> Tuple[float, int]:
    """Exact per-token PPL through the KV-cache decode path (reference's
    use_kv_cache mode, evaluation/perplexity.py:252-316).  O(n) decode
    steps; intended for correctness cross-checks, not speed."""
    if max_tokens is not None:
        tokens = tokens[: max_tokens]
    win = seq_len + 1
    total_nll, total_cnt = 0.0, 0

    stride = cfg.nsa.compress_block_sliding_stride if cfg.use_sparse_attn else 1
    blk = max(stride, cfg.nsa.selection_block_size if cfg.use_sparse_attn else 1)
    # % 8: decode caches require 8-aligned max_len (aligned kv-row DMA
    # windows in the fused kernels — see sparse_attention_forward)
    max_len = round_up_mult(win, math.lcm(blk, 8))

    step = jax.jit(lambda tok, c: transformer_decode_step(params, cfg, tok, c))

    for start in range(0, len(tokens) - 1, seq_len):
        chunk = tokens[start:start + win].astype(np.int32)
        if len(chunk) < 2:
            break
        logits, cache = transformer_prefill(
            params, cfg, jnp.asarray(chunk[:1])[None], max_len
        )
        logp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        total_nll += -float(logp[chunk[1]])
        total_cnt += 1
        for t in range(1, len(chunk) - 1):
            logits, cache = step(jnp.asarray(chunk[t])[None], cache)
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            total_nll += -float(logp[chunk[t + 1]])
            total_cnt += 1

    return float(np.exp(total_nll / max(total_cnt, 1))), total_cnt


def run_ppl_eval(
    params,
    cfg: ModelConfig,
    model_type: str,
    seq_len: int,
    id_tokens: np.ndarray,
    ood_tokens: np.ndarray,
    csv_path: Optional[str] = None,
    step: int = 0,
    max_id_tokens: int = 1_000_000,
) -> dict:
    ppl_id, n_id = compute_ppl(params, cfg, id_tokens, seq_len,
                               max_tokens=max_id_tokens)
    ppl_ood, n_ood = compute_ppl(params, cfg, ood_tokens, seq_len,
                                 max_tokens=None)
    row = {
        "model_type": model_type,
        "step": step,
        "seq_len": seq_len,
        "ppl_id": round(ppl_id, 4),
        "tokens_id": n_id,
        "ppl_ood": round(ppl_ood, 4),
        "tokens_ood": n_ood,
    }
    if csv_path:
        CSVLogger(csv_path).append(row)
    return row
