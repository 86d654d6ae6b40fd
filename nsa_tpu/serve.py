"""Continuous-batching serving engine over the structured sparse KV cache.

The reference has no serving loop at all — its decode is a per-token
Python loop over one fixed batch (reference: transformer.py:273-312).
This engine provides the long-context serving story of the north star:

* a fixed pool of cache slots ([max_batch] leading dim on every cache
  leaf), each slot owning its own sequence length;
* ragged decode: one jitted step advances all active slots at their own
  positions (vmapped single-sequence NSA decode, so every per-position
  update/gather stays static-shape);
* bucketed prefill (prompt lengths rounded up to a small set of buckets,
  bounding XLA recompiles) writing directly into a slot;
* admission + retirement (max tokens or stop byte) between steps —
  continuous batching: new requests join as others finish, without
  draining the batch.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .models.transformer import (
    ModelCache,
    init_model_cache,
    transformer_decode_step,
    transformer_prefill,
)
from .ops.common import round_up_mult


@partial(jax.jit, static_argnames=("cfg",))
def ragged_decode_step(params, cfg: ModelConfig, tokens, cache_layers,
                       seq_lens):
    """Advance every slot one token at its own position.

    tokens [B] int32; cache_layers: pytree with leading [B] on every leaf;
    seq_lens [B] int32.  Returns (logits [B, vocab], new cache_layers).
    Inactive slots simply decode garbage into their own slot position and
    are ignored by the host (their seq_lens are not advanced).
    """
    def one(token, layers, t):
        # vmap strips the slot dim; re-add a batch dim of 1 for the step
        layers1 = jax.tree_util.tree_map(lambda x: x[None], layers)
        cache = ModelCache(layers=layers1, seq_len=t)
        logits, new_cache = transformer_decode_step(
            params, cfg, token[None], cache
        )
        new_layers = jax.tree_util.tree_map(lambda x: x[0], new_cache.layers)
        return logits[0], new_layers

    return jax.vmap(one, in_axes=(0, 0, 0))(tokens, cache_layers, seq_lens)


def _add_batch_dim(layers):
    """[leaf...] of batch-1 cache -> same leaves (batch dim already 1)."""
    return jax.tree_util.tree_map(lambda x: x, layers)


@dataclass
class Request:
    rid: int
    prompt: np.ndarray
    max_new_tokens: int
    stop_byte: Optional[int] = None
    generated: List[int] = field(default_factory=list)
    slot: Optional[int] = None
    feed_pos: int = 0  # next prompt index to feed (teacher forcing tail)


class ContinuousBatchingEngine:
    """Slot-based continuous batching for NSA (or full-attention) decode."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        max_batch: int = 8,
        max_len: int = 1024,
        prefill_buckets: Tuple[int, ...] = (64, 128, 256, 512),
        dtype=jnp.float32,
    ):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.buckets = tuple(sorted(prefill_buckets))
        # slot-pooled cache: leading dim = max_batch on every leaf
        pool = init_model_cache(cfg, max_batch, max_len, dtype)
        self.cache_layers = pool.layers
        self.seq_lens = np.zeros(max_batch, np.int32)
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.pending: deque = deque()
        self.finished: Dict[int, np.ndarray] = {}
        self._next_token = np.zeros(max_batch, np.int32)
        self._rid = 0

    # -- request API ------------------------------------------------------

    def add_request(
        self, prompt: np.ndarray, max_new_tokens: int,
        stop_byte: Optional[int] = None,
    ) -> int:
        rid = self._rid
        self._rid += 1
        self.pending.append(
            Request(rid, np.asarray(prompt, np.int32), max_new_tokens, stop_byte)
        )
        return rid

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return round_up_mult(n, self.buckets[-1])

    # -- engine steps -----------------------------------------------------

    def _admit(self):
        """Prefill pending requests into free slots.

        To keep the cache invariants exact (the compression run buffer
        depends on the true sequence length), prefill covers the largest
        bucket <= prompt length and the remaining prompt tail is
        teacher-forced through the ragged decode path.
        """
        for slot in range(self.max_batch):
            if self.slot_req[slot] is not None or not self.pending:
                continue
            req = self.pending.popleft()
            req.slot = slot
            n = len(req.prompt)
            m = max([b for b in self.buckets if b <= n] or [0])
            m = min(m, n)
            if m == 0:
                m = 1  # prefill at least the first token
            logits, cache = transformer_prefill(
                self.params, self.cfg, jnp.asarray(req.prompt[:m])[None],
                self.max_len,
            )
            self.cache_layers = jax.tree_util.tree_map(
                lambda pool, one: pool.at[slot].set(one[0]),
                self.cache_layers, cache.layers,
            )
            self.seq_lens[slot] = m
            if m < n:
                # teacher-force the rest of the prompt via decode steps
                self._next_token[slot] = int(req.prompt[m])
                req.feed_pos = m
            else:
                first = int(np.argmax(np.asarray(logits)[0, m - 1]))
                self._next_token[slot] = first
                req.generated.append(first)
                req.feed_pos = n
            self.slot_req[slot] = req
            self._maybe_retire(slot)

    def _maybe_retire(self, slot: int):
        req = self.slot_req[slot]
        if req is None:
            return
        done = len(req.generated) >= req.max_new_tokens or (
            req.stop_byte is not None
            and req.generated
            and req.generated[-1] == req.stop_byte
        )
        if done:
            self.finished[req.rid] = np.asarray(req.generated, np.int32)
            self.slot_req[slot] = None
            self.seq_lens[slot] = 0

    def step(self):
        """One engine iteration: admit, ragged-decode, retire."""
        self._admit()
        if self.num_active == 0:
            return
        logits, self.cache_layers = ragged_decode_step(
            self.params, self.cfg, jnp.asarray(self._next_token),
            self.cache_layers, jnp.asarray(self.seq_lens),
        )
        logits = np.asarray(logits)
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            n = len(req.prompt)
            self.seq_lens[slot] += 1
            req.feed_pos += 1
            if req.feed_pos < n:
                # still consuming the prompt tail (teacher forcing)
                self._next_token[slot] = int(req.prompt[req.feed_pos])
                continue
            nxt = int(np.argmax(logits[slot]))
            req.generated.append(nxt)
            self._next_token[slot] = nxt
            if self.seq_lens[slot] + 1 >= self.max_len:
                self.finished[req.rid] = np.asarray(req.generated, np.int32)
                self.slot_req[slot] = None
                self.seq_lens[slot] = 0
                continue
            self._maybe_retire(slot)

    def run(self, max_steps: int = 10_000) -> Dict[int, np.ndarray]:
        steps = 0
        while (self.pending or self.num_active) and steps < max_steps:
            self.step()
            steps += 1
        return dict(self.finished)
