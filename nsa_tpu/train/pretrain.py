"""Byte-level GPT pretraining loop.

TPU-native equivalent of the reference pretraining script (reference:
pretrain/train.py:237-307): Adam, gradient accumulation, global-norm
clipping, periodic validation / generation / checkpointing, early stop —
but with a single jitted update step (grad-accum folded into one
``lax.scan`` inside jit rather than N eager backward calls), typed configs,
Orbax checkpoints with config metadata, and true resume (the reference has
none, SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DataConfig, ModelConfig, TrainConfig
from ..models.transformer import (
    init_transformer,
    transformer_loss,
    transformer_sample,
)
from ..utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from ..utils.metrics import MetricsLogger
from .data import batch_iterator, load_byte_corpus, sample_batch


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip_norm),
        optax.adam(train_cfg.learning_rate),
    )


def tpu_compiler_options() -> Optional[dict]:
    """Per-jit compile options for TPU backends.

    The Pallas backward kernels' per-program VMEM blocks exceed the
    default 16 MiB scoped-vmem budget at seq 4096 (the four lane-padded
    LSE/delta buffers dominate); v5e has 128 MiB of VMEM, so raising the
    scoped limit is safe and lets the fused fwd+bwd kernels be the real
    training path.  XLA_FLAGS cannot carry this flag here: the env var is
    parsed client-side, which rejects TPU-only flags under the remote
    (axon) compile plugin — per-jit compiler_options ship through PJRT.
    """
    if jax.default_backend() == "cpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "65536"}


@partial(jax.jit, static_argnames=("model_cfg", "optimizer", "accum"))
def _train_step_cpu(params, opt_state, batch, model_cfg: ModelConfig,
                    optimizer, accum: int):
    return _train_step_impl(params, opt_state, batch, model_cfg, optimizer,
                            accum)


_train_step_tpu = None


def train_step(params, opt_state, batch, model_cfg: ModelConfig,
               optimizer, accum: int):
    opts = tpu_compiler_options()
    if opts is None:
        return _train_step_cpu(params, opt_state, batch, model_cfg,
                               optimizer, accum)
    global _train_step_tpu
    if _train_step_tpu is None:
        _train_step_tpu = partial(
            jax.jit, static_argnames=("model_cfg", "optimizer", "accum"),
            compiler_options=opts,
        )(_train_step_impl)
    return _train_step_tpu(params, opt_state, batch, model_cfg, optimizer,
                           accum)


def _train_step_impl(params, opt_state, batch, model_cfg: ModelConfig,
                     optimizer, accum: int):
    """One optimizer step over ``accum`` micro-batches.

    batch: [accum, micro_batch, seq_len + 1] int32.
    """
    def micro(carry, micro_batch):
        loss, grads = jax.value_and_grad(transformer_loss)(
            params, model_cfg, micro_batch
        )
        g_acc, l_acc = carry
        g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
        return (g_acc, l_acc + loss), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (grads, loss_sum), _ = jax.lax.scan(micro, (zero, 0.0), batch)
    grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss_sum / accum


@partial(jax.jit, static_argnames=("model_cfg",))
def eval_step(params, batch, model_cfg: ModelConfig):
    return transformer_loss(params, model_cfg, batch)


def decode_bytes(tokens: np.ndarray) -> str:
    return "".join(chr(max(32, int(t))) for t in tokens)


def run_pretrain(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    data_cfg: Optional[DataConfig] = None,
    resume: bool = True,
    logger: Optional[MetricsLogger] = None,
) -> Tuple[dict, float]:
    """Train; returns (params, last train loss)."""
    data_cfg = data_cfg or DataConfig()
    logger = logger or MetricsLogger(csv_path=train_cfg.log_csv)

    train_data, val_data = load_byte_corpus(data_cfg)
    print(f"corpus: {len(train_data):,} train / {len(val_data):,} val bytes")

    rng = np.random.RandomState(train_cfg.seed)
    micro = train_cfg.batch_size
    accum = train_cfg.grad_accum_every
    seq = train_cfg.seq_len

    params = init_transformer(jax.random.PRNGKey(train_cfg.seed), model_cfg)
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(params)
    start_step = 0

    ckpt = latest_checkpoint(train_cfg.ckpt_dir) if resume else None
    if ckpt:
        (state), meta = restore_checkpoint(
            ckpt, {"params": params, "opt_state": opt_state}
        )
        params, opt_state = state["params"], state["opt_state"]
        start_step = meta["step"]
        print(f"resumed from {ckpt} at step {start_step}")

    loss = float("nan")
    t_start = time.time()
    t_window = t_start
    last_step = start_step          # actual steps completed (early stop aware)
    last_export_step = -1           # step stamped on the newest npz export
    for step in range(start_step, train_cfg.num_batches):
        last_step = step + 1
        batch = np.stack(
            [sample_batch(train_data, micro, seq, rng) for _ in range(accum)]
        )
        params, opt_state, loss_dev = train_step(
            params, opt_state, jnp.asarray(batch), model_cfg, optimizer, accum
        )
        # loss stays on device: a synchronous scalar readback costs up to
        # seconds per call on a remote-TPU tunnel, so fetch at log cadence
        do_log = (step + 1) % train_cfg.log_every == 0
        if do_log:
            loss = float(loss_dev)
            now = time.time()
            tokens_per_s = micro * accum * seq * train_cfg.log_every / max(
                now - t_window, 1e-6
            )
            t_window = now
            logger.log(step, loss=loss, tokens_per_s=round(tokens_per_s))

        if do_log and loss <= train_cfg.early_stop_loss:
            print(f"early stop at step {step}: loss {loss:.4f}")
            save_checkpoint(
                train_cfg.ckpt_dir, step + 1, params, opt_state, model_cfg,
                extra={"loss": loss, "early_stop": True},
            )
            _export_npz(train_cfg, params, model_cfg, step + 1, loss)
            last_export_step = step + 1
            break

        if (step + 1) % train_cfg.ckpt_every == 0:
            path = save_checkpoint(
                train_cfg.ckpt_dir, step + 1, params, opt_state, model_cfg,
                extra={"loss": loss},
            )
            print(f"saved checkpoint: {path}")
            # Refresh the durable npz export at every save, not just run
            # end: host migrations have wiped the gitignored Orbax tree
            # mid-run twice (RESULTS.md); a partial-step export that can
            # be committed beats a perfect one that never got written.
            _export_npz(train_cfg, params, model_cfg, step + 1, loss)
            last_export_step = step + 1

        if step % train_cfg.validate_every == 0:
            vbatch = sample_batch(val_data, micro, seq, rng)
            vloss = float(eval_step(params, jnp.asarray(vbatch), model_cfg))
            logger.log(step, valid_loss=vloss)

        if train_cfg.generate_every and step % train_cfg.generate_every == 0 and step > 0:
            start = rng.randint(0, len(val_data) - train_cfg.prime_length - 1)
            prime = val_data[start:start + train_cfg.prime_length].astype(np.int32)
            sampled = transformer_sample(
                params, model_cfg, jnp.asarray(prime)[None],
                train_cfg.generate_length, temperature=0.0,
            )
            print("--- prime ---")
            print(decode_bytes(prime))
            print("--- sample ---")
            print(decode_bytes(np.asarray(sampled)[0]))

    # Durable single-file export next to the (gitignored, migration-prone)
    # Orbax tree: ckpt_export/<run-name>.npz is small enough to commit, so
    # the trained weights survive host migrations (lost twice: RESULTS.md).
    # Stamp the ACTUAL last completed step (early stop breaks before
    # num_batches); skip when the in-loop export already covers it.
    if last_export_step != last_step:
        _export_npz(train_cfg, params, model_cfg, last_step, loss)

    return params, loss


def _export_npz(train_cfg, params, model_cfg, step: int, loss: float) -> None:
    from ..utils.checkpoint import export_params_npz

    # bf16-cast the float leaves: every consumer of this artifact (bench,
    # serving, eval sweeps) runs the model in bf16 anyway, and the f32
    # master copy is 285 MB (the GroupedMLP compressor w1 dominates) —
    # too heavy to keep committing.  Orbax retains full f32 for resume.
    export = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        jax.device_get(params),
    )
    export_name = os.path.basename(os.path.normpath(train_cfg.ckpt_dir))
    export_path = export_params_npz(
        os.path.join("ckpt_export", f"{export_name}.npz"),
        export, model_cfg,
        extra={"step": step, "loss": loss, "export_dtype": "bfloat16"},
    )
    print(f"exported weights: {export_path} (step {step})")
