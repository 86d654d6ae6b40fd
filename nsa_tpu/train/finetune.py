"""Adapter fine-tuning / distillation trainer (reference F4).

Equivalent of the reference's HF-Trainer-based fine-tune loop (reference:
fine_tune/train_sparse_attention.py:416-482): bf16, cosine-with-restarts
schedule, max_grad_norm 0.1, label-masked losses — as one jitted optax
step over the adapter params only (the base model stays frozen).

Data: QA pairs serialized to bytes with the answer span supervised and the
prompt masked out (the reference's -100 label convention becomes an
explicit boolean mask; reference: fine_tune/utils.py:149-327).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, TrainConfig
from ..models.adapter import distillation_step_loss, init_adapters
from ..utils.metrics import MetricsLogger


def qa_to_tokens(
    pairs: List[Tuple[str, str]], seq_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Byte-serialize QA pairs; supervise only the answer span.

    Returns (ids [n, seq_len], label_mask [n, seq_len]) where mask=True on
    answer bytes (the reference masks prompt tokens to -100,
    fine_tune/utils.py:697-726).
    """
    ids, masks = [], []
    for q, a in pairs:
        prompt = f"{q}\nAnswer: ".encode()
        answer = f"{a}\n".encode()
        seq = (prompt + answer)[:seq_len]
        mask = ([False] * len(prompt) + [True] * len(answer))[:seq_len]
        pad = seq_len - len(seq)
        ids.append(list(seq) + [0] * pad)
        masks.append(mask + [False] * pad)
    return np.array(ids, np.int32), np.array(masks, bool)


def cosine_restarts_schedule(
    base_lr: float, steps: int, num_cycles: int = 3, min_frac: float = 0.0
):
    cycle_len = max(steps // max(num_cycles, 1), 1)
    def fn(step):
        pos = (step % cycle_len) / cycle_len
        return base_lr * (
            min_frac + (1 - min_frac) * 0.5 * (1 + jnp.cos(jnp.pi * pos))
        )
    return fn


def make_finetune_optimizer(lr: float, steps: int, grad_clip: float = 0.1):
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(cosine_restarts_schedule(lr, steps)),
    )


@partial(jax.jit, static_argnames=("cfg_student", "cfg_teacher", "optimizer",
                                   "mode"))
def finetune_step(
    adapters, opt_state, teacher_params, ids, label_mask,
    cfg_student: ModelConfig, cfg_teacher: ModelConfig, optimizer,
    mode: str = "kl_output_only",
):
    def loss_fn(ad):
        # next-token labels: shift inside the loss via ids/label alignment
        inp, labels = ids[:, :-1], ids[:, 1:]
        mask = label_mask[:, 1:]
        return distillation_step_loss(
            ad, teacher_params, cfg_student, cfg_teacher, inp,
            label_mask=mask, mode=mode,
        )

    loss, grads = jax.value_and_grad(loss_fn)(adapters)
    updates, opt_state = optimizer.update(grads, opt_state, adapters)
    adapters = optax.apply_updates(adapters, updates)
    return adapters, opt_state, loss


def run_finetune(
    teacher_params: Dict,
    cfg_teacher: ModelConfig,
    cfg_student: ModelConfig,
    pairs: List[Tuple[str, str]],
    num_steps: int = 200,
    batch_size: int = 8,
    seq_len: int = 256,
    lr: float = 1e-4,
    mode: str = "kl_output_only",
    seed: int = 0,
    logger: Optional[MetricsLogger] = None,
):
    """Train NSA adapters against a frozen teacher; returns adapters."""
    logger = logger or MetricsLogger()
    ids, masks = qa_to_tokens(pairs, seq_len + 1)
    adapters = init_adapters(
        jax.random.PRNGKey(seed), cfg_student, teacher_params
    )
    optimizer = make_finetune_optimizer(lr, num_steps)
    opt_state = optimizer.init(adapters)
    rng = np.random.RandomState(seed)
    loss = float("nan")
    for step in range(num_steps):
        sel = rng.randint(0, len(ids), size=batch_size)
        adapters, opt_state, loss_dev = finetune_step(
            adapters, opt_state, teacher_params,
            jnp.asarray(ids[sel]), jnp.asarray(masks[sel]),
            cfg_student, cfg_teacher, optimizer, mode,
        )
        loss = float(loss_dev)
        if step % 10 == 0:
            logger.log(step, finetune_loss=loss)
    return adapters, loss
