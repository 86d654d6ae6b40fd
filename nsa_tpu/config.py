"""Typed configuration for the NSA-TPU framework.

A single frozen dataclass hierarchy shared by training, evaluation and
serving.  This replaces the reference's script-as-config module constants
(reference: pretrain/train.py:31-102) and the "must match pretrain/train.py"
hyperparameter duplication across its evaluation CLIs (reference:
evaluation/perplexity.py:33-55, evaluation/efficiency.py:33-56).

All configs are hashable and can be passed as static arguments to
``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class NSAConfig:
    """Native Sparse Attention hyperparameters.

    Mirrors the constructor surface of the reference ``SparseAttention``
    (reference: sparse_attention/native_sparse_attention_pytorch/
    native_sparse_attention.py:188-336).
    """

    sliding_window_size: int = 64
    compress_block_size: int = 16
    compress_block_sliding_stride: int = 8
    selection_block_size: int = 16
    num_selected_blocks: int = 4
    num_compressed_mem_kv: int = 1
    # 'mlp' (GroupedMLP), 'conv' (grouped conv), 'attn' (attention pool),
    # 'mean' (parameter-free mean pool), 'shared_mlp' (the reference's
    # default inline MLP), 'single' (single projection), 'transformer'
    # (stacked mini-transformer with last-token readout).
    compressor: str = "mlp"
    compress_mlp_expand_factor: float = 1.0
    use_diff_topk: bool = True
    query_heads_share_selected_kv: bool = True

    def __post_init__(self):
        if self.compress_block_size < self.compress_block_sliding_stride:
            raise ValueError("compress_block_size must be >= stride")
        if self.compress_block_sliding_stride <= 0:
            raise ValueError("compress_block_sliding_stride must be > 0")
        if self.selection_block_size % self.compress_block_sliding_stride:
            raise ValueError(
                "selection_block_size must be divisible by "
                "compress_block_sliding_stride"
            )
        if self.num_compressed_mem_kv <= 0:
            raise ValueError("num_compressed_mem_kv must be > 0")
        if self.num_selected_blocks < 0:
            raise ValueError("num_selected_blocks must be >= 0")

    @property
    def compress_overlap_len(self) -> int:
        return self.compress_block_size - self.compress_block_sliding_stride

    @property
    def num_compress_per_fine(self) -> int:
        return self.selection_block_size // self.compress_block_sliding_stride


@dataclass(frozen=True)
class ModelConfig:
    """Byte-level GPT model configuration.

    Mirrors the reference ``Transformer`` (reference: sparse_attention/
    native_sparse_attention_pytorch/transformer.py:202-271) with the
    pretraining defaults from reference pretrain/train.py:31-75.
    """

    vocab_size: int = 256
    dim: int = 512
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    kv_heads: int = 4
    ff_expansion_factor: float = 4.0
    # 'gelu' (reference byte-GPT: Linear-GELU-Linear with bias) or
    # 'swiglu' (Llama-style gated FF, no bias; used by imported HF models)
    ff_kind: str = "gelu"
    causal: bool = True
    use_sparse_attn: bool = True
    nsa: NSAConfig = field(default_factory=NSAConfig)
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6
    # Compute dtype for activations ('float32' or 'bfloat16'); params are
    # always float32.
    dtype: str = "float32"
    # Attention implementation: 'reference' = pure-JAX oracle everywhere,
    # 'xla' = fused-friendly XLA ops, 'pallas' = Pallas kernels.
    attn_impl: str = "xla"
    # Query-chunk size for the chunked compressed+selection+fine pipeline
    # (memory is O(chunk) per step; 'reference' impl ignores this).
    attn_chunk_size: int = 128
    # Training forward as one lax.scan over stacked layer params (+ remat
    # per layer) instead of a Python unroll: every attention kernel lowers
    # ONCE regardless of depth, which keeps whole-model programs with
    # Pallas fwd+bwd kernels inside the TPU compiler's program-size budget
    # at seq 4096 (an unrolled depth-6 program fails the remote compile).
    scan_layers: bool = True
    # Batch tiles for the decode kernels (a larger tile = fewer sequential
    # grid programs but more VMEM per program; capped to a power-of-two
    # divisor of the batch at call time).
    # TPU sweep (scripts/tune_decode.py, bs 64 / max_len 4096): select 32 +
    # attend 64 is fastest (1.104 ms/step vs 1.143 at attend 16); select 64
    # exceeds VMEM (the ckv block is 16MB at tile 64).
    decode_select_tile: int = 32
    decode_attend_tile: int = 64

    def __post_init__(self):
        if self.heads % max(self.kv_heads, 1):
            raise ValueError("heads must be divisible by kv_heads")

    @property
    def num_grouped_queries(self) -> int:
        return self.heads // self.kv_heads

    @property
    def dim_inner(self) -> int:
        return self.heads * self.dim_head

    @property
    def dim_kv_inner(self) -> int:
        return self.kv_heads * self.dim_head

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Pretraining loop configuration (reference: pretrain/train.py:31-48)."""

    num_batches: int = 5000
    batch_size: int = 16
    grad_accum_every: int = 4
    learning_rate: float = 1e-4
    grad_clip_norm: float = 0.5
    seq_len: int = 4096
    # host readback cadence: a device->host scalar fetch costs up to
    # seconds through the remote-TPU tunnel, so loss is only materialized
    # every log_every steps (early stopping is checked at the same cadence)
    log_every: int = 20
    validate_every: int = 100
    generate_every: int = 500
    generate_length: int = 512
    prime_length: int = 64
    early_stop_loss: float = 0.2
    ckpt_every: int = 2500
    ckpt_dir: str = "./ckpt"
    seed: int = 0
    log_csv: Optional[str] = None


@dataclass(frozen=True)
class DataConfig:
    """enwik8-style byte corpus configuration (reference: pretrain/train.py:183-205)."""

    path: str = "data/enwik8.gz"
    num_bytes: int = 95_000_000
    train_bytes: int = 90_000_000
    # When the corpus file is unavailable, fall back to a deterministic
    # synthetic byte corpus so the pipeline stays runnable end to end.
    # 32 MB keeps the 5000-step seq-4096 budget (~164M tokens) at ~5
    # epochs, enough data that the sparse-vs-full comparison is not a
    # memorization contest.
    allow_synthetic_fallback: bool = True
    synthetic_bytes: int = 32_000_000


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for pjit/shard_map execution.

    The reference has no distributed execution at all (SURVEY.md section 2.4);
    here data parallelism and tensor parallelism over KV heads are
    first-class.  NSA selection is per-KV-head, so a `heads` mesh axis keeps
    all block-index gathers local to a shard.
    """

    data: int = 1
    heads: int = 1

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.data, self.heads)


def config_to_json(cfg) -> str:
    """Serialize any config dataclass (with nesting) to JSON."""
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def model_config_from_json(text: str) -> ModelConfig:
    raw = json.loads(text)
    nsa_raw = raw.pop("nsa", {})
    return ModelConfig(nsa=NSAConfig(**nsa_raw), **raw)


# Canonical configs matching the reference experiments --------------------

def reference_model_config(
    compressor: str = "mlp",
    use_sparse_attn: bool = True,
    **overrides,
) -> ModelConfig:
    """The exact model trained by the reference (pretrain/train.py:158-179)."""
    return ModelConfig(
        vocab_size=256,
        dim=512,
        depth=6,
        dim_head=64,
        heads=8,
        kv_heads=4,
        use_sparse_attn=use_sparse_attn,
        nsa=NSAConfig(
            sliding_window_size=64,
            compress_block_size=16,
            compress_block_sliding_stride=8,
            selection_block_size=16,
            num_selected_blocks=4,
            compressor=compressor,
            use_diff_topk=True,
            query_heads_share_selected_kv=True,
        ),
        **overrides,
    )


def tiny_test_config(**overrides) -> ModelConfig:
    """Small config for fast unit tests."""
    kw = dict(
        vocab_size=256,
        dim=64,
        depth=2,
        dim_head=16,
        heads=4,
        kv_heads=2,
        use_sparse_attn=True,
        nsa=NSAConfig(
            sliding_window_size=8,
            compress_block_size=4,
            compress_block_sliding_stride=2,
            selection_block_size=4,
            num_selected_blocks=2,
            compressor="mlp",
        ),
    )
    kw.update(overrides)
    return ModelConfig(**kw)
