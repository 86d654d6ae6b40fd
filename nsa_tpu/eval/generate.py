"""Generation-sample harness (reference E3: evaluation/
lightweight_output_example.py): generate greedy bytes from a fixed OOD QA
prompt and an in-distribution corpus snippet, append rows to CSV.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import DataConfig, ModelConfig
from ..models.transformer import transformer_sample
from ..train.data import load_byte_corpus, load_cs441_qa_bytes
from ..utils.metrics import CSVLogger

DEFAULT_OOD_PROMPT = (
    "Q: Which protocol uses prepare and commit phases across participants?\nAnswer: "
)


def decode_bytes(tokens: np.ndarray) -> str:
    return "".join(chr(max(32, int(t))) for t in tokens)


def generate_samples(
    params,
    cfg: ModelConfig,
    model_type: str,
    gen_len: int = 256,
    id_snippet: Optional[np.ndarray] = None,
    ood_prompt: str = DEFAULT_OOD_PROMPT,
    csv_path: Optional[str] = None,
    step: int = 0,
) -> dict:
    if id_snippet is None:
        _, val = load_byte_corpus(DataConfig())
        id_snippet = val[:64]
    ood_ids = np.frombuffer(ood_prompt.encode(), np.uint8).astype(np.int32)

    id_out = transformer_sample(
        params, cfg, jnp.asarray(id_snippet.astype(np.int32))[None], gen_len,
        temperature=0.0,
    )
    ood_out = transformer_sample(
        params, cfg, jnp.asarray(ood_ids)[None], gen_len, temperature=0.0
    )
    row = {
        "model_type": model_type,
        "step": step,
        "id_prompt": decode_bytes(id_snippet),
        "id_generation": decode_bytes(np.asarray(id_out)[0]),
        "ood_prompt": ood_prompt,
        "ood_generation": decode_bytes(np.asarray(ood_out)[0]),
    }
    if csv_path:
        CSVLogger(csv_path).append(row)
    return row
