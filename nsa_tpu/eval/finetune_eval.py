"""QA accuracy evaluation for adapted models (reference E6).

Equivalent of the reference's fine-tune evaluator (reference:
evaluation/fine_tune/evaluate_sparse_attention_finetune.py:25-160):
greedy generation per question, regex answer extraction, accuracy,
optional base-vs-adapted comparison, JSON results.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.adapter import adapted_forward


def extract_answer(text: str) -> Optional[str]:
    """First token-ish answer after 'Answer:' (reference extracts via
    regex over the generation, evaluate_sparse_attention_finetune.py:25-67)."""
    m = re.search(r"Answer:\s*([^\n]+)", text)
    if not m:
        return None
    return m.group(1).strip().lower()


def answer_matches(pred: Optional[str], gold: str) -> bool:
    """Exact-match scoring on the FIRST generated token.

    The round-2 ``pred.startswith(gold)`` rule credited degenerate
    repetitions ('bbbbbbbb' matched gold 'b'); the reference compares
    extracted choice letters exactly
    (evaluate_sparse_attention_finetune.py:25-67).  The first
    whitespace-delimited token, stripped of trailing punctuation, must
    equal the gold answer exactly."""
    if pred is None:
        return False
    gold = gold.strip().lower()
    parts = pred.split()
    if not parts:
        return False
    tok = parts[0].strip(".,;:!?)('\"")
    return tok == gold


def greedy_generate_reforward(
    forward_fn, prompt_ids: np.ndarray, gen_len: int
) -> np.ndarray:
    """Greedy generation by full re-forward each step (the reference's
    adapter line has no KV cache and does exactly this,
    sparse_attention_model.py:401-521)."""
    ids = prompt_ids.copy()
    for _ in range(gen_len):
        logits = np.asarray(forward_fn(jnp.asarray(ids)[None]))[0]
        nxt = int(np.argmax(logits[-1]))
        ids = np.concatenate([ids, [nxt]])
        if nxt == ord("\n"):
            break
    return ids[len(prompt_ids):]


def greedy_generate_fixed(
    forward_fn, prompt_ids: np.ndarray, gen_len: int, fixed_len: int
) -> np.ndarray:
    """Greedy generation with a FIXED-length buffer: causality makes the
    garbage suffix irrelevant, so every step reuses one compiled forward
    (the growing-length reforward above recompiles per length — fine on
    eager GPU, pathological through a jit/TPU tunnel)."""
    buf = np.zeros(fixed_len, np.int32)
    n0 = n = min(len(prompt_ids), fixed_len - 1)
    # overlong prompts keep their TAIL (the "...\nAnswer: " cue must
    # survive truncation or the model generates a question continuation)
    buf[:n] = prompt_ids[len(prompt_ids) - n:]
    for _ in range(gen_len):
        logits = np.asarray(forward_fn(jnp.asarray(buf)[None]))[0]
        nxt = int(np.argmax(logits[n - 1]))
        buf[n] = nxt
        n += 1
        if nxt == ord("\n") or n >= fixed_len:
            break
    return buf[n0:n]


def wilson_interval(correct: int, n: int, z: float = 1.96) -> Tuple[float, float]:
    """95% Wilson score interval for a binomial proportion — the honest
    error bar for small eval sets (84 CS441 questions); the reference
    reports bare accuracy with no interval
    (evaluate_sparse_attention_finetune.py:129-160)."""
    if n == 0:
        return (0.0, 1.0)
    p = correct / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def evaluate_qa_accuracy(
    adapters,
    teacher_params,
    cfg_student: ModelConfig,
    pairs: List[Tuple[str, str]],
    gen_len: int = 32,
    max_samples: int = 50,
    json_path: Optional[str] = None,
    compare_base=None,  # optional fn(ids)->logits for the frozen base
    fixed_len: Optional[int] = None,
) -> Dict:
    # params enter the jit as ARGUMENTS: a closure would inline ~19M f32
    # weights as HLO constants and blow the remote-compile request size
    # limit (HTTP 413) — same rule as eval/efficiency.py:measure_prefill
    def student_fn(ids):
        return _student_jit(adapters, teacher_params, ids)

    import jax as _jax
    _student_jit = _jax.jit(
        lambda ad, tp, ids: adapted_forward(ad, tp, cfg_student, ids)
    )
    # compare_base is used as-is: the caller must pass a fn whose params
    # are jit arguments (re-jitting it here would inline them again)
    if fixed_len is not None:

        def gen_with(fn, prompt):
            return greedy_generate_fixed(fn, prompt, gen_len, fixed_len)
    else:
        def gen_with(fn, prompt):
            return greedy_generate_reforward(fn, prompt, gen_len)

    results, correct, base_correct = [], 0, 0
    for q, a in pairs[:max_samples]:
        prompt = np.frombuffer(f"{q}\nAnswer: ".encode(), np.uint8).astype(np.int32)
        gen = gen_with(student_fn, prompt)
        text = f"{q}\nAnswer: " + bytes(gen.astype(np.uint8)).decode(errors="ignore")
        pred = extract_answer(text)
        hit = answer_matches(pred, a)
        correct += int(hit)
        row = {"question": q, "gold": a, "pred": pred, "correct": hit}
        if compare_base is not None:
            bgen = gen_with(compare_base, prompt)
            btext = f"{q}\nAnswer: " + bytes(bgen.astype(np.uint8)).decode(errors="ignore")
            bpred = extract_answer(btext)
            bhit = answer_matches(bpred, a)
            base_correct += int(bhit)
            row.update({"base_pred": bpred, "base_correct": bhit})
        results.append(row)

    n = len(results)
    out = {
        "accuracy": correct / max(n, 1),
        "accuracy_ci95": wilson_interval(correct, n),
        "num_samples": n,
        "results": results,
    }
    if compare_base is not None:
        out["base_accuracy"] = base_correct / max(n, 1)
        out["base_accuracy_ci95"] = wilson_interval(base_correct, n)
    if json_path:
        os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
        with open(json_path, "w") as f:
            json.dump(out, f, indent=2)
    return out
