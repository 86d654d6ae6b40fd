"""Byte-corpus data pipeline.

Reimplements the reference's enwik8 pipeline (reference:
pretrain/train.py:183-205): first 95e6 bytes, 90/5 train/val split, random
crops of ``seq_len + 1`` bytes.  The enwik8.gz blob is absent from the
reference mount (its .MISSING_LARGE_BLOBS) and this environment has no
network egress, so when the corpus file is missing we fall back to a
deterministic synthetic byte corpus with enwik8-like statistics (Markovian
English-ish text + XML markup) so the full pipeline stays runnable and
reproducible.

Also provides the CS441 synthetic-QA byte serialization used for OOD
perplexity (reference: evaluation/perplexity.py:178-202).
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..config import DataConfig

# candidate locations for the CS441 QA json (read-only reference mount last)
CS441_CANDIDATES = [
    "data/cs441_synthetic_test.json",
    "data_collection/cs441_synthetic_test.json",
    "/root/reference/data_collection/cs441_synthetic_test.json",
]
CS441_TRAIN_CANDIDATES = [
    "data/cs441_synthetic_train.json",
    "data_collection/cs441_synthetic_train.json",
    "/root/reference/data_collection/cs441_synthetic_train.json",
]


def synthetic_byte_corpus(num_bytes: int, seed: int = 1234) -> np.ndarray:
    """Deterministic pseudo-text byte corpus (enwik8 stand-in).

    Generates wiki-markup-flavored text from a small word model so that
    byte statistics are non-trivial (whitespace, tags, punctuation,
    repeated words) while remaining fully reproducible offline.
    """
    rng = np.random.RandomState(seed)
    words = [
        "the", "of", "and", "in", "to", "a", "is", "was", "for", "on",
        "as", "by", "with", "from", "at", "which", "city", "state", "war",
        "history", "world", "people", "system", "time", "first", "new",
        "national", "university", "science", "attention", "sparse",
        "model", "language", "data", "network", "block", "memory",
    ]
    probs = np.array([1.0 / (i + 1) for i in range(len(words))])
    probs /= probs.sum()
    chunks: List[bytes] = []
    total = 0
    while total < num_bytes:
        n_words = int(rng.randint(5, 14))
        ws = rng.choice(len(words), size=n_words, p=probs)
        sent = " ".join(words[int(w)] for w in ws)
        if rng.rand() < 0.08:
            sent = "[[" + sent + "]]"
        elif rng.rand() < 0.05:
            sent = "&lt;ref&gt;" + sent + "&lt;/ref&gt;"
        sent = sent.capitalize() + ". "
        if rng.rand() < 0.03:
            sent += "\n== " + words[int(rng.randint(len(words)))].title() + " ==\n"
        b = sent.encode("utf-8")
        chunks.append(b)
        total += len(b)
    return np.frombuffer(b"".join(chunks)[:num_bytes], dtype=np.uint8).copy()


def load_byte_corpus(cfg: DataConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Return (train_bytes, val_bytes) uint8 arrays."""
    path = cfg.path
    if path and os.path.exists(path):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            data = np.frombuffer(f.read(cfg.num_bytes), dtype=np.uint8).copy()
    elif cfg.allow_synthetic_fallback:
        data = synthetic_byte_corpus(cfg.synthetic_bytes)
    else:
        raise FileNotFoundError(path)
    split = min(cfg.train_bytes, int(len(data) * 90 / 95))
    return data[:split], data[split:]


def sample_batch(
    data: np.ndarray, batch_size: int, seq_len: int, rng: np.random.RandomState
) -> np.ndarray:
    """Random crops of seq_len + 1 bytes -> [batch, seq_len + 1] int32."""
    hi = len(data) - seq_len - 1
    starts = rng.randint(0, hi, size=batch_size)
    idx = starts[:, None] + np.arange(seq_len + 1)[None, :]
    return data[idx].astype(np.int32)


def batch_iterator(
    data: np.ndarray, batch_size: int, seq_len: int, seed: int = 0
) -> Iterator[np.ndarray]:
    rng = np.random.RandomState(seed)
    while True:
        yield sample_batch(data, batch_size, seq_len, rng)


def _first_existing(paths) -> Optional[str]:
    for p in paths:
        if os.path.exists(p):
            return p
    return None


def load_cs441_qa_bytes(path: Optional[str] = None, split: str = "test") -> np.ndarray:
    """CS441 QA pairs serialized to a byte stream for OOD perplexity.

    Serialization matches the reference exactly: ``question + "\\nAnswer: "
    + answer + "\\n\\n"`` per pair, UTF-8 encoded (reference:
    evaluation/perplexity.py:178-202).  Falls back to a small built-in
    synthetic QA set when no file is available.
    """
    cands = CS441_TRAIN_CANDIDATES if split == "train" else CS441_CANDIDATES
    path = path or _first_existing(cands)
    if path is None:
        pairs = synthetic_qa_pairs(84 if split == "test" else 196)
    else:
        with open(path) as f:
            raw = json.load(f)
        pairs = []
        for item in raw:
            q = item.get("question", "")
            a = item.get("answer", "")
            pairs.append((q, a))
    text = "".join(f"{q}\nAnswer: {a}\n\n" for q, a in pairs)
    return np.frombuffer(text.encode("utf-8"), dtype=np.uint8).copy()


def synthetic_qa_pairs(n: int) -> List[Tuple[str, str]]:
    """Deterministic distributed-systems-flavored QA pairs (CS441 stand-in)."""
    topics = [
        ("What consistency model guarantees that reads reflect all prior writes",
         "linearizability"),
        ("Which protocol uses prepare and commit phases across participants",
         "two-phase commit"),
        ("What replication scheme tolerates f failures with 2f+1 replicas",
         "quorum replication"),
        ("Which algorithm elects a single leader among distributed nodes",
         "raft"),
        ("What technique shards a keyspace uniformly across nodes",
         "consistent hashing"),
        ("Which theorem limits consistency availability and partition tolerance",
         "the CAP theorem"),
        ("What mechanism orders events without synchronized clocks",
         "lamport timestamps"),
    ]
    out = []
    for i in range(n):
        q, a = topics[i % len(topics)]
        out.append((f"Q{i}: {q}?", a))
    return out
