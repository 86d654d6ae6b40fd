"""Evaluation-suite tests: PPL chunking, CSV schema, plotters, data gen."""

import os

import jax
import numpy as np
import pytest

from nsa_tpu.config import tiny_test_config
from nsa_tpu.eval.perplexity import compute_ppl, compute_ppl_incremental
from nsa_tpu.eval.efficiency import kv_cache_saving_ratio
from nsa_tpu.eval.finetune_eval import extract_answer
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.train.data import load_cs441_qa_bytes, synthetic_byte_corpus
from nsa_tpu.train.data_collection import generate_synthetic_qa, split_train_test


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestPerplexity:
    def test_uniform_model_ppl_near_vocab(self, model):
        cfg, params = model
        tokens = synthetic_byte_corpus(2000)
        ppl, cnt = compute_ppl(params, cfg, tokens, seq_len=32)
        assert cnt == len(tokens) - 1  # every transition predicted exactly once
        assert 10 < ppl < 1500

    def test_dense_matches_incremental(self, model):
        """Dense chunked PPL == exact per-token KV-cache PPL (the reference
        never tests its two paths against each other)."""
        cfg, params = model
        tokens = synthetic_byte_corpus(140)
        ppl_d, cnt_d = compute_ppl(params, cfg, tokens, seq_len=16)
        ppl_i, cnt_i = compute_ppl_incremental(params, cfg, tokens, seq_len=16)
        assert cnt_d == cnt_i
        assert ppl_d == pytest.approx(ppl_i, rel=2e-3)

    def test_counts_partial_final_window(self, model):
        cfg, params = model
        tokens = synthetic_byte_corpus(50)
        _, cnt = compute_ppl(params, cfg, tokens, seq_len=32)
        assert cnt == 49  # every transition predicted exactly once


class TestKVSaving:
    def test_formula(self):
        cfg = tiny_test_config()
        nsa = cfg.nsa
        selected = nsa.sliding_window_size + nsa.num_selected_blocks * nsa.selection_block_size
        assert kv_cache_saving_ratio(cfg, 1000) == pytest.approx(1 - selected / 1000)
        assert kv_cache_saving_ratio(cfg, selected) == 0.0


class TestAnswerExtraction:
    def test_extracts(self):
        assert extract_answer("Q\nAnswer: Raft\nmore") == "raft"
        assert extract_answer("no answer here") is None


class TestDataCollection:
    def test_generate_and_split(self):
        data = generate_synthetic_qa(280)
        assert len(data) == 280
        assert len({d["question"] for d in data}) == 280  # all unique
        splits = split_train_test(data)
        assert len(splits["train"]) == 196 and len(splits["test"]) == 84

    def test_cs441_serialization_schema(self):
        b = load_cs441_qa_bytes()
        text = bytes(b).decode()
        assert "\nAnswer: " in text and text.endswith("\n\n")
