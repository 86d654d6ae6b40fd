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


class TestVisualize:
    def test_plotters_produce_pngs(self, tmp_path):
        import csv as _csv

        from nsa_tpu.eval.visualize import (
            plot_efficiency,
            plot_ppl,
            plot_train_loss,
            ppl_markdown_table,
        )

        ppl_csv = tmp_path / "ppl.csv"
        with open(ppl_csv, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=["model_type", "seq_len", "ppl_id", "ppl_ood"])
            w.writeheader()
            w.writerow({"model_type": "full", "seq_len": 512, "ppl_id": 3.1, "ppl_ood": 5.6})
            w.writerow({"model_type": "sparse_mlp", "seq_len": 512, "ppl_id": 3.2, "ppl_ood": 5.7})
        eff_csv = tmp_path / "eff.csv"
        with open(eff_csv, "w", newline="") as f:
            cols = ["model_type", "batch_size", "prompt_len",
                    "prefill_tokens_per_s", "decode_tokens_per_s",
                    "kv_cache_saving_ratio"]
            w = _csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            for m in ("full", "sparse_mlp"):
                for pl_ in (500, 2000):
                    w.writerow({"model_type": m, "batch_size": 8, "prompt_len": pl_,
                                "prefill_tokens_per_s": 1e5, "decode_tokens_per_s": 2e4,
                                "kv_cache_saving_ratio": 0.9})
        loss_csv = tmp_path / "loss.csv"
        with open(loss_csv, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=["step", "time_s", "loss"])
            w.writeheader()
            for i in range(30):
                w.writerow({"step": i, "time_s": i, "loss": 3.0 - i * 0.01})

        assert "| full |" in ppl_markdown_table(str(ppl_csv))
        p1 = plot_ppl(str(ppl_csv), str(tmp_path / "ppl.png"))
        p2 = plot_efficiency(str(eff_csv), str(tmp_path / "eff.png"))
        p3 = plot_train_loss({"full": str(loss_csv)}, str(tmp_path / "loss.png"))
        import os as _os
        assert all(_os.path.getsize(p) > 1000 for p in (p1, p2, p3))


class TestEfficiencySweep:
    @pytest.mark.parametrize("sparse", [True, False])
    def test_bucketed_sweep_runs_and_logs(self, tmp_path, sparse):
        """run_efficiency_sweep: one prefill/decode program per batch size,
        rows for every (bs, prompt_len), sane positive throughputs."""
        from nsa_tpu.eval.efficiency import run_efficiency_sweep

        cfg = tiny_test_config(use_sparse_attn=sparse)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        csv_path = tmp_path / "eff.csv"
        rows = run_efficiency_sweep(
            params, cfg, "m", batch_sizes=[2], prompt_lens=[9, 17],
            gen_len=4, seq_len=64, csv_path=str(csv_path),
        )
        assert len(rows) == 2
        for r in rows:
            assert r["prefill_tokens_per_s"] > 0
            assert r["decode_tokens_per_s"] > 0
            assert r["max_len"] >= 64
        assert csv_path.exists()
        # padded-bucket rate must dominate the true-token rate
        assert all(
            r["prefill_bucket_tokens_per_s"] >= r["prefill_tokens_per_s"]
            for r in rows
        )
