"""Adapter / distillation line tests (reference F1-F3 equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_tpu.config import tiny_test_config
from nsa_tpu.models.adapter import (
    adapted_forward,
    distillation_loss,
    distillation_step_loss,
    init_adapters,
    verify_gradient_flow,
)
from nsa_tpu.models.transformer import init_transformer, transformer_forward
from nsa_tpu.train.finetune import (
    make_finetune_optimizer,
    qa_to_tokens,
    run_finetune,
)


@pytest.fixture(scope="module")
def setup():
    cfg_teacher = tiny_test_config(use_sparse_attn=False)
    cfg_student = tiny_test_config(use_sparse_attn=True)
    teacher = init_transformer(jax.random.PRNGKey(0), cfg_teacher)
    adapters = init_adapters(jax.random.PRNGKey(1), cfg_student, teacher)
    return cfg_teacher, cfg_student, teacher, adapters


class TestAdapter:
    def test_init_copies_teacher_projections(self, setup):
        _, _, teacher, adapters = setup
        for ad, layer in zip(adapters, teacher["layers"]):
            np.testing.assert_array_equal(
                np.asarray(ad["w_q"]), np.asarray(layer["attn"]["w_q"])
            )
            np.testing.assert_array_equal(
                np.asarray(ad["w_out"]), np.asarray(layer["attn"]["w_out"])
            )

    def test_adapted_forward_shapes(self, setup):
        cfg_t, cfg_s, teacher, adapters = setup
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 17), 0, 256)
        logits, hiddens = adapted_forward(
            adapters, teacher, cfg_s, ids, output_hidden_states=True
        )
        assert logits.shape == (2, 17, 256)
        assert len(hiddens) == cfg_s.depth + 1
        assert np.isfinite(np.asarray(logits)).all()

    def test_gradient_flow(self, setup):
        cfg_t, cfg_s, teacher, adapters = setup
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 17), 0, 256)
        ok, info = verify_gradient_flow(adapters, teacher, cfg_s, cfg_t, ids)
        assert ok, info


class TestDistillationLoss:
    def test_kl_zero_when_identical(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
        loss = distillation_loss(logits, logits, mode="kl_output_only")
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_kl_positive_when_different(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
        b = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        assert float(distillation_loss(a, b, mode="kl_output_only")) > 0

    def test_all_modes_finite(self, setup=None):
        s = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
        t = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        hs = [jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8))] * 3
        ht = [jax.random.normal(jax.random.PRNGKey(3), (2, 5, 8))] * 3
        labels = jnp.zeros((2, 5), jnp.int32)
        mask = jnp.ones((2, 5), bool)
        for mode in ["kl_output_only", "kl_logits", "mse_hidden", "mixed", "ce"]:
            loss = distillation_loss(
                s, t, mode=mode, labels=labels, label_mask=mask,
                student_hiddens=hs, teacher_hiddens=ht,
            )
            assert np.isfinite(float(loss)), mode

    def test_label_mask_excludes_prompt(self):
        s = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
        t = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
        m1 = jnp.array([[True, True, False, False]])
        full = distillation_loss(s, t, mode="kl_output_only", label_mask=None)
        masked = distillation_loss(s, t, mode="kl_output_only", label_mask=m1)
        assert float(full) != pytest.approx(float(masked), rel=1e-3)


class TestFinetune:
    def test_qa_tokens_mask_answer_only(self):
        ids, mask = qa_to_tokens([("What is 2+2", "4")], 64)
        text = bytes(ids[0].astype(np.uint8)).decode(errors="ignore")
        assert text.startswith("What is 2+2\nAnswer: ")
        prompt_len = len("What is 2+2\nAnswer: ".encode())
        assert not mask[0][:prompt_len].any()
        assert mask[0][prompt_len:prompt_len + 2].all()  # "4\n"

    def test_short_finetune_reduces_loss(self, setup):
        cfg_t, cfg_s, teacher, _ = setup
        pairs = [(f"Q{i}: what is the answer", "alpha") for i in range(8)]
        adapters, _ = run_finetune(
            teacher, cfg_t, cfg_s, pairs, num_steps=6, batch_size=4,
            seq_len=48, lr=3e-3,
        )
        # loss after a few steps should be finite and training ran
        assert len(adapters) == cfg_s.depth
