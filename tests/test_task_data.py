"""Fine-tune task loader / answer-extraction / collation tests (F4)."""

import json

import numpy as np
import pytest

from nsa_tpu.train.finetune import qa_to_tokens
from nsa_tpu.train.task_data import (
    TASKS,
    final_answer,
    format_chat,
    load_task,
    task_pairs,
)


@pytest.fixture
def task_dir(tmp_path):
    """Tiny fixture files in every reference task format."""
    gsm = [
        {"question": "Tom has 3 apples and buys 4 more. How many?",
         "answer": "He has 3+4=<<3+4=7>>7.\n#### 7"},
        {"question": "A pen costs $2. Price of 3 pens?",
         "answer": "3*2=6 dollars.\n#### 6"},
    ]
    for name in ("train_socratic.jsonl", "test_socratic.jsonl",
                 "aug-train.jsonl", "aug-dev.jsonl",
                 "gsm_style_train.jsonl", "gsm_style_dev.jsonl",
                 "gsm_style_test.jsonl"):
        with open(tmp_path / name, "w") as f:
            for row in gsm:
                f.write(json.dumps(row) + "\n")
    sqa = [
        {"question": f"Is the sky blue on day {i}?", "answer": "yes"}
        for i in range(10)
    ]
    (tmp_path / "strategyqa_train.json").write_text(json.dumps(sqa))
    (tmp_path / "date_understanding_gsm_style.json").write_text(
        json.dumps(gsm)
    )
    return str(tmp_path)


def test_all_tasks_load(task_dir):
    for task in TASKS:
        rows = load_task(task, task_dir, "train")
        assert rows and all(
            set(r) == {"question", "answer"} for r in rows
        ), task


def test_strategyqa_split(task_dir):
    train = load_task("strategyqa", task_dir, "train")
    test = load_task("strategyqa", task_dir, "test")
    assert len(train) == 8 and len(test) == 2  # 80/20 of 10


def test_final_answer_extraction():
    assert final_answer("gsm8k", "blah 3+4=7\n#### 7") == "7"
    assert final_answer("gsm8k", "#### 1,234") == "1234"
    assert final_answer("gsm8k", "the cost is $6.50") == "6.50"
    assert final_answer("strategyqa", "Yes, because ...") == "yes"
    assert final_answer("strategyqa", "no") == "no"


def test_chat_format_matches_ood_serialization():
    s = format_chat("Q?", "A")
    assert s == "Q?\nAnswer: A\n\n"
    assert format_chat("Q?") == "Q?\nAnswer: "


def test_pairs_collate_with_label_mask(task_dir):
    pairs = task_pairs("gsm8k", task_dir, "train")
    ids, mask = qa_to_tokens(pairs, seq_len=96)
    assert ids.shape == mask.shape == (2, 96)
    # the prompt span is masked out, the answer span supervised
    prompt_len = len(f"{pairs[0][0]}\nAnswer: ".encode())
    assert not mask[0, :prompt_len].any()
    assert mask[0, prompt_len]
    # ids decode back to the serialization
    text = bytes(ids[0][ids[0] != 0].tolist()).decode()
    assert text.startswith(pairs[0][0])


def test_answer_matches_exact_first_token():
    """Round-3 scoring: exact first-token match; degenerate repetitions of
    the gold letter must NOT score (VERDICT r2 weak #6)."""
    from nsa_tpu.eval.finetune_eval import answer_matches

    assert answer_matches("b", "b")
    assert answer_matches("b.", "b")
    assert answer_matches("b) because of X", "B")
    assert answer_matches("42", "42")
    assert not answer_matches("bbbbbbbbbbbbbbb", "b")
    assert not answer_matches("because", "b")
    assert not answer_matches("a", "b")
    assert not answer_matches(None, "b")
    assert not answer_matches("", "b")
