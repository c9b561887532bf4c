"""Data pipeline: prompt construction, masking, LIMO branch, JSON/JSONL."""
import json

import numpy as np
import pytest

from sparse_matrix_tuning_tpu.data.prompts import generate_prompt
from sparse_matrix_tuning_tpu.data.sft import (
    build_sft_dataset, make_supervised_data, read_json_file,
)


class CharTok:
    """Deterministic toy tokenizer: one token per character."""
    eos_token = "#"
    pad_token_id = 0

    def __call__(self, strings, max_length=None, truncation=True,
                 return_attention_mask=False):
        out = []
        for s in strings:
            ids = [ord(c) % 251 + 1 for c in s]
            if truncation and max_length:
                ids = ids[:max_length]
            out.append(ids)
        return {"input_ids": out}


def test_prompt_template_shape():
    p = generate_prompt(instruction="Do the thing")
    assert p.startswith("<s> Below is an instruction")
    # the instruction-only branch carries TWO trailing spaces after
    # "request." (reference helper.py:55)
    assert "request.  \n" in p
    assert p.endswith("### Response:\n")
    # with-input branch has ONE trailing space and interpolates output
    p2 = generate_prompt(instruction="a", input="b", output="c")
    assert "request. \n" in p2 and "### Input:\nb" in p2 and p2.endswith("c")


def test_build_dataset_masks_prompt(tmp_path):
    data = [{"instruction": "say hi", "output": "hi"}]
    f = tmp_path / "d.json"
    f.write_text(json.dumps(data))
    ds = build_sft_dataset(str(f), CharTok(), max_seq_len=512)
    assert len(ds) == 1
    lab = ds.labels[0]
    ids = ds.input_ids[0]
    prompt_len = len(generate_prompt(instruction="say hi"))
    assert (lab[:prompt_len] == -100).all()
    # target part unmasked and equals ids
    np.testing.assert_array_equal(lab[prompt_len:], ids[prompt_len:])
    # eos appended (CharTok eos '#')
    assert ids[-1] == ord("#") % 251 + 1


def test_limo_branch(tmp_path):
    data = [{"question": "1+1?", "solution": "2 because math", "answer": "2"}]
    f = tmp_path / "limo_math.json"
    f.write_text(json.dumps(data))
    ds = build_sft_dataset(str(f), CharTok(), max_seq_len=512)
    ids = ds.input_ids[0]
    lab = ds.labels[0]
    # source is the raw question (no alpaca template)
    assert (lab[: len("1+1?")] == -100).all()
    assert len(ids) == len("1+1?") + len("2 because math") + 1  # +eos


def test_output_answer_key_fallback(tmp_path):
    data = [{"instruction": "q", "answer": "a</s>x"}]
    f = tmp_path / "d.json"
    f.write_text(json.dumps(data))
    ds = build_sft_dataset(str(f), CharTok(), max_seq_len=512)
    # '</s>' literal is stripped from targets (reference helper.py:166)
    tail = bytes(np.asarray(ds.input_ids[0][-3:]) - 1).decode(errors="ignore")
    assert len(ds.input_ids[0]) == len(generate_prompt(instruction="q")) + 3  # "ax#"


def test_read_jsonl(tmp_path):
    f = tmp_path / "d.jsonl"
    f.write_text('{"a": 1}\n{"a": 2}\n\n{"a": 3}\n')
    assert [d["a"] for d in read_json_file(str(f))] == [1, 2, 3]


def test_read_json_fallback_to_lines(tmp_path):
    f = tmp_path / "d.json"
    f.write_text('{"a": 1}\n{"a": 2}')  # invalid JSON array -> line fallback
    assert [d["a"] for d in read_json_file(str(f))] == [1, 2]


def test_eval_split_deterministic(tmp_path):
    data = [{"instruction": f"i{k}", "output": f"o{k}"} for k in range(20)]
    f = tmp_path / "d.json"
    f.write_text(json.dumps(data))
    t1, e1 = make_supervised_data(str(f), CharTok(), 512, 0.25, seed=7)
    t2, e2 = make_supervised_data(str(f), CharTok(), 512, 0.25, seed=7)
    assert len(t1) == 15 and len(e1) == 5
    for a, b in zip(t1.input_ids, t2.input_ids):
        np.testing.assert_array_equal(a, b)
