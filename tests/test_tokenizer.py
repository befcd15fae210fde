"""Tokenizer wrapper tests (special tokens, padding sides, stop ids)."""

import numpy as np

from starvector_tpu.models.tokenizer import build_test_tokenizer


def test_special_tokens_added():
    tok = build_test_tokenizer("v1")
    for t in ("<svg-start>", "<image-start>", "<caption-start>"):
        assert tok.tokenizer.token_to_id(t) is not None
    tok2 = build_test_tokenizer("v2")
    assert tok2.tokenizer.token_to_id("<svg-end>") is not None
    assert tok2.padding_side == "left"
    assert tok.padding_side == "right"


def test_encode_decode_roundtrip():
    tok = build_test_tokenizer()
    text = '<svg viewBox="0 0 10 10"><rect/></svg>'
    out = tok([text])
    decoded = tok.decode(out["input_ids"][0][out["attention_mask"][0] == 1])
    assert decoded == text


def test_padding_sides():
    v1 = build_test_tokenizer("v1")
    v2 = build_test_tokenizer("v2")
    texts = ["ab", "abcdef"]
    o1 = v1(texts)
    o2 = v2(texts)
    assert o1["attention_mask"][0].tolist() == [1, 1, 0, 0, 0, 0]
    assert o2["attention_mask"][0].tolist() == [0, 0, 0, 0, 1, 1]
    # pads hold pad_token_id
    assert (o1["input_ids"][0][2:] == v1.pad_token_id).all()


def test_stop_sequence_ids():
    tok = build_test_tokenizer()
    ids = tok.stop_sequence_ids("</svg>")
    assert len(ids) >= 1
    assert tok.decode(np.asarray(ids)) == "</svg>"


def test_truncation():
    tok = build_test_tokenizer()
    out = tok(["abcdefghij"], max_length=4)
    assert out["input_ids"].shape[1] == 4
