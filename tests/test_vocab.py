"""Vocabulary parity tests against goldens recorded from the reference."""

import json
import os

import pytest

from piano_a2s_tpu.symbolic.vocab import Labels, LabelsMultiple, LabelsSingle

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


def test_labels_multiple_extended_table_matches_reference():
    golden = _golden("vocab_labels_multiple.json")
    lm = LabelsMultiple(extended=True)
    assert lm.labels == golden["extended"]
    assert len(lm) == 173
    assert lm.pad == 147 and lm.sos == 145 and lm.eos == 146


def test_labels_multiple_base_table_matches_reference():
    golden = _golden("vocab_labels_multiple.json")
    lm = LabelsMultiple(extended=False)
    assert lm.labels == golden["base"]
    assert len(lm) == 148


def test_encode_decode_golden_samples():
    lm = LabelsMultiple(extended=True)
    for case in _golden("tokenizer_encode.json"):
        if "error" in case:
            with pytest.raises(Exception):
                lm.encode(case["text"])
        else:
            assert lm.encode(case["text"]) == case["tokens"], case["text"]
            assert lm.decode(case["tokens"]) == case["decoded"], case["text"]


def test_encode_rejects_malformed_note():
    lm = LabelsMultiple(extended=True)
    with pytest.raises(ValueError):
        lm.encode("4cX")


def test_roundtrip_reconstructs_text():
    lm = LabelsMultiple(extended=True)
    text = "4c 4e 4g\t2cc\n8.r\t[4A-"
    assert "".join(lm.decode(lm.encode(text))) == text.replace(" ", " ")


def test_char_labels():
    lb = Labels()
    assert len(lb.labels) == 38
    toks = lb.encode("4c\t2d")
    assert lb.decode(toks) == list("4c\t2d")
    assert lb.ctclen([1, 1, 2]) == 4


def test_labels_single_sizes_match_reference():
    assert len(LabelsSingle(extended=False).labels) == 9146
    assert len(LabelsSingle(extended=True).labels) == 13631


def test_labels_single_parity_spotcheck():
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import reference_modules
    _, ref_humdrum = reference_modules()
    for ext in (False, True):
        ours = LabelsSingle(extended=ext)
        ref = ref_humdrum.LabelsSingle(extended=ext)
        assert ours.labels == ref.labels
