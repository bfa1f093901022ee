"""Offline-evaluation pipeline: score/MIDI export from result JSONs, the
summarize functions, and graceful degradation without Java/MV2H."""

import json
import os
import pickle

from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
from piano_a2s_tpu.train.evaluate_offline import (get_mv2h_from_test,
                                                  summarize_syn_mv2h,
                                                  summarize_wer_and_f1)

LM = LabelsMultiple(extended=True)


def _make_results(output_folder, n=2):
    split_dir = os.path.join(output_folder, "results", "test")
    target_dir = os.path.join(output_folder, "targets")
    os.makedirs(split_dir, exist_ok=True)
    os.makedirs(target_dir, exist_ok=True)
    for i in range(n):
        target = [[0, "4/4", LM.encode("2C\n2G"), LM.encode("4c\n4d\n2e")]
                  for _ in range(5)]
        target_path = os.path.join(target_dir, f"t{i}.pkl")
        with open(target_path, "wb") as f:
            pickle.dump(target, f)
        pred = [[1, "3/4", LM.encode("2D\n2A"), LM.encode("4e\n4f\n2g")]
                for _ in range(5)]
        result = {"style": "pop", "soundfont": "Upright", "composer": "Bach",
                  "target_path": target_path, "pred": pred,
                  "wer_upper": 0.5, "wer_lower": 0.25, "key_f1": 1.0,
                  "time_f1": 0.5}
        with open(os.path.join(split_dir, f"0~song{i}~Upright.json"),
                  "w") as f:
            json.dump(result, f)


def test_export_and_error_handling_without_java(tmp_path):
    out = str(tmp_path / "out")
    _make_results(out)
    errors = get_mv2h_from_test(out, "test", mv2h_bin="/nonexistent")
    # Exports succeed for every clip, but a java engine without java is
    # a SCORER failure for each — recorded in errors.txt, never silently
    # dropped from the average (ADVICE r4: the old behavior printed
    # '0 errors' and summarized over 0 clips). The CLI auto-resolves to
    # the native engine instead of ever hitting this path.
    assert len(errors) == 2
    for sub in ("scores/pred", "scores/target", "midi/pred", "midi/target"):
        files = os.listdir(os.path.join(out, "results", sub))
        assert len(files) == 2, sub
    with open(os.path.join(out, "results", "errors.txt")) as f:
        assert len(f.read().splitlines()) == 2
    # no per-clip metric JSONs were written for the failed scorer runs
    assert os.listdir(os.path.join(out, "results", "mv2h")) == []
    # the native engine scores the SAME exports end-to-end
    errors = get_mv2h_from_test(out, "test", mv2h_bin="/nonexistent",
                                engine="native")
    assert errors == []
    assert len(os.listdir(os.path.join(out, "results", "mv2h"))) == 2


def test_summarize_wer_and_f1(tmp_path):
    out = str(tmp_path / "out")
    _make_results(out)
    metrics, n = summarize_wer_and_f1(out, "test")
    assert n == 2
    assert metrics["wer_upper"] == 0.5
    assert metrics["wer"] == (0.5 + 0.25) / 2
    assert metrics["key_f1"] == 1.0


def test_summarize_syn_mv2h_filters(tmp_path):
    out = str(tmp_path / "out")
    mv2h_dir = os.path.join(out, "results", "mv2h")
    os.makedirs(mv2h_dir)
    base = {"Multi-pitch": 0.9, "Voice": 0.8, "Meter": 0.7, "Value": 0.6,
            "Harmony": 0.5, "MV2H": 0.7}
    # version 0 = 'score' composer, Upright soundfont, pop chunk (uppercase)
    json.dump(base, open(os.path.join(mv2h_dir,
                                      "0~Song1~Upright_mv2h.json"), "w"))
    # version 1 = 'Bach', Salamander, classical chunk (lowercase)
    other = {k: v / 2 for k, v in base.items()}
    json.dump(other, open(os.path.join(mv2h_dir,
                                       "1~sonata2~Salamander_mv2h.json"),
                          "w"))
    metrics, four_way, n = summarize_syn_mv2h(out)
    assert n == 2
    m_score, _, n_score = summarize_syn_mv2h(out, composer="score")
    assert n_score == 1 and m_score["MV2H"] == 0.7
    m_up, _, n_up = summarize_syn_mv2h(out, soundfont="Upright")
    assert n_up == 1
    m_muse, _, n_muse = summarize_syn_mv2h(out, test_split="musesyn")
    assert n_muse == 1 and m_muse["MV2H"] == 0.7
    expected_4way = (base["Multi-pitch"] + base["Voice"] + base["Value"]
                     + base["Harmony"]) / 4
    assert abs(summarize_syn_mv2h(out, composer="score")[1]
               - expected_4way) < 1e-9
