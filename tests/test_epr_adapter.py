"""virtuosoNet EPR adapter contract (piano_a2s_tpu/data/epr.py).

virtuosoNet itself is an external checkout (not present in this image),
so a fake checkout exercises the adapter: discovery order, the
reference's staging layout (temp/epr/xml.xml), keyword call semantics
(path_name + composer, z left at its 0 default), output resolution
(test_result/epr_by_isgn_z0.mid), cwd restoration, and the fail-fast
error with install instructions.
"""

import os
import textwrap

import pytest

from piano_a2s_tpu.data.epr import find_virtuosonet, make_epr_generator

_FAKE_MODEL_RUN = textwrap.dedent("""\
    import json, os

    def load_file_and_generate_performance(path_name, composer):
        # record the call for assertions; resolve relative to cwd like
        # the real package does
        assert os.path.isfile(os.path.join(path_name, "xml.xml"))
        os.makedirs("test_result", exist_ok=True)
        with open(os.path.join("test_result", "epr_by_isgn_z0.mid"),
                  "w") as f:
            f.write("MIDI:" + composer)
        with open("call_log.json", "w") as f:
            json.dump({"path_name": path_name, "composer": composer,
                       "cwd": os.getcwd()}, f)
    """)


@pytest.fixture()
def fake_checkout(tmp_path):
    root = tmp_path / "virtuosoNet"
    root.mkdir()
    (root / "model_run.py").write_text(_FAKE_MODEL_RUN)
    return str(root)


def test_discovery_order(fake_checkout, tmp_path, monkeypatch):
    assert find_virtuosonet(fake_checkout) == fake_checkout
    # An explicit-but-wrong path is authoritative: it must raise, never
    # fall back to some other checkout lying around.
    monkeypatch.setenv("VIRTUOSONET_PATH", fake_checkout)
    with pytest.raises(RuntimeError):
        find_virtuosonet(str(tmp_path / "nope"))
    assert find_virtuosonet() == fake_checkout
    monkeypatch.delenv("VIRTUOSONET_PATH")
    assert find_virtuosonet(workspace=str(tmp_path)) == fake_checkout


def test_missing_checkout_fails_fast_with_instructions(tmp_path):
    with pytest.raises(RuntimeError) as e:
        make_epr_generator(workspace=str(tmp_path / "absent"))
    msg = str(e.value)
    assert "virtuosoNet" in msg and "midi_syn='score'" in msg


def test_generate_contract(fake_checkout, tmp_path):
    import json
    xml = tmp_path / "chunk.xml"
    xml.write_text("<score/>")
    cwd_before = os.getcwd()
    gen = make_epr_generator(fake_checkout)
    out = gen(str(xml), "Chopin")
    assert os.getcwd() == cwd_before  # cwd restored
    import sys as _sys
    assert fake_checkout not in _sys.path  # no sys.path leak
    assert out == os.path.join(fake_checkout, "test_result",
                               "epr_by_isgn_z0.mid")
    assert open(out).read() == "MIDI:Chopin"
    log = json.load(open(os.path.join(fake_checkout, "call_log.json")))
    assert log["path_name"] == os.path.join("temp", "epr") + os.sep
    assert log["composer"] == "Chopin"
    assert log["cwd"] == fake_checkout  # model ran inside the checkout
    # staged copy of the score in the reference's layout
    assert open(os.path.join(fake_checkout, "temp", "epr",
                             "xml.xml")).read() == "<score/>"
    # a second call must not return a stale render
    (tmp_path / "chunk2.xml").write_text("<score2/>")
    out2 = gen(str(tmp_path / "chunk2.xml"), "Bach")
    assert open(out2).read() == "MIDI:Bach"


def test_xml_to_midi_epr_stage(fake_checkout, tmp_path):
    """End-to-end midi stage with midi_syn='epr': the adapter-produced
    render goes through MIDIProcess and lands in the dataset layout with
    composer/scaling recorded (reference: render.py:395-455)."""
    import json
    from piano_a2s_tpu.data import render as R

    # fake model: render = a real (valid) SMF long enough (8 s) for
    # MIDIProcess's [4 s, 12 s] length window
    from piano_a2s_tpu.symbolic.export import export_target
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    lm = LabelsMultiple(extended=True)
    bars = [[0, "4/4", lm.encode("1C"), lm.encode("1cc")] for _ in range(4)]
    real_mid = tmp_path / "performance.mid"
    export_target(bars, midi_path=str(real_mid))
    with open(os.path.join(fake_checkout, "model_run.py"), "w") as f:
        f.write(textwrap.dedent(f"""\
            import os, shutil
            def load_file_and_generate_performance(path_name, composer):
                os.makedirs("test_result", exist_ok=True)
                shutil.copy({str(real_mid)!r},
                            os.path.join("test_result",
                                         "epr_by_isgn_z0.mid"))
            """))

    feat = tmp_path / "feature.epr"
    base = feat / "test" / "1"
    for sub in ("xml", "target", "info"):
        (base / sub).mkdir(parents=True)
    (base / "xml" / "song0.xml").write_text("<score/>")
    (base / "target" / "song0.pkl").write_bytes(b"x")
    (base / "info" / "song0.json").write_text(json.dumps({"n_measures": 1}))

    gen = make_epr_generator(fake_checkout)
    R.xml_to_midi([1], str(feat), midi_syn="epr", seed=0,
                  epr_generate=gen)

    out_mid = base / "midi" / "song0.mid"
    assert out_mid.is_file()
    info = json.loads((base / "info" / "song0.json").read_text())
    # test-split version 1 -> composer Bach (reference render.py:398,426)
    assert info["composer"] == "Bach"
    assert "scaling" in info and "original_length" in info


def test_stale_output_not_returned(fake_checkout, tmp_path):
    """If the model produces nothing, the adapter must error rather than
    hand back a previous file."""
    (os.path.join(fake_checkout, "model_run.py"))
    with open(os.path.join(fake_checkout, "model_run.py"), "w") as f:
        f.write("def load_file_and_generate_performance(path_name, "
                "composer):\n    pass\n")
    xml = tmp_path / "x.xml"
    xml.write_text("<s/>")
    gen = make_epr_generator(fake_checkout)
    with pytest.raises(RuntimeError, match="no output"):
        gen(str(xml), "Mozart")
