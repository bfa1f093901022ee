"""Native kern tools (C++ via ctypes) vs pure-Python twins, plus semantic
checks of transposition / extraction / tie repair."""

import random

import pytest

from piano_a2s_tpu.symbolic.native import (
    _py_extract_spine, _py_tiefix, _py_transpose, extract_spine,
    native_available, parse_interval, tiefix_kern, transpose_kern)

KERN2 = ("**kern\t**kern\n*clefF4\t*clefG2\n*k[f#]\t*k[f#]\n*G:\t*G:\n"
         "*M4/4\t*M4/4\n=1\t=1\n4C 4E\t4cc\n[4D\t8dd#\n4D]\t8r\n"
         "=2\t=2\n2G\t2gg-\n*-\t*-\n")


def test_interval_parsing():
    assert parse_interval("m2") == (1, 1)
    assert parse_interval("M2") == (1, 2)
    assert parse_interval("-m3") == (-2, -3)
    assert parse_interval("M3") == (2, 4)
    assert parse_interval("P1") == (0, 0)
    assert parse_interval("0") == (0, 0)
    assert parse_interval("-M3") == (-2, -4)


def test_native_lib_loaded():
    assert native_available(), "libkern_tools.so missing — run native/build.sh"


def test_transpose_semantics():
    out = transpose_kern("**kern\n*k[f#]\n*G:\n4c 4e\n8B-\n4r\n*-\n", "M2")
    lines = out.splitlines()
    assert lines[1] == "*k[f#c#g#]"  # G(1#) + M2 -> A(3#)
    assert lines[2] == "*A:"
    assert lines[3] == "4d 4f#"      # c->d, e->f#
    assert lines[4] == "8c"          # B- -> C (up a major second)
    assert lines[5] == "4r"          # rests untouched


def test_transpose_down_minor_third():
    out = transpose_kern("**kern\n*k[]\n*C:\n4c\n4ee\n*-\n", "-m3")
    lines = out.splitlines()
    assert lines[1] == "*k[f#c#g#]"  # C + down m3 -> A major (3 sharps)
    assert lines[2] == "*A:"
    assert lines[3] == "4A"          # c down m3 -> A3
    assert lines[4] == "4cc#"        # e5 down m3 -> c#5


def test_transpose_octave_boundary():
    out = transpose_kern("**kern\n4b\n*-\n", "m2")
    assert out.splitlines()[1] == "4cc"  # b4 + m2 -> c5


def test_extract_spine_basic():
    out = extract_spine(KERN2, 2)
    lines = out.splitlines()
    assert lines[0] == "**kern"
    assert "4cc" in lines
    assert "4C 4E" not in out
    out1 = extract_spine(KERN2, 1)
    assert "4C 4E" in out1 and "4cc" not in out1


def test_extract_spine_with_split():
    data = ("**kern\t**kern\n=1\t=1\n*^\t*\n4c\t4d\t4e\n*v\t*v\t*\n"
            "2f\t2g\n*-\t*-\n")
    out = extract_spine(data, 1)
    assert "4c\t4d" in out
    assert "4e" not in out
    out2 = extract_spine(data, 2)
    assert out2.count("4e") == 1 and "4c" not in out2


def test_tiefix_dangling():
    data = "**kern\n[4c\n4c]\n[4d\n=\n4e_\n*-\n"
    out = tiefix_kern(data)
    lines = out.splitlines()
    assert lines[1] == "[4c" and lines[2] == "4c]"  # valid pair kept
    assert lines[3] == "4d"   # dangling open stripped
    assert lines[5] == "4e"   # orphan continue stripped


def test_native_matches_python_fuzz():
    rng = random.Random(0)
    durs = ["1", "2", "4", "8", "16"]
    pitches = ["C", "c", "cc", "B-", "f#", "AA", "d", "e-", "g", "r"]
    intervals = ["m2", "M2", "m3", "M3", "-m2", "-M2", "-m3", "-M3", "0"]
    for trial in range(120):
        lines = ["**kern\t**kern", "*k[f#c#]\t*k[f#c#]", "*D:\t*D:"]
        for m in range(1, 4):
            lines.append(f"={m}\t={m}")
            for _ in range(rng.randint(1, 4)):
                def note():
                    n = rng.choice(durs) + rng.choice(pitches)
                    r = rng.random()
                    if r < 0.2:
                        n = "[" + n
                    elif r < 0.4:
                        n += rng.choice(["]", "_"])
                    return n
                cols = [" ".join(note() for _ in range(rng.randint(1, 2)))
                        for _ in range(2)]
                lines.append("\t".join(cols))
        lines.append("*-\t*-")
        data = "\n".join(lines) + "\n"
        iv = rng.choice(intervals)
        assert transpose_kern(data, iv) == _py_transpose(data, iv), \
            (trial, iv)
        assert tiefix_kern(data) == _py_tiefix(data), trial
        for spine in (1, 2):
            assert extract_spine(data, spine) == \
                _py_extract_spine(data, spine), (trial, spine)


def test_transpose_roundtrip():
    data = "**kern\n*k[b-e-]\n4B-\n4e-\n4ff\n*-\n"
    up = transpose_kern(data, "M2")
    down = transpose_kern(up, "-M2")
    assert down == transpose_kern(data, "0")
