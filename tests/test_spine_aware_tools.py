"""Spine-aware kern tools: ties across splits, non-kern spine protection,
unsupported-manipulator rejection — C++ and Python twins must agree."""

import pytest

from piano_a2s_tpu.symbolic.native import (_py_extract_spine, _py_tiefix,
                                           _py_transpose, extract_spine,
                                           tiefix_kern, transpose_kern)


def test_tie_across_spine_split_survives():
    # Spine 2 carries a tie; spine 1 splits mid-passage, shifting spine 2's
    # COLUMN from 1 to 2. The chain must follow the spine, not the column.
    data = ("**kern\t**kern\n"
            "4C\t[2c\n"
            "*^\t*\n"
            "4D\t4E\t2c_\n"
            "*v\t*v\t*\n"
            "4F\t2c]\n"
            "*-\t*-\n")
    for fn in (tiefix_kern, _py_tiefix):
        out = fn(data)
        assert "[2c" in out, fn.__name__   # open kept
        assert "2c_" in out, fn.__name__   # continue kept
        assert "2c]" in out, fn.__name__   # close kept


def test_non_kern_spines_not_transposed():
    data = ("**kern\t**dynam\n"
            "4c\tf\n"
            "4d\tpp\n"
            "*-\t*-\n")
    for fn in (transpose_kern, _py_transpose):
        out = fn(data, "M2")
        lines = out.splitlines()
        assert lines[1] == "4d\tf", fn.__name__   # 'f' stays forte
        assert lines[2] == "4e\tpp", fn.__name__


def test_unsupported_manipulators_rejected():
    data = "**kern\t**kern\n*x\t*x\n4c\t4d\n*-\t*-\n"
    for fn in (extract_spine, _py_extract_spine):
        with pytest.raises(ValueError):
            fn(data, 1)


def test_cross_spine_merge_tracking():
    # '*v\t*v' merging spines 1 and 2 into one column: later columns must
    # be attributed to the surviving spine, not duplicated.
    data = ("**kern\t**kern\t**kern\n"
            "4C\t4E\t4G\n"
            "*v\t*v\t*\n"
            "2D\t2A\n"
            "*-\t*-\n")
    for fn in (extract_spine, _py_extract_spine):
        out3 = fn(data, 3)
        assert "4G" in out3 and "2A" in out3, fn.__name__
        assert "2D" not in out3, fn.__name__
        out1 = fn(data, 1)
        assert "2D" in out1 and "2A" not in out1, fn.__name__


def test_parallel_unison_ties_in_split_branches():
    # Two simultaneous same-pitch ties in the two branches of a split
    # spine: each branch's chain must stay intact (branch identity), and
    # extraction must still return BOTH branches (root identity).
    data = ("**kern\n"
            "4d\n"
            "*^\n"
            "[4c\t[4c\n"
            "4c]\t4c]\n"
            "*v\t*v\n"
            "4e\n"
            "*-\n")
    for fn in (tiefix_kern, _py_tiefix):
        out = fn(data)
        assert "[4c\t[4c" in out, fn.__name__
        assert "4c]\t4c]" in out, fn.__name__
    for fn in (extract_spine, _py_extract_spine):
        out = fn(data, 1)
        assert "[4c\t[4c" in out, fn.__name__  # both branches extracted


def test_transpose_rejects_unsupported_manipulators():
    data = "**kern\t**kern\n*+\t*\n4c\t4d\t4e\n*-\t*-\t*-\n"
    for fn in (transpose_kern, tiefix_kern):
        with pytest.raises(ValueError):
            fn(data) if fn is tiefix_kern else fn(data, "M2")


def test_transpose_keysig_only_on_kern_spines():
    data = ("**kern\t**text\n"
            "*k[f#]\t*\n"
            "4c\thello\n"
            "*-\t*-\n")
    for fn in (transpose_kern, _py_transpose):
        out = fn(data, "M2")
        assert "*k[f#c#g#]" in out, fn.__name__
        assert "hello" in out, fn.__name__
