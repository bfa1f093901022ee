"""Kern/Humdrum core parity: fuzz synthetic kern scores through our parser
and the live reference, comparing every transform's output."""

import random

import pytest

from conftest import reference_modules
from piano_a2s_tpu.symbolic import humdrum as H

DUR = ["1", "2", "4", "8", "16", "4.", "8."]
PITCH = ["C", "D", "E", "F", "G", "A", "B", "c", "d", "e", "f", "g", "a",
         "b", "cc", "dd", "CC", "c#", "B-", "e-", "g#"]


def _note(rng, allow_decorations=True):
    if rng.random() < 0.15:
        return rng.choice(DUR) + "r"
    n = rng.choice(DUR) + rng.choice(PITCH)
    if allow_decorations:
        if rng.random() < 0.2:
            n = "[" + n
        elif rng.random() < 0.2:
            n = n + rng.choice(["]", "_"])
        if rng.random() < 0.1:
            n = n + ";"
        if rng.random() < 0.15:  # beams/slur decorations the cleaner strips
            n = n + rng.choice(["J", "L", "\\", "/", "(", ")"])
    return n


def _chord(rng):
    k = rng.choice([1, 1, 1, 2, 3])
    return " ".join(_note(rng) for _ in range(k))


def _score(rng, n_measures=6, with_splits=True):
    lines = ["**kern", "*clefF4", "*k[f#c#]", "*M4/4", "*MM96"]
    split = False
    for m in range(1, n_measures + 1):
        lines.append(f"={m}" if not split else f"={m}\t={m}")
        for _ in range(rng.randint(2, 5)):
            if with_splits and not split and rng.random() < 0.15:
                lines.append("*^")
                split = True
            elif split and rng.random() < 0.3:
                lines.append("*v\t*v")
                split = False
            lines.append(_chord(rng) if not split
                         else _chord(rng) + "\t" + _chord(rng))
    if split:
        lines.append("*v\t*v")
    lines.append("=")
    lines.append("*-")
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def ref():
    _, ref_humdrum = reference_modules()
    return ref_humdrum


def _both(data, ref):
    return H.Kern(data=data), ref.Kern(data=data)


def test_parse_structure(ref):
    rng = random.Random(0)
    for _ in range(50):
        data = _score(rng)
        ours, theirs = _both(data, ref)
        assert ours.header == theirs.header
        assert ours.body == theirs.body
        assert ours.footer == theirs.footer
        assert ours.first_line == theirs.first_line
        assert ours.spines.dump() == theirs.spines.dump()


def test_clean_parity(ref):
    rng = random.Random(1)
    for trial in range(100):
        data = _score(rng)
        ours, theirs = _both(data, ref)
        ok_o = ours.clean()
        ok_t = theirs.clean()
        assert ok_o == ok_t, f"trial {trial}"
        if ok_o[0]:
            assert ours.dump() == theirs.dump(), f"trial {trial}"


def test_tosequence_parity(ref):
    rng = random.Random(2)
    for trial in range(100):
        data = _score(rng)
        ours, theirs = _both(data, ref)
        ours.clean()
        theirs.clean()
        assert ours.tosequence() == theirs.tosequence(), f"trial {trial}"


def test_split_parity(ref):
    rng = random.Random(3)
    for trial in range(60):
        data = _score(rng, n_measures=rng.randint(6, 12))
        ours, theirs = _both(data, ref)
        ours.clean()
        theirs.clean()
        for chunk_size, stride in [(5, 2), (5, 5), (3, 1)]:
            o2 = H.Kern(data=ours.dump())
            t2 = ref.Kern(data=theirs.dump())
            ours_chunks = o2.split(chunk_size, stride)
            try:
                ref_chunks = t2.split(chunk_size, stride)
            except IndexError:
                assert ours_chunks == [] or len(ours_chunks) <= 1
                continue
            assert [c.dump() for c in ours_chunks] == \
                [c.dump() for c in ref_chunks], (trial, chunk_size, stride)


def test_sort_chords_and_voices_parity(ref):
    rng = random.Random(4)
    for trial in range(60):
        data = _score(rng)
        ours, theirs = _both(data, ref)
        ours.clean()
        theirs.clean()
        so = H.sort_chords(ours)
        st = ref.sort_chords(theirs)
        assert so.dump() == st.dump(), trial
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            vo = H.sort_voices(so)
            vt = ref.sort_voices(st)
        if vo is False or vt is False:
            assert (vo is False) == (vt is not vt.__class__ or vt is False)
        else:
            assert vo.dump() == vt.dump(), trial


def test_process_voices_parity(ref):
    rng = random.Random(5)
    n_checked = 0
    for trial in range(80):
        data = _score(rng)
        ours, theirs = _both(data, ref)
        ours.clean()
        theirs.clean()
        try:
            pt = ref.process_voices(theirs)
        except Exception:
            continue  # reference crashed; skip the sample
        po = H.process_voices(ours)
        if pt is False or po is False:
            assert (po is False) and (pt is False), trial
            continue
        assert po.dump() == pt.dump(), trial
        n_checked += 1
    assert n_checked > 20


def test_eliminate_duplicate_chords_parity(ref):
    rng = random.Random(6)
    for trial in range(60):
        data = _score(rng, with_splits=False)
        ours, theirs = _both(data, ref)
        random.seed(42)  # reference uses set() ordering; pin hash env anyway
        eo = H.eliminate_duplicate_chords(ours)
        et = ref.eliminate_duplicate_chords(theirs)
        # set() iteration order matches within one process for equal sets
        assert eo.dump() == et.dump(), trial


def test_kern_to_midi_parity(ref):
    for p in PITCH + ["ccc", "AAA", "bb-", "ff#"]:
        assert H.kern_to_midi(p) == ref.kern_to_midi(p)
    assert H.kern_to_midi("c") == 60
    assert H.kern_to_midi("A") == 57


def test_add_split_token_parity(ref):
    body = ["4c", "4d\t4e", "4f\t4g", "2a", "!comment", "4b"]
    assert H.add_split_token(body) == ref.add_split_token(body)


def test_sort_chords_unpitched_in_chord_parity(ref):
    """Chords containing rests: the reference pairs the pitch list
    positionally against ALL notes (misaligning and truncating); we must
    byte-match that."""
    data = "\n".join(["**kern", "*clefF4", "=1", "4r 4c", "4e 8r 4C",
                      "2g 2d", "=", "*-"]) + "\n"
    ours, theirs = _both(data, ref)
    assert H.sort_chords(ours).dump() == ref.sort_chords(theirs).dump()


def _spine_script_score(rng, n_spines=2, n_lines=30):
    """Random multi-spine score with MIXED split-mark lines: any spine may
    *^ while an adjacent pair *v-merges on the SAME line, plus 3-way
    merges — exercising run carry-over and the *^-inside-a-run quirks."""
    lines = ["\t".join("**kern" for _ in range(n_spines)),
             "\t".join("*clefF4" for _ in range(n_spines)),
             "\t".join("*M4/4" for _ in range(n_spines))]
    width = n_spines
    measure = 1
    lines.append("\t".join(f"={measure}" for _ in range(width)))
    for _ in range(n_lines):
        r = rng.random()
        if r < 0.18 and width < 5:
            # a mark line: pick one spine to split, optionally merge a
            # run elsewhere on the same line
            cells = ["*"] * width
            cells[rng.randrange(width)] = "*^"
            lines.append("\t".join(cells))
            width += 1
        elif r < 0.33 and width > n_spines:
            run = min(width, rng.choice([2, 2, 3]))
            at = rng.randrange(width - run + 1)
            cells = ["*"] * width
            for k in range(run):
                cells[at + k] = "*v"
            # sometimes also split after the run on the same line
            if rng.random() < 0.4 and at + run < width:
                cells[at + run] = "*^"
                lines.append("\t".join(cells))
                width += 1 - (run - 1)
            else:
                lines.append("\t".join(cells))
                width -= run - 1
        elif r < 0.4:
            measure += 1
            lines.append("\t".join(f"={measure}" for _ in range(width)))
        else:
            lines.append("\t".join(_chord(rng) for _ in range(width)))
    lines.append("\t".join("=" for _ in range(width)))
    lines.append("\t".join("*-" for _ in range(width)))
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("constrained", [False, True])
def test_mixed_split_lines_parity(ref, constrained):
    """clean/tosequence/split parity on multi-spine scores with mixed
    *^ / *v lines, in both constrained and unconstrained modes."""
    rng = random.Random(7)
    n_checked = 0
    for trial in range(120):
        data = _spine_script_score(rng, n_spines=rng.choice([1, 2, 3]))
        try:
            theirs = ref.Kern(data=data, constrained=constrained)
            ok_t = theirs.clean()
        except Exception:
            continue  # reference crashed; skip the sample
        ours = H.Kern(data=data, constrained=constrained)
        ok_o = ours.clean()
        assert ok_o == ok_t, trial
        if not ok_o[0]:
            continue
        assert ours.dump() == theirs.dump(), trial
        try:
            seq_t = theirs.tosequence()
        except Exception:
            seq_t = "<crash>"
        if seq_t != "<crash>":
            assert ours.tosequence() == seq_t, trial
        o2 = H.Kern(data=ours.dump(), constrained=constrained)
        t2 = ref.Kern(data=theirs.dump(), constrained=constrained)
        try:
            ref_chunks = t2.split(3, 2)
        except IndexError:
            ref_chunks = None
        if ref_chunks is not None:
            assert [c.dump() for c in o2.split(3, 2)] == \
                [c.dump() for c in ref_chunks], trial
        n_checked += 1
    assert n_checked > 40
