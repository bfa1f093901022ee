"""Humdrum/**kern parsing, cleaning, chunking and voice processing.

Host-side symbolic core, behavior-compatible with the reference
(reference: data_processing/humdrum.py:190-839). Differences are noted
inline; the one deliberate deviation: ``Kern.split`` returns an empty list
for scores shorter than one chunk where the reference raises IndexError
(its callers catch-and-skip; ours skip without the exception).
"""

from __future__ import annotations

import re
from fractions import Fraction
from itertools import cycle
from typing import List, Optional, Tuple

# Classic tempo words -> metronome marks (reference: humdrum.py:10-35).
CLASSIC_TEMPOS = {
    "grave": 32, "largoassai": 40, "largo": 50, "pocolargo": 60,
    "adagio": 71, "pocoadagio": 76, "andante": 92, "andantino": 100,
    "menuetto": 112, "moderato": 114, "pocoallegretto": 116,
    "allegretto": 118, "allegromoderato": 120, "pocoallegro": 124,
    "allegro": 130, "moltoallegro": 134, "allegroassai": 138,
    "vivace": 140, "vivaceassai": 150, "allegrovivace": 160,
    "allegrovivaceassai": 170, "pocopresto": 180, "presto": 186,
    "prestoassai": 200,
}

_BARLINE_RE = re.compile(r"^=(\d+|=)[^-]*")
BARLINE_RE = _BARLINE_RE  # public alias: the one definition of a barline
_NOTE_SEARCH_RE = re.compile(r"(\[?)(\d+\.*)([a-gA-G]{1,4}[\-#]*)(;?)([\]_]?)")
_REST_RE = re.compile(r"(\[?)(\d+\.*)([r]{1,4}[\-#]*)")


def count_measure_segments(text: str) -> int:
    """Number of measures in kern text: segments separated by barlines that
    contain at least one data line. A pickup before the first numbered
    barline counts as a measure (music21-compatible counting)."""
    count = 0
    has_content = False
    for line in text.splitlines():
        if _BARLINE_RE.match(line):
            if has_content:
                count += 1
            has_content = False
            continue
        if line and not line.startswith(("*", "!", "=")):
            has_content = True
    if has_content:
        count += 1
    return count


class Humdrum:
    """Split a Humdrum file into header / body / footer by exclusive
    interpretation lines (reference: humdrum.py:190-212)."""

    def __init__(self, path=None, data: Optional[str] = None):
        if path is not None:
            data = path.read_text(encoding="iso-8859-1")
        lines = data.splitlines()
        body_begin = 0
        body_end = 0
        for i, line in enumerate(lines):
            if line.startswith("**"):
                body_begin = i + 1
            if line.startswith("*-"):
                body_end = i
                break
        self.header = lines[:body_begin]
        self.footer = lines[body_end:]
        self.body = lines[body_begin:body_end]
        self.spine_types = self.header[-1].split("\t") if self.header else []

    def save(self, path):
        return path.write_text(self.dump(), encoding="iso-8859-1")

    def dump(self) -> str:
        return "\n".join(self.header + self.body + self.footer)


class SpineInfo:
    """Per-spine interpretation state: clef, key/time signature, tempo
    (reference: humdrum.py:215-269)."""

    FIELDS = ["type", "instrument", "clef", "keysig", "tonality", "timesig",
              "metronome"]

    def __init__(self, spine_types: List[str]):
        self.spines = [
            {"type": t, "instrument": "*", "clef": "*", "keysig": "*",
             "tonality": "*", "timesig": "*", "metronome": "*"}
            for t in spine_types
        ]

    def update(self, line: str) -> None:
        for i, item in enumerate(line.split("\t")):
            if item.startswith("*k["):
                self.spines[i]["keysig"] = item
            elif item.startswith("*clef"):
                self.spines[i]["clef"] = item
            elif item.startswith("*I"):
                self.spines[i]["instrument"] = item
            elif item.startswith("*MM"):
                self.spines[i]["metronome"] = item
            elif item.startswith("*M"):
                self.spines[i]["timesig"] = item
            elif item.startswith("*CT"):
                self.spines[i]["metronome"] = f"*MM{CLASSIC_TEMPOS[item[3:]]}"
            elif item.endswith(":"):
                self.spines[i]["tonality"] = item

    def override_instruments(self, instruments: List[str]) -> None:
        pool = cycle(instruments)
        inst = instruments[0]
        for spine in self.spines:
            if spine["type"] == "**kern":
                inst = next(pool)
            spine["instrument"] = f"*I{inst}"

    def dump(self) -> Tuple[List[str], List[str]]:
        header = ["\t".join(s[f] for s in self.spines) for f in self.FIELDS]
        footer = ["\t".join("*-" for _ in self.spines)]
        return header, footer

    def clone(self) -> "SpineInfo":
        out = SpineInfo([s["type"] for s in self.spines])
        out.spines = self.spines.copy()
        return out


def _track_spine_marks(spine_types: List[str], line: str):
    """Apply one *^ / *v line to a working spine-type list in place
    (shared by clean and tosequence; reference: humdrum.py:295-321)."""
    i = 0
    remove_spine = False
    min_split_counts = 100
    for item in line.split("\t"):
        if item == "*^":
            spine_types.insert(i + 1, f"{spine_types[i]}**split")
            i += 1
        elif item == "*v":
            min_split_counts = min(min_split_counts,
                                   spine_types[i].count("**split"))
            if remove_spine:
                spine_types.pop(i)
                i -= 1
            else:
                remove_spine = True
        else:
            if remove_spine:
                # The previous run of *v merged; simplify the surviving spine.
                spine_types[i - 1] = (
                    spine_types[i - 1].replace("**split", "")
                    + min_split_counts * "**split")
            remove_spine = False
        i += 1


class Kern(Humdrum):
    """A **kern score with cleaning, chunking, and flattening
    (reference: humdrum.py:271-528)."""

    def __init__(self, path=None, data: Optional[str] = None,
                 constrained: bool = False):
        super().__init__(path, data)
        self.constrained = constrained
        self.spines = SpineInfo(self.spine_types)
        self.first_line = 0
        for i, line in enumerate(self.body):
            if not line.startswith("*") or re.search(r"\*[\^v]", line):
                self.first_line = i
                break
            self.spines.update(line)

    # -- cleaning ----------------------------------------------------------

    def clean(self, remove_pauses: bool = True):
        """Remove ornaments/beams/slurs/grace notes; track spine splits.
        Returns (ok, cleaned_anything) — ok=False on unsupported spines or
        unremovable grace notes."""
        spine_types = self.spine_types.copy()
        base_spine_len = len(spine_types)
        newbody: List[str] = []
        cleaned = False

        for line in self.body[self.first_line:]:
            if len(line) == 0:
                continue
            if re.search(r"\*[+x\^v]", line):
                if any(it.startswith(("*+", "*x"))
                       for it in line.split("\t")):
                    return False, None
                _track_spine_marks(spine_types, line)
                if not self.constrained:
                    newbody.append(line)
                continue

            if line.startswith("!"):
                if self.constrained:
                    items = line.split("\t")
                    newline = [
                        item for i, item in enumerate(items)
                        if not (spine_types[i].endswith("**split")
                                and base_spine_len < len(items))]
                    newbody.append("\t".join(newline))
                else:
                    newbody.append(line)
                continue

            newline = []
            note_found = False
            grace_note_found = False
            items = line.split("\t")
            for i, item in enumerate(items):
                if self.constrained and spine_types[i].endswith("**split") \
                        and base_spine_len < len(items):
                    continue
                if spine_types[i].startswith("**kern") and \
                        not item.startswith(("*", "=")):
                    if self.constrained:
                        item = item.split()[0]
                    if re.search(r"[pTtMmWwS$O:]", item):
                        item = re.sub(r"[pTtMmWwS$O:]", "", item)
                        cleaned = True
                    if remove_pauses:
                        item = re.sub(r";", "", item)
                    item = re.sub(r"[JKkL\\/]", "", item)  # beams/stems
                    item = re.sub(r"[(){}xXyY&]", "", item)  # slurs/marks
                    item = re.sub(r"(\d*\.*r)(.*)", r"\1", item)  # rest pos
                    if re.search("[qQP]", item):
                        grace_note_found = True
                        cleaned = True
                    elif re.search("[A-Ga-g]", item):
                        note_found = True
                newline.append(item)

            if grace_note_found and not note_found:
                continue
            if grace_note_found and note_found:
                return False, None
            if not all(x == "." for x in newline) and \
                    not all(x == "!" for x in newline):
                newbody.append("\t".join(newline))

        header, footer = self.spines.dump()
        self.body = header[1:] + newbody
        self.first_line = len(header) - 1
        return True, cleaned

    # -- chunking ----------------------------------------------------------

    def split(self, chunk_size: int, stride: Optional[int] = None):
        """Cut into chunk_size-measure chunks (stride defaults to
        chunk_size), repairing spine-split headers/footers. The trailing
        partial chunk is dropped, as in the reference."""
        chunks: List[Kern] = []
        spines = self.spines.clone()

        measures = [self.first_line]
        for i, line in enumerate(self.body[self.first_line:]):
            if _BARLINE_RE.match(line):
                measures.append(i + self.first_line + 1)
        i = 0
        while i < len(measures) - 1:
            if i + chunk_size >= len(measures):
                break  # reference raises IndexError here; we just stop
            m_begin = measures[i]
            m_end = measures[i + chunk_size]
            header, footer = spines.dump()
            i += stride if stride else chunk_size
            if len(measures) - i - 1 < chunk_size:
                break  # final partial chunk dropped (humdrum.py:415-423)
            body = self.body[m_begin:m_end]

            if not self.constrained:
                len_spines = len(self.spine_types)
                if len_spines != len(body[0].split("\t")):
                    # Re-insert the *-interpretation lines that establish
                    # the current spine-split state before this chunk.
                    split_lines = []
                    for line in self.body[:m_begin][::-1]:
                        if re.search(r"\*|:$", line):
                            split_lines.append(line)
                            if len(line.split("\t")) == len_spines:
                                break
                    for split_line in split_lines:
                        body.insert(0, split_line)

                last = -1
                while body[last].startswith("!"):
                    last -= 1
                if len(footer[0].split("\t")) != len(body[last].split("\t")):
                    footer = ["\t".join(
                        "*-" for _ in body[last].split("\t"))]

            chunks.append(Kern(data="\n".join(header + body + footer)))

            if self.constrained:
                for line in self.body[m_begin:measures[i]]:
                    if line.startswith("*"):
                        spines.update(line)
        return chunks

    # -- flattening --------------------------------------------------------

    def tosequence(self) -> Optional[str]:
        """Flatten the body into token-ready text (barlines as '=', kern
        spines only, undefined symbols stripped). None if the result has
        double accidentals/dots (reference: humdrum.py:468-528)."""
        spine_types = self.spine_types.copy()
        krn: List[str] = []
        for line in self.body[self.first_line:]:
            newline: List[str] = []
            if line.startswith("="):
                if not _BARLINE_RE.match(line):
                    continue
                newline.append("=")
            elif not self.constrained and re.search(r"\*[\^v]", line):
                _track_spine_marks(spine_types, line)
                continue
            elif line.startswith(("*", "!")):
                continue
            else:
                line = re.sub(r"[^rA-Ga-g0-9.\[_\]#\-;\t ]", "", line)
                for i, item in enumerate(line.split("\t")):
                    if spine_types[i].startswith("**kern"):
                        newline.append(item)
            krn.append("\t".join(newline))

        krnseq = "\n".join(krn)
        if re.search(r"(#|-|\.){2,}", krnseq):
            return None  # double sharps/flats/dots unsupported
        return krnseq


# ---------------------------------------------------------------------------
# Pitch utilities
# ---------------------------------------------------------------------------

_KERN_BASE_MIDI = {
    "c": 60, "d": 62, "e": 64, "f": 65, "g": 67, "a": 69, "b": 71,
    "C": 48, "D": 50, "E": 52, "F": 53, "G": 55, "A": 57, "B": 59,
}


def kern_to_midi(kern_note: str) -> int:
    """Kern pitch spelling -> MIDI number (reference: humdrum.py:600-622)."""
    accidental = 0
    if kern_note.endswith("#"):
        accidental, kern_note = 1, kern_note[:-1]
    elif kern_note.endswith("-"):
        accidental, kern_note = -1, kern_note[:-1]
    midi = _KERN_BASE_MIDI[kern_note[0]] + accidental
    if kern_note[0].isupper():
        midi -= 12 * (len(kern_note) - 1)
    else:
        midi += 12 * (len(kern_note) - 1)
    return midi


def get_chords_pitches(chords: str) -> List[int]:
    pitches = []
    for note in chords.split(" "):
        m = re.findall(r"(?:[a-gA-G]{1,4}[\-#]*)", note)
        if m:
            pitches.append(kern_to_midi(m[0]))
    return pitches


# ---------------------------------------------------------------------------
# Voice machinery
# ---------------------------------------------------------------------------

def sort_voices(kern: Kern):
    """Order two split voices by mean pitch (lower voice first); returns the
    kern or False for >2 voices (reference: humdrum.py:530-560)."""
    n_voices = 1
    begin, end = 0, 0
    voice1: List[List[int]] = []
    voice2: List[List[int]] = []
    for i, line in enumerate(kern.body):
        if not line.startswith("!") and len(line.split("\t")) > 2:
            return False
        if line.startswith("*^"):
            n_voices += 1
            begin = i + 1
            voice1, voice2 = [], []
        elif line.startswith("*v") or (n_voices == 2
                                       and i == len(kern.body) - 1):
            n_voices -= 1
            end = i
            import numpy as np
            m1 = np.mean([np.mean(p) for p in voice1 if len(p) > 0])
            m2 = np.mean([np.mean(p) for p in voice2 if len(p) > 0])
            if m1 < m2:
                for j in range(begin, end):
                    if kern.body[j].startswith("!"):
                        continue
                    cols = kern.body[j].split("\t")
                    if len(cols) < 2:
                        continue
                    if len(cols) > 2:
                        return False
                    cols[0], cols[1] = cols[1], cols[0]
                    kern.body[j] = "\t".join(cols)
        if n_voices == 2 and len(line.split("\t")) == 2:
            voice1.append(get_chords_pitches(line.split("\t")[0]))
            voice2.append(get_chords_pitches(line.split("\t")[1]))
    return kern


def sort_chords(kern: Kern) -> Kern:
    """Sort chord notes by ascending MIDI pitch (reference:
    humdrum.py:562-586)."""
    for i, line in enumerate(kern.body):
        if line.startswith(("*", "!")):
            continue
        sorted_line = []
        for chord in line.split("\t"):
            notes = chord.split(" ")
            if len(notes) == 1:
                sorted_line.append(notes[0])
                continue
            pitches = []
            for note in notes:
                m = re.findall(r"(?:[a-gA-G]{1,4}[\-#]*)", note)
                if m:
                    pitches.append(kern_to_midi(m[0]))
            combined = sorted(zip(pitches, notes), key=lambda x: x[0])
            sorted_line.append(" ".join(n for _, n in combined))
        kern.body[i] = "\t".join(sorted_line)
    return kern


def check_notes_existance(measure: List[str]) -> bool:
    for chord in measure:
        for note in chord.split(" "):
            if _NOTE_SEARCH_RE.search(note):
                return True
    return False


def _advance(start_time: Fraction, note_type: str) -> Fraction:
    if note_type.endswith("."):
        base = int(note_type[:-1])
        return start_time + Fraction(1, base) + Fraction(1, 2 * base)
    return start_time + Fraction(1, int(note_type))


def check_single_voice(voice_l: List[str], voice_r: List[str]) -> int:
    """1/2 if one voice's onsets-offsets are a subset of the other's
    (mergeable), else 0 (reference: humdrum.py:639-673)."""
    assert len(voice_l) == len(voice_r)
    sets = [set(), set()]
    for i, voice in enumerate([voice_l, voice_r]):
        start = Fraction(0)
        for chords in voice:
            note = chords.split(" ")[0]
            rest = _REST_RE.search(note)
            if rest:
                start = _advance(start, rest[2])
                continue
            m = _NOTE_SEARCH_RE.search(note)
            if m:
                end = _advance(start, m[2])
                sets[i].add((str(start), str(end)))
                start = end
    if sets[1].issubset(sets[0]):
        return 1
    if sets[0].issubset(sets[1]):
        return 2
    return 0


def merge_voices(voice_l: List[str], voice_r: List[str]):
    """Merge two parallel voice streams into one (chords) when rhythmically
    compatible, else keep two columns (reference: humdrum.py:675-734)."""
    assert len(voice_l) == len(voice_r)
    length = len(voice_l)
    has_l = check_notes_existance(voice_l)
    has_r = check_notes_existance(voice_r)
    merged: List[str] = []
    n_voices = 1
    if has_l and has_r:
        single = check_single_voice(voice_l, voice_r)
        if single == 0:
            for i in range(length):
                if voice_l[i] == "null":
                    merged.append(voice_r[i])
                elif voice_r[i] == "null":
                    merged.append(voice_l[i])
                else:
                    merged.append(voice_l[i] + "\t" + voice_r[i])
            n_voices = 2
        elif single == 1:
            for i in range(length):
                if voice_l[i] == "null":
                    merged.append(voice_r[i])
                elif voice_r[i] == "null":
                    merged.append(voice_l[i])
                elif _NOTE_SEARCH_RE.search(voice_r[i]):
                    merged.append(voice_l[i] + " " + voice_r[i])
                else:
                    merged.append(voice_l[i])
        else:
            for i in range(length):
                if voice_l[i] == "null":
                    merged.append(voice_r[i])
                elif voice_r[i] == "null":
                    merged.append(voice_l[i])
                elif _NOTE_SEARCH_RE.search(voice_l[i]):
                    merged.append(voice_r[i] + " " + voice_l[i])
                else:
                    merged.append(voice_r[i])
    elif not has_l and not has_r:
        if "null" in voice_l:
            merged = voice_r
        elif "null" in voice_r:
            merged = voice_l
    else:
        keep = voice_l if has_l else voice_r
        discard = voice_l if has_r else voice_r
        for i in range(length):
            if keep[i] == "null" or keep[i] == "*" \
                    and discard[i] != "null":
                keep[i] = discard[i]
        merged = keep
    return merged, n_voices


def merge_whole_chunk(voices, n_voices):
    assert len(voices) == len(n_voices)
    current = 1
    result: List[str] = []
    for i in range(len(voices)):
        if current == 1:
            result.append(f"={i + 1}")
            result.extend(voices[i])
            if n_voices[i] == 2:
                current = 2
        else:
            if n_voices[i] == 1:
                result.append(f"={i + 1}")
                result.extend(voices[i])
                current = 1
            else:
                result.append(f"={i + 1}\t={i + 1}")
                result.extend(voices[i])
    result.append("=")
    return add_split_token(result)


def add_split_token(body: List[str]) -> List[str]:
    """Insert *^ / *v\t*v marks where the column count changes
    (reference: humdrum.py:760-772)."""
    added: List[str] = []
    prev = 1
    for line in body:
        if line.startswith("!"):
            continue
        cur = len(line.split("\t"))
        if cur == 2 and prev == 1:
            added.append("*^")
        elif cur == 1 and prev == 2:
            added.append("*v\t*v")
        added.append(line)
        prev = cur
    return added


def process_voices(kern: Kern):
    """Merge 2-voice passages into single-voice chords where possible;
    returns a new Kern or False on >2 voices (reference:
    humdrum.py:774-819)."""
    i_measure = 0
    before_measure: List[str] = []
    measure_voices = []
    measure_n_voices = []
    first_bar = False
    end_of_before = False
    voice_l: List[str] = []
    voice_r: List[str] = []
    for i, line in enumerate(kern.body):
        if i_measure == 0:
            if kern.body[i + 1].startswith("=") or line.startswith("*^"):
                end_of_before = True
            if not end_of_before:
                before_measure.append(line)

        if line.startswith("=") or (
                not first_bar
                and not kern.body[i + 1].startswith("*")
                and not kern.body[i + 1].startswith("!")):
            first_bar = True
            if i_measure != 0:
                voice, n_voice = merge_voices(voice_l, voice_r)
                if len(voice) != 0:
                    measure_voices.append(voice)
                    measure_n_voices.append(n_voice)
            i_measure += 1
            voice_l, voice_r = [], []
            continue

        if line == "*^" or line == "*v\t*v":
            continue

        if i_measure != 0:
            cols = line.split("\t")
            if len(cols) == 1:
                voice_l.append(cols[0])
                voice_r.append("null")
            elif len(cols) == 2:
                voice_l.append(cols[0])
                voice_r.append(cols[1])
            else:
                return False
    measures = merge_whole_chunk(measure_voices, measure_n_voices)
    footer = [line.split("\t")[0] for line in kern.footer]
    return Kern(data="\n".join(kern.header + before_measure + measures
                               + footer))


def eliminate_duplicate_chords(kern: Kern) -> Kern:
    """Deduplicate notes within each chord (set semantics, order not
    preserved — matches reference humdrum.py:821-839)."""
    for i, line in enumerate(kern.body):
        if line.startswith(("=", "*")):
            continue
        new_line = []
        for chord in line.split("\t"):
            notes = chord.split(" ")
            if len(notes) > 1:
                notes = [x for x in set(notes) if len(x) > 0]
                new_line.append(" ".join(notes))
            else:
                new_line.append(notes[0])
        kern.body[i] = "\t".join(new_line)
    return kern
