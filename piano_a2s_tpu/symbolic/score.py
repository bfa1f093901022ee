"""Structured score model + parser for flattened measure-wise kern text.

This is the backbone of the export path that replaces the reference's
external toolchain (tiefix -> hum2xml -> music21; reference:
data_processing/humdrum.py:841-891): model output tokens are decoded to
kern text, parsed here into a Score, then written as MusicXML / MIDI by
the sibling modules.

Kern semantics handled: durations (recip N = 1/N whole note, dot = x1.5,
including non-power-of-two recips like 3, 6, 12, 20, 96), chords
(space-separated), rests, ties ([ open, _ continue, ] close), fermatas,
two-voice passages (*^ / *v spine marks), null tokens ('.').
"""

from __future__ import annotations

import dataclasses
import re
from fractions import Fraction
from typing import List, Optional, Tuple

from .humdrum import kern_to_midi

NOTE_RE = re.compile(r"^(\[?)(\d+)(\.*)([a-gA-G]{1,4}[\-#]*|r+)(;?)([\]_]?)$")

_STEP_ALTER = {"c": ("C", 0), "d": ("D", 0), "e": ("E", 0), "f": ("F", 0),
               "g": ("G", 0), "a": ("A", 0), "b": ("B", 0)}


@dataclasses.dataclass
class Note:
    """One note or rest event. duration is in whole-note units."""
    duration: Fraction
    midi: Optional[int] = None      # None = rest
    step: str = ""                  # spelled letter (upper-case)
    alter: int = 0                  # -1 flat, +1 sharp
    octave: int = 4                 # scientific pitch octave
    tie_start: bool = False
    tie_continue: bool = False
    tie_stop: bool = False
    fermata: bool = False

    @property
    def is_rest(self) -> bool:
        return self.midi is None


@dataclasses.dataclass
class Chord:
    """Simultaneous notes in one voice (shared onset & duration)."""
    notes: List[Note]

    @property
    def duration(self) -> Fraction:
        return self.notes[0].duration if self.notes else Fraction(0)


@dataclasses.dataclass
class Measure:
    key_fifths: int = 0             # sharps (+) / flats (-)
    time_sig: Tuple[int, int] = (4, 4)
    voices: List[List[Chord]] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class Part:
    measures: List[Measure] = dataclasses.field(default_factory=list)
    clef: str = "treble"            # 'treble' | 'bass'
    name: str = "Piano"


@dataclasses.dataclass
class Score:
    parts: List[Part] = dataclasses.field(default_factory=list)


def spelled_pitch(kern_pitch: str) -> Tuple[str, int, int, int]:
    """kern pitch -> (step, alter, octave, midi)."""
    alter = 0
    base = kern_pitch
    if base.endswith("#"):
        alter, base = 1, base[:-1]
    elif base.endswith("-"):
        alter, base = -1, base[:-1]
    letter = base[0]
    step = letter.upper()
    if letter.isupper():
        octave = 4 - len(base)
    else:
        octave = 3 + len(base)
    midi = kern_to_midi(kern_pitch)
    return step, alter, octave, midi


def parse_note(token: str) -> Optional[Note]:
    """One kern note/rest token -> Note, or None if malformed."""
    m = NOTE_RE.match(token)
    if not m:
        return None
    tie_open, recip, dots, pitch, fermata, tie_close = m.groups()
    base = Fraction(1, int(recip)) if int(recip) else Fraction(2)
    dur = base
    add = base
    for _ in dots:
        add = add / 2
        dur += add
    note = Note(duration=dur, fermata=bool(fermata))
    if not pitch.startswith("r"):
        step, alter, octave, midi = spelled_pitch(pitch)
        note.midi = midi
        note.step, note.alter, note.octave = step, alter, octave
        note.tie_start = tie_open == "["
        note.tie_continue = tie_close == "_"
        note.tie_stop = tie_close == "]"
    return note


def parse_chord(token: str) -> Optional[Chord]:
    notes = []
    for part in token.split(" "):
        if not part:
            continue
        n = parse_note(part)
        if n is None:
            return None
        notes.append(n)
    return Chord(notes) if notes else None


def parse_staff_kern(kern_text: str, keys: List[int],
                     time_sigs: List[str], clef: str = "treble",
                     strict: bool = False) -> Part:
    """Parse one staff's flattened kern (measures separated by '=' lines,
    voices via *^ / *v marks) into a Part.

    keys / time_sigs: per-measure key fifths and 'N/D' strings (the model's
    per-bar classifications). Malformed tokens are skipped unless strict.
    """
    part = Part(clef=clef)
    lines = kern_text.splitlines()
    n_voices = 1
    cur: Optional[Measure] = None
    measure_idx = 0

    def new_measure():
        nonlocal measure_idx
        k = keys[measure_idx] if measure_idx < len(keys) else 0
        ts = time_sigs[measure_idx] if measure_idx < len(time_sigs) \
            else "4/4"
        num, den = ts.split("/")
        m = Measure(key_fifths=int(k), time_sig=(int(num), int(den)),
                    voices=[[] for _ in range(2)])
        measure_idx += 1
        return m

    for line in lines:
        line = line.rstrip()
        if not line:
            continue
        if line.startswith("="):
            if cur is not None:
                part.measures.append(cur)
            cur = None
            continue
        if line.startswith("*"):
            if line.startswith("*^"):
                n_voices = 2
            elif line.startswith("*v"):
                n_voices = 1
            continue
        if cur is None:
            cur = new_measure()
        cols = line.split("\t")
        for v, col in enumerate(cols[:2]):
            if col == "." or col == "":
                continue
            chord = parse_chord(col)
            if chord is None:
                if strict:
                    raise ValueError(f"malformed kern token: {col!r}")
                continue
            cur.voices[v].append(chord)
    if cur is not None:
        part.measures.append(cur)
    for m in part.measures:
        m.voices = [v for v in m.voices if v]
        if not m.voices:
            m.voices = [[]]
    del n_voices
    return part


def repair_ties(part: Part) -> Part:
    """Tie sanity repair (replaces humextra `tiefix` on the export path).

    Per pitch, in time order, a legal tie chain is `[`, `_`*, `]`. Repairs:
      - `_` / `]` with no open tie at that pitch -> flag stripped
      - `[` whose next same-pitch note does not continue/close -> stripped
      - `_` whose next same-pitch note does not continue/close -> becomes `]`
    This handles ties dangling across 5-bar chunk boundaries, the case
    humextra `tiefix` exists for (reference invokes it at humdrum.py:857).
    """
    # Chains are keyed per (voice index, pitch): ties connect consecutive
    # same-pitch notes within a voice, never across voices.
    by_pitch: dict = {}
    for m in part.measures:
        for v_idx, voice in enumerate(m.voices):
            for chord in voice:
                for note in chord.notes:
                    if not note.is_rest:
                        by_pitch.setdefault((v_idx, note.midi),
                                            []).append(note)
    for notes in by_pitch.values():
        open_tie = False
        for j, n in enumerate(notes):
            if (n.tie_continue or n.tie_stop) and not open_tie:
                n.tie_continue = n.tie_stop = False
            if n.tie_stop:
                open_tie = False
            if n.tie_start or n.tie_continue:
                nxt = notes[j + 1] if j + 1 < len(notes) else None
                will_consume = nxt is not None and (
                    nxt.tie_continue or nxt.tie_stop)
                if will_consume:
                    open_tie = True
                else:
                    if n.tie_continue:
                        n.tie_continue, n.tie_stop = False, True
                    n.tie_start = False
                    open_tie = False
    return part
