"""An INDEPENDENT Standard-MIDI-File event walker for cross-validation.

Deliberately shares NO code or structure with musicstyletransfer_tpu.midi
(or its C++ twin): it was written directly from the SMF byte-format spec
plus the reference's tokenization rules (midi_io.py:70-93, Melody.py:109-126,
defaults.py:44-58), as a single pass that turns track bytes straight into
token ids with no intermediate event objects. Its job is to catch a shared
misreading in smf.py/codec.py — running-status handling, varint decoding,
tick accounting, tempo extraction — that the twin C++ implementation (same
author, same reading) could not catch.

python-midi compatibility notes encoded here on purpose:
- running status is NOT cancelled by meta/sysex events (strict SMF says it
  is; python-midi's EventRegistry path keeps it, and parity with python-midi
  is this project's ground truth);
- note on/off TOKEN classification is purely by velocity: velocity > 0 is a
  note-on token, velocity == 0 a note-off token, for BOTH 0x9n and 0x8n
  messages (midi_io.py:84-89);
- time gaps between consecutive note messages emit `gap % 1000` binned by
  30 ticks while decrementing by 1000 (midi_io.py:81-83);
- only note messages advance the gap origin;
- BPM = 6e7 / mpqn of the first SetTempo anywhere in track order, else 120.
"""

from __future__ import annotations

import struct

_NOTE_ON_BASE = 3  # PAD,SOS,EOS = 0,1,2 (defaults.py:44-47)
_NOTE_OFF_BASE = 3 + 128
_TIMESHIFT_BASE = 3 + 128 + 128
_BIN = 30
_WRAP = 1000
_DEFAULT_BPM = 120.0

# data-byte count per channel-message high nibble (SMF spec, table 1)
_NDATA = {0x8: 2, 0x9: 2, 0xA: 2, 0xB: 2, 0xC: 1, 0xD: 1, 0xE: 2}


class _Cursor:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def take(self, n: int) -> bytes:
        out = self.b[self.i : self.i + n]
        if len(out) != n:
            raise ValueError("unexpected end of data")
        self.i += n
        return out

    def varint(self) -> int:
        v = 0
        while True:
            c = self.u8()
            v = (v << 7) + (c & 0x7F)
            if c < 0x80:
                return v


def _walk_track(body: bytes):
    """One pass over a track chunk: (token id list, mpqn of first SetTempo
    in this track or None)."""
    cur = _Cursor(body)
    tokens = []
    mpqn = None
    status = None  # running status
    now = 0
    origin = 0  # time of the previous note message
    while cur.i < len(body):
        now += cur.varint()
        first = cur.u8()
        if first == 0xFF:
            kind = cur.u8()
            payload = cur.take(cur.varint())
            if kind == 0x51 and mpqn is None:
                hi, mid, lo = struct.unpack(">BBB", payload)
                mpqn = (hi << 16) + (mid << 8) + lo
            if kind == 0x2F:
                break
            continue
        if first in (0xF0, 0xF7):
            cur.take(cur.varint())
            continue
        if first & 0x80:
            status = first
            d0 = cur.u8()
        else:
            if status is None:
                raise ValueError("running status without prior status byte")
            d0 = first
        nib = status >> 4
        if nib not in _NDATA:
            raise ValueError(f"bad status byte 0x{status:02x}")
        d1 = cur.u8() if _NDATA[nib] == 2 else None
        if nib in (0x8, 0x9):
            gap = now - origin
            while gap > 0:
                tokens.append(_TIMESHIFT_BASE + (gap % _WRAP) // _BIN)
                gap -= _WRAP
            tokens.append((_NOTE_ON_BASE if d1 > 0 else _NOTE_OFF_BASE) + d0)
            origin = now
    return tokens, mpqn


def walk_file(path: str):
    """Tokenize every track of an SMF file.

    Returns (track_token_lists, bpm, resolution) where track_token_lists
    includes ALL tracks (no minimum-length filtering — the caller applies
    the reference's >= 10 rule)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if raw[:4] != b"MThd":
        raise ValueError("no MThd header")
    hlen, _fmt, ntracks, division = struct.unpack(">IHHH", raw[4:14])
    if division >= 0x8000:
        raise ValueError("SMPTE division unsupported")
    pos = 8 + hlen
    per_track = []
    mpqn = None
    for _ in range(ntracks):
        tag, tlen = raw[pos : pos + 4], struct.unpack(">I", raw[pos + 4 : pos + 8])[0]
        if tag != b"MTrk":
            raise ValueError("missing MTrk")
        tokens, track_mpqn = _walk_track(raw[pos + 8 : pos + 8 + tlen])
        per_track.append(tokens)
        if mpqn is None and track_mpqn is not None:
            mpqn = track_mpqn
        pos += 8 + tlen
    bpm = _DEFAULT_BPM if mpqn is None else 6e7 / mpqn
    return per_track, bpm, division
