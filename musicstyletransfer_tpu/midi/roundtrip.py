"""Manual tokenize->detokenize round-trip check CLI.

Working equivalent of the reference's only "test"
(tests/test_midi_reader.py:1-18, which is broken as written — it passes a
kwarg the constructor doesn't take): reads a MIDI file, re-writes it as
``<basename>_rewrite.mid``, and prints the melody length.

Usage: ``python -m musicstyletransfer_tpu.midi.roundtrip file.mid [out.mid]``

The rewrite lands in the CURRENT directory by default (not next to the
input, which may live in a read-only corpus); pass an explicit output path
to choose.
"""

from __future__ import annotations

import argparse
import os

from .codec import EventBasedMIDIReader, MelodyWriter


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file")
    parser.add_argument("out", nargs="?", default=None,
                        help="output path (default: <basename>_rewrite.mid "
                             "in the current directory)")
    args = parser.parse_args(argv)

    melodies = EventBasedMIDIReader().read_file(args.file)
    writer = MelodyWriter()
    out = args.out or os.path.basename(args.file) + "_rewrite.mid"
    writer.write_to_file(out, melodies[0])
    print(f"Melody length: {len(melodies[0])}")
    print(f"Rewrote to {out}")


if __name__ == "__main__":
    main()
