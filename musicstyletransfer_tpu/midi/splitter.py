"""MIDI splitter CLI: write each track of each ``.mid`` in a directory out
as its own single-track MIDI file.

Reference: MIDIUtil/MIDISplitter.py:1-63 — which is broken at head (imports
a nonexistent module and instantiates the abstract reader, SURVEY.md §8.12).
This is the working equivalent: it produced the reference's
``work/data/splits/`` corpus layout (``<name>_<track>_<desc>.mid``).

Usage: ``python -m musicstyletransfer_tpu.midi.splitter <in_dir> <out_dir>``
"""

from __future__ import annotations

import argparse
import glob
import os

from .codec import EventBasedMIDIReader, MelodyWriter


def split_directory(input_dir: str, output_dir: str) -> int:
    os.makedirs(output_dir, exist_ok=True)
    reader = EventBasedMIDIReader()
    writer = MelodyWriter()
    n_written = 0
    for fname in sorted(glob.glob(os.path.join(input_dir, "*.mid"))):
        base = os.path.splitext(os.path.basename(fname))[0].replace(" ", "_")
        try:
            melodies = reader.read_file(fname)
        except Exception as exc:  # unusable file: report, continue
            print(f"Skipping {fname}: {exc}")
            continue
        for idx, melody in enumerate(melodies):
            out = os.path.join(output_dir, f"{base}_{idx}.mid")
            writer.write_to_file(out, melody)
            n_written += 1
    return n_written


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_dir")
    parser.add_argument("output_dir")
    args = parser.parse_args(argv)
    n = split_directory(args.input_dir, args.output_dir)
    print(f"Wrote {n} split tracks to {args.output_dir}")


if __name__ == "__main__":
    main()
