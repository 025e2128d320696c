"""Native C++ tokenizer: bit-identical to the Python codec over the corpus."""

import glob
import os

import numpy as np
import pytest

from musicstyletransfer_tpu.midi.codec import EventBasedMIDIReader
from musicstyletransfer_tpu.midi import smf

native = pytest.importorskip("musicstyletransfer_tpu.midi.native")


@pytest.fixture(scope="module")
def readers():
    if not native.available():
        pytest.skip("native tokenizer could not be built")
    return EventBasedMIDIReader(), native.NativeMIDIReader()


class TestThreadedCorpusScan:
    def test_scan_matches_per_file_reader(self, corpus_path):
        import glob

        from musicstyletransfer_tpu.midi.native import (
            NativeMIDIReader, available,
        )

        if not available():
            pytest.skip("native library unavailable")
        files = sorted(glob.glob(os.path.join(corpus_path, "*", "*.mid")))
        reader = NativeMIDIReader()
        scanned = reader.scan_files(files, n_threads=4)
        assert len(scanned) == len(files)
        for path, melodies in zip(files, scanned):
            ref = reader.read_file(path)
            assert len(melodies) == len(ref)
            for a, b in zip(melodies, ref):
                np.testing.assert_array_equal(a.tokens, b.tokens)
                assert a.bpm == b.bpm and a.resolution == b.resolution

    def test_bad_file_raises_with_path(self, tmp_path):
        from musicstyletransfer_tpu.midi.native import (
            NativeMIDIReader, available,
        )

        if not available():
            pytest.skip("native library unavailable")
        bad = tmp_path / "garbage.mid"
        bad.write_bytes(b"not a midi file at all")
        with pytest.raises(ValueError, match="garbage.mid"):
            NativeMIDIReader().scan_files([str(bad)])

    def test_loader_native_matches_python(self, corpus_path):
        from musicstyletransfer_tpu.data import Loader
        from musicstyletransfer_tpu.midi.native import available

        if not available():
            pytest.skip("native library unavailable")
        native = Loader(corpus_path, 64, use_native=True)
        python = Loader(corpus_path, 64, use_native=False)
        assert sorted(native.melodies) == sorted(python.melodies)
        for cls in native.melodies:
            assert len(native.melodies[cls]) == len(python.melodies[cls])
            for a, b in zip(native.melodies[cls], python.melodies[cls]):
                np.testing.assert_array_equal(a.tokens, b.tokens)


class TestNativeTokenizer:
    def test_corpus_bit_identical(self, readers, corpus_path):
        py, nat = readers
        files = sorted(glob.glob(os.path.join(corpus_path, "*", "*.mid")))
        assert files
        for f in files:
            a, b = py.read_file(f), nat.read_file(f)
            assert len(a) == len(b)
            for ma, mb in zip(a, b):
                np.testing.assert_array_equal(ma.tokens, mb.tokens, err_msg=f)
                assert abs(ma.bpm - mb.bpm) < 1e-9
                assert ma.resolution == mb.resolution

    def test_velocity_quirk(self, readers, tmp_path):
        _, nat = readers
        track = [
            smf.SetTempo.from_bpm(100.0),
            smf.NoteOn(tick=0, pitch=60, velocity=100),
            smf.NoteOff(tick=450, pitch=60, velocity=64),  # vel>0 => ON token
            smf.NoteOn(tick=0, pitch=62, velocity=0),      # vel==0 => OFF token
        ] + [smf.NoteOn(tick=30, pitch=p, velocity=90) for p in range(40, 50)]
        path = str(tmp_path / "q.mid")
        smf.write_midifile(path, smf.MidiFile(format=1, resolution=220,
                                              tracks=[track]))
        toks = nat.read_file(path)[0].tokens.tolist()
        assert toks[0] == 3 + 60          # on
        assert toks[1] == 259 + 15        # shift 450 -> bin 15
        assert toks[2] == 3 + 60          # NoteOff vel 64 -> ON token (quirk)
        assert toks[3] == 131 + 62        # vel-0 -> OFF token

    def test_malformed_inputs(self, readers, tmp_path):
        _, nat = readers
        bad = str(tmp_path / "bad.mid")
        with open(bad, "wb") as fh:
            fh.write(b"this is not midi at all")
        with pytest.raises(ValueError):
            nat.read_file(bad)

    def test_running_status(self, readers, tmp_path):
        _, nat = readers
        body = bytes(
            [0x00, 0x90, 60, 100, 0x10, 62, 100]
            + sum(([0x10, p, 100] for p in range(40, 50)), [])
            + [0x00, 0xFF, 0x2F, 0x00]
        )
        buf = (b"MThd" + (6).to_bytes(4, "big") + (1).to_bytes(2, "big")
               + (1).to_bytes(2, "big") + (220).to_bytes(2, "big")
               + b"MTrk" + len(body).to_bytes(4, "big") + body)
        p = str(tmp_path / "rs.mid")
        with open(p, "wb") as fh:
            fh.write(buf)
        py, _ = readers
        np.testing.assert_array_equal(
            py.read_file(p)[0].tokens, nat.read_file(p)[0].tokens
        )


class TestCapacityRetry:
    def test_track_heavy_corpus_retries(self, tmp_path):
        """scan_files' track capacity starts at ~64 tracks/file; a corpus
        of track-heavy files must grow-and-retry (the C contract), not
        fail with 'buffer capacity exceeded'."""
        from musicstyletransfer_tpu.midi.codec import Melody, MelodyWriter
        from musicstyletransfer_tpu.midi.native import (
            NativeMIDIReader, available,
        )
        from musicstyletransfer_tpu.midi.vocab import note_on_id, timeshift_id

        if not available():
            pytest.skip("native library unavailable")
        # One real melody track (passes the >=10-token filter) + thousands
        # of empty tracks per file: 2 files x 3000 tracks = 6000 tracks,
        # far over the initial cap of 2*64 + 4096 = 4224.
        tokens = []
        for p in range(8):
            tokens += [note_on_id(60 + p), timeshift_id(120), note_on_id(60 + p)]
        melody = Melody(tokens=np.asarray(tokens, np.int32))
        mf = MelodyWriter().to_midifile(melody)
        mf.tracks.extend([smf.EndOfTrack(tick=0)] for _ in range(2999))
        mf.format = 1
        data = smf.dump_midifile(mf)
        paths = []
        for i in range(2):
            p = tmp_path / f"many-tracks-{i}.mid"
            p.write_bytes(data)
            paths.append(str(p))

        reader = NativeMIDIReader()
        scanned = reader.scan_files(paths, n_threads=2)
        assert len(scanned) == 2
        for path, melodies in zip(paths, scanned):
            ref = reader.read_file(path)
            assert len(melodies) == len(ref) == 1
            np.testing.assert_array_equal(melodies[0].tokens, ref[0].tokens)
