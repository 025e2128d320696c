"""ctypes binding for the native C++ MIDI tokenizer (native/midi_tokenizer.cpp).

Drop-in accelerated twin of ``codec.EventBasedMIDIReader``: same
bit-identical token streams (asserted by tests over the whole corpus), one
pass over the file bytes with no Python object graph. Used by the corpus
Loader when the shared library is available; falls back to the pure-Python
codec otherwise.

Build: ``make -C native`` (or it is built on demand here, once, if a
compiler is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from .codec import Melody, melodies_from_tracks as _to_melodies
from .vocab import DEFAULT_BPM

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmst_native.so")

_ERRORS = {
    -1: "not an SMF file",
    -2: "truncated file",
    -3: "unsupported SMF feature (SMPTE division)",
    -4: "buffer capacity exceeded",
    -5: "bad event byte",
    -6: "corpus exceeds the int32 token arena (2^31 tokens); "
        "split the scan into smaller path batches",
}
_ERR_CAPACITY = -4  # MST_ERR_CAPACITY: caller retries with reported sizes

_lib: Optional[ctypes.CDLL] = None
_lib_load_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "midi_tokenizer.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _lib_is_stale() -> bool:
    """True when the built .so predates the C++ source: the ctypes
    signatures below track the CURRENT ABI (e.g. the required-size
    out-params the capacity-retry loop depends on), and calling an old
    binary through them silently degrades (zero-filled out-params turn
    recoverable capacity errors into hard failures)."""
    src = os.path.join(_NATIVE_DIR, "midi_tokenizer.cpp")
    try:
        return os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    except OSError:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library; None if unavailable."""
    global _lib, _lib_load_failed
    if _lib is not None:
        return _lib
    if _lib_load_failed:
        return None
    if (not os.path.exists(_LIB_PATH) or _lib_is_stale()) and not _build():
        _lib_load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_load_failed = True
        return None
    lib.mst_tokenize_buffer.restype = ctypes.c_int32
    lib.mst_tokenize_buffer.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.mst_tokenize_files.restype = ctypes.c_int64
    lib.mst_tokenize_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


class NativeMIDIReader:
    """Native-backed MIDI file -> tokenized melodies.

    Same surface and semantics as ``codec.EventBasedMIDIReader``
    (reference: midi_io.py:31-67): tracks with < 10 tokens are discarded
    with a warning; at least one melody must survive.
    """

    MIN_TRACK_TOKENS = 10
    # Must match the C++ scanner's per-file cap (scan_one), or the threaded
    # and per-file paths would accept different corpora.
    MAX_TRACKS = 4096

    def __init__(self) -> None:
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "native tokenizer unavailable (no compiler / build failed); "
                "use codec.EventBasedMIDIReader"
            )
        self._lib = lib

    def tokenize_bytes(self, buf: bytes):
        """-> (list of per-track int32 token arrays, bpm, resolution)."""
        cap = max(len(buf) * 2, 4096)  # tokens <= ~2 per event byte
        out = np.empty(cap, dtype=np.int32)
        offsets = np.empty(self.MAX_TRACKS + 1, dtype=np.int32)
        n_tracks = ctypes.c_int32(0)
        resolution = ctypes.c_int32(0)
        bpm = ctypes.c_double(DEFAULT_BPM)
        rc = self._lib.mst_tokenize_buffer(
            buf,
            len(buf),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.MAX_TRACKS,
            ctypes.byref(n_tracks),
            ctypes.byref(resolution),
            ctypes.byref(bpm),
        )
        if rc < 0:
            raise ValueError(f"native tokenizer: {_ERRORS.get(rc, rc)}")
        nt = n_tracks.value
        tracks = [
            out[offsets[t] : offsets[t + 1]].copy() for t in range(nt)
        ]
        return tracks, bpm.value, resolution.value

    def read_file(self, file_name: str) -> List[Melody]:
        with open(file_name, "rb") as fh:
            buf = fh.read()
        tracks, bpm, resolution = self.tokenize_bytes(buf)
        return _to_melodies(file_name, tracks, bpm, resolution,
                            self.MIN_TRACK_TOKENS)

    def scan_files(self, paths: List[str],
                   n_threads: Optional[int] = None) -> List[List[Melody]]:
        """Tokenize many files with the native THREADED scanner (one C call,
        file IO + parsing on C++ worker threads — the corpus-scale path for
        multi-core hosts; on a single core the extra merge copy makes the
        per-file path faster, and the Loader picks accordingly).

        Returns one melody list per file, same per-file semantics as
        ``read_file`` (short-track discard + >= 1 melody assert; a file the
        parser rejects raises ValueError naming it)."""
        if not paths:
            return []
        n = len(paths)
        if n_threads is None:
            n_threads = min(32, os.cpu_count() or 1)
        sizes = [os.path.getsize(p) for p in paths]
        tokens_cap = sum(s * 2 + 4096 for s in sizes)
        track_cap = n * 64 + 4096  # ~64 tracks/file headroom to start
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths]
        )
        file_track_index = np.empty(n + 1, dtype=np.int32)
        file_rc = np.empty(n, dtype=np.int32)
        resolutions = np.empty(n, dtype=np.int32)
        bpms = np.empty(n, dtype=np.float64)
        # The C contract (native/midi_tokenizer.cpp) is retry-on-capacity:
        # the caps above are heuristics — track-heavy corpora exceed the
        # ~64 tracks/file guess, and huge tick gaps can emit more tokens
        # than 2x the byte size. On MST_ERR_CAPACITY the scanner reports
        # the EXACT sizes it needs, so at most one retry with precisely
        # those allocations (no blind doubling toward a host OOM); an
        # arena beyond int32 offsets is MST_ERR_TOO_LARGE, unretryable.
        required_tokens = ctypes.c_int64(0)
        required_tracks = ctypes.c_int64(0)
        for _ in range(2):
            tokens = np.empty(tokens_cap, dtype=np.int32)
            track_starts = np.empty(track_cap, dtype=np.int32)
            total = self._lib.mst_tokenize_files(
                c_paths, n, n_threads,
                tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                tokens_cap,
                track_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                track_cap,
                file_track_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                file_rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                resolutions.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                bpms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ctypes.byref(required_tokens),
                ctypes.byref(required_tracks),
            )
            if total != _ERR_CAPACITY:
                break
            tokens_cap = max(required_tokens.value, 1)
            track_cap = max(required_tracks.value, 1)
        if total < 0:
            raise ValueError(f"native corpus scan: {_ERRORS.get(total, total)}")
        out: List[List[Melody]] = []
        for i, path in enumerate(paths):
            if file_rc[i] != 0:
                raise ValueError(
                    f"{path}: {_ERRORS.get(int(file_rc[i]), int(file_rc[i]))}"
                )
            lo, hi = int(file_track_index[i]), int(file_track_index[i + 1])
            bounds = list(track_starts[lo : hi + 1])
            tracks = [
                tokens[bounds[t] : bounds[t + 1]].copy()
                for t in range(hi - lo)
            ]
            out.append(
                _to_melodies(path, tracks, float(bpms[i]),
                             int(resolutions[i]), self.MIN_TRACK_TOKENS)
            )
        return out
