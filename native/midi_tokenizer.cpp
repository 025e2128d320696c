// Native host-side MIDI tokenizer: SMF bytes -> event-token streams.
//
// C++ twin of musicstyletransfer_tpu/midi/{smf,codec}.py (which mirrors the
// reference tokenizer MIDIUtil/midi_io.py:70-93 bit-identically, including
// the velocity-based event classification and the modulo time-shift loop).
// This is the hot host path when scanning large corpora (e.g. a Lakh MIDI
// subset): one pass over the bytes, no object graph, tokens written straight
// into caller-provided int32 buffers ready for numpy.
//
// C ABI (ctypes):
//   mst_tokenize_buffer(buf, len, out_tokens, out_cap, track_offsets,
//                       max_tracks, &n_tracks, &resolution, &bpm)
//     -> total token count, or a negative MST_ERR_* code.
// Track t's tokens are out_tokens[track_offsets[t] .. track_offsets[t+1]).

#include <atomic>
#include <cstdint>
#include <cstddef>
#include <cstdio>
#include <cstring>
#include <memory>
#include <thread>
#include <vector>

extern "C" {

enum {
  MST_ERR_NOT_SMF = -1,
  MST_ERR_TRUNCATED = -2,
  MST_ERR_UNSUPPORTED = -3,
  MST_ERR_CAPACITY = -4,
  MST_ERR_BAD_EVENT = -5,
  MST_ERR_TOO_LARGE = -6,  // corpus exceeds the int32 arena; no retry helps
};

}  // extern "C"

namespace {

// Vocabulary constants (musicstyletransfer_tpu/midi/vocab.py).
constexpr int32_t kNoteOnBase = 3;
constexpr int32_t kNoteOffBase = 131;
constexpr int32_t kTimeshiftBase = 259;
constexpr int32_t kMaxTicks = 1000;
constexpr int32_t kTicksPerBin = 30;

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;

  bool need(size_t n) const { return static_cast<size_t>(end - p) >= n; }
  uint8_t u8() { return *p++; }
  uint32_t u16() {
    uint32_t v = (static_cast<uint32_t>(p[0]) << 8) | p[1];
    p += 2;
    return v;
  }
  uint32_t u32() {
    uint32_t v = (static_cast<uint32_t>(p[0]) << 24) |
                 (static_cast<uint32_t>(p[1]) << 16) |
                 (static_cast<uint32_t>(p[2]) << 8) | p[3];
    p += 4;
    return v;
  }
};

// Variable-length quantity; returns false on truncation.
bool read_varlen(Cursor& c, uint32_t* out) {
  uint32_t value = 0;
  for (int i = 0; i < 5; ++i) {
    if (!c.need(1)) return false;
    uint8_t byte = c.u8();
    value = (value << 7) | (byte & 0x7F);
    if (!(byte & 0x80)) {
      *out = value;
      return true;
    }
  }
  return false;
}

int data_bytes_for(uint8_t status_kind) {
  switch (status_kind) {
    case 0x80: case 0x90: case 0xA0: case 0xB0: case 0xE0: return 2;
    case 0xC0: case 0xD0: return 1;
    default: return -1;
  }
}

struct TrackResult {
  int32_t n_tokens;
  double bpm;      // first SetTempo in this track, else < 0
};

// Tokenize one MTrk body (reference: midi_io.py:70-93 semantics).
int tokenize_track(const uint8_t* body, size_t len, int32_t* out,
                   int32_t out_cap, TrackResult* res) {
  Cursor c{body, body + len};
  int32_t n = 0;
  res->bpm = -1.0;
  int64_t cur_t = 0, prev_t = 0;
  int running_status = -1;

  while (c.p < c.end) {
    uint32_t tick;
    if (!read_varlen(c, &tick)) return MST_ERR_TRUNCATED;
    cur_t += tick;
    if (!c.need(1)) return MST_ERR_TRUNCATED;
    uint8_t status = *c.p;
    if (status >= 0x80) {
      c.p++;
      if (status < 0xF0) running_status = status;
    } else {
      if (running_status < 0) return MST_ERR_BAD_EVENT;
      status = static_cast<uint8_t>(running_status);
    }

    if (status == 0xFF) {  // meta
      if (!c.need(1)) return MST_ERR_TRUNCATED;
      uint8_t meta_type = c.u8();
      uint32_t mlen;
      if (!read_varlen(c, &mlen) || !c.need(mlen)) return MST_ERR_TRUNCATED;
      if (meta_type == 0x51 && mlen == 3 && res->bpm < 0) {
        uint32_t mpqn = (static_cast<uint32_t>(c.p[0]) << 16) |
                        (static_cast<uint32_t>(c.p[1]) << 8) | c.p[2];
        if (mpqn > 0) res->bpm = 6e7 / static_cast<double>(mpqn);
      }
      c.p += mlen;
      if (meta_type == 0x2F) break;  // end of track
    } else if (status == 0xF0 || status == 0xF7) {  // sysex
      uint32_t slen;
      if (!read_varlen(c, &slen) || !c.need(slen)) return MST_ERR_TRUNCATED;
      c.p += slen;
    } else {
      uint8_t kind = status & 0xF0;
      int nd = data_bytes_for(kind);
      if (nd < 0) return MST_ERR_BAD_EVENT;
      if (!c.need(static_cast<size_t>(nd))) return MST_ERR_TRUNCATED;
      const uint8_t* data = c.p;
      c.p += nd;
      if (kind == 0x90 || kind == 0x80) {
        int note = data[0];
        int velocity = data[1];
        // Quirky reference arithmetic, kept verbatim (SURVEY.md §8.1).
        int64_t delta_t = cur_t - prev_t;
        while (delta_t > 0) {
          int32_t shift = static_cast<int32_t>(delta_t % kMaxTicks);
          if (n >= out_cap) return MST_ERR_CAPACITY;
          out[n++] = kTimeshiftBase + shift / kTicksPerBin;
          delta_t -= kMaxTicks;
        }
        if (n >= out_cap) return MST_ERR_CAPACITY;
        // Classification is by velocity, not status byte
        // (reference: midi_io.py:85-89).
        if (velocity > 0) {
          out[n++] = kNoteOnBase + note;
        } else {
          out[n++] = kNoteOffBase + note;
        }
        prev_t = cur_t;
      }
    }
  }
  res->n_tokens = n;
  return n;
}

}  // namespace

extern "C" {

// Returns total tokens written, or MST_ERR_*. track_offsets must hold
// max_tracks + 1 entries; *n_tracks receives the parsed track count.
// *bpm receives the file BPM (first SetTempo anywhere, track order;
// 120 if none — reference: midi_io.py:16-25).
int32_t mst_tokenize_buffer(const uint8_t* buf, int64_t len,
                            int32_t* out_tokens, int32_t out_cap,
                            int32_t* track_offsets, int32_t max_tracks,
                            int32_t* n_tracks, int32_t* resolution,
                            double* bpm) {
  Cursor c{buf, buf + len};
  if (!c.need(14)) return MST_ERR_NOT_SMF;
  if (c.p[0] != 'M' || c.p[1] != 'T' || c.p[2] != 'h' || c.p[3] != 'd')
    return MST_ERR_NOT_SMF;
  c.p += 4;
  uint32_t header_len = c.u32();
  if (header_len < 6 || !c.need(header_len)) return MST_ERR_NOT_SMF;
  const uint8_t* header_end = c.p + header_len;
  c.u16();  // format
  uint32_t ntracks = c.u16();
  uint32_t division = c.u16();
  if (division & 0x8000) return MST_ERR_UNSUPPORTED;  // SMPTE
  *resolution = static_cast<int32_t>(division);
  c.p = header_end;

  if (static_cast<int32_t>(ntracks) > max_tracks) return MST_ERR_CAPACITY;

  double file_bpm = -1.0;
  int32_t total = 0;
  int32_t t = 0;
  for (; t < static_cast<int32_t>(ntracks); ++t) {
    if (!c.need(8)) return MST_ERR_TRUNCATED;
    if (c.p[0] != 'M' || c.p[1] != 'T' || c.p[2] != 'r' || c.p[3] != 'k')
      return MST_ERR_TRUNCATED;
    c.p += 4;
    uint32_t tlen = c.u32();
    if (!c.need(tlen)) return MST_ERR_TRUNCATED;
    track_offsets[t] = total;
    TrackResult res;
    int rc = tokenize_track(c.p, tlen, out_tokens + total, out_cap - total,
                            &res);
    if (rc < 0) return rc;
    total += rc;
    if (file_bpm < 0 && res.bpm > 0) file_bpm = res.bpm;
    c.p += tlen;
  }
  track_offsets[t] = total;
  *n_tracks = t;
  *bpm = file_bpm > 0 ? file_bpm : 120.0;
  return total;
}

}  // extern "C"

namespace {

struct FileScan {
  std::vector<int32_t> tokens;
  std::vector<int32_t> track_offsets;  // n_tracks + 1, file-local
  int32_t n_tracks = 0;
  int32_t resolution = 0;
  double bpm = 120.0;
  int32_t rc = 0;  // 0 ok, else MST_ERR_*
};

bool read_file_bytes(const char* path, std::vector<uint8_t>* out) {
  FILE* fh = std::fopen(path, "rb");
  if (!fh) return false;
  std::fseek(fh, 0, SEEK_END);
  long size = std::ftell(fh);
  if (size < 0) {
    std::fclose(fh);
    return false;
  }
  std::fseek(fh, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(out->data(), 1, out->size(), fh) : 0;
  std::fclose(fh);
  return got == out->size();
}

void scan_one(const char* path, FileScan* fs) {
  std::vector<uint8_t> buf;
  if (!read_file_bytes(path, &buf)) {
    fs->rc = MST_ERR_TRUNCATED;
    return;
  }
  // tokens <= ~2 per event byte; headroom for tiny files. Raw new[] keeps
  // the scratch UNINITIALIZED (vector::resize would memset 2x the file
  // size per file, which dominated the scan).
  int32_t cap = static_cast<int32_t>(buf.size() * 2 + 4096);
  std::unique_ptr<int32_t[]> scratch(new int32_t[static_cast<size_t>(cap)]);
  fs->track_offsets.resize(4097);
  int32_t total = mst_tokenize_buffer(
      buf.data(), static_cast<int64_t>(buf.size()), scratch.get(), cap,
      fs->track_offsets.data(), 4096, &fs->n_tracks, &fs->resolution,
      &fs->bpm);
  if (total < 0) {
    fs->rc = total;
    return;
  }
  fs->tokens.assign(scratch.get(), scratch.get() + total);
  fs->track_offsets.resize(static_cast<size_t>(fs->n_tracks) + 1);
}

}  // namespace

extern "C" {

// Threaded corpus scan: tokenize n_files SMF files with n_threads workers.
//
// Outputs (caller-allocated):
//   tokens_out[tokens_cap]      flat int32 token arena, file/track order
//   track_starts_out            absolute arena offsets, one per track,
//                               plus a final end sentinel
//                               (capacity: track_starts_cap entries)
//   file_track_index_out        n_files + 1: track-range per file into
//                               track_starts_out
//   file_rc_out                 n_files: 0 ok, else MST_ERR_* for THAT file
//   resolutions_out, bpms_out   n_files each
//
// Returns total token count, or MST_ERR_CAPACITY when an output does not
// fit — in which case *required_tokens_out / *required_tracks_out (either
// may be null) carry the EXACT buffer sizes a retry needs, so the caller
// reallocates once instead of doubling blind. A corpus whose token arena
// would exceed int32 offsets returns MST_ERR_TOO_LARGE (unretryable).
// Per-file parse errors do NOT fail the scan: the file gets rc != 0 and
// zero tracks.
int64_t mst_tokenize_files(const char** paths, int32_t n_files,
                           int32_t n_threads, int32_t* tokens_out,
                           int64_t tokens_cap, int32_t* track_starts_out,
                           int64_t track_starts_cap,
                           int32_t* file_track_index_out,
                           int32_t* file_rc_out, int32_t* resolutions_out,
                           double* bpms_out,
                           int64_t* required_tokens_out,
                           int64_t* required_tracks_out) {
  if (n_files <= 0) {
    file_track_index_out[0] = 0;
    return 0;
  }
  std::vector<FileScan> scans(static_cast<size_t>(n_files));
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n_files) return;
      scan_one(paths[i], &scans[static_cast<size_t>(i)]);
    }
  };
  int32_t nt = n_threads > 0 ? n_threads : 1;
  if (nt > n_files) nt = n_files;
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(nt));
  for (int32_t i = 0; i < nt; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();

  // Everything is tokenized in per-file scratch now, so the exact arena
  // requirements are known before any caller buffer is touched. Arena
  // offsets are int32 on the wire: refuse scans beyond 2^31 tokens rather
  // than silently wrapping.
  constexpr int64_t kMaxArena = 0x7FFFFFF0;
  int64_t req_tokens = 0;
  int64_t req_tracks = 1;  // end sentinel
  for (int32_t i = 0; i < n_files; ++i) {
    const FileScan& fs = scans[static_cast<size_t>(i)];
    if (fs.rc != 0) continue;
    req_tokens += static_cast<int64_t>(fs.tokens.size());
    req_tracks += fs.n_tracks;
  }
  if (required_tokens_out) *required_tokens_out = req_tokens;
  if (required_tracks_out) *required_tracks_out = req_tracks;
  if (req_tokens > kMaxArena) return MST_ERR_TOO_LARGE;
  if (req_tokens > tokens_cap || req_tracks > track_starts_cap) {
    return MST_ERR_CAPACITY;
  }

  // Serial merge into the caller's arena, preserving file order.
  int64_t total_tokens = 0;
  int64_t total_tracks = 0;
  for (int32_t i = 0; i < n_files; ++i) {
    const FileScan& fs = scans[static_cast<size_t>(i)];
    file_rc_out[i] = fs.rc;
    resolutions_out[i] = fs.resolution;
    bpms_out[i] = fs.bpm;
    file_track_index_out[i] = static_cast<int32_t>(total_tracks);
    if (fs.rc != 0) continue;
    for (int32_t t = 0; t < fs.n_tracks; ++t) {
      track_starts_out[total_tracks + t] =
          static_cast<int32_t>(total_tokens) + fs.track_offsets[t];
    }
    if (!fs.tokens.empty()) {
      std::memcpy(tokens_out + total_tokens, fs.tokens.data(),
                  fs.tokens.size() * sizeof(int32_t));
    }
    total_tokens += static_cast<int64_t>(fs.tokens.size());
    total_tracks += fs.n_tracks;
  }
  file_track_index_out[n_files] = static_cast<int32_t>(total_tracks);
  track_starts_out[total_tracks] = static_cast<int32_t>(total_tokens);
  return total_tokens;
}

}  // extern "C"
