// snappier_tpu native host runtime: scalar Snappy block codec + CRC32C.
//
// Role in the framework (SURVEY.md §2.3): the TPU owns the batched bulk
// path; this library is the host-side engine for the latency path —
// small buffers (where device dispatch overhead dominates), stream
// state machines, and environments without an accelerator. Written
// from scratch against the wire-format law in SURVEY.md §2.1
// (reference behaviors cited per function); exposed via a C ABI for
// ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libsnappy_core.so snappy_core.cpp

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <atomic>
#include <thread>
#include <vector>
#include <memory>
#include <unistd.h>

namespace {

constexpr size_t kBlockSize = 1 << 16;      // Constants.cs:26
constexpr int kMaxHashBits = 14;            // HashTable.cs:14-18 upper bound
constexpr uint32_t kHashMul = 0x1e35a7bd;   // HashTable.cs magic-multiply

inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/arm64)
}

inline uint64_t load64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

inline void store64(uint8_t* p, uint64_t v) { std::memcpy(p, &v, 8); }

// Copy len bytes with 16-byte strides; may write up to 15 bytes of
// slack past dst+len (callers guarantee slack headroom).
inline void copy_sloppy(uint8_t* dst, const uint8_t* src, size_t len) {
  for (size_t k = 0; k < len; k += 16) {
    store64(dst + k, load64(src + k));
    store64(dst + k + 8, load64(src + k + 8));
  }
}

inline void store16(uint8_t* p, uint16_t v) { std::memcpy(p, &v, 2); }

// --- emit helpers (wire law: SnappyCompressor.cs:417-543) -------------------

inline uint8_t* emit_literal(uint8_t* op, const uint8_t* lit, size_t len) {
  if (len == 0) return op;
  if (len <= 60) {
    *op++ = static_cast<uint8_t>((len - 1) << 2);
  } else {
    uint8_t* base = op++;
    size_t count = 0;
    size_t rem = len - 1;
    while (rem > 0) {
      *op++ = static_cast<uint8_t>(rem & 0xff);
      rem >>= 8;
      ++count;
    }
    *base = static_cast<uint8_t>((59 + count) << 2);
  }
  std::memcpy(op, lit, len);
  return op + len;
}

inline uint8_t* emit_copy_upto64(uint8_t* op, size_t offset, size_t len) {
  if (len <= 11 && offset < 2048) {
    *op++ = static_cast<uint8_t>(1 | ((len - 4) << 2) | ((offset >> 8) << 5));
    *op++ = static_cast<uint8_t>(offset & 0xff);
  } else {
    *op++ = static_cast<uint8_t>(2 | ((len - 1) << 2));
    store16(op, static_cast<uint16_t>(offset));
    op += 2;
  }
  return op;
}

inline uint8_t* emit_copy(uint8_t* op, size_t offset, size_t len) {
  // Repeated 64s with the 64<len<68 split (SnappyCompressor.cs:516-543).
  while (len >= 68) {
    op = emit_copy_upto64(op, offset, 64);
    len -= 64;
  }
  if (len > 64) {
    op = emit_copy_upto64(op, offset, 60);
    len -= 60;
  }
  return emit_copy_upto64(op, offset, len);
}

inline size_t match_length(const uint8_t* a, const uint8_t* b,
                           const uint8_t* b_limit) {
  // 8-byte XOR + count-trailing-zeros (FindMatchLengthX64,
  // SnappyCompressor.cs:606-688).
  size_t n = 0;
  while (b + 8 <= b_limit) {
    uint64_t x = load64(a + n) ^ load64(b);
    if (x != 0) return n + (static_cast<size_t>(__builtin_ctzll(x)) >> 3);
    n += 8;
    b += 8;
  }
  while (b < b_limit && a[n] == *b) {
    ++n;
    ++b;
  }
  return n;
}

// One fragment (<= 64 KiB). Greedy with a 14-bit lossy hash table and
// skip heuristic (CompressFragment, SnappyCompressor.cs:174-415).
uint8_t* compress_fragment(const uint8_t* input, size_t n, uint8_t* op,
                           uint16_t* table) {
  std::memset(table, 0, sizeof(uint16_t) << kMaxHashBits);
  const int shift = 32 - kMaxHashBits;
  auto hash = [shift](uint32_t v) { return (v * kHashMul) >> shift; };

  const uint8_t* ip = input;
  const uint8_t* ip_end = input + n;
  const uint8_t* lit_start = input;
  if (n >= 16) {
    const uint8_t* ip_limit = ip_end - 15;  // InputMarginBytes
    uint32_t skip = 32;
    ++ip;
    while (ip < ip_limit) {
      uint32_t cur = load32(ip);
      uint32_t h = hash(cur);
      const uint8_t* cand = input + table[h];
      table[h] = static_cast<uint16_t>(ip - input);
      if (cand < ip && load32(cand) == cur) {
        skip = 32;
        size_t len =
            4 + match_length(cand + 4, ip + 4, ip_end);
        op = emit_literal(op, lit_start, ip - lit_start);
        op = emit_copy(op, ip - cand, len);
        // Seed the table across the covered span (denser than the
        // reference's 2-per-match for a better ratio at modest cost).
        const uint8_t* end = ip + len;
        const uint8_t* seed_end = end < ip_limit ? end : ip_limit;
        for (const uint8_t* p = ip + 1; p + 4 <= seed_end; p += 2) {
          table[hash(load32(p))] = static_cast<uint16_t>(p - input);
        }
        ip = end;
        lit_start = end;
        continue;
      }
      // Skip heuristic (SnappyCompressor.cs:315-341): stride stays 1
      // for the first 32 misses, then grows every 32.
      ip += skip++ >> 5;
    }
  }
  return emit_literal(op, lit_start, ip_end - lit_start);
}

inline int write_varint32(uint8_t* p, uint32_t v) {
  int i = 0;
  while (v >= 0x80) {
    p[i++] = static_cast<uint8_t>(v | 0x80);
    v >>= 7;
  }
  p[i++] = static_cast<uint8_t>(v);
  return i;
}

// --- CRC32C (Castagnoli, reflected; slicing-by-8) ---------------------------

uint32_t crc_table[8][256];
bool crc_init_done = false;

void crc_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ 0x82f63b78u : c >> 1;
    crc_table[0][i] = c;
  }
  for (int t = 1; t < 8; ++t)
    for (uint32_t i = 0; i < 256; ++i)
      crc_table[t][i] =
          (crc_table[t - 1][i] >> 8) ^ crc_table[0][crc_table[t - 1][i] & 0xff];
  crc_init_done = true;
}

// Spawn nt-1 workers (the calling thread is worker 0) and join them.
// Spawn failure mid-loop is benign for atomic-queue workers: the
// already-running ones drain the queue. Never lets an exception cross
// back (the callers sit behind an extern-C boundary). Shared by the
// block and stream MT codecs so the containment rules live in ONE
// place (round-5 second-pass review). Lives outside the extern-C
// block (templates cannot take C linkage); internal linkage via this
// anonymous namespace.
template <typename F>
void run_worker_pool(std::vector<std::thread>& pool, unsigned nt,
                     F&& worker) {
  try {
    for (unsigned t = 1; t < nt; ++t) pool.emplace_back(worker, t);
  } catch (...) {
  }
  worker(0u);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Error codes shared with snappier_tpu.errors.
enum {
  STPU_OK = 0,
  STPU_INVALID_DATA = 1,
  STPU_BUFFER_TOO_SMALL = 2,
};

size_t stpu_max_compressed_length(size_t n) {
  return 32 + n + n / 6 + 1 + 5;  // Helpers.cs:17-49 + varint slack
}

// TEST HOOK (the reference exposes FindMatchLength to its test
// assembly via InternalsVisibleTo, SnappyCompressorTests.cs:10-96):
// match length between buf[a..] and buf[b..], reading b up to
// buf + b_limit. No overread: every 8-byte load needs b + 8 <= b_limit
// and the a-side pointer trails b (a < b throughout).
size_t stpu_match_length_test(const uint8_t* buf, size_t a, size_t b,
                              size_t b_limit) {
  return match_length(buf + a, buf + b, buf + b_limit);
}

int stpu_compress(const uint8_t* input, size_t n, uint8_t* out,
                  size_t out_cap, size_t* out_len) {
  if (out_cap < stpu_max_compressed_length(n)) return STPU_BUFFER_TOO_SMALL;
  if (n > 0xffffffffu) return STPU_INVALID_DATA;
  uint16_t table[1u << kMaxHashBits];
  uint8_t* op = out + write_varint32(out, static_cast<uint32_t>(n));
  for (size_t start = 0; start < n; start += kBlockSize) {
    size_t frag = n - start < kBlockSize ? n - start : kBlockSize;
    op = compress_fragment(input + start, frag, op, table);
  }
  *out_len = static_cast<size_t>(op - out);
  return STPU_OK;
}

int stpu_uncompressed_length(const uint8_t* input, size_t n, uint64_t* val) {
  uint64_t v = 0;
  for (int i = 0; i < 5; ++i) {
    if (static_cast<size_t>(i) >= n) return STPU_INVALID_DATA;
    uint8_t b = input[i];
    v |= static_cast<uint64_t>(b & 0x7f) << (7 * i);
    if (!(b & 0x80)) {
      if (v > 0xffffffffu) return STPU_INVALID_DATA;
      *val = v;
      return STPU_OK;
    }
  }
  return STPU_INVALID_DATA;
}

// Strict decoder (DecompressAllTags semantics, SnappyDecompressor.cs
// :184-347 with bounds checks :570-606).
//
// `out_cap` must be >= expected. Tag-granular copies use sloppy
// 16-byte strides and pattern doubling that spill tens of bytes past
// the tag's logical end, so each tag first checks it has >= 32 bytes
// of headroom inside out_cap and falls back to exact-width copies
// when it does not — which makes decoding directly into a caller's
// exactly-sized buffer safe (Snappy.Decompress(input, output) /
// BufferWriter.GetMemory(expectedLength) parity,
// SnappyDecompressor.cs:524-527). Callers that allocate 64 bytes of
// slack (the Python `decompress()` wrapper) never take the exact
// path, so the bulk fast path is unchanged.
static int decode_tag_stream(const uint8_t* input, size_t ip, size_t n,
                             uint8_t* out, size_t op0, size_t expected,
                             size_t out_cap, size_t* out_len);

int stpu_decompress(const uint8_t* input, size_t n, uint8_t* out,
                    size_t out_cap, size_t* out_len) {
  uint64_t expected64 = 0;
  if (stpu_uncompressed_length(input, n, &expected64) != STPU_OK)
    return STPU_INVALID_DATA;
  size_t expected = static_cast<size_t>(expected64);
  if (out_cap < expected) return STPU_BUFFER_TOO_SMALL;
  size_t ip = 0;
  while (input[ip] & 0x80) ++ip;
  ++ip;
  return decode_tag_stream(input, ip, n, out, 0, expected, out_cap,
                           out_len);
}

// Core tag-stream decoder shared by the whole-block entry point and
// the fragment-parallel MT path: decodes input[ip, n) into out
// starting at output position op0, requiring the stream to land
// exactly on `expected`. `out_cap` bounds the sloppy wide copies
// (byte-precise in the last 32 bytes), so adjacent MT workers'
// exact-capacity ranges never overlap.
static int decode_tag_stream(const uint8_t* input, size_t ip, size_t n,
                             uint8_t* out, size_t op0, size_t expected,
                             size_t out_cap, size_t* out_len) {
  size_t op = op0;
  while (ip < n) {
    const uint8_t tag = input[ip];
    const uint32_t type = tag & 3;
    if (type == 0) {  // literal
      size_t len;
      size_t hdr = 1;
      uint32_t len6 = tag >> 2;
      if (len6 < 60) {
        len = len6 + 1;
      } else {
        size_t extra = len6 - 59;
        if (ip + 1 + extra > n) return STPU_INVALID_DATA;
        uint64_t l = 0;
        for (size_t k = 0; k < extra; ++k)
          l |= static_cast<uint64_t>(input[ip + 1 + k]) << (8 * k);
        len = static_cast<size_t>(l) + 1;
        hdr += extra;
      }
      if (ip + hdr + len > n) return STPU_INVALID_DATA;
      if (op + len > expected) return STPU_INVALID_DATA;
      if (len <= 16 && ip + hdr + 16 <= n && op + len + 32 <= out_cap) {
        copy_sloppy(out + op, input + ip + hdr, len);
      } else {
        std::memcpy(out + op, input + ip + hdr, len);
      }
      ip += hdr + len;
      op += len;
      continue;
    }
    size_t len, offset, hdr;
    if (type == 1) {
      if (ip + 2 > n) return STPU_INVALID_DATA;
      len = ((tag >> 2) & 7) + 4;
      offset = (static_cast<size_t>(tag >> 5) << 8) | input[ip + 1];
      hdr = 2;
    } else if (type == 2) {
      if (ip + 3 > n) return STPU_INVALID_DATA;
      len = (tag >> 2) + 1;
      offset = input[ip + 1] | (static_cast<size_t>(input[ip + 2]) << 8);
      hdr = 3;
    } else {
      if (ip + 5 > n) return STPU_INVALID_DATA;
      len = (tag >> 2) + 1;
      offset = static_cast<size_t>(load32(input + ip + 1));
      hdr = 5;
    }
    if (offset == 0 || offset > op) return STPU_INVALID_DATA;
    if (op + len > expected) return STPU_INVALID_DATA;
    uint8_t* dst = out + op;
    const uint8_t* src = dst - offset;
    const bool room = op + len + 32 <= out_cap;  // sloppy strides fit
    if (offset >= 16) {
      if (room) {
        copy_sloppy(dst, src, len);  // slack makes strided copy safe
      } else {
        // Exact-width forward copy: 16-byte chunks never catch the
        // writer (src trails dst by >= 16), tail is a precise memcpy.
        size_t k = 0;
        for (; k + 16 <= len; k += 16) {
          store64(dst + k, load64(src + k));
          store64(dst + k + 8, load64(src + k + 8));
        }
        if (k < len) std::memcpy(dst + k, src + k, len - k);
      }
    } else if (offset >= len) {
      std::memcpy(dst, src, len);
    } else if (room) {
      // Overlapping pattern (IncrementalCopy, CopyHelpers.cs:64-219):
      // seed one period from prior output, double it to >= 16 bytes,
      // then stride (reader trails writer by >= 16). May write < 32
      // bytes past dst+len; the headroom check above covers it.
      std::memcpy(dst, src, offset);
      size_t filled = offset;
      while (filled < 16 && filled < len) {
        std::memcpy(dst + filled, dst, filled);
        filled += filled;
      }
      if (len > filled) copy_sloppy(dst + filled, dst, len - filled);
    } else {
      // Exact pattern doubling for the last bytes of the buffer.
      std::memcpy(dst, src, offset);
      size_t filled = offset;
      while (filled < len) {
        size_t m = filled < len - filled ? filled : len - filled;
        std::memcpy(dst + filled, dst, m);
        filled += m;
      }
    }
    ip += hdr;
    op += len;
  }
  if (op != expected) return STPU_INVALID_DATA;
  *out_len = op;
  return STPU_OK;
}

// Tag-boundary prescan: split a block-format tag stream into fragments
// at exact 64 KiB *output* boundaries so a device batch can decode the
// fragments independently (SnappyDecompressor.cs:43-184 handles any
// size serially; the TPU path needs block-granular work items —
// SURVEY.md §7.2 L3). Walking tag *headers* only (literal payloads are
// skipped) runs at GB/s.
//
// Literal tags are freely splittable (their bytes carry no
// dependencies), so a straddling literal is recorded as a synthetic
// tail slice for the current fragment plus a lead slice for the next.
// Copies are not splittable and may legally (per the wire format)
// reach across a fragment's output start; every known encoder —
// including the reference and google/snappy — resets its window per
// 64 KiB fragment and never emits such a copy, but if one appears the
// scan reports STPU_WINDOW_CROSS and the caller falls back to the
// serial host decoder.
//
// Record layout per fragment (7 x int64):
//   [0] tags_begin   comp offset of first complete tag
//   [1] tags_end     comp offset past last complete tag
//   [2] lead_src     comp offset of leading literal payload slice
//   [3] lead_len     bytes of leading synthetic literal (0 = none)
//   [4] tail_src     comp offset of trailing literal payload slice
//   [5] tail_len     bytes of trailing synthetic literal (0 = none)
//   [6] out_len      uncompressed bytes produced by this fragment
enum { STPU_WINDOW_CROSS = 3 };

int stpu_scan_fragments(const uint8_t* input, size_t n, int64_t* recs,
                        size_t max_frags, size_t* n_frags) {
  uint64_t expected64 = 0;
  if (stpu_uncompressed_length(input, n, &expected64) != STPU_OK)
    return STPU_INVALID_DATA;
  size_t expected = static_cast<size_t>(expected64);
  size_t ip = 0;
  while (input[ip] & 0x80) ++ip;
  ++ip;

  size_t nf = 0;
  size_t op = 0, frag_start = 0;
  size_t tags_begin = ip, lead_src = 0, lead_len = 0;
  auto close_frag = [&](size_t tags_end, size_t tail_src, size_t tail_len,
                        size_t out_len) -> bool {
    if (nf >= max_frags) return false;
    int64_t* r = recs + nf * 7;
    r[0] = static_cast<int64_t>(tags_begin);
    r[1] = static_cast<int64_t>(tags_end);
    r[2] = static_cast<int64_t>(lead_src);
    r[3] = static_cast<int64_t>(lead_len);
    r[4] = static_cast<int64_t>(tail_src);
    r[5] = static_cast<int64_t>(tail_len);
    r[6] = static_cast<int64_t>(out_len);
    ++nf;
    return true;
  };

  while (ip < n) {
    size_t frag_end = frag_start + kBlockSize;
    const uint8_t tag = input[ip];
    const uint32_t type = tag & 3;
    if (type == 0) {  // literal
      size_t hdr = 1, len;
      uint32_t len6 = tag >> 2;
      if (len6 < 60) {
        len = len6 + 1;
      } else {
        size_t extra = len6 - 59;
        if (ip + 1 + extra > n) return STPU_INVALID_DATA;
        uint64_t l = 0;
        for (size_t k = 0; k < extra; ++k)
          l |= static_cast<uint64_t>(input[ip + 1 + k]) << (8 * k);
        len = static_cast<size_t>(l) + 1;
        hdr += extra;
      }
      if (ip + hdr + len > n) return STPU_INVALID_DATA;
      if (op + len > expected) return STPU_INVALID_DATA;
      if (op + len <= frag_end) {
        op += len;
        ip += hdr + len;
      } else {  // straddles: split the literal at output lines
        size_t take = frag_end - op;
        if (!close_frag(ip, ip + hdr, take, kBlockSize))
          return STPU_INVALID_DATA;
        size_t src = ip + hdr + take, rem = len - take;
        while (rem >= kBlockSize) {
          lead_src = src;
          lead_len = kBlockSize;
          tags_begin = ip + hdr + len;  // empty tag range
          if (!close_frag(tags_begin, 0, 0, kBlockSize))
            return STPU_INVALID_DATA;
          src += kBlockSize;
          rem -= kBlockSize;
          frag_start += kBlockSize;
        }
        lead_src = src;
        lead_len = rem;
        tags_begin = ip + hdr + len;
        frag_start += kBlockSize;
        op += len;
        ip += hdr + len;
        continue;
      }
    } else {  // copy
      size_t hdr, len, offset;
      if (type == 1) {
        if (ip + 2 > n) return STPU_INVALID_DATA;
        len = ((tag >> 2) & 7) + 4;
        offset = (static_cast<size_t>(tag >> 5) << 8) | input[ip + 1];
        hdr = 2;
      } else if (type == 2) {
        if (ip + 3 > n) return STPU_INVALID_DATA;
        len = (tag >> 2) + 1;
        offset = input[ip + 1] | (static_cast<size_t>(input[ip + 2]) << 8);
        hdr = 3;
      } else {
        if (ip + 5 > n) return STPU_INVALID_DATA;
        len = (tag >> 2) + 1;
        offset = static_cast<size_t>(load32(input + ip + 1));
        hdr = 5;
      }
      if (offset == 0 || offset > op) return STPU_INVALID_DATA;
      if (op + len > expected) return STPU_INVALID_DATA;
      if (op + len > frag_end) return STPU_WINDOW_CROSS;   // copy on the line
      if (offset > op - frag_start) return STPU_WINDOW_CROSS;  // cross reach
      op += len;
      ip += hdr;
    }
    if (op == frag_start + kBlockSize && ip < n) {
      if (!close_frag(ip, 0, 0, kBlockSize)) return STPU_INVALID_DATA;
      tags_begin = ip;
      lead_src = 0;
      lead_len = 0;
      frag_start = op;
    }
  }
  if (op != expected) return STPU_INVALID_DATA;
  if (op > frag_start || lead_len > 0 || tags_begin < ip || nf == 0) {
    if (!close_frag(ip, 0, 0, op - frag_start)) return STPU_INVALID_DATA;
  }
  *n_frags = nf;
  return STPU_OK;
}

// ---------------------------------------------------------------------------
// Multithreaded BLOCK codec. Fragments are the format's independence
// unit (64 KiB input windows on compress; exact 64 KiB output lines on
// decompress via the prescan), so the host block codec parallelizes
// the same way the stream codec and the TPU batch path do. Output
// bytes are identical to the serial entry points in both directions.

static unsigned resolve_threads(int threads, size_t work_items);

int stpu_compress_mt(const uint8_t* input, size_t n, uint8_t* out,
                     size_t out_cap, size_t* out_len, int threads) {
  if (out_cap < stpu_max_compressed_length(n)) return STPU_BUFFER_TOO_SMALL;
  if (n > 0xffffffffu) return STPU_INVALID_DATA;
  size_t nfrags = (n + kBlockSize - 1) / kBlockSize;
  unsigned nt = resolve_threads(threads, nfrags ? nfrags : 1);
  // Below 8 fragments (512 KiB) the fixed costs (thread spawn, slot
  // scratch, compaction copy) rival the win — stay serial.
  if (nfrags < 8 || nt < 2)
    return stpu_compress(input, n, out, out_cap, out_len);
  // Fragment bodies land in an internal scratch at worst-case slots
  // (the caller's buffer is sized for the SUM bound, which is smaller
  // than nfrags * per-fragment bound), then compact into `out` after
  // the varint preamble. All throwing allocations happen here, on the
  // calling thread, with a serial fallback (see stream MT notes).
  // The scratch is default-initialized (new[], not vector): zero-
  // filling ~1.17x the input would be a wasted full memory pass.
  const size_t W = stpu_max_compressed_length(kBlockSize);
  std::unique_ptr<uint8_t[]> scratch;
  std::vector<size_t> sizes;
  std::vector<std::vector<uint16_t>> tables;
  std::vector<std::thread> pool;
  std::atomic<size_t> next{0};
  try {
    scratch.reset(new uint8_t[nfrags * W]);
    sizes.assign(nfrags, 0);
    tables.resize(nt);
    for (unsigned t = 0; t < nt; ++t)
      tables[t].resize(size_t{1} << kMaxHashBits);
    pool.reserve(nt - 1);
  } catch (...) {
    return stpu_compress(input, n, out, out_cap, out_len);
  }
  uint8_t* slots = scratch.get();
  auto worker = [&](unsigned wid) {
    uint16_t* table = tables[wid].data();
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= nfrags) return;
      size_t start = i * kBlockSize;
      size_t frag = n - start < kBlockSize ? n - start : kBlockSize;
      uint8_t* slot = slots + i * W;
      uint8_t* bp = compress_fragment(input + start, frag, slot, table);
      sizes[i] = static_cast<size_t>(bp - slot);
    }
  };
  run_worker_pool(pool, nt, worker);
  uint8_t* op = out + write_varint32(out, static_cast<uint32_t>(n));
  for (size_t i = 0; i < nfrags; ++i) {
    std::memcpy(op, slots + i * W, sizes[i]);
    op += sizes[i];
  }
  *out_len = static_cast<size_t>(op - out);
  return STPU_OK;
}

int stpu_decompress_mt(const uint8_t* input, size_t n, uint8_t* out,
                       size_t out_cap, size_t* out_len, int threads) {
  uint64_t expected64 = 0;
  if (stpu_uncompressed_length(input, n, &expected64) != STPU_OK)
    return STPU_INVALID_DATA;
  size_t expected = static_cast<size_t>(expected64);
  if (out_cap < expected) return STPU_BUFFER_TOO_SMALL;
  size_t nfrags_cap = expected / kBlockSize + 3;
  unsigned nt = resolve_threads(threads, expected / kBlockSize + 1);
  if (expected <= kBlockSize || nt < 2)
    return stpu_decompress(input, n, out, out_cap, out_len);
  std::vector<int64_t> recs;
  std::vector<std::thread> pool;
  try {
    recs.resize(nfrags_cap * 7);
    pool.reserve(nt - 1);
  } catch (...) {
    return stpu_decompress(input, n, out, out_cap, out_len);
  }
  size_t nf = 0;
  int rc0 = stpu_scan_fragments(input, n, recs.data(), nfrags_cap, &nf);
  if (rc0 == STPU_WINDOW_CROSS)  // spec-legal, unseen in practice
    return stpu_decompress(input, n, out, out_cap, out_len);
  if (rc0 != STPU_OK) return rc0;
  std::atomic<size_t> next{0};
  std::atomic<int> rc{STPU_OK};
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= nf || rc.load(std::memory_order_relaxed) != STPU_OK)
        return;
      const int64_t* r = recs.data() + i * 7;
      // Record layout: see stpu_scan_fragments. Fragment i's output
      // range is [i * 64Ki, i * 64Ki + out_len) — exact capacity so
      // no worker writes a neighbor's bytes.
      uint8_t* dst = out + i * kBlockSize;
      size_t frag_out = static_cast<size_t>(r[6]);
      size_t lead = static_cast<size_t>(r[3]);
      size_t tail = static_cast<size_t>(r[5]);
      if (lead) std::memcpy(dst, input + r[2], lead);
      size_t op_end = frag_out - tail;
      size_t got = 0;
      int c = decode_tag_stream(input, static_cast<size_t>(r[0]),
                                static_cast<size_t>(r[1]), dst, lead,
                                op_end, frag_out, &got);
      if (c != STPU_OK) {
        rc.store(c);
        return;
      }
      if (tail) std::memcpy(dst + op_end, input + r[4], tail);
    }
  };
  run_worker_pool(pool, nt, [&](unsigned) { worker(); });
  if (rc.load() != STPU_OK) return rc.load();
  *out_len = expected;
  return STPU_OK;
}

// ---------------------------------------------------------------------------
// Framing format (Snappy streaming format): host-side one-shot stream
// compress/decompress. Chunk layout per SnappyStreamCompressor.cs:
// 10-byte sNaPpY stream-identifier chunk, then per data chunk 1-byte
// type + 3-byte LE length + 4-byte LE masked CRC32C of the
// UNCOMPRESSED payload, with the uncompressed fallback when
// compression does not shrink (SnappyStreamCompressor.cs:213-229).
// This is the GB/s host IO pipeline behind the Python stream facade
// (the chunk state machines stay in Python for incremental feeds; the
// one-shot paths route here).

uint32_t stpu_crc32c(const uint8_t* data, size_t n, uint32_t crc);

static const uint8_t kStreamHeader[10] = {0xff, 0x06, 0x00, 0x00, 0x73,
                                          0x4e, 0x61, 0x50, 0x70, 0x59};

static inline uint32_t mask_crc32c(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;  // Crc32CAlgorithm.cs:157
}

static inline uint32_t load24(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16);
}

size_t stpu_stream_max_compressed_length(size_t n) {
  size_t chunks = n / kBlockSize + 1;
  return 10 + chunks * (8 + stpu_max_compressed_length(kBlockSize));
}

int stpu_stream_compress(const uint8_t* input, size_t n, uint8_t* out,
                         size_t out_cap, size_t* out_len) {
  if (out_cap < stpu_stream_max_compressed_length(n))
    return STPU_BUFFER_TOO_SMALL;
  uint8_t* op = out;
  std::memcpy(op, kStreamHeader, 10);
  op += 10;
  uint16_t table[1u << kMaxHashBits];
  for (size_t start = 0; start < n; start += kBlockSize) {
    size_t chunk = n - start < kBlockSize ? n - start : kBlockSize;
    const uint8_t* src = input + start;
    uint32_t crc = mask_crc32c(stpu_crc32c(src, chunk, 0));
    // Compress the block body in place after the 8-byte chunk header
    // (type+len+crc), exactly where it lands if it shrinks.
    uint8_t* body = op + 8;
    uint8_t* bp = body + write_varint32(body, static_cast<uint32_t>(chunk));
    bp = compress_fragment(src, chunk, bp, table);
    size_t comp_len = static_cast<size_t>(bp - body);
    uint8_t type;
    size_t payload;
    if (comp_len < chunk) {
      type = 0x00;  // CompressedData
      payload = comp_len;
    } else {
      type = 0x01;  // UncompressedData fallback
      payload = chunk;
      std::memcpy(body, src, chunk);
    }
    op[0] = type;
    op[1] = static_cast<uint8_t>((payload + 4) & 0xff);
    op[2] = static_cast<uint8_t>(((payload + 4) >> 8) & 0xff);
    op[3] = static_cast<uint8_t>(((payload + 4) >> 16) & 0xff);
    op[4] = static_cast<uint8_t>(crc & 0xff);
    op[5] = static_cast<uint8_t>((crc >> 8) & 0xff);
    op[6] = static_cast<uint8_t>((crc >> 16) & 0xff);
    op[7] = static_cast<uint8_t>((crc >> 24) & 0xff);
    op = body + payload;
  }
  *out_len = static_cast<size_t>(op - out);
  return STPU_OK;
}

// Exact total uncompressed size of a framed stream (header walk only;
// lets the caller size the output buffer before stpu_stream_decompress;
// add 64 bytes of sloppy-copy slack when allocating).
int stpu_stream_uncompressed_length(const uint8_t* input, size_t n,
                                    uint64_t* total) {
  size_t ip = 0;
  uint64_t sum = 0;
  while (ip < n) {
    if (ip + 4 > n) return STPU_INVALID_DATA;
    uint8_t type = input[ip];
    size_t plen = load24(input + ip + 1);
    if (ip + 4 + plen > n) return STPU_INVALID_DATA;
    if (type == 0x00) {
      if (plen < 4) return STPU_INVALID_DATA;
      uint64_t expected = 0;
      if (stpu_uncompressed_length(input + ip + 8, plen - 4, &expected) !=
              STPU_OK ||
          expected > kBlockSize)  // spec caps chunks at 64 KiB; reject here
        return STPU_INVALID_DATA;  // so callers never size a huge buffer
      sum += expected;
    } else if (type == 0x01) {
      if (plen < 4 || plen - 4 > kBlockSize) return STPU_INVALID_DATA;
      sum += plen - 4;
    }
    ip += 4 + plen;
  }
  *total = sum;
  return STPU_OK;
}

int stpu_stream_decompress(const uint8_t* input, size_t n, uint8_t* out,
                           size_t out_cap, size_t* out_len) {
  size_t ip = 0;
  size_t op = 0;
  bool seen_header = false;
  while (ip < n) {
    if (ip + 4 > n) return STPU_INVALID_DATA;  // trailing partial chunk
    uint8_t type = input[ip];
    size_t plen = load24(input + ip + 1);
    if (ip + 4 + plen > n) return STPU_INVALID_DATA;
    const uint8_t* payload = input + ip + 4;
    ip += 4 + plen;
    if (type == 0xff) {  // StreamIdentifier
      if (plen != 6 || std::memcmp(payload, kStreamHeader + 4, 6) != 0)
        return STPU_INVALID_DATA;
      seen_header = true;
      continue;
    }
    if (type == 0xfe || type >= 0x80) {  // padding / skippable
      // The stream must START with the identifier chunk (framing spec;
      // parity with the Python machine, which rejects any pre-header
      // chunk — found by the framing mutation-parity sweep).
      if (!seen_header) return STPU_INVALID_DATA;
      continue;
    }
    if (type > 0x01) return STPU_INVALID_DATA;   // unknown unskippable
    if (!seen_header) return STPU_INVALID_DATA;
    if (plen < 4) return STPU_INVALID_DATA;  // shorter than its CRC
    uint32_t want_crc = load32(payload);
    const uint8_t* body = payload + 4;
    size_t body_len = plen - 4;
    size_t produced;
    if (type == 0x00) {
      uint64_t expected = 0;
      if (stpu_uncompressed_length(body, body_len, &expected) != STPU_OK ||
          expected > kBlockSize)
        return STPU_INVALID_DATA;
      size_t dlen = 0;
      int rc = stpu_decompress(body, body_len, out + op, out_cap - op, &dlen);
      if (rc != STPU_OK) return rc;
      produced = dlen;
    } else {
      if (body_len > kBlockSize) return STPU_INVALID_DATA;
      if (op + body_len > out_cap) return STPU_BUFFER_TOO_SMALL;
      std::memcpy(out + op, body, body_len);
      produced = body_len;
    }
    if (mask_crc32c(stpu_crc32c(out + op, produced, 0)) != want_crc)
      return STPU_INVALID_DATA;
    op += produced;
  }
  *out_len = op;
  return STPU_OK;
}

// ---------------------------------------------------------------------------
// Multithreaded framed-stream codec. The framing format's data chunks
// are independent (the SURVEY §2.4 independence structure the TPU
// batch path exploits), so the host pipeline parallelizes the same
// way: compress scatters fixed 64 KiB input chunks across a thread
// pool into worst-case output slots and compacts in-place (forward
// memmove, dst <= src always); decompress walks chunk headers
// serially (cheap), assigns each data chunk its exact output range
// from the cumulative expected lengths, and decodes + CRC-verifies
// chunks in parallel — byte-precise decode (out_cap == expected) so
// adjacent workers' ranges never overlap. Output bytes are identical
// to the single-threaded pipeline in both directions (chunking is
// deterministic). The reference is single-threaded by design
// (SnappyStream.cs:611-637 forbids even concurrent async ops); this
// is the framework's host-side scale-up, not a ported behavior.

static unsigned resolve_threads(int threads, size_t work_items) {
  unsigned t;
  if (threads < 0) {
    t = 1;  // negative sentinels mean "no threading", never auto
  } else if (threads > 0) {
    t = static_cast<unsigned>(threads);
  } else {
    t = std::thread::hardware_concurrency();
    if (t == 0) {  // containers often report "not computable"
      long n = sysconf(_SC_NPROCESSORS_ONLN);
      t = n > 0 ? static_cast<unsigned>(n) : 1;
    }
  }
  if (t < 1) t = 1;
  if (t > work_items) t = static_cast<unsigned>(work_items);
  if (t > 64) t = 64;
  return t;
}

int stpu_stream_compress_mt(const uint8_t* input, size_t n, uint8_t* out,
                            size_t out_cap, size_t* out_len, int threads) {
  if (out_cap < stpu_stream_max_compressed_length(n))
    return STPU_BUFFER_TOO_SMALL;
  size_t nchunks = n / kBlockSize + (n % kBlockSize || n == 0 ? 1 : 0);
  if (n == 0) nchunks = 0;
  const size_t W = 8 + stpu_max_compressed_length(kBlockSize);  // slot
  unsigned nt = resolve_threads(threads, nchunks ? nchunks : 1);
  std::memcpy(out, kStreamHeader, 10);
  if (nchunks == 0) {
    *out_len = 10;
    return STPU_OK;
  }
  // Every allocation that can throw happens HERE, on the calling
  // thread, before any worker exists: an exception escaping a C++
  // thread (or this extern-C boundary) would std::terminate the host
  // process. Spawn failure or bad_alloc falls back to the serial
  // pipeline, which allocates nothing.
  std::vector<size_t> sizes;
  std::vector<std::vector<uint16_t>> tables;  // one match table per worker
  std::vector<std::thread> pool;
  std::atomic<size_t> next{0};
  try {
    sizes.assign(nchunks, 0);
    tables.resize(nt);
    for (unsigned t = 0; t < nt; ++t)
      tables[t].resize(size_t{1} << kMaxHashBits);
    pool.reserve(nt - 1);
  } catch (...) {
    return stpu_stream_compress(input, n, out, out_cap, out_len);
  }

  auto worker = [&](unsigned wid) {
    uint16_t* table = tables[wid].data();
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= nchunks) return;
      size_t start = i * kBlockSize;
      size_t chunk = n - start < kBlockSize ? n - start : kBlockSize;
      const uint8_t* src = input + start;
      uint8_t* op = out + 10 + i * W;
      uint32_t crc = mask_crc32c(stpu_crc32c(src, chunk, 0));
      uint8_t* body = op + 8;
      uint8_t* bp =
          body + write_varint32(body, static_cast<uint32_t>(chunk));
      bp = compress_fragment(src, chunk, bp, table);
      size_t comp_len = static_cast<size_t>(bp - body);
      uint8_t type;
      size_t payload;
      if (comp_len < chunk) {
        type = 0x00;
        payload = comp_len;
      } else {
        type = 0x01;
        payload = chunk;
        std::memcpy(body, src, chunk);
      }
      op[0] = type;
      op[1] = static_cast<uint8_t>((payload + 4) & 0xff);
      op[2] = static_cast<uint8_t>(((payload + 4) >> 8) & 0xff);
      op[3] = static_cast<uint8_t>(((payload + 4) >> 16) & 0xff);
      op[4] = static_cast<uint8_t>(crc & 0xff);
      op[5] = static_cast<uint8_t>((crc >> 8) & 0xff);
      op[6] = static_cast<uint8_t>((crc >> 16) & 0xff);
      op[7] = static_cast<uint8_t>((crc >> 24) & 0xff);
      sizes[i] = 8 + payload;
    }
  };
  run_worker_pool(pool, nt, worker);

  // In-place forward compaction: chunk i moves from its slot to the
  // running offset; dst <= src because every earlier chunk shrank.
  size_t pos = 10;
  for (size_t i = 0; i < nchunks; ++i) {
    uint8_t* src = out + 10 + i * W;
    if (out + pos != src) std::memmove(out + pos, src, sizes[i]);
    pos += sizes[i];
  }
  *out_len = pos;
  return STPU_OK;
}

int stpu_stream_decompress_mt(const uint8_t* input, size_t n, uint8_t* out,
                              size_t out_cap, size_t* out_len,
                              int threads) {
  // Pass 1 (serial, headers only): validate framing, index data
  // chunks, assign exact output ranges. Mirrors the verdict rules of
  // stpu_stream_decompress exactly.
  struct Rec {
    size_t payload_off, payload_len, out_off, expected;
    uint8_t type;
  };
  std::vector<Rec> recs;
  size_t ip = 0, op = 0;
  bool seen_header = false;
  while (ip < n) {
    if (ip + 4 > n) return STPU_INVALID_DATA;
    uint8_t type = input[ip];
    size_t plen = load24(input + ip + 1);
    if (ip + 4 + plen > n) return STPU_INVALID_DATA;
    const uint8_t* payload = input + ip + 4;
    size_t payload_off = ip + 4;
    ip += 4 + plen;
    if (type == 0xff) {
      if (plen != 6 || std::memcmp(payload, kStreamHeader + 4, 6) != 0)
        return STPU_INVALID_DATA;
      seen_header = true;
      continue;
    }
    if (type == 0xfe || type >= 0x80) {
      if (!seen_header) return STPU_INVALID_DATA;
      continue;
    }
    if (type > 0x01) return STPU_INVALID_DATA;
    if (!seen_header) return STPU_INVALID_DATA;
    if (plen < 4) return STPU_INVALID_DATA;
    size_t body_len = plen - 4;
    size_t expected;
    if (type == 0x00) {
      uint64_t e = 0;
      if (stpu_uncompressed_length(payload + 4, body_len, &e) != STPU_OK ||
          e > kBlockSize)
        return STPU_INVALID_DATA;
      expected = static_cast<size_t>(e);
    } else {
      if (body_len > kBlockSize) return STPU_INVALID_DATA;
      expected = body_len;
    }
    if (op + expected > out_cap) return STPU_BUFFER_TOO_SMALL;
    try {
      recs.push_back({payload_off, plen, op, expected, type});
    } catch (...) {  // bad_alloc on the index: serial pipeline needs none
      return stpu_stream_decompress(input, n, out, out_cap, out_len);
    }
    op += expected;
  }
  // Pass 2 (parallel): decode + CRC-verify each data chunk into its
  // exact range (byte-precise decode: out_cap == expected, so no
  // worker writes into a neighbor's range). Workers allocate nothing
  // (exceptions in a C++ thread would std::terminate the process);
  // spawn failure mid-loop is benign — running workers drain the
  // shared atomic queue.
  std::atomic<size_t> next{0};
  std::atomic<int> rc{STPU_OK};
  unsigned nt = resolve_threads(threads, recs.empty() ? 1 : recs.size());
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= recs.size() || rc.load(std::memory_order_relaxed) != STPU_OK)
        return;
      const Rec& r = recs[i];
      const uint8_t* payload = input + r.payload_off;
      uint32_t want_crc = load32(payload);
      const uint8_t* body = payload + 4;
      size_t body_len = r.payload_len - 4;
      size_t produced = 0;
      if (r.type == 0x00) {
        size_t dlen = 0;
        int c = stpu_decompress(body, body_len, out + r.out_off,
                                r.expected, &dlen);
        if (c != STPU_OK || dlen != r.expected) {
          rc.store(c == STPU_OK ? STPU_INVALID_DATA : c);
          return;
        }
        produced = dlen;
      } else {
        std::memcpy(out + r.out_off, body, r.expected);
        produced = r.expected;
      }
      if (mask_crc32c(stpu_crc32c(out + r.out_off, produced, 0)) !=
          want_crc) {
        rc.store(STPU_INVALID_DATA);
        return;
      }
    }
  };
  std::vector<std::thread> pool;
  try {
    pool.reserve(nt > 0 ? nt - 1 : 0);
  } catch (...) {
  }
  run_worker_pool(pool, nt, [&](unsigned) { worker(); });
  if (rc.load() != STPU_OK) return rc.load();
  *out_len = op;
  return STPU_OK;
}

#if defined(__x86_64__)
// Hardware CRC32C (SSE4.2), the same intrinsic path the reference
// takes on x64 (Crc32CAlgorithm.cs:46-154). Runtime-dispatched so the
// library stays buildable/runnable without the instruction; the
// serial-chain u64 form runs ~8 GB/s (3-cycle latency bound), ~6x the
// slicing-by-8 table walk below.
__attribute__((target("sse4.2"))) static uint32_t crc32c_hw(
    const uint8_t* data, size_t n, uint32_t c) {
  uint64_t c64 = c;
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t v;
    std::memcpy(&v, data + i, 8);
    c64 = __builtin_ia32_crc32di(c64, v);
  }
  uint32_t cc = static_cast<uint32_t>(c64);
  for (; i < n; ++i) cc = __builtin_ia32_crc32qi(cc, data[i]);
  return cc;
}
#endif

uint32_t stpu_crc32c(const uint8_t* data, size_t n, uint32_t crc) {
#if defined(__x86_64__)
  if (__builtin_cpu_supports("sse4.2"))
    return crc32c_hw(data, n, crc ^ 0xffffffffu) ^ 0xffffffffu;
#endif
  if (!crc_init_done) crc_init();
  uint32_t c = crc ^ 0xffffffffu;
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    c ^= load32(data + i);
    uint32_t hi = load32(data + i + 4);
    c = crc_table[7][c & 0xff] ^ crc_table[6][(c >> 8) & 0xff] ^
        crc_table[5][(c >> 16) & 0xff] ^ crc_table[4][c >> 24] ^
        crc_table[3][hi & 0xff] ^ crc_table[2][(hi >> 8) & 0xff] ^
        crc_table[1][(hi >> 16) & 0xff] ^ crc_table[0][hi >> 24];
  }
  for (; i < n; ++i) c = (c >> 8) ^ crc_table[0][(c ^ data[i]) & 0xff];
  return c ^ 0xffffffffu;
}

}  // extern "C"
