// blosclite: minimal c-blosc1-compatible frame codec (LZ4 + byte shuffle).
//
// Role: real-world zarr v2 stores default to the blosc compressor
// (zarr-python / numcodecs `Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)`),
// and this image ships neither blosc nor lz4 — so utils/zarrlite.py used to
// reject such stores outright.  This implements the documented c-blosc1
// chunk format (c-blosc README_HEADER.rst) with the LZ4 block codec:
//
//   decode: LZ4 and LZ4HC frames (they share format id 1), byte-shuffle,
//           split and non-split block streams (the 0x10 "dont-split" flag,
//           c-blosc >= 1.14; with a per-block retry of the other framing
//           for pre-1.14 streams), memcpy mode, zero-runlength streams.
//           Bitshuffle / delta / other inner codecs return a distinct
//           "unsupported" error code rather than garbage.
//   encode: LZ4 (greedy hash-chain-free matcher), optional byte-shuffle,
//           always non-split (signaled via the dont-split flag bit, which
//           modern c-blosc decoders honor), memcpy fallback when
//           incompressible.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency), same
// pattern as gridpack.cpp.  Error codes: -1 malformed frame / bounds,
// -2 unsupported feature.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "zstdlite.h"

namespace {

int hardware_threads() {
  if (const char* env = std::getenv("BLOSCLITE_THREADS")) {
    int v = std::atoi(env);
    if (v > 0) return v;  // test/ops override (e.g. force threading on 1-core hosts)
  }
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(first, last) over [0, n) split across threads (one fn call per
// thread, so per-thread scratch can live inside fn).
template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
  int nt = hardware_threads();
  if (n < 2 || nt <= 1) {
    fn(static_cast<int64_t>(0), n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

constexpr int64_t ERR_MALFORMED = -1;
constexpr int64_t ERR_UNSUPPORTED = -2;

// blosc header flag bits (c-blosc blosc.h)
constexpr uint8_t FLAG_BYTE_SHUFFLE = 0x1;
constexpr uint8_t FLAG_MEMCPYED = 0x2;
constexpr uint8_t FLAG_BIT_SHUFFLE = 0x4;
constexpr uint8_t FLAG_DELTA = 0x8;
constexpr uint8_t FLAG_DONT_SPLIT = 0x10;
// Inner-codec FORMAT ids stored in bits 5-7 of the flags byte (c-blosc
// blosc.h BLOSC_*_FORMAT — distinct from the compressor enum): blosclz 0,
// lz4/lz4hc 1, snappy 2, zlib 3, zstd 4.
constexpr int CODEC_LZ4 = 1;
constexpr int CODEC_ZSTD = 4;

inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/ARM LE; same assumption as zarr)
}

inline void store32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }

// ---------------------------------------------------------------------------
// LZ4 block format (https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md)
// ---------------------------------------------------------------------------

int64_t lz4_decode(const uint8_t* src, int64_t slen, uint8_t* dst, int64_t dcap) {
  int64_t si = 0, di = 0;
  while (si < slen) {
    uint8_t token = src[si++];
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (si >= slen) return ERR_MALFORMED;
        b = src[si++];
        lit += b;
      } while (b == 255);
    }
    if (si + lit > slen || di + lit > dcap) return ERR_MALFORMED;
    std::memcpy(dst + di, src + si, static_cast<size_t>(lit));
    si += lit;
    di += lit;
    if (si == slen) break;  // final sequence is literals-only
    if (si + 2 > slen) return ERR_MALFORMED;
    int64_t off = src[si] | (static_cast<int64_t>(src[si + 1]) << 8);
    si += 2;
    if (off == 0 || off > di) return ERR_MALFORMED;
    int64_t ml = token & 15;
    if (ml == 15) {
      uint8_t b;
      do {
        if (si >= slen) return ERR_MALFORMED;
        b = src[si++];
        ml += b;
      } while (b == 255);
    }
    ml += 4;
    if (di + ml > dcap) return ERR_MALFORMED;
    const uint8_t* m = dst + di - off;  // may overlap dst+di: copy bytewise
    for (int64_t k = 0; k < ml; ++k) dst[di + k] = m[k];
    di += ml;
  }
  return di;
}

inline uint32_t lz4_hash(uint32_t x) { return (x * 2654435761u) >> 16; }

// Greedy LZ4 encoder.  Returns bytes written, or -1 if the output would not
// fit in `cap` (caller then stores the block raw).  Honors the end-of-block
// rules: matches start no later than n-12 and never cover the last 5 bytes.
int64_t lz4_encode(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap,
                   std::vector<int64_t>& table) {
  std::fill(table.begin(), table.end(), -1);
  int64_t si = 0, di = 0, anchor = 0;

  auto put_len = [&](int64_t len) -> bool {  // extension bytes after 15
    while (len >= 255) {
      if (di >= cap) return false;
      dst[di++] = 255;
      len -= 255;
    }
    if (di >= cap) return false;
    dst[di++] = static_cast<uint8_t>(len);
    return true;
  };

  auto emit = [&](int64_t lit_end, int64_t off, int64_t ml) -> bool {
    int64_t lit = lit_end - anchor;
    if (di >= cap) return false;
    uint8_t token = static_cast<uint8_t>((lit >= 15 ? 15 : lit) << 4);
    if (ml > 0) token |= static_cast<uint8_t>(ml - 4 >= 15 ? 15 : ml - 4);
    dst[di++] = token;
    if (lit >= 15 && !put_len(lit - 15)) return false;
    if (di + lit > cap) return false;
    std::memcpy(dst + di, src + anchor, static_cast<size_t>(lit));
    di += lit;
    if (ml > 0) {
      if (di + 2 > cap) return false;
      dst[di++] = static_cast<uint8_t>(off & 0xff);
      dst[di++] = static_cast<uint8_t>(off >> 8);
      if (ml - 4 >= 15 && !put_len(ml - 4 - 15)) return false;
    }
    return true;
  };

  if (n >= 13) {
    const int64_t match_limit = n - 5;  // matches must not cover last 5 bytes
    while (si <= n - 12) {              // last match starts >= 12 bytes from end
      uint32_t v = load32(src + si);
      uint32_t h = lz4_hash(v);
      int64_t cand = table[h];
      table[h] = si;
      if (cand >= 0 && si - cand <= 65535 && load32(src + cand) == v) {
        int64_t ml = 4;
        while (si + ml < match_limit && src[cand + ml] == src[si + ml]) ++ml;
        if (!emit(si, si - cand, ml)) return -1;
        si += ml;
        anchor = si;
      } else {
        ++si;
      }
    }
  }
  if (!emit(n, 0, 0)) return -1;  // trailing literals
  return di;
}

// ---------------------------------------------------------------------------
// Byte shuffle (per block, complete elements only; tail copied raw — matches
// c-blosc shuffle.c semantics)
// ---------------------------------------------------------------------------

void shuffle_bytes(const uint8_t* src, uint8_t* dst, int64_t bsize, int64_t ts) {
  int64_t elems = bsize / ts;
  for (int64_t j = 0; j < ts; ++j)
    for (int64_t i = 0; i < elems; ++i) dst[j * elems + i] = src[i * ts + j];
  std::memcpy(dst + elems * ts, src + elems * ts, static_cast<size_t>(bsize - elems * ts));
}

void unshuffle_bytes(const uint8_t* src, uint8_t* dst, int64_t bsize, int64_t ts) {
  int64_t elems = bsize / ts;
  for (int64_t j = 0; j < ts; ++j)
    for (int64_t i = 0; i < elems; ++i) dst[i * ts + j] = src[j * elems + i];
  std::memcpy(dst + elems * ts, src + elems * ts, static_cast<size_t>(bsize - elems * ts));
}

// Decode the stream list of one block into `out` (bsize bytes, still in
// shuffled layout when the frame is shuffled).  Streams are laid out as
// [int32 csize][csize bytes] x nstreams; csize == neblock means stored raw,
// csize == 0 means a zero-filled stream (c-blosc zero-runlength).
bool decode_streams(const uint8_t* frame, int64_t frame_len, int64_t pos,
                    int64_t nstreams, int64_t bsize, uint8_t* out, int codec) {
  if (nstreams <= 0 || bsize % nstreams != 0) return false;
  int64_t neblock = bsize / nstreams;
  for (int64_t j = 0; j < nstreams; ++j) {
    if (pos + 4 > frame_len) return false;
    int64_t csize = load32(frame + pos);
    pos += 4;
    if (csize == 0) {
      std::memset(out + j * neblock, 0, static_cast<size_t>(neblock));
      continue;
    }
    if (pos + csize > frame_len) return false;
    if (csize == neblock) {
      std::memcpy(out + j * neblock, frame + pos, static_cast<size_t>(neblock));
    } else if (codec == CODEC_ZSTD) {
      // c-blosc compresses each stream as one standalone zstd frame
      if (zstdlite::decode_into(frame + pos, csize, out + j * neblock, neblock) != neblock)
        return false;
    } else {
      if (lz4_decode(frame + pos, csize, out + j * neblock, neblock) != neblock) return false;
    }
    pos += csize;
  }
  return true;
}

// CRC-32C (Castagnoli) slicing-by-8 tables, built once at load.
struct Crc32cTables {
  uint32_t t[8][256];
  Crc32cTables() {
    for (int i = 0; i < 256; ++i) {
      uint32_t c = static_cast<uint32_t>(i);
      for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ 0x82F63B78u : c >> 1;
      t[0][i] = c;
    }
    for (int j = 1; j < 8; ++j)
      for (int i = 0; i < 256; ++i)
        t[j][i] = (t[j - 1][i] >> 8) ^ t[0][t[j - 1][i] & 0xFF];
  }
};

}  // namespace

extern "C" {

// CRC-32C (Castagnoli) — the zarr v3 `crc32c` codec checksum.  SSE4.2
// hardware crc when compiled with -march=native on x86, else slicing-by-8
// (~1-2 GB/s) — either way free next to chunk decompression, which is what
// makes whole-chunk verification affordable (utils/zarrlite.py routes its
// _crc32c here; the pure-python fallback is ~1 MB/s).  Assumes a
// little-endian host (this image is x86_64).
int64_t blosclite_crc32c(const uint8_t* src, int64_t len) {
  uint32_t crc = 0xFFFFFFFFu;
  const uint8_t* p = src;
#if defined(__SSE4_2__)
  while (len >= 8) {
    uint64_t v;
    std::memcpy(&v, p, 8);
    crc = static_cast<uint32_t>(__builtin_ia32_crc32di(crc, v));
    p += 8;
    len -= 8;
  }
  while (len-- > 0) crc = __builtin_ia32_crc32qi(crc, *p++);
#else
  static const Crc32cTables T;
  while (len >= 8) {
    uint64_t v;
    std::memcpy(&v, p, 8);
    v ^= crc;
    crc = T.t[7][v & 0xFF] ^ T.t[6][(v >> 8) & 0xFF] ^ T.t[5][(v >> 16) & 0xFF] ^
          T.t[4][(v >> 24) & 0xFF] ^ T.t[3][(v >> 32) & 0xFF] ^
          T.t[2][(v >> 40) & 0xFF] ^ T.t[1][(v >> 48) & 0xFF] ^
          T.t[0][(v >> 56) & 0xFF];
    p += 8;
    len -= 8;
  }
  while (len-- > 0) crc = (crc >> 8) ^ T.t[0][(crc ^ *p++) & 0xFF];
#endif
  return static_cast<int64_t>(crc ^ 0xFFFFFFFFu);
}

// Uncompressed size recorded in a blosc frame header, or a negative error.
int64_t blosclite_nbytes(const uint8_t* src, int64_t srclen) {
  if (srclen < 16) return ERR_MALFORMED;
  return static_cast<int64_t>(load32(src + 4));
}

// Decompress a full blosc frame; dstlen must equal the header's nbytes.
// Returns bytes written or a negative error code.
int64_t blosclite_decompress(const uint8_t* src, int64_t srclen, uint8_t* dst,
                             int64_t dstlen) {
  if (srclen < 16) return ERR_MALFORMED;
  uint8_t flags = src[2];
  int64_t typesize = src[3] ? src[3] : 1;
  int64_t nbytes = load32(src + 4);
  int64_t blocksize = load32(src + 8);
  int64_t cbytes = load32(src + 12);
  if (nbytes != dstlen || cbytes > srclen || cbytes < 16) return ERR_MALFORMED;
  if (nbytes == 0) return 0;
  if (flags & FLAG_MEMCPYED) {
    if (16 + nbytes > cbytes) return ERR_MALFORMED;
    std::memcpy(dst, src + 16, static_cast<size_t>(nbytes));
    return nbytes;
  }
  if (flags & (FLAG_BIT_SHUFFLE | FLAG_DELTA)) return ERR_UNSUPPORTED;
  int codec = flags >> 5;
  if (codec != CODEC_LZ4 && codec != CODEC_ZSTD) return ERR_UNSUPPORTED;
  if (blocksize <= 0) return ERR_MALFORMED;

  bool shuffled = flags & FLAG_BYTE_SHUFFLE;
  bool dont_split = flags & FLAG_DONT_SPLIT;
  int64_t nblocks = (nbytes + blocksize - 1) / blocksize;
  if (16 + 4 * nblocks > cbytes) return ERR_MALFORMED;

  // Blocks are independent given bstarts: decode them in parallel.  The
  // per-thread scratch is bounded by min(blocksize, nbytes): blocksize comes
  // from the (possibly corrupt) header, but no block ever holds more than
  // nbytes == dstlen bytes, which the caller has validated — so a malformed
  // multi-GB blocksize cannot trigger a multi-GB allocation (a bad_alloc
  // inside a std::thread would std::terminate the host process).
  int64_t scratch = std::min<int64_t>(blocksize, nbytes);
  std::atomic<bool> ok{true};
  parallel_for(nblocks, [&](int64_t blo, int64_t bhi) {
    std::vector<uint8_t> tmp(shuffled ? scratch : 0);  // per-thread scratch
    for (int64_t b = blo; b < bhi && ok.load(std::memory_order_relaxed); ++b) {
      int64_t bstart = load32(src + 16 + 4 * b);
      if (bstart < 16 || bstart >= cbytes) {
        ok.store(false);
        return;
      }
      int64_t bsize = std::min<int64_t>(blocksize, nbytes - b * blocksize);
      bool leftover = bsize != blocksize;
      uint8_t* out = shuffled ? tmp.data() : dst + b * blocksize;
      // c-blosc >= 1.14 marks splitting in the header; older streams don't,
      // so retry with the other framing if the marked one fails to parse.
      int64_t primary = (!dont_split && !leftover) ? typesize : 1;
      int64_t alternate = primary == 1 ? typesize : 1;
      if (!decode_streams(src, cbytes, bstart, primary, bsize, out, codec) &&
          !(alternate != primary &&
            decode_streams(src, cbytes, bstart, alternate, bsize, out, codec))) {
        ok.store(false);
        return;
      }
      if (shuffled) unshuffle_bytes(tmp.data(), dst + b * blocksize, bsize, typesize);
    }
  });
  return ok.load() ? nbytes : ERR_MALFORMED;
}

// Worst-case compressed size for `nbytes` of input (raw blocks + framing).
int64_t blosclite_max_csize(int64_t nbytes) {
  int64_t blocksize = 1 << 18;
  int64_t nblocks = (nbytes + blocksize - 1) / blocksize + 1;
  return nbytes + 16 + 8 * nblocks + 64;
}

// Compress into a blosc frame.  shuffle: 0 none, 1 byte-shuffle.  Returns
// cbytes or a negative error.  dstcap must be >= blosclite_max_csize(nbytes).
int64_t blosclite_compress(const uint8_t* src, int64_t nbytes, int32_t typesize,
                           int32_t shuffle, uint8_t* dst, int64_t dstcap) {
  if (nbytes < 0 || dstcap < blosclite_max_csize(nbytes)) return ERR_MALFORMED;
  // c-blosc caps buffers at BLOSC_MAX_BUFFERSIZE = INT32_MAX - BLOSC_MAX_OVERHEAD;
  // beyond that the uint32 header fields would silently truncate and real
  // blosc could not read the frame anyway.  Refuse rather than corrupt.
  if (nbytes > 0x7FFFFFFF - 16) return ERR_UNSUPPORTED;
  int64_t ts = (typesize >= 1 && typesize <= 255) ? typesize : 1;
  if (ts == 1) shuffle = 0;
  int64_t blocksize = 1 << 18;  // 256 KB, aligned to the typesize
  blocksize -= blocksize % ts;
  if (blocksize > nbytes) blocksize = nbytes;
  if (blocksize <= 0) blocksize = 1;
  int64_t nblocks = nbytes ? (nbytes + blocksize - 1) / blocksize : 0;

  uint8_t flags =
      static_cast<uint8_t>((shuffle ? FLAG_BYTE_SHUFFLE : 0) | FLAG_DONT_SPLIT | (CODEC_LZ4 << 5));
  dst[0] = 2;  // format version (c-blosc1)
  dst[1] = 1;  // lz4 block format version
  dst[2] = flags;
  dst[3] = static_cast<uint8_t>(ts);
  store32(dst + 4, static_cast<uint32_t>(nbytes));
  store32(dst + 8, static_cast<uint32_t>(blocksize));

  int64_t pos = 16 + 4 * nblocks;
  std::vector<uint8_t> tmp(shuffle ? blocksize : 0);
  std::vector<int64_t> table(1 << 16);
  for (int64_t b = 0; b < nblocks; ++b) {
    int64_t bsize = std::min<int64_t>(blocksize, nbytes - b * blocksize);
    const uint8_t* in = src + b * blocksize;
    if (shuffle) {
      shuffle_bytes(in, tmp.data(), bsize, ts);
      in = tmp.data();
    }
    store32(dst + 16 + 4 * b, static_cast<uint32_t>(pos));
    int64_t csize = lz4_encode(in, bsize, dst + pos + 4, bsize - 1, table);
    if (csize < 0) {  // incompressible: store the (shuffled) block raw
      csize = bsize;
      std::memcpy(dst + pos + 4, in, static_cast<size_t>(bsize));
    }
    store32(dst + pos, static_cast<uint32_t>(csize));
    pos += 4 + csize;
  }
  if (pos >= nbytes + 16 || nbytes == 0) {  // whole-frame memcpy fallback
    dst[2] = FLAG_MEMCPYED | (CODEC_LZ4 << 5);
    std::memcpy(dst + 16, src, static_cast<size_t>(nbytes));
    pos = nbytes + 16;
  }
  store32(dst + 12, static_cast<uint32_t>(pos));
  return pos;
}

}  // extern "C"
