// Internal interface to the zstdlite RFC 8878 decoder (zstdlite.cpp), used
// by blosclite.cpp for blosc frames whose inner codec is zstd.
#pragma once
#include <cstdint>

namespace zstdlite {
// Decode (possibly concatenated) zstd frames into dst.  Returns total bytes
// written (<= dcap), or -1 malformed / -2 unsupported.
int64_t decode_into(const uint8_t* src, int64_t slen, uint8_t* dst, int64_t dcap);
}  // namespace zstdlite
