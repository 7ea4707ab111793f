// Fast PNG encoder for simulation frame streaming.
//
// The viewer streams rendered density/|B| frames (the drawImage path of the
// reference, fusionsim.js:176-178, becomes HTTP frame streaming); encoding
// dominates the host-side cost of a frame, so it is done natively:
// per-scanline adaptive filtering (none/sub/up selected by minimum absolute
// residual, the standard heuristic) + zlib deflate, multithread-safe
// (no globals).  Exposed as a C ABI for ctypes (no pybind11 in the image).
//
// Build: make -C native   (produces libfspng.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

inline void put_be32(std::vector<uint8_t>& out, uint32_t v) {
    out.push_back(uint8_t(v >> 24));
    out.push_back(uint8_t(v >> 16));
    out.push_back(uint8_t(v >> 8));
    out.push_back(uint8_t(v));
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
    put_be32(out, uint32_t(len));
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (len) out.insert(out.end(), data, data + len);
    uint32_t crc = crc32(0L, out.data() + start, uInt(len + 4));
    put_be32(out, crc);
}

// Sum of absolute residuals (treating bytes as signed deltas) — the
// standard minimum-sum-of-absolute-differences filter heuristic.
inline uint64_t residual_cost(const uint8_t* row, size_t n) {
    uint64_t s = 0;
    for (size_t i = 0; i < n; i++) {
        int v = int8_t(row[i]);
        s += uint64_t(v < 0 ? -v : v);
    }
    return s;
}

}  // namespace

extern "C" {

// Encode h x w RGB8 (row-major, tightly packed) into a PNG byte stream.
// Returns bytes written, or 0 if out_cap is too small / encode failed.
// level: zlib level 0-9 (1 = fast, good for streaming).
size_t fspng_encode_rgb(const uint8_t* rgb, int width, int height,
                        int level, uint8_t* out, size_t out_cap) {
    const size_t stride = size_t(width) * 3;
    // Build the filtered image: one filter byte + stride bytes per row.
    std::vector<uint8_t> raw((stride + 1) * size_t(height));
    std::vector<uint8_t> cand_sub(stride), cand_up(stride);

    for (int y = 0; y < height; y++) {
        const uint8_t* row = rgb + size_t(y) * stride;
        const uint8_t* prev = (y > 0) ? row - stride : nullptr;
        // filter 1 (sub): delta to the pixel 3 bytes left
        for (size_t i = 0; i < stride; i++)
            cand_sub[i] = uint8_t(row[i] - (i >= 3 ? row[i - 3] : 0));
        // filter 2 (up): delta to the row above
        if (prev)
            for (size_t i = 0; i < stride; i++)
                cand_up[i] = uint8_t(row[i] - prev[i]);

        uint64_t c_none = residual_cost(row, stride);
        uint64_t c_sub = residual_cost(cand_sub.data(), stride);
        uint64_t c_up = prev ? residual_cost(cand_up.data(), stride)
                             : ~uint64_t(0);

        uint8_t* dst = raw.data() + size_t(y) * (stride + 1);
        if (c_sub <= c_none && c_sub <= c_up) {
            dst[0] = 1;
            std::memcpy(dst + 1, cand_sub.data(), stride);
        } else if (prev && c_up <= c_none) {
            dst[0] = 2;
            std::memcpy(dst + 1, cand_up.data(), stride);
        } else {
            dst[0] = 0;
            std::memcpy(dst + 1, row, stride);
        }
    }

    // zlib-deflate the filtered stream.
    uLongf bound = compressBound(uLong(raw.size()));
    std::vector<uint8_t> idat(bound);
    if (compress2(idat.data(), &bound, raw.data(), uLong(raw.size()),
                  level) != Z_OK)
        return 0;
    idat.resize(bound);

    std::vector<uint8_t> png;
    png.reserve(idat.size() + 128);
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    png.insert(png.end(), sig, sig + 8);

    uint8_t ihdr[13];
    ihdr[0] = uint8_t(width >> 24); ihdr[1] = uint8_t(width >> 16);
    ihdr[2] = uint8_t(width >> 8);  ihdr[3] = uint8_t(width);
    ihdr[4] = uint8_t(height >> 24); ihdr[5] = uint8_t(height >> 16);
    ihdr[6] = uint8_t(height >> 8);  ihdr[7] = uint8_t(height);
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 2;   // color type RGB
    ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
    put_chunk(png, "IHDR", ihdr, 13);
    put_chunk(png, "IDAT", idat.data(), idat.size());
    put_chunk(png, "IEND", nullptr, 0);

    if (png.size() > out_cap) return 0;
    std::memcpy(out, png.data(), png.size());
    return png.size();
}

}  // extern "C"
