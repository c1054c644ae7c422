// Fast PNG encoder for the screenshot sidecar.
//
// Native-runtime counterpart of the reference's screenshot fast path
// (src/screenshot.rs:132-149: png crate, Compression::Fast, NoFilter):
// zlib level 1, PNG filter 0 (None) per scanline, 8-bit RGB/RGBA.
// Exposed to Python via ctypes (tpu_raytracer/runtime/native.py).
//
// Also carries the row-depad/convert helpers the reference runs with rayon
// (screenshot.rs:62-67): strip-padded-rows and float->u8 tonemap-encode,
// parallelized with plain std::thread.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
    out.push_back((v >> 24) & 0xff);
    out.push_back((v >> 16) & 0xff);
    out.push_back((v >> 8) & 0xff);
    out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
    put_be32(out, static_cast<uint32_t>(len));
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    if (len) out.insert(out.end(), data, data + len);
    uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
    put_be32(out, crc);
}

}  // namespace

extern "C" {

// Encode 8-bit interleaved pixels (channels = 3 or 4) to a PNG file.
// Returns 0 on success.
int tpurt_write_png(const char* path, const uint8_t* pixels, int width,
                    int height, int channels) {
    if (channels != 3 && channels != 4) return -1;
    const size_t stride = static_cast<size_t>(width) * channels;

    // filter byte 0 (None) per scanline - the reference's NoFilter mode
    std::vector<uint8_t> raw((stride + 1) * height);
    for (int y = 0; y < height; ++y) {
        raw[y * (stride + 1)] = 0;
        std::memcpy(&raw[y * (stride + 1) + 1], pixels + y * stride, stride);
    }

    uLongf bound = compressBound(static_cast<uLong>(raw.size()));
    std::vector<uint8_t> z(bound);
    if (compress2(z.data(), &bound, raw.data(),
                  static_cast<uLong>(raw.size()), 1 /* fast */) != Z_OK)
        return -2;

    std::vector<uint8_t> out;
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    out.insert(out.end(), sig, sig + 8);

    uint8_t ihdr[13];
    ihdr[0] = (width >> 24) & 0xff; ihdr[1] = (width >> 16) & 0xff;
    ihdr[2] = (width >> 8) & 0xff;  ihdr[3] = width & 0xff;
    ihdr[4] = (height >> 24) & 0xff; ihdr[5] = (height >> 16) & 0xff;
    ihdr[6] = (height >> 8) & 0xff;  ihdr[7] = height & 0xff;
    ihdr[8] = 8;                         // bit depth
    ihdr[9] = channels == 3 ? 2 : 6;     // color type: RGB / RGBA
    ihdr[10] = ihdr[11] = ihdr[12] = 0;  // deflate / adaptive / no interlace
    put_chunk(out, "IHDR", ihdr, 13);
    put_chunk(out, "IDAT", z.data(), bound);
    put_chunk(out, "IEND", nullptr, 0);

    FILE* f = std::fopen(path, "wb");
    if (!f) return -3;
    size_t n = std::fwrite(out.data(), 1, out.size(), f);
    std::fclose(f);
    return n == out.size() ? 0 : -4;
}

// Linear f32 [h, w, 3] -> gamma-2.2 u8, multithreaded
// (the CPU leg of post.wgsl:279's display encode for screenshot export).
void tpurt_linear_to_srgb_u8(const float* src, uint8_t* dst, int64_t count,
                             int n_threads) {
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            float v = src[i];
            v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
            dst[i] = static_cast<uint8_t>(
                std::pow(v, 1.0f / 2.2f) * 255.0f + 0.5f);
        }
    };
    std::vector<std::thread> ts;
    int64_t chunk = (count + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < count ? lo + chunk : count;
        if (lo >= hi) break;
        ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
}

// Strip per-row padding (the reference's 256-byte-aligned readback rows,
// wgpu_utils.rs:30-35 / screenshot.rs:62-67), multithreaded.
void tpurt_depad_rows(const uint8_t* src, uint8_t* dst, int height,
                      int64_t padded_stride, int64_t row_bytes,
                      int n_threads) {
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int lo, int hi) {
        for (int y = lo; y < hi; ++y)
            std::memcpy(dst + y * row_bytes, src + y * padded_stride,
                        row_bytes);
    };
    std::vector<std::thread> ts;
    int chunk = (height + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int lo = t * chunk;
        int hi = lo + chunk < height ? lo + chunk : height;
        if (lo >= hi) break;
        ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
}

}  // extern "C"
