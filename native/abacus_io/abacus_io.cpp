// Native decode path for the Abacus blosc-framed ASDF blocks.
//
// Mirrors the Python implementation in abacusutils_tpu/io/blosc.py (the
// format is documented there): a stream of [4-byte BE length][blosc1 chunk],
// each chunk = 16-byte header + block offsets + zstd streams, with byte- or
// bit-shuffle per block. Chunks decode in parallel on a std::thread pool
// (the hot loop feeding catalog staging), zstd via libzstd.
//
// Exposed as a C ABI for ctypes; returns 0 on success, negative error codes
// otherwise.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zstd.h>

namespace {

constexpr uint8_t kDoShuffle = 0x1;
constexpr uint8_t kMemcpyed = 0x2;
constexpr uint8_t kDoBitshuffle = 0x4;
constexpr int kFmtZstd = 4;

inline uint32_t load_le32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;  // little-endian hosts only (x86/ARM LE)
}

inline uint32_t load_be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void unshuffle(const uint8_t* in, uint8_t* out, size_t n, size_t typesize) {
    const size_t nel = n / typesize;
    const size_t body = nel * typesize;
    for (size_t b = 0; b < typesize; ++b) {
        const uint8_t* src = in + b * nel;
        uint8_t* dst = out + b;
        for (size_t e = 0; e < nel; ++e) dst[e * typesize] = src[e];
    }
    std::memcpy(out + body, in + body, n - body);
}

// c-blosc (>=1.18) bitshuffle semantics: whole block memcpy'd raw when the
// element count is not a multiple of 8; otherwise bit-plane-major transpose
// over all elements + raw tail (< typesize bytes).
void unbitshuffle(const uint8_t* in, uint8_t* out, size_t n, size_t typesize) {
    const size_t nelem = n / typesize;
    if (nelem % 8 != 0) {
        std::memcpy(out, in, n);
        return;
    }
    const size_t body = nelem * typesize;
    const size_t ngrp = nelem / 8;  // bytes per bit-plane row
    // row r = 8*b + k holds bit k of byte b of every element, LSB-first
    std::memset(out, 0, body);
    for (size_t b = 0; b < typesize; ++b) {
        for (size_t k = 0; k < 8; ++k) {
            const uint8_t* plane = in + (b * 8 + k) * ngrp;
            for (size_t g = 0; g < ngrp; ++g) {
                uint8_t byte = plane[g];
                // element e = 8*g + j gets bit k from bit j of `byte`
                uint8_t* base = out + (8 * g) * typesize + b;
                for (int j = 0; j < 8; ++j) {
                    base[size_t(j) * typesize] |=
                        uint8_t(((byte >> j) & 1u) << k);
                }
            }
        }
    }
    std::memcpy(out + body, in + body, n - body);
}

int decompress_chunk(const uint8_t* chunk, size_t chunk_len, uint8_t* out,
                     size_t out_len) {
    if (chunk_len < 16) return -1;
    const uint8_t flags = chunk[2];
    const size_t typesize = chunk[3];
    const uint32_t nbytes = load_le32(chunk + 4);
    const uint32_t blocksize = load_le32(chunk + 8);
    if (nbytes != out_len) return -2;

    if (flags & kMemcpyed) {
        if (chunk_len < 16 + nbytes) return -3;
        std::memcpy(out, chunk + 16, nbytes);
        return 0;
    }
    if ((flags >> 5) != kFmtZstd) return -4;

    const bool bitshuf = flags & kDoBitshuffle;
    const bool byteshuf = (flags & kDoShuffle) && typesize > 1;
    const size_t nblocks = (nbytes + blocksize - 1) / blocksize;
    if (chunk_len < 16 + 4 * nblocks) return -5;

    std::vector<uint8_t> scratch;
    if (bitshuf || byteshuf) scratch.resize(blocksize);

    for (size_t i = 0; i < nblocks; ++i) {
        const uint32_t off = load_le32(chunk + 16 + 4 * i);
        const size_t expected =
            std::min<size_t>(blocksize, nbytes - i * blocksize);
        uint8_t* dst_final = out + i * blocksize;
        uint8_t* dst = (bitshuf || byteshuf) ? scratch.data() : dst_final;

        size_t pos = off;
        size_t written = 0;
        while (written < expected) {
            if (pos + 4 > chunk_len) return -6;
            const int32_t cb = int32_t(load_le32(chunk + pos));
            pos += 4;
            const size_t ne = expected - written;  // dont_split: one stream
            if (cb == 0) {
                std::memset(dst + written, 0, ne);
            } else if (size_t(cb) == ne) {
                if (pos + ne > chunk_len) return -7;
                std::memcpy(dst + written, chunk + pos, ne);
                pos += ne;
            } else {
                if (cb < 0 || pos + size_t(cb) > chunk_len) return -8;
                const size_t got = ZSTD_decompress(dst + written, ne,
                                                   chunk + pos, size_t(cb));
                if (ZSTD_isError(got) || got != ne) return -9;
                pos += size_t(cb);
            }
            written += ne;
        }
        if (bitshuf) {
            unbitshuffle(scratch.data(), dst_final, expected, typesize);
        } else if (byteshuf) {
            unshuffle(scratch.data(), dst_final, expected, typesize);
        }
    }
    return 0;
}

void shuffle(const uint8_t* in, uint8_t* out, size_t n, size_t typesize) {
    const size_t nel = n / typesize;
    const size_t body = nel * typesize;
    for (size_t b = 0; b < typesize; ++b) {
        const uint8_t* src = in + b;
        uint8_t* dst = out + b * nel;
        for (size_t e = 0; e < nel; ++e) dst[e] = src[e * typesize];
    }
    std::memcpy(out + body, in + body, n - body);
}

// Compress one chunk into the blosc1 container written by the Python path
// (zstd + byte-shuffle + dont_split; see abacusutils_tpu/io/blosc.py
// compress_chunk). Returns the chunk size, or a negative error.
int64_t compress_chunk(const uint8_t* data, size_t nbytes, size_t typesize,
                       int clevel, size_t blocksize, uint8_t* out,
                       size_t out_cap) {
    constexpr uint8_t kDontSplit = 0x10;
    if (typesize < 1 || typesize > 255) typesize = 1;
    const bool shuf = typesize > 1;
    // keep blocks a multiple of typesize so shuffle never straddles blocks
    blocksize = std::max(typesize, blocksize - blocksize % typesize);
    const size_t nblocks =
        std::max<size_t>(1, (nbytes + blocksize - 1) / blocksize);

    if (out_cap < 16 + 4 * nblocks) return -1;
    uint8_t* hdr = out;
    hdr[0] = 2;  // format version
    hdr[1] = 1;
    hdr[2] = uint8_t(kDontSplit | (kFmtZstd << 5) | (shuf ? kDoShuffle : 0));
    hdr[3] = uint8_t(typesize);

    std::vector<uint8_t> scratch(shuf ? blocksize : 0);
    size_t pos = 16 + 4 * nblocks;
    for (size_t i = 0; i < nblocks; ++i) {
        const size_t ne = std::min(blocksize, nbytes - i * blocksize);
        const uint8_t* src = data + i * blocksize;
        if (shuf) {
            shuffle(src, scratch.data(), ne, typesize);
            src = scratch.data();
        }
        // offset of this block (from chunk start)
        uint32_t off32 = uint32_t(pos);
        std::memcpy(out + 16 + 4 * i, &off32, 4);
        if (pos + 4 + ZSTD_compressBound(ne) > out_cap) return -2;
        const size_t cb =
            ZSTD_compress(out + pos + 4, out_cap - pos - 4, src, ne, clevel);
        if (ZSTD_isError(cb)) return -3;
        int32_t len32;
        if (cb >= ne) {  // store raw; detected at decode via cb == ne
            std::memcpy(out + pos + 4, src, ne);
            len32 = int32_t(ne);
        } else {
            len32 = int32_t(cb);
        }
        std::memcpy(out + pos, &len32, 4);
        pos += 4 + size_t(len32);
    }
    uint32_t nb32 = uint32_t(nbytes), bs32 = uint32_t(blocksize),
             cb32 = uint32_t(pos);
    std::memcpy(hdr + 4, &nb32, 4);
    std::memcpy(hdr + 8, &bs32, 4);
    std::memcpy(hdr + 12, &cb32, 4);
    return int64_t(pos);
}

}  // namespace

extern "C" {

// Compress `data` into the framed stream ([4-byte BE length][blosc chunk]*),
// splitting into `chunk_nbytes` pieces compressed in parallel. Returns the
// number of bytes written to `out`, or a negative error. `out_cap` must be
// at least abacus_compress_bound(data_len, chunk_nbytes).
int64_t abacus_compress_blosc_stream(const uint8_t* data, int64_t data_len,
                                     int32_t typesize, int clevel,
                                     int64_t chunk_nbytes, uint8_t* out,
                                     int64_t out_cap, int nthreads) {
    const size_t cn = size_t(chunk_nbytes);
    const size_t nchunks =
        std::max<size_t>(1, (size_t(data_len) + cn - 1) / cn);
    // each chunk writes into its own bounded slot, then slots are packed
    constexpr size_t kBlock = 1 << 19;
    const size_t slot = 16 + 4 * (cn / kBlock + 2) +
                        (cn / kBlock + 2) * (4 + ZSTD_compressBound(kBlock));
    std::vector<std::vector<uint8_t>> slots(nchunks);
    std::vector<int64_t> sizes(nchunks, 0);

    std::atomic<size_t> next{0};
    std::atomic<int> err{0};
    auto worker = [&]() {
        for (;;) {
            const size_t i = next.fetch_add(1);
            if (i >= nchunks || err.load()) return;
            const size_t off = i * cn;
            const size_t ne = std::min(cn, size_t(data_len) - off);
            slots[i].resize(slot);
            const int64_t rc =
                compress_chunk(data + off, ne, size_t(typesize), clevel,
                               kBlock, slots[i].data(), slot);
            if (rc < 0) {
                err.store(int(rc));
                return;
            }
            sizes[i] = rc;
        }
    };
    const int nt = std::max(1, std::min<int>(nthreads, int(nchunks)));
    if (nt == 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(nt);
        for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    if (err.load()) return err.load();

    size_t pos = 0;
    for (size_t i = 0; i < nchunks; ++i) {
        if (pos + 4 + size_t(sizes[i]) > size_t(out_cap)) return -4;
        const uint32_t len = uint32_t(sizes[i]);
        out[pos] = uint8_t(len >> 24);
        out[pos + 1] = uint8_t(len >> 16);
        out[pos + 2] = uint8_t(len >> 8);
        out[pos + 3] = uint8_t(len);
        std::memcpy(out + pos + 4, slots[i].data(), sizes[i]);
        pos += 4 + size_t(sizes[i]);
    }
    return int64_t(pos);
}

// Decode a framed stream of blosc chunks into `out`. Returns 0 on success.
int abacus_decode_blosc_stream(const uint8_t* buf, int64_t buf_len,
                               uint8_t* out, int64_t out_len, int nthreads) {
    // index the chunks
    struct Span {
        size_t chunk_off, chunk_len, out_off, out_len;
    };
    std::vector<Span> spans;
    size_t pos = 0, out_pos = 0;
    while (pos < size_t(buf_len)) {
        if (pos + 4 > size_t(buf_len)) return -10;
        const uint32_t clen = load_be32(buf + pos);
        pos += 4;
        if (pos + clen > size_t(buf_len) || clen < 16) return -11;
        const uint32_t nbytes = load_le32(buf + pos + 4);
        spans.push_back({pos, clen, out_pos, nbytes});
        pos += clen;
        out_pos += nbytes;
    }
    if (out_pos != size_t(out_len)) return -12;

    std::atomic<size_t> next{0};
    std::atomic<int> err{0};
    auto worker = [&]() {
        for (;;) {
            const size_t i = next.fetch_add(1);
            if (i >= spans.size() || err.load()) return;
            const Span& s = spans[i];
            const int rc = decompress_chunk(buf + s.chunk_off, s.chunk_len,
                                            out + s.out_off, s.out_len);
            if (rc != 0) err.store(rc);
        }
    };
    const int nt = std::max(1, std::min<int>(nthreads, int(spans.size())));
    if (nt == 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(nt);
        for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    return err.load();
}

// Standalone unshuffle, exposed for testing.
void abacus_unshuffle(const uint8_t* in, uint8_t* out, int64_t n,
                      int32_t typesize) {
    unshuffle(in, out, size_t(n), size_t(typesize));
}

}  // extern "C"
