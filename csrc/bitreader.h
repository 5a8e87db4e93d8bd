// Shared MSB-first bit reader for host-side entropy decoding.
// Analog of the reference's GetBitContext (libavcodec/get_bits.h) but
// re-designed: 64-bit cache refilled bytewise, optional JPEG 0xFF00
// destuffing handled by the caller via a pre-filtered buffer.
#pragma once
#include <cstddef>
#include <cstdint>

struct BitReader {
    const uint8_t* data;
    size_t size;        // bytes
    size_t pos;         // next byte to load
    uint64_t cache;     // MSB-aligned
    int bits;           // valid bits in cache

    void init(const uint8_t* d, size_t n) {
        data = d; size = n; pos = 0; cache = 0; bits = 0;
    }
    inline void refill() {
        while (bits <= 56) {
            uint64_t b = pos < size ? data[pos] : 0;
            ++pos;
            cache |= b << (56 - bits);
            bits += 8;
        }
    }
    inline uint32_t peek(int n) {
        refill();
        return (uint32_t)(cache >> (64 - n));
    }
    inline void skip(int n) {
        cache <<= n;
        bits -= n;
    }
    inline uint32_t get(int n) {
        if (n == 0) return 0;
        uint32_t v = peek(n);
        skip(n);
        return v;
    }
    // bits consumed from the start of the buffer
    inline size_t consumed() const { return pos * 8 - (size_t)bits; }
    inline bool overread() const { return consumed() > size * 8; }
};
