// C++ fast path for the COCO RLE counts<->string codec (see
// mdqe_cvpr2023_tpu/data/rle.py). Re-derivation of the standard maskApi
// LEB-style byte format: 5 data bits + 1 continuation bit per char, offset 48,
// deltas against counts[i-2] from the third entry on.
//
// Build: g++ -O2 -shared -fPIC -o librle_codec.so rle_codec.cc
#include <cstdint>
#include <cstddef>

extern "C" {

long rle_to_string(const int64_t* counts, long m, char* out) {
    long p = 0;
    for (long i = 0; i < m; i++) {
        int64_t x = counts[i];
        if (i > 2) x -= counts[i - 2];
        bool more = true;
        while (more) {
            char c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            out[p++] = c + 48;
        }
    }
    return p;
}

long rle_from_string(const char* s, long n, int64_t* counts) {
    long m = 0, pos = 0;
    while (pos < n) {
        int64_t x = 0;
        int k = 0;
        bool more = true;
        while (more) {
            int64_t c = s[pos] - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            pos++;
            k++;
            if (!more && (c & 0x10)) x |= -1LL << (5 * k);
        }
        if (m > 2) x += counts[m - 2];
        counts[m++] = x;
    }
    return m;
}

}  // extern "C"
