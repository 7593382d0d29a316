// Native rANS / RAbS bulk coders — bit-exact with the Python reference
// implementation in tpudraco/entropy/rans.py (which mirrors
// draco-oxide/src/encode/entropy/rans.rs and decode/entropy/rans.rs).
//
// The per-symbol state recurrence is inherently sequential; C++ removes the
// interpreter overhead (~100x on large streams). Exposed via a C ABI for
// ctypes.

#include <cstdint>
#include <cstring>

extern "C" {

// Encode n symbols with a normalized frequency table (sum == 1<<precision).
// Writes the rANS byte stream including the final state flush into out
// (capacity cap). Returns the number of bytes written, or -1 on overflow /
// invalid input.
int64_t tpud_rans_encode(const int32_t* symbols, int64_t n,
                         const int32_t* freqs, const int32_t* cums,
                         int32_t precision, int64_t l_base,
                         uint8_t* out, int64_t cap) {
    uint64_t state = (uint64_t)l_base;
    int64_t pos = 0;
    const uint64_t base_shift = (uint64_t)l_base >> precision;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t s = symbols[i];
        const uint64_t freq = (uint64_t)freqs[s];
        if (freq == 0) return -1;
        const uint64_t limit = (base_shift * freq) << 8;
        while (state >= limit) {
            if (pos >= cap) return -1;
            out[pos++] = (uint8_t)(state & 0xFF);
            state >>= 8;
        }
        state = ((state / freq) << precision) + state % freq
                + (uint64_t)cums[s];
    }
    // flush (encode/entropy/rans.rs:48-68)
    state -= (uint64_t)l_base;
    if (state < (1u << 6)) {
        if (pos + 1 > cap) return -1;
        out[pos++] = (uint8_t)state;
    } else if (state < (1u << 14)) {
        if (pos + 2 > cap) return -1;
        uint32_t v = (0x01u << 14) + (uint32_t)state;
        out[pos++] = (uint8_t)(v & 0xFF);
        out[pos++] = (uint8_t)(v >> 8);
    } else if (state < (1u << 22)) {
        if (pos + 3 > cap) return -1;
        uint32_t v = (0x02u << 22) + (uint32_t)state;
        out[pos++] = (uint8_t)(v & 0xFF);
        out[pos++] = (uint8_t)((v >> 8) & 0xFF);
        out[pos++] = (uint8_t)(v >> 16);
    } else if (state < (1u << 30)) {
        if (pos + 4 > cap) return -1;
        uint32_t v = (0x03u << 30) + (uint32_t)state;
        out[pos++] = (uint8_t)(v & 0xFF);
        out[pos++] = (uint8_t)((v >> 8) & 0xFF);
        out[pos++] = (uint8_t)((v >> 16) & 0xFF);
        out[pos++] = (uint8_t)(v >> 24);
    } else {
        return -1;
    }
    return pos;
}

// Decode n symbols from a complete rANS blob (read back-to-front).
// slots maps r in [0, 1<<precision) -> symbol. Returns 0 on success.
int32_t tpud_rans_decode(const uint8_t* buf, int64_t len,
                         const int32_t* freqs, const int32_t* cums,
                         const int32_t* slots, int32_t precision,
                         int64_t l_base, int64_t n, int32_t* out) {
    int64_t pos = len;  // reverse reader position
    if (pos <= 0) return -1;
    uint8_t metadata = buf[--pos];
    uint32_t flag = metadata >> 6;
    uint64_t state = 0;
    if (flag >= 1) {
        if (pos < (int64_t)flag) return -1;
        // read `flag` bytes back-to-front, MSB first
        for (uint32_t i = 0; i < flag; ++i)
            state = (state << 8) | buf[--pos];
    }
    state |= ((uint64_t)(metadata & 0x3F)) << (flag << 3);
    state += (uint64_t)l_base;

    const uint64_t mask = ((uint64_t)1 << precision) - 1;
    for (int64_t i = 0; i < n; ++i) {
        while (state < (uint64_t)l_base) {
            if (pos <= 0) return -1;
            state = state * 256 + buf[--pos];
        }
        const uint64_t q = state >> precision;
        const uint64_t r = state & mask;
        const int32_t idx = slots[r];
        state = q * (uint64_t)freqs[idx] + r - (uint64_t)cums[idx];
        out[i] = idx;
    }
    return 0;
}

// RAbS encode (binary, single-`if` renormalization per the reference).
int64_t tpud_rabs_encode(const uint8_t* bits, int64_t n, int32_t freq0,
                         int32_t precision, int64_t l_base,
                         uint8_t* out, int64_t cap) {
    uint64_t state = (uint64_t)l_base;
    int64_t pos = 0;
    const uint64_t f0 = (uint64_t)freq0;
    const uint64_t f1 = ((uint64_t)1 << precision) - f0;
    const uint64_t base_shift = (uint64_t)l_base >> precision;
    for (int64_t i = 0; i < n; ++i) {
        const uint64_t freq = bits[i] ? f1 : f0;
        if (state >= (base_shift * freq) << 8) {
            if (pos >= cap) return -1;
            out[pos++] = (uint8_t)(state & 0xFF);
            state >>= 8;
        }
        const uint64_t q = state / freq;
        const uint64_t r = state % freq;
        state = (q << precision) + r + (bits[i] ? 0 : f1);
    }
    state -= (uint64_t)l_base;
    if (state < (1u << 6)) {
        if (pos + 1 > cap) return -1;
        out[pos++] = (uint8_t)state;
    } else if (state < (1u << 14)) {
        if (pos + 2 > cap) return -1;
        uint32_t v = (0x01u << 14) + (uint32_t)state;
        out[pos++] = (uint8_t)(v & 0xFF);
        out[pos++] = (uint8_t)(v >> 8);
    } else if (state < (1u << 22)) {
        if (pos + 3 > cap) return -1;
        uint32_t v = (0x02u << 22) + (uint32_t)state;
        out[pos++] = (uint8_t)(v & 0xFF);
        out[pos++] = (uint8_t)((v >> 8) & 0xFF);
        out[pos++] = (uint8_t)(v >> 16);
    } else if (state < (1u << 30)) {
        if (pos + 4 > cap) return -1;
        uint32_t v = (0x03u << 30) + (uint32_t)state;
        out[pos++] = (uint8_t)(v & 0xFF);
        out[pos++] = (uint8_t)((v >> 8) & 0xFF);
        out[pos++] = (uint8_t)((v >> 16) & 0xFF);
        out[pos++] = (uint8_t)(v >> 24);
    } else {
        return -1;
    }
    return pos;
}

int32_t tpud_rabs_decode(const uint8_t* buf, int64_t len, int32_t freq0,
                         int32_t precision, int64_t l_base, int64_t n,
                         uint8_t* out) {
    int64_t pos = len;
    if (pos <= 0) return -1;
    uint8_t metadata = buf[--pos];
    uint32_t flag = metadata >> 6;
    uint64_t state = 0;
    if (flag >= 1) {
        if (pos < (int64_t)flag) return -1;
        for (uint32_t i = 0; i < flag; ++i)
            state = (state << 8) | buf[--pos];
    }
    state |= ((uint64_t)(metadata & 0x3F)) << (flag << 3);
    state += (uint64_t)l_base;

    const uint64_t f1 = ((uint64_t)1 << precision) - (uint64_t)freq0;
    const uint64_t mask = ((uint64_t)1 << precision) - 1;
    for (int64_t i = 0; i < n; ++i) {
        if (state < (uint64_t)l_base) {
            if (pos <= 0) return -1;
            state = (state << 8) + buf[--pos];
        }
        const uint64_t q = state >> precision;
        const uint64_t r = state & mask;
        const uint64_t xn = q * f1;
        if (r < f1) {
            state = xn + r;
            out[i] = 1;
        } else {
            state = state - xn - f1;
            out[i] = 0;
        }
    }
    return 0;
}

// (extern "C" continues below)

// Parse a serialized rANS frequency table (the token stream AFTER the
// leb128 num_symbols header): token = byte & 3; 3 = zero-run of
// (byte >> 2) extra entries, else the frequency continues in `token`
// extra bytes. Mirror of entropy/rans.py::parse_rans_table (itself a
// transliteration of draco-oxide decode/entropy/rans.rs:162-188).
// Returns bytes consumed, or -1 on a truncated/invalid stream.
int64_t tpud_parse_rans_table(const uint8_t* buf, int64_t len,
                              int64_t num_symbols, int64_t* dist_out) {
    for (int64_t i = 0; i < num_symbols; ++i) dist_out[i] = 0;
    int64_t pos = 0;
    int64_t i = 0;
    while (i < num_symbols) {
        if (pos >= len) return -1;
        const uint32_t count = buf[pos++];
        const uint32_t token = count & 3u;
        if (token == 3u) {
            const int64_t offset = count >> 2;
            if (i + offset >= num_symbols) return -1;
            i += offset;  // entries already zero
        } else {
            uint64_t freq = count >> 2;
            for (uint32_t j = 0; j < token; ++j) {
                if (pos >= len) return -1;
                freq |= (uint64_t)buf[pos++] << (8 * (j + 1) - 2);
            }
            dist_out[i] = (int64_t)freq;
        }
        ++i;
    }
    return pos;
}

// tpud_rans_decode without a caller-provided slot table: builds the
// r -> symbol map itself (2^precision int32 writes, ~100x cheaper than
// the Python np.repeat it replaces per decoded blob). S = table width.
int32_t tpud_rans_decode_auto(const uint8_t* buf, int64_t len,
                              const int32_t* freqs, const int32_t* cums,
                              int64_t S, int32_t precision, int64_t l_base,
                              int64_t n, int32_t* out) {
    const int64_t P = (int64_t)1 << precision;
    int32_t* slots = new int32_t[P];
    int64_t k = 0;
    for (int64_t s = 0; s < S; ++s)
        for (int32_t f = 0; f < freqs[s] && k < P; ++f) slots[k++] = s;
    // a malformed table (sum != 2^P) is rejected by the caller before
    // this point; guard anyway so a bug cannot read uninitialized slots
    int32_t rc = -1;
    if (k == P)
        rc = tpud_rans_decode(buf, len, freqs, cums, slots, precision,
                              l_base, n, out);
    delete[] slots;
    return rc;
}

}  // extern "C"
