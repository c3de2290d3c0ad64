/* FLAC subframe decode kernel: the per-symbol serial stage (Rice unary
 * walks + LPC/fixed predictor reconstruction) that numpy cannot
 * express.  Compiled lazily by flaccodec._native_kernel() (cc -O2
 * -shared, cached by source hash) on the same pattern as
 * jpeg_scan_kernel.c / png_unfilter_kernel.c; the pure-Python
 * _read_subframe remains the error-path authority and the fallback
 * when no compiler is present.  Bit-identity across engines is pinned
 * by tests/test_flaccodec.py (subframe types x stereo modes x
 * partition orders, plus the hypothesis round-trip).
 *
 * Semantics transcribed from RFC 9639 / the xiph.org FLAC format spec
 * (same source as the Python path).  Arithmetic note: the Python path
 * predicts in unbounded ints; this kernel uses int64 accumulators,
 * which RFC 9639 guarantees sufficient for conforming streams
 * (order<=32, coef<=15 bit, sample<=33 bit incl. side channel).
 *
 * Error codes (mapped back to the SAME ValueError strings by the
 * Python wrapper):
 *   1 bitstream truncated          5 negative LPC shift
 *   2 subframe padding bit set     6 reserved residual coding method
 *   300+t reserved subframe type t 7 blocksize not divisible by parts
 *   4 invalid LPC precision        8 partition shorter than order
 */

#include <stdint.h>

/* ------------------------------------------------------------- CRCs
 * Same polynomials as the Python tables (CRC-8 poly 0x07, CRC-16 poly
 * 0x8005, MSB-first, zero init) — frame-level CRC verification is a
 * per-byte walk over every frame byte, which dominates once the
 * subframe loop is compiled. */

static uint16_t CRC16_TAB[256];
static uint8_t CRC8_TAB[256];
static int crc_init_done = 0;

static void crc_init(void)
{
    int b, i;
    for (b = 0; b < 256; b++) {
        unsigned r16 = (unsigned)b << 8;
        unsigned r8 = (unsigned)b;
        for (i = 0; i < 8; i++) {
            r16 = (r16 & 0x8000u) ? ((r16 << 1) ^ 0x8005u) & 0xFFFFu
                                  : (r16 << 1) & 0xFFFFu;
            r8 = (r8 & 0x80u) ? ((r8 << 1) ^ 0x07u) & 0xFFu
                              : (r8 << 1) & 0xFFu;
        }
        CRC16_TAB[b] = (uint16_t)r16;
        CRC8_TAB[b] = (uint8_t)r8;
    }
    crc_init_done = 1;
}

int flac_crc16(const uint8_t *data, int64_t n)
{
    int64_t i;
    unsigned r = 0;
    if (!crc_init_done)
        crc_init();
    for (i = 0; i < n; i++)
        r = CRC16_TAB[((r >> 8) ^ data[i]) & 0xFFu] ^ ((r << 8) & 0xFFFFu);
    return (int)r;
}

int flac_crc8(const uint8_t *data, int64_t n)
{
    int64_t i;
    unsigned r = 0;
    if (!crc_init_done)
        crc_init();
    for (i = 0; i < n; i++)
        r = CRC8_TAB[r ^ data[i]];
    return (int)r;
}

typedef struct {
    const uint8_t *data;
    int64_t len;
    int64_t byte;
    int bit; /* bits consumed in current byte, MSB first */
    int err;
} BR;

static uint64_t br_read(BR *br, int n)
{
    uint64_t v = 0;
    while (n > 0) {
        int avail, take;
        uint8_t cur;
        if (br->byte >= br->len) {
            br->err = 1;
            return 0;
        }
        avail = 8 - br->bit;
        take = n < avail ? n : avail;
        cur = br->data[br->byte];
        v = (v << take) | ((uint64_t)(cur >> (avail - take)) & ((1u << take) - 1u));
        br->bit += take;
        if (br->bit == 8) {
            br->bit = 0;
            br->byte++;
        }
        n -= take;
    }
    return v;
}

static int64_t br_signed(BR *br, int n)
{
    uint64_t v = br_read(br, n);
    if (br->err || n <= 0)
        return 0;
    if (v & (1ULL << (n - 1)))
        return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
}

/* Unary run: count zero bits up to the terminating 1.  Byte-steps over
 * all-zero tails — this is THE hot loop of Rice decode. */
static int64_t br_unary(BR *br)
{
    int64_t q = 0;
    for (;;) {
        uint8_t cur;
        int lz;
        if (br->byte >= br->len) {
            br->err = 1;
            return 0;
        }
        cur = (uint8_t)(br->data[br->byte] << br->bit);
        if (cur == 0) {
            q += 8 - br->bit;
            br->byte++;
            br->bit = 0;
            continue;
        }
        lz = 0;
        while (!(cur & 0x80u)) {
            cur = (uint8_t)(cur << 1);
            lz++;
        }
        q += lz;
        br->bit += lz + 1;
        if (br->bit >= 8) {
            br->bit -= 8;
            br->byte++;
        }
        return q;
    }
}

static int read_residual(BR *br, int blocksize, int order, int64_t *res)
{
    int method, pbits, escape, porder, nparts, p, idx;
    method = (int)br_read(br, 2);
    if (br->err)
        return 1;
    if (method > 1)
        return 6;
    pbits = method == 0 ? 4 : 5;
    escape = (1 << pbits) - 1;
    porder = (int)br_read(br, 4);
    if (br->err)
        return 1;
    nparts = 1 << porder;
    if (blocksize % nparts)
        return 7;
    idx = 0;
    for (p = 0; p < nparts; p++) {
        int n = (blocksize >> porder) - (p == 0 ? order : 0);
        int param, i;
        if (n < 0)
            return 8;
        param = (int)br_read(br, pbits);
        if (br->err)
            return 1;
        if (param == escape) {
            int raw = (int)br_read(br, 5);
            if (br->err)
                return 1;
            if (raw == 0) {
                for (i = 0; i < n; i++)
                    res[idx++] = 0;
            } else {
                for (i = 0; i < n; i++)
                    res[idx++] = br_signed(br, raw);
                if (br->err)
                    return 1;
            }
        } else {
            for (i = 0; i < n; i++) {
                int64_t q = br_unary(br);
                uint64_t r = param ? br_read(br, param) : 0;
                uint64_t u;
                if (br->err)
                    return 1;
                u = ((uint64_t)q << param) | r;
                res[idx++] = (u & 1) ? ~(int64_t)(u >> 1) : (int64_t)(u >> 1);
            }
        }
    }
    return 0;
}

/* In-place predictor: s[0..order-1] are warm-up samples, s[order..]
 * hold residuals on entry and reconstructed samples on exit. */
static void predict(int64_t *s, int blocksize, int order,
                    const int64_t *coefs, int shift)
{
    int i, j;
    for (i = order; i < blocksize; i++) {
        int64_t acc = 0;
        for (j = 0; j < order; j++)
            acc += coefs[j] * s[i - 1 - j];
        s[i] += acc >> shift;
    }
}

static const int64_t FIXED_COEFS[5][4] = {
    {0, 0, 0, 0},
    {1, 0, 0, 0},
    {2, -1, 0, 0},
    {3, -3, 1, 0},
    {4, -6, 4, -1},
};

int decode_subframe(const uint8_t *data, int64_t data_len,
                    int64_t *io_byte, int32_t *io_bit,
                    int32_t blocksize, int32_t bps, int64_t *out)
{
    BR br;
    int ftype, wasted = 0, ebps, i, rc;
    br.data = data;
    br.len = data_len;
    br.byte = *io_byte;
    br.bit = *io_bit;
    br.err = 0;

    if (br_read(&br, 1)) {
        if (br.err)
            return 1;
        return 2;
    }
    ftype = (int)br_read(&br, 6);
    if (br_read(&br, 1))
        wasted = (int)br_unary(&br) + 1;
    if (br.err)
        return 1;
    ebps = bps - wasted;
    if (ebps <= 0)
        return 1;

    if (ftype == 0) { /* CONSTANT */
        int64_t v = br_signed(&br, ebps);
        if (br.err)
            return 1;
        for (i = 0; i < blocksize; i++)
            out[i] = v;
    } else if (ftype == 1) { /* VERBATIM */
        for (i = 0; i < blocksize; i++)
            out[i] = br_signed(&br, ebps);
        if (br.err)
            return 1;
    } else if (ftype >= 8 && ftype <= 12) { /* FIXED order 0-4 */
        int order = ftype - 8;
        for (i = 0; i < order; i++)
            out[i] = br_signed(&br, ebps);
        if (br.err)
            return 1;
        rc = read_residual(&br, blocksize, order, out + order);
        if (rc)
            return rc;
        predict(out, blocksize, order, FIXED_COEFS[order], 0);
    } else if (ftype >= 32) { /* LPC order 1-32 */
        int order = ftype - 31;
        int prec, shift;
        int64_t coefs[32];
        for (i = 0; i < order; i++)
            out[i] = br_signed(&br, ebps);
        prec = (int)br_read(&br, 4);
        if (br.err)
            return 1;
        if (prec == 0xF)
            return 4;
        prec += 1;
        shift = (int)br_signed(&br, 5);
        if (br.err)
            return 1;
        if (shift < 0)
            return 5;
        for (i = 0; i < order; i++)
            coefs[i] = br_signed(&br, prec);
        if (br.err)
            return 1;
        rc = read_residual(&br, blocksize, order, out + order);
        if (rc)
            return rc;
        predict(out, blocksize, order, coefs, shift);
    } else {
        return 300 + ftype; /* reserved subframe type */
    }

    if (wasted)
        for (i = 0; i < blocksize; i++)
            out[i] <<= wasted;

    *io_byte = br.byte;
    *io_bit = br.bit;
    return 0;
}
