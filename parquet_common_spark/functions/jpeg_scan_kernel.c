/* JPEG entropy-coded scan kernel — the C form of jpegcodec.py's
 * _decode_scan_fast (same algorithm, same error behavior, bit-identical
 * output; pinned against both Python engines in tests/test_jpegcodec.py).
 *
 * This is the repo's documented "libjpeg-turbo swap point" made
 * concrete without an external dependency: the per-symbol Huffman walk
 * is the one JPEG stage CPython cannot vectorize (serial bit-position
 * dependence), so it compiles lazily at first use (cc -O2 -shared, see
 * jpegcodec._native_kernel) and falls back to the pure-Python loop when
 * no compiler exists.  Everything else (IDCT, upsampling, color) stays
 * numpy.
 *
 * Error codes (mapped back to the Python engines' ValueErrors):
 *   0 ok, 1 invalid Huffman code, 2 entropy data exhausted,
 *   3 AC coefficient overflow, 4 missing restart segment,
 *   5 bad refinement symbol.
 */
#include <stdint.h>

#define FILL                                                 \
    while (nbits < 56 && pos < end) {                        \
        acc = (acc << 8) | data[pos++];                      \
        nbits += 8;                                          \
    }
#define MASK(n) (((uint64_t)1 << (n)) - 1)

/* Decode one Huffman symbol via the left-justified peek LUT
 * (entry = symbol << 5 | code_length; 0 = invalid prefix). */
#define HUFF_DECODE(lut, maxlen, out_sym)                    \
    do {                                                     \
        if (nbits < (maxlen)) FILL;                          \
        uint64_t peek_;                                      \
        if (nbits < (maxlen))                                \
            peek_ = (acc << ((maxlen) - nbits)) & MASK(maxlen); \
        else                                                 \
            peek_ = (acc >> (nbits - (maxlen))) & MASK(maxlen); \
        int32_t entry_ = (lut)[peek_];                       \
        if (entry_ == 0) return 1;                           \
        int ln_ = entry_ & 31;                               \
        if (nbits < ln_) return 2;                           \
        nbits -= ln_;                                        \
        acc &= MASK(nbits);                                  \
        (out_sym) = entry_ >> 5;                             \
    } while (0)

/* Read n (>0) raw bits into out_v. */
#define READ_BITS(n, out_v)                                  \
    do {                                                     \
        if (nbits < (n)) {                                   \
            FILL;                                            \
            if (nbits < (n)) return 2;                       \
        }                                                    \
        nbits -= (n);                                        \
        (out_v) = (acc >> nbits) & MASK(n);                  \
        acc &= MASK(nbits);                                  \
    } while (0)

int decode_scan(
    const uint8_t *seg_data, const int64_t *seg_off, int n_segs,
    int restart_interval,
    const int32_t *unit_off, int n_units,
    const int32_t *blk_ci, const int64_t *blk_base,
    int n_comps,
    int64_t **coefs,
    const int32_t **dc_luts, const int32_t *dc_maxlens,
    const int32_t **ac_luts, const int32_t *ac_maxlens,
    int Ss, int Se, int Ah, int Al)
{
    int seg_idx = 0;
    const uint8_t *data = seg_data + seg_off[0];
    int64_t end = seg_off[1] - seg_off[0];
    int64_t pos = 0;
    uint64_t acc = 0;
    int nbits = 0;
    int64_t preds[8] = {0};
    int64_t eobrun = 0;
    const int64_t p1 = (int64_t)1 << Al;
    const int64_t m1 = -p1;
    const int k0 = Ss ? Ss : 1;
    const int do_dc = (Ss == 0);
    const int do_ac = (Se >= k0);
    const int dc_first = (Ah == 0);

    if (n_comps > 8) return 6; /* T.81 allows at most 4 per scan */

    for (int ui = 0; ui < n_units; ui++) {
        if (restart_interval && ui && ui % restart_interval == 0) {
            seg_idx++;
            if (seg_idx >= n_segs) return 4;
            data = seg_data + seg_off[seg_idx];
            end = seg_off[seg_idx + 1] - seg_off[seg_idx];
            pos = 0; acc = 0; nbits = 0;
            for (int i = 0; i < n_comps; i++) preds[i] = 0;
            eobrun = 0;
        }
        for (int32_t bi = unit_off[ui]; bi < unit_off[ui + 1]; bi++) {
            const int ci = blk_ci[bi];
            const int64_t base = blk_base[bi];
            int64_t *coef = coefs[ci];
            if (do_dc) {
                if (dc_first) { /* DC first (or baseline full) */
                    int sym;
                    HUFF_DECODE(dc_luts[ci], dc_maxlens[ci], sym);
                    if (sym) {
                        uint64_t v;
                        READ_BITS(sym, v);
                        preds[ci] += (v >= ((uint64_t)1 << (sym - 1)))
                                         ? (int64_t)v
                                         : (int64_t)v - ((int64_t)1 << sym) + 1;
                    }
                    coef[base] = preds[ci] << Al;
                } else { /* DC refinement: one raw bit */
                    uint64_t bit;
                    READ_BITS(1, bit);
                    if (bit) coef[base] |= p1;
                }
            }
            if (!do_ac) continue;
            if (Ah == 0) { /* AC first scan (also the baseline AC path) */
                if (eobrun > 0) { eobrun--; continue; }
                const int32_t *ac_lut = ac_luts[ci];
                const int ac_maxlen = ac_maxlens[ci];
                int k = k0;
                while (k <= Se) {
                    int sym;
                    HUFF_DECODE(ac_lut, ac_maxlen, sym);
                    const int r = sym >> 4, s = sym & 15;
                    if (s == 0) {
                        if (r != 15) {
                            eobrun = ((int64_t)1 << r) - 1;
                            if (r) {
                                uint64_t extra;
                                READ_BITS(r, extra);
                                eobrun += (int64_t)extra;
                            }
                            break;
                        }
                        k += 16; /* ZRL */
                        continue;
                    }
                    k += r;
                    if (k > Se) return 3;
                    uint64_t v;
                    READ_BITS(s, v);
                    coef[base + k] =
                        ((v >= ((uint64_t)1 << (s - 1)))
                             ? (int64_t)v
                             : (int64_t)v - ((int64_t)1 << s) + 1)
                        << Al;
                    k++;
                }
            } else { /* AC successive-approximation refinement */
                const int32_t *ac_lut = ac_luts[ci];
                const int ac_maxlen = ac_maxlens[ci];
                int k = Ss;
                if (eobrun == 0) {
                    while (k <= Se) {
                        int sym;
                        HUFF_DECODE(ac_lut, ac_maxlen, sym);
                        int r = sym >> 4;
                        const int s = sym & 15;
                        int64_t sval = 0;
                        if (s == 0) {
                            if (r != 15) {
                                eobrun = (int64_t)1 << r;
                                if (r) {
                                    uint64_t extra;
                                    READ_BITS(r, extra);
                                    eobrun += (int64_t)extra;
                                }
                                break;
                            }
                            /* r == 15: skip 16 zero-HISTORY coefficients */
                        } else {
                            if (s != 1) return 5;
                            uint64_t bit;
                            READ_BITS(1, bit);
                            sval = bit ? p1 : m1;
                        }
                        while (k <= Se) {
                            const int64_t zk = coef[base + k];
                            if (zk != 0) {
                                uint64_t bit;
                                READ_BITS(1, bit);
                                if (bit && (zk & p1) == 0)
                                    coef[base + k] = zk + (zk >= 0 ? p1 : m1);
                            } else {
                                if (r == 0) break;
                                r--;
                            }
                            k++;
                        }
                        if (sval && k <= Se) coef[base + k] = sval;
                        k++;
                    }
                }
                if (eobrun > 0) {
                    while (k <= Se) {
                        const int64_t zk = coef[base + k];
                        if (zk != 0) {
                            uint64_t bit;
                            READ_BITS(1, bit);
                            if (bit && (zk & p1) == 0)
                                coef[base + k] = zk + (zk >= 0 ? p1 : m1);
                        }
                        k++;
                    }
                    eobrun--;
                }
            }
        }
    }
    return 0;
}
