/* PNG scanline unfilter (RFC 2083 §6) as a compiled kernel.
 *
 * The Sub/Average/Paeth filters carry a left-neighbour recurrence that
 * numpy cannot vectorize; the pure-Python fallback in mediacodec.py is
 * correct but loops per byte.  This kernel processes one pass's rows in
 * a single call.  Same build/caching contract as jpeg_scan_kernel.c:
 * compiled lazily with `cc -O2 -shared`, hash-cached in the temp dir,
 * loaded via ctypes, pure Python as the automatic fallback.
 *
 * Returns the new read position (>= 0) on success,
 *   -1 on truncated input, -2 on a bad filter type — the caller re-runs
 * the pure-Python path on any negative return so error messages stay
 * identical.
 */

#include <stdlib.h>
#include <string.h>

static unsigned char paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return (unsigned char)a;
    return (pb <= pc) ? (unsigned char)b : (unsigned char)c;
}

long long unfilter_rows(const unsigned char *raw, long long raw_len,
                        long long pos, int n_rows, int row_bytes, int bpp,
                        unsigned char *out) {
    const unsigned char *prev = NULL;
    for (int y = 0; y < n_rows; y++) {
        if (pos >= raw_len || pos + 1 + (long long)row_bytes > raw_len)
            return -1;
        int f = raw[pos++];
        const unsigned char *line = raw + pos;
        unsigned char *cur = out + (long long)y * row_bytes;
        int i;
        switch (f) {
        case 0: /* None */
            memcpy(cur, line, (size_t)row_bytes);
            break;
        case 1: /* Sub */
            for (i = 0; i < bpp && i < row_bytes; i++) cur[i] = line[i];
            for (i = bpp; i < row_bytes; i++)
                cur[i] = (unsigned char)(line[i] + cur[i - bpp]);
            break;
        case 2: /* Up */
            if (prev)
                for (i = 0; i < row_bytes; i++)
                    cur[i] = (unsigned char)(line[i] + prev[i]);
            else
                memcpy(cur, line, (size_t)row_bytes);
            break;
        case 3: /* Average */
            for (i = 0; i < row_bytes; i++) {
                int a = (i >= bpp) ? cur[i - bpp] : 0;
                int b = prev ? prev[i] : 0;
                cur[i] = (unsigned char)(line[i] + ((a + b) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (i = 0; i < row_bytes; i++) {
                int a = (i >= bpp) ? cur[i - bpp] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
                cur[i] = (unsigned char)(line[i] + paeth(a, b, c));
            }
            break;
        default:
            return -2;
        }
        pos += row_bytes;
        prev = cur;
    }
    return pos;
}
