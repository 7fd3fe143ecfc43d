// mwfrt — native host runtime kernels for miniwfa_tpu.
//
// The TPU runs the O(n·s) wavefront; these are the O(n+s) *sequential*
// host decoders that are pointer-chases by nature (no vector parallelism
// to exploit) and would be Python-slow at 5 Mb scale:
//
//   * mwf_traceback — walk the 7-bit packed traceback rows into a packed
//     CIGAR (semantics: reference wf_traceback, miniwfa.c:329-377; our row
//     layout: row r ↔ score r+1, column = (i-k) - tb_lo[r] + m1).
//   * mwf_lis_u64 — longest strictly-increasing subsequence over uint64
//     keys (patience sort with binary search; reference mg_lis_64
//     semantics, miniwfa.c:678-697) for the k-mer chaining mode.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
// Python bridge: miniwfa_tpu/utils/native.py (ctypes); pure-Python
// fallbacks exist for both entry points.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Append one CIGAR run, merging equal ops. Returns new length or -1 on
// overflow of the output buffer.
static int64_t cig_push(uint32_t *out, int64_t n, int64_t cap, uint32_t op,
                        uint32_t len) {
    if (len == 0) return n;
    if (n > 0 && (out[n - 1] & 0xf) == op) {
        out[n - 1] += len << 4;
        return n;
    }
    if (n >= cap) return -1;
    out[n] = len << 4 | op;
    return n + 1;
}

int64_t mwf_traceback(const uint8_t *tb_bits, int64_t W, const int32_t *tb_lo,
                      int32_t m1, const char *ts, int64_t tl, const char *qs,
                      int64_t ql, int32_t s_final, int32_t last_state,
                      int32_t x_pen, int32_t o1, int32_t e1, int32_t o2,
                      int32_t e2, uint32_t *out, int64_t cap) {
    int64_t i = ql - 1, k = tl - 1;
    int64_t srow = (int64_t)s_final - 1;
    int32_t last = last_state;
    int64_t n = 0;
    while (i >= 0 && k >= 0) {
        if (last == 0) {
            int64_t k0 = k;
            while (i >= 0 && k >= 0 && qs[i] == ts[k]) --i, --k;
            if (k0 - k > 0) n = cig_push(out, n, cap, 7, (uint32_t)(k0 - k));
            if (n < 0) return -1;
            if (i < 0 || k < 0) break;
        }
        if (srow < 0) return -2;  // walked past score 0: corrupt input
        int64_t col = (i - k) - (int64_t)tb_lo[srow] + m1;
        if (col < 0 || col >= W) return -3;
        uint8_t xb = tb_bits[srow * W + col];
        int32_t state = last == 0 ? (xb & 7) : last;
        int32_t ext = state > 0 ? (xb >> (state + 2)) & 1 : 0;
        switch (state) {
            case 0: n = cig_push(out, n, cap, 8, 1); --i; --k; srow -= x_pen; break;
            case 1: n = cig_push(out, n, cap, 1, 1); --i; srow -= ext ? e1 : o1 + e1; break;
            case 3: n = cig_push(out, n, cap, 1, 1); --i; srow -= ext ? e2 : o2 + e2; break;
            case 2: n = cig_push(out, n, cap, 2, 1); --k; srow -= ext ? e1 : o1 + e1; break;
            case 4: n = cig_push(out, n, cap, 2, 1); --k; srow -= ext ? e2 : o2 + e2; break;
            default: return -4;
        }
        if (n < 0) return -1;
        last = (state > 0 && ext) ? state : 0;
    }
    if (i >= 0) n = cig_push(out, n, cap, 1, (uint32_t)(i + 1));
    else if (k >= 0) n = cig_push(out, n, cap, 2, (uint32_t)(k + 1));
    if (n < 0) return -1;
    for (int64_t a = 0, b = n - 1; a < b; ++a, --b) {  // reverse to input order
        uint32_t t = out[a];
        out[a] = out[b];
        out[b] = t;
    }
    return n;
}

// Longest strictly-increasing subsequence; writes selected indices to out,
// returns its length.
int64_t mwf_lis_u64(int64_t n, const uint64_t *a, int64_t *out) {
    if (n <= 0) return 0;
    std::vector<int64_t> M(n + 1), P(n);
    int64_t L = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t lo = 1, hi = L;
        while (lo <= hi) {
            int64_t mid = (lo + hi + 1) >> 1;
            if (a[M[mid]] < a[i]) lo = mid + 1;
            else hi = mid - 1;
        }
        P[i] = M[lo - 1];
        M[lo] = i;
        if (lo > L) L = lo;
    }
    int64_t k = M[L];
    for (int64_t j = L - 1; j >= 0; --j) {
        out[j] = k;
        k = P[k];
    }
    return L;
}

}  // extern "C"
