// Matching-statistics / MEM-locate engine (C++, host side).
//
// Plays the role of the reference's external SPUMONI + r-index binaries
// (matching statistics per base, reference exp_type_5.smk:115-133; MEM
// locate with one best hit, exp_type_7.smk:244-256). FM/r-index queries are
// pointer-chasing and not TPU-shaped (SURVEY.md section 7.2), so this stays
// a native CPU component, exposed to Python over a C ABI via ctypes.
//
// Index: plain suffix array via prefix-doubling with radix sort
// (O(n log n)); queries: per-position longest-match via interval-narrowing
// binary search over the SA. Exact, deterministic.
//
// Build: g++ -O3 -shared -fPIC ms_engine.cpp -o libkhoice_ms.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>

namespace {

struct Index {
    std::vector<uint8_t> text;   // with trailing 0 sentinel
    std::vector<int64_t> sa;     // suffix array over text
};

// Suffix array by prefix doubling with LSD radix sort on (rank, next-rank).
static void build_sa(const std::vector<uint8_t>& s, std::vector<int64_t>& sa) {
    const int64_t n = (int64_t)s.size();
    sa.resize(n);
    std::vector<int64_t> rank_(n), tmp(n), cnt;
    for (int64_t i = 0; i < n; i++) { sa[i] = i; rank_[i] = s[i]; }

    auto radix_pass = [&](const std::vector<int64_t>& key,
                          const std::vector<int64_t>& in,
                          std::vector<int64_t>& out, int64_t kmax) {
        cnt.assign(kmax + 2, 0);
        for (int64_t i = 0; i < n; i++) cnt[key[in[i]] + 1]++;
        for (int64_t i = 1; i <= kmax + 1; i++) cnt[i] += cnt[i - 1];
        for (int64_t i = 0; i < n; i++) out[cnt[key[in[i]]]++] = in[i];
    };

    std::vector<int64_t> key2(n), order(n);
    for (int64_t len = 1;; len <<= 1) {
        int64_t kmax = *std::max_element(rank_.begin(), rank_.end());
        // secondary key: rank of i+len (0 for past-the-end, ranks shifted +1)
        for (int64_t i = 0; i < n; i++)
            key2[i] = (i + len < n) ? rank_[i + len] + 1 : 0;
        radix_pass(key2, sa, order, kmax + 1);
        radix_pass(rank_, order, sa, kmax);
        // re-rank
        tmp[sa[0]] = 0;
        for (int64_t i = 1; i < n; i++) {
            const int64_t a = sa[i], b = sa[i - 1];
            const bool same = rank_[a] == rank_[b] && key2[a] == key2[b];
            tmp[a] = tmp[b] + (same ? 0 : 1);
        }
        rank_.swap(tmp);
        if (rank_[sa[n - 1]] == n - 1) break;
    }
}

// Longest common prefix length between query q[0..m) and text suffix at t,
// capped at m.
static inline int64_t match_len(const Index& ix, int64_t t,
                                const uint8_t* q, int64_t m) {
    const int64_t n = (int64_t)ix.text.size();
    int64_t l = 0;
    while (l < m && t + l < n && ix.text[t + l] == q[l]) l++;
    return l;
}

// For pattern q[0..m): length of the longest prefix occurring in text, and
// (optionally) one text position where the full m-length pattern occurs.
static int64_t longest_prefix(const Index& ix, const uint8_t* q, int64_t m,
                              int64_t* hit_pos) {
    const int64_t n = (int64_t)ix.sa.size();
    // Narrow the SA interval character by character.
    int64_t lo = 0, hi = n;  // current interval [lo, hi) matching q[0..l)
    int64_t l = 0;
    if (hit_pos) *hit_pos = -1;
    while (l < m) {
        const uint8_t c = q[l];
        // lower bound: first suffix with text[sa+l] >= c within [lo, hi)
        int64_t a = lo, b = hi;
        while (a < b) {
            int64_t mid = (a + b) >> 1;
            int64_t p = ix.sa[mid] + l;
            uint8_t tc = (p < (int64_t)ix.text.size()) ? ix.text[p] : 0;
            if (tc < c) a = mid + 1; else b = mid;
        }
        int64_t new_lo = a;
        // upper bound: first suffix with text[sa+l] > c
        b = hi;
        while (a < b) {
            int64_t mid = (a + b) >> 1;
            int64_t p = ix.sa[mid] + l;
            uint8_t tc = (p < (int64_t)ix.text.size()) ? ix.text[p] : 0;
            if (tc <= c) a = mid + 1; else b = mid;
        }
        int64_t new_hi = a;
        if (new_lo >= new_hi) break;
        lo = new_lo; hi = new_hi; l++;
    }
    if (l == m && hit_pos && lo < hi) *hit_pos = ix.sa[lo];
    return l;
}

}  // namespace

extern "C" {

void* ms_build(const uint8_t* text, int64_t n) {
    Index* ix = new Index();
    ix->text.assign(text, text + n);
    ix->text.push_back(0);  // sentinel smaller than any symbol
    build_sa(ix->text, ix->sa);
    return ix;
}

void ms_free(void* h) { delete (Index*)h; }

// Matching statistics: out_ms[i] = longest prefix of q[i..m) found in text.
void ms_query(void* h, const uint8_t* q, int64_t m, int32_t* out_ms) {
    Index* ix = (Index*)h;
    for (int64_t i = 0; i < m; i++) {
        out_ms[i] = (int32_t)longest_prefix(*ix, q + i, m - i, nullptr);
    }
}

// First occurrence of the full pattern, or -1 (ri-align -m 1 role).
int64_t ms_locate(void* h, const uint8_t* q, int64_t m) {
    Index* ix = (Index*)h;
    int64_t pos = -1;
    int64_t l = longest_prefix(*ix, q, m, &pos);
    return (l == m) ? pos : -1;
}

int64_t ms_text_len(void* h) { return (int64_t)((Index*)h)->text.size() - 1; }

}  // extern "C"
