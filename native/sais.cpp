// SA-IS suffix array construction (Nong, Zhang & Chan, 2009),
// implemented from the published algorithm for the index builder
// (replaces rust-bio's suffix_array(), reference src/index/indexing.rs:163).
//
// Works on an integer-rank text; recursion uses the same routine with the
// reduced problem's alphabet.  Indices are 64-bit so genome-scale texts
// (hg19 doubled: ~6.2e9 symbols) are supported.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsais.so sais.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using idx_t = int64_t;

// Compute bucket start (or end) offsets for each symbol.
static void bucket_offsets(const idx_t* text, idx_t n, idx_t K,
                           std::vector<idx_t>& bkt, bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (idx_t i = 0; i < n; i++) bkt[text[i]]++;
    idx_t sum = 0;
    for (idx_t c = 0; c < K; c++) {
        sum += bkt[c];
        bkt[c] = end ? sum : sum - bkt[c];
    }
}

static void induce_l(const idx_t* text, idx_t* sa, idx_t n, idx_t K,
                     const std::vector<bool>& is_s, std::vector<idx_t>& bkt) {
    bucket_offsets(text, n, K, bkt, false);
    for (idx_t i = 0; i < n; i++) {
        idx_t j = sa[i] - 1;
        if (sa[i] > 0 && !is_s[j]) sa[bkt[text[j]]++] = j;
    }
}

static void induce_s(const idx_t* text, idx_t* sa, idx_t n, idx_t K,
                     const std::vector<bool>& is_s, std::vector<idx_t>& bkt) {
    bucket_offsets(text, n, K, bkt, true);
    for (idx_t i = n - 1; i >= 0; i--) {
        idx_t j = sa[i] - 1;
        if (sa[i] > 0 && is_s[j]) sa[--bkt[text[j]]] = j;
    }
}

// Core SA-IS over an integer text with alphabet [0, K).  The text is NOT
// required to end in a unique smallest sentinel; a virtual "empty suffix"
// smaller than everything is modelled by the classic trick of appending one
// implicitly (handled by caller wrapper below).
static void sais(const idx_t* text, idx_t* sa, idx_t n, idx_t K) {
    if (n == 0) return;
    if (n == 1) {
        sa[0] = 0;
        return;
    }

    // 1) classify suffix types: S if text[i] < text[i+1], or equal-and-next-S;
    //    the final position is defined S (its suffix is the smallest among
    //    suffixes starting with text[n-1]?  No -- standard SA-IS appends a
    //    sentinel; here the caller appends an explicit 0 sentinel).
    std::vector<bool> is_s(n);
    is_s[n - 1] = true;
    for (idx_t i = n - 2; i >= 0; i--)
        is_s[i] = text[i] < text[i + 1] || (text[i] == text[i + 1] && is_s[i + 1]);

    auto is_lms = [&](idx_t i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

    std::vector<idx_t> bkt(K);

    // 2) put LMS suffixes at bucket ends, then induce to sort LMS substrings
    std::fill(sa, sa + n, idx_t(-1));
    bucket_offsets(text, n, K, bkt, true);
    for (idx_t i = n - 1; i >= 1; i--)
        if (is_lms(i)) sa[--bkt[text[i]]] = i;
    induce_l(text, sa, n, K, is_s, bkt);
    induce_s(text, sa, n, K, is_s, bkt);

    // 3) compact sorted LMS positions, name LMS substrings
    idx_t n_lms = 0;
    for (idx_t i = 0; i < n; i++)
        if (is_lms(sa[i])) sa[n_lms++] = sa[i];
    std::vector<idx_t> names(n / 2 + 1, idx_t(-1));
    idx_t name = 0;
    idx_t prev = -1;
    for (idx_t i = 0; i < n_lms; i++) {
        idx_t pos = sa[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            for (idx_t d = 0;; d++) {
                if (text[pos + d] != text[prev + d] ||
                    is_s[pos + d] != is_s[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
                    diff = !(is_lms(pos + d) && is_lms(prev + d));
                    break;
                }
            }
        }
        if (diff) {
            name++;
            prev = pos;
        }
        names[pos / 2] = name - 1;
    }
    // gather names in text order -> reduced string s1
    std::vector<idx_t> s1;
    s1.reserve(n_lms);
    for (idx_t i = 0; i < (idx_t)names.size(); i++)
        if (names[i] >= 0) s1.push_back(names[i]);

    // 4) sort the reduced problem (recurse if names are not unique)
    std::vector<idx_t> sa1(n_lms);
    if (name < n_lms) {
        sais(s1.data(), sa1.data(), n_lms, name);
    } else {
        for (idx_t i = 0; i < n_lms; i++) sa1[s1[i]] = i;
    }

    // 5) map reduced SA back to LMS positions (in text order)
    std::vector<idx_t> lms_pos;
    lms_pos.reserve(n_lms);
    for (idx_t i = 1; i < n; i++)
        if (is_lms(i)) lms_pos.push_back(i);
    std::vector<idx_t> sorted_lms(n_lms);
    for (idx_t i = 0; i < n_lms; i++) sorted_lms[i] = lms_pos[sa1[i]];

    // 6) induce the final SA from sorted LMS suffixes
    std::fill(sa, sa + n, idx_t(-1));
    bucket_offsets(text, n, K, bkt, true);
    for (idx_t i = n_lms - 1; i >= 0; i--) {
        idx_t pos = sorted_lms[i];
        sa[--bkt[text[pos]]] = pos;
    }
    induce_l(text, sa, n, K, is_s, bkt);
    induce_s(text, sa, n, K, is_s, bkt);
}

}  // namespace

extern "C" {

// Build the suffix array of `text` (uint8 ranks, alphabet [0, K)).
// The text must not be empty.  Returns 0 on success.
//
// Semantics match lexicographic suffix order over the raw byte text
// (duplicate sentinels allowed): a virtual empty suffix is appended
// internally so the comparison treats shorter prefixes as smaller.
int sais_u8(const uint8_t* text, int64_t* sa_out, int64_t n, int64_t K) {
    if (n <= 0) return -1;
    // append a unique smallest sentinel (0), shifting symbols by +1
    std::vector<idx_t> t(n + 1);
    for (idx_t i = 0; i < n; i++) t[i] = idx_t(text[i]) + 1;
    t[n] = 0;
    std::vector<idx_t> sa(n + 1);
    sais(t.data(), sa.data(), n + 1, K + 1);
    // drop the sentinel suffix (position n, always first)
    std::memcpy(sa_out, sa.data() + 1, n * sizeof(int64_t));
    return 0;
}
}
