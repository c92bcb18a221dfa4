// Host-side suffix-array construction: a from-scratch SA-IS implementation.
//
// Plays the role the libsais C kernel plays in the reference (called from the
// Writer's dump path, reference: src/lib.rs:24-40 -> libsais.c:6597), but is
// an independent, compact implementation of the textbook SA-IS algorithm
// (Nong, Zhang & Chan 2009): type classification, LMS bucketing, two induced
// sorting sweeps, substring naming, and recursion on the reduced string.
//
// Used for fast host builds when no accelerator is attached, and as a second
// independent oracle for validating the device prefix-doubling kernel.
//
// Comparison convention: the caller maps byte b -> b + 1 and appends a unique
// 0 sentinel, so a proper prefix sorts before any extension — matching the
// reference reader's raw byte compare (src/lib.rs:224-228).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i32 = int32_t;

void count_symbols(const i32* s, i32* cnt, i32 n, i32 K) {
  std::fill(cnt, cnt + K, 0);
  for (i32 i = 0; i < n; ++i) cnt[s[i]]++;
}

// bkt[c] = start (end=false) or one-past-end (end=true) of symbol c's bucket.
void bucket_bounds(const i32* cnt, i32* bkt, i32 K, bool end) {
  i32 sum = 0;
  for (i32 c = 0; c < K; ++c) {
    sum += cnt[c];
    bkt[c] = end ? sum : sum - cnt[c];
  }
}

// The two canonical induction sweeps: L-types left-to-right from bucket
// heads, then S-types right-to-left from bucket tails.  is_s is a byte
// array, not vector<bool> — these are the two hottest loops of the whole
// build and the bit extraction on every is_s[j-1] read costs ~2x.
void induce(const i32* s, i32* sa, const uint8_t* is_s,
            const std::vector<i32>& cnt, std::vector<i32>& bkt, i32 n,
            i32 K) {
  bucket_bounds(cnt.data(), bkt.data(), K, false);
  for (i32 i = 0; i < n; ++i) {
    i32 j = sa[i];
    if (j > 0 && !is_s[j - 1]) sa[bkt[s[j - 1]]++] = j - 1;
  }
  bucket_bounds(cnt.data(), bkt.data(), K, true);
  for (i32 i = n - 1; i >= 0; --i) {
    i32 j = sa[i];
    if (j > 0 && is_s[j - 1]) sa[--bkt[s[j - 1]]] = j - 1;
  }
}

// SA-IS over an integer string s[0..n) with values in [0, K) whose last
// symbol is a unique smallest sentinel.
void sais_rec(const i32* s, i32* sa, i32 n, i32 K) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }

  std::vector<uint8_t> is_s_v(n);
  uint8_t* is_s = is_s_v.data();
  is_s[n - 1] = 1;
  for (i32 i = n - 2; i >= 0; --i)
    is_s[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && is_s[i + 1]);
  auto is_lms = [&](i32 i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  std::vector<i32> cnt(K), bkt(K);
  count_symbols(s, cnt.data(), n, K);

  // Stage 1: seed with LMS positions in text order, induce once to obtain
  // LMS substrings in sorted order.
  std::fill(sa, sa + n, -1);
  bucket_bounds(cnt.data(), bkt.data(), K, true);
  std::vector<i32> lms_pos;
  for (i32 i = 1; i < n; ++i)
    if (is_lms(i)) lms_pos.push_back(i);
  for (i32 i = static_cast<i32>(lms_pos.size()) - 1; i >= 0; --i)
    sa[--bkt[s[lms_pos[i]]]] = lms_pos[i];
  induce(s, sa, is_s, cnt, bkt, n, K);

  // Compact the sorted LMS positions to the front.
  i32 m = 0;
  for (i32 i = 0; i < n; ++i)
    if (sa[i] > 0 && is_lms(sa[i])) sa[m++] = sa[i];

  // Stage 2: name LMS substrings (equal substrings share a name); names are
  // parked at sa[m + pos/2], valid because LMS positions are >= 2 apart.
  std::fill(sa + m, sa + n, -1);
  i32 name = 0, prev = -1;
  for (i32 i = 0; i < m; ++i) {
    i32 pos = sa[i];
    bool differs = prev < 0;
    if (!differs) {
      for (i32 d = 0;; ++d) {
        bool lms_a = is_lms(prev + d), lms_b = is_lms(pos + d);
        if (d > 0 && (lms_a || lms_b)) {
          differs = !(lms_a && lms_b);
          break;
        }
        if (s[prev + d] != s[pos + d]) {
          differs = true;
          break;
        }
      }
    }
    if (differs) {
      ++name;
      prev = pos;
    }
    sa[m + pos / 2] = name - 1;
  }

  if (name < m) {
    // Ties remain: recurse on the reduced string of LMS names.
    std::vector<i32> s1(m);
    i32 j = 0;
    for (i32 i = m; i < n; ++i)
      if (sa[i] >= 0) s1[j++] = sa[i];
    std::vector<i32> sa1(m);
    sais_rec(s1.data(), sa1.data(), m, name);
    for (i32 i = 0; i < m; ++i) sa[i] = lms_pos[sa1[i]];
  }
  // (name == m: sa[0..m) is already the sorted LMS suffix order.)

  // Stage 3: scatter sorted LMS suffixes to bucket tails, final induction.
  std::vector<i32> sorted_lms(sa, sa + m);
  std::fill(sa, sa + n, -1);
  bucket_bounds(cnt.data(), bkt.data(), K, true);
  for (i32 i = m - 1; i >= 0; --i) {
    i32 p = sorted_lms[i];
    sa[--bkt[s[p]]] = p;
  }
  induce(s, sa, is_s, cnt, bkt, n, K);
}

}  // namespace

extern "C" {

// Suffix array of a byte string; returns 0 on success.  sa_out must hold n
// int32 slots.  Convention: prefix-before-extension (see header comment).
i32 tpuss_build_sa_u8(const uint8_t* data, i32 n, i32* sa_out) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  std::vector<i32> s(static_cast<size_t>(n) + 1);
  for (i32 i = 0; i < n; ++i) s[i] = static_cast<i32>(data[i]) + 1;
  s[n] = 0;
  std::vector<i32> sa(static_cast<size_t>(n) + 1);
  sais_rec(s.data(), sa.data(), n + 1, 258);
  // sa[0] is the sentinel position n; the rest is the text's SA.
  std::memcpy(sa_out, sa.data() + 1, static_cast<size_t>(n) * sizeof(i32));
  return 0;
}

// Suffix array of an int32 string with values in [0, k) — the analogue of
// the reference kernel's integer-alphabet entry point (libsais_int,
// reference src/libsais/libsais.c:6612-6625).  Returns 0 on success.
i32 tpuss_build_sa_i32(const i32* data, i32 n, i32 k, i32* sa_out) {
  if (n < 0 || k <= 0 || k > 0x3FFFFFFF) return -1;
  if (n == 0) return 0;
  std::vector<i32> s(static_cast<size_t>(n) + 1);
  for (i32 i = 0; i < n; ++i) {
    if (data[i] < 0 || data[i] >= k) return -2;
    s[i] = data[i] + 1;
  }
  s[n] = 0;
  std::vector<i32> sa(static_cast<size_t>(n) + 1);
  sais_rec(s.data(), sa.data(), n + 1, k + 1);
  std::memcpy(sa_out, sa.data() + 1, static_cast<size_t>(n) * sizeof(i32));
  return 0;
}

// Inverse BWT under the libsais convention (see ops/bwt.py for the
// derivation; behavioral parity with libsais_unbwt, reference
// src/libsais/libsais.c:7551-7638): u is the BWT column with the sentinel
// row removed, primary_index its removed position.  Sequential LF walk —
// exactly the pointer-chase the device cannot vectorize, so it lives here.
i32 tpuss_unbwt(const uint8_t* u, i32 n, i32 primary_index, uint8_t* out) {
  if (n < 0 || primary_index < 1 || primary_index > n) return -1;
  if (n == 0) return 0;
  std::vector<i32> lf(static_cast<size_t>(n));
  i32 counts[256] = {0};
  for (i32 i = 0; i < n; ++i) counts[u[i]]++;
  i32 starts[256];
  i32 sum = 1;  // row 0 belongs to the sentinel
  for (i32 c = 0; c < 256; ++c) {
    starts[c] = sum;
    sum += counts[c];
  }
  for (i32 i = 0; i < n; ++i) lf[i] = starts[u[i]]++;
  i32 p = 0;
  for (i32 i = n - 1; i >= 0; --i) {
    i32 m = p < primary_index ? p : p - 1;
    out[i] = u[m];
    p = lf[m];
  }
  return p == primary_index ? 0 : -2;
}

// Newline-position scan used by index load (vectorizable memchr analogue).
// Writes at most cap positions; returns the total newline count.
i32 tpuss_find_newlines(const uint8_t* data, i32 n, i32* out, i32 cap) {
  i32 count = 0;
  for (i32 i = 0; i < n; ++i) {
    if (data[i] == 0x0A) {
      if (count < cap) out[count] = i;
      ++count;
    }
  }
  return count;
}
}
