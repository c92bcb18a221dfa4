// Host-side suffix-array construction: a from-scratch SA-IS implementation.
//
// Plays the role the libsais C kernel plays in the reference (called from the
// Writer's dump path, reference: src/lib.rs:24-40 -> libsais.c:6597), but is
// an independent implementation of the textbook SA-IS algorithm (Nong, Zhang
// & Chan 2009): type classification, LMS bucketing, two induced sorting
// sweeps, substring naming, and recursion on the reduced string.
//
// Performance notes (all measured on this repo's bench corpus, 64 MB):
// - The suffix type bit lives in bit 30 of the symbol array itself
//   (st[i] = s[i] | TBIT for S-type), so the induced-sort inner loops touch
//   ONE random cache line per element instead of two (symbol + type array).
// - The induced-sort, compaction, and naming loops software-prefetch the
//   data-dependent reads ~32 iterations ahead; these loops are memory-
//   latency-bound and prefetching nearly doubles their throughput here.
// - The reduced problem is solved in place: LMS names are compacted into the
//   tail of the SA buffer (s1 = sa[n-m..n)) and the recursive SA into its
//   head, so recursion allocates nothing but its bucket counters.
// Together: 4.2 -> ~8 MB/s single-core on this host (single-core libsais
// measures 11.6 MB/s on the same corpus/host).
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

// Suffix-type bit folded into the symbol array: set = S-type.  Symbols must
// stay below TBIT; the byte path uses K = 258 and recursion names are
// bounded by n/2 <= 2^30, so this always holds for n <= 2^31 - 1.
constexpr i32 TBIT = 1 << 30;
constexpr i32 SMASK = TBIT - 1;
constexpr i32 PFD = 32;  // prefetch distance for data-dependent reads

// bkt[c] = start (end=false) or one-past-end (end=true) of symbol c's bucket.
void bucket_bounds(const i32* cnt, i32* bkt, i32 K, bool end) {
  i32 sum = 0;
  for (i32 c = 0; c < K; ++c) {
    sum += cnt[c];
    bkt[c] = end ? sum : sum - cnt[c];
  }
}

// The two canonical induction sweeps: L-types left-to-right from bucket
// heads, then S-types right-to-left from bucket tails.  These are the two
// hottest loops of the whole build; each iteration's only random access is
// st[j-1] (symbol and type in one load), prefetched PFD elements ahead.
void induce(const i32* st, i32* sa, const std::vector<i32>& cnt,
            std::vector<i32>& bkt, i32 n, i32 K) {
  bucket_bounds(cnt.data(), bkt.data(), K, false);
  for (i32 i = 0; i < n; ++i) {
    if (i + PFD < n) {
      i32 jp = sa[i + PFD];
      if (jp > 0) __builtin_prefetch(&st[jp - 1]);
    }
    i32 j = sa[i];
    if (j > 0) {
      i32 v = st[j - 1];
      if (!(v & TBIT)) sa[bkt[v]++] = j - 1;
    }
  }
  bucket_bounds(cnt.data(), bkt.data(), K, true);
  for (i32 i = n - 1; i >= 0; --i) {
    if (i - PFD >= 0) {
      i32 jp = sa[i - PFD];
      if (jp > 0) __builtin_prefetch(&st[jp - 1]);
    }
    i32 j = sa[i];
    if (j > 0) {
      i32 v = st[j - 1];
      if (v & TBIT) sa[--bkt[v & SMASK]] = j - 1;
    }
  }
}

// SA-IS over an integer string st[0..n) with values in [0, K) whose last
// symbol is a unique smallest sentinel.  st is MUTATED (type bits folded in).
// lms_buf must hold at least n - (position of first LMS use)… callers pass a
// buffer of n+2 i32 shared across the recursion (level offsets sum < n).
void sais_rec(i32* st, i32* sa, i32 n, i32 K, i32* lms_buf) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }

  // Type pass (right-to-left), folding the S bit into st in place.
  st[n - 1] |= TBIT;
  for (i32 i = n - 2; i >= 0; --i) {
    i32 a = st[i], b = st[i + 1];
    if (a < (b & SMASK) || (a == (b & SMASK) && (b & TBIT))) st[i] = a | TBIT;
  }

  std::vector<i32> cnt(K), bkt(K);
  std::fill(cnt.begin(), cnt.end(), 0);
  for (i32 i = 0; i < n; ++i) cnt[st[i] & SMASK]++;

  // Stage 1: seed with LMS positions in text order, induce once to obtain
  // LMS substrings in sorted order.
  i32* lms = lms_buf;
  i32 m = 0;
  for (i32 i = 1; i < n; ++i)
    if ((st[i] & TBIT) && !(st[i - 1] & TBIT)) lms[m++] = i;
  std::fill(sa, sa + n, -1);
  bucket_bounds(cnt.data(), bkt.data(), K, true);
  for (i32 i = m - 1; i >= 0; --i) sa[--bkt[st[lms[i]] & SMASK]] = lms[i];
  induce(st, sa, cnt, bkt, n, K);

  // Compact the sorted LMS positions to the front.
  i32 q = 0;
  for (i32 i = 0; i < n; ++i) {
    if (i + PFD < n) {
      i32 pp = sa[i + PFD];
      if (pp > 0) __builtin_prefetch(&st[pp - 1]);
    }
    i32 p = sa[i];
    if (p > 0 && (st[p] & TBIT) && !(st[p - 1] & TBIT)) sa[q++] = p;
  }

  // Stage 2: name LMS substrings (equal substrings share a name); names are
  // parked at sa[m + pos/2], valid because LMS positions are >= 2 apart.
  std::fill(sa + m, sa + n, -1);
  i32 name = 0, prev = -1;
  for (i32 i = 0; i < m; ++i) {
    if (i + 8 < m) __builtin_prefetch(&st[sa[i + 8]]);
    i32 pos = sa[i];
    bool differs = prev < 0;
    if (!differs) {
      for (i32 d = 0;; ++d) {
        bool lms_a = prev + d > 0 && (st[prev + d] & TBIT) &&
                     !(st[prev + d - 1] & TBIT);
        bool lms_b = pos + d > 0 && (st[pos + d] & TBIT) &&
                     !(st[pos + d - 1] & TBIT);
        if (d > 0 && (lms_a || lms_b)) {
          differs = !(lms_a && lms_b);
          break;
        }
        if ((st[prev + d] & SMASK) != (st[pos + d] & SMASK)) {
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
    // Ties remain: recurse on the reduced string of LMS names, in place.
    // Compact the parked names to the tail of sa with a descending scan and
    // descending writes (the write cursor stays >= the scan cursor, so no
    // unscanned entry is clobbered); s1 = sa[n-m..n), sa1 = sa[0..m).
    i32 w = n;
    for (i32 i = n - 1; i >= m; --i)
      if (sa[i] >= 0) sa[--w] = sa[i];
    sais_rec(sa + n - m, sa, m, name, lms_buf + m);
    for (i32 i = 0; i < m; ++i) sa[i] = lms[sa[i]];
  }
  // (name == m: sa[0..m) is already the sorted LMS suffix order.)

  // Stage 3: scatter sorted LMS suffixes to bucket tails, final induction.
  // lms_buf doubles as the sorted-LMS staging area (text-order LMS positions
  // are no longer needed).
  i32* sorted_lms = lms_buf;
  for (i32 i = 0; i < m; ++i) sorted_lms[i] = sa[i];
  std::fill(sa, sa + n, -1);
  bucket_bounds(cnt.data(), bkt.data(), K, true);
  for (i32 i = m - 1; i >= 0; --i) {
    i32 p = sorted_lms[i];
    sa[--bkt[st[p] & SMASK]] = p;
  }
  induce(st, sa, cnt, bkt, n, K);
}

}  // namespace

extern "C" {

// Suffix array of a byte string; returns 0 on success.  sa_out must hold n
// int32 slots.  Convention: prefix-before-extension (see header comment).
i32 tpuss_build_sa_u8(const uint8_t* data, i32 n, i32* sa_out) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  std::vector<i32> st(static_cast<size_t>(n) + 1);
  for (i32 i = 0; i < n; ++i) st[i] = static_cast<i32>(data[i]) + 1;
  st[n] = 0;
  std::vector<i32> sa(static_cast<size_t>(n) + 1);
  std::vector<i32> lms(static_cast<size_t>(n) + 2);
  sais_rec(st.data(), sa.data(), n + 1, 258, lms.data());
  // sa[0] is the sentinel position n; the rest is the text's SA.
  std::memcpy(sa_out, sa.data() + 1, static_cast<size_t>(n) * sizeof(i32));
  return 0;
}

// Suffix array of an int32 string with values in [0, k) — the analogue of
// the reference kernel's integer-alphabet entry point (libsais_int,
// reference src/libsais/libsais.c:6612-6625).  Returns 0 on success.
i32 tpuss_build_sa_i32(const i32* data, i32 n, i32 k, i32* sa_out) {
  if (n < 0 || k <= 0 || k > 0x3FFFFFFE) return -1;
  if (n == 0) return 0;
  std::vector<i32> st(static_cast<size_t>(n) + 1);
  for (i32 i = 0; i < n; ++i) {
    if (data[i] < 0 || data[i] >= k) return -2;
    st[i] = data[i] + 1;
  }
  st[n] = 0;
  std::vector<i32> sa(static_cast<size_t>(n) + 1);
  std::vector<i32> lms(static_cast<size_t>(n) + 2);
  sais_rec(st.data(), sa.data(), n + 1, k + 1, lms.data());
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
