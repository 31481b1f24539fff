// Edit-distance + batch-packing native library for omni-avsr-tpu.
//
// Host-side equivalents of the reference's native scoring/batching layers
// (fairseq libnat `clib/libnat/edit_dist.cpp` and the Cython
// `data_utils_fast.pyx` bucketing) rebuilt for this framework's needs:
// WER is the primary metric (word-level Levenshtein), and the batcher packs
// frame budgets per bucket. Exposed via a plain C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libomniavsr.so editdist.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein distance between two int32 id sequences.
int64_t edit_distance_ids(const int32_t* a, int64_t na,
                          const int32_t* b, int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const int32_t ai = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j) {
      int64_t sub = prev[j - 1] + (ai != b[j - 1] ? 1 : 0);
      int64_t del = prev[j] + 1;
      int64_t ins = cur[j - 1] + 1;
      cur[j] = std::min(sub, std::min(del, ins));
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Batched edit distance: flattened ref/hyp id arrays with offsets.
// out[i] = edit_distance(refs[i], hyps[i]).
void edit_distance_batch(const int32_t* refs, const int64_t* ref_offsets,
                         const int32_t* hyps, const int64_t* hyp_offsets,
                         int64_t n, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = edit_distance_ids(refs + ref_offsets[i],
                               ref_offsets[i + 1] - ref_offsets[i],
                               hyps + hyp_offsets[i],
                               hyp_offsets[i + 1] - hyp_offsets[i]);
  }
}

// Frame-budget bucketing (reference `data_module.py:82-144` semantics):
//   - bucketize lengths into num_buckets linear buckets
//   - order: by length desc (shuffle handled by caller via `order`)
//   - stable-sort by bucket, greedy-pack until max_frames / batch_size
// Inputs:
//   lengths[n], order[n] (pre-permuted visit order), max_frames,
//   num_buckets, batch_size (0 = unlimited)
// Outputs (caller-allocated, size n + 1 / n):
//   batch_starts: offsets into batch_members; returns number of batches.
int64_t bucket_pack(const int64_t* lengths, const int64_t* order, int64_t n,
                    int64_t max_frames, int64_t num_buckets,
                    int64_t batch_size, int64_t* batch_starts,
                    int64_t* batch_members) {
  if (n == 0) return 0;
  int64_t lo = lengths[0], hi = lengths[0];
  for (int64_t i = 1; i < n; ++i) {
    lo = std::min(lo, lengths[i]);
    hi = std::max(hi, lengths[i]);
  }
  // torch.linspace(lo, hi, num_buckets) + torch.bucketize(right=False)
  std::vector<double> bounds(num_buckets);
  if (num_buckets == 1) {
    bounds[0] = (double)lo;
  } else {
    for (int64_t i = 0; i < num_buckets; ++i)
      bounds[i] = lo + (double)(hi - lo) * i / (num_buckets - 1);
  }
  std::vector<std::pair<int64_t, int64_t>> items(n);  // (bucket, idx)
  for (int64_t k = 0; k < n; ++k) {
    int64_t idx = order[k];
    double len = (double)lengths[idx];
    int64_t b = std::lower_bound(bounds.begin(), bounds.end(), len) - bounds.begin();
    items[k] = {b, idx};
  }
  std::stable_sort(items.begin(), items.end(),
                   [](const auto& x, const auto& y) { return x.first < y.first; });

  int64_t n_batches = 0, members = 0, cur_frames = 0, cur_count = 0;
  batch_starts[0] = 0;
  for (int64_t k = 0; k < n; ++k) {
    int64_t idx = items[k].second;
    int64_t len = lengths[idx];
    bool overflow = (cur_frames + len > max_frames) ||
                    (batch_size > 0 && cur_count == batch_size);
    if (overflow && cur_count > 0) {
      batch_starts[++n_batches] = members;
      cur_frames = 0;
      cur_count = 0;
    }
    batch_members[members++] = idx;
    cur_frames += len;
    cur_count += 1;
  }
  if (cur_count > 0) batch_starts[++n_batches] = members;
  return n_batches;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Corpus BLEU (fairseq libbleu equivalent, `fairseq/clib/libbleu/libbleu.cpp`
// behaviour spec): clipped n-gram match counting, orders 1..4. Stats are
// accumulated across sentence pairs; the brevity penalty + geometric mean
// live in Python (utils/metrics.py::BleuScorer).
// ---------------------------------------------------------------------------

#include <unordered_map>
#include <string>

namespace {

// pack an n-gram of int32 ids into a byte-string key
inline std::string ngram_key(const int32_t* ids, int64_t n) {
  return std::string(reinterpret_cast<const char*>(ids),
                     static_cast<size_t>(n) * sizeof(int32_t));
}

}  // namespace

extern "C" {

// Accumulate BLEU stats for one (ref, hyp) pair into out[10]:
//   out[0] += len(ref), out[1] += len(hyp),
//   out[2 + 2*(k-1)] += clipped k-gram matches, out[3 + 2*(k-1)] += k-gram
//   count in hyp, for k = 1..4.
void bleu_add(const int32_t* ref, int64_t nref,
              const int32_t* hyp, int64_t nhyp, int64_t* out) {
  out[0] += nref;
  out[1] += nhyp;
  for (int64_t k = 1; k <= 4; ++k) {
    int64_t n_hyp_grams = nhyp - k + 1;
    if (n_hyp_grams <= 0) continue;
    std::unordered_map<std::string, int64_t> ref_counts;
    for (int64_t i = 0; i + k <= nref; ++i) ref_counts[ngram_key(ref + i, k)]++;
    int64_t match = 0;
    for (int64_t i = 0; i + k <= nhyp; ++i) {
      auto it = ref_counts.find(ngram_key(hyp + i, k));
      if (it != ref_counts.end() && it->second > 0) {
        --it->second;
        ++match;
      }
    }
    out[2 + 2 * (k - 1)] += match;
    out[3 + 2 * (k - 1)] += n_hyp_grams;
  }
}

}  // extern "C"
