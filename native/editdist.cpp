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

// ---------------------------------------------------------------------------
// Balanced linear assignment (auction algorithm).
//
// Host-side equivalent of fairseq's libbase CUDA/torch extension
// (`fairseq/clib/libbase/balanced_assignment.cpp`, the Bertsekas auction
// algorithm specialised to k jobs per worker) used by BASE-layer MoE
// routing. Re-implemented in plain C++ over row-major float scores — the
// TPU framework calls it on host-side routing decisions; the expert
// compute itself rides the device mesh.
//
// scores: [num_jobs, num_workers] row-major. num_workers must divide
// num_jobs. out: int64[num_jobs]; out[w*k .. w*k+k-1] = jobs assigned to
// worker w (k = num_jobs / num_workers). Returns 0 on success.

extern "C" {

int64_t balanced_assignment(const float* scores, int64_t num_jobs,
                            int64_t num_workers, int64_t* out) {
  if (num_workers <= 0 || num_jobs <= 0 || num_jobs % num_workers) return -1;
  const int64_t k = num_jobs / num_workers;
  const int max_iterations = 100;

  // value[w][j] = score[j][w] - cost[j]  (worker-major working copy)
  std::vector<float> base(num_workers * num_jobs);
  float lo = scores[0], hi = scores[0];
  for (int64_t j = 0; j < num_jobs; ++j)
    for (int64_t w = 0; w < num_workers; ++w) {
      float s = scores[j * num_workers + w];
      base[w * num_jobs + j] = s;
      lo = std::min(lo, s);
      hi = std::max(hi, s);
    }
  const float eps = std::max((hi - lo) / 50.0f, 1e-4f);
  const float max_value = hi;

  std::vector<float> value(base);
  std::vector<float> cost(num_jobs, 0.0f);
  std::vector<float> bids(num_workers * num_jobs);
  std::vector<int64_t> top_index(num_workers * (k + 1));
  std::vector<float> top_values(num_workers * (k + 1));
  std::vector<int64_t> retained;  // flat (w * num_jobs + j) winners last round
  std::vector<float> high_bids(num_jobs);
  std::vector<int64_t> high_bidders(num_jobs);
  std::vector<int64_t> order(num_jobs);

  int counter = 0;
  while (true) {
    std::fill(bids.begin(), bids.end(), 0.0f);
    // top-(k+1) per worker, descending, ties by lower index (torch topk order)
    for (int64_t w = 0; w < num_workers; ++w) {
      const float* row = value.data() + w * num_jobs;
      for (int64_t j = 0; j < num_jobs; ++j) order[j] = j;
      std::partial_sort(order.begin(), order.begin() + k + 1, order.end(),
                        [row](int64_t a, int64_t b) {
                          if (row[a] != row[b]) return row[a] > row[b];
                          return a < b;
                        });
      for (int64_t t = 0; t <= k; ++t) {
        top_index[w * (k + 1) + t] = order[t];
        top_values[w * (k + 1) + t] = row[order[t]];
      }
      const float kth = top_values[w * (k + 1) + k];
      for (int64_t t = 0; t < k; ++t)
        bids[w * num_jobs + order[t]] =
            top_values[w * (k + 1) + t] - kth + eps;
    }
    if (counter > 0 && counter < max_iterations)
      for (int64_t idx : retained) bids[idx] = eps;  // minimal retain bid

    bool all_bid = true;
    for (int64_t j = 0; j < num_jobs; ++j) {
      float hb = bids[j];
      int64_t who = 0;
      for (int64_t w = 1; w < num_workers; ++w)
        if (bids[w * num_jobs + j] > hb) { hb = bids[w * num_jobs + j]; who = w; }
      high_bids[j] = hb;
      high_bidders[j] = who;
      if (!(hb > 0.0f)) all_bid = false;
    }
    if (all_bid) break;

    retained.clear();
    for (int64_t j = 0; j < num_jobs; ++j) cost[j] += high_bids[j];
    for (int64_t w = 0; w < num_workers; ++w)
      for (int64_t j = 0; j < num_jobs; ++j)
        value[w * num_jobs + j] = base[w * num_jobs + j] - cost[j];
    for (int64_t j = 0; j < num_jobs; ++j) {
      if (!(high_bids[j] > 0.0f)) continue;
      const int64_t flat = high_bidders[j] * num_jobs + j;
      retained.push_back(flat);
      value[flat] = (counter < max_iterations) ? max_value : base[flat];
    }
    ++counter;
  }

  for (int64_t w = 0; w < num_workers; ++w)
    for (int64_t t = 0; t < k; ++t)
      out[w * k + t] = top_index[w * (k + 1) + t];
  return 0;
}

// ---------------------------------------------------------------------------
// Token-block slicing (fairseq `data/token_block_utils_fast.pyx` semantics):
// chop a corpus of per-sentence sizes into contiguous token blocks.
//
// mode: 0="none" (fixed block_size windows over the concatenated stream),
//       1="complete" (whole sentences, greedy-pack up to block_size),
//       2="complete_doc" (like complete, but never cross a document
//         separator sentence of size document_sep_len; drop size<=1 blocks),
//       3="eos" (one block per sentence).
// out_slices: caller-allocated int64[2 * max_blocks] (max_blocks = n for
// modes 1-3; ceil(total/block_size) for mode 0), filled with (start, end)
// token offsets. Returns the number of blocks, or -1 on bad mode.

int64_t token_block_slices(const int64_t* sizes, int64_t n, int64_t mode,
                           int64_t block_size, int64_t document_sep_len,
                           int64_t* out_slices) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) total += sizes[i];
  int64_t m = 0;
  if (mode == 0) {
    const int64_t length = (total + block_size - 1) / block_size;
    for (int64_t i = 0; i < length; ++i) {
      const int64_t start = i * block_size;
      out_slices[2 * i] = start;
      out_slices[2 * i + 1] = std::min(start + block_size, total);
    }
    m = length;
  } else if (mode == 1 || mode == 2) {
    int64_t tok = 0, sz = 0, cur = 0;
    while (sz < n) {
      const bool fits = cur + sizes[sz] <= block_size || cur == 0;
      const bool is_sep = (mode == 2) && sizes[sz] == document_sep_len;
      if (fits && !is_sep) {
        cur += sizes[sz];
        ++sz;
      } else {
        if (mode == 1 ? cur > 0 : cur > 1) {
          out_slices[2 * m] = tok;
          out_slices[2 * m + 1] = tok + cur;
          ++m;
        }
        tok += cur;
        cur = 0;
        if (is_sep) {
          tok += sizes[sz];
          ++sz;
        }
      }
    }
    if (mode == 1 ? cur > 0 : cur > 1) {
      out_slices[2 * m] = tok;
      out_slices[2 * m + 1] = tok + cur;
      ++m;
    }
  } else if (mode == 3) {
    int64_t tok = 0;
    for (int64_t i = 0; i < n; ++i) {
      out_slices[2 * i] = tok;
      tok += sizes[i];
      out_slices[2 * i + 1] = tok;
    }
    m = n;
  } else {
    return -1;
  }
  return m;
}

// Map each (start, end) token slice back to dataset sentence coordinates:
// out[3*i] = first sentence index, out[3*i+1] = offset within it,
// out[3*i+2] = last sentence index (inclusive). Mirrors
// `_get_block_to_dataset_index_fast` (token_block_utils_fast.pyx).

void block_to_dataset_index(const int64_t* sizes, int64_t n,
                            const int64_t* slices, int64_t nslices,
                            int64_t* out) {
  (void)n;
  int64_t ds = 0, ds_start = 0;  // monotone cursor (slices are sorted)
  for (int64_t i = 0; i < nslices; ++i) {
    const int64_t s = slices[2 * i], e = slices[2 * i + 1];
    while (ds_start + sizes[ds] <= s) ds_start += sizes[ds++];
    out[3 * i] = ds;
    out[3 * i + 1] = s - ds_start;
    int64_t ds2 = ds, ds2_start = ds_start;
    const int64_t last = e > s ? e - 1 : s;
    while (ds2_start + sizes[ds2] <= last) ds2_start += sizes[ds2++];
    out[3 * i + 2] = ds2;
  }
}

}  // extern "C"
