// Native CPU baseline: a faithful C++ re-implementation of the reference's
// two hot paths, used ONLY to measure an honest Rust-class "reference" number
// for BENCH vs_baseline (Rust/cargo is not in this image; see BASELINE.md).
//
//  * Query engine: RleBWT::constrain_range semantics — sampled FM-index
//    seeded at run boundaries + linear RLE byte decode within a bin
//    (ref: src/rle_bwt.rs:202-287, index construction :387-467).
//  * Builder: DynamicBWT sorted insertion over an order-statistics B+ tree
//    of RLE run blocks (ref: src/dynamic_bwt.rs:305-381 over
//    src/rle_bplus_tree.rs:210-248 and src/run_block_av_flat.rs:147-213),
//    including the adaptive short-circuit probe (dynamic_bwt.rs:311-348).
//
// Single-threaded by default, matching the reference ("is not parallelized",
// README.md:42); batched queries optionally fan out over OpenMP threads to
// give the strongest plausible CPU contender a number too.
//
// C ABI, consumed from Python via ctypes.

#include <cstdint>
#include <cstring>
#include <vector>
#include <array>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int VC_LEN = 6;
constexpr int LETTER_MASK = 0x07;
constexpr int NUMBER_BITS = 5;

// ---------------------------------------------------------------------------
// Query engine (ref: src/rle_bwt.rs)
// ---------------------------------------------------------------------------

struct RleIndex {
  const uint8_t* rle = nullptr;
  int64_t n_bytes = 0;
  int64_t total = 0;
  int bin_power = 8;
  int64_t start_index[VC_LEN] = {0};
  // fm_index[bin][sym]: occurrences of sym strictly before the first run
  // whose span crosses bin boundary bin*2^bin_power; ref_index[bin]: byte
  // offset of that run's first byte (ref: src/rle_bwt.rs:387-467).
  std::vector<std::array<int64_t, VC_LEN>> fm_index;
  std::vector<int64_t> ref_index;
};

void build_index(RleIndex* ix) {
  const uint8_t* rle = ix->rle;
  const int64_t n = ix->n_bytes;
  const int64_t bin_size = int64_t(1) << ix->bin_power;

  // first pass: totals (ref: calculate_totals, src/rle_bwt.rs:352-384)
  int64_t counts[VC_LEN] = {0};
  {
    int64_t i = 0;
    while (i < n) {
      int sym = rle[i] & LETTER_MASK;
      int64_t cnt = 0, mult = 1;
      while (i < n && (rle[i] & LETTER_MASK) == sym) {
        cnt += int64_t(rle[i] >> 3) * mult;
        mult <<= NUMBER_BITS;
        ++i;
      }
      counts[sym] += cnt;
    }
  }
  int64_t total = 0;
  for (int s = 0; s < VC_LEN; ++s) {
    ix->start_index[s] = total;
    total += counts[s];
  }
  ix->total = total;

  // second pass: sampled FM-index (ref: construct_fmindex, :387-467)
  const int64_t n_bins = total ? (total + bin_size - 1) / bin_size + 1 : 1;
  ix->fm_index.assign(n_bins, {});
  ix->ref_index.assign(n_bins, 0);
  std::array<int64_t, VC_LEN> occ = {};
  int64_t pos = 0, bin = 0, i = 0;
  while (i < n) {
    int64_t run_start_byte = i;
    int sym = rle[i] & LETTER_MASK;
    int64_t cnt = 0, mult = 1;
    while (i < n && (rle[i] & LETTER_MASK) == sym) {
      cnt += int64_t(rle[i] >> 3) * mult;
      mult <<= NUMBER_BITS;
      ++i;
    }
    // this run covers [pos, pos+cnt): it is the seed run for every bin
    // boundary it crosses
    while (bin < n_bins - 1 && pos + cnt > bin * bin_size) {
      ix->fm_index[bin] = occ;
      ix->ref_index[bin] = run_start_byte;
      ++bin;
    }
    occ[sym] += cnt;
    pos += cnt;
  }
  for (; bin < n_bins; ++bin) {  // final entry: end-of-BWT totals (:453-457)
    ix->fm_index[bin] = occ;
    ix->ref_index[bin] = n;
  }
}

// Linear RLE scan state pinned at a run START (the reference's decode loop,
// src/rle_bwt.rs:221-244): `occ` holds per-symbol occurrences strictly
// before `pos`; `byte_idx` points at the run starting at `pos`.
struct ScanState {
  int64_t pos;
  int64_t byte_idx;
  std::array<int64_t, VC_LEN> occ;
};

inline void seed(const RleIndex& ix, int64_t target, ScanState* s) {
  int64_t bin = target >> ix.bin_power;
  s->occ = ix.fm_index[bin];
  s->byte_idx = ix.ref_index[bin];
  s->pos = 0;
  for (int c = 0; c < VC_LEN; ++c) s->pos += s->occ[c];
}

// Advance run-by-run until the run containing `target`; return rank of `sym`
// at `target`. State stays at that run's start so the h-end of the same bin
// can continue the scan (the reference's bin-reuse shortcut, :246-249).
inline int64_t rank_at(const RleIndex& ix, ScanState* s, int64_t target,
                       int sym) {
  const uint8_t* rle = ix.rle;
  const int64_t n = ix.n_bytes;
  for (;;) {
    if (s->byte_idx >= n || s->pos >= target) {
      return s->occ[sym];
    }
    int rs = rle[s->byte_idx] & LETTER_MASK;
    int64_t cnt = 0, mult = 1, j = s->byte_idx;
    while (j < n && (rle[j] & LETTER_MASK) == rs) {
      cnt += int64_t(rle[j] >> 3) * mult;
      mult <<= NUMBER_BITS;
      ++j;
    }
    if (s->pos + cnt >= target) {
      // target inside (or at the end of) this run — report, don't consume
      return s->occ[sym] + (rs == sym ? target - s->pos : 0);
    }
    s->occ[rs] += cnt;
    s->pos += cnt;
    s->byte_idx = j;
  }
}

// One backward-search step on [l, h) for symbol sym
// (ref: src/rle_bwt.rs:202-287).
inline void constrain(const RleIndex& ix, int sym, int64_t* l, int64_t* h) {
  ScanState s;
  seed(ix, *l, &s);
  int64_t rank_l = rank_at(ix, &s, *l, sym);
  int64_t rank_h;
  if ((*h >> ix.bin_power) == (*l >> ix.bin_power)) {
    rank_h = rank_at(ix, &s, *h, sym);  // continue the same scan
  } else {
    ScanState s2;
    seed(ix, *h, &s2);
    rank_h = rank_at(ix, &s2, *h, sym);
  }
  *l = ix.start_index[sym] + rank_l;
  *h = ix.start_index[sym] + rank_h;
}

inline int64_t count_kmer(const RleIndex& ix, const uint8_t* kmer, int k) {
  // ref: src/msbwt_core.rs:124-161 — reverse iteration, empty-range early exit
  int64_t l = 0, h = ix.total;
  for (int t = k - 1; t >= 0; --t) {
    if (l == h) return 0;
    constrain(ix, kmer[t], &l, &h);
  }
  return h - l;
}

// ---------------------------------------------------------------------------
// Builder: order-statistics B+ tree of RLE run blocks (ref: src/rle_bplus_tree.rs,
// src/run_block_av_flat.rs) driving sorted insertion (ref: src/dynamic_bwt.rs).
// ---------------------------------------------------------------------------

constexpr int MAX_RUNS = 254;     // ref: run_block_av_flat.rs:6
constexpr int MAX_CHILDREN = 64;  // ref: rle_bplus_tree.rs:8

// A run: symbol in low 3 bits, count above (u32 — the reference's 13-bit
// overflow-splitting is a storage detail, not an algorithmic one).
struct Block {
  std::vector<uint32_t> runs;
  int64_t total = 0;
  int64_t counts[VC_LEN] = {0};
  Block() { runs.reserve(MAX_RUNS + 2); }
};

struct Node {
  bool leaf = true;
  // child ids (block ids when leaf, node ids otherwise) + cached aggregates
  std::vector<int32_t> children;
  std::vector<int64_t> child_total;
  std::vector<std::array<int64_t, VC_LEN>> child_counts;
};

class BPlusTree {
 public:
  BPlusTree() {
    blocks_.emplace_back();
    Node root;
    root.leaf = true;
    root.children = {0};
    root.child_total = {0};
    root.child_counts.push_back({});
    nodes_.push_back(std::move(root));
    root_ = 0;
  }

  int64_t total_size() const { return size_; }

  // rank query: occurrences of sym in [0, pos)  (ref: rle_bplus_tree.rs:152-188)
  int64_t count(int64_t pos, int sym) const {
    int64_t acc = 0;
    int nid = root_;
    for (;;) {
      const Node& nd = nodes_[nid];
      size_t i = 0;
      while (i + 1 < nd.children.size() && pos > nd.child_total[i]) {
        pos -= nd.child_total[i];
        acc += nd.child_counts[i][sym];
        ++i;
      }
      if (nd.leaf) {
        return acc + block_count(blocks_[nd.children[i]], pos, sym);
      }
      nid = nd.children[i];
    }
  }

  // insert sym at pos; returns occurrences of sym in [0, pos) before insert
  // (ref: rle_bplus_tree.rs:210-248)
  int64_t insert_and_count(int64_t pos, int sym) {
    ++size_;
    int64_t r = insert_rec(root_, pos, sym);
    maybe_split_root();
    return r;
  }

  // append the decoded BWT into out (in-order leaf walk)
  void to_vec(uint8_t* out) const {
    int64_t w = 0;
    emit(root_, out, &w);
  }

 private:
  static int64_t block_count(const Block& b, int64_t pos, int sym) {
    int64_t acc = 0, p = 0;
    for (uint32_t r : b.runs) {
      int rs = r & LETTER_MASK;
      int64_t cnt = r >> 3;
      if (p + cnt >= pos) {
        if (rs == sym) acc += pos - p;
        return acc;
      }
      if (rs == sym) acc += cnt;
      p += cnt;
    }
    return acc;
  }

  // returns rank; sets pending_* when the child split and the parent must
  // absorb a new sibling
  int64_t insert_rec(int nid, int64_t pos, int sym) {
    Node& nd = nodes_[nid];
    size_t i = 0;
    int64_t acc = 0;
    while (i + 1 < nd.children.size() && pos > nd.child_total[i]) {
      pos -= nd.child_total[i];
      acc += nd.child_counts[i][sym];
      ++i;
    }
    nd.child_total[i] += 1;
    nd.child_counts[i][sym] += 1;
    int64_t r;
    if (nd.leaf) {
      r = acc + block_insert(nd.children[i], pos, sym);
      if (blocks_[nd.children[i]].runs.size() > MAX_RUNS) split_block(nid, i);
    } else {
      r = acc + insert_rec(nd.children[i], pos, sym);
      Node& nd2 = nodes_[nid];  // insert_rec may reallocate nodes_
      if (nodes_[nd2.children[i]].children.size() > MAX_CHILDREN) {
        split_node(nid, i);
      }
    }
    return r;
  }

  // insert into a block; returns rank of sym before pos within the block
  // (the four cases of run_block_av_flat.rs:147-213)
  int64_t block_insert(int bid, int64_t pos, int sym) {
    Block& b = blocks_[bid];
    b.total += 1;
    b.counts[sym] += 1;
    int64_t acc = 0, p = 0;
    for (size_t k = 0; k < b.runs.size(); ++k) {
      int rs = b.runs[k] & LETTER_MASK;
      int64_t cnt = b.runs[k] >> 3;
      if (p + cnt >= pos) {
        int64_t off = pos - p;  // 0..cnt
        if (rs == sym) {  // extend in place
          b.runs[k] += uint32_t(1) << 3;
          return acc + off;
        }
        if (off == 0) {
          // boundary: try the previous run
          if (k > 0 && int(b.runs[k - 1] & LETTER_MASK) == sym) {
            b.runs[k - 1] += uint32_t(1) << 3;
            return acc;
          }
          b.runs.insert(b.runs.begin() + k, (uint32_t(1) << 3) | sym);
          return acc;
        }
        if (off == cnt) {
          // boundary at the run's END: extend the next run if it matches,
          // else insert a single run — never a zero-count remainder
          if (k + 1 < b.runs.size() &&
              int(b.runs[k + 1] & LETTER_MASK) == sym) {
            b.runs[k + 1] += uint32_t(1) << 3;
            return acc;
          }
          b.runs.insert(b.runs.begin() + k + 1, (uint32_t(1) << 3) | sym);
          return acc;
        }
        // split the run: [off] [new sym] [cnt-off]
        b.runs[k] = (uint32_t(off) << 3) | rs;
        b.runs.insert(b.runs.begin() + k + 1, (uint32_t(1) << 3) | sym);
        b.runs.insert(b.runs.begin() + k + 2,
                      (uint32_t(cnt - off) << 3) | rs);
        return acc + (rs == sym ? off : 0);
      }
      if (rs == sym) acc += cnt;
      p += cnt;
    }
    // append at the very end
    if (!b.runs.empty() && int(b.runs.back() & LETTER_MASK) == sym) {
      b.runs.back() += uint32_t(1) << 3;
    } else {
      b.runs.push_back((uint32_t(1) << 3) | sym);
    }
    return acc;
  }

  void block_aggregate(int bid, int64_t* total,
                       std::array<int64_t, VC_LEN>* counts) {
    const Block& b = blocks_[bid];
    *total = b.total;
    for (int s = 0; s < VC_LEN; ++s) (*counts)[s] = b.counts[s];
  }

  void split_block(int nid, size_t i) {
    // split at the run midpoint (ref: run_block_av_flat.rs:230-262)
    int bid = nodes_[nid].children[i];
    Block& b = blocks_[bid];
    size_t mid = b.runs.size() / 2;
    Block right;
    right.runs.assign(b.runs.begin() + mid, b.runs.end());
    b.runs.resize(mid);
    int64_t t = 0;
    int64_t c[VC_LEN] = {0};
    for (uint32_t r : right.runs) {
      t += r >> 3;
      c[r & LETTER_MASK] += r >> 3;
    }
    right.total = t;
    b.total -= t;
    for (int s = 0; s < VC_LEN; ++s) {
      right.counts[s] = c[s];
      b.counts[s] -= c[s];
    }
    int new_bid = int(blocks_.size());
    blocks_.push_back(std::move(right));
    Node& nd = nodes_[nid];
    nd.children.insert(nd.children.begin() + i + 1, new_bid);
    int64_t rt;
    std::array<int64_t, VC_LEN> rc;
    block_aggregate(new_bid, &rt, &rc);
    nd.child_total[i] -= rt;
    for (int s = 0; s < VC_LEN; ++s) nd.child_counts[i][s] -= rc[s];
    nd.child_total.insert(nd.child_total.begin() + i + 1, rt);
    nd.child_counts.insert(nd.child_counts.begin() + i + 1, rc);
  }

  void split_node(int parent_id, size_t i) {
    // split child node at the midpoint (ref: rle_bplus_tree.rs:281-394)
    int cid = nodes_[parent_id].children[i];
    size_t mid = nodes_[cid].children.size() / 2;
    Node right;
    right.leaf = nodes_[cid].leaf;
    Node& c = nodes_[cid];
    right.children.assign(c.children.begin() + mid, c.children.end());
    right.child_total.assign(c.child_total.begin() + mid, c.child_total.end());
    right.child_counts.assign(c.child_counts.begin() + mid,
                              c.child_counts.end());
    c.children.resize(mid);
    c.child_total.resize(mid);
    c.child_counts.resize(mid);
    int64_t rt = 0;
    std::array<int64_t, VC_LEN> rc = {};
    for (size_t k = 0; k < right.children.size(); ++k) {
      rt += right.child_total[k];
      for (int s = 0; s < VC_LEN; ++s) rc[s] += right.child_counts[k][s];
    }
    int new_id = int(nodes_.size());
    nodes_.push_back(std::move(right));
    Node& p = nodes_[parent_id];
    p.children.insert(p.children.begin() + i + 1, new_id);
    p.child_total[i] -= rt;
    for (int s = 0; s < VC_LEN; ++s) p.child_counts[i][s] -= rc[s];
    p.child_total.insert(p.child_total.begin() + i + 1, rt);
    p.child_counts.insert(p.child_counts.begin() + i + 1, rc);
  }

  void maybe_split_root() {
    if (nodes_[root_].children.size() <= MAX_CHILDREN) return;
    // grow height (ref: rle_bplus_tree.rs:322-361)
    Node new_root;
    new_root.leaf = false;
    int64_t t = 0;
    std::array<int64_t, VC_LEN> c = {};
    const Node& old = nodes_[root_];
    for (size_t k = 0; k < old.children.size(); ++k) {
      t += old.child_total[k];
      for (int s = 0; s < VC_LEN; ++s) c[s] += old.child_counts[k][s];
    }
    new_root.children = {root_};
    new_root.child_total = {t};
    new_root.child_counts = {c};
    int new_id = int(nodes_.size());
    nodes_.push_back(std::move(new_root));
    size_t which = 0;  // split the (only) oversized child of the new root
    split_node(new_id, which);
    root_ = new_id;
  }

  void emit(int nid, uint8_t* out, int64_t* w) const {
    const Node& nd = nodes_[nid];
    for (size_t i = 0; i < nd.children.size(); ++i) {
      if (nd.leaf) {
        for (uint32_t r : blocks_[nd.children[i]].runs) {
          memset(out + *w, r & LETTER_MASK, r >> 3);
          *w += r >> 3;
        }
      } else {
        emit(nd.children[i], out, w);
      }
    }
  }

  std::vector<Node> nodes_;
  std::vector<Block> blocks_;
  int root_ = 0;
  int64_t size_ = 0;
};

// Sorted/chronological insertion facade — a verbatim re-expression of the
// reference's insert_string (ref: src/dynamic_bwt.rs:305-381), including the
// adaptive short-circuit probe with INITIAL_QUERY=10 and COST_FACTOR=1e-6
// (ref: src/dynamic_bwt.rs:17-19, probe logic :311-348).
class DynamicBwt {
 public:
  void insert_string(const uint8_t* s, int64_t len, bool sorted) {
    int64_t next_insert;
    if (sorted) {
      int64_t start_pos = 0;
      next_insert = tree_.total_size();
      int64_t query_len =
          int64_t(sort_query_len_) < len ? int64_t(sort_query_len_) : len;
      // short-circuit probe: backward search of the length-query_len PREFIX
      for (int64_t t = query_len - 1; t >= 0; --t) {
        int sym = s[t];
        start_pos = tree_.count(start_pos, sym) + start_index_[sym];
        next_insert = tree_.count(next_insert, sym) + start_index_[sym];
      }
      start_pos = tree_.count(start_pos, 0);
      next_insert = tree_.count(next_insert, 0);
      if (start_pos != next_insert) {
        int64_t original_ni = next_insert;
        // short circuit failed: full-string search from the probe result
        for (int64_t t = len - 1; t >= 0; --t) {
          int sym = s[t];
          next_insert = tree_.count(next_insert, sym) + start_index_[sym];
        }
        next_insert = tree_.count(next_insert, 0);
        if (original_ni == next_insert) {  // duplicate sequence
          sort_query_len_ -= 2.0 * kCostFactor * double(query_len);
        } else {  // full search refined the position
          sort_query_len_ += kCostFactor * double(len);
        }
      } else {
        sort_query_len_ -= 2.0 * kCostFactor;
      }
    } else {
      next_insert = string_count_;  // chronological (:350-351)
    }
    // walk S right-to-left: insert symbol, follow LF to the next insert
    // position (:353-374). NOTE the start_index bump covers the PREVIOUS
    // inserted symbol — the current symbol's bump lands next iteration.
    int prev = 0;
    for (int64_t t = len - 1; t >= 0; --t) {
      int sym = s[t];
      int64_t rank = tree_.insert_and_count(next_insert, sym);
      for (int i = prev + 1; i < VC_LEN; ++i) start_index_[i] += 1;
      next_insert = rank + start_index_[sym];
      prev = sym;
    }
    tree_.insert_and_count(next_insert, 0);  // the terminating '$'
    for (int i = prev + 1; i < VC_LEN; ++i) start_index_[i] += 1;
    ++string_count_;
  }

  int64_t total_size() const { return tree_.total_size(); }
  void to_vec(uint8_t* out) const { tree_.to_vec(out); }

 private:
  static constexpr double kCostFactor = 1e-6;  // ref: dynamic_bwt.rs:19
  BPlusTree tree_;
  int64_t start_index_[VC_LEN] = {0};
  int64_t string_count_ = 0;
  double sort_query_len_ = 10.0;  // INITIAL_QUERY, ref: dynamic_bwt.rs:17
};

}  // namespace

extern "C" {

// Sequential reference-shape build: concatenated int-encoded reads ->
// decoded BWT (caller buffer of size total_symbols + n_reads). Returns the
// BWT length.
int64_t msbwt_baseline_build(const uint8_t* seq, const int64_t* offsets,
                             int64_t n_reads, int sorted, uint8_t* out) {
  DynamicBwt bwt;
  for (int64_t r = 0; r < n_reads; ++r) {
    bwt.insert_string(seq + offsets[r], offsets[r + 1] - offsets[r],
                      sorted != 0);
  }
  bwt.to_vec(out);
  return bwt.total_size();
}

// Batched count_kmer over RLE bytes with the reference's query loop.
// kmers: [B, K] right-aligned; lengths: [B]. threads<=1 -> sequential
// (the reference-faithful configuration).
int msbwt_baseline_count_kmers(const uint8_t* rle, int64_t n_bytes,
                               int bin_power, const uint8_t* kmers,
                               const int32_t* lengths, int64_t B, int64_t K,
                               int64_t* out, int threads) {
  RleIndex ix;
  ix.rle = rle;
  ix.n_bytes = n_bytes;
  ix.bin_power = bin_power;
  build_index(&ix);
#if defined(_OPENMP)
  if (threads > 1) {
#pragma omp parallel for schedule(static) num_threads(threads)
    for (int64_t i = 0; i < B; ++i) {
      int len = lengths[i];
      out[i] = count_kmer(ix, kmers + i * K + (K - len), len);
    }
    return 0;
  }
#endif
  (void)threads;
  for (int64_t i = 0; i < B; ++i) {
    int len = lengths[i];
    out[i] = count_kmer(ix, kmers + i * K + (K - len), len);
  }
  return 0;
}

// Index-build-only timing hook (the load path, ref: standard_init).
int64_t msbwt_baseline_index_only(const uint8_t* rle, int64_t n_bytes,
                                  int bin_power) {
  RleIndex ix;
  ix.rle = rle;
  ix.n_bytes = n_bytes;
  ix.bin_power = bin_power;
  build_index(&ix);
  return ix.total;
}

}  // extern "C"
