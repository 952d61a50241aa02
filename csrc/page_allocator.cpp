// Paged KV-cache page allocator + block-table manager (C core, ctypes ABI).
//
// The host-side hot path of continuous batching: every scheduling tick
// allocates/frees pages and rebuilds the batched block-table array that the
// Pallas decode kernel consumes as scalar-prefetch input
// (vllm_flash_attn_tpu/kernels/paged_decode.py). The reference delegates this
// role to vLLM's C++ block manager above the library; here it is part of the
// framework. O(1) page alloc/free via a free-list stack; table gather is a
// straight memcpy per sequence.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Allocator {
  int32_t num_pages;
  int32_t max_seqs;
  int32_t max_pages_per_seq;
  std::vector<int32_t> free_stack;          // available physical pages
  std::vector<std::vector<int32_t>> seqs;   // per-slot page lists
  std::vector<int32_t> lengths;             // tokens per slot
  std::vector<uint8_t> used;                // slot occupancy
  // Reference counts enable PREFIX CACHING (vLLM automatic-prefix-caching
  // analog): a page may be owned by several sequences sharing a prompt
  // prefix, plus one pin held by the engine's prefix-cache table. A page
  // returns to the free list only when its count hits zero.
  std::vector<int32_t> refcount;
  int32_t page_size;
};

static void dec_ref(Allocator* a, int32_t p) {
  if (--a->refcount[p] <= 0) {
    a->refcount[p] = 0;
    a->free_stack.push_back(p);
  }
}

}  // namespace

extern "C" {

void* pa_create(int32_t num_pages, int32_t max_seqs, int32_t max_pages_per_seq,
                int32_t page_size) {
  auto* a = new Allocator();
  a->num_pages = num_pages;
  a->max_seqs = max_seqs;
  a->max_pages_per_seq = max_pages_per_seq;
  a->page_size = page_size;
  a->free_stack.reserve(num_pages);
  for (int32_t i = num_pages - 1; i >= 0; --i) a->free_stack.push_back(i);
  a->seqs.resize(max_seqs);
  a->lengths.assign(max_seqs, 0);
  a->used.assign(max_seqs, 0);
  a->refcount.assign(num_pages, 0);
  return a;
}

void pa_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t pa_num_free_pages(void* h) {
  return static_cast<int32_t>(static_cast<Allocator*>(h)->free_stack.size());
}

// Claim a sequence slot; returns slot id or -1 if all slots busy.
int32_t pa_alloc_seq(void* h) {
  auto* a = static_cast<Allocator*>(h);
  for (int32_t s = 0; s < a->max_seqs; ++s) {
    if (!a->used[s]) {
      a->used[s] = 1;
      a->lengths[s] = 0;
      a->seqs[s].clear();
      return s;
    }
  }
  return -1;
}

// Grow slot `s` by num_tokens; allocates pages as needed.
// Returns new length, -1 on pool OOM (preemption can recover), or -2 when the
// sequence would exceed max_pages_per_seq (preemption can NOT recover — the
// caller must finish/reject the sequence). State unchanged on failure.
int32_t pa_extend(void* h, int32_t s, int32_t num_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (s < 0 || s >= a->max_seqs || !a->used[s]) return -2;
  int64_t new_len = (int64_t)a->lengths[s] + num_tokens;
  int32_t need_pages =
      (int32_t)((new_len + a->page_size - 1) / a->page_size) -
      (int32_t)a->seqs[s].size();
  if ((int32_t)a->seqs[s].size() + need_pages > a->max_pages_per_seq) return -2;
  if (need_pages > (int32_t)a->free_stack.size()) return -1;
  for (int32_t i = 0; i < need_pages; ++i) {
    int32_t p = a->free_stack.back();
    a->free_stack.pop_back();
    a->refcount[p] = 1;
    a->seqs[s].push_back(p);
  }
  a->lengths[s] = (int32_t)new_len;
  return a->lengths[s];
}

// Shrink slot `s` by num_tokens, returning now-unused pages to the pool.
// Returns the new length (clamped at 0), or -2 for an invalid slot.
int32_t pa_shrink(void* h, int32_t s, int32_t num_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (s < 0 || s >= a->max_seqs || !a->used[s]) return -2;
  int32_t new_len = a->lengths[s] - num_tokens;
  if (new_len < 0) new_len = 0;
  int32_t keep_pages = (new_len + a->page_size - 1) / a->page_size;
  while ((int32_t)a->seqs[s].size() > keep_pages) {
    dec_ref(a, a->seqs[s].back());
    a->seqs[s].pop_back();
  }
  a->lengths[s] = new_len;
  return new_len;
}

void pa_free_seq(void* h, int32_t s) {
  auto* a = static_cast<Allocator*>(h);
  if (s < 0 || s >= a->max_seqs || !a->used[s]) return;
  for (int32_t p : a->seqs[s]) dec_ref(a, p);
  a->seqs[s].clear();
  a->lengths[s] = 0;
  a->used[s] = 0;
}

int32_t pa_seq_length(void* h, int32_t s) {
  auto* a = static_cast<Allocator*>(h);
  return (s >= 0 && s < a->max_seqs && a->used[s]) ? a->lengths[s] : -1;
}

// Write the block table of slot `s` (zero-padded) into out[max_pages_per_seq].
void pa_block_table(void* h, int32_t s, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::memset(out, 0, sizeof(int32_t) * a->max_pages_per_seq);
  if (s < 0 || s >= a->max_seqs || !a->used[s]) return;
  std::memcpy(out, a->seqs[s].data(), sizeof(int32_t) * a->seqs[s].size());
}

// Batched gather: tables for n slots -> out[n][max_pages_per_seq],
// lengths -> len_out[n]. Unused slots give zeros / length 0.
void pa_gather(void* h, const int32_t* slots, int32_t n, int32_t* out,
               int32_t* len_out) {
  auto* a = static_cast<Allocator*>(h);
  for (int32_t i = 0; i < n; ++i) {
    pa_block_table(h, slots[i], out + (int64_t)i * a->max_pages_per_seq);
    int32_t L = pa_seq_length(h, slots[i]);
    len_out[i] = L < 0 ? 0 : L;
  }
}

// --- prefix-caching support (vLLM automatic-prefix-caching analog) ------

// Attach `n_pages` EXISTING pages (a cached prompt prefix) to a fresh slot:
// each page's refcount is incremented and the slot's length becomes
// n_tokens (must cover exactly those pages). Returns the new length, or -2
// on an invalid slot / non-empty slot / bad page id / cap overflow.
int32_t pa_adopt(void* h, int32_t s, const int32_t* pages, int32_t n_pages,
                 int32_t n_tokens) {
  auto* a = static_cast<Allocator*>(h);
  if (s < 0 || s >= a->max_seqs || !a->used[s]) return -2;
  if (!a->seqs[s].empty() || a->lengths[s] != 0) return -2;
  if (n_pages > a->max_pages_per_seq) return -2;
  if (n_tokens > n_pages * a->page_size) return -2;
  for (int32_t i = 0; i < n_pages; ++i) {
    int32_t p = pages[i];
    if (p < 0 || p >= a->num_pages || a->refcount[p] <= 0) {
      for (int32_t j = 0; j < i; ++j) dec_ref(a, a->seqs[s][j]);
      a->seqs[s].clear();
      return -2;
    }
    a->refcount[p]++;
    a->seqs[s].push_back(p);
  }
  a->lengths[s] = n_tokens;
  return n_tokens;
}

// Pin a page on behalf of the prefix-cache table (one extra reference).
// Returns the new refcount, or -2 for a bad/unreferenced page (the cache
// may only pin pages that some live sequence currently owns).
int32_t pa_ref_page(void* h, int32_t p) {
  auto* a = static_cast<Allocator*>(h);
  if (p < 0 || p >= a->num_pages || a->refcount[p] <= 0) return -2;
  return ++a->refcount[p];
}

// Drop a prefix-cache pin; frees the page if no sequence references it.
// Returns the remaining refcount (0 = returned to the free list).
int32_t pa_unref_page(void* h, int32_t p) {
  auto* a = static_cast<Allocator*>(h);
  if (p < 0 || p >= a->num_pages || a->refcount[p] <= 0) return -2;
  dec_ref(a, p);
  return a->refcount[p];
}

int32_t pa_page_refcount(void* h, int32_t p) {
  auto* a = static_cast<Allocator*>(h);
  if (p < 0 || p >= a->num_pages) return -2;
  return a->refcount[p];
}

}  // extern "C"
