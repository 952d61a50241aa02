"""Continuous-batching serving engine (paged KV cache).

The reference stops at the kernel API — vLLM supplies the serving loop above
it. Here the loop is part of the framework (SURVEY.md §7 layer 6): a
C++ page allocator handles the host-side scheduling tick
(serving/page_allocator.py), two jitted device programs handle compute:

- prefill: all admissible pending requests in ONE device call — prompts
  padded to a shared length bucket, batch padded to a power-of-2 bucket
  (recompile cap on both axes), K/V bulk-appended into each request's pages,
  causal flash attention
- decode: ALL slots every step in one fixed-shape program (inactive slots ride
  along with length 0 — paged_attention outputs zeros for them), caches
  donated so XLA updates pages in place

Preemption: if a decode-step page allocation fails, the youngest sequence is
evicted and its request requeued from scratch (restart-on-preempt, the
simple half of vLLM's recompute policy).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.serving.cache import PagedState
from vllm_flash_attn_tpu.serving.page_allocator import PageAllocator


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_tokens: List[int]
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    # sampling: temperature 0.0 (or top_k 1) = greedy; otherwise softmax
    # sampling over the top_k logits (0 = full vocab), seeded per request so
    # outputs are deterministic regardless of scheduling order
    temperature: float = 0.0
    top_k: int = 0
    seed: int = 0
    output_tokens: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    # set when the request could not run to completion: "rejected" (prompt can
    # never fit max_pages_per_seq) or "truncated" (hit the per-seq page cap
    # mid-decode; output_tokens holds what was generated up to the cap)
    error: Optional[str] = None
    _rng: Optional[np.random.Generator] = dataclasses.field(
        default=None, repr=False, compare=False
    )

    def sample(self, logits: np.ndarray) -> int:
        """Pick the next token from a (vocab,) fp32 logits row (host-side;
        mirrors utils.generation._sample semantics). Sampling happens on the
        host because the logits row is already materialized there each tick.
        Preemption resets _rng to None, so a restarted request replays the
        SAME seeded stream from the start — deterministic regardless of
        scheduling order."""
        if self.temperature == 0.0 or self.top_k == 1:
            return int(np.argmax(logits))
        if self._rng is None:
            self._rng = np.random.default_rng(self.seed)
        x = logits.astype(np.float64) / self.temperature
        if self.top_k > 1:
            kth = np.partition(x, -self.top_k)[-self.top_k]
            x = np.where(x < kth, -np.inf, x)
        x -= x.max()
        p = np.exp(x)
        p /= p.sum()
        return int(self._rng.choice(len(p), p=p))

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0 or self.top_k == 1


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048, 4096)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


class LLMEngine:
    def __init__(
        self,
        model,
        params,
        *,
        page_size: int = 16,
        num_pages: int = 4096,
        max_seqs: int = 8,
        max_pages_per_seq: int = 256,
        cache_dtype=None,
        mesh=None,
        prefill_chunk: int = 0,
        draft_model=None,
        draft_params=None,
        speculate_k: int = 0,
        prefix_cache: bool = False,
    ):
        """mesh: optional jax Mesh with a 'model' axis for tensor-parallel
        serving — `model` must then be a ParallelGPTLMHeadModel and `params`
        the FULL (unsharded) tree; the engine shards params and the page
        pools (kv heads over 'model') and runs each device step in shard_map.

        speculate_k > 0 enables draft-model SPECULATIVE DECODING (greedy
        requests only): each tick the draft proposes k tokens in ONE jitted
        greedy loop, the target verifies all of them in ONE multi-token
        device step (the varlen-paged kernel with the fused in-kernel
        append), and the longest agreeing prefix plus one bonus token commit
        — up to k+1 tokens per tick for one target pass, with allocator
        shrink rolling back rejected cache entries. Output streams are
        BIT-IDENTICAL to plain greedy decoding (tested; exact in fp32 on
        hardware — in bf16 the 1-token decode kernel and the multi-token
        verify kernel may break argmax NEAR-TIES differently, immaterial
        at trained-model logit margins and still deterministic). The draft
        shares the allocator/page tables (its pools hold its own KV).
        Beyond-reference: the reference ships no serving loop at all; this
        is the vLLM-style speculative path built on this round's fused
        multi-token verify kernel.

        prefill_chunk > 0 enables vLLM-style chunked prefill: prompts longer
        than the chunk are admitted immediately (pages preallocated) and
        prefilled `prefill_chunk` tokens per tick in ONE device call for all
        such sequences, interleaved with decode ticks of the already-running
        sequences — long prompts no longer stall the running batch for their
        whole prefill.

        prefix_cache=True enables AUTOMATIC PREFIX CACHING (the vLLM
        flagship scheduling feature): full prompt pages are keyed by their
        token-chain and shared across requests via allocator refcounts —
        a new request adopts every cached full page of its prompt and only
        prefills the suffix (ONE chunked-mode device call per admission
        wave). Cache entries hold an allocator pin; LRU eviction runs
        before preemption when the pool runs dry. Shared pages are never
        written (suffixes start on fresh pages), so no copy-on-write is
        needed. Composes with speculative decoding (the draft's pools share
        the page ids, so its prefix K/V is cached alongside).
        """
        self.model = model
        self.mesh = mesh
        self.tp = int(mesh.shape["model"]) if mesh is not None else 1
        c = model.config
        self.h_kv = c.n_head_kv or c.n_head
        self.dh = c.n_embd // c.n_head
        self.vocab = c.vocab_size
        self.page_size = page_size
        self.max_seqs = max_seqs
        self.max_pages_per_seq = max_pages_per_seq
        if cache_dtype is None:
            cache_dtype = jax.tree_util.tree_leaves(params)[0].dtype
        if cache_dtype in ("int8", "fp8"):
            # quantized KV cache: tokens quantize once on append (per-token
            # per-head absmax scales); the decode kernel dequantizes
            # in-flight. Pools allocate PADDED (kv heads 4-sublane-aligned
            # with block-replicated data — MQA/tiny-h_kv serves quantized —
            # and head dim lane-padded, no per-call pool copy) with k+v
            # scales PACKED into one per-page tile (one scale DMA per page).
            from vllm_flash_attn_tpu.kernels.kv_quant import (
                allocate_quantized_pages,
            )

            qdtype = jnp.int8 if cache_dtype == "int8" else jnp.float8_e4m3fn
            self.k_pages, self.v_pages = allocate_quantized_pages(
                num_pages, page_size, self.h_kv, self.dh, qdtype,
                n_layer=c.n_layer,
            )
        else:
            self.k_pages, self.v_pages = PagedState.allocate(
                c.n_layer, num_pages, page_size, self.h_kv, self.dh, cache_dtype
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vllm_flash_attn_tpu.training.train_step import (
                param_specs,
                to_tp_layout,
            )

            assert cache_dtype not in ("int8", "fp8"), (
                "tensor-parallel serving with a quantized cache is not wired "
                "yet (the scale tensors need their own partition spec)"
            )
            assert self.h_kv % self.tp == 0, (self.h_kv, self.tp)
            self._cache_spec = P(None, None, None, "model", None)
            cache_sh = NamedSharding(mesh, self._cache_spec)
            self.k_pages = jax.device_put(self.k_pages, cache_sh)
            self.v_pages = jax.device_put(self.v_pages, cache_sh)
            self._param_spec_tree = param_specs(model)
            tp_params = to_tp_layout(model, params, self.tp)
            params = jax.tree_util.tree_map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                tp_params, self._param_spec_tree,
                is_leaf=lambda x: isinstance(x, P),
            )
        self.params = params
        self.allocator = PageAllocator(
            num_pages, max_seqs, max_pages_per_seq, page_size
        )
        self.prefill_chunk = int(prefill_chunk)
        if self.prefill_chunk and cache_dtype in ("int8", "fp8"):
            raise NotImplementedError(
                "chunked prefill over a quantized cache is not wired"
            )
        self.prefix_on = bool(prefix_cache)
        if self.prefix_on:
            assert not self.prefill_chunk, (
                "prefix caching + chunked prefill is not wired in one engine"
            )
            assert cache_dtype not in ("int8", "fp8"), (
                "prefix caching over a quantized cache is not wired"
            )
            from collections import OrderedDict

            # token-chain key -> pinned page id (exact tuple chains, no
            # hash-collision risk); insertion order doubles as the LRU
            self._prefix_cache = OrderedDict()
            self.prefix_hits = 0
            self.prefix_misses = 0
        self.speculate_k = int(speculate_k)
        self.draft_model = draft_model
        self.draft_params = draft_params
        if self.speculate_k:
            assert draft_model is not None and draft_params is not None
            assert mesh is None, "speculative decoding + TP is not wired"
            assert cache_dtype not in ("int8", "fp8"), (
                "speculative decoding over a quantized cache is not wired "
                "(the verify path reads bf16 pools)"
            )
            assert not self.prefill_chunk, (
                "speculative decoding and chunked prefill are mutually "
                "exclusive in this engine"
            )
            dc = draft_model.config
            self.d_k_pages, self.d_v_pages = PagedState.allocate(
                dc.n_layer, num_pages, page_size, dc.n_head_kv or dc.n_head,
                dc.n_embd // dc.n_head, cache_dtype,
            )
            self._propose_fn = None
            self._verify_fn = None
        self.pending: List[Request] = []
        self.active: Dict[int, Request] = {}  # slot -> request
        self.prefilling: Dict[int, Request] = {}  # slot -> mid-prefill req
        self._prefill_pos: Dict[int, int] = {}  # slot -> tokens prefilled
        self._chunk_fns = {}
        self._finished: List[Request] = []  # drained by step()
        self._admit_order: List[int] = []
        self._last_token = np.zeros((max_seqs,), np.int32)
        # decode programs keyed by argmax routing (True = device-side greedy
        # token, 16-byte readback; False = full logits rows for sampling)
        self.device_argmax = True
        self._decode_fns: Dict[bool, object] = {}
        self._prefill_fns = {}

    # ------------------------------------------------------------- device fns

    def _build_decode(self, argmax: bool = False):
        """argmax=True: the device program reduces each logits row to its
        greedy token id before readback — 16 bytes instead of a full
        (max_seqs, vocab) fp32 row block per tick. Measured on the relay rig
        (round 5): the full-row readback costs ~12 ms/tick on top of a ~32 ms
        per-call round trip; device argmax removes the payload for the common
        all-greedy batch. (A device-side lax.top_k(64) variant was measured
        and REJECTED: +20 ms of device sort — worse than shipping the rows.)
        Sampling requests route to the full-row program."""
        model, vocab = self.model, self.vocab

        def step(params, tokens, kc, vc, lengths, tables, num_new):
            state = PagedState(kc, vc, lengths, tables, num_new, "decode")
            logits = model.apply(
                params, tokens, inference_params=state, num_last_tokens=1
            )
            if self.mesh is not None:  # vocab-sharded -> full row
                logits = jax.lax.all_gather(
                    logits[:, 0], "model", axis=1, tiled=True
                )[:, None]
            row = logits[:, 0, :vocab]
            if argmax:
                # ties break to the lowest index — same as np.argmax in
                # Request.sample, so greedy streams are bit-identical
                tok = jnp.argmax(row, axis=-1).astype(jnp.int32)
                return tok, state.k_pages, state.v_pages
            return row, state.k_pages, state.v_pages

        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            cs = self._cache_spec
            step = shard_map(
                step,
                mesh=self.mesh,
                in_specs=(self._param_spec_tree, P(), cs, cs, P(), P(), P()),
                out_specs=(P(), cs, cs),
                check_vma=False,
            )
        return jax.jit(step, donate_argnums=(2, 3))

    def _build_prefill(self, padded_len, model=None):
        model, vocab = model or self.model, self.vocab

        def step(params, ids, kc, vc, tables, true_lens):
            # batched admission: ids (B, padded), true_lens (B,) — rows with
            # true_len 0 are padding riders (num_new 0 appends nothing; their
            # logits row is discarded host-side)
            B = ids.shape[0]
            lengths = jnp.zeros((B,), jnp.int32)
            state = PagedState(kc, vc, lengths, tables, true_lens, "prefill")
            logits = model.apply(params, ids, inference_params=state)
            if self.mesh is not None:
                logits = jax.lax.all_gather(logits, "model", axis=2, tiled=True)
            last_idx = jnp.maximum(true_lens - 1, 0)
            last = jnp.take_along_axis(
                logits, last_idx[:, None, None], axis=1
            )[:, 0, :vocab]
            return last, state.k_pages, state.v_pages

        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            cs = self._cache_spec
            step = shard_map(
                step,
                mesh=self.mesh,
                in_specs=(self._param_spec_tree, P(), cs, cs, P(), P()),
                out_specs=(P(), cs, cs),
                check_vma=False,
            )
        return jax.jit(step, donate_argnums=(2, 3))

    def _build_chunk_prefill_for_draft(self, chunk):
        return self._build_chunk_prefill(chunk, model=self.draft_model)

    def _build_chunk_prefill(self, chunk, model=None):
        model, vocab = model or self.model, self.vocab

        def step(params, ids, kc, vc, tables, lengths, num_new):
            # chunked prefill: ids (B, chunk) are the next chunk of each
            # mid-prefill prompt, appended at offset `lengths`; rows with
            # num_new 0 are padding riders
            state = PagedState(
                kc, vc, lengths, tables, num_new, "chunked_prefill"
            )
            pos_ids = lengths[:, None] + jnp.arange(
                ids.shape[1], dtype=jnp.int32
            )[None]
            logits = model.apply(
                params, ids, position_ids=pos_ids, inference_params=state
            )
            if self.mesh is not None:
                logits = jax.lax.all_gather(logits, "model", axis=2, tiled=True)
            last_idx = jnp.maximum(num_new - 1, 0)
            last = jnp.take_along_axis(
                logits, last_idx[:, None, None], axis=1
            )[:, 0, :vocab]
            return last, state.k_pages, state.v_pages

        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            cs = self._cache_spec
            step = shard_map(
                step,
                mesh=self.mesh,
                in_specs=(self._param_spec_tree, P(), cs, cs, P(), P(), P()),
                out_specs=(P(), cs, cs),
                check_vma=False,
            )
        return jax.jit(step, donate_argnums=(2, 3))

    def _build_propose(self, k_steps):
        """k_steps greedy draft-decode steps in ONE jit (argmax feedback
        inside a lax.scan): proposals (B, k_steps) + updated draft pools.
        Appends ride the fused decode path; inactive rows (active==0) append
        nothing and their lengths do not advance."""
        model, vocab = self.draft_model, self.vocab

        def step(params, tok, kc, vc, lens0, tables, active):
            def body(carry, _):
                tok, kc, vc, lens = carry
                state = PagedState(kc, vc, lens, tables, active, "decode")
                logits = model.apply(
                    params, tok, inference_params=state, num_last_tokens=1
                )
                nxt = jnp.argmax(
                    logits[:, 0, :vocab], axis=-1
                ).astype(jnp.int32)[:, None]
                return (nxt, state.k_pages, state.v_pages, lens + active), \
                    nxt[:, 0]

            (tok, kc, vc, lens), props = jax.lax.scan(
                body, (tok, kc, vc, lens0), None, length=k_steps
            )
            return props.T, kc, vc  # (B, k_steps)

        return jax.jit(step, donate_argnums=(2, 3))

    def _build_verify(self):
        """ONE multi-token target step over the k+1 verify tokens
        ([last committed, p0..p_{k-1}]): chunked-prefill-mode append +
        attention, device-side argmax per position (greedy spec decode —
        a (B, k+1) int32 readback)."""
        model, vocab = self.model, self.vocab

        def step(params, ids, kc, vc, tables, lengths, num_new):
            state = PagedState(
                kc, vc, lengths, tables, num_new, "chunked_prefill"
            )
            pos_ids = lengths[:, None] + jnp.arange(
                ids.shape[1], dtype=jnp.int32
            )[None]
            logits = model.apply(
                params, ids, position_ids=pos_ids, inference_params=state
            )
            g = jnp.argmax(logits[..., :vocab], axis=-1).astype(jnp.int32)
            return g, state.k_pages, state.v_pages

        return jax.jit(step, donate_argnums=(2, 3))

    def _spec_tick(self) -> bool:
        """One speculative tick over all active slots. Returns False when
        preemption emptied the active set (caller drains finished)."""
        k = self.speculate_k
        grown = set()
        while True:
            ok = True
            for slot in list(self.active.keys()):
                if slot in grown:
                    continue
                r = self.allocator.extend(slot, k + 1)
                if r == -2:
                    self._finish_truncated(slot)
                    continue
                if r < 0:
                    ok = False
                    break
                grown.add(slot)
            if ok:
                break
            if self.prefix_on and self._prefix_cache:
                # free cached-prefix pins before resorting to preemption
                self._evict_prefix_lru(len(self.active) * (k + 1))
                continue
            victim = self._preempt_youngest()
            grown.discard(victim)
            if not self.active:
                return False
        if not self.active:
            return False

        slots = np.arange(self.max_seqs, dtype=np.int32)
        tables, lens_after = self.allocator.gather(slots)
        active_mask = np.zeros((self.max_seqs,), np.int32)
        for slot in self.active:
            active_mask[slot] = 1
        lens_before = np.where(
            active_mask > 0, lens_after - (k + 1), lens_after
        ).astype(np.int32)
        num_new = (active_mask * (k + 1)).astype(np.int32)

        if self._propose_fn is None:
            # the draft scans k+1 steps so its cache also receives p_{k-1}
            # (needed when all k proposals are accepted); proposal p_k is
            # computed but unused
            self._propose_fn = self._build_propose(k + 1)
            self._verify_fn = self._build_verify()

        toks = jnp.asarray(self._last_token[:, None])
        tables_j = jnp.asarray(tables)
        lens_j = jnp.asarray(lens_before)
        props, self.d_k_pages, self.d_v_pages = self._propose_fn(
            self.draft_params, toks, self.d_k_pages, self.d_v_pages,
            lens_j, tables_j, jnp.asarray(active_mask),
        )
        props_np = np.asarray(props)  # (B, k+1); columns 0..k-1 are verified
        ver_in = np.concatenate(
            [self._last_token[:, None], props_np[:, :k]], axis=1
        ).astype(np.int32)
        g, self.k_pages, self.v_pages = self._verify_fn(
            self.params, jnp.asarray(ver_in), self.k_pages, self.v_pages,
            tables_j, lens_j, jnp.asarray(num_new),
        )
        g_np = np.asarray(g)  # (B, k+1) target greedy token per position

        for slot, req in list(self.active.items()):
            acc = 0
            while acc < k and props_np[slot, acc] == g_np[slot, acc]:
                acc += 1
            committed = 0
            for i in range(acc + 1):
                if len(req.output_tokens) >= req.max_new_tokens:
                    break
                tok = int(g_np[slot, i])
                req.output_tokens.append(tok)
                committed += 1
                if req.eos_token_id is not None and tok == req.eos_token_id:
                    break
            # cache validity: positions lens..lens+k hold [last, p0..p_{k-1}]
            # in BOTH pools; entries 0..committed-1 are the committed stream
            # shifted by one (the newest committed token stays out of cache,
            # as in plain decode) — shrink the rest away
            self.allocator.shrink(slot, (k + 1) - committed)
            if committed:
                self._last_token[slot] = int(g_np[slot, committed - 1])
            self._maybe_finish(slot)
        return True

    # -------------------------------------------------------------- scheduling

    def add_request(self, req: Request):
        if self.speculate_k and not req.greedy:
            raise NotImplementedError(
                "speculative decoding is greedy-only (temperature 0 or "
                "top_k 1); sampling-aware acceptance is not wired"
            )
        self.pending.append(req)

    def _admit_batch(self) -> bool:
        """Admit as many pending prompts as fit (slots + pages) in ONE
        prefill device call — ids padded to a shared length bucket, batch
        padded to a power-of-2 bucket (recompile cap on both axes)."""
        batch = []  # (req, slot, L)
        while self.pending and (
            len(self.active) + len(self.prefilling) + len(batch)
            < self.max_seqs
        ):
            req = self.pending[0]
            L = len(req.prompt_tokens)
            need_pages = -(-L // self.page_size) + 1
            if need_pages > self.max_pages_per_seq:
                # can never fit — reject instead of stalling the queue forever
                self.pending.pop(0)
                req.finished = True
                req.error = "rejected"
                self._finished.append(req)
                continue
            if self.allocator.num_free_pages() < need_pages:
                break
            slot = self.allocator.alloc_seq()
            if slot < 0:
                break
            self.pending.pop(0)
            assert self.allocator.extend(slot, L) == L
            if self.prefill_chunk and L > self.prefill_chunk:
                # long prompt: pages preallocated, tokens fed chunk-by-chunk
                # across ticks (_chunk_tick) instead of one monolithic call
                self.prefilling[slot] = req
                self._prefill_pos[slot] = 0
                self._admit_order.append(slot)
                continue
            batch.append((req, slot, L))
        if not batch:
            return False

        B = 1
        while B < len(batch):
            B *= 2
        padded = _bucket(max(L for _, _, L in batch))
        tables, _ = self.allocator.gather([slot for _, slot, _ in batch])
        tables = np.asarray(tables)
        if B > len(batch):
            pad = np.zeros((B - len(batch), tables.shape[1]), tables.dtype)
            tables = np.concatenate([tables, pad], axis=0)
        ids = np.zeros((B, padded), np.int32)
        true_lens = np.zeros((B,), np.int32)
        for i, (req, _, L) in enumerate(batch):
            ids[i, :L] = req.prompt_tokens
            true_lens[i] = L

        key = (B, padded)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = self._build_prefill(padded)
        last_logits, self.k_pages, self.v_pages = self._prefill_fns[key](
            self.params,
            jnp.asarray(ids),
            self.k_pages,
            self.v_pages,
            jnp.asarray(tables),
            jnp.asarray(true_lens),
        )
        if self.speculate_k:
            # fill the draft cache with the same prompts (its first-token
            # logits are discarded — the target picks the first token)
            dkey = ("draft", B, padded)
            if dkey not in self._prefill_fns:
                self._prefill_fns[dkey] = self._build_prefill(
                    padded, model=self.draft_model
                )
            _, self.d_k_pages, self.d_v_pages = self._prefill_fns[dkey](
                self.draft_params,
                jnp.asarray(ids),
                self.d_k_pages,
                self.d_v_pages,
                jnp.asarray(tables),
                jnp.asarray(true_lens),
            )
        last_logits = np.asarray(last_logits)
        for i, (req, slot, _) in enumerate(batch):
            tok = req.sample(last_logits[i])
            req.output_tokens.append(tok)
            self._last_token[slot] = tok
            self.active[slot] = req
            self._admit_order.append(slot)
            self._maybe_finish(slot)
        return True

    def _evict_prefix_lru(self, want_free: int) -> None:
        """Drop LRU prefix-cache pins until `want_free` pages are free or
        the cache is empty (an unpin only frees a page no live sequence
        still references)."""
        while (
            self.allocator.num_free_pages() < want_free and self._prefix_cache
        ):
            _, page = self._prefix_cache.popitem(last=False)
            self.allocator.unref_page(page)

    def _prefix_lookup(self, tokens) -> tuple:
        """Longest cached full-page chain of `tokens`, capped so at least one
        token remains for the suffix prefill. Returns (pages, key_chain)."""
        ps = self.page_size
        n_full = (len(tokens) - 1) // ps
        pages, key = [], None
        for i in range(n_full):
            key = (key, tuple(tokens[i * ps:(i + 1) * ps]))
            page = self._prefix_cache.get(key)
            if page is None:
                break
            self._prefix_cache.move_to_end(key)
            pages.append(page)
        return pages

    def _prefix_register(self, tokens, table_row) -> None:
        """Pin and register every full prompt page of a just-prefilled
        sequence (including re-touching already-cached ones for LRU)."""
        ps = self.page_size
        key = None
        for i in range((len(tokens) - 1) // ps):
            key = (key, tuple(tokens[i * ps:(i + 1) * ps]))
            if key in self._prefix_cache:
                self._prefix_cache.move_to_end(key)
                continue
            page = int(table_row[i])
            if self.allocator.ref_page(page) >= 0:
                self._prefix_cache[key] = page

    def _admit_batch_prefix(self) -> bool:
        """Prefix-cached admission: adopt every cached full prompt page and
        prefill only the suffixes — ONE chunked-mode device call for the
        whole admission wave (rows carry per-row lengths/num_new)."""
        ps = self.page_size
        batch = []  # (req, slot, L, pre_tokens)
        while self.pending and (
            len(self.active) + len(self.prefilling) + len(batch)
            < self.max_seqs
        ):
            req = self.pending[0]
            L = len(req.prompt_tokens)
            need_pages = -(-L // ps) + 1
            if need_pages > self.max_pages_per_seq:
                self.pending.pop(0)
                req.finished = True
                req.error = "rejected"
                self._finished.append(req)
                continue
            pre_pages = self._prefix_lookup(req.prompt_tokens)
            fresh = need_pages - len(pre_pages)
            if self.allocator.num_free_pages() < fresh:
                self._evict_prefix_lru(fresh)
            if self.allocator.num_free_pages() < fresh:
                break
            slot = self.allocator.alloc_seq()
            if slot < 0:
                break
            self.pending.pop(0)
            pre_tokens = len(pre_pages) * ps
            if pre_pages:
                r = self.allocator.adopt(slot, pre_pages, pre_tokens)
                if r < 0:  # defensive: stale entry — fall back to full prefill
                    pre_pages, pre_tokens = [], 0
            if pre_tokens:
                self.prefix_hits += len(pre_pages)
            else:
                self.prefix_misses += 1
            r = self.allocator.extend(slot, L - pre_tokens)
            if r != L:
                # only reachable through the adopt-failure fallback (the
                # free-page check above assumed the adopted pages): requeue
                # and stop admitting this wave
                self.allocator.free_seq(slot)
                self.pending.insert(0, req)
                break
            batch.append((req, slot, L, pre_tokens))
        if not batch:
            return False

        B = 1
        while B < len(batch):
            B *= 2
        padded = _bucket(max(L - pre for _, _, L, pre in batch))
        tables, _ = self.allocator.gather([slot for _, slot, _, _ in batch])
        tables = np.asarray(tables)
        if B > len(batch):
            pad = np.zeros((B - len(batch), tables.shape[1]), tables.dtype)
            tables = np.concatenate([tables, pad], axis=0)
        ids = np.zeros((B, padded), np.int32)
        lengths = np.zeros((B,), np.int32)
        num_new = np.zeros((B,), np.int32)
        for i, (req, _, L, pre) in enumerate(batch):
            ids[i, : L - pre] = req.prompt_tokens[pre:]
            lengths[i] = pre
            num_new[i] = L - pre
        key = (B, padded)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = self._build_chunk_prefill(padded)
        args = (jnp.asarray(ids), jnp.asarray(tables), jnp.asarray(lengths),
                jnp.asarray(num_new))
        last_logits, self.k_pages, self.v_pages = self._chunk_fns[key](
            self.params, args[0], self.k_pages, self.v_pages,
            args[1], args[2], args[3],
        )
        if self.speculate_k:
            dkey = ("draft", B, padded)
            if dkey not in self._chunk_fns:
                self._chunk_fns[dkey] = self._build_chunk_prefill_for_draft(
                    padded
                )
            _, self.d_k_pages, self.d_v_pages = self._chunk_fns[dkey](
                self.draft_params, args[0], self.d_k_pages, self.d_v_pages,
                args[1], args[2], args[3],
            )
        last_logits = np.asarray(last_logits)
        for i, (req, slot, L, _) in enumerate(batch):
            self._prefix_register(req.prompt_tokens, tables[i])
            tok = req.sample(last_logits[i])
            req.output_tokens.append(tok)
            self._last_token[slot] = tok
            self.active[slot] = req
            self._admit_order.append(slot)
            self._maybe_finish(slot)
        return True

    def _maybe_finish(self, slot: int):
        req = self.active.get(slot)
        if req is None:
            return
        done = len(req.output_tokens) >= req.max_new_tokens or (
            req.eos_token_id is not None
            and req.output_tokens
            and req.output_tokens[-1] == req.eos_token_id
        )
        if done:
            req.finished = True
            self.allocator.free_seq(slot)
            del self.active[slot]
            self._admit_order.remove(slot)
            self._finished.append(req)

    def _finish_truncated(self, slot: int):
        """Sequence hit max_pages_per_seq — preemption cannot free per-seq
        headroom, so finish it (truncated) rather than livelocking the tick."""
        req = self.active.pop(slot)
        self._admit_order.remove(slot)
        self.allocator.free_seq(slot)
        req.finished = True
        req.error = "truncated"
        self._finished.append(req)

    def _preempt_youngest(self):
        slot = self._admit_order[-1]
        if slot in self.prefilling:
            req = self.prefilling.pop(slot)
            self._prefill_pos.pop(slot, None)
        else:
            req = self.active.pop(slot)
        self._admit_order.remove(slot)
        self.allocator.free_seq(slot)
        req.output_tokens = []  # restart-on-preempt
        req._rng = None  # replay the same seeded sample stream from scratch
        self.pending.insert(0, req)
        return slot

    def _chunk_tick(self):
        """Advance every mid-prefill sequence by one chunk in ONE device
        call; sequences whose prompt completes sample their first token and
        join the decode set."""
        if not self.prefilling:
            return
        chunk = self.prefill_chunk
        slots = sorted(self.prefilling.keys())
        B = 1
        while B < len(slots):
            B *= 2
        tables, _ = self.allocator.gather(slots)
        tables = np.asarray(tables)
        if B > len(slots):
            pad = np.zeros((B - len(slots), tables.shape[1]), tables.dtype)
            tables = np.concatenate([tables, pad], axis=0)
        ids = np.zeros((B, chunk), np.int32)
        lengths = np.zeros((B,), np.int32)
        num_new = np.zeros((B,), np.int32)
        for i, slot in enumerate(slots):
            req = self.prefilling[slot]
            pos = self._prefill_pos[slot]
            n = min(len(req.prompt_tokens) - pos, chunk)
            ids[i, :n] = req.prompt_tokens[pos:pos + n]
            lengths[i] = pos
            num_new[i] = n
        key = (B, chunk)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = self._build_chunk_prefill(chunk)
        last_logits, self.k_pages, self.v_pages = self._chunk_fns[key](
            self.params,
            jnp.asarray(ids),
            self.k_pages,
            self.v_pages,
            jnp.asarray(tables),
            jnp.asarray(lengths),
            jnp.asarray(num_new),
        )
        last_logits = np.asarray(last_logits)
        for i, slot in enumerate(slots):
            req = self.prefilling[slot]
            self._prefill_pos[slot] += int(num_new[i])
            if self._prefill_pos[slot] >= len(req.prompt_tokens):
                del self.prefilling[slot]
                del self._prefill_pos[slot]
                tok = req.sample(last_logits[i])
                req.output_tokens.append(tok)
                self._last_token[slot] = tok
                self.active[slot] = req
                self._maybe_finish(slot)

    def step(self) -> List[Request]:
        """One scheduling tick: admit, advance chunked prefills, then
        decode. Returns finished requests."""
        admit = self._admit_batch_prefix if self.prefix_on else self._admit_batch
        while (
            len(self.active) + len(self.prefilling) < self.max_seqs
            and admit()
        ):
            pass
        self._chunk_tick()

        if not self.active:
            out, self._finished = self._finished, []
            return out

        if self.speculate_k:
            self._spec_tick()
            out, self._finished = self._finished, []
            return out

        # Reserve one token per active sequence. `grown` persists across
        # preemption retries so a slot is never extended twice in one tick
        # (a double extend desyncs allocator lengths from cache contents).
        grown = set()
        while True:
            ok = True
            for slot in list(self.active.keys()):
                if slot in grown:
                    continue
                r = self.allocator.extend(slot, 1)
                if r == -2:  # per-seq cap: unrecoverable by preemption
                    self._finish_truncated(slot)
                    continue
                if r < 0:  # pool OOM: preempt and retry
                    ok = False
                    break
                grown.add(slot)
            if ok:
                break
            if self.prefix_on and self._prefix_cache:
                # free cached-prefix pins before resorting to preemption
                self._evict_prefix_lru(len(self.active))
                continue
            victim = self._preempt_youngest()
            grown.discard(victim)  # its pages were freed with the sequence
            if not self.active:
                out, self._finished = self._finished, []
                return out

        if not self.active:
            out, self._finished = self._finished, []
            return out

        slots = np.arange(self.max_seqs, dtype=np.int32)
        tables, lens_after = self.allocator.gather(slots)
        active_mask = np.zeros((self.max_seqs,), bool)
        for slot in self.active:
            active_mask[slot] = True
        num_new = active_mask.astype(np.int32)
        lens_before = np.maximum(lens_after - num_new, 0)

        # route: device-side argmax (16-byte readback) when every active
        # request is greedy; full logits rows otherwise
        argmax = self.device_argmax and all(
            r.greedy for r in self.active.values()
        )
        if argmax not in self._decode_fns:
            self._decode_fns[argmax] = self._build_decode(argmax)
        tokens = jnp.asarray(self._last_token[:, None])
        outs = self._decode_fns[argmax](
            self.params,
            tokens,
            self.k_pages,
            self.v_pages,
            jnp.asarray(lens_before),
            jnp.asarray(tables),
            jnp.asarray(num_new),
        )
        if argmax:
            toks, self.k_pages, self.v_pages = outs
            toks_np = np.asarray(toks)
            for slot, req in list(self.active.items()):
                tok = int(toks_np[slot])
                req.output_tokens.append(tok)
                self._last_token[slot] = tok
                self._maybe_finish(slot)
        else:
            logits, self.k_pages, self.v_pages = outs
            logits_np = np.asarray(logits)
            for slot, req in list(self.active.items()):
                tok = req.sample(logits_np[slot])
                req.output_tokens.append(tok)
                self._last_token[slot] = tok
                self._maybe_finish(slot)
        out, self._finished = self._finished, []
        return out

    def run(self, requests: List[Request]) -> List[Request]:
        """Blocking helper: run all requests to completion."""
        for r in requests:
            self.add_request(r)
        done: List[Request] = []
        while self.pending or self.active or self.prefilling:
            done.extend(self.step())
        return done
