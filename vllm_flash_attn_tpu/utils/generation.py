"""Generation utilities (`flash_attn.utils.generation` surface:
InferenceParams, greedy/top-k decode, CUDA-graph decode analog — pinned by
/root/reference/tests/models/test_gpt.py:12,200-214,424-435).

The reference captures the decode step in a CUDA graph (`update_graph_cache`,
cg=True) to kill launch overhead; under JAX every step is a jitted XLA program
with static shapes, so graph capture is the default execution model — `cg` is
accepted for parity and is a no-op. Speculative decoding
(`decode_speculative`) drafts with a small model and verifies with one
multi-token-query kvcache call.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class InferenceParams:
    """Per-generation KV-cache container (reference InferenceParams analog).

    Caches are contiguous (b, max_seqlen, h_kv, dh) per layer, allocated
    lazily by MHA. All state is a pytree so jitted steps can thread it.
    """

    max_seqlen: int
    max_batch_size: int
    seqlen_offset: int = 0
    lengths_per_sample: Optional[jax.Array] = None
    key_value_memory_dict: Dict[int, Tuple[jax.Array, jax.Array]] = dataclasses.field(
        default_factory=dict
    )
    dtype: object = jnp.float32

    def lengths(self) -> jax.Array:
        if self.lengths_per_sample is not None:
            return self.lengths_per_sample
        return jnp.full((self.max_batch_size,), self.seqlen_offset, jnp.int32)

    def layer_cache(self, idx):
        kv = self.key_value_memory_dict.get(idx)
        if kv is None:
            raise KeyError(
                f"layer {idx} cache not allocated; call allocate() first"
            )
        return kv[0], kv[1], self.lengths()

    def update_layer_cache(self, idx, k, v):
        self.key_value_memory_dict[idx] = (k, v)

    def allocate(self, n_layers: int, n_heads_kv: int, head_dim: int, dtype=None):
        dtype = dtype or self.dtype
        for i in range(n_layers):
            self.key_value_memory_dict[i] = (
                jnp.zeros(
                    (self.max_batch_size, self.max_seqlen, n_heads_kv, head_dim),
                    dtype,
                ),
                jnp.zeros(
                    (self.max_batch_size, self.max_seqlen, n_heads_kv, head_dim),
                    dtype,
                ),
            )
        return self

    # pytree threading for jitted decode steps
    def cache_pytree(self):
        return dict(self.key_value_memory_dict)

    def with_cache(self, tree, seqlen_offset=None):
        new = dataclasses.replace(self)
        new.key_value_memory_dict = dict(tree)
        if seqlen_offset is not None:
            new.seqlen_offset = seqlen_offset
        return new


def update_graph_cache(model, params, batch_size, seqlen_og, max_seqlen, **kw):
    """Reference API parity: warm the jit cache for the decode step shape.

    CUDA-graph capture (flash_attn.utils.generation.update_graph_cache) maps to
    XLA compilation caching; nothing else to do.
    """
    return None


def _sample(logits, temperature: float, top_k: int, key):
    if temperature == 0.0 or top_k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 1:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def generate(
    model,
    params,
    input_ids: jax.Array,  # (b, prompt_len) int32
    max_new_tokens: int,
    temperature: float = 0.0,
    top_k: int = 1,
    eos_token_id: Optional[int] = None,
    vocab_size: Optional[int] = None,
    cg: bool = False,  # parity no-op: jit IS the graph capture
    rng: Optional[jax.Array] = None,
):
    """Autoregressive generation with a contiguous per-layer KV cache.

    Returns (b, prompt_len + max_new_tokens) token ids.
    """
    b, prompt_len = input_ids.shape
    c = model.config
    max_seqlen = prompt_len + max_new_tokens
    h_kv = c.n_head_kv or c.n_head
    dh = c.n_embd // c.n_head
    dtype = jax.tree_util.tree_leaves(params)[0].dtype
    vocab = vocab_size or c.vocab_size

    inf = InferenceParams(max_seqlen, b, dtype=dtype).allocate(
        c.n_layer, h_kv, dh
    )

    @jax.jit
    def prefill_step(params, ids, cache):
        ip = inf.with_cache(cache, 0)
        ip.lengths_per_sample = jnp.zeros((b,), jnp.int32)
        logits = model.apply(params, ids, inference_params=ip, num_last_tokens=1)
        return logits[:, 0, :vocab], ip.cache_pytree()

    @jax.jit
    def decode_step(params, tok, offset, cache):
        ip = inf.with_cache(cache)
        ip.lengths_per_sample = jnp.full((b,), offset, jnp.int32)
        pos = jnp.full((b, 1), offset, jnp.int32)
        logits = model.apply(
            params, tok, position_ids=pos if c.rotary_emb_dim == 0 else None,
            inference_params=ip, num_last_tokens=1,
        )
        return logits[:, 0, :vocab], ip.cache_pytree()

    logits, cache = prefill_step(params, input_ids, inf.cache_pytree())
    if rng is None:
        rng = jax.random.PRNGKey(0)
    toks = [input_ids]
    rng, k = jax.random.split(rng)
    next_tok = _sample(logits, temperature, top_k, k)[:, None]
    toks.append(next_tok)
    finished = (
        (next_tok[:, 0] == eos_token_id) if eos_token_id is not None else None
    )
    for step in range(1, max_new_tokens):
        offset = jnp.asarray(prompt_len + step - 1, jnp.int32)
        logits, cache = decode_step(params, next_tok, offset, cache)
        rng, k = jax.random.split(rng)
        next_tok = _sample(logits, temperature, top_k, k)[:, None]
        if eos_token_id is not None:
            next_tok = jnp.where(finished[:, None], eos_token_id, next_tok)
            finished = finished | (next_tok[:, 0] == eos_token_id)
        toks.append(next_tok)
        if finished is not None and bool(jnp.all(finished)):
            break
    return jnp.concatenate(toks, axis=1)


def decode_speculative(
    model,
    params,
    draft_model,
    draft_params,
    input_ids: jax.Array,
    max_new_tokens: int,
    speculative_lookahead: int = 4,
    eos_token_id: Optional[int] = None,
):
    """Greedy speculative decoding (test_gpt.py:424-435 surface).

    The draft model proposes `speculative_lookahead` tokens autoregressively;
    the target model scores them in ONE multi-token kvcache forward (the
    seqlen_q>1 path of flash_attn_with_kvcache) and accepts the longest
    matching greedy prefix, +1 corrected token.
    """
    import numpy as np

    b, prompt_len = input_ids.shape
    assert b == 1, "speculative decode: batch 1 (parity with reference test)"
    c = model.config
    dc = draft_model.config
    vocab = c.vocab_size
    K = speculative_lookahead
    max_seqlen = prompt_len + max_new_tokens + K + 1

    def _alloc(mc):
        dtype = jax.tree_util.tree_leaves(params)[0].dtype
        return InferenceParams(max_seqlen, 1, dtype=dtype).allocate(
            mc.n_layer, mc.n_head_kv or mc.n_head, mc.n_embd // mc.n_head
        )

    inf_t = _alloc(c)
    inf_d = _alloc(dc)

    def _make_prefill(m, inf0):
        @jax.jit
        def prefill(params_, ids, cache):
            inf = inf0.with_cache(cache, 0)
            inf.lengths_per_sample = jnp.zeros((1,), jnp.int32)
            logits = m.apply(
                params_, ids, inference_params=inf, num_last_tokens=1
            )
            return logits[:, 0, :vocab], inf.cache_pytree()

        return prefill

    prefill_t = _make_prefill(model, inf_t)
    prefill_d = _make_prefill(draft_model, inf_d)

    @jax.jit
    def draft_step(dparams, tok, offset, cache):
        inf = inf_d.with_cache(cache)
        inf.lengths_per_sample = jnp.full((1,), offset, jnp.int32)
        pos = jnp.full((1, 1), offset, jnp.int32)
        logits = draft_model.apply(
            dparams, tok,
            position_ids=pos if dc.rotary_emb_dim == 0 else None,
            inference_params=inf, num_last_tokens=1,
        )
        return jnp.argmax(logits[:, 0, :vocab], -1), inf.cache_pytree()

    @jax.jit
    def verify_step(tparams, q_tokens, offset, cache):
        """ONE multi-token kvcache forward over [last, p_0..p_{K-1}]; the
        accepted length only moves `offset` — rejected cache entries are
        stale but sit past the new length and get overwritten next round."""
        inf = inf_t.with_cache(cache)
        inf.lengths_per_sample = jnp.full((1,), offset, jnp.int32)
        pos = offset + jnp.arange(K + 1, dtype=jnp.int32)[None]
        logits = model.apply(
            tparams, q_tokens,
            position_ids=pos if c.rotary_emb_dim == 0 else None,
            inference_params=inf,
        )
        return jnp.argmax(logits[0, :, :vocab], -1), inf.cache_pytree()

    # prefill both caches over the prompt
    t_logits, t_cache = prefill_t(params, input_ids, inf_t.cache_pytree())
    _, d_cache = prefill_d(draft_params, input_ids, inf_d.cache_pytree())
    last = int(jnp.argmax(t_logits[0]))

    out = list(np.asarray(input_ids[0]))
    out.append(last)
    true_len = prompt_len  # committed cache entries (prompt only so far)
    generated = 1

    while generated < max_new_tokens:
        # draft K tokens with the draft's own cache (one step per token)
        proposals = []
        dt = jnp.asarray([[last]], jnp.int32)
        for i in range(K):
            nxt, d_cache = draft_step(
                draft_params, dt, jnp.int32(true_len + i), d_cache
            )
            proposals.append(int(nxt[0]))
            dt = nxt[:, None].astype(jnp.int32)
        # verify all K proposals in one target forward over the cache
        q = jnp.asarray([[last] + proposals], jnp.int32)
        tgt, t_cache = verify_step(params, q, jnp.int32(true_len), t_cache)
        tgt = np.asarray(tgt)
        m = np_first_mismatch(tgt[:K], np.asarray(proposals))
        accepted = proposals[:m] + [int(tgt[m])]
        out.extend(accepted)
        last = int(tgt[m])
        true_len += m + 1
        generated += m + 1
        if eos_token_id is not None and eos_token_id in accepted:
            break

    return jnp.asarray(out[: prompt_len + max_new_tokens], jnp.int32)[None]


def np_first_mismatch(a, b):
    import numpy as np

    a, b = np.asarray(a), np.asarray(b)
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n if n < len(b) else n - 1
