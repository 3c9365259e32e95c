"""Paged KV cache: fixed-size pages + per-sequence block tables.

No reference counterpart (the reference preallocates [B, H, max_seq, D]
per sequence, inference_engine.cpp:51-54). This is the vLLM-style
TPU-native design BASELINE.json's north star names ("HBM-resident,
tensor-sharded paged cache"): HBM holds a pool of [page_size] token
pages per layer/head; each sequence maps logical positions to pages
through a block table, so memory scales with TOKENS IN USE, not
batch × max_seq. Fragmentation-free slot recycling for continuous
batching.

This module provides the container, a host-side page allocator, and
pure-jnp append/attention reference ops (gather-based). The Pallas
decode kernel that walks block tables directly in HBM is the follow-up;
the reference ops here are its golden model and are already usable by
the scheduler for correctness-sensitive paths.

Layout: pages [L, P, Hkv, page_size, D] (head-major within a page, same
as the contiguous cache); block_table [B, max_pages] int32 page ids
(-1 = unassigned); lengths [B].
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig


class PagedKVCache(NamedTuple):
    k_pages: jax.Array        # [L, P, Hkv, page, D]
    v_pages: jax.Array
    block_table: jax.Array    # [B, max_pages] int32
    lengths: jax.Array        # [B] int32
    # int8 pools only: per-(token, head) absmax scales [L, P, Hkv, page]
    # f32 (value = int8_code * scale) — pages carry their scales, so
    # prefix-shared pages share them too. See models/common.KVCache.
    k_scale_pages: Optional[jax.Array] = None
    v_scale_pages: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]


def init_paged_cache(config: ModelConfig, batch_size: int, num_pages: int,
                     page_size: int = 64, max_seq: Optional[int] = None,
                     dtype=None) -> PagedKVCache:
    dtype = dtype or config.dtype
    T = max_seq or config.max_seq_len
    max_pages = -(-T // page_size)
    if config.kv_lora_rank:
        # MLA (DeepSeek): pages hold the compressed latent (k pool,
        # D=kv_lora_rank) and the shared rope key (v pool,
        # D=qk_rope_head_dim), one "head" each — the pools are
        # asymmetric and ~70x smaller than per-head K/V.
        if dtype == jnp.uint8:               # latents: no fp8 story
            dtype = config.dtype             # (int8 + scale pages works)
        kshape = (config.num_layers, num_pages, 1, page_size,
                  config.kv_lora_rank)
        vshape = (config.num_layers, num_pages, 1, page_size,
                  config.qk_rope_head_dim)
    else:
        kshape = vshape = (config.num_layers, num_pages, config.kv_heads,
                           page_size, config.head_dim_)
    ks = vs = None
    if dtype == jnp.int8:
        ks = jnp.zeros(kshape[:-1], jnp.float32)   # [L, P, Hkv, page]
        vs = jnp.zeros(vshape[:-1], jnp.float32)
    return PagedKVCache(
        k_pages=jnp.zeros(kshape, dtype),
        v_pages=jnp.zeros(vshape, dtype),
        block_table=jnp.full((batch_size, max_pages), -1, jnp.int32),
        lengths=jnp.zeros((batch_size,), jnp.int32),
        k_scale_pages=ks, v_scale_pages=vs)


class PageAllocator:
    """Host-side free-list allocator for page ids."""

    def __init__(self, num_pages: int):
        self._free: List[int] = list(range(num_pages - 1, -1, -1))
        self.num_pages = num_pages

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int = 1) -> List[int]:
        if n > len(self._free):
            raise RuntimeError(
                f"KV page pool exhausted: need {n}, have {len(self._free)}")
        return [self._free.pop() for _ in range(n)]

    def release(self, pages) -> None:
        for p in pages:
            if p >= 0:
                self._free.append(int(p))


def pages_needed(length: int, page_size: int) -> int:
    return -(-length // page_size)


class PrefixPagePool:
    """Content-addressed page pool: automatic prefix caching.

    Wraps PageAllocator with (a) refcounts, so concurrent sequences with
    a common prompt prefix SHARE the pages holding it, and (b) an
    evictable LRU of content-keyed pages whose refcount dropped to zero,
    so a later request with the same prefix reuses the K/V without
    recomputation or rewrite. A page's content key is the full token
    prefix up to that page's end (K/V at position t depends on all
    tokens ≤ t), exactly vLLM's hashing scheme. No reference counterpart.

    Pages never move: eviction only drops the key→page mapping of a
    zero-ref page when the free list runs dry.
    """

    def __init__(self, num_pages: int):
        self._alloc = PageAllocator(num_pages)
        self.num_pages = num_pages
        self._by_key: dict = {}            # key -> page id
        self._key_of: dict = {}            # page id -> key
        self._refs: dict = {}              # page id -> refcount (>0 only)
        self._evictable: dict = {}         # page id -> None (ordered = LRU)
        self.hits = 0
        self.misses = 0

    @property
    def available(self) -> int:
        """Pages obtainable right now (free + evictable cached)."""
        return self._alloc.free_pages + len(self._evictable)

    def lookup(self, key: bytes) -> Optional[int]:
        """Return a shared page holding `key`'s content (refcount +1)."""
        pid = self._by_key.get(key)
        if pid is None:
            self.misses += 1
            return None
        self.hits += 1
        self._evictable.pop(pid, None)
        self._refs[pid] = self._refs.get(pid, 0) + 1
        return pid

    def acquire(self, key: Optional[bytes] = None) -> int:
        """Take a fresh page (evicting a cold cached page if needed) and
        optionally register its content key for future lookup."""
        if self._alloc.free_pages == 0 and self._evictable:
            cold = next(iter(self._evictable))   # oldest zero-ref page
            del self._evictable[cold]
            old_key = self._key_of.pop(cold, None)
            if old_key is not None:
                del self._by_key[old_key]
            self._alloc.release([cold])
        pid = self._alloc.alloc(1)[0]
        self._refs[pid] = 1
        if key is not None:
            # A stale mapping for this key (shouldn't happen) is replaced.
            old = self._by_key.get(key)
            if old is not None:
                self._key_of.pop(old, None)
            self._by_key[key] = pid
            self._key_of[pid] = key
        return pid

    def release(self, pages) -> None:
        """Drop one reference per page; zero-ref keyed pages become
        evictable (content retained), unkeyed ones return to the free
        list."""
        for p in pages:
            p = int(p)
            if p < 0:
                continue
            n = self._refs.get(p, 0) - 1
            if n > 0:
                self._refs[p] = n
                continue
            self._refs.pop(p, None)
            if p in self._key_of:
                self._evictable[p] = None
            else:
                self._alloc.release([p])

    @property
    def live_pages(self) -> int:
        return sum(1 for _ in self._refs)


def prefix_page_keys(tokens, page_size: int) -> List[bytes]:
    """Content keys for each FULL page of `tokens` (partial tail pages
    are never shared — decode appends into them)."""
    import numpy as np
    arr = np.asarray(tokens, np.int32)
    return [arr[: (i + 1) * page_size].tobytes()
            for i in range(len(tokens) // page_size)]


# ---------------------------------------------------------------------------
# jnp reference ops (golden model for the future Pallas paged kernel)
# ---------------------------------------------------------------------------

def append_token(cache: PagedKVCache, layer_k: jax.Array, layer_v: jax.Array,
                 ) -> PagedKVCache:
    """Append ONE token's k/v for every layer and sequence.

    layer_k/v: [L, B, Hkv, D]. The destination page for each sequence is
    block_table[b, lengths[b] // page] at offset lengths[b] % page; pages
    must be pre-assigned (assign_pages).
    """
    from turboinfer_tpu.models.common import encode_kv_scaled
    L, P, Hkv, page, D = cache.k_pages.shape
    B = cache.lengths.shape[0]
    page_idx = cache.lengths // page                      # [B]
    offset = cache.lengths % page                         # [B]
    page_ids = jnp.take_along_axis(cache.block_table, page_idx[:, None],
                                   axis=1)[:, 0]          # [B]

    def write_b(kp, vp, ksp, vsp, pid, off, kb, vb):
        # kp/vp: [L, P, Hkv, page, D]; kb/vb: [L, Hkv, D].
        # An UNASSIGNED destination (block_table -1, e.g. a slot past
        # its granted pages) must not write at all — dynamic_update_slice
        # would clamp -1 to page 0 and negative .at[] indices WRAP, both
        # silently corrupting another sequence's K/V. Remap to P (out of
        # bounds) so mode="drop" really drops the write.
        pid = jnp.where(pid < 0, P, pid)
        kq, ks = encode_kv_scaled(kb, kp.dtype)
        vq, vs = encode_kv_scaled(vb, vp.dtype)
        kp = kp.at[:, pid, :, off, :].set(kq, mode="drop")
        vp = vp.at[:, pid, :, off, :].set(vq, mode="drop")
        if ks is not None:
            ksp = ksp.at[:, pid, :, off].set(ks, mode="drop")
            vsp = vsp.at[:, pid, :, off].set(vs, mode="drop")
        return kp, vp, ksp, vsp

    kp, vp = cache.k_pages, cache.v_pages
    ksp, vsp = cache.k_scale_pages, cache.v_scale_pages
    for b in range(B):      # B is small & static; unrolled at trace time
        kp, vp, ksp, vsp = write_b(kp, vp, ksp, vsp, page_ids[b],
                                   offset[b], layer_k[:, b], layer_v[:, b])
    return PagedKVCache(k_pages=kp, v_pages=vp,
                        block_table=cache.block_table,
                        lengths=cache.lengths + 1,
                        k_scale_pages=ksp, v_scale_pages=vsp)


def gather_sequence(cache: PagedKVCache, max_seq: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """Materialize contiguous [L, B, Hkv, max_seq, D] k/v from pages
    (reference path; the Pallas kernel reads pages directly). int8
    pools come back DEQUANTIZED to f32 (scales consumed here)."""
    from turboinfer_tpu.models.common import decode_kv
    L, P, Hkv, page, D = cache.k_pages.shape
    Dv = cache.v_pages.shape[-1]          # may differ (MLA latent pools)
    n_pages = max_seq // page
    table = jnp.clip(cache.block_table[:, :n_pages], 0, P - 1)  # [B, n]

    def per_seq(t):
        # t: [n_pages] -> [L, Hkv, n_pages*page, D]
        k = cache.k_pages[:, t]          # [L, n, Hkv, page, D]
        v = cache.v_pages[:, t]
        if cache.k_scale_pages is not None:
            k = decode_kv(k, jnp.float32, cache.k_scale_pages[:, t])
            v = decode_kv(v, jnp.float32, cache.v_scale_pages[:, t])
        k = k.transpose(0, 2, 1, 3, 4).reshape(L, Hkv, n_pages * page, D)
        v = v.transpose(0, 2, 1, 3, 4).reshape(L, Hkv, n_pages * page, Dv)
        return k, v

    ks, vs = jax.vmap(per_seq, out_axes=1)(table)   # [L, B, Hkv, T, D]
    return ks, vs


def paged_attention_decode_ref(q: jax.Array, cache: PagedKVCache,
                               layer: int) -> jax.Array:
    """Single-token attention for one layer over the paged cache.

    q: [B, Hq, D] -> [B, Hq, D]. Golden model: gather then the standard
    decode reference.
    """
    from turboinfer_tpu.kernels import ops
    from turboinfer_tpu.models.common import decode_kv
    B = q.shape[0]
    max_seq = cache.block_table.shape[1] * cache.page_size
    ks, vs = gather_sequence(cache, max_seq)
    # decode_kv, not astype: an fp8 pool stores RAW e4m3 bytes as uint8
    return ops.attention_decode_ref(q, decode_kv(ks[layer], q.dtype),
                                    decode_kv(vs[layer], q.dtype),
                                    cache.lengths)


def assign_pages(cache: PagedKVCache, seq: int, slots: List[int],
                 first_page_index: int = 0) -> PagedKVCache:
    """Host-side: record allocator-granted page ids in the block table."""
    table = cache.block_table
    for i, pid in enumerate(slots):
        table = table.at[seq, first_page_index + i].set(pid)
    return cache._replace(block_table=table)


def release_sequence(cache: PagedKVCache, seq: int,
                     allocator: PageAllocator) -> PagedKVCache:
    """Return a finished sequence's pages to the allocator."""
    import numpy as np
    row = np.asarray(cache.block_table[seq])
    allocator.release([p for p in row if p >= 0])
    table = cache.block_table.at[seq].set(-1)
    lengths = cache.lengths.at[seq].set(0)
    return cache._replace(block_table=table, lengths=lengths)
