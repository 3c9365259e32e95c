"""Paged KV cache tests: allocator, append/gather round trip, paged
attention vs contiguous-cache golden model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turboinfer_tpu.config import ModelConfig
from turboinfer_tpu.engine import paged_cache as pc
from turboinfer_tpu.kernels import ops


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(vocab_size=100, hidden_size=32, num_layers=2,
                       num_heads=2, num_kv_heads=2, max_seq_len=64,
                       dtype=jnp.float32)


def test_allocator():
    a = pc.PageAllocator(4)
    p1 = a.alloc(2)
    assert len(set(p1)) == 2 and a.free_pages == 2
    with pytest.raises(RuntimeError, match="exhausted"):
        a.alloc(3)
    a.release(p1)
    assert a.free_pages == 4
    assert pc.pages_needed(65, 64) == 2
    assert pc.pages_needed(64, 64) == 1


def test_append_and_gather_roundtrip(cfg):
    B, page, n_pages = 2, 8, 8
    cache = pc.init_paged_cache(cfg, B, num_pages=n_pages, page_size=page,
                                max_seq=32)
    alloc = pc.PageAllocator(n_pages)
    for b in range(B):
        cache = pc.assign_pages(cache, b, alloc.alloc(4))

    rng = np.random.RandomState(0)
    L, Hkv, D = cfg.num_layers, cfg.kv_heads, cfg.head_dim_
    T = 11
    ks = rng.randn(T, L, B, Hkv, D).astype(np.float32)
    vs = rng.randn(T, L, B, Hkv, D).astype(np.float32)
    for t in range(T):
        cache = pc.append_token(cache, jnp.asarray(ks[t]),
                                jnp.asarray(vs[t]))
    assert int(cache.lengths[0]) == T

    kg, vg = pc.gather_sequence(cache, 32)     # [L, B, Hkv, 32, D]
    want_k = ks.transpose(1, 2, 3, 0, 4)       # [L, B, Hkv, T, D]
    np.testing.assert_allclose(np.asarray(kg)[:, :, :, :T], want_k,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vg)[:, :, :, :T],
                               vs.transpose(1, 2, 3, 0, 4),
                               rtol=1e-6, atol=1e-6)


def test_paged_attention_matches_contiguous(cfg):
    B, page, n_pages = 2, 8, 8
    cache = pc.init_paged_cache(cfg, B, num_pages=n_pages, page_size=page,
                                max_seq=32)
    alloc = pc.PageAllocator(n_pages)
    # Assign pages OUT OF ORDER to exercise the block table.
    pages = alloc.alloc(8)
    cache = pc.assign_pages(cache, 0, [pages[3], pages[0], pages[5],
                                       pages[6]])
    cache = pc.assign_pages(cache, 1, [pages[7], pages[2], pages[1],
                                       pages[4]])

    rng = np.random.RandomState(1)
    L, Hkv, D = cfg.num_layers, cfg.kv_heads, cfg.head_dim_
    T = 13
    contig_k = np.zeros((B, Hkv, 32, D), np.float32)
    contig_v = np.zeros((B, Hkv, 32, D), np.float32)
    for t in range(T):
        k_t = rng.randn(L, B, Hkv, D).astype(np.float32)
        v_t = rng.randn(L, B, Hkv, D).astype(np.float32)
        cache = pc.append_token(cache, jnp.asarray(k_t), jnp.asarray(v_t))
        contig_k[:, :, t] = k_t[0]
        contig_v[:, :, t] = v_t[0]

    q = jnp.asarray(rng.randn(B, cfg.num_heads, D).astype(np.float32))
    got = pc.paged_attention_decode_ref(q, cache, layer=0)
    want = ops.attention_decode_ref(q, jnp.asarray(contig_k),
                                    jnp.asarray(contig_v), cache.lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_release_recycles_pages(cfg):
    B, page, n_pages = 1, 8, 2
    cache = pc.init_paged_cache(cfg, B, num_pages=n_pages, page_size=page,
                                max_seq=16)
    alloc = pc.PageAllocator(n_pages)
    cache = pc.assign_pages(cache, 0, alloc.alloc(2))
    assert alloc.free_pages == 0
    cache = pc.release_sequence(cache, 0, alloc)
    assert alloc.free_pages == 2
    assert int(cache.lengths[0]) == 0
    assert int(cache.block_table[0, 0]) == -1
