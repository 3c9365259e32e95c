"""Long-context attention: ring attention + Ulysses sequence parallelism.

The reference has NOTHING here — sequence length is hard-capped at 2048
and prefill materializes full [seq, seq] scores (reference:
inference_engine.cpp:347-359, SURVEY.md §5 "long-context: nothing").
These are the TPU-native mechanisms SURVEY.md §5 calls for, for contexts
larger than one chip's HBM:

- **Ring attention**: q/k/v sharded on the sequence axis over a mesh
  axis; KV chunks rotate around the ring via `ppermute` while each
  device accumulates flash-style online-softmax partials for its local
  queries. Block-causal skipping means each device does only the work
  its chunks need. Communication rides ICI neighbor links.
- **Ulysses**: `all_to_all` swaps the sharded axis from sequence to
  heads, runs ordinary full-sequence attention on head shards, and
  swaps back. Cheaper than a ring when heads >= devices.

Both are expressed with shard_map so XLA sees static shapes and places
the collectives; the math inside is the same online-softmax as the
Pallas flash kernel (kernels/pallas/flash_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _chunk_attention(q, k, v, q_offset, k_offset, *, causal: bool):
    """Unnormalized flash partials of q [B,S,Hq,D] vs k/v [B,T,Hq,D]
    (heads already repeated). Returns (m [B,H,S], l [B,H,S],
    acc [B,S,H,D]) with global positions offset by q_offset/k_offset."""
    B, S, H, D = q.shape
    T = k.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    s = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    if causal:
        qpos = q_offset + jnp.arange(S)
        kpos = k_offset + jnp.arange(T)
        mask = qpos[None, None, :, None] >= kpos[None, None, None, :]
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)                               # [B,H,S]
    p = jnp.exp(s - m[..., None])
    # Fully-masked rows: m == NEG_INF -> force p to 0.
    p = jnp.where(m[..., None] <= NEG_INF / 2, 0.0, p)
    l = jnp.sum(p, axis=-1)                               # [B,H,S]
    acc = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))
    return m, l, acc


def _combine(m1, l1, a1, m2, l2, a2):
    """Merge two online-softmax partial states."""
    m = jnp.maximum(m1, m2)
    e1 = jnp.exp(m1 - m)
    e2 = jnp.exp(m2 - m)
    l = l1 * e1 + l2 * e2
    a = a1 * e1.transpose(0, 2, 1)[..., None] \
        + a2 * e2.transpose(0, 2, 1)[..., None]
    return m, l, a


def _repeat_heads(k, num_q_heads):
    b, t, hkv, d = k.shape
    if hkv == num_q_heads:
        return k
    return jnp.repeat(k, num_q_heads // hkv, axis=2)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   mesh: Mesh, axis: str = "data",
                   causal: bool = True) -> jax.Array:
    """Sequence-parallel causal attention over `axis` of `mesh`.

    q: [B, S, Hq, D], k/v: [B, S, Hkv, D] — S is the GLOBAL sequence,
    sharded into contiguous chunks on `axis`; output is sharded the same
    way. All devices hold the same B.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    p_sz = mesh.shape[axis]
    if S % p_sz:
        raise ValueError(f"sequence {S} not divisible by ring size {p_sz}")
    s_loc = S // p_sz

    seq_spec = P(None, axis, None, None)

    def local(q_c, k_c, v_c):
        # q_c/k_c/v_c: [B, s_loc, H*, D] local chunks. K/V rotate at
        # their RAW Hkv width — repeating to Hq heads happens inside the
        # body (a local broadcast), not before the ring: rotating
        # repeated heads would inflate per-hop ICI bytes and carry HBM
        # by Hq/Hkv (4x on Llama-3-style GQA).
        me = jax.lax.axis_index(axis)
        q_off = me * s_loc

        m0 = jnp.full((B, Hq, s_loc), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, Hq, s_loc), jnp.float32)
        a0 = jnp.zeros((B, s_loc, Hq, D), jnp.float32)
        perm = [(i, (i + 1) % p_sz) for i in range(p_sz)]

        def body(step, carry):
            kc, vc, m, l, a = carry
            src = (me - step) % p_sz          # global chunk index we hold

            def compute(mla):
                m, l, a = mla
                mi, li, ai = _chunk_attention(
                    q_c, _repeat_heads(kc, Hq), _repeat_heads(vc, Hq),
                    q_off, src * s_loc, causal=causal)
                return _combine(m, l, a, mi, li, ai)

            if causal:
                # Block-causal skip: a chunk entirely in this device's
                # future contributes nothing — don't compute it.
                needed = src * s_loc <= q_off + s_loc - 1
                m, l, a = jax.lax.cond(needed, compute,
                                       lambda mla: mla, (m, l, a))
            else:
                m, l, a = compute((m, l, a))
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            return (kc, vc, m, l, a)

        _, _, m, l, a = jax.lax.fori_loop(
            0, p_sz, body, (k_c, v_c, m0, l0, a0))
        denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
        return (a / denom).astype(q_c.dtype)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(seq_spec, seq_spec, seq_spec),
                   out_specs=seq_spec, check_vma=False)
    return fn(q, k, v)


def ulysses_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                      mesh: Mesh, axis: str = "data",
                      causal: bool = True) -> jax.Array:
    """Ulysses-style sequence parallelism: all_to_all seq<->heads.

    Same contract as ring_attention; requires Hq % axis_size == 0 and
    (for GQA) Hkv % axis_size == 0 or Hkv == axis-replicable.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    p_sz = mesh.shape[axis]
    if S % p_sz or Hq % p_sz:
        raise ValueError("S and Hq must divide the axis size")
    k = _repeat_heads(k, Hq)
    v = _repeat_heads(v, Hq)
    s_loc = S // p_sz
    h_loc = Hq // p_sz

    seq_spec = P(None, axis, None, None)

    def local(q_c, k_c, v_c):
        # [B, s_loc, Hq, D] -> all_to_all -> [B, S, h_loc, D]
        def to_heads(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        def to_seq(x):
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        qh, kh, vh = to_heads(q_c), to_heads(k_c), to_heads(v_c)
        m, l, a = _chunk_attention(qh, kh, vh, 0, 0, causal=causal)
        denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
        out = (a / denom).astype(q_c.dtype)          # [B, S, h_loc, D]
        return to_seq(out)                           # [B, s_loc, Hq, D]

    fn = shard_map(local, mesh=mesh,
                   in_specs=(seq_spec, seq_spec, seq_spec),
                   out_specs=seq_spec, check_vma=False)
    return fn(q, k, v)
