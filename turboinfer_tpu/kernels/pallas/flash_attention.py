"""Blockwise (flash) prefill attention Pallas kernel (placeholder stage)."""

from __future__ import annotations


def prefill_pallas(q, k, v, *, causal=True, positions=None, kv_len=None):
    return None
