"""Single-token KV-cache decode attention Pallas kernel (placeholder stage)."""

from __future__ import annotations


def decode_pallas(q, k_cache, v_cache, kv_len):
    return None
