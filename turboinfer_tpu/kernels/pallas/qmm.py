"""Fused group-wise dequant × matmul Pallas kernel (placeholder stage).

Real kernel lands with the Pallas milestone; until then dispatch falls
back to the jnp reference (XLA still fuses dequant into the dot).
"""

from __future__ import annotations


def qmatmul_pallas(x, qt, preferred_dtype):
    return None
