"""Pallas TPU kernels — the native-code layer of the framework.

Each kernel returns None when the input shape is outside its supported
envelope; the dispatcher then falls back to the jnp reference op.
"""
