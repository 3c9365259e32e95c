"""Constrained (structured) decoding: grammar-masked token selection.
Beyond-reference subsystem — guarantees outputs parse (JSON today)."""

from turboinfer_tpu.structured.filter import JsonTokenFilter, \
    TokenMaskCache, token_bytes_table
from turboinfer_tpu.structured import json_fsm

__all__ = ["JsonTokenFilter", "TokenMaskCache", "token_bytes_table",
           "json_fsm"]
