"""Token-level constrained decoding filter over the JSON byte FSM.

Per step: rank the logits, test candidates best-first against the
grammar (token bytes must be a legal continuation of the current FSM
state), and pick greedily or sample among the valid candidates with
renormalized probabilities. Token→bytes tables and (state, token)
transitions are memoized, so steady-state filtering touches only the
top few candidates.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from turboinfer_tpu.structured import json_fsm

_BYTE_RE = re.compile(r"^<0x([0-9A-Fa-f]{2})>$")


def token_bytes_table(tokenizer) -> List[Optional[bytes]]:
    """token id → raw bytes the token appends to the output text, or
    None for tokens constrained decoding must never emit (specials,
    padding, filler)."""
    toks = getattr(tokenizer, "tokens", None)
    if toks is None:
        raise ValueError("tokenizer exposes no .tokens table")
    special_ids = set(getattr(tokenizer, "special_ids", ()) or ())
    for attr in ("bos_id", "eos_id", "pad_id", "unk_id"):
        tid = getattr(tokenizer, attr, None)
        if tid is not None and tid >= 0:
            special_ids.add(tid)
    added = getattr(tokenizer, "added", {}) or {}
    special_ids.update(added.values())
    byte_level = bool(getattr(tokenizer, "byte_level", False))
    u2b = getattr(tokenizer, "_u2b", None)
    rep = "▁"
    ms = getattr(tokenizer, "_metaspace", None)
    if isinstance(ms, dict):
        rep = ms.get("replacement", "▁")

    table: List[Optional[bytes]] = []
    for i, piece in enumerate(toks):
        if i in special_ids or not piece or piece.startswith("<extra_"):
            table.append(None)
            continue
        m = _BYTE_RE.match(piece)
        if m:
            table.append(bytes([int(m.group(1), 16)]))
            continue
        if byte_level and u2b:
            try:
                table.append(bytes(u2b[ch] for ch in piece))
            except KeyError:
                table.append(None)
            continue
        table.append(piece.replace(rep, " ").encode("utf-8"))
    return table


class JsonTokenFilter:
    """Stateful per-request JSON constraint."""

    def __init__(self, tokenizer, require_object: bool = True,
                 max_candidates: int = 512):
        self.table = token_bytes_table(tokenizer)
        self.require_object = require_object
        self.max_candidates = max_candidates
        self.state = json_fsm.initial(require_object)
        # (state, token id) -> next state (None = illegal)
        self._trans: Dict[Tuple[json_fsm.State, int], object] = {}

    def reset(self):
        self.state = json_fsm.initial(self.require_object)

    @property
    def done(self) -> bool:
        return json_fsm.done(self.state)

    def _next_state(self, tid: int):
        key = (self.state, tid)
        if key in self._trans:
            return self._trans[key]
        bs = self.table[tid] if tid < len(self.table) else None
        nxt = json_fsm.advance_bytes(self.state, bs) if bs else None
        self._trans[key] = nxt
        return nxt

    def pick(self, logits: np.ndarray, temperature: float = 0.0,
             rng: Optional[np.random.Generator] = None) -> Optional[int]:
        """Choose the next token from [V] logits under the grammar and
        advance. Returns None only if NO vocab token is legal (never
        happens for sane vocabs — strings accept almost every byte)."""
        V = logits.shape[-1]
        K = min(self.max_candidates, V)
        # best-first candidate order without a full sort
        part = np.argpartition(logits, -K)[-K:]
        order = part[np.argsort(logits[part])[::-1]]
        valid: List[int] = []
        states = {}
        for tid in order:
            nxt = self._next_state(int(tid))
            if nxt is None:
                continue
            if temperature <= 0.0:
                self.state = nxt
                return int(tid)
            valid.append(int(tid))
            states[int(tid)] = nxt
            if len(valid) >= 64:          # plenty for sampling
                break
        if not valid:
            # fall back: scan the whole vocab once (rare)
            for tid in np.argsort(logits)[::-1]:
                nxt = self._next_state(int(tid))
                if nxt is not None:
                    self.state = nxt
                    return int(tid)
            return None
        x = logits[valid].astype(np.float64) / max(temperature, 1e-6)
        x -= x.max()
        p = np.exp(x)
        p /= p.sum()
        choice = int((rng or np.random.default_rng()).choice(valid, p=p))
        self.state = states[choice]
        return choice
