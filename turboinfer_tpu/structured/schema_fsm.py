"""JSON-SCHEMA-directed byte acceptor for constrained decoding.

Compiles a user-supplied JSON Schema (the subset users actually
constrain with: object types with required keys, string/number/integer/
boolean/null leaves, enums, nested objects, bounded arrays) into a flat
byte-level program whose states are hashable tuples — the same contract
as the generic json_fsm, so TokenMaskCache can build per-state vocab
masks and the scheduler applies them on-device as slot biases.

Output shape: canonical compact JSON — required properties in
declaration order, no optional properties, no whitespace. Every accept
path of the automaton is a document that validates against the schema
(for the supported subset).

Unsupported keywords raise SchemaError at compile time — honest errors
over silent drift. No reference analog (the reference has no
constrained decoding at all).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

_DIGITS = b"0123456789"
_HEX = b"0123456789abcdefABCDEF"

# default cap for arrays with no maxItems: the grammar must stay finite
DEFAULT_MAX_ITEMS = 64
# longest number literal the grammar admits (bounds generation length)
MAX_NUM_LEN = 24


class SchemaError(ValueError):
    pass


# State = (pc, sub, stack)
#   pc: index into the instruction program
#   sub: in-instruction progress (lit position, string/number payload,
#        viable-choice tuple)
#   stack: tuple of [open_pc, items_done] pairs for nested arrays
State = Tuple[int, Any, Tuple]


class SchemaFSM:
    """Compiled schema program. Instructions:
    ("lit", bytes)                fixed bytes (keys, punctuation)
    ("str",)                      free JSON string incl. quotes
    ("num", int_only)             JSON number (integer: no . / e)
    ("choice", (bytes, ...))      one of N rendered literals (enums)
    ("arr_open", min, max, body_pc, after_pc)
    ("arr_sep", open_pc)          after an item: ',' more or ']' close
    ("end",)                      document complete
    """

    def __init__(self, schema: Dict[str, Any]):
        self.prog: List[tuple] = []
        self._compile(schema)
        self.prog.append(("end",))

    # -- compilation ----------------------------------------------------

    def _lit(self, bs: bytes):
        # merge adjacent literals so lit positions stay small (the
        # None check matters: an arr_open placeholder may precede us —
        # array-of-objects crashed here before)
        if (self.prog and self.prog[-1] is not None
                and self.prog[-1][0] == "lit"):
            self.prog[-1] = ("lit", self.prog[-1][1] + bs)
        else:
            self.prog.append(("lit", bs))

    def _compile(self, schema: Dict[str, Any]):
        if not isinstance(schema, dict):
            raise SchemaError(f"schema must be an object, got "
                              f"{type(schema).__name__}")
        if "$ref" in schema:
            raise SchemaError("$ref is not supported")
        if "enum" in schema:
            alts = tuple(json.dumps(v, ensure_ascii=True,
                                    separators=(",", ":")).encode()
                         for v in schema["enum"])
            if len(set(alts)) != len(alts) or not alts:
                raise SchemaError("enum must be non-empty and distinct")
            for a in alts:
                for b in alts:
                    if a != b and b.startswith(a):
                        raise SchemaError(
                            f"enum literal {a!r} is a prefix of {b!r}; "
                            "ambiguous under byte-level constraint")
            self.prog.append(("choice", alts))
            return
        if "const" in schema:
            self._lit(json.dumps(schema["const"], ensure_ascii=True,
                                 separators=(",", ":")).encode())
            return
        t = schema.get("type")
        if isinstance(t, list):
            raise SchemaError("union types are not supported")
        if t == "object":
            props = schema.get("properties") or {}
            required = schema.get("required")
            keys = [k for k in props
                    if required is None or k in required]
            if required is not None:
                missing = [k for k in required if k not in props]
                if missing:
                    raise SchemaError(f"required keys {missing} not in "
                                      "properties")
                keys = [k for k in props if k in required]
            self._lit(b"{")
            for i, k in enumerate(keys):
                if i:
                    self._lit(b",")
                self._lit(json.dumps(k, ensure_ascii=True).encode()
                          + b":")
                self._compile(props[k])
            self._lit(b"}")
            return
        if t == "string":
            mn = int(schema.get("minLength", 0))
            mx = schema.get("maxLength")
            mx = None if mx is None else int(mx)
            if mx is not None and (mx < mn or mx < 0):
                raise SchemaError(f"bad string bounds [{mn}, {mx}]")
            self.prog.append(("str", mn, mx))
            return
        if t in ("number", "integer"):
            self.prog.append(("num", t == "integer"))
            return
        if t == "boolean":
            self.prog.append(("choice", (b"true", b"false")))
            return
        if t == "null":
            self._lit(b"null")
            return
        if t == "array":
            mn = int(schema.get("minItems", 0))
            mx = int(schema.get("maxItems", DEFAULT_MAX_ITEMS))
            if mx < mn or mx < 0:
                raise SchemaError(f"bad array bounds [{mn}, {mx}]")
            items = schema.get("items")
            if items is None:
                raise SchemaError("array needs an 'items' schema")
            open_pc = len(self.prog)
            self.prog.append(None)               # patched below
            body_pc = len(self.prog)
            self._compile(items)
            self.prog.append(("arr_sep", open_pc))
            after_pc = len(self.prog)
            self.prog[open_pc] = ("arr_open", mn, mx, body_pc, after_pc)
            return
        raise SchemaError(f"unsupported schema node: "
                          f"{json.dumps(schema)[:80]}")

    # -- runtime --------------------------------------------------------

    def initial(self) -> State:
        return (0, "", ())

    def done(self, state: State) -> bool:
        """The document is COMPLETE — nothing may follow."""
        return self.prog[state[0]][0] == "end"

    def may_finish(self, state: State) -> bool:
        """The document WOULD be valid if generation stopped here (a
        top-level number at a terminal digit can either continue or
        end). bias_row leaves EOS legal at such states ALONGSIDE the
        continuations — done() used to claim these states were final,
        which froze top-level numbers after their first token."""
        pc, sub, stack = state
        ins = self.prog[pc]
        return (ins[0] == "num" and isinstance(sub, tuple)
                and sub[0] in ("0", "i", "f", "ed")
                and self.prog[pc + 1][0] == "end")

    def mask_key(self, state: State):
        """Canonical key for mask caching. Free-string body states with
        no maxLength are collapsed once past minLength (their legal
        token set no longer depends on the exact count) — otherwise a
        long unbounded string would mint a fresh full-vocab mask per
        generated token and grow the cache without bound."""
        pc, sub, stack = state
        ins = self.prog[pc]
        if (ins[0] == "str" and isinstance(sub, tuple)
                and ins[2] is None and sub[1] >= ins[1]):
            return (pc, (sub[0], ins[1]), stack)
        return state

    def _enter(self, pc: int, stack: Tuple) -> State:
        """Fresh state at instruction pc (normalizing choice sub)."""
        ins = self.prog[pc]
        if ins[0] == "choice":
            return (pc, (0, tuple(range(len(ins[1])))), stack)
        return (pc, "", stack)

    def advance(self, state: State, b: int) -> Optional[State]:
        pc, sub, stack = state
        ins = self.prog[pc]
        kind = ins[0]

        if kind == "end":
            return None

        if kind == "lit":
            pos = sub if isinstance(sub, int) else 0
            if ins[1][pos] != b:
                return None
            pos += 1
            if pos == len(ins[1]):
                return self._enter(pc + 1, stack)
            return (pc, pos, stack)

        if kind == "str":
            # sub: "" start (expect '"'); ("b", n) body with n content
            # chars so far; ("\\", n) escape; ("uK", n) unicode escape
            # with K hex digits left. minLength/maxLength bound n (an
            # escape sequence counts as one char; raw multi-byte UTF-8
            # counts per byte — documented approximation).
            mn, mx = ins[1], ins[2]
            if sub == "":
                return (pc, ("b", 0), stack) if b == 0x22 else None
            tag, n = sub
            if tag.startswith("u"):
                if b not in _HEX:
                    return None
                left = int(tag[1:]) - 1
                return (pc, (f"u{left}", n) if left else ("b", n + 1),
                        stack)
            if tag == "\\":
                if b in b'"\\/bfnrt':
                    return (pc, ("b", n + 1), stack)
                if b == ord("u"):
                    return (pc, ("u4", n), stack)
                return None
            if b == 0x22:                         # closing quote
                return self._enter(pc + 1, stack) if n >= mn else None
            if mx is not None and n >= mx:
                return None                       # only '"' may follow
            if b == 0x5C:                         # backslash
                return (pc, ("\\", n), stack)
            return (pc, ("b", n + 1), stack) if b >= 0x20 else None

        if kind == "num":
            from turboinfer_tpu.structured.json_fsm import _num_advance
            int_only = ins[1]
            c = chr(b)
            if sub == "":
                if c == "-":
                    return (pc, ("-", 1), stack)
                if c == "0":
                    return (pc, ("0", 1), stack)
                if b in _DIGITS:
                    return (pc, ("i", 1), stack)
                return None
            s, n = sub
            if int_only and c in ".eE":
                return None
            nxt = _num_advance(b, s, ())
            if nxt == "END":
                # delimiter byte belongs to the next instruction
                return self.advance(self._enter(pc + 1, stack), b)
            if nxt is None or n >= MAX_NUM_LEN:
                return None        # length cap keeps the grammar finite
            return (pc, (nxt[1], n + 1), stack)

        if kind == "choice":
            pos, viable = sub if isinstance(sub, tuple) else (
                0, tuple(range(len(ins[1]))))
            nxt_viable = tuple(i for i in viable
                               if len(ins[1][i]) > pos
                               and ins[1][i][pos] == b)
            if not nxt_viable:
                return None
            # compile-time prefix check guarantees at most one
            # alternative completes, and none remain viable past it
            for i in nxt_viable:
                if len(ins[1][i]) == pos + 1:
                    return self._enter(pc + 1, stack)
            return (pc, (pos + 1, nxt_viable), stack)

        if kind == "arr_open":
            mn, mx, body_pc, after_pc = ins[1:]
            if sub == "":
                if b != 0x5B:                    # '['
                    return None
                return (pc, "in", stack)
            # sub == "in": expecting first item or ']'
            if b == 0x5D and mn == 0:            # ']'
                return self._enter(after_pc, stack)
            if mx == 0:
                return None
            st = self._enter(body_pc, stack + ((pc, 0),))
            return self.advance(st, b)

        if kind == "arr_sep":
            open_pc = ins[1]
            mn, mx, body_pc, after_pc = self.prog[open_pc][1:]
            top_pc, n_done = stack[-1]
            assert top_pc == open_pc
            done_items = n_done + 1
            if b == 0x2C:                        # ','
                if done_items >= mx:
                    return None
                return self._enter(body_pc,
                                   stack[:-1] + ((open_pc, done_items),))
            if b == 0x5D:                        # ']'
                if done_items < mn:
                    return None
                return self._enter(after_pc, stack[:-1])
            return None

        raise AssertionError(f"bad instruction {ins}")

    def advance_bytes(self, state: State, bs: bytes) -> Optional[State]:
        for b in bs:
            state = self.advance(state, b)
            if state is None:
                return None
        return state
