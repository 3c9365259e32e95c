"""Native turboio library tests: C++ vs pure-Python equivalence.

The native GGUF index parse and SPM encode must produce byte-identical
results to the Python implementations they accelerate; when the library
is unavailable these tests verify the fallback still works.
"""

import os

import numpy as np
import pytest

from turboinfer_tpu import native as tio
from turboinfer_tpu.loader import gguf
from turboinfer_tpu.tokenizer.bpe import SPMTokenizer


needs_native = pytest.mark.skipif(not tio.available(),
                                  reason="native turboio not built")


def _write_sample_gguf(tmp_path):
    path = str(tmp_path / "sample.gguf")
    md = {
        "general.architecture": "llama",
        "general.name": "native-test \"quoted\"\nnewline",
        "llama.embedding_length": 128,
        "llama.rope.freq_base": 10000.0,
        "flag": True,
        "tokenizer.ggml.tokens": ["<unk>", "▁a", "b", "<0x41>"],
        "tokenizer.ggml.scores": [0.0, -1.5, -2.25, -20.0],
        "ids": [3, 1, 4, 1, 5],
    }
    tensors = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.weight": np.ones((2, 8), np.float16),
    }
    gguf.write_gguf(path, md, tensors)
    return path


@needs_native
def test_native_gguf_index_matches_python(tmp_path):
    path = _write_sample_gguf(tmp_path)
    idx = tio.gguf_index(path)
    assert idx is not None

    os.environ["TURBOINFER_NO_NATIVE"] = "1"
    try:
        with gguf.read_gguf(path) as gf_py:
            assert idx["metadata"]["general.architecture"] == "llama"
            assert idx["metadata"]["general.name"] == \
                gf_py.metadata["general.name"]
            assert idx["metadata"]["flag"] is True
            assert idx["metadata"]["tokenizer.ggml.tokens"] == \
                gf_py.metadata["tokenizer.ggml.tokens"]
            np.testing.assert_allclose(
                idx["metadata"]["tokenizer.ggml.scores"],
                gf_py.metadata["tokenizer.ggml.scores"])
            assert idx["metadata"]["ids"] == gf_py.metadata["ids"]
            assert idx["data_start"] == gf_py.data_start
            for name, info in gf_py.tensors.items():
                ent = idx["tensors"][name]
                assert tuple(ent["dims"]) == info.dims
                assert ent["type"] == info.ggml_type
                assert ent["offset"] == info.offset
    finally:
        del os.environ["TURBOINFER_NO_NATIVE"]


@needs_native
def test_native_read_gguf_tensors(tmp_path):
    """Tensors load identically through the native-index path."""
    path = _write_sample_gguf(tmp_path)
    with gguf.read_gguf(path) as gf:
        np.testing.assert_array_equal(
            gf.tensor("a.weight"),
            np.arange(12, dtype=np.float32).reshape(3, 4))


@needs_native
def test_native_gguf_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.gguf")
    with open(path, "wb") as f:
        f.write(b"JUNKJUNKJUNKJUNKJUNKJUNK" + b"\x00" * 64)
    assert tio.gguf_index(path) is None


def _spm_vocab():
    tokens = ["<unk>", "<s>", "</s>", "▁", "h", "e", "l", "o", "he",
              "▁he", "ll", "llo", "▁hello", "w", "r", "d", "▁w", "or",
              "ld", "▁wor", "▁world"]
    scores = [0.0, 0.0, 0.0, -1, -2, -2, -2, -2, -7, -5, -6, -4, -3,
              -2, -2, -2, -5, -6, -7, -4, -3]
    byte_toks = [f"<0x{b:02X}>" for b in range(256)]
    return tokens + byte_toks, scores + [-20.0] * 256


@needs_native
def test_native_spm_matches_python():
    tokens, scores = _spm_vocab()
    py = SPMTokenizer(tokens, scores, bos_id=1, eos_id=2)
    nat = tio.NativeSPMEncoder(tokens, scores)
    for text in ["hello world", "hello", "zzz", "he llo", "",
                 "hello world hello world", "héllo ☃"]:
        # Force the Python path by disabling the native encoder.
        py._native = None
        py._native_tried = True
        ids_py = py.encode(text)
        ids_nat = nat.encode(text, bos_id=1, unk_id=0)
        assert ids_nat == ids_py, f"mismatch for {text!r}"


@needs_native
def test_tokenizer_uses_native_transparently():
    tokens, scores = _spm_vocab()
    tok = SPMTokenizer(tokens, scores, bos_id=1, eos_id=2)
    ids = tok.encode("hello world")          # native path
    assert tok._native is not None
    assert tok.decode(ids) == "hello world"
    assert tok.encode("hello", add_bos=True)[0] == 1


def test_fallback_when_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("TURBOINFER_NO_NATIVE", "1")
    tokens, scores = _spm_vocab()
    tok = SPMTokenizer(tokens, scores)
    assert tok.decode(tok.encode("hello world")) == "hello world"
    path = _write_sample_gguf(tmp_path)
    with gguf.read_gguf(path) as gf:
        assert "a.weight" in gf.tensors


@needs_native
def test_version():
    assert "turboio" in tio.version()


@needs_native
def test_ggml_dequant_bitexact_vs_numpy():
    """Native OpenMP block dequant must match the numpy golden forms
    bit-for-bit on every supported GGML type, including a ragged tail
    (n_elems not a multiple of the block size)."""
    import numpy as np
    rng = np.random.RandomState(7)
    cases = [(gguf.GGML_Q4_0, "Q4_0"), (gguf.GGML_Q4_1, "Q4_1"),
             (gguf.GGML_Q5_0, "Q5_0"), (gguf.GGML_Q5_1, "Q5_1"),
             (gguf.GGML_Q8_0, "Q8_0"), (gguf.GGML_Q2_K, "Q2_K"),
             (gguf.GGML_Q3_K, "Q3_K"), (gguf.GGML_Q4_K, "Q4_K"),
             (gguf.GGML_Q5_K, "Q5_K"), (gguf.GGML_Q6_K, "Q6_K"),
             (gguf.GGML_Q8_K, "Q8_K")]
    # fp16 d slot offset per type (Q8_K's d is fp32 at offset 0)
    d_off = {gguf.GGML_Q6_K: 208, gguf.GGML_Q2_K: 80, gguf.GGML_Q3_K: 108}
    for t, name in cases:
        be, bb = gguf._BLOCK_LAYOUT[t]
        # GGUF tensors are always whole blocks (row length % block == 0);
        # the numpy golden truncates ragged tails so only whole-block
        # sizes are comparable.
        for n in (be * 37, be * 64):
            nb = -(-n // be)
            raw = rng.randint(0, 255, nb * bb, dtype=np.uint8)
            # sane fp scales so the comparison avoids NaN != NaN
            blocks = raw.reshape(nb, bb)
            if t == gguf.GGML_Q8_K:
                d32 = (rng.rand(nb) * 0.02 + 1e-3).astype(np.float32)
                blocks[:, 0:4] = d32.view(np.uint8).reshape(-1, 4)
            else:
                d = (rng.rand(nb) * 0.02 + 1e-3).astype(np.float16)
                off = d_off.get(t, 0)
                blocks[:, off:off + 2] = d.view(np.uint8).reshape(-1, 2)
            if t in (gguf.GGML_Q4_1, gguf.GGML_Q5_1, gguf.GGML_Q4_K,
                     gguf.GGML_Q5_K):
                # the second fp16 slot (m / dmin) must be sane too —
                # random bytes decode to NaN and NaN != NaN
                m = (rng.rand(nb) * 0.01).astype(np.float16)
                blocks[:, 2:4] = m.view(np.uint8).reshape(-1, 2)
            if t == gguf.GGML_Q2_K:
                m = (rng.rand(nb) * 0.01).astype(np.float16)
                blocks[:, 82:84] = m.view(np.uint8).reshape(-1, 2)
            got = tio.ggml_dequant(raw, t, n)
            assert got is not None and got.shape == (n,), name
            saved_lib, saved_failed = tio._lib, tio._build_failed
            tio._lib, tio._build_failed = None, True
            try:
                want = gguf.dequantize_ggml(raw, t, n)
            finally:
                tio._lib, tio._build_failed = saved_lib, saved_failed
            assert np.array_equal(got, want), (name, n)


@needs_native
def test_ggml_dequant_unsupported_returns_none():
    import numpy as np
    assert tio.ggml_dequant(np.zeros(64, np.uint8), 999, 32) is None
