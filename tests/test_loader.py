"""Loader tests: GGUF round-trip, dequant correctness, SafeTensors,
TINQ persistence, name mapping, honest format errors.

Reference test counterparts: test_model_loader.cpp (format detect /
validate), test_quantization_persistence.cpp (TINQ round-trip with
metadata/shape/dtype assertions).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import turboinfer_tpu as ti
from turboinfer_tpu.config import QuantizationConfig, QuantType
from turboinfer_tpu.loader import (gguf, loader, mapping, safetensors,
                                   synthetic, tinq)
from turboinfer_tpu.models import llama


# ---------------------------------------------------------------------------
# GGUF container
# ---------------------------------------------------------------------------

def test_gguf_metadata_roundtrip(tmp_path):
    path = str(tmp_path / "m.gguf")
    md = {
        "general.architecture": "llama",
        "general.name": "unit-test",
        "llama.embedding_length": 128,
        "llama.block_count": 2,
        "llama.rope.freq_base": 10000.0,
        "some.flag": True,
        "tokenizer.ggml.tokens": ["<unk>", "<s>", "</s>", "he", "llo"],
        "tokenizer.ggml.scores": [0.0, 0.0, 0.0, -1.0, -2.0],
        "ids.array": [1, 2, 3, 4],
    }
    tensors = {
        "token_embd.weight": np.random.randn(5, 8).astype(np.float32),
        "output_norm.weight": np.ones(8, np.float32),
        "half.weight": np.random.randn(4, 8).astype(np.float16),
    }
    gguf.write_gguf(path, md, tensors)
    with gguf.read_gguf(path) as gf:
        assert gf.metadata["general.architecture"] == "llama"
        assert gf.metadata["llama.embedding_length"] == 128
        assert gf.metadata["some.flag"] is True
        # arrays parsed for real (reference skips them)
        assert gf.metadata["tokenizer.ggml.tokens"][3] == "he"
        assert gf.metadata["ids.array"] == [1, 2, 3, 4]
        assert pytest.approx(gf.metadata["tokenizer.ggml.scores"][4]) == -2.0
        np.testing.assert_allclose(
            gf.tensor("token_embd.weight"), tensors["token_embd.weight"],
            rtol=0, atol=0)
        np.testing.assert_allclose(
            gf.tensor("half.weight"),
            tensors["half.weight"].astype(np.float32))


def test_gguf_bad_magic(tmp_path):
    path = str(tmp_path / "bad.gguf")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        gguf.read_gguf(path)


# ---------------------------------------------------------------------------
# GGML block dequantization vs naive per-element spec implementation
# ---------------------------------------------------------------------------

def _f16b(x):
    return np.float16(x).tobytes()


def test_dequant_q4_0_manual():
    # one block: d=0.5, nibbles 0..15 then 0..15 -> (q-8)*d
    d = 0.5
    qs = bytes((i | (i << 4)) for i in range(16))
    raw = np.frombuffer(_f16b(d) + qs, np.uint8)
    out = gguf.dequantize_ggml(raw, gguf.GGML_Q4_0, 32)
    lo = [(i - 8) * d for i in range(16)]
    hi = [(i - 8) * d for i in range(16)]
    np.testing.assert_allclose(out, np.array(lo + hi, np.float32), atol=1e-3)


def test_dequant_q8_0_manual():
    d = 0.25
    q = np.arange(-16, 16, dtype=np.int8)
    raw = np.frombuffer(_f16b(d) + q.tobytes(), np.uint8)
    out = gguf.dequantize_ggml(raw, gguf.GGML_Q8_0, 32)
    np.testing.assert_allclose(out, q.astype(np.float32) * d, atol=1e-3)


def _naive_unpack_kscales(sb):
    sc, mn = np.zeros(8), np.zeros(8)
    for j in range(4):
        sc[j] = sb[j] & 63
        mn[j] = sb[j + 4] & 63
    for j in range(4, 8):
        sc[j] = (sb[j + 4] & 0x0F) | ((sb[j - 4] >> 6) << 4)
        mn[j] = (sb[j + 4] >> 4) | ((sb[j] >> 6) << 4)
    return sc, mn


def test_dequant_q4_k_vs_naive():
    rng = np.random.RandomState(0)
    nb = 3
    blocks = rng.randint(0, 256, size=(nb, 144), dtype=np.uint8)
    # plant valid f16 d / dmin
    for i in range(nb):
        blocks[i, 0:2] = np.frombuffer(_f16b(0.01 * (i + 1)), np.uint8)
        blocks[i, 2:4] = np.frombuffer(_f16b(0.02 * (i + 1)), np.uint8)
    out = gguf.dequantize_ggml(blocks.reshape(-1), gguf.GGML_Q4_K, nb * 256)

    expected = np.zeros(nb * 256, np.float32)
    for i in range(nb):
        d = np.frombuffer(blocks[i, 0:2].tobytes(), np.float16)[0]
        dmin = np.frombuffer(blocks[i, 2:4].tobytes(), np.float16)[0]
        sc, mn = _naive_unpack_kscales(blocks[i, 4:16])
        qs = blocks[i, 16:144]
        y = i * 256
        for j in range(0, 256, 64):
            isub = 2 * (j // 64)
            d1, m1 = float(d) * sc[isub], float(dmin) * mn[isub]
            d2, m2 = float(d) * sc[isub + 1], float(dmin) * mn[isub + 1]
            q = qs[32 * (j // 64): 32 * (j // 64) + 32]
            for l in range(32):
                expected[y + j + l] = d1 * (q[l] & 0xF) - m1
            for l in range(32):
                expected[y + j + 32 + l] = d2 * (q[l] >> 4) - m2
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_dequant_q6_k_vs_naive():
    rng = np.random.RandomState(1)
    nb = 2
    blocks = rng.randint(0, 256, size=(nb, 210), dtype=np.uint8)
    for i in range(nb):
        blocks[i, 208:210] = np.frombuffer(_f16b(0.03), np.uint8)
    out = gguf.dequantize_ggml(blocks.reshape(-1), gguf.GGML_Q6_K, nb * 256)

    expected = np.zeros(nb * 256, np.float32)
    for i in range(nb):
        d = float(np.frombuffer(blocks[i, 208:210].tobytes(), np.float16)[0])
        ql = blocks[i, 0:128]
        qh = blocks[i, 128:192]
        sc = blocks[i, 192:208].view(np.int8)
        y = i * 256
        for half in range(2):
            qlh = ql[64 * half: 64 * half + 64]
            qhh = qh[32 * half: 32 * half + 32]
            sch = sc[8 * half: 8 * half + 8]
            base = y + 128 * half
            for l in range(32):
                iss = l // 16
                lo, lo32 = int(qlh[l]), int(qlh[l + 32])
                h = int(qhh[l])
                q1 = ((lo & 0xF) | (((h >> 0) & 3) << 4)) - 32
                q2 = ((lo32 & 0xF) | (((h >> 2) & 3) << 4)) - 32
                q3 = ((lo >> 4) | (((h >> 4) & 3) << 4)) - 32
                q4 = ((lo32 >> 4) | (((h >> 6) & 3) << 4)) - 32
                expected[base + l] = d * sch[iss] * q1
                expected[base + 32 + l] = d * sch[iss + 2] * q2
                expected[base + 64 + l] = d * sch[iss + 4] * q3
                expected[base + 96 + l] = d * sch[iss + 6] * q4
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_dequant_q5_0_manual():
    d = 0.125
    qs = bytes((i | ((31 - i) << 4)) & 0xFF for i in range(16))
    qh = 0
    for idx in range(32):
        if idx % 3 == 0:
            qh |= 1 << idx
    raw = np.frombuffer(_f16b(d) + qh.to_bytes(4, "little") + qs, np.uint8)
    out = gguf.dequantize_ggml(raw, gguf.GGML_Q5_0, 32)
    expected = np.zeros(32, np.float32)
    for idx in range(32):
        if idx < 16:
            low = idx
        else:
            low = (31 - (idx - 16)) & 0xF
        h = (qh >> idx) & 1
        expected[idx] = ((low | (h << 4)) - 16) * d
    np.testing.assert_allclose(out, expected, atol=1e-3)


def test_dequant_q2_k_vs_naive():
    """Vectorized Q2_K vs a scalar transcription of llama.cpp's
    dequantize_row_q2_K loop (is-counter order, shift order)."""
    rng = np.random.RandomState(2)
    nb = 3
    blocks = rng.randint(0, 256, size=(nb, 84), dtype=np.uint8)
    for i in range(nb):
        blocks[i, 80:82] = np.frombuffer(_f16b(0.02 * (i + 1)), np.uint8)
        blocks[i, 82:84] = np.frombuffer(_f16b(0.01 * (i + 1)), np.uint8)
    out = gguf.dequantize_ggml(blocks.reshape(-1), gguf.GGML_Q2_K, nb * 256)

    expected = np.zeros(nb * 256, np.float32)
    for i in range(nb):
        d = float(np.frombuffer(blocks[i, 80:82].tobytes(), np.float16)[0])
        dmin = float(np.frombuffer(blocks[i, 82:84].tobytes(),
                                   np.float16)[0])
        scales = blocks[i, 0:16]
        qs = blocks[i, 16:80]
        y = i * 256
        pos, is_ = 0, 0
        for n in (0, 128):
            q = qs[n // 4: n // 4 + 32]
            shift = 0
            for _ in range(4):
                for grp in range(2):
                    sc = int(scales[is_]); is_ += 1
                    dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                    for l in range(16):
                        expected[y + pos] = \
                            dl * ((int(q[l + 16 * grp]) >> shift) & 3) - ml
                        pos += 1
                shift += 2
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_dequant_q3_k_vs_naive():
    """Vectorized Q3_K vs a scalar transcription of llama.cpp's
    dequantize_row_q3_K (kmask aux-word scale shuffle, hmask m<<=1)."""
    rng = np.random.RandomState(3)
    nb = 2
    blocks = rng.randint(0, 256, size=(nb, 110), dtype=np.uint8)
    for i in range(nb):
        blocks[i, 108:110] = np.frombuffer(_f16b(0.015), np.uint8)
    out = gguf.dequantize_ggml(blocks.reshape(-1), gguf.GGML_Q3_K, nb * 256)

    expected = np.zeros(nb * 256, np.float32)
    kmask1, kmask2 = 0x03030303, 0x0F0F0F0F
    for i in range(nb):
        d = float(np.frombuffer(blocks[i, 108:110].tobytes(),
                                np.float16)[0])
        hm = blocks[i, 0:32]
        qs = blocks[i, 32:96]
        aux = list(np.frombuffer(blocks[i, 96:108].tobytes(), np.uint32))
        tmp = int(aux[2])
        a = [0, 0, 0, 0]
        a[2] = ((int(aux[0]) >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4)
        a[3] = ((int(aux[1]) >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4)
        a[0] = (int(aux[0]) & kmask2) | (((tmp >> 0) & kmask1) << 4)
        a[1] = (int(aux[1]) & kmask2) | (((tmp >> 2) & kmask1) << 4)
        scales = np.array(a, dtype=np.uint32).view(np.int8)
        y = i * 256
        pos, is_, m = 0, 0, 1
        for n in (0, 128):
            q = qs[n // 4: n // 4 + 32]
            shift = 0
            for _ in range(4):
                for grp in range(2):
                    dl = d * (int(scales[is_]) - 32); is_ += 1
                    for l in range(16):
                        hi = 0 if (int(hm[l + 16 * grp]) & m) else 4
                        expected[y + pos] = \
                            dl * (((int(q[l + 16 * grp]) >> shift) & 3) - hi)
                        pos += 1
                shift += 2
                m <<= 1
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_dequant_q8_k():
    rng = np.random.RandomState(4)
    nb = 2
    blocks = np.zeros((nb, 292), np.uint8)
    for i in range(nb):
        blocks[i, 0:4] = np.frombuffer(
            np.float32(0.05 * (i + 1)).tobytes(), np.uint8)
        blocks[i, 4:260] = rng.randint(0, 256, 256, dtype=np.uint8)
    out = gguf.dequantize_ggml(blocks.reshape(-1), gguf.GGML_Q8_K, nb * 256)
    expected = np.concatenate(
        [blocks[i, 4:260].view(np.int8).astype(np.float32) * (0.05 * (i + 1))
         for i in range(nb)])
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_unsupported_ggml_type_raises():
    with pytest.raises(ValueError, match="unsupported"):
        gguf.dequantize_ggml(np.zeros(100, np.uint8), gguf.GGML_Q8_1, 32)


# ---------------------------------------------------------------------------
# SafeTensors
# ---------------------------------------------------------------------------

def test_safetensors_roundtrip(tmp_path):
    path = str(tmp_path / "m.safetensors")
    tensors = {
        "a": np.random.randn(4, 6).astype(np.float32),
        "b": np.random.randn(3).astype(np.float16),
        "c": np.arange(10, dtype=np.int8),
    }
    safetensors.write_safetensors(path, tensors, metadata={"who": "test"})
    with safetensors.read_safetensors(path) as sf:
        assert set(sf.keys()) == {"a", "b", "c"}
        assert sf.metadata["who"] == "test"
        np.testing.assert_array_equal(sf.tensor("a"), tensors["a"])
        np.testing.assert_array_equal(sf.tensor("b"), tensors["b"])
        np.testing.assert_array_equal(sf.tensor("c"), tensors["c"])


def test_safetensors_size_validation(tmp_path):
    import json
    import struct
    path = str(tmp_path / "bad.safetensors")
    header = {"x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 8]}}
    h = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(h)) + h + b"\x00" * 8)
    with pytest.raises(ValueError, match="expected"):
        safetensors.read_safetensors(path)


# ---------------------------------------------------------------------------
# Name mapping + end-to-end GGUF model load
# ---------------------------------------------------------------------------

def _export_tiny_gguf(tmp_path, tiny_params, tiny_cfg, names="gguf"):
    """Write tiny_params as a GGUF file under the given name convention."""
    t = {}
    p = tiny_params
    layers = p["layers"]

    def np32(x):
        return np.asarray(x, np.float32)

    if names == "gguf":
        t["token_embd.weight"] = np32(p["embed"])
        t["output_norm.weight"] = np32(p["final_norm"])
        t["output.weight"] = np32(p["lm_head"]).T  # file layout [out, in]
        fmt = dict(attn_norm="blk.{i}.attn_norm.weight",
                   ffn_norm="blk.{i}.ffn_norm.weight",
                   wq="blk.{i}.attn_q.weight", wk="blk.{i}.attn_k.weight",
                   wv="blk.{i}.attn_v.weight",
                   wo="blk.{i}.attn_output.weight",
                   w_gate="blk.{i}.ffn_gate.weight",
                   w_up="blk.{i}.ffn_up.weight",
                   w_down="blk.{i}.ffn_down.weight")
    else:  # HF convention
        t["model.embed_tokens.weight"] = np32(p["embed"])
        t["model.norm.weight"] = np32(p["final_norm"])
        t["lm_head.weight"] = np32(p["lm_head"]).T
        fmt = dict(attn_norm="model.layers.{i}.input_layernorm.weight",
                   ffn_norm="model.layers.{i}.post_attention_layernorm.weight",
                   wq="model.layers.{i}.self_attn.q_proj.weight",
                   wk="model.layers.{i}.self_attn.k_proj.weight",
                   wv="model.layers.{i}.self_attn.v_proj.weight",
                   wo="model.layers.{i}.self_attn.o_proj.weight",
                   w_gate="model.layers.{i}.mlp.gate_proj.weight",
                   w_up="model.layers.{i}.mlp.up_proj.weight",
                   w_down="model.layers.{i}.mlp.down_proj.weight")
    norm_slots = {"attn_norm", "ffn_norm"}
    for i in range(tiny_cfg.num_layers):
        for slot, tmpl in fmt.items():
            arr = np32(layers[slot][i])
            if slot not in norm_slots:
                arr = arr.T              # runtime [in,out] -> file [out,in]
            t[tmpl.format(i=i)] = arr

    md = {
        "general.architecture": "llama",
        "general.name": "tiny-export",
        "llama.embedding_length": tiny_cfg.hidden_size,
        "llama.block_count": tiny_cfg.num_layers,
        "llama.attention.head_count": tiny_cfg.num_heads,
        "llama.attention.head_count_kv": tiny_cfg.kv_heads,
        "llama.feed_forward_length": tiny_cfg.ffn_dim,
        "llama.rope.freq_base": tiny_cfg.rope_theta,
        "llama.attention.layer_norm_rms_epsilon": tiny_cfg.rms_norm_eps,
        "llama.context_length": tiny_cfg.max_seq_len,
    }
    path = str(tmp_path / f"tiny_{names}.gguf")
    gguf.write_gguf(path, md, t)
    return path


@pytest.mark.parametrize("convention", ["gguf", "hf"])
def test_gguf_end_to_end(tmp_path, tiny_params, tiny_cfg, convention):
    path = _export_tiny_gguf(tmp_path, tiny_params, tiny_cfg, convention)
    data = loader.load_model_data(path, dtype=jnp.float32)
    assert data.config.hidden_size == tiny_cfg.hidden_size
    assert data.config.num_layers == tiny_cfg.num_layers
    assert data.config.num_heads == tiny_cfg.num_heads

    # Loaded weights reproduce the original logits exactly (fp32).
    tokens = jnp.asarray([[1, 5, 42, 7]], jnp.int32)
    ref_cfg = tiny_cfg
    want = llama.forward_no_cache(tiny_params, ref_cfg, tokens)
    got = llama.forward_no_cache(data.params, data.config.replace(
        dtype=jnp.float32, rope_mode=ref_cfg.rope_mode), tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_pytorch_corrupt_file_raises(tmp_path):
    path = str(tmp_path / "model.pt")
    with open(path, "wb") as f:
        f.write(b"PK\x03\x04" + b"\x00" * 100)
    with pytest.raises(ValueError, match="cannot read"):
        loader.load_model_data(path)


def test_onnx_honest_error(tmp_path):
    path = str(tmp_path / "model.onnx")
    with open(path, "wb") as f:
        f.write(b"\x00" * 16)
    with pytest.raises(ValueError, match="not supported"):
        loader.load_model_data(path)


def test_detect_format():
    assert loader.detect_format("x.gguf") == "gguf"
    assert loader.detect_format("x.safetensors") == "safetensors"
    assert loader.detect_format("x.tinq") == "tinq"
    assert loader.detect_format("x.pt") == "pytorch"
    assert loader.detect_format("x.onnx") == "onnx"
    assert loader.detect_format("x.xyz") == "unknown"


# ---------------------------------------------------------------------------
# TINQ persistence round-trip (reference: test_quantization_persistence.cpp)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qtype", [QuantType.INT8, QuantType.INT4])
def test_tinq_roundtrip(tmp_path, tiny_params, tiny_cfg, qtype):
    from turboinfer_tpu.quant.quantizer import quantize_params
    qcfg = QuantizationConfig(type=qtype, group_size=32)
    qparams = quantize_params(tiny_params, qcfg)
    path = str(tmp_path / "model.tinq")
    tinq.save(path, qparams, tiny_cfg, qcfg, {"creator": "unit-test"})

    params2, cfg2, qcfg2, meta = tinq.load(path)
    assert cfg2.hidden_size == tiny_cfg.hidden_size
    assert cfg2.num_layers == tiny_cfg.num_layers
    assert qcfg2.type == qtype
    assert qcfg2.group_size == 32
    assert meta["creator"] == "unit-test"

    # identical logits from saved vs in-memory quantized params
    tokens = jnp.asarray([[1, 5, 42, 7, 99]], jnp.int32)
    want = llama.forward_no_cache(qparams, tiny_cfg, tokens)
    got = llama.forward_no_cache(params2, tiny_cfg, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tinq_bad_magic(tmp_path):
    path = str(tmp_path / "bad.tinq")
    with open(path, "wb") as f:
        f.write(b"XXXX" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        tinq.load(path)


def test_quantize_model_file(tmp_path, tiny_params, tiny_cfg):
    """One-shot pipeline (reference: quantize_model_file,
    quantization.cpp:651-658): gguf -> quantize -> tinq -> engine."""
    from turboinfer_tpu.quant.quantizer import quantize_model_file
    src = _export_tiny_gguf(tmp_path, tiny_params, tiny_cfg, "gguf")
    dst = str(tmp_path / "tiny-int8.tinq")
    quantize_model_file(src, dst, QuantizationConfig(
        type=QuantType.INT8, group_size=32))
    eng = ti.load_model(dst)
    res = eng.generate([1, 5, 42], max_new_tokens=8, temperature=0.0)
    assert len(res.tokens) > 3


# ---------------------------------------------------------------------------
# Synthetic factory
# ---------------------------------------------------------------------------

def test_synthetic_model_generates():
    data = synthetic.create_synthetic_model(dtype=jnp.float32)
    assert data.source_format == "synthetic"
    eng = ti.InferenceEngine(data.params, data.config,
                             tokenizer=data.tokenizer)
    res = eng.generate(data.tokenizer.encode("hello"), max_new_tokens=4)
    assert len(res.tokens) >= 4
    assert "synthetic" in data.summary()


def test_synthetic_quantized_model():
    """Direct-packed random quantized fixture (perf-bench factory)."""
    import jax.numpy as jnp
    from turboinfer_tpu.config import ModelConfig
    from turboinfer_tpu.core.qtensor import QTensor
    from turboinfer_tpu.loader.synthetic import \
        create_synthetic_quantized_model
    cfg = ModelConfig(vocab_size=512, hidden_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=256,
                      max_seq_len=64, dtype=jnp.bfloat16, name="sq")
    data = create_synthetic_quantized_model(cfg, bits=4, group_size=32)
    assert isinstance(data.params["layers"]["wq"], QTensor)
    assert data.params["layers"]["wq"].data.shape == (2, 64, 128)
    eng = ti.InferenceEngine(data.params, cfg)
    res = eng.generate([1, 5, 9], 6, temperature=0.0)
    assert len(res.tokens) == 9


# ---------------------------------------------------------------------------
# Sharded safetensors, checkpoint directories, real PyTorch loads
# ---------------------------------------------------------------------------

def _hf_named_tensors(tiny_params, tiny_cfg):
    """tiny_params → HF-named fp32 tensor dict (file layout [out, in])."""
    p, layers = tiny_params, tiny_params["layers"]
    t = {"model.embed_tokens.weight": np.asarray(p["embed"], np.float32),
         "model.norm.weight": np.asarray(p["final_norm"], np.float32),
         "lm_head.weight": np.asarray(p["lm_head"], np.float32).T}
    fmt = dict(attn_norm="model.layers.{i}.input_layernorm.weight",
               ffn_norm="model.layers.{i}.post_attention_layernorm.weight",
               wq="model.layers.{i}.self_attn.q_proj.weight",
               wk="model.layers.{i}.self_attn.k_proj.weight",
               wv="model.layers.{i}.self_attn.v_proj.weight",
               wo="model.layers.{i}.self_attn.o_proj.weight",
               w_gate="model.layers.{i}.mlp.gate_proj.weight",
               w_up="model.layers.{i}.mlp.up_proj.weight",
               w_down="model.layers.{i}.mlp.down_proj.weight")
    for i in range(tiny_cfg.num_layers):
        for slot, tmpl in fmt.items():
            arr = np.asarray(layers[slot][i], np.float32)
            if slot not in ("attn_norm", "ffn_norm"):
                arr = arr.T
            t[tmpl.format(i=i)] = arr
    return t


def _hf_config_dict(tiny_cfg):
    return {"model_type": "llama", "vocab_size": tiny_cfg.vocab_size,
            "hidden_size": tiny_cfg.hidden_size,
            "num_hidden_layers": tiny_cfg.num_layers,
            "num_attention_heads": tiny_cfg.num_heads,
            "num_key_value_heads": tiny_cfg.kv_heads,
            "intermediate_size": tiny_cfg.ffn_dim,
            "rope_theta": tiny_cfg.rope_theta,
            "rms_norm_eps": tiny_cfg.rms_norm_eps,
            "max_position_embeddings": tiny_cfg.max_seq_len}


def _assert_logits_match(data, tiny_params, tiny_cfg):
    tokens = jnp.asarray([[1, 5, 42, 7]], jnp.int32)
    want = llama.forward_no_cache(tiny_params, tiny_cfg, tokens)
    got = llama.forward_no_cache(data.params, data.config.replace(
        dtype=jnp.float32, rope_mode=tiny_cfg.rope_mode), tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sharded_safetensors_end_to_end(tmp_path, tiny_params, tiny_cfg):
    import json
    t = _hf_named_tensors(tiny_params, tiny_cfg)
    names = sorted(t)
    half = len(names) // 2
    shards = {"model-00001-of-00002.safetensors": names[:half],
              "model-00002-of-00002.safetensors": names[half:]}
    weight_map = {}
    for fname, keys in shards.items():
        safetensors.write_safetensors(str(tmp_path / fname),
                                      {k: t[k] for k in keys})
        weight_map.update({k: fname for k in keys})
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_hf_config_dict(tiny_cfg), f)

    # via the index file AND via the directory entry point
    for target in [str(tmp_path / "model.safetensors.index.json"),
                   str(tmp_path)]:
        data = loader.load_model_data(target, dtype=jnp.float32)
        assert data.source_format == "safetensors"
        assert data.config.num_layers == tiny_cfg.num_layers
        _assert_logits_match(data, tiny_params, tiny_cfg)


def test_checkpoint_dir_single_safetensors(tmp_path, tiny_params, tiny_cfg):
    import json
    safetensors.write_safetensors(str(tmp_path / "model.safetensors"),
                                  _hf_named_tensors(tiny_params, tiny_cfg))
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_hf_config_dict(tiny_cfg), f)
    data = loader.load_model_data(str(tmp_path), dtype=jnp.float32)
    _assert_logits_match(data, tiny_params, tiny_cfg)


def test_pytorch_real_load(tmp_path, tiny_params, tiny_cfg):
    """PyTorch .bin loads REAL weights (reference fabricates random
    ones — model_loader.cpp:1160-1568, quirk #10)."""
    import json
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(v)
          for k, v in _hf_named_tensors(tiny_params, tiny_cfg).items()}
    torch.save(sd, str(tmp_path / "pytorch_model.bin"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_hf_config_dict(tiny_cfg), f)
    data = loader.load_model_data(str(tmp_path / "pytorch_model.bin"),
                                  dtype=jnp.float32)
    assert data.source_format == "pytorch"
    _assert_logits_match(data, tiny_params, tiny_cfg)
    # nested {"state_dict": ...} wrapper + directory entry point
    torch.save({"state_dict": sd}, str(tmp_path / "wrapped.pt"))
    data2 = loader.load_pytorch(str(tmp_path / "wrapped.pt"),
                                dtype=jnp.float32)
    _assert_logits_match(data2, tiny_params, tiny_cfg)


def test_pytorch_sharded_dir(tmp_path, tiny_params, tiny_cfg):
    import json
    torch = pytest.importorskip("torch")
    t = _hf_named_tensors(tiny_params, tiny_cfg)
    names = sorted(t)
    half = len(names) // 2
    shards = {"pytorch_model-00001-of-00002.bin": names[:half],
              "pytorch_model-00002-of-00002.bin": names[half:]}
    weight_map = {}
    for fname, keys in shards.items():
        torch.save({k: torch.from_numpy(t[k]) for k in keys},
                   str(tmp_path / fname))
        weight_map.update({k: fname for k in keys})
    with open(tmp_path / "pytorch_model.bin.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_hf_config_dict(tiny_cfg), f)
    data = loader.load_model_data(str(tmp_path), dtype=jnp.float32)
    assert data.source_format == "pytorch"
    _assert_logits_match(data, tiny_params, tiny_cfg)


def test_pytorch_bf16_roundtrip(tmp_path, tiny_params, tiny_cfg):
    """bf16 torch tensors (no numpy dtype) convert through f32."""
    import json
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(v).bfloat16()
          for k, v in _hf_named_tensors(tiny_params, tiny_cfg).items()}
    torch.save(sd, str(tmp_path / "m.pt"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_hf_config_dict(tiny_cfg), f)
    data = loader.load_pytorch(str(tmp_path / "m.pt"), dtype=jnp.float32)
    tokens = jnp.asarray([[1, 5, 42, 7]], jnp.int32)
    want = llama.forward_no_cache(tiny_params, tiny_cfg, tokens)
    got = llama.forward_no_cache(data.params, data.config.replace(
        dtype=jnp.float32, rope_mode=tiny_cfg.rope_mode), tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)   # bf16 rounding


def test_checkpoint_dir_no_model_raises(tmp_path):
    with pytest.raises(ValueError, match="no loadable checkpoint"):
        loader.load_model_data(str(tmp_path))


def test_config_dict_roundtrip_all_fields():
    """Every ModelConfig field must survive config_to_dict/from_dict —
    rotary_pct/parallel_residual/alibi/num_experts were silently dropped
    once (TINQ checkpoints of NeoX/Phi/Falcon/MoE models would load with
    defaults)."""
    import dataclasses

    from turboinfer_tpu.config import ModelConfig, RopeMode
    from turboinfer_tpu.loader.mapping import (config_from_dict,
                                               config_to_dict)
    cfg = ModelConfig(
        vocab_size=123, hidden_size=64, num_layers=3, num_heads=4,
        num_kv_heads=2, intermediate_size=256, head_dim=16,
        rope_theta=12345.0, rope_mode=RopeMode.INTERLEAVED,
        rms_norm_eps=1e-6, max_seq_len=77, tie_embeddings=True,
        sliding_window=32, sliding_window_pattern=2, num_experts=4,
        experts_per_token=2, attn_bias=True, qk_norm=True,
        scale_embeddings=True, norm_offset=True, hidden_act="gelu",
        post_norms=True, attn_scale=0.25, attn_logit_softcap=50.0,
        final_logit_softcap=30.0, rope_local_theta=10000.0,
        rope_scaling=(("factor", 8.0), ("rope_type", "linear")),
        rotary_pct=0.25, parallel_residual=True, alibi=True,
        name="roundtrip", architecture="falcon")
    back = config_from_dict(config_to_dict(cfg))
    for f in dataclasses.fields(ModelConfig):
        if f.name in ("dtype", "extra"):
            continue
        assert getattr(back, f.name) == getattr(cfg, f.name), f.name


# ---------------------------------------------------------------------------
# Round-5 loader review regressions
# ---------------------------------------------------------------------------

def test_gemma_gguf_unbakes_norm_offset(tmp_path):
    """llama.cpp's Gemma converter bakes (w+1) into every norm weight;
    the GGUF loader must subtract it back (the runtime applies the
    offset itself) — double application multiplied norms by (2+w)."""
    H, V, L = 8, 6, 1
    w_hf = 0.25 * np.ones(H, np.float32)        # HF-convention weight
    md = {
        "general.architecture": "gemma",
        "gemma.embedding_length": H,
        "gemma.block_count": L,
        "gemma.attention.head_count": 2,
        "gemma.attention.head_count_kv": 2,
        "gemma.feed_forward_length": 16,
        "gemma.context_length": 64,
    }
    rng = np.random.default_rng(0)
    t = {
        "token_embd.weight": rng.standard_normal((V, H)).astype(np.float32),
        "output_norm.weight": w_hf + 1.0,       # llama.cpp bakes +1
        "blk.0.attn_norm.weight": w_hf + 1.0,
        "blk.0.ffn_norm.weight": w_hf + 1.0,
        "blk.0.attn_q.weight": rng.standard_normal((8, H)).astype(np.float32),
        "blk.0.attn_k.weight": rng.standard_normal((8, H)).astype(np.float32),
        "blk.0.attn_v.weight": rng.standard_normal((8, H)).astype(np.float32),
        "blk.0.attn_output.weight": rng.standard_normal((H, 8)).astype(np.float32),
        "blk.0.ffn_gate.weight": rng.standard_normal((16, H)).astype(np.float32),
        "blk.0.ffn_up.weight": rng.standard_normal((16, H)).astype(np.float32),
        "blk.0.ffn_down.weight": rng.standard_normal((H, 16)).astype(np.float32),
    }
    path = str(tmp_path / "gemma.gguf")
    gguf.write_gguf(path, md, t)
    data = loader.load_model_data(path, dtype=jnp.float32)
    assert data.config.norm_offset            # runtime applies (1+w)
    np.testing.assert_allclose(
        np.asarray(data.params["final_norm"]), w_hf, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(data.params["layers"]["attn_norm"][0]), w_hf,
        atol=1e-6)


def test_gemma2_gguf_attn_scale_by_size():
    """gemma2 2B/9B use head_dim**-0.5 (attn_scale None -> default);
    only 27B (46 layers) overrides with (hidden/heads)**-0.5."""
    base = {"general.architecture": "gemma2",
            "gemma2.embedding_length": 3584,
            "gemma2.attention.head_count": 16,
            "gemma2.attention.head_count_kv": 8,
            "gemma2.attention.key_length": 256}
    c9 = mapping.config_from_gguf_metadata({**base,
                                            "gemma2.block_count": 42})
    assert c9.attn_scale is None and c9.head_dim_ == 256
    c27 = mapping.config_from_gguf_metadata({
        **base, "gemma2.embedding_length": 4608,
        "gemma2.attention.head_count": 32,
        "gemma2.block_count": 46})
    assert c27.attn_scale == pytest.approx((4608 / 32) ** -0.5)


def test_config_dict_keeps_granite_knobs():
    """TINQ persistence (config_to_dict/from_dict) round-trips the
    Granite scaling knobs — they were silently dropped."""
    cfg = ti.tiny_config(embedding_multiplier=12.0,
                         residual_multiplier=0.22,
                         logits_scaling=16.0)
    back = mapping.config_from_dict(mapping.config_to_dict(cfg))
    assert back.embedding_multiplier == 12.0
    assert back.residual_multiplier == 0.22
    assert back.logits_scaling == 16.0


def test_hf_config_gpt2_keys():
    """Stock HF GPT-2 config.json uses n_embd/n_layer/n_head/n_positions."""
    cfg = mapping.config_from_hf_dict({
        "model_type": "gpt2", "n_embd": 768, "n_layer": 12,
        "n_head": 12, "n_positions": 1024, "vocab_size": 50257,
        "n_inner": None, "layer_norm_epsilon": 1e-5})
    assert (cfg.hidden_size, cfg.num_layers, cfg.num_heads) == (768, 12, 12)
    assert cfg.max_seq_len == 1024
    assert cfg.intermediate_size == 4 * 768
    assert cfg.architecture == "gpt2"


def test_phi3_gguf_fused_qkv_gateup(tmp_path):
    """llama.cpp Phi-3 GGUFs fuse q|k|v into blk.N.attn_qkv.weight and
    gate|up into a double-width blk.N.ffn_up.weight (no ffn_gate) —
    both must split at load."""
    H, V, F = 8, 6, 16
    md = {
        "general.architecture": "phi3",
        "phi3.embedding_length": H,
        "phi3.block_count": 1,
        "phi3.attention.head_count": 2,
        "phi3.attention.head_count_kv": 2,
        "phi3.feed_forward_length": F,
        "phi3.context_length": 64,
    }
    rng = np.random.default_rng(1)
    qkv = rng.standard_normal((3 * H, H)).astype(np.float32)
    gateup = rng.standard_normal((2 * F, H)).astype(np.float32)
    t = {
        "token_embd.weight": rng.standard_normal((V, H)).astype(np.float32),
        "output_norm.weight": np.ones(H, np.float32),
        "blk.0.attn_norm.weight": np.ones(H, np.float32),
        "blk.0.ffn_norm.weight": np.ones(H, np.float32),
        "blk.0.attn_qkv.weight": qkv,
        "blk.0.attn_output.weight": rng.standard_normal((H, H)).astype(np.float32),
        "blk.0.ffn_up.weight": gateup,
        "blk.0.ffn_down.weight": rng.standard_normal((H, F)).astype(np.float32),
    }
    path = str(tmp_path / "phi3.gguf")
    gguf.write_gguf(path, md, t)
    data = loader.load_model_data(path, dtype=jnp.float32)
    lw = data.params["layers"]
    wq = lw.get("wqkv")
    if wq is None:
        np.testing.assert_allclose(np.asarray(lw["wq"][0]), qkv[:H].T,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(lw["wk"][0]), qkv[H:2*H].T,
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(lw["w_gate"][0]), gateup[:F].T,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lw["w_up"][0]), gateup[F:].T,
                               atol=1e-6)


def test_write_safetensors_bf16_roundtrip(tmp_path):
    from turboinfer_tpu.loader import safetensors as st
    arr = (np.arange(8, dtype=np.float32) / 7).astype(jnp.bfloat16)
    path = str(tmp_path / "bf.safetensors")
    st.write_safetensors(path, {"w": np.asarray(arr)})
    f = st.SafeTensorsFile(path)
    back = f.tensor("w")
    np.testing.assert_allclose(np.asarray(back, np.float32),
                               np.asarray(arr, np.float32), atol=1e-6)
