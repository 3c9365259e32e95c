"""Orbax sharding-aware checkpoint tests (loader/ckpt.py).

TPU-native replacement for the reference's .tinq single-file store
(quantization.cpp:120-333) per SURVEY.md §5: quantized pytrees persist
packed, and restore can materialize directly onto a device mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import turboinfer_tpu as ti
from turboinfer_tpu.config import QuantizationConfig, QuantType
from turboinfer_tpu.core.qtensor import QTensor
from turboinfer_tpu.loader import ckpt
from turboinfer_tpu.models import llama
from turboinfer_tpu.quant.quantizer import quantize_params


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    cfg = ti.tiny_config(dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params, QuantizationConfig(type=QuantType.INT4,
                                                    group_size=32))
    d = str(tmp_path_factory.mktemp("ckpt") / "ck")
    ckpt.save_checkpoint(d, qp, cfg, metadata={"note": "test"})
    tok = jnp.asarray([[1, 5, 42, 7]], jnp.int32)
    want = np.asarray(llama.forward_no_cache(qp, cfg, tok))
    return d, cfg, tok, want


def test_roundtrip_unsharded(saved):
    d, cfg, tok, want = saved
    params, cfg2, md = ckpt.load_checkpoint(d)
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.num_layers == cfg.num_layers
    assert md == {"note": "test"}
    assert isinstance(params["layers"]["wq"], QTensor)
    assert params["layers"]["wq"].bits == 4
    got = np.asarray(llama.forward_no_cache(params, cfg2.replace(
        dtype=jnp.float32), tok))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_restore_onto_mesh(saved):
    """Arrays materialize directly with their NamedShardings (no
    replicated intermediate); numerics identical."""
    d, cfg, tok, want = saved
    from turboinfer_tpu.parallel import mesh as mesh_mod
    m = mesh_mod.make_mesh((1, 8))
    params, cfg2, _ = ckpt.load_checkpoint(d, mesh=m)
    wq = params["layers"]["wq"]
    assert "tp" in str(wq.data.sharding.spec)
    # N=128 shards 8 ways; the tiny scales G axis falls back to
    # replication rather than failing
    got = np.asarray(llama.forward_no_cache(params, cfg2.replace(
        dtype=jnp.float32), tok))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unquantized_roundtrip(tmp_path):
    cfg = ti.tiny_config(dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, params, cfg)
    p2, cfg2, _ = ckpt.load_checkpoint(d)
    np.testing.assert_allclose(np.asarray(p2["embed"]),
                               np.asarray(params["embed"]))
