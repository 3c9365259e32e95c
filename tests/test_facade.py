"""Library facade + utils tests.

Reference counterparts: test_library_init.cpp (init/shutdown cycles),
test_logging.cpp, test_profiler_fixed.cpp (report file formats),
test_error_handling.cpp (exception paths), plus the cached-tokenization
behavior behind the facade tokenize/detokenize.
"""

import json
import os

import pytest
import jax
import jax.numpy as jnp

import turboinfer_tpu as ti


# -- init / shutdown cycles (reference: test_library_init) -------------------

def test_init_shutdown_cycles():
    for _ in range(3):
        assert ti.initialize(enable_logging=False)
        assert ti.is_initialized()
        ti.shutdown()
        assert not ti.is_initialized()


def test_build_info_mentions_backend():
    info = ti.build_info()
    assert "jax" in info and "backend" in info


# -- facade tokenize/detokenize with engine cache ----------------------------

def test_facade_tokenize_cached(tmp_path, tiny_params, tiny_cfg):
    from turboinfer_tpu.config import QuantizationConfig, QuantType
    from turboinfer_tpu.loader import tinq
    from turboinfer_tpu.quant.quantizer import quantize_params
    path = str(tmp_path / "m.tinq")
    tinq.save(path, quantize_params(tiny_params, QuantizationConfig(
        type=QuantType.INT8, group_size=32)), tiny_cfg, None)

    ids1 = ti.tokenize("hello world", path)
    ids2 = ti.tokenize("hello world", path)       # second call hits cache
    assert ids1 == ids2
    assert ti.detokenize(ids1, path) == "hello world"
    text = ti.generate_text(path, "hi", max_tokens=5, temperature=0.0)
    assert isinstance(text, str) and len(text) >= 2
    ti.shutdown()


# -- logging (reference: test_logging) ---------------------------------------

def test_logging_levels_and_file(tmp_path):
    from turboinfer_tpu.utils import logging as tlog
    logfile = str(tmp_path / "t.log")
    tlog.set_level("DEBUG")
    tlog.set_log_file(logfile)
    tlog.log_debug("debug %d", 1)
    tlog.log_info("info msg")
    tlog.log_error("error msg")
    tlog.set_log_file(None)
    content = open(logfile).read()
    assert "debug 1" in content
    assert "info msg" in content
    assert "[ERROR]" in content
    tlog.set_level("INFO")


# -- profiler (reference: test_profiler_fixed) --------------------------------

def test_profiler_reports(tmp_path):
    from turboinfer_tpu.utils.profiler import Profiler
    p = Profiler.instance()
    p.set_enabled(True)
    p.reset()
    with p.scope("op_a"):
        sum(range(1000))
    p.start("op_b")
    p.stop("op_b")
    report = p.report()
    assert "op_a" in report and "op_b" in report

    jpath = str(tmp_path / "p.json")
    cpath = str(tmp_path / "p.csv")
    p.save(jpath, fmt="json")
    p.save(cpath, fmt="csv")
    data = json.loads(open(jpath).read())
    assert any("op_a" in k for k in data)
    assert "op_a" in open(cpath).read()
    p.set_enabled(False)


# -- typed error taxonomy (reference: test_error_handling) --------------------

def test_error_taxonomy(tmp_path, tiny_params, tiny_cfg):
    from turboinfer_tpu.utils.errors import (ModelFormatError, TokenError,
                                             QuantizationError,
                                             TurboInferError, ConfigError)
    from turboinfer_tpu.loader import loader
    from turboinfer_tpu.core.qtensor import quantize
    from turboinfer_tpu.config import QuantType
    from turboinfer_tpu.models import registry

    bad = str(tmp_path / "bad.gguf")
    with open(bad, "wb") as f:
        f.write(b"XXXXXXXXXXXXXXXXXXXXXXXXXXXXXXXX")
    with pytest.raises(ModelFormatError):
        loader.load_model_data(bad)
    onnx = str(tmp_path / "x.onnx")
    with open(onnx, "wb") as f:
        f.write(b"\x08\x01" + b"\x00" * 32)
    with pytest.raises(ModelFormatError, match="not supported"):
        loader.load_model_data(onnx)

    eng = ti.InferenceEngine(tiny_params, tiny_cfg)
    with pytest.raises(TokenError):
        eng.generate([], 4)
    with pytest.raises(TurboInferError):
        eng.generate([10 ** 6], 4)

    with pytest.raises(QuantizationError):
        quantize(jnp.ones((3, 4, 5)), QuantType.INT8)
    with pytest.raises(ConfigError):
        registry.get_model("nope")

    # taxonomy stays ValueError-compatible
    with pytest.raises(ValueError):
        eng.generate([], 4)


def test_metrics_report(tiny_params, tiny_cfg):
    eng = ti.InferenceEngine(tiny_params, tiny_cfg)
    eng.generate([1, 2, 3], 6, temperature=0.0)
    rep = eng.performance_stats()
    assert "tok/s" in rep or "tokens" in rep.lower()
    assert eng.memory_usage() > 0
    eng.reset_state()


# -- CLI ---------------------------------------------------------------------

def test_cli_quantize_inspect_generate(tmp_path, tiny_params, tiny_cfg,
                                       capsys):
    from turboinfer_tpu import cli
    from turboinfer_tpu.loader import gguf
    # export tiny model as gguf (reuse the loader test exporter)
    from tests.test_loader import _export_tiny_gguf
    src = _export_tiny_gguf(tmp_path, tiny_params, tiny_cfg, "gguf")
    dst = str(tmp_path / "m.tinq")

    assert cli.main(["quantize", src, dst, "--type", "int8",
                     "--group-size", "32"]) == 0
    assert cli.main(["inspect", dst]) == 0
    out = capsys.readouterr().out
    assert "int8" in out
    assert cli.main(["generate", dst, "hello", "--max-tokens", "5",
                     "--greedy", "--quiet"]) == 0
    # context-parallel generate (virtual devices; CP shards the prompt
    # KV cache over 2)
    assert cli.main(["generate", dst, "hello", "--max-tokens", "4",
                     "--greedy", "--quiet",
                     "--context-parallel", "2"]) == 0


def test_cli_eval_perplexity(tmp_path, tiny_params, tiny_cfg, capsys):
    import json as _json

    from tests.test_loader import _export_tiny_gguf
    from turboinfer_tpu import cli
    src = _export_tiny_gguf(tmp_path, tiny_params, tiny_cfg, "gguf")
    txt = tmp_path / "sample.txt"
    txt.write_text("the quick brown fox jumps over the lazy dog " * 6)

    assert cli.main(["eval", src, str(txt), "--quiet"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["scored"] == rep["tokens"] - 1
    assert rep["perplexity"] > 0 and rep["avg_logprob"] <= 0

    # Sliding windows cover every token exactly once and agree with the
    # single-window total on scored-token count.
    assert cli.main(["eval", src, str(txt), "--quiet",
                     "--window", "16", "--stride", "8"]) == 0
    rep2 = _json.loads(capsys.readouterr().out.strip())
    assert rep2["scored"] == rep2["tokens"] - 1
    assert rep2["perplexity"] > 0


def test_cli_serve_parallel_flags(tmp_path, tiny_params, tiny_cfg,
                                  monkeypatch):
    """serve --pp-stages / --tp / --draft-model wire the right scheduler
    configuration (construction-level: serve_forever is stubbed)."""
    import jax

    from tests.test_loader import _export_tiny_gguf
    from turboinfer_tpu import cli
    src = _export_tiny_gguf(tmp_path, tiny_params, tiny_cfg, "gguf")

    captured = {}

    def fake_serve_forever(eng, host, port, verbose=False):
        captured["sched"] = eng.sched
        captured["beam"] = eng.beam_engine
        eng.shutdown()

    monkeypatch.setattr("turboinfer_tpu.serve.serve_forever",
                        fake_serve_forever)

    # pipeline-parallel serving (tiny has layers divisible by 2)
    assert cli.main(["serve", src, "--pp-stages", "2", "--slots", "2",
                     "--quiet"]) == 0
    assert captured["sched"].parallel == "pp"
    assert captured["sched"].mesh.shape["pp"] == 2
    # round-5: beam engines now ride meshes too (shared sharded params)
    assert captured["beam"] is not None
    assert captured["beam"].mesh is captured["sched"].mesh

    # tensor/expert-parallel serving
    assert cli.main(["serve", src, "--tp", "2", "--slots", "2",
                     "--quiet"]) == 0
    assert captured["sched"].parallel == "tp"
    assert captured["sched"].mesh.shape["tp"] == 2

    # speculative serving with a draft model file
    draft = _export_tiny_gguf(tmp_path, tiny_params, tiny_cfg, "gguf2")
    assert cli.main(["serve", src, "--draft-model", draft, "--spec-k",
                     "2", "--slots", "2", "--quiet"]) == 0
    assert captured["sched"]._dmodel is not None
    assert captured["sched"].spec_k == 2
    assert captured["beam"] is not None      # single-chip: beam engine

    # speculative over the PAGED pool (round-5: the production serving
    # path gets spec — the old --paged x --draft-model rejection is gone)
    assert cli.main(["serve", src, "--paged", "--draft-model", draft,
                     "--spec-k", "2", "--slots", "2", "--quiet"]) == 0
    from turboinfer_tpu.engine.scheduler import PagedContinuousScheduler
    assert isinstance(captured["sched"], PagedContinuousScheduler)
    assert captured["sched"]._dmodel is not None

    # context-parallel serving (sequence-sharded prompt cache)
    assert cli.main(["serve", src, "--context-parallel", "2",
                     "--slots", "2", "--quiet"]) == 0
    from turboinfer_tpu.engine.cp_scheduler import ContextParallelScheduler
    assert isinstance(captured["sched"], ContextParallelScheduler)
    assert captured["sched"].mesh.shape["sp"] == 2

    # PP x TP composition: 2-D (pp, tp) mesh (round-4 verdict lifted
    # the old mutual exclusion)
    assert cli.main(["serve", src, "--pp-stages", "2", "--tp", "2",
                     "--slots", "2", "--quiet"]) == 0
    assert captured["sched"].parallel == "pp"
    assert captured["sched"].mesh.shape == {"pp": 2, "tp": 2}
    wq = captured["sched"].params["layers"]["wq"]
    spec = getattr(wq, "data", wq).sharding.spec
    assert spec[0] == "pp" and spec[-1] == "tp"

    # cp still composes with nothing
    assert cli.main(["serve", src, "--context-parallel", "2", "--tp",
                     "2", "--quiet"]) == 2
