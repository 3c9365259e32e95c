"""Test harness config: run on CPU with 8 virtual devices.

Mirrors SURVEY.md §4's plan — the reference's synthetic-tiny-model
fixture idea, plus multi-device CI the reference never had, via
--xla_force_host_platform_device_count (no pod required). The axon TPU
plugin force-selects itself via jax.config, so we override jax_platforms
after import rather than via env.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["TURBOINFER_FORCE_REF"] = os.environ.get("TURBOINFER_FORCE_REF",
                                                    "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

import turboinfer_tpu as ti  # noqa: E402
from turboinfer_tpu.models import llama  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the full matrix including @pytest.mark.slow tests "
             "(also TURBOINFER_FULL_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    """Default lane skips @slow tests (suite-runtime budget: the full
    matrix compiles thousands of XLA programs and creeps past 20 min;
    see CLAUDE.md vm.max_map_count note). `--full`, the env var, or an
    explicit `-m` expression runs everything selected."""
    if (config.getoption("--full")
            or os.environ.get("TURBOINFER_FULL_TESTS") == "1"
            or config.getoption("-m")):
        return
    skip = pytest.mark.skip(reason="slow; run with --full")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    Each jitted program holds LLVM JIT code pages (mmap regions); with
    20 model families the full suite compiles thousands of programs and
    blows past vm.max_map_count late in the run (LLVM 'Cannot allocate
    memory' → segfault, seen in the serve tests). Module-scoped
    fixtures never outlive the module, so clearing here is safe and
    keeps the per-process mapping count bounded."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def tiny_cfg():
    """The canonical synthetic fixture (reference:
    tests/test_kv_cache_incremental.cpp:18-118 — vocab 1000, hidden 128,
    2 layers, 4 heads), f32 for exact golden comparisons on CPU."""
    import jax.numpy as jnp
    return ti.tiny_config(dtype=jnp.float32)


@pytest.fixture(scope="session")
def tiny_params(tiny_cfg):
    return llama.init_params(jax.random.PRNGKey(0), tiny_cfg)


@pytest.fixture()
def tiny_engine(tiny_params, tiny_cfg):
    return ti.InferenceEngine(tiny_params, tiny_cfg)
