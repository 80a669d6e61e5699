"""Test configuration: force CPU JAX with 8 virtual devices.

The standard JAX trick for testing multi-chip sharding without a pod
(SURVEY.md §4.4): `--xla_force_host_platform_device_count=8` gives an 8-device
CPU mesh; shard_map code is identical on CPU mesh and TPU mesh.  This
environment's jax install force-prepends the 'axon' TPU platform to
jax_platforms, so we override the config *after* import as well.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
CORPUS = [
    "img.jpg", "img2.jpg", "img3.jpg", "img4.jpg", "img5.jpg", "img6.jpg",
]
PROGRESSIVE_CORPUS = ["prograssive-sample-2.jpg", "prograssive-sample.jpg"]


def corpus_path(name: str) -> str:
    return os.path.join(REFERENCE_DIR, "images", name)


@pytest.fixture(scope="session")
def oracle():
    """Instrumented-reference oracle (built once per session)."""
    import oracle as oracle_mod

    if not oracle_mod.available():
        pytest.skip("oracle toolchain unavailable")
    return oracle_mod


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    """Drop jax's compiled-executable caches between test MODULES.

    Every compiled XLA CPU executable holds several memory mappings;
    the suite compiles hundreds of program variants and a long pytest
    process walks into vm.max_map_count (default 65530) late in the
    run — LLVM then fails its code-page mmap ("Cannot allocate
    memory") and the process segfaults.  Clearing per module keeps the
    map count bounded at a small recompile cost; within-module sharing
    (the expensive, shape-heavy fixtures) is preserved.
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
