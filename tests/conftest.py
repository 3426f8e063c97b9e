"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that every mesh/sharding
code path (the 8-chip single-host config from SURVEY.md §4) is exercised
hermetically — mirroring the reference CI's strategy of re-running the
suite with hardware intrinsics disabled (main.yml:24,56-60).

Must set env *before* jax is imported anywhere.
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"  # overrides the ambient axon/TPU env
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# This image pre-imports jax and pins an ambient TPU platform; the env
# vars above may lose, so force the CPU platform through the config
# (effective as long as no backend was initialized at import time).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA CPU compiles of the big fused kernels
# take ~5-20s each; cache them across test runs.
_CACHE_DIR = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_CACHE_DIR.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_DATA = pathlib.Path("/root/reference/Snappier.Tests/TestData")

#: The canonical Snappy benchmark corpus (SURVEY.md §4).
CORPUS_FILES = [
    "alice29.txt",
    "asyoulik.txt",
    "fireworks.jpeg",
    "geo.protodata",
    "html",
    "html_x_4",
    "kppkn.gtb",
    "lcet10.txt",
    "paper-100k.pdf",
    "plrabn12.txt",
    "urls.10K",
]

GOLDEN_PAIRS = [
    ("alice29.txt", "alice29.snappy"),
    ("html_x_4", "html_x_4.snappy"),
]

BADDATA_FILES = ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"]


def synthetic_corpus(name: str, size: int = 150_000) -> bytes:
    """Deterministic stand-in data when the reference corpus is absent
    (keeps the suite hermetic on machines without /root/reference)."""
    rng = np.random.default_rng(abs(hash(name)) % (2**32))
    if name.endswith((".jpeg", ".pdf")):
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    words = [b"the", b"quick", b"brown", b"snappy", b"tpu", b"block",
             b"compress", b"format", b"stream", b"<html><body>"]
    parts = rng.integers(0, len(words), size // 5)
    return b" ".join(words[i] for i in parts)[:size]


def load_corpus_file(name: str) -> bytes:
    p = REFERENCE_DATA / name
    if p.exists():
        return p.read_bytes()
    if name.endswith(".snappy") or name.startswith("baddata"):
        pytest.skip(f"golden file {name} unavailable")
    return synthetic_corpus(name)


@pytest.fixture(scope="session")
def corpus():
    return {name: load_corpus_file(name) for name in CORPUS_FILES}


@pytest.fixture(scope="session", params=CORPUS_FILES)
def corpus_file(request):
    return request.param, load_corpus_file(request.param)
