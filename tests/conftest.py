"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on a fake 8-device CPU mesh
(XLA --xla_force_host_platform_device_count), per the project test strategy
(SURVEY.md section 4). Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: the suite is compile-dominated on CPU.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/khoice-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(1234)


@pytest.fixture
def nprng():
    return np.random.default_rng(1234)


def random_dna(rng, n, n_prob=0.0):
    alphabet = "ACGT"
    out = []
    for _ in range(n):
        if n_prob > 0 and rng.random() < n_prob:
            out.append("N")
        else:
            out.append(alphabet[rng.randrange(4)])
    return "".join(out)
