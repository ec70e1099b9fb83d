"""Shared fixtures: one Ray session per pytest session; tiny corpora."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    from kire_ray.sources.synth import SynthConfig, write_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "tiny")
    return write_corpus(out, SynthConfig(n_convs=60, seed=42))


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    from kire_ray.sources.synth import SynthConfig, write_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "small")
    return write_corpus(out, SynthConfig(n_convs=300, seed=42))
