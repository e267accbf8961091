"""Tests for profiling helpers and sharding spec utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gsattack.parallel.shardings import (
    camera_batch_spec,
    image_batch_spec,
    pad_to_multiple,
    scene_spec,
)
from gsattack.utils.profiling import StageTimer, annotate, annotate_fn
from tests.conftest import make_toy_camera, make_toy_scene


def test_stage_timer_accumulates():
    t = StageTimer()
    x = jnp.ones((8, 8))
    with t.stage("mul", block_on=None):
        y = x * 2
    with t.stage("mul", block_on=y):
        y = x * 3
    assert t.counts["mul"] == 2
    assert t.totals["mul"] > 0
    assert "mul" in t.summary()


def test_annotate_contexts_run():
    with annotate("test-stage"):
        z = jnp.sum(jnp.ones(4))
    assert float(z) == 4.0

    @annotate_fn("wrapped")
    def f(a):
        return a + 1

    assert float(f(jnp.float32(1.0))) == 2.0


def test_scene_spec_shapes():
    sc = make_toy_scene(n=8)
    spec = scene_spec(sc)
    assert spec.xyz == P("splats")
    assert spec.f_rest == P("splats")


def test_camera_batch_spec():
    from gsattack.core import stack_cameras

    cams = stack_cameras([make_toy_camera(), make_toy_camera()])
    spec = camera_batch_spec(cams)
    assert spec.view == P("views")
    assert image_batch_spec() == P("views")


def test_pad_to_multiple():
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(16, 8) == 16
    assert pad_to_multiple(17, 8) == 24
