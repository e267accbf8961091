"""Native C++ IO codec tests: build, parity with the numpy fallback, and
the wired-in PLY fast path."""

import time

import numpy as np
import pytest

from gsattack import native


def test_native_builds():
    assert native.native_available(), "g++ build of ply_native.cc failed"


def test_interleave_matches_numpy():
    rng = np.random.default_rng(0)
    cols = [rng.normal(size=1000).astype(np.float32) for _ in range(13)]
    got = native.interleave(cols)
    assert got is not None
    np.testing.assert_array_equal(got, np.stack(cols, axis=1))


def test_read_columns_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    table = rng.normal(size=(500, 7)).astype("<f4")
    p = str(tmp_path / "raw.bin")
    prefix = b"HDRHDR\n"
    with open(p, "wb") as f:
        f.write(prefix)
        f.write(table.tobytes())
    cols = native.read_columns(p, len(prefix), 500, 7)
    assert cols is not None
    np.testing.assert_array_equal(cols, table.T)


def test_ply_fast_path_equals_python(tmp_path):
    from gsattack.io.ply import read_ply_vertex_table, write_ply_vertex_table

    rng = np.random.default_rng(2)
    cols = [(f"c{i}", rng.normal(size=200).astype(np.float32)) for i in range(9)]
    p = str(tmp_path / "t.ply")
    write_ply_vertex_table(p, cols)
    t = read_ply_vertex_table(p)
    for name, c in cols:
        np.testing.assert_array_equal(t[name], c)


def test_scene_ply_roundtrip_with_native(tmp_path):
    from gsattack.io import load_scene_ply, save_scene_ply
    from tests.conftest import make_toy_scene

    sc = make_toy_scene(n=64)
    p = str(tmp_path / "scene.ply")
    save_scene_ply(sc, p)
    sc2 = load_scene_ply(p)
    for k, v in sc.params().items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(sc2.params()[k]), atol=1e-7, err_msg=k
        )
