"""Golden-image regression test: a fixed toy scene rendered by the current
code must match the committed snapshot (tests/golden/), pinning the full
projection + binning + blend semantics across refactors. Regenerate with
the snippet in the golden file's git history ONLY for intentional semantic
changes."""

import os

import jax.numpy as jnp
import numpy as np

from gsattack.render import render
from tests.conftest import make_toy_camera, make_toy_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "toy48_32x32.npz")


def test_render_matches_golden():
    sc = make_toy_scene(n=48, seed=42)
    cam = make_toy_camera(width=32, height=32)
    bg = jnp.array([0.15, 0.25, 0.35])
    out = render(sc, cam, bg, pairs_per_gaussian=16, max_chunks=4)
    with np.load(GOLDEN) as g:
        np.testing.assert_allclose(
            np.asarray(out["render"]), g["render"], atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["final_transmittance"]), g["transmittance"], atol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(out["radii"]), g["radii"])


def test_pallas_interpret_matches_golden():
    sc = make_toy_scene(n=48, seed=42)
    cam = make_toy_camera(width=32, height=32)
    bg = jnp.array([0.15, 0.25, 0.35])
    out = render(
        sc, cam, bg, pairs_per_gaussian=16, max_chunks=4,
        backend="pallas", interpret=True,
    )
    with np.load(GOLDEN) as g:
        np.testing.assert_allclose(
            np.asarray(out["render"]), g["render"], atol=2e-5
        )
