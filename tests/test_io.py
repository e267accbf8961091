"""IO tests: PLY roundtrip (schema byte-compat), COLMAP parsers, Blender
loader, scene-info pipeline."""

import json
import os

import numpy as np

from gsattack.io import colmap as cm
from gsattack.io.dataset import (
    apply_resolution_policy,
    get_nerfpp_norm,
    load_scene_info,
    read_blender_scene,
    sniff_scene_type,
)
from gsattack.io.ply import (
    load_scene_ply,
    read_ply_vertex_table,
    read_points_ply,
    save_scene_ply,
    store_points_ply,
)
from tests.conftest import make_toy_scene


def test_scene_ply_roundtrip(tmp_path):
    sc = make_toy_scene(n=32, max_sh_degree=3)
    p = str(tmp_path / "pc.ply")
    save_scene_ply(sc, p)
    sc2 = load_scene_ply(p, max_sh_degree=3)
    for k in sc.params():
        np.testing.assert_allclose(
            np.asarray(sc.params()[k]), np.asarray(sc2.params()[k]), atol=1e-6,
            err_msg=k,
        )
    assert sc2.active_sh_degree == 3  # load activates max degree


def test_scene_ply_schema_field_order(tmp_path):
    """The on-disk property list must match the reference's
    construct_list_of_attributes ordering exactly."""
    sc = make_toy_scene(n=4, max_sh_degree=2)
    p = str(tmp_path / "pc.ply")
    save_scene_ply(sc, p)
    header = open(p, "rb").read(4096).split(b"end_header")[0].decode()
    props = [
        ln.split()[-1] for ln in header.splitlines() if ln.startswith("property")
    ]
    k = (2 + 1) ** 2 - 1  # 8 rest coeffs, 3 channels
    want = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * k)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
        + [f"obj_dc_{i}" for i in range(16)]
    )
    assert props == want


def test_scene_ply_frest_channel_major(tmp_path):
    """f_rest_* on disk is channel-major: f_rest_[ch*K + j] = f_rest[n, j, ch]."""
    sc = make_toy_scene(n=3, max_sh_degree=1)  # K = 3 rest coeffs
    p = str(tmp_path / "pc.ply")
    save_scene_ply(sc, p)
    t = read_ply_vertex_table(p)
    f_rest = np.asarray(sc.f_rest)  # (3, 3, 3) [n, coeff, ch]
    np.testing.assert_allclose(t["f_rest_0"], f_rest[:, 0, 0], atol=1e-7)
    np.testing.assert_allclose(t["f_rest_4"], f_rest[:, 1, 1], atol=1e-7)
    np.testing.assert_allclose(t["f_rest_8"], f_rest[:, 2, 2], atol=1e-7)


def test_scene_ply_tolerates_missing_obj(tmp_path):
    """load_ply tolerates missing obj_dc_* (`gaussian_model.py:452-457`)."""
    sc = make_toy_scene(n=4)
    p = str(tmp_path / "pc.ply")
    save_scene_ply(sc, p)
    # Strip obj columns by rewriting without them
    t = read_ply_vertex_table(p)
    from gsattack.io.ply import write_ply_vertex_table

    cols = [(k, v) for k, v in t.items() if not k.startswith("obj_dc_")]
    p2 = str(tmp_path / "noobj.ply")
    write_ply_vertex_table(p2, cols)
    sc2 = load_scene_ply(p2)
    assert np.asarray(sc2.obj_dc).max() == 0.0
    np.testing.assert_allclose(np.asarray(sc2.xyz), np.asarray(sc.xyz), atol=1e-7)


def test_points_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    rgb255 = np.random.default_rng(1).integers(0, 255, size=(10, 3))
    p = str(tmp_path / "pts.ply")
    store_points_ply(p, xyz, rgb255)
    pts, cols, normals = read_points_ply(p)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb255, atol=0.5)


def test_colmap_qvec_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = cm.qvec2rotmat(q)
    q2 = cm.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def _write_colmap_text_scene(root, n_cams=6):
    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    cams = {1: cm.ColmapCamera(1, "PINHOLE", 64, 48, np.array([60.0, 60.0, 32.0, 24.0]))}
    cm.write_intrinsics_text(str(sparse / "cameras.txt"), cams)
    rng = np.random.default_rng(3)
    images = {}
    for i in range(1, n_cams + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = cm.ColmapImage(
            i, q, rng.normal(size=3), 1, f"im_{i:03d}.png", np.zeros((0, 2)), np.zeros(0, int)
        )
    cm.write_extrinsics_text(str(sparse / "images.txt"), images)
    with open(sparse / "points3D.txt", "w") as f:
        f.write("# points\n")
        for i in range(20):
            x, y, z = rng.normal(size=3)
            f.write(f"{i} {x} {y} {z} 10 200 30 0.5 \n")
    return root


def test_colmap_text_scene_load(tmp_path):
    _write_colmap_text_scene(tmp_path)
    assert sniff_scene_type(str(tmp_path)) == "Colmap"
    info = load_scene_info(str(tmp_path), shuffle=False)
    assert len(info.train_cameras) == 6
    assert info.points is not None and info.points.shape == (20, 3)
    # colors converted from 0..255 ints
    assert 0 <= info.colors.min() and info.colors.max() <= 1
    assert info.nerf_normalization["radius"] > 0
    cam = info.train_cameras[0].build()
    assert cam.width == 64 and cam.height == 48


def test_colmap_eval_split(tmp_path):
    _write_colmap_text_scene(tmp_path, n_cams=16)
    from gsattack.io import read_colmap_scene

    info = read_colmap_scene(str(tmp_path), eval_split=True, llffhold=8)
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 14


def test_scene_shuffle_deterministic(tmp_path):
    _write_colmap_text_scene(tmp_path)
    a = load_scene_info(str(tmp_path), shuffle=True)
    b = load_scene_info(str(tmp_path), shuffle=True)
    assert [c.image_name for c in a.train_cameras] == [
        c.image_name for c in b.train_cameras
    ]


def test_cam_indices_select(tmp_path):
    _write_colmap_text_scene(tmp_path)
    info = load_scene_info(str(tmp_path), shuffle=False, cam_indices=[2, 0])
    assert len(info.train_cameras) == 2


def test_blender_scene(tmp_path):
    frames = []
    rng = np.random.default_rng(4)
    for i in range(4):
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(size=3)
        frames.append({"file_path": f"./r_{i}", "transform_matrix": c2w.tolist()})
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "w": 32, "h": 32, "frames": frames}, f)
    info = read_blender_scene(str(tmp_path))
    assert len(info.train_cameras) == 4
    assert info.points.shape[0] == 100_000
    assert sniff_scene_type(str(tmp_path)) == "Blender"


def test_resolution_policy():
    assert apply_resolution_policy(3200, 1600, -1) == (1600, 800)
    assert apply_resolution_policy(800, 600, -1) == (800, 600)
    assert apply_resolution_policy(800, 600, 2) == (400, 300)
    assert apply_resolution_policy(800, 600, 400) == (400, 300)


def test_load_image_applies_alpha_mask(tmp_path):
    """RGBA GT images multiply RGB by alpha — the camera-level
    gt_alpha_mask of the reference (`scene/cameras.py:43-44`)."""
    from PIL import Image

    from gsattack.io.dataset import _load_image

    rgba = np.zeros((4, 6, 4), np.uint8)
    rgba[..., 0] = 200  # red
    rgba[..., 3] = 255
    rgba[0, :, 3] = 0  # first row fully transparent
    rgba[1, :, 3] = 128
    p = str(tmp_path / "gt.png")
    Image.fromarray(rgba, "RGBA").save(p)
    img = _load_image(p)
    assert img.shape == (4, 6, 3)
    np.testing.assert_allclose(img[0], 0.0)
    np.testing.assert_allclose(img[1, :, 0], (200 / 255) * (128 / 255), atol=1e-6)
    np.testing.assert_allclose(img[2, :, 0], 200 / 255, atol=1e-6)
    # plain RGB images untouched
    rgb = np.full((4, 6, 3), 90, np.uint8)
    p2 = str(tmp_path / "gt_rgb.png")
    Image.fromarray(rgb, "RGB").save(p2)
    np.testing.assert_allclose(_load_image(p2), 90 / 255, atol=1e-6)


def test_colmap_binary_roundtrip(tmp_path):
    """Binary writers aren't in the reference; synthesize binary files by
    hand and check the binary readers parse them."""
    import struct

    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 60.0, 61.0, 32.0, 24.0))
    cams = cm.read_intrinsics_binary(str(sparse / "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    np.testing.assert_allclose(cams[1].params, [60.0, 61.0, 32.0, 24.0])

    # images.bin: one image, 2 points2D
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<idddddddi", 7, 1.0, 0.0, 0.0, 0.0, 0.5, 1.5, 2.5, 1))
        f.write(b"hello.png\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 1.0, 2.0, -1))
        f.write(struct.pack("<ddq", 3.0, 4.0, 5))
    ims = cm.read_extrinsics_binary(str(sparse / "images.bin"))
    assert ims[7].name == "hello.png"
    np.testing.assert_allclose(ims[7].tvec, [0.5, 1.5, 2.5])
    assert ims[7].xys.shape == (2, 2)

    # points3D.bin: 2 points with tracks
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<QdddBBBd", i, 1.0 + i, 2.0, 3.0, 10, 20, 30, 0.1))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))
    xyz, rgb, err = cm.read_points3D_binary(str(sparse / "points3D.bin"))
    assert xyz.shape == (2, 3)
    np.testing.assert_allclose(xyz[1], [2.0, 2.0, 3.0])
    np.testing.assert_allclose(rgb[0], [10, 20, 30])


def test_corrupt_ply_inputs_raise_clean_valueerror(tmp_path):
    """Truncated / garbage / headerless PLYs must fail with ValueError,
    not crash deeper in numpy or silently mis-load."""
    import pytest

    sc = make_toy_scene(n=20, max_sh_degree=1)
    good = tmp_path / "good.ply"
    save_scene_ply(sc, str(good))
    raw = good.read_bytes()

    (tmp_path / "trunc.ply").write_bytes(raw[: len(raw) // 2])
    (tmp_path / "garbage.ply").write_bytes(b"not a ply at all\n" * 10)
    (tmp_path / "nohdr.ply").write_bytes(raw[raw.index(b"end_header"):])
    for name in ("trunc.ply", "garbage.ply", "nohdr.ply"):
        with pytest.raises(ValueError):
            load_scene_ply(str(tmp_path / name), max_sh_degree=1)


def test_non_pinhole_colmap_model_raises(tmp_path):
    import pytest

    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    cm.write_intrinsics_text(
        str(sparse / "cameras.txt"),
        {1: cm.ColmapCamera(1, "PINHOLE", 64, 48,
                            np.array([60.0, 60.0, 32.0, 24.0]))},
    )
    txt = (sparse / "cameras.txt").read_text().replace(
        "PINHOLE", "OPENCV_FISHEYE")
    (sparse / "cameras.txt").write_text(txt)
    cm.write_extrinsics_text(
        str(sparse / "images.txt"),
        {1: cm.ColmapImage(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
                           "a.png", np.zeros((0, 2)), np.zeros(0, int))},
    )
    (sparse / "points3D.txt").write_text("# none\n")
    with pytest.raises(ValueError, match="not handled"):
        load_scene_info(str(tmp_path))
