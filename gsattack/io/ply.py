"""PLY I/O for Gaussian scenes — byte-compatible with the reference schema.

Pure-numpy binary PLY reader/writer (no `plyfile` dependency) reproducing
the reference's attribute schema and field ordering exactly
(`scene/gaussian_model.py:377-467`):

  x y z nx ny nz f_dc_{0..2} f_rest_{0..3K-1} opacity scale_{0..2}
  rot_{0..3} obj_dc_{0..15}

with `f_rest` flattened **channel-major** ((N, 3, K) -> 3K columns, column
index = channel * K + coeff), which is why load/save transpose against our
coefficient-major (N, K, 3) in-memory layout.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.scene import NUM_OBJECTS, GaussianScene

_PLY_DTYPES = {
    "float": np.float32,
    "float32": np.float32,
    "double": np.float64,
    "float64": np.float64,
    "uchar": np.uint8,
    "uint8": np.uint8,
    "char": np.int8,
    "int8": np.int8,
    "short": np.int16,
    "int16": np.int16,
    "ushort": np.uint16,
    "uint16": np.uint16,
    "int": np.int32,
    "int32": np.int32,
    "uint": np.uint32,
    "uint32": np.uint32,
}


def read_ply_vertex_table(path: str) -> dict[str, np.ndarray]:
    """Parse a (binary-little-endian or ascii) PLY 'vertex' element into a
    dict of column name -> (N,) array."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements: list[tuple[str, int, list[tuple[str, str]]]] = []
        cur: Optional[tuple[str, int, list]] = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "comment":
                continue
            elif parts[0] == "element":
                cur = (parts[1], int(parts[2]), [])
                elements.append(cur)
            elif parts[0] == "property":
                if parts[1] == "list":
                    raise ValueError("list properties unsupported in vertex tables")
                cur[2].append((parts[2], parts[1]))
            elif parts[0] == "end_header":
                break
        if fmt not in ("binary_little_endian", "ascii"):
            raise ValueError(f"{path}: unsupported PLY format {fmt}")

        out: dict[str, np.ndarray] = {}
        for name, count, props in elements:
            dtype = np.dtype(
                [(p, _PLY_DTYPES[t]) for p, t in props]
            ).newbyteorder("<")
            # Native fast path: all-f32 binary vertex tables (the Gaussian
            # scene format) de-interleave in parallel C++ (gsattack/native).
            if (
                fmt == "binary_little_endian"
                and name == "vertex"
                and all(t in ("float", "float32") for _, t in props)
            ):
                from .. import native

                cols = native.read_columns(path, f.tell(), count, len(props))
                if cols is not None:
                    f.seek(dtype.itemsize * count, 1)
                    for i, (p, _) in enumerate(props):
                        out[p] = cols[i]
                    continue
            if fmt == "binary_little_endian":
                raw = f.read(dtype.itemsize * count)
                table = np.frombuffer(raw, dtype=dtype, count=count)
            else:
                rows = [f.readline().split() for _ in range(count)]
                table = np.array(
                    [tuple(r) for r in rows], dtype=dtype
                )
            if name == "vertex":
                for p, _ in props:
                    out[p] = np.ascontiguousarray(table[p])
        return out


def write_ply_vertex_table(
    path: str, columns: list[tuple[str, np.ndarray]]
) -> None:
    """Write a binary_little_endian PLY with a single float32 vertex table."""
    n = columns[0][1].shape[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name, _ in columns]
    header.append("end_header")
    from .. import native

    cols = [np.asarray(c, dtype=np.float32).reshape(n) for _, c in columns]
    data = native.interleave(cols)
    if data is None:
        data = np.stack(cols, axis=1)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(np.ascontiguousarray(data, dtype="<f4").tobytes())


def save_scene_ply(scene: GaussianScene, path: str, compact: bool = True) -> None:
    """Serialize a scene with the reference's exact attribute schema
    (`save_ply`, `scene/gaussian_model.py:393-411`)."""
    sc = scene.compact() if compact else scene
    n = sc.num_points
    xyz = np.asarray(sc.xyz, np.float32)
    f_dc = np.asarray(sc.f_dc, np.float32).transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(sc.f_rest, np.float32).transpose(0, 2, 1).reshape(n, -1)
    obj_dc = np.asarray(sc.obj_dc, np.float32).transpose(0, 2, 1).reshape(n, -1)
    cols: list[tuple[str, np.ndarray]] = [
        ("x", xyz[:, 0]),
        ("y", xyz[:, 1]),
        ("z", xyz[:, 2]),
        ("nx", np.zeros(n, np.float32)),
        ("ny", np.zeros(n, np.float32)),
        ("nz", np.zeros(n, np.float32)),
    ]
    cols += [(f"f_dc_{i}", f_dc[:, i]) for i in range(f_dc.shape[1])]
    cols += [(f"f_rest_{i}", f_rest[:, i]) for i in range(f_rest.shape[1])]
    cols.append(("opacity", np.asarray(sc.opacity_logit, np.float32)[:, 0]))
    scale = np.asarray(sc.log_scale, np.float32)
    cols += [(f"scale_{i}", scale[:, i]) for i in range(scale.shape[1])]
    rot = np.asarray(sc.quat, np.float32)
    cols += [(f"rot_{i}", rot[:, i]) for i in range(rot.shape[1])]
    cols += [(f"obj_dc_{i}", obj_dc[:, i]) for i in range(obj_dc.shape[1])]
    write_ply_vertex_table(path, cols)


def load_scene_ply(path: str, max_sh_degree: int = 3) -> GaussianScene:
    """Load a scene PLY (`load_ply`, `scene/gaussian_model.py:418-467`):
    sorts `f_rest_*`/`scale_*`/`rot_*` numerically, tolerates missing
    `obj_dc_*`, and activates the max SH degree."""
    t = read_ply_vertex_table(path)
    n = t["x"].shape[0]
    xyz = np.stack([t["x"], t["y"], t["z"]], axis=1)
    opacity = t["opacity"][:, None]

    def sorted_cols(prefix):
        names = [k for k in t if k.startswith(prefix)]
        names.sort(key=lambda s: int(s.split("_")[-1]))
        return np.stack([t[k] for k in names], axis=1) if names else None

    f_dc = np.stack([t["f_dc_0"], t["f_dc_1"], t["f_dc_2"]], axis=1)[:, None, :]
    k_rest = (max_sh_degree + 1) ** 2 - 1
    rest = sorted_cols("f_rest_")
    if rest is None:
        rest = np.zeros((n, 3 * k_rest), np.float32)
    assert rest.shape[1] == 3 * k_rest, (
        f"f_rest columns {rest.shape[1]} != 3*{k_rest}"
    )
    f_rest = rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
    scales = sorted_cols("scale_")
    rots = sorted_cols("rot_")
    obj = sorted_cols("obj_dc_")
    if obj is None:
        obj = np.zeros((n, NUM_OBJECTS), np.float32)
    return GaussianScene(
        xyz=jnp.asarray(xyz, jnp.float32),
        f_dc=jnp.asarray(f_dc, jnp.float32),
        f_rest=jnp.asarray(f_rest, jnp.float32),
        log_scale=jnp.asarray(scales, jnp.float32),
        quat=jnp.asarray(rots, jnp.float32),
        opacity_logit=jnp.asarray(opacity, jnp.float32),
        obj_dc=jnp.asarray(obj, jnp.float32)[:, None, :],
        alive=jnp.ones(n, dtype=bool),
        active_sh_degree=max_sh_degree,
        max_sh_degree=max_sh_degree,
    )


def read_points_ply(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read a plain point-cloud PLY -> (points, colors[0..1], normals)
    (reference `fetchPly`, `scene/dataset_readers.py:107-113`)."""
    t = read_ply_vertex_table(path)
    pts = np.stack([t["x"], t["y"], t["z"]], axis=1).astype(np.float32)
    if "red" in t:
        cols = (
            np.stack([t["red"], t["green"], t["blue"]], axis=1).astype(np.float32)
            / 255.0
        )
    else:
        cols = np.full_like(pts, 0.5)
    if "nx" in t:
        normals = np.stack([t["nx"], t["ny"], t["nz"]], axis=1).astype(np.float32)
    else:
        normals = np.zeros_like(pts)
    return pts, cols, normals


def store_points_ply(
    path: str, xyz: np.ndarray, rgb: np.ndarray
) -> None:
    """Write a colored point cloud (reference `storePly`,
    `scene/dataset_readers.py:116-130`). rgb in [0, 255] uint8 range."""
    n = xyz.shape[0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = [
        "ply",
        "format binary_little_endian 1.0",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
        "property float nx",
        "property float ny",
        "property float nz",
        "property uchar red",
        "property uchar green",
        "property uchar blue",
        "end_header",
    ]
    dtype = np.dtype(
        [(k, "<f4") for k in ("x", "y", "z", "nx", "ny", "nz")]
        + [(k, "u1") for k in ("red", "green", "blue")]
    )
    table = np.zeros(n, dtype=dtype)
    for i, k in enumerate(("x", "y", "z")):
        table[k] = xyz[:, i]
    for i, k in enumerate(("red", "green", "blue")):
        table[k] = np.asarray(rgb[:, i], np.uint8)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(table.tobytes())
