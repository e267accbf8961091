"""Training-quality benchmark (VERDICT r2 item 4): train a synthetic scene
through several densify cycles and report held-out PSNR — pins the claim
that the slot-allocator densification + preserved Adam moments actually
train well (the reference's quality reference is the Inria 3DGS loop it
never vendors).

Usage (CPU works; TPU faster):
    python scripts/train_quality_bench.py [--n 10000] [--iters 2000]

Prints a one-line JSON summary; record the number in README.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=2_000)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gsattack.core import make_camera, scene_from_points
    from gsattack.render import render
    from gsattack.train import TrainConfig, Trainer
    from gsattack.utils import psnr

    rng = np.random.default_rng(0)
    n = args.n
    # target scene: structured blobs so densification has real work to do
    centers = rng.normal(size=(12, 3)) * np.array([0.9, 0.7, 0.25])
    which = rng.integers(0, len(centers), n)
    pts = centers[which] + rng.normal(size=(n, 3)) * 0.12
    pts += np.array([0.0, 0.0, 2.8])
    cols = rng.uniform(0.1, 0.95, size=(n, 3))
    target = scene_from_points(pts, cols, max_sh_degree=2)
    target = target.replace(
        active_sh_degree=2,
        opacity_logit=jnp.full_like(target.opacity_logit, 1.0),
    )

    size = args.size
    cams = [
        make_camera(
            np.eye(3), np.array([0.03 * i, 0.0, 0.1 * i]), 1.0, 1.0, size, size
        )
        for i in range(args.views)
    ]
    bg = jnp.zeros(3)
    gts = [np.asarray(render(target, c, bg)["render"]) for c in cams]
    train_cams, held_cam = cams[:-1], cams[-1]
    train_gts, held_gt = gts[:-1], jnp.asarray(gts[-1])

    # init: subsampled noisy cloud at 1/4 the target count
    m = n // 4
    sel = rng.choice(n, m, replace=False)
    init = scene_from_points(
        pts[sel] + rng.normal(size=(m, 3)) * 0.05,
        np.full((m, 3), 0.5),
        max_sh_degree=2,
    )

    cfg = TrainConfig(
        iterations=args.iters,
        densify_from_iter=150,
        densification_interval=100,
        densify_until_iter=int(args.iters * 0.75),
        densify_grad_threshold=5e-5,
        opacity_reset_interval=10**9,  # off: short schedule
        sh_increase_interval=400,
        position_lr_max_steps=args.iters,
    )
    trainer = Trainer(init, cfg, cameras_extent=1.5)

    def held_psnr():
        img = render(trainer.state.scene, held_cam, bg)["render"]
        return float(psnr(img, held_gt))

    p0 = held_psnr()
    t0 = time.time()
    trainer.fit(
        train_cams, train_gts, iterations=args.iters,
        log=lambda i, l: (i % 200 == 0) and print(
            f"iter {i}: loss {l:.4f} alive {int(trainer.state.scene.alive.sum())}",
            file=sys.stderr,
        ),
    )
    dt = time.time() - t0
    p1 = held_psnr()
    alive = int(trainer.state.scene.alive.sum())
    print(
        json.dumps(
            {
                "metric": "heldout_psnr_db",
                "value": round(p1, 2),
                "init_psnr_db": round(p0, 2),
                "alive_splats": alive,
                "iters": args.iters,
                "seconds": round(dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
