"""Config system + CLI tests."""

import os

import numpy as np
import pytest
import yaml

from gsattack.utils.config import ConfigNode, apply_overrides, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_repo_config_composes_scene():
    cfg = load_config(os.path.join(REPO, "configs"))
    assert cfg.scene.name == "toy"
    assert cfg.epsilon == 5.0
    assert cfg.max_iters == 100
    assert cfg.scene.detector_name == "toy"


def test_scene_override_selects_file():
    cfg = load_config(os.path.join(REPO, "configs"), overrides=["scene=blue_suv"])
    assert cfg.scene.name == "blue_suv"
    # ${cam_path} interpolation resolved from the root
    assert cfg.scene.source_path == "./assets/nyc_block"
    assert cfg.scene.is_targeted is False


def test_dotlist_overrides_types():
    cfg = load_config(
        os.path.join(REPO, "configs"),
        overrides=["epsilon=1.5", "batch_mode=true", "scene.target=car", "max_iters=7"],
    )
    assert cfg.epsilon == 1.5
    assert cfg.batch_mode is True
    assert cfg.scene.target == "car"
    assert cfg.max_iters == 7


def test_interpolation_and_now(tmp_path):
    os.makedirs(tmp_path / "scene", exist_ok=True)
    with open(tmp_path / "c.yaml", "w") as f:
        yaml.safe_dump(
            {
                "a": "hello",
                "b": "${a}_world",
                "n": 3,
                "n2": "${n}",
                "d": "run/${now:%Y}",
            },
            f,
        )
    from datetime import datetime

    cfg = load_config(str(tmp_path), "c", now=datetime(2030, 1, 2))
    assert cfg.b == "hello_world"
    assert cfg.n2 == 3  # whole-string interpolation preserves type
    assert cfg.d == "run/2030"


def test_apply_overrides_nested_creation():
    cfg = {"x": 1}
    apply_overrides(cfg, ["a.b.c=5", "x=2"])
    assert cfg["a"]["b"]["c"] == 5 and cfg["x"] == 2


def test_confignode_roundtrip():
    node = ConfigNode.wrap({"a": {"b": [1, {"c": 2}]}})
    assert node.a.b[1].c == 2
    assert node.to_dict() == {"a": {"b": [1, {"c": 2}]}}


def test_cli_attack_synthetic(tmp_path, monkeypatch):
    from gsattack.cli import main

    monkeypatch.chdir(REPO)
    rc = main(
        [
            "attack",
            "max_iters=2",
            "batch_mode=true",
            "batch_size=2",
            "eval_every=5",
            f"splat_asset_path={tmp_path}",
        ]
    )
    assert rc in (0, 1)  # runs to completion either way


def test_cli_attack_synthetic_mesh(tmp_path, monkeypatch):
    """use_mesh=true builds the (views, splats) mesh from the 8 virtual
    CPU devices and runs the attack under it end-to-end."""
    from gsattack.cli import main

    monkeypatch.chdir(REPO)
    rc = main(
        [
            "attack",
            "max_iters=2",
            "batch_mode=true",
            "batch_size=2",
            "eval_every=5",
            "use_mesh=true",
            f"splat_asset_path={tmp_path}",
        ]
    )
    assert rc in (0, 1)


def test_cli_sweep_multirun(tmp_path, monkeypatch):
    """The multirun producer: comma-valued overrides sweep their product,
    each combo running in its own subdir with a render.log the ASR/AP
    analyzers can consume (hydra.sweep layout, configs/config.yaml)."""
    from gsattack.cli import main

    monkeypatch.chdir(REPO)
    root = str(tmp_path / "mr")
    rc = main(
        [
            "sweep",
            "--sweep-dir", root,
            "--subdir-fmt", "{detector_name}_{i}",
            "write_images=false",
            "attack_conf_thresh=0.3,0.5",
        ]
    )
    assert rc == 0
    subs = sorted(os.listdir(root))
    assert subs == ["toy_0", "toy_1"]
    for sub in subs:
        log = os.path.join(root, sub, "render.log")
        assert os.path.getsize(log) > 0
        with open(os.path.join(root, sub, "overrides.yaml")) as f:
            txt = f.read()
        assert "attack_conf_thresh=0." in txt
    # the two runs got the two swept values
    texts = [
        open(os.path.join(root, s, "overrides.yaml")).read() for s in subs
    ]
    assert any("0.3" in t for t in texts) and any("0.5" in t for t in texts)


def test_cli_unknown_command():
    from gsattack.cli import main

    assert main(["bogus"]) == 2


def test_cli_asr(tmp_path):
    import json

    from gsattack.cli import main

    for name, cls in (("b.log", "car"), ("a.log", "clock")):
        with open(tmp_path / name, "w") as f:
            f.write(
                "t - "
                + json.dumps({"cam": 0, "pred_class": cls})
                + "\n"
            )
    rc = main(
        [
            "asr",
            "--benign-log",
            str(tmp_path / "b.log"),
            "--adv-log",
            str(tmp_path / "a.log"),
            "--target",
            "car",
        ]
    )
    assert rc == 0
