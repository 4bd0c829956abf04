"""Config system: override parsing, type coercion, error reporting."""

import pytest

from tpu3dsad.config import Config, apply_overrides, parse_cli


def test_scalar_overrides():
    cfg = apply_overrides(
        Config(),
        ["train.lr=0.01", "train.batch_size=4", "data.augment=false",
         "model.name=classifier", "ops_impl=pallas"],
    )
    assert cfg.train.lr == 0.01
    assert cfg.train.batch_size == 4
    assert cfg.data.augment is False
    assert cfg.model.name == "classifier"
    assert cfg.ops_impl == "pallas"


def test_tuple_overrides():
    cfg = apply_overrides(
        Config(),
        ["model.sa_npoints=(128,64,32,16)", "model.cluster_radius_bank=(0.1,0.2)",
         "train.lr_decay_steps=()"],
    )
    assert cfg.model.sa_npoints == (128, 64, 32, 16)
    assert cfg.model.cluster_radius_bank == (0.1, 0.2)
    assert cfg.train.lr_decay_steps == ()


def test_nested_tuple_shapes_flatten():
    # nested tuples come in flat; model code reads per-level channel lists
    cfg = apply_overrides(Config(), ["model.num_proposals=64"])
    assert cfg.model.num_proposals == 64


def test_unknown_key_lists_valid():
    with pytest.raises(ValueError, match="valid:"):
        apply_overrides(Config(), ["train.nope=1"])
    with pytest.raises(ValueError, match="valid:"):
        apply_overrides(Config(), ["nonsection.x=1"])


def test_malformed_override():
    with pytest.raises(ValueError, match="key=value"):
        apply_overrides(Config(), ["trainlr"])


def test_parse_cli_ignores_non_kv():
    cfg = parse_cli(["--verbose", "train.seed=7"])
    assert cfg.train.seed == 7


def test_immutability():
    cfg = Config()
    with pytest.raises(Exception):
        cfg.train.lr = 0.5  # frozen dataclass


def test_nested_tuple_overrides_preserve_structure():
    """Regression: the strip-and-split coercion silently FLATTENED nested
    tuples — '((16,16),(16,32))' became ((16,),(16,),(16,),(32,)), so every
    CLI run with explicit sa_channels built single-layer MLPs."""
    cfg = apply_overrides(
        Config(),
        ["model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
         "model.fp_channels=((32, 32), (64,))"],
    )
    assert cfg.model.sa_channels == ((16, 16), (16, 32), (16, 32), (16, 32))
    assert cfg.model.fp_channels == ((32, 32), (64,))


def test_tuple_overrides_with_spaces_and_scalars():
    cfg = apply_overrides(
        Config(),
        ["model.sa_radii=(0.2, 0.4, 0.8)", "train.lr_decay_steps=80,120",
         "train.mesh_axes=data", "model.cluster_radius_bank=(0.3)"],
    )
    assert cfg.model.sa_radii == (0.2, 0.4, 0.8)
    assert cfg.train.lr_decay_steps == (80, 120)
    assert cfg.train.mesh_axes == ("data",)
    assert cfg.model.cluster_radius_bank == (0.3,)


def test_str_tuple_rejects_non_string_literal():
    # a typo like train.mesh_axes=(1,2) must fail at parse time, not as a
    # confusing mesh-axis lookup error later (str-typed tuple fields)
    with pytest.raises(ValueError, match="expected a string"):
        apply_overrides(Config(), ["train.mesh_axes=(1,2)"])
    # unquoted names stay valid (not python literals -> flat split path)
    cfg = apply_overrides(Config(), ["train.mesh_axes=(data,points)"])
    assert cfg.train.mesh_axes == ("data", "points")
    # quoted names parse as literals and stay strings
    cfg = apply_overrides(Config(), ["train.mesh_axes=('data','points')"])
    assert cfg.train.mesh_axes == ("data", "points")


def test_presets_expand_and_user_overrides_win():
    from tpu3dsad.config import parse_cli
    from tpu3dsad.presets import PRESETS, expand

    cfg = parse_cli(["preset=outdoor"])
    assert cfg.data.name == "kitti"
    assert cfg.model.num_classes == 3
    assert cfg.model.center_loss_norm == cfg.model.assign_near == 1.5
    # user overrides AFTER the preset win
    cfg2 = parse_cli(["preset=outdoor", "train.lr=0.0005",
                      "model.assign_near=2.0"])
    assert cfg2.train.lr == 0.0005 and cfg2.model.assign_near == 2.0
    # every preset parses cleanly against the dataclasses
    for name in PRESETS:
        parse_cli([f"preset={name}"])
    with pytest.raises(ValueError, match="unknown preset"):
        expand(["preset=nope"])
