"""Config engine + schema tests: YAML parsing, interpolation, dotlist
overrides, `_target_` dataclass discovery — including the reference
horse2zebra experiment YAML parsing unchanged (API-compat requirement)."""

import dataclasses
from pathlib import Path

import pytest

from ganslate_tpu.configs import Config
from ganslate_tpu.configs.omega import (II, MISSING, Conf,
                                        MissingMandatoryValue)
from ganslate_tpu.configs.utils import init_config

REF_YAML = Path("/root/reference/projects/horse2zebra/experiments/default.yaml")


def test_from_yaml_and_access():
    conf = Conf.from_yaml("a:\n  b: 3\n  c: hello\nd: [1, 2]\n")
    assert conf.a.b == 3
    assert conf["a"]["c"] == "hello"
    assert list(conf.d) == [1, 2]


def test_interpolation():
    conf = Conf.from_yaml("train:\n  batch_size: 4\nval:\n  batch_size: ${train.batch_size}\n")
    assert conf.val.batch_size == 4


def test_ii_interpolation_marker():
    assert II("train.x") == "${train.x}"


def test_missing_raises():
    conf = Conf.create({"x": MISSING})
    with pytest.raises(MissingMandatoryValue):
        _ = conf.x


def test_dotlist_and_merge():
    base = Conf.from_yaml("train:\n  batch_size: 1\n  lr: 0.1\n")
    cli = Conf.from_dotlist(["train.batch_size=8", "train.new_key=hi"])
    merged = Conf.merge(base, cli)
    assert merged.train.batch_size == 8
    assert merged.train.lr == 0.1
    assert merged.train.new_key == "hi"


def test_structured_dataclass():
    @dataclasses.dataclass
    class Inner:
        x: int = 3

    @dataclasses.dataclass
    class Outer:
        name: str = MISSING
        inner: Inner = dataclasses.field(default_factory=Inner)

    conf = Conf.structured(Outer)
    assert conf.inner.x == 3
    with pytest.raises(MissingMandatoryValue):
        _ = conf.name


def test_update_and_select():
    conf = Conf.create({})
    conf.update("a.b.c", 5)
    assert conf.select("a.b.c") == 5
    assert conf.select("a.b.missing", default="d") == "d"


def test_reference_horse2zebra_yaml_parses():
    """The reference experiment YAML must produce a fully-typed config tree
    with `ganslate.*` targets resolved to this package's schemas."""
    conf = Conf.load(REF_YAML)
    conf.project = None  # reference project dir path doesn't exist here
    conf = init_config(conf, config_class=Config)

    assert conf.mode == "train"
    assert conf.train.n_iters == 117700
    assert conf.train.batch_size == 1
    # dataset schema from UnpairedImageDatasetConfig
    assert conf.train.dataset._target_ == "ganslate.data.UnpairedImageDataset"
    assert list(conf.train.dataset.load_size) == [128, 128]
    assert conf.train.dataset.pin_memory is True  # schema default
    # gan schema from CycleGANConfig
    assert conf.train.gan.pool_size == 50  # schema default
    assert conf.train.gan.optimizer.lambda_AB == 10.0
    assert conf.train.gan.optimizer.beta1 == 0.5  # base schema default
    # per-direction channel interpolation default: BA <- AB
    assert list(conf.train.gan.generator.in_out_channels.BA) == [3, 3]
    assert conf.train.gan.discriminator.in_channels.A == 3
    # cross-mode interpolation: infer.batch_size <- train.batch_size
    assert conf.infer.batch_size == 1
    assert conf.infer.checkpointing.load_iter == 1
    # val/test absent
    assert conf.val is None and conf.test is None


def test_cli_override_on_full_config():
    conf = Conf.load(REF_YAML)
    conf.project = None
    conf = init_config(conf, config_class=Config)
    merged = Conf.merge(conf, Conf.from_dotlist(["train.batch_size=16"]))
    assert merged.train.batch_size == 16
    assert merged.infer.batch_size == 16  # interpolation follows


def test_nested_optional_sections_get_schema_defaults(tmp_path):
    """A partial YAML dict under an Optional[Dataclass] field must still pick
    up the dataclass defaults (OmegaConf typed-merge semantics): regression
    for val.sliding_window.{batch_size,overlap,mode} disappearing when the
    YAML sets only window_size — the combination every reference 3D project
    uses (e.g. brats .../experiments/cyclegan.yaml)."""
    yaml_text = """
train:
    output_dir: /tmp/x
    n_iters: 1
    batch_size: 1
    logging:
        wandb:
            project: some-project
    dataset:
        _target_: ganslate.data.UnpairedImageDataset
        root: /tmp/x
        load_size: [8, 8]
        final_size: [8, 8]
    gan:
        _target_: ganslate.nn.gans.unpaired.CycleGAN
        generator:
            _target_: ganslate.nn.generators.Vnet3D
            in_out_channels:
                AB: [1, 1]
        discriminator:
            _target_: ganslate.nn.discriminators.PatchGAN3D
            in_channels:
                B: 1
        optimizer:
            lambda_AB: 5.0
            lambda_BA: 5.0

val:
    freq: 10
    dataset:
        _target_: ganslate.data.UnpairedImageDataset
        root: /tmp/x
        load_size: [8, 8]
        final_size: [8, 8]
    sliding_window:
        window_size: [16, 32, 32]
"""
    p = tmp_path / "exp.yaml"
    p.write_text(yaml_text)
    conf = init_config(p, config_class=Config)
    sw = conf.val.sliding_window
    assert list(sw.window_size) == [16, 32, 32]
    assert sw.batch_size == 1          # schema default
    assert sw.overlap == 0.25          # schema default
    assert sw.mode == "gaussian"       # schema default
    # Same pattern one level deeper on the train side: partial wandb dict.
    assert conf.train.logging.wandb.project == "some-project"
    assert conf.train.logging.wandb.run is None  # schema default survives
