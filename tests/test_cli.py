"""CLI surface tests (utils/cli/interface.py): command registration, help,
scaffolding, and the torch-checkpoint conversion command end-to-end."""

import numpy as np
import pytest
from click.testing import CliRunner

from ganslate_tpu.utils.cli.interface import interface

torch = pytest.importorskip("torch")


def test_commands_registered():
    runner = CliRunner()
    result = runner.invoke(interface, ["--help"])
    assert result.exit_code == 0
    for cmd in ("train", "test", "infer", "new-project", "your-first-run",
                "download-dataset", "import-torch-checkpoint",
                "convert-fid-weights"):
        assert cmd in result.output, f"`{cmd}` missing from CLI help"


def test_convert_fid_weights_cmd(tmp_path):
    """`convert-fid-weights` .pth -> .npz round-trips through the torch
    importer and the result loads torch-free (extension dispatch)."""
    from tests.torch_inception import InceptionV3 as TorchInceptionV3

    from ganslate_tpu.nn.inception import load_inception_weights

    pth = tmp_path / "inception_v3.pth"
    torch.save(TorchInceptionV3().state_dict(), str(pth))
    npz = tmp_path / "inception_v3.npz"

    runner = CliRunner()
    result = runner.invoke(interface,
                           ["convert-fid-weights", str(pth), str(npz)])
    assert result.exit_code == 0, result.output
    assert npz.exists()

    a = load_inception_weights(str(pth))
    b = load_inception_weights(str(npz))
    import jax
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(np.asarray(leaf), fb[path])


def test_new_project_scaffold(tmp_path):
    runner = CliRunner()
    result = runner.invoke(interface,
                           ["new-project", str(tmp_path), "--name", "myproj"])
    assert result.exit_code == 0, result.output
    project = tmp_path / "myproj"
    assert (project / "__init__.py").exists()
    assert list(project.rglob("*.yaml")), "scaffold has no experiment YAML"


def test_train_requires_config():
    runner = CliRunner()
    result = runner.invoke(interface, ["train"])
    assert result.exit_code != 0
    assert "config" in str(result.exception)


def test_import_torch_checkpoint_command(tmp_path):
    from .reference_torch import load_reference_nn
    ref = load_reference_nn()

    nets = {
        "G_AB": ref["Resnet2D"](3, 3, "instance", n_residual_blocks=1),
        "G_BA": ref["Resnet2D"](3, 3, "instance", n_residual_blocks=1),
        "D_B": ref["PatchGAN2D"](3, 8, 2, (4, 4), "instance"),
        "D_A": ref["PatchGAN2D"](3, 8, 2, (4, 4), "instance"),
    }
    pth = tmp_path / "500.pth"
    torch.save({k: v.state_dict() for k, v in nets.items()}, pth)

    yaml = f"""
train:
  output_dir: {tmp_path}/out
  batch_size: 4
  cuda: False
  n_iters: 4
  n_iters_decay: 0
  dataset:
    _target_: ganslate.data.UnpairedImageDataset
    root: {tmp_path}
    num_workers: 0
  gan:
    _target_: ganslate.nn.gans.unpaired.CycleGAN
    generator:
      _target_: ganslate.nn.generators.Resnet2D
      n_residual_blocks: 1
      in_out_channels:
        AB: [3, 3]
    discriminator:
      _target_: ganslate.nn.discriminators.PatchGAN2D
      ndf: 8
      n_layers: 2
      in_channels:
        B: 3
"""
    (tmp_path / "exp.yaml").write_text(yaml)

    runner = CliRunner()
    result = runner.invoke(interface, ["import-torch-checkpoint", str(pth),
                                       f"config={tmp_path}/exp.yaml"])
    assert result.exit_code == 0, result.output
    assert (tmp_path / "out" / "checkpoints" / "500").exists()
