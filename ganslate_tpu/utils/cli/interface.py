"""Command-line interface.

Reference parity: /root/reference/ganslate/utils/cli/interface.py —
`train|test|infer` taking `config=<yaml>` + dotlist overrides, `new-project`
scaffolding, `your-first-run`, `download-dataset`. Differences: scaffolding is
template-based (no cookiecutter dependency), and there is no Apex installer —
TPUs run bf16 natively, no mixed-precision extension exists or is needed.
"""

import click

from ganslate_tpu.engines.utils import init_engine
from ganslate_tpu.utils.cli import scaffold
from ganslate_tpu.utils.cli.scripts import download_datasets


@click.group()
def interface():
    """ganslate-tpu - TPU-native GAN image-to-image translation framework."""


@interface.command(help="Train a model.")
@click.argument("dotlist_args", nargs=-1)
def train(dotlist_args):
    init_engine("train", dotlist_args).run()


@interface.command(help="Test a trained model. Requires paired data.")
@click.argument("dotlist_args", nargs=-1)
def test(dotlist_args):
    init_engine("test", dotlist_args).run()


@interface.command(help="Do inference with a trained model.")
@click.argument("dotlist_args", nargs=-1)
def infer(dotlist_args):
    init_engine("infer", dotlist_args).run()


@interface.command(name="new-project", help="Initialize a new project.")
@click.argument("path", default="./")
@click.option("--name", prompt="Project name", default="my_project")
def new_project(path, name):
    project_dir = scaffold.create_project(path, name)
    click.echo(f"Project created at {project_dir}")


@interface.command(name="your-first-run",
                   help="Scaffold a first-run project and fetch the facades dataset.")
@click.argument("path", default="./")
def your_first_run(path):
    project_dir = scaffold.create_first_run(path)
    download_datasets.download("facades", str(project_dir))
    click.echo(f"First run ready at {project_dir}")


@interface.command(name="download-dataset", help="Download a CycleGAN dataset.")
@click.argument("name")
@click.argument("path")
def download_dataset(name, path):
    download_datasets.download(name, path)


@interface.command(
    name="import-torch-checkpoint",
    help="Convert a reference PyTorch .pth checkpoint into a native orbax "
         "checkpoint under the experiment's output_dir, loadable via "
         "checkpointing.load_iter by train/test/infer.")
@click.argument("checkpoint_path")
@click.argument("dotlist_args", nargs=-1)
@click.option("--iter", "iter_idx", default=None, type=int,
              help="Iteration index for the converted checkpoint "
                   "(default: parsed from the filename, e.g. 20000.pth).")
def import_torch_checkpoint_cmd(checkpoint_path, dotlist_args, iter_idx):
    from ganslate_tpu.utils.builders import build_conf
    from ganslate_tpu.utils.torch_import import convert_checkpoint_to_native
    conf = build_conf(dotlist_args)
    path = convert_checkpoint_to_native(checkpoint_path, conf, iter_idx)
    click.echo(f"Converted checkpoint written to {path}")


@interface.command(
    name="convert-fid-weights",
    help="One-time conversion of torchvision inception_v3 FID weights "
         "(.pth, needs torch) to the native .npz format, so val/test FID "
         "runs without a torch runtime (metrics.fid_weights: out.npz).")
@click.argument("src")
@click.argument("dst")
def convert_fid_weights(src, dst):
    from ganslate_tpu.nn.inception import (load_torch_inception_file,
                                           save_inception_npz)
    save_inception_npz(load_torch_inception_file(src), dst)
    click.echo(f"Native FID weights written to {dst}")


if __name__ == "__main__":
    interface()
