"""Real-data end-to-end smoke, mirroring the reference's only integration
test (/root/reference/tests/test_first_run.py:7-28): scaffold the first-run
project, fetch the real facades dataset, and train two iterations through
the full engine path (config -> builders -> DataLoader -> fused train step).

The dataset download needs network access; environments without egress skip
the training half but still verify the scaffold (the reference test would
simply fail there).
"""

import socket
from pathlib import Path

import pytest

from ganslate_tpu.engines.utils import init_engine
from ganslate_tpu.utils.cli import scaffold
from ganslate_tpu.utils.cli.scripts import download_datasets


def _has_network(host="people.eecs.berkeley.edu", port=443, timeout=3):
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def test_first_run_scaffold(tmp_path):
    project_dir = scaffold.create_first_run(str(tmp_path))
    assert project_dir.is_dir()
    assert (project_dir / "default.yaml").is_file()


@pytest.mark.skipif(not _has_network(), reason="facades download needs network")
def test_first_run_training(tmp_path):
    project_dir = scaffold.create_first_run(str(tmp_path))
    download_datasets.download("facades", str(project_dir))
    assert (project_dir / "facades" / "train" / "A").is_dir()
    assert (project_dir / "facades" / "train" / "B").is_dir()

    engine = init_engine("train", [f"config={project_dir}/default.yaml",
                                   "train.dataset.num_workers=0"])
    assert engine.run() is None
    assert any(Path(project_dir, "checkpoints", "first_run").rglob("*"))
