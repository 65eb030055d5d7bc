"""End-to-end preemption safety: SIGTERM a live training subprocess, assert a
checkpoint is written at the interruption iteration (engines/trainer.py
preemption handler — the reference left this as 'TODO: save on cancel'),
then resume from it with `load_iter` and assert training continues to the
adjusted end iteration."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _make_dataset(root: Path):
    rng = np.random.default_rng(0)
    for split in ("train",):
        for dom in ("A", "B"):
            d = root / split / dom
            d.mkdir(parents=True)
            for i in range(6):
                arr = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img{i}.jpg")


def _write_yaml(tmp: Path, out_dir: Path) -> Path:
    yaml = f"""
train:
  output_dir: {out_dir}
  cuda: False
  n_iters: 9999
  n_iters_decay: 0
  batch_size: 4
  mixed_precision: False
  seed: 11
  logging:
    freq: 1
  checkpointing:
    freq: 100000
  dataset:
    _target_: ganslate.data.UnpairedImageDataset
    root: {tmp}/ds/train
    num_workers: 0
    image_channels: 3
    preprocess: ["resize"]
    load_size: [32, 32]
    final_size: [32, 32]
  gan:
    _target_: ganslate.nn.gans.unpaired.CycleGAN
    pool_size: 4
    generator:
      _target_: ganslate.nn.generators.Resnet2D
      n_residual_blocks: 1
      ngf: 8
      in_out_channels:
        AB: [3, 3]
    discriminator:
      _target_: ganslate.nn.discriminators.PatchGAN2D
      n_layers: 1
      ndf: 8
      in_channels:
        B: 3
    optimizer:
      lr_D: 0.0002
      lr_G: 0.0004
"""
    path = tmp / "exp.yaml"
    path.write_text(yaml)
    return path


def _spawn(yaml_path: Path, overrides=(), log_path: Path = None):
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from ganslate_tpu.engines.utils import init_engine\n"
        f"init_engine('train', {['config=' + str(yaml_path), *overrides]!r}).run()\n"
        "print('TRAIN_EXITED_CLEANLY', flush=True)\n"
    )
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    env["JAX_PLATFORMS"] = "cpu"
    log = open(log_path, "w")
    proc = subprocess.Popen([sys.executable, "-u", "-c", code], cwd=REPO,
                            env=env, stdout=log, stderr=subprocess.STDOUT)
    return proc


def _wait_for(predicate, timeout, interval=0.5):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False


def test_sigterm_checkpoints_and_resume(tmp_path):
    _make_dataset(tmp_path / "ds")
    out_dir = tmp_path / "out"
    yaml_path = _write_yaml(tmp_path, out_dir)
    log1 = tmp_path / "train1.log"

    proc = _spawn(yaml_path, log_path=log1)
    try:
        # Wait until the loop is actually iterating: "(iter: N |" is the
        # tracker's per-iteration line (the config dump also contains the
        # substring "iter: ", hence the paren).
        assert _wait_for(lambda: "(iter: " in log1.read_text()
                         if log1.exists() else False, timeout=420), \
            f"training never started:\n{log1.read_text()[-2000:]}"
        time.sleep(2)  # a few more iterations
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()

    text = log1.read_text()
    assert rc == 0, f"rc={rc}\n{text[-2000:]}"
    assert "TRAIN_EXITED_CLEANLY" in text
    assert "Preemption signal received" in text

    ckpt_dir = out_dir / "checkpoints"
    saved = sorted(int(p.name) for p in ckpt_dir.iterdir() if p.name.isdigit())
    assert saved, f"no checkpoint written; log:\n{text[-2000:]}"
    k = saved[-1]
    assert k >= 1

    # ---- Resume from the preemption checkpoint and finish 3 more iters.
    log2 = tmp_path / "train2.log"
    proc = _spawn(yaml_path,
                  overrides=(f"train.checkpointing.load_iter={k}",
                             f"train.n_iters={k + 3}",
                             "train.checkpointing.freq=1"),
                  log_path=log2)
    rc = proc.wait(timeout=600)
    text2 = log2.read_text()
    assert rc == 0, f"rc={rc}\n{text2[-2000:]}"
    assert "TRAIN_EXITED_CLEANLY" in text2
    # Resume semantics: start at 1+k, end at k+3 (n_iters relative).
    assert f"Loading checkpoint of iteration {k}" in text2
    final = out_dir / "checkpoints" / str(k + 3)
    assert final.exists(), f"resume did not reach iteration {k + 3}:\n{text2[-2000:]}"


def test_checkpoint_resume_reproduces_trajectory(tmp_path):
    """Checkpoint/restore is trajectory-transparent: 3 steps -> checkpoint ->
    restore -> 3 steps must equal 6 uninterrupted steps BITWISE (same batches,
    fp32, CPU). Only holds because the checkpoint carries the FULL train
    state — params, opt_state, rng, and the ImagePools (the reference drops
    its pools on resume, /root/reference/ganslate/nn/gans/base.py:226-251;
    an earlier version here did too, silently resetting D's fake history)."""
    import jax
    import numpy as np

    from ganslate_tpu.utils.builders import build_gan
    from ganslate_tpu.utils.testing import make_cyclegan_conf

    def make_batches(n):
        rng = np.random.default_rng(7)
        return [{k: rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
                 for k in ("A", "B")} for _ in range(n)]

    def make_model(out_dir):
        conf = make_cyclegan_conf(output_dir=str(out_dir), batch_size=2,
                                  image_size=16, n_residual_blocks=1,
                                  ngf=8, ndf=8, n_layers_D=1, pool_size=4,
                                  mixed_precision=False, seed=3)
        model = build_gan(conf)
        model.setup(example_batch=make_batches(1)[0])
        return model

    batches = make_batches(6)

    # Uninterrupted run.
    m_full = make_model(tmp_path / "full")
    for b in batches:
        m_full.set_input(b)
        m_full.optimize_parameters()

    # Interrupted run: 3 steps, checkpoint, restore into a FRESH model.
    m_a = make_model(tmp_path / "interrupted")
    for b in batches[:3]:
        m_a.set_input(b)
        m_a.optimize_parameters()
    m_a.save_checkpoint(3)

    m_b = make_model(tmp_path / "interrupted")
    m_b.conf.train.checkpointing.load_optimizers = True
    m_b.load_networks(3)
    # Pools restored, not re-initialized.
    count = int(jax.device_get(m_b.state.pools["fake_B"].count))
    assert count == int(jax.device_get(m_a.state.pools["fake_B"].count)) > 0
    for b in batches[3:]:
        m_b.set_input(b)
        m_b.optimize_parameters()

    flat_full = jax.tree_util.tree_leaves(
        {"params": m_full.state.params, "opt": m_full.state.opt_state,
         "pools": m_full.state.pools})
    flat_res = jax.tree_util.tree_leaves(
        {"params": m_b.state.params, "opt": m_b.state.opt_state,
         "pools": m_b.state.pools})
    assert len(flat_full) == len(flat_res)
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))


def _write_yaml_stochastic(tmp: Path, out_dir: Path, n_iters: int,
                           ckpt_freq: int) -> Path:
    """Config with the FULL stochastic data plane on: unpaired B-draws,
    random_crop + random_flip transforms, threaded workers."""
    yaml = f"""
train:
  output_dir: {out_dir}
  cuda: False
  n_iters: {n_iters}
  n_iters_decay: 0
  batch_size: 4
  mixed_precision: False
  seed: 11
  logging:
    freq: 1
  checkpointing:
    freq: {ckpt_freq}
  dataset:
    _target_: ganslate.data.UnpairedImageDataset
    root: {tmp}/ds/train
    num_workers: 2
    image_channels: 3
    preprocess: ["resize", "random_crop", "random_flip"]
    load_size: [36, 36]
    final_size: [32, 32]
  gan:
    _target_: ganslate.nn.gans.unpaired.CycleGAN
    pool_size: 4
    generator:
      _target_: ganslate.nn.generators.Resnet2D
      n_residual_blocks: 1
      ngf: 8
      in_out_channels:
        AB: [3, 3]
    discriminator:
      _target_: ganslate.nn.discriminators.PatchGAN2D
      n_layers: 1
      ndf: 8
      in_channels:
        B: 3
    optimizer:
      lr_D: 0.0002
      lr_G: 0.0004
"""
    path = tmp / f"exp_{out_dir.name}.yaml"
    path.write_text(yaml)
    return path


def test_trainer_path_resume_reproduces_trajectory(tmp_path):
    """The round-3 resume-trajectory test fed batches BY HAND; this one runs
    the REAL data plane — Trainer + InfiniteSampler + threaded DataLoader +
    the unpaired dataset's random B-draws and random crop/flip transforms —
    and demands the same bitwise (fp32/CPU) equality:

        6 uninterrupted Trainer iters  ==  3 iters -> checkpoint -> fresh
        Trainer resumed with load_iter=3 -> 3 more iters.

    Holds because (a) the checkpoint sidecar carries {sampler_seed, position}
    and the Trainer fast-forwards the sampler on resume (the reference
    restarts its permutation stream: /root/reference/ganslate/data/
    samplers.py keeps no cursor, nn/gans/base.py:226-251 saves no data
    state), and (b) every random draw in the data plane is a pure function
    of (sampler_seed, stream position) via the loader's per-sample RNGs —
    so prefetch depth and worker-thread scheduling can't perturb it."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ganslate_tpu.engines.utils import init_engine

    _make_dataset(tmp_path / "ds")

    def final_state(out_name, runs):
        out = tmp_path / out_name
        for n_iters, ckpt_freq, load_iter in runs:
            yaml_path = _write_yaml_stochastic(tmp_path, out, n_iters,
                                               ckpt_freq)
            overrides = []
            if load_iter:
                overrides = [f"train.checkpointing.load_iter={load_iter}"]
            trainer = init_engine("train",
                                  [f"config={yaml_path}", *overrides])
            trainer.run()
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore((out / "checkpoints" / "6").resolve())

    full = final_state("full", [(6, 6, None)])
    resumed = final_state("interrupted", [(3, 3, None), (6, 3, 3)])

    sidecar = tmp_path / "interrupted" / "checkpoints" / "data_state_3.json"
    assert sidecar.exists(), "checkpoint did not write the data-plane sidecar"

    flat_full, treedef_full = jax.tree_util.tree_flatten(full)
    flat_res, treedef_res = jax.tree_util.tree_flatten(resumed)
    assert treedef_full == treedef_res
    assert len(flat_full) > 0
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
