"""TRAJECTORY-BAND fidelity: 300 Adam steps, torch reference vs TPU impl.

The lockstep suite (tests/test_lockstep.py) proves per-step equivalence
over 5-50 steps, bounded by the perturbed-twin chaos floor. At hundreds of
steps that floor saturates (GAN+Adam dynamics amplify an fp32-rounding
perturbation to O(1) relative), so exact comparison is information-free —
what CAN be asserted is that both frameworks stay in the SAME TRAINING
BASIN: windowed-mean loss curves and end-state generator behavior must
agree within a band calibrated by the torch-vs-perturbed-torch control
(the strongest checkpoint-free approximation of the fidelity north star
this environment allows; VERDICT r4 item 5).

Three models train side by side from identical weights on the same
deterministic synthetic stream:

  ref   — the reference's REAL CycleGAN class (in-process CPU torch,
          /root/reference/ganslate/nn/gans/unpaired/cyclegan.py:92-123)
  twin  — same checkpoint + 1e-6 perturbation re-injected every step:
          measures how far an EXACT reimplementation may drift (chaos)
  ours  — the TPU implementation (f32, CPU backend)

Assertions:
  1. per-loss windowed means (6 windows of 50): |ours − ref| bounded by
     3x the twin's deviation plus a 6%-of-scale additive floor;
  2. end-state generator-output similarity on held-out probes:
     SSIM(ours_fakeB, ref_fakeB) bounded below via SSIM(twin_fakeB,
     ref_fakeB);
  3. end-state SSIM-to-target (fake_B vs real_B) statistics agree within
     3x the twin band.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.utils.builders import build_gan
from ganslate_tpu.utils.metrics.val_test_metrics import ssim
from ganslate_tpu.utils.torch_import import import_torch_checkpoint

from .reference_torch import load_reference_gans
from .test_lockstep import (CH, _batches, _our_conf, _perturb,
                            _perturbed_twin, _ref_conf, _to_torch)

torch = pytest.importorskip("torch")

N_STEPS = 300
WINDOW = 50
LOSS_NAMES = ["G_AB", "G_BA", "cycle_A", "cycle_B", "D_A", "D_B"]


def _torch_fake_b(model, a_np):
    with torch.no_grad():
        out = model.networks["G_AB"](_to_torch(a_np))
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def _mean_pair_ssim(a_batch, b_batch):
    return float(np.mean([ssim(a, b, maxval=2.0)
                          for a, b in zip(a_batch, b_batch)]))


def test_cyclegan_trajectory_band(tmp_path):
    os.environ.pop("WORLD_SIZE", None)
    torch.manual_seed(0)
    opt = {"lambda_AB": 10.0, "lambda_BA": 10.0, "lambda_identity": 0.0,
           "proportion_ssim": 0.0}
    ref_cls = load_reference_gans()["CycleGAN"]
    ref_conf = _ref_conf(tmp_path, "x.CycleGAN", opt, {"B": CH, "A": CH})
    # The run must stay inside the LR schedule's horizon (the reference's
    # LambdaLR formula goes negative past n_iters + n_iters_decay; its
    # Trainer never reaches that region and neither may this loop), and the
    # torch models must STEP their schedulers each iteration like the
    # reference Trainer does — our decay advances inside the optax chain.
    ref_conf.train.n_iters = N_STEPS // 2
    ref_conf.train.n_iters_decay = N_STEPS - N_STEPS // 2
    ref = ref_cls(ref_conf)

    conf = _our_conf(tmp_path, "ganslate.nn.gans.unpaired.CycleGAN", opt,
                     {"B": CH})
    conf.train.n_iters = N_STEPS // 2
    conf.train.n_iters_decay = N_STEPS - N_STEPS // 2
    ours = build_gan(conf)
    batches = _batches(20, N_STEPS)
    ours.setup(example_batch=batches[0])

    # Identical starting weights via the torch-checkpoint importer.
    ref.save_checkpoint(0)
    ckpt = os.path.join(str(tmp_path), "checkpoints/0.pth")
    import_torch_checkpoint(ckpt, ours, example_batch=batches[0])
    twin = _perturbed_twin(ref_cls, ref_conf, ckpt)

    hist = {m: {n: [] for n in LOSS_NAMES} for m in ("ref", "twin", "ours")}
    for batch in batches:
        tbatch = {"A": _to_torch(batch["A"]), "B": _to_torch(batch["B"])}
        for name, model in (("ref", ref), ("twin", twin)):
            model.set_input(tbatch)
            model.optimize_parameters()
            model.update_learning_rate()   # the reference Trainer steps
            for n in LOSS_NAMES:           # schedulers every iteration
                hist[name][n].append(float(model.losses[n].detach()))
        _perturb(twin, twin._chaos_generator)

        ours.set_input(batch)
        ours.optimize_parameters()
        for n in LOSS_NAMES:
            hist["ours"][n].append(float(ours.losses[n]))

    # ---- 1. windowed-mean loss curves within the calibrated band.
    # The chaos scale is ONE number per trajectory (same reasoning as the
    # lockstep running-max floor, tests/test_lockstep.py:221-227: all losses
    # ride the same parameter divergence, and any single window's twin
    # deviation can sit near zero by luck), so the band is the max relative
    # twin deviation pooled over losses AND windows.
    rel = {}
    twin_band = 0.0
    for n in LOSS_NAMES:
        r = np.asarray(hist["ref"][n]).reshape(-1, WINDOW).mean(axis=1)
        t = np.asarray(hist["twin"][n]).reshape(-1, WINDOW).mean(axis=1)
        o = np.asarray(hist["ours"][n]).reshape(-1, WINDOW).mean(axis=1)
        scale = np.maximum(1.0, np.abs(r))
        twin_band = max(twin_band, float(np.max(np.abs(t - r) / scale)))
        rel[n] = (np.abs(o - r) / scale, r, t, o)
    margin = max(3.0 * twin_band, 0.06)
    print(f"twin band (pooled max rel windowed-mean dev): {twin_band:.4f}; "
          f"margin {margin:.4f}")
    for n, (dev, r, t, o) in rel.items():
        print(f"  {n}: ref {np.round(r, 3).tolist()} "
              f"twin {np.round(t, 3).tolist()} ours {np.round(o, 3).tolist()} "
              f"rel dev {np.round(dev, 4).tolist()}")
    for n, (dev, r, t, o) in rel.items():
        bad = dev > margin
        assert not bad.any(), (
            f"loss `{n}` windowed means left the band at windows "
            f"{np.nonzero(bad)[0].tolist()}: ours {o[bad]} vs ref {r[bad]} "
            f"(rel dev {dev[bad]}, margin {margin:.4f})")

    # ---- 2./3. end-state generator behavior on held-out probes.
    probes = _batches(99, 2)
    cross, cross_floor = [], []
    to_target = {"ref": [], "twin": [], "ours": []}
    for pb in probes:
        f_ref = _torch_fake_b(ref, pb["A"])
        f_twin = _torch_fake_b(twin, pb["A"])
        f_ours = np.asarray(ours.infer(jnp.asarray(pb["A"])))
        cross.append(_mean_pair_ssim(f_ref, f_ours))
        cross_floor.append(_mean_pair_ssim(f_ref, f_twin))
        to_target["ref"].append(_mean_pair_ssim(pb["B"], f_ref))
        to_target["twin"].append(_mean_pair_ssim(pb["B"], f_twin))
        to_target["ours"].append(_mean_pair_ssim(pb["B"], f_ours))

    s_ours, s_twin = np.mean(cross), np.mean(cross_floor)
    print(f"probe SSIM: ours-vs-ref {s_ours:.4f}, twin-vs-ref {s_twin:.4f}; "
          f"to-target ref {np.mean(to_target['ref']):.4f} "
          f"twin {np.mean(to_target['twin']):.4f} "
          f"ours {np.mean(to_target['ours']):.4f}")
    assert s_ours >= 1.0 - max(3.0 * (1.0 - s_twin), 0.05), (
        f"SSIM(ours_fakeB, ref_fakeB)={s_ours:.4f} below the band from "
        f"SSIM(twin_fakeB, ref_fakeB)={s_twin:.4f}")

    d_twin = abs(np.mean(to_target["twin"]) - np.mean(to_target["ref"]))
    d_ours = abs(np.mean(to_target["ours"]) - np.mean(to_target["ref"]))
    assert d_ours <= max(3.0 * d_twin, 0.05), (
        f"end-state SSIM-to-target drift {d_ours:.4f} exceeds the twin "
        f"band {d_twin:.4f} (ref {np.mean(to_target['ref']):.4f}, "
        f"ours {np.mean(to_target['ours']):.4f})")
