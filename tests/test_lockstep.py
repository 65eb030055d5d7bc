"""LOCKSTEP training-dynamics parity vs the in-process reference.

The strongest correctness claim the framework makes is that ONE fused jitted
train step reproduces ONE reference `optimize_parameters` call
(/root/reference/ganslate/nn/gans/unpaired/cyclegan.py:92-123,
/root/reference/ganslate/nn/gans/paired/pix2pix.py:76-103). This test proves
it end to end: the REAL reference CycleGAN / Pix2Pix classes (imported with
stubs, tests/reference_torch.py) and our models start from identical weights
(via the torch-checkpoint importer), see identical batches (pool_size=0,
no dropout, f32), and must produce matching per-loss values every iteration
and matching parameters after several Adam updates — which also pins the
optax-vs-torch Adam semantics (eps placement, bias correction) and the
update order (G first, then D on pre-update fakes).
"""

import os

import numpy as np
import pytest

import jax

from ganslate_tpu.configs.config import Config
from ganslate_tpu.configs.omega import Conf
from ganslate_tpu.configs.utils import init_config
from ganslate_tpu.utils.builders import build_gan
from ganslate_tpu.utils.torch_import import (convert_state_dict,
                                             flax_param_spec,
                                             import_torch_checkpoint)

from .reference_torch import RefConf, load_reference_gans

torch = pytest.importorskip("torch")

N_STEPS = 5
IMG = 32
BATCH = 2
CH = 3


def _to_torch(x):
    perm = (0, x.ndim - 1, *range(1, x.ndim - 1))
    return torch.tensor(np.transpose(x, perm))


_G_2D = {"_target_": "ganslate.nn.generators.Resnet2D",
         "n_residual_blocks": 1,
         "in_out_channels": {"AB": [CH, CH], "BA": [CH, CH]}}


def _batches(seed, n, spatial=(IMG, IMG), ch=CH):
    rng = np.random.default_rng(seed)
    return [{k: rng.uniform(-1, 1, (BATCH, *spatial, ch)).astype(np.float32)
             for k in ("A", "B")} for _ in range(n)]


def _ref_conf(tmp_path, gan_target, optimizer_extras, d_in_channels,
              generator=_G_2D, discriminator=None, gan_extras=None):
    """Config tree shaped exactly like the reference's resolved OmegaConf
    (only the keys its CycleGAN/Pix2Pix/RevGAN/CUT code paths read)."""
    conf = RefConf.create({
        "mode": "train",
        "train": {
            "output_dir": str(tmp_path),
            "cuda": False,
            "mixed_precision": False,
            "batch_size": BATCH,
            "n_iters": 100,
            "n_iters_decay": 100,
            "checkpointing": {"load_iter": 0},
            "metrics": {"discriminator_evolution": False, "ssim": False},
            "gan": {
                "_target_": gan_target,
                "norm_type": "instance",
                "weight_init_type": "normal",
                "weight_init_gain": 0.02,
                "pool_size": 0,
                "optimizer": {
                    "adversarial_loss_type": "lsgan",
                    "beta1": 0.5, "beta2": 0.999,
                    "lr_D": 2e-4, "lr_G": 2e-4,
                    **optimizer_extras,
                },
                "generator": generator,
                "discriminator": discriminator if discriminator is not None
                else {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "in_channels": d_in_channels,
                    "ndf": 16, "n_layers": 2, "kernel_size": [4, 4],
                },
            },
        },
    })
    if gan_extras:
        conf["train"]["gan"].update(RefConf.create(gan_extras))
    return conf


def _our_conf(tmp_path, gan_target, optimizer_extras, d_in_channels,
              generator=None, discriminator=None, gan_extras=None):
    raw = {
        "train": {
            "output_dir": str(tmp_path),
            "batch_size": BATCH,
            "cuda": False,
            "mixed_precision": False,
            "n_iters": 100,
            "n_iters_decay": 100,
            "logging": {"freq": 1000000},
            "checkpointing": {"freq": 1000000},
            "dataset": {
                "_target_": "ganslate.data.UnpairedImageDataset",
                "root": str(tmp_path),
                "num_workers": 0,
                "image_channels": CH,
                "preprocess": ["resize"],
                "load_size": [IMG, IMG],
                "final_size": [IMG, IMG],
            },
            "gan": {
                "_target_": gan_target,
                "pool_size": 0,
                "generator": generator if generator is not None else {
                    "_target_": "ganslate.nn.generators.Resnet2D",
                    "n_residual_blocks": 1,
                    "in_out_channels": {"AB": [CH, CH]},
                },
                "discriminator": discriminator if discriminator is not None
                else {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 16, "n_layers": 2,
                    "in_channels": d_in_channels,
                },
                "optimizer": {
                    "lr_D": 2e-4, "lr_G": 2e-4,
                    **optimizer_extras,
                },
            },
            "seed": 0,
        },
    }
    if gan_extras:
        raw["train"]["gan"].update(gan_extras)
    if "pix2pix" in gan_target or "CUT" in gan_target:
        raw["train"]["gan"].pop("pool_size")
    return init_config(Conf.create(raw), config_class=Config)


CHAOS_EPS = 1e-6


def _perturb(model, g, eps=CHAOS_EPS):
    with torch.no_grad():
        for name in sorted(model.networks):
            for p in model.networks[name].parameters():
                p.add_(torch.randn(p.shape, generator=g) * eps)


def _perturbed_twin(ref_cls, conf, ckpt, eps=CHAOS_EPS):
    """A second reference model from the SAME checkpoint with an eps
    perturbation — the CHAOS CONTROL. GAN training under Adam amplifies any
    difference exponentially (m/(sqrt(v)+eps) sign-flips near-zero gradient
    entries by +-lr, and the adversarial dynamics feed differences back), so
    torch-vs-torch with an fp32-accumulation-sized perturbation measures the
    drift an exact reimplementation accumulates. A reimplementation does not
    differ by ONE initial rounding: every step's forward/backward re-injects
    reassociated-reduction noise (~1e-6 relative over a few dozen fused
    ops — and on shared CI hardware the thread partitioning, hence the
    reduction order, shifts with machine load), so `_lockstep` re-perturbs
    the twin after every optimizer step with the same eps (see loop below).
    The lockstep assertions bound our drift by a small factor of this floor."""
    twin = ref_cls(conf)
    state = torch.load(ckpt, map_location="cpu", weights_only=True)
    g = torch.Generator().manual_seed(1234)
    with torch.no_grad():
        for name, net in twin.networks.items():
            net.load_state_dict(state[name])
    _perturb(twin, g, eps)
    twin._chaos_generator = g
    return twin


def _flat_param_diff(our_model, ref_model, batch_spec):
    """|ours - ref| over every parameter entry, via the import converter."""
    diffs = []
    for name, module in our_model.networks.items():
        dummy = our_model._dummy_input(
            name, {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                   for k, v in batch_spec.items()})
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.float32), dummy)
        spec = flax_param_spec(module, abstract)
        ref_params = convert_state_dict(ref_model.networks[name].state_dict(),
                                        spec)
        ours = jax.device_get(our_model.state.params[name])
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
        flat_our = dict(jax.tree_util.tree_leaves_with_path(ours))
        assert len(flat_ref) == len(flat_our)
        diffs.extend(np.abs(np.ravel(flat_our[path] - leaf))
                     for path, leaf in flat_ref)
    return np.concatenate(diffs)


def _torch_param_diff(a_model, b_model):
    return np.concatenate(
        [np.abs((pa - pb).detach().numpy().ravel())
         for name in a_model.networks
         for pa, pb in zip(a_model.networks[name].parameters(),
                           b_model.networks[name].parameters())])


def _lockstep(tmp_path, ref_cls, ref_model, twin_conf, our_model, batches,
              loss_names):
    """Iteration 0 is deterministic forward+loss math: compared TIGHT
    (rtol 2e-4) — it fails on any wrong loss weighting, norm semantics, or
    data handling. Later iterations and final parameters are compared
    against the chaos-control floor (see `_perturbed_twin`) — they fail on
    anything systematic: wrong update order, wrong Adam bias
    correction/eps, wrong LR schedule.

    The loss floor is the RUNNING MAX over iterations and losses of the
    twin's relative diff: all losses ride the same parameter divergence, so
    the chaos scale is one number per trajectory — a single per-loss,
    per-iteration sample is noise (it can sit near zero by luck while the
    coupled system has already diverged to 1e-3, measured: our param drift
    tracks the twin's at every iteration while individual twin loss diffs
    bounce over three decades)."""
    # ---- identical starting weights: reference checkpoint -> importer.
    ref_model.save_checkpoint(0)
    ckpt = os.path.join(str(tmp_path), "checkpoints/0.pth")
    import_torch_checkpoint(ckpt, our_model, example_batch=batches[0])
    twin = _perturbed_twin(ref_cls, twin_conf, ckpt)

    floor_rel = 0.0
    for i, batch in enumerate(batches):
        tbatch = {"A": _to_torch(batch["A"]), "B": _to_torch(batch["B"])}
        ref_model.set_input(tbatch)
        ref_model.optimize_parameters()
        ref_losses = {k: float(v.detach()) for k, v in ref_model.losses.items()
                      if v is not None}

        twin.set_input(tbatch)
        twin.optimize_parameters()
        twin_losses = {k: float(v.detach()) for k, v in twin.losses.items()
                       if v is not None}
        # Per-step rounding-noise injection (see `_perturbed_twin`).
        _perturb(twin, twin._chaos_generator)

        our_model.set_input(batch)
        our_model.optimize_parameters()
        our_losses = {k: float(v) for k, v in our_model.losses.items()}

        for name in loss_names:
            assert name in ref_losses and name in our_losses, \
                (name, sorted(ref_losses), sorted(our_losses))
            floor_rel = max(floor_rel,
                            abs(twin_losses[name] - ref_losses[name])
                            / max(1.0, abs(ref_losses[name])))
        for name in loss_names:
            tol = max(2e-4, 30.0 * floor_rel) * max(1.0, abs(ref_losses[name]))
            assert abs(our_losses[name] - ref_losses[name]) <= tol, \
                f"loss `{name}` diverged at lockstep iteration {i}: " \
                f"ours {our_losses[name]:.6f} vs ref {ref_losses[name]:.6f} " \
                f"(chaos floor {floor_rel:.2e} rel, tol {tol:.2e})"

    # ---- parameters after N Adam updates: bounded by the chaos floor.
    diffs = _flat_param_diff(our_model, ref_model, batches[0])
    floor = _torch_param_diff(twin, ref_model)
    for q in (0.5, 0.99):
        ours_q, floor_q = np.quantile(diffs, q), np.quantile(floor, q)
        assert ours_q <= max(10.0 * floor_q, 1e-7), \
            f"p{int(q*100)} param drift {ours_q:.2e} exceeds 10x the " \
            f"torch-vs-perturbed-torch chaos floor {floor_q:.2e} " \
            f"after {N_STEPS} steps — systematic optimizer mismatch"
    assert diffs.max() <= max(10.0 * floor.max(), 1e-6), \
        f"max param drift {diffs.max():.2e} vs chaos floor {floor.max():.2e}"


def test_cyclegan_lockstep_long_horizon(tmp_path):
    """50 Adam steps of lockstep (vs the 5 the per-family tests run).

    What horizon adds: the chaos floor grows exponentially with steps, so a
    SMALL systematic error — an LR schedule off by one, a bias-correction
    power drifting from torch's, pool bookkeeping skew — that hides inside
    the 5-step tolerance compounds FASTER than the floor and trips the
    bounded-multiple assertions here. The tolerance construction is
    unchanged (running-max chaos floor, x30 losses / x10 params): the test
    passing at 50 steps means our drift GROWS AT THE SAME RATE as the
    torch-vs-perturbed-torch control, not merely that it is small."""
    os.environ.pop("WORLD_SIZE", None)
    torch.manual_seed(0)
    opt = {"lambda_AB": 10.0, "lambda_BA": 10.0, "lambda_identity": 0.0,
           "proportion_ssim": 0.0}
    ref_cls = load_reference_gans()["CycleGAN"]
    ref_conf = _ref_conf(tmp_path, "x.CycleGAN", opt, {"B": CH, "A": CH})
    ref = ref_cls(ref_conf)

    conf = _our_conf(tmp_path, "ganslate.nn.gans.unpaired.CycleGAN", opt, {"B": CH})
    ours = build_gan(conf)
    batches = _batches(10, 50)
    ours.setup(example_batch=batches[0])

    _lockstep(tmp_path, ref_cls, ref, ref_conf, ours, batches,
              loss_names=["G_AB", "G_BA", "cycle_A", "cycle_B", "D_A", "D_B"])


@pytest.mark.parametrize("proportion_ssim", [0.0, 0.84],
                         ids=["l1_cycle", "ssim_cycle"])
def test_cyclegan_lockstep(tmp_path, proportion_ssim):
    os.environ.pop("WORLD_SIZE", None)
    # The reference model's INIT consumes torch's global RNG; pin it so
    # the trained trajectory (and hence the chaos-tolerance check) does
    # not depend on which tests ran earlier in the process.
    torch.manual_seed(0)
    opt = {"lambda_AB": 10.0, "lambda_BA": 10.0, "lambda_identity": 0.0,
           "proportion_ssim": proportion_ssim}
    ref_cls = load_reference_gans()["CycleGAN"]
    ref_conf = _ref_conf(tmp_path, "x.CycleGAN", opt, {"B": CH, "A": CH})
    ref = ref_cls(ref_conf)

    conf = _our_conf(tmp_path, "ganslate.nn.gans.unpaired.CycleGAN", opt, {"B": CH})
    ours = build_gan(conf)
    batches = _batches(0, N_STEPS)
    ours.setup(example_batch=batches[0])

    _lockstep(tmp_path, ref_cls, ref, ref_conf, ours, batches,
              loss_names=["G_AB", "G_BA", "cycle_A", "cycle_B", "D_A", "D_B"])


def test_cyclegan_lockstep_identity(tmp_path):
    """λ_idt > 0 exercises the identity forwards + the reference's double
    λ weighting quirk (cyclegan_losses.py:49-51 applies λ_AB·λ_idt)."""
    os.environ.pop("WORLD_SIZE", None)
    # The reference model's INIT consumes torch's global RNG; pin it so
    # the trained trajectory (and hence the chaos-tolerance check) does
    # not depend on which tests ran earlier in the process.
    torch.manual_seed(0)
    opt = {"lambda_AB": 10.0, "lambda_BA": 10.0, "lambda_identity": 0.5,
           "proportion_ssim": 0.0}
    ref_cls = load_reference_gans()["CycleGAN"]
    ref_conf = _ref_conf(tmp_path, "x.CycleGAN", opt, {"B": CH, "A": CH})
    ref = ref_cls(ref_conf)

    conf = _our_conf(tmp_path, "ganslate.nn.gans.unpaired.CycleGAN", opt, {"B": CH})
    ours = build_gan(conf)
    batches = _batches(1, N_STEPS)
    ours.setup(example_batch=batches[0])

    _lockstep(tmp_path, ref_cls, ref, ref_conf, ours, batches,
              loss_names=["G_AB", "G_BA", "cycle_A", "cycle_B",
                          "idt_A", "idt_B", "D_A", "D_B"])


def _run_pix2pix_lockstep(tmp_path, batches_seed, n_steps):
    os.environ.pop("WORLD_SIZE", None)
    # The reference model's INIT consumes torch's global RNG; pin it so
    # the trained trajectory (and hence the chaos-tolerance check) does
    # not depend on which tests ran earlier in the process.
    torch.manual_seed(0)
    opt = {"lambda_pix2pix": 100.0}
    ref_cls = load_reference_gans()["Pix2Pix"]
    # Conditional D sees cat([real_A, x]): in_channels = ch_A + ch_B.
    ref_conf = _ref_conf(tmp_path, "x.Pix2Pix", opt, {"B": 2 * CH})
    ref = ref_cls(ref_conf)

    conf = _our_conf(tmp_path, "ganslate.nn.gans.paired.Pix2PixConditionalGAN",
                     opt, {"B": 2 * CH})
    ours = build_gan(conf)
    batches = _batches(batches_seed, n_steps)
    ours.setup(example_batch=batches[0])

    _lockstep(tmp_path, ref_cls, ref, ref_conf, ours, batches,
              loss_names=["G", "pix2pix", "D"])


def test_pix2pix_lockstep(tmp_path):
    _run_pix2pix_lockstep(tmp_path, batches_seed=2, n_steps=N_STEPS)


def test_pix2pix_lockstep_long_horizon(tmp_path):
    """50 Adam steps — same construction and rationale as
    `test_cyclegan_lockstep_long_horizon` (running-max chaos floor, x30
    losses / x10 params): a systematic error compounds faster than the
    torch-vs-perturbed-torch control and trips the bounded-multiple
    assertions where the 5-step test cannot see it. Match:
    /root/reference/ganslate/nn/gans/paired/pix2pix.py:76-143."""
    _run_pix2pix_lockstep(tmp_path, batches_seed=12, n_steps=50)


def _fixed_revgan_backward_G(self):
    """The reference RevGAN's backward_G with ONLY its fake_A/fake_B swap
    corrected: as shipped it feeds D_B(fake_A) / D_A(fake_B)
    (/root/reference/ganslate/nn/gans/unpaired/revgan.py:196-199), which
    contradicts its own comments, its own backward_D pairing
    (revgan.py:163-172: D_B trains on real_B vs fake_B), and the reference
    CycleGAN. Our implementation uses the domain-consistent pairing
    (documented deviation, ganslate_tpu/nn/gans/unpaired/revgan.py), so the
    lockstep reference is the reference code with the intended pairing —
    everything else (update order, pools, Adam, invertible-core math,
    retain_graph D step) is the as-shipped reference path."""
    pred_B = self.networks["D_B"](self.visuals["fake_B"])
    pred_A = self.networks["D_A"](self.visuals["fake_A"])
    self.losses["G_AB"] = self.criterion_adv(pred_B, target_is_real=True)
    self.losses["G_BA"] = self.criterion_adv(pred_A, target_is_real=True)
    losses_G = self.criterion_G(self.visuals)
    self.losses.update(losses_G)
    combined = sum(losses_G.values()) + self.losses["G_AB"] + self.losses["G_BA"]
    self.backward(loss=combined, optimizer=self.optimizers["G"], loss_id=2)


def _run_revgan_lockstep(tmp_path, monkeypatch, batches_seed, n_steps):
    os.environ.pop("WORLD_SIZE", None)
    # The reference model's INIT consumes torch's global RNG; pin it so
    # the trained trajectory (and hence the chaos-tolerance check) does
    # not depend on which tests ran earlier in the process.
    torch.manual_seed(0)
    opt = {"lambda_AB": 10.0, "lambda_BA": 10.0, "lambda_identity": 0.0,
           "proportion_ssim": 0.0}
    g3d = {"_target_": "ganslate.nn.generators.Piresnet3D",
           "depth": 2, "first_layer_channels": 8,
           "use_memory_saving": True, "use_inverse": True,
           "in_out_channels": {"AB": [1, 1], "BA": [1, 1]}}
    d3d = {"_target_": "ganslate.nn.discriminators.PatchGAN3D",
           "ndf": 8, "n_layers": 1, "kernel_size": [4, 4, 4],
           "in_channels": {"B": 1, "A": 1}}

    ref_cls = load_reference_gans()["RevGAN"]
    monkeypatch.setattr(ref_cls, "backward_G", _fixed_revgan_backward_G)
    ref_conf = _ref_conf(tmp_path, "x.RevGAN", opt, None,
                         generator=g3d, discriminator=d3d)
    ref = ref_cls(ref_conf)

    conf = _our_conf(tmp_path, "ganslate.nn.gans.unpaired.RevGAN", opt,
                     {"B": 1}, generator={**g3d,
                                          "in_out_channels": {"AB": [1, 1]}},
                     discriminator={"_target_": d3d["_target_"],
                                    "ndf": 8, "n_layers": 1,
                                    "in_channels": {"B": 1}})
    ours = build_gan(conf)
    batches = _batches(batches_seed, n_steps, spatial=(12, 12, 12), ch=1)
    ours.setup(example_batch=batches[0])

    _lockstep(tmp_path, ref_cls, ref, ref_conf, ours, batches,
              loss_names=["G_AB", "G_BA", "cycle_A", "cycle_B", "D_A", "D_B"])


def test_revgan_lockstep(tmp_path, monkeypatch):
    """RevGAN: ONE partially-invertible G (forward=AB, inverse=BA) with
    memory-constant couplings, separate D_A/D_B, D step on pooled fakes with
    retain_graph. Lockstep pins the recompute-by-inverse custom VJP's
    gradients against torch autograd through the coupling stubs, plus the
    shared-G update dynamics."""
    _run_revgan_lockstep(tmp_path, monkeypatch, batches_seed=3,
                         n_steps=N_STEPS)


def test_revgan_lockstep_long_horizon(tmp_path, monkeypatch):
    """50 Adam steps — same construction and rationale as
    `test_cyclegan_lockstep_long_horizon`. Especially valuable here: the
    recompute-by-inverse VJP re-derives activations from the coupling
    inverses, so any slow numerical skew in the inverse path would compound
    over the shared-G update dynamics and outrun the chaos floor. Match:
    /root/reference/ganslate/nn/gans/unpaired/revgan.py:123-199."""
    _run_revgan_lockstep(tmp_path, monkeypatch, batches_seed=13, n_steps=50)


def test_cut_unpinned_distributional(tmp_path):
    """CUT with the patch-selection RNG LIVE on both sides (the lockstep
    test above pins `randperm`→`arange`, so the real random-patch dynamics
    are never compared there). Pointwise comparison is impossible with
    unpinned RNG, so this asserts DISTRIBUTIONAL equivalence: K init-matched
    runs per side (reference init imported into ours, identical batch
    sequence, only the permutation draws differ), and for every loss the
    tail-mean trajectory statistic of ours must land inside the reference
    runs' spread (widened interval overlap). Catches systematic shifts in
    the NCE patch machinery — wrong temperature, wrong patch count, biased
    selection — that arange-pinning structurally cannot see.
    Reference RNG path: /root/reference/ganslate/nn/gans/unpaired/cut.py:259-272."""
    os.environ.pop("WORLD_SIZE", None)

    K, N, TAIL = 3, 24, 12
    opt = {"lambda_adv": 1.0, "lambda_nce": 1.0, "lambda_nce_idt": 0.5,
           "nce_T": 0.07}
    extras = {"nce_layers": [0, 4, 8, 10], "mlp_nc": 16, "num_patches": 16,
              "use_equivariance_flip": False}
    g2d = {"_target_": "ganslate.nn.generators.Resnet2D",
           "n_residual_blocks": 1,
           "in_out_channels": {"AB": [1, 1], "BA": [1, 1]},
           "in_channels": 1}
    d2d = {"_target_": "ganslate.nn.discriminators.PatchGAN2D",
           "ndf": 8, "n_layers": 1, "kernel_size": [4, 4],
           "in_channels": {"B": 1}}
    loss_names = ["D", "G", "NCE", "NCE_idt"]
    batches = _batches(20, N, ch=1)  # one sequence shared by every run

    ref_cls = load_reference_gans()["CUT"]
    ref_tail, our_tail = {n: [] for n in loss_names}, {n: [] for n in loss_names}
    for k in range(K):
        run_dir = tmp_path / f"run{k}"
        run_dir.mkdir()
        torch.manual_seed(k)  # distinct init AND distinct randperm stream
        ref_conf = _ref_conf(run_dir, "x.CUT", opt, None, generator=g2d,
                             discriminator=d2d, gan_extras=extras)
        ref = ref_cls(ref_conf)
        ref.save_checkpoint(0)

        conf = _our_conf(run_dir, "ganslate.nn.gans.unpaired.CUT", opt,
                         {"B": 1},
                         generator={"_target_": g2d["_target_"],
                                    "n_residual_blocks": 1,
                                    "in_out_channels": {"AB": [1, 1]}},
                         discriminator={"_target_": d2d["_target_"],
                                        "ndf": 8, "n_layers": 1,
                                        "in_channels": {"B": 1}},
                         gan_extras=extras)
        conf.train.seed = 100 + k  # distinct jax permutation stream
        ours = build_gan(conf)
        ours.setup(example_batch=batches[0])
        import_torch_checkpoint(
            os.path.join(str(run_dir), "checkpoints/0.pth"), ours,
            example_batch=batches[0])

        traj_r = {n: [] for n in loss_names}
        traj_o = {n: [] for n in loss_names}
        for batch in batches:
            ref.set_input({"A": _to_torch(batch["A"]),
                           "B": _to_torch(batch["B"])})
            ref.optimize_parameters()
            ours.set_input(batch)
            ours.optimize_parameters()
            for n in loss_names:
                traj_r[n].append(float(ref.losses[n].detach()))
                traj_o[n].append(float(ours.losses[n]))
        for n in loss_names:
            ref_tail[n].append(float(np.mean(traj_r[n][-TAIL:])))
            our_tail[n].append(float(np.mean(traj_o[n][-TAIL:])))

    for n in loss_names:
        r, o = np.asarray(ref_tail[n]), np.asarray(our_tail[n])
        # Widen each side's [min,max] by half its own spread (K=3 ranges
        # undercover the true spread) plus a small absolute slack, then
        # require the intervals to OVERLAP: a systematic shift larger than
        # the RNG-induced run-to-run spread fails.
        pad_r = 0.5 * (r.max() - r.min()) + 0.05 * max(1.0, abs(r.mean()))
        pad_o = 0.5 * (o.max() - o.min()) + 0.05 * max(1.0, abs(o.mean()))
        lo = max(r.min() - pad_r, o.min() - pad_o)
        hi = min(r.max() + pad_r, o.max() + pad_o)
        assert lo <= hi, \
            f"loss `{n}` tail-means are distributionally disjoint: " \
            f"ref {r} vs ours {o} — systematic NCE/patch-RNG mismatch"


def _run_cut_lockstep(tmp_path, monkeypatch, batches_seed, n_steps):
    import jax.numpy as jnp

    os.environ.pop("WORLD_SIZE", None)
    torch.manual_seed(0)
    monkeypatch.setattr(torch, "randperm",
                        lambda n, device=None: torch.arange(n, device=device))
    monkeypatch.setattr(jax.random, "permutation",
                        lambda key, n, **kw: jnp.arange(n))

    opt = {"lambda_adv": 1.0, "lambda_nce": 1.0, "lambda_nce_idt": 0.5,
           "nce_T": 0.07}
    extras = {"nce_layers": [0, 4, 8, 10], "mlp_nc": 16, "num_patches": 16,
              "use_equivariance_flip": False}
    # NOTE: the reference Resnet2D has no width knob (fixed 64 filters).
    g2d = {"_target_": "ganslate.nn.generators.Resnet2D",
           "n_residual_blocks": 1,
           "in_out_channels": {"AB": [1, 1], "BA": [1, 1]},
           # read by the reference's channel probe (cut.py:82-83)
           "in_channels": 1}
    d2d = {"_target_": "ganslate.nn.discriminators.PatchGAN2D",
           "ndf": 8, "n_layers": 1, "kernel_size": [4, 4],
           "in_channels": {"B": 1}}

    ref_cls = load_reference_gans()["CUT"]
    ref_conf = _ref_conf(tmp_path, "x.CUT", opt, None, generator=g2d,
                         discriminator=d2d, gan_extras=extras)
    ref = ref_cls(ref_conf)

    conf = _our_conf(tmp_path, "ganslate.nn.gans.unpaired.CUT", opt, {"B": 1},
                     generator={"_target_": g2d["_target_"],
                                "n_residual_blocks": 1,
                                "in_out_channels": {"AB": [1, 1]}},
                     discriminator={"_target_": d2d["_target_"],
                                    "ndf": 8, "n_layers": 1,
                                    "in_channels": {"B": 1}},
                     gan_extras=extras)
    ours = build_gan(conf)
    batches = _batches(batches_seed, n_steps, ch=1)
    ours.setup(example_batch=batches[0])

    _lockstep(tmp_path, ref_cls, ref, ref_conf, ours, batches,
              loss_names=["D", "G", "NCE", "NCE_idt"])


def test_cut_lockstep(tmp_path, monkeypatch):
    """CUT: D updates FIRST, then a joint G+mlp update against the updated D
    (reference cut.py:113-128); NCE over per-level projected patches with the
    reference's weighting quirks (NCE logged unweighted, the combined loss
    uses (1-λ)·NCE + λ·NCE_idt). The only cross-framework RNG is the
    per-level patch selection — pinned IDENTICALLY on both sides by turning
    the permutation into arange (torch.randperm / jax.random.permutation), so
    both select the first num_patches positions and the remaining math must
    lockstep. The reference reads `gan.generator.in_channels`, a key its own
    schema does not define (cut.py:82-83 — latent bug); supplied explicitly."""
    _run_cut_lockstep(tmp_path, monkeypatch, batches_seed=4, n_steps=N_STEPS)


def test_cut_lockstep_long_horizon(tmp_path, monkeypatch):
    """50 Adam steps of arange-pinned CUT — same construction and rationale
    as `test_cyclegan_lockstep_long_horizon`; catches slow-compounding skew
    in the three-optimizer (G, D, mlp) update order, the NCE weighting, and
    the shared patch-index plumbing that the 5-step tolerance hides. The
    unpinned random-patch dynamics are covered distributionally by
    `test_cut_unpinned_distributional`. Match:
    /root/reference/ganslate/nn/gans/unpaired/cut.py:104-226."""
    _run_cut_lockstep(tmp_path, monkeypatch, batches_seed=14, n_steps=50)
