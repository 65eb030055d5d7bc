"""CycleGAN train-step tests on the virtual 8-device mesh: the step compiles,
runs, updates all four networks, decreases nothing to NaN, pools mutate, and
inference produces images. This exercises the REAL data-parallel path (batch
sharded over 8 devices, grads psum'd by XLA)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganslate_tpu.parallel import get_mesh, shard_batch
from ganslate_tpu.utils.builders import build_gan

from .helpers import tiny_cyclegan_conf


@pytest.fixture(scope="module")
def model_and_batch(tmp_path_factory):
    conf = tiny_cyclegan_conf(tmp_path_factory.mktemp("cyclegan"))
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
        "B": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
    }
    model = build_gan(conf)
    model.setup(example_batch=batch)
    return model, batch


def test_mesh_has_8_devices():
    assert get_mesh().devices.size == 8


def test_setup_builds_networks_and_state(model_and_batch):
    model, _ = model_and_batch
    assert set(model.networks) == {"G_AB", "G_BA", "D_B", "D_A"}
    assert set(model.state.params) == {"G_AB", "G_BA", "D_B", "D_A"}
    assert set(model.state.opt_state) == {"G", "D"}
    assert int(model.state.pools["fake_B"].count) == 0


def test_train_step_runs_and_updates(model_and_batch):
    model, batch = model_and_batch
    params_before = jax.device_get(model.state.params)

    model.set_input(batch)
    model.optimize_parameters()

    # All loss names present and finite.
    expected_losses = {"G_AB", "G_BA", "cycle_A", "cycle_B", "D_B", "D_A"}
    assert expected_losses.issubset(model.losses.keys())
    for name, value in model.losses.items():
        assert np.isfinite(float(value)), f"loss {name} not finite"

    # Metrics (D evolution + cycle ssim) computed.
    assert {"ssim_A", "ssim_B", "D_B_real", "D_B_fake"}.issubset(model.metrics)

    # Visuals have the right shapes.
    for k in ("real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B"):
        assert model.visuals[k].shape == (8, 32, 32, 1)

    # Every network's params changed.
    params_after = jax.device_get(model.state.params)
    for net in ("G_AB", "G_BA", "D_B", "D_A"):
        changed = any(
            not np.allclose(a, b) for a, b in zip(
                jax.tree_util.tree_leaves(params_before[net]),
                jax.tree_util.tree_leaves(params_after[net])))
        assert changed, f"{net} params did not update"

    # Pools absorbed fakes.
    assert int(model.state.pools["fake_B"].count) > 0
    # Step advanced.
    assert int(model.state.step) == 1


def test_multiple_steps_stable(model_and_batch):
    model, batch = model_and_batch
    for _ in range(3):
        model.set_input(batch)
        model.optimize_parameters()
    for name, value in model.losses.items():
        assert np.isfinite(float(value))
    lrs = model.get_learning_rates()
    assert "lr_G" in lrs and lrs["lr_G"] > 0


def test_infer_both_directions(model_and_batch):
    model, batch = model_and_batch
    x = shard_batch({"A": batch["A"]})["A"]
    out_ab = model.infer(x, direction="AB")
    out_ba = model.infer(x, direction="BA")
    assert out_ab.shape == x.shape and out_ba.shape == x.shape
    assert np.all(np.abs(np.asarray(out_ab)) <= 1.0)
    with pytest.raises(AssertionError):
        model.infer(x, direction="XX")


def test_checkpoint_roundtrip(model_and_batch, tmp_path):
    model, batch = model_and_batch
    model.output_dir = str(tmp_path)
    step = int(model.state.step)
    model.save_checkpoint(step)

    params_saved = jax.device_get(model.state.params)
    # Perturb, then restore.
    model.state = model.state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, model.state.params))
    model.load_networks(step)
    params_restored = jax.device_get(model.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(params_saved),
                    jax.tree_util.tree_leaves(params_restored)):
        np.testing.assert_allclose(a, b)


def test_fused_d_forward_is_exact(tmp_path):
    """apply_batched (one batched D forward over [real, fake]) computes the
    SAME function as per-call D forwards: instance norm and convs are
    per-sample, so concatenating the batch changes nothing but the dispatch
    (nn/gans/base.py:apply_batched). Bit-equality is NOT expected — XLA
    tiles the 2B-batch conv with a different reduction order than the
    B-batch one — so assert (a) the raw predictions match at tight fp32
    tolerance, and (b) a training step's losses agree. (Comparing params
    after several Adam steps would be chaotic: Adam normalizes tiny
    gradients, amplifying 1e-7 forward noise to lr-scale differences.)"""
    from ganslate_tpu.nn.gans import base as gan_base

    conf = tiny_cyclegan_conf(tmp_path)
    rng = np.random.default_rng(3)
    batch = {
        "A": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
        "B": rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32),
    }
    model = build_gan(conf)
    model.setup(example_batch=batch)

    # (a) Functional equality of the batched dispatch itself.
    params_D = jax.device_get(model.state.params["D_B"])
    xs = [jnp.asarray(batch["A"]), jnp.asarray(batch["B"])]
    fused = model.apply_batched("D_B", params_D, xs)
    per_call = [model.apply("D_B", params_D, x) for x in xs]
    assert len(fused) == 2 and fused[0].shape == per_call[0].shape
    for f, u in zip(fused, per_call):
        np.testing.assert_allclose(np.asarray(f), np.asarray(u),
                                   rtol=1e-5, atol=1e-6)

    # (b) One train step's losses agree between the two dispatch modes.
    def losses_after_step(fuse_flag):
        from ganslate_tpu import flags
        with flags.override(fused_d_forward=fuse_flag):
            conf2 = tiny_cyclegan_conf(tmp_path / f"fused_{fuse_flag}")
            m = build_gan(conf2)
            m.setup(example_batch=batch)
            m.set_input(batch)
            m.optimize_parameters()
            return {k: float(jax.device_get(v)) for k, v in m.losses.items()}

    losses_f = losses_after_step(True)
    losses_u = losses_after_step(False)
    assert losses_f.keys() == losses_u.keys()
    for k in losses_f:
        np.testing.assert_allclose(losses_f[k], losses_u[k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
