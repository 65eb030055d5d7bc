"""Multi-step dispatch (train.steps_per_dispatch) and inert-bias tests.

- make_multi_step(k) must produce the SAME trajectory as k sequential
  single-step dispatches (it is the same step fn scanned over a batch
  stack — only the dispatch granularity changes).
- flags.bias_inert must be output-exact: a per-channel constant before an
  affine-less instance norm cancels, so skipping the add changes nothing
  (f32; reference keeps the add, /root/reference/ganslate/nn/utils.py:71-80).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _conf(batch_size=2, image_size=32, steps_per_dispatch=1):
    from ganslate_tpu.utils.testing import make_cyclegan_conf
    conf = make_cyclegan_conf(batch_size=batch_size, image_size=image_size,
                              n_residual_blocks=1, ngf=8, ndf=8,
                              pool_size=4, mixed_precision=False, seed=3)
    conf.train.steps_per_dispatch = steps_per_dispatch
    return conf


def _batches(n, batch_size=2, image_size=32):
    rng = np.random.default_rng(7)
    return [{k: rng.uniform(-1, 1, (batch_size, image_size, image_size, 3))
             .astype(np.float32) for k in ("A", "B")} for _ in range(n)]


def _run(steps_per_dispatch, batches):
    from ganslate_tpu.utils.builders import build_gan
    model = build_gan(_conf(steps_per_dispatch=steps_per_dispatch))
    model.setup(example_batch=batches[0])
    k = steps_per_dispatch
    loss_hist = []
    for i in range(0, len(batches), k):
        chunk = batches[i:i + k]
        if k > 1:
            model.set_input_multi(chunk)
        else:
            model.set_input(chunk[0])
        model.optimize_parameters()
        loss_hist.append({n: float(jax.device_get(v))
                          for n, v in model.losses.items()})
    params = jax.device_get(model.state.params)
    return params, loss_hist


def test_multi_step_matches_sequential():
    batches = _batches(4)
    p1, h1 = _run(1, batches)
    p2, h2 = _run(2, batches)

    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    assert flat2, "no params"
    for path, v1 in flat1:
        # lax.scan body vs unrolled steps fuse differently, so f32 rounding
        # differs at ~1e-6 per step on ~1e-2-scale weights; tolerances catch
        # real divergence (wrong rng threading, wrong pool state) while
        # admitting fusion-order noise.
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(flat2[path]), rtol=5e-3, atol=3e-5,
            err_msg=f"param diverged at {jax.tree_util.keystr(path)}")
    # Multi-step logs are the CHUNK MEAN: the k=2 run's final chunk must
    # equal the mean of sequential steps 3 and 4.
    for name in h1[0]:
        expect = (h1[2][name] + h1[3][name]) / 2
        assert abs(expect - h2[-1][name]) < 1e-3, \
            (name, expect, h2[-1][name])


def test_chunk_gate_warnings():
    """val.freq (and the other chunk-gated frequencies) must warn when not a
    multiple of steps_per_dispatch — a user with val.freq=25, k=8 silently
    loses validation otherwise."""
    from ganslate_tpu.configs.omega import Conf
    from ganslate_tpu.engines.trainer import chunk_gate_warnings

    conf = Conf.create({
        "train": {"logging": {"freq": 8}, "checkpointing": {"freq": 16}},
        "val": {"freq": 25},
    })
    msgs = chunk_gate_warnings(conf, 8)
    assert len(msgs) == 1 and "val.freq=25" in msgs[0], msgs

    conf_no_val = Conf.create({
        "train": {"logging": {"freq": 5}, "checkpointing": {"freq": 6}}})
    msgs = chunk_gate_warnings(conf_no_val, 4)
    assert len(msgs) == 2, msgs
    assert all("steps_per_dispatch=4" in m for m in msgs)


def test_multi_step_tail_chunk():
    """A tail chunk shorter than k (even length 1) must still step."""
    batches = _batches(3)
    from ganslate_tpu.utils.builders import build_gan
    model = build_gan(_conf(steps_per_dispatch=2))
    model.setup(example_batch=batches[0])
    model.set_input_multi(batches[:2])
    model.optimize_parameters()
    model.set_input_multi(batches[2:])   # length-1 stack
    model.optimize_parameters()
    step = int(jax.device_get(model.state.step))
    assert step == 3, step


@pytest.mark.parametrize("n,s,p,op,k,xsz", [(2, 2, 1, 1, 3, 8),
                                            (2, 2, 0, 0, 2, 6),
                                            (2, 3, 1, 2, 5, 4),
                                            (3, 2, 1, 1, 3, 5),
                                            (1, 2, 2, 1, 4, 7)])
def test_convtranspose_grads_exact(n, s, p, op, k, xsz):
    """ops/transpose_grad.py reverse-free gradients == jax.vjp of the raw
    lhs-dilated conv, bit-exact in f32 (same contractions, reordered)."""
    from ganslate_tpu.ops import transpose_grad as tg

    rng = np.random.default_rng(0)
    c, o = 5, 7
    s_, p_, op_, k_ = (s,) * n, (p,) * n, (op,) * n, (k,) * n
    x = jnp.asarray(rng.normal(size=(2, *([xsz] * n), c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(*k_, c, o)).astype(np.float32))
    pads = tuple((k - 1 - p, k - 1 - p + op) for _ in range(n))

    y0, vjp0 = jax.vjp(lambda a, b: tg._raw(a, b, s_, pads), x, kern)
    g = jnp.asarray(rng.normal(size=y0.shape).astype(np.float32))
    dx0, dk0 = vjp0(g)
    y1, vjp1 = jax.vjp(
        lambda a, b: tg.dilated_conv_transpose(a, b, s_, pads), x, kern)
    dx1, dk1 = vjp1(g)

    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=0)
    np.testing.assert_allclose(np.asarray(dx0), np.asarray(dx1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk0), np.asarray(dk1),
                               rtol=1e-5, atol=1e-4)


def test_trainer_chunked_dispatch(tmp_path):
    """Trainer._run_chunked end-to-end: steps_per_dispatch=2 over 4 iters
    through the REAL Trainer (loader batching, chunk-boundary logging,
    checkpointing) must reach iteration 4 and write the checkpoint."""
    from PIL import Image

    from ganslate_tpu.configs.config import Config
    from ganslate_tpu.configs.omega import Conf
    from ganslate_tpu.configs.utils import init_config
    from ganslate_tpu.engines.trainer import Trainer

    data = tmp_path / "data"
    rng = np.random.default_rng(42)
    for domain in ("A", "B"):
        d = data / domain
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)).save(d / f"{i}.png")
    dataset = {
        "_target_": "ganslate.data.UnpairedImageDataset",
        "root": str(data), "num_workers": 2, "image_channels": 3,
        "preprocess": ["resize"], "load_size": [32, 32],
        "final_size": [32, 32],
    }
    conf = init_config(Conf.create({
        "train": {
            "output_dir": str(tmp_path / "out"),
            "batch_size": 4, "cuda": False,
            "n_iters": 2, "n_iters_decay": 2,
            "steps_per_dispatch": 2,
            "logging": {"freq": 2},
            "checkpointing": {"freq": 4},
            "dataset": dict(dataset),
            "gan": {
                "_target_": "ganslate.nn.gans.unpaired.CycleGAN",
                "pool_size": 4,
                "generator": {"_target_": "ganslate.nn.generators.Resnet2D",
                              "n_residual_blocks": 1, "ngf": 8,
                              "in_out_channels": {"AB": [3, 3]}},
                "discriminator": {
                    "_target_": "ganslate.nn.discriminators.PatchGAN2D",
                    "ndf": 8, "n_layers": 1, "in_channels": {"B": 3}},
                "optimizer": {"lambda_AB": 10.0, "lambda_BA": 10.0,
                              "lambda_identity": 0, "proportion_ssim": 0},
            },
            "seed": 0,
        },
    }), config_class=Config)

    trainer = Trainer(conf)
    trainer.run()

    assert int(jax.device_get(trainer.model.state.step)) == 4
    assert (tmp_path / "out" / "checkpoints" / "4").exists()
    images = list((tmp_path / "out" / "train" / "images").glob("*.png"))
    assert images, "no chunk-boundary visuals were saved"


@pytest.mark.parametrize("n,r,k,c,o,sz", [(2, 2, 7, 3, 8, 18),
                                          (2, 2, 3, 5, 4, 12),
                                          (1, 3, 7, 2, 6, 21)])
def test_to_cells_cell_grad_exact(n, r, k, c, o, sz):
    """`to_cells_conv`'s cell-space data gradient (stride-1 conv over grad
    cells + one-hot decode) must equal XLA's default transposed-conv input
    grad to f32 rounding; kernel grads are the same program (bit-equal)."""
    from ganslate_tpu.ops import s2d_space as sp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *([sz] * n), c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(*([k] * n), c, o)).astype(np.float32))
    kt = sp.transform_to_cells_kernel(w, r)
    g_shape = jax.eval_shape(lambda a: sp._to_cells_raw_conv(a, kt, r), x).shape
    g = jnp.asarray(rng.normal(size=g_shape).astype(np.float32))

    y0, vjp0 = jax.vjp(lambda a, kk: sp._to_cells_raw_conv(a, kk, r), x, kt)
    dx0, dk0 = vjp0(g)
    y1, vjp1 = jax.vjp(lambda a, kk: sp.to_cells_conv(a, kk, r), x, kt)
    dx1, dk1 = vjp1(g)

    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx0), np.asarray(dx1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk0), np.asarray(dk1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rank", [2, 3])
def test_bias_inert_exact(rank):
    """bias_inert keeps the forward BYTE-IDENTICAL (the add stays — it is
    load-bearing for XLA fusion layouts, ops notes in nn/layers.py) and
    zeroes the bias gradient (the reference's is ~1e-8 rounding noise that
    drags a full backward reduce; the function is exactly bias-invariant:
    (x+b) - mean(x+b) == x - mean(x) per (sample, channel))."""
    from ganslate_tpu.nn import layers

    k = (3,) * rank
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, *([12] * rank), 5)).astype(np.float32))

    def forward(inert, bias):
        conv = layers.Conv(6, k, padding=1, use_bias=True, bias_inert=inert)
        params = conv.init(jax.random.key(0), x)["params"]
        params = dict(params, bias=bias)
        y = conv.apply({"params": params}, x)
        norm = layers.get_norm_layer("instance")()
        return jnp.sum(jnp.square(
            norm.init_with_output(jax.random.key(0), y)[0]))

    # Nonzero bias: the claim is cancellation, not zero-ness.
    b = jnp.arange(6, dtype=jnp.float32)
    y_ref = forward(False, b)
    y_inert = forward(True, b)
    np.testing.assert_array_equal(np.asarray(y_inert), np.asarray(y_ref))

    # The bias gradient is exactly zero under bias_inert (vs the reference's
    # rounding-noise gradient, which is nonzero but function-inert).
    db = jax.grad(lambda bb: forward(True, bb))(b)
    np.testing.assert_array_equal(np.asarray(db), np.zeros(6, np.float32))
