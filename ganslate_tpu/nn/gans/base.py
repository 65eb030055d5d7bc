"""BaseGAN: the training-algorithm contract, TPU-native.

The reference BaseGAN (/root/reference/ganslate/nn/gans/base.py) is an eager
orchestrator: mutable dicts of networks/optimizers/losses, per-loss
`.backward()` calls, Apex AMP, per-network DDP wrappers, torch.save
checkpoints. The TPU redesign splits the same responsibilities in two:

1. **A pure, jit-compiled train step** built once per model by
   `make_train_step()`: `(GANState, batch) -> (GANState, logs)`. The entire
   iteration — all generator/discriminator forwards, both gradient
   computations, optimizer updates, image-pool mutation, metric computation —
   is ONE XLA program. Data parallelism comes from the batch being sharded
   over the mesh's `data` axis: XLA inserts the gradient psums over ICI (the
   reference needed explicit DDP + NCCL for this).

2. **A thin host orchestrator** (this class) owning the static pieces: linen
   module definitions, optax transforms, criterions, checkpoint IO, and the
   `GANState` pytree that flows through the step.

Mixed precision = bf16 compute policy: fp32 master params, params and inputs
cast to bf16 at apply time, losses in fp32. No loss scaling (bf16 has fp32's
exponent range) — replaces the reference's Apex AMP O-levels
(nn/gans/base.py:191-219).

Naming conventions preserved from the reference (base.py:49-67): generators
`G`/`G_AB`/`G_BA` (direction suffix), discriminators `D`/`D_B`/`D_A` (domain
suffix); optimizer groups `G` and `D`.
"""

import logging
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ganslate_tpu.parallel import get_mesh, replicate_to_mesh, shard_batch

# Perf switches read here (fused_d_forward: batched real/fake D forwards,
# see `apply_batched`; paired_apply: paired-symmetric network execution,
# see `apply_paired` — OFF by default, measured a 10% REGRESSION on the
# fused CycleGAN-256 step because XLA lowers vmapped stacked-weight convs
# to slower grouped convs) live on the single flags surface:
# ganslate_tpu/flags.py.
from ganslate_tpu.flags import FLAGS
from ganslate_tpu.utils import communication
from ganslate_tpu.utils.metrics.train_metrics import TrainingMetrics

logger = logging.getLogger(__name__)


class GANState(struct.PyTreeNode):
    """Immutable train state; the only thing that changes across iterations."""
    step: jax.Array                  # scalar int32
    params: Dict[str, Any]           # network name -> param tree (fp32 masters)
    opt_state: Dict[str, Any]        # optimizer group -> optax state
    pools: Dict[str, Any]            # pool name -> PoolState (may be empty)
    rng: jax.Array                   # PRNG key driving all device randomness


class BaseGAN(ABC):
    """Abstract base for GAN training algorithms.

    Subclasses declare their networks / optimizer groups / pools in
    ``__init__``, implement ``init_criterions`` + ``init_optimizers`` +
    ``make_train_step`` (+ ``infer``), then call ``self.setup()``.
    """

    def __init__(self, conf):
        self.conf = conf
        self.is_train = conf.mode == "train"
        self.output_dir = conf[conf.mode].output_dir
        self.mixed_precision = bool(conf[conf.mode].mixed_precision)
        self.compute_dtype = jnp.bfloat16 if self.mixed_precision else jnp.float32

        self.mesh = get_mesh()
        self.networks: Dict[str, Any] = {}      # name -> linen module (static)
        self.optimizers: Dict[str, Any] = {}    # group -> optax transform
        self.lr_schedules: Dict[str, Callable] = {}
        # group -> list of network names whose params the group's optimizer owns
        self.network_groups: Dict[str, list] = {}

        self.state: Optional[GANState] = None
        self.metrics: Dict[str, Any] = {}
        self.losses: Dict[str, Any] = {}
        self.visuals: Dict[str, Any] = {}

        self._train_step_fn = None
        self._infer_fns: Dict[str, Callable] = {}

    # ------------------------------------------------------------- networks

    def init_networks(self):
        """Instantiate module defs by naming convention (reference parity)."""
        from ganslate_tpu.utils.builders import build_D, build_G
        for name in list(self.networks.keys()):
            if name.startswith("G"):
                direction = "BA" if name.endswith("_BA") else "AB"
                self.networks[name] = build_G(self.conf, direction)
            elif name.startswith("D"):
                domain = "A" if name.endswith("_A") else "B"
                self.networks[name] = build_D(self.conf, domain)

    @abstractmethod
    def init_criterions(self):
        """Initialize criterions (losses)."""

    @abstractmethod
    def init_optimizers(self):
        """Initialize optax optimizer groups + lr schedules."""

    def init_metrics(self):
        self.training_metrics = TrainingMetrics(self.conf)

    @abstractmethod
    def make_train_step(self) -> Callable:
        """Return the pure `(state, batch) -> (state, logs)` function."""

    @abstractmethod
    def init_state_pools(self, batch_spec: Dict[str, Any]) -> Dict[str, Any]:
        """Create the model's pool states given the batch spec (may be {})."""

    # -------------------------------------------------------------- helpers

    def make_adam(self, lr: float) -> optax.GradientTransformation:
        """Adam with the reference's const-then-linear-decay schedule,
        hyperparams injected so the live LR is inspectable for logging."""
        from ganslate_tpu.nn.utils import make_lr_schedule
        tr = self.conf.train
        # The optax count is absolute when optimizer state is restored from a
        # checkpoint; the load_iter offset is only needed for a fresh
        # optimizer (reference parity: nn/utils.py:91-97, where LambdaLR
        # always restarts at 0 and is offset explicitly).
        load_iter = tr.checkpointing.load_iter or 0
        if load_iter and tr.checkpointing.load_optimizers:
            load_iter = 0
        schedule = make_lr_schedule(lr, tr.n_iters, tr.n_iters_decay, load_iter)
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=schedule,
            b1=tr.gan.optimizer.beta1,
            b2=tr.gan.optimizer.beta2,
        )
        return opt

    def apply_batched(self, name: str, params, xs, rng=None):
        """Apply network `name` to several same-shaped inputs as ONE batched
        forward when that is exact, else fall back to one apply per input.

        The reference dispatches D(real) and D(fake) as separate module
        calls (e.g. cyclegan.py:154-189); for a deterministic per-sample
        discriminator (convs + instance norm + pointwise activations — no
        dropout, no per-call random crops, no batch-norm cross-sample
        stats) the concatenated forward computes the exact same numbers
        with twice the matmul batch, halving per-layer dispatch/fixed
        costs on the MXU. Stochastic or batch-norm modules keep the
        per-call path (fresh rng per call, per-call batch stats — the
        reference's train-mode semantics).

        Fusion is OPT-IN by convention: a module is only fused when it
        declares the framework's `norm_type` attribute (all in-tree
        discriminators do) — custom project modules that don't follow the
        attribute conventions take the safe per-call path rather than being
        silently fused with possibly changed semantics. A module may also
        force the decision either way with a boolean `batch_fusable`
        attribute."""
        module = self.networks[name]
        if not self._batch_fusable(module):
            keys = (jax.random.split(rng, len(xs)) if rng is not None
                    else [None] * len(xs))
            return [self.apply(name, params, x, rng=k)
                    for x, k in zip(xs, keys)]
        b = xs[0].shape[0]
        out = self.apply(name, params, jnp.concatenate(xs, axis=0))
        return [jax.lax.slice_in_dim(out, i * b, (i + 1) * b, axis=0)
                for i in range(len(xs))]

    @staticmethod
    def _batch_fusable(module) -> bool:
        """May several same-shaped inputs run as one concatenated batch
        through `module` exactly? (See `apply_batched` for the contract.)"""
        declared = getattr(module, "batch_fusable", None)
        if declared is not None:
            return FLAGS.fused_d_forward and bool(declared)
        return (FLAGS.fused_d_forward
                and getattr(module, "norm_type", None) is not None
                and module.norm_type != "batch"
                and not getattr(module, "use_dropout", False)
                and not getattr(module, "stochastic_rngs", ()))

    @staticmethod
    def _pair_fusable(m0, m1) -> bool:
        """May the identical-architecture pair run as one stacked-weights
        vmapped pass? (See `apply_paired` for the contract.)"""
        return (FLAGS.paired_apply and type(m0) is type(m1) and m0 == m1
                and getattr(m0, "norm_type", None) != "batch"
                and not getattr(m0, "use_dropout", False)
                and not getattr(m0, "stochastic_rngs", ()))

    def apply_paired(self, names, params_by_name, xs, rng=None):
        """Run two ARCHITECTURALLY IDENTICAL networks on their respective
        inputs as ONE vmapped pass over stacked weights; returns the pair of
        outputs. Falls back to two `apply` calls when the modules differ or
        are stochastic.

        The reference runs its symmetric network pairs (G_AB/G_BA,
        D_A/D_B — cyclegan.py:92-214) as separate module calls. On TPU the
        duplication is pure overhead: the CycleGAN step traces ~10k XLA ops,
        most of them small fusions (pads, norm stats, activations) issued
        once per network, each carrying fixed sequencer cost; and every
        boundary-layer conv runs twice at partial MXU occupancy. Stacking
        the two param trees on a leading axis and vmapping the module turns
        each pair of fusions into one with doubled batch — XLA lowers the
        vmapped convs to batch-grouped convs. Exact per slice (the same
        contractions, grouped); deterministic modules only, and only when
        the two flax modules compare EQUAL (same class, same hyperparams),
        so shape-incompatible pairs (e.g. different in_channels per domain)
        take the safe per-network path."""
        m0, m1 = self.networks[names[0]], self.networks[names[1]]
        if not self._pair_fusable(m0, m1):
            keys = (jax.random.split(rng, 2) if rng is not None
                    else (None, None))
            return tuple(self.apply(n, params_by_name[n], x, rng=k)
                         for n, x, k in zip(names, xs, keys))
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]),
            params_by_name[names[0]], params_by_name[names[1]])
        x = jnp.stack([xs[0], xs[1]])
        if self.compute_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            x = x.astype(self.compute_dtype)
        out = jax.vmap(lambda p, v: m0.apply({"params": p}, v))(params, x)
        return out[0], out[1]

    def apply(self, name: str, params, x, rng=None, **kwargs):
        """Run a network under the compute-dtype policy. `params` is the
        param tree OF THAT NETWORK (not the full dict).

        `rng` enables the network's train-time stochasticity for THIS call
        (train steps pass a distinct key per apply site; eval/infer pass
        none): dropout for modules with `use_dropout` (reference applies it
        in train mode, unet2d.py:112-121) and fresh random crops for modules
        declaring `stochastic_rngs` (MultiScalePatchGAN3D's per-call
        RandSpatialCrop, multiscale_patchgan3d.py:49-56)."""
        module = self.networks[name]
        if self.compute_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            x = x.astype(self.compute_dtype)
        if rng is not None:
            collections = []
            if getattr(module, "use_dropout", False):
                collections.append("dropout")
                kwargs.setdefault("train", True)
            collections.extend(getattr(module, "stochastic_rngs", ()))
            if collections:
                keys = jax.random.split(rng, len(collections))
                kwargs["rngs"] = dict(zip(collections, keys))
        return module.apply({"params": params}, x, **kwargs)

    def group_params(self, params: Dict[str, Any], group: str) -> Dict[str, Any]:
        return {k: params[k] for k in self.network_groups[group]}

    # ---------------------------------------------------------------- setup

    def setup(self, example_batch: Optional[Dict[str, Any]] = None):
        """(1) build networks/criterions/optimizers, (2) init or load state,
        (3) jit-compile the train step (reference parity: base.py:108-153)."""
        assert "G" in self.networks or "G_AB" in self.networks, \
            "The (main) generator has to be named `G` or `G_AB`."

        self.init_networks()

        if self.is_train:
            assert example_batch is not None, \
                "Training setup needs an example batch (shapes) to init params."
            self.init_criterions()
            self.init_optimizers()
            self.init_metrics()
            self.state = self._init_state(example_batch)

            load_iter = self.conf.train.checkpointing.load_iter
            if load_iter:
                self.load_networks(load_iter)

            k = int(getattr(self.conf.train, "steps_per_dispatch", 1) or 1)
            self._train_step_fn = jax.jit(self.make_multi_step(k)
                                          if k > 1 else self.make_train_step(),
                                          donate_argnums=0)
        else:
            load_iter = self.conf[self.conf.mode].checkpointing.load_iter
            self.load_networks(load_iter)

    def _init_state(self, example_batch) -> GANState:
        seed = self.conf.train.seed
        if seed is None:
            seed = communication.shared_random_seed()
        root_key = jax.random.key(seed)

        batch_spec = {k: jax.ShapeDtypeStruct(np.shape(v), _np_dtype(v))
                      for k, v in example_batch.items()
                      if hasattr(v, "shape") or isinstance(v, np.ndarray)}

        init_key, state_key = jax.random.split(root_key)
        params = {}
        keys = jax.random.split(init_key, len(self.networks))
        for key, (name, module) in zip(keys, sorted(self.networks.items())):
            dummy = self._dummy_input(name, batch_spec)
            variables = jax.jit(module.init)(key, dummy)
            params[name] = variables["params"]
            n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params[name]))
            logger.info(f"Network {name}: {n_params:,} parameters")

        opt_state = {group: self.optimizers[group].init(self.group_params(params, group))
                     for group in self.optimizers}

        pools = self.init_state_pools(batch_spec)

        state = GANState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            pools=pools,
            rng=state_key,
        )
        # Replicate state across the mesh (multi-controller safe).
        return replicate_to_mesh(state, self.mesh)

    def _dummy_input(self, name: str, batch_spec) -> jax.Array:
        """Zeros with the right shape to initialize network `name`.
        Generators see domain-A-shaped input; discriminators domain-B-shaped.
        Conditional models override (e.g. Pix2Pix D sees cat(A, B))."""
        if name.startswith("G"):
            spec = batch_spec["B" if name.endswith("_BA") else "A"]
        else:
            spec = batch_spec["A" if name.endswith("_A") else "B"]
        return jnp.zeros(spec.shape, spec.dtype)

    # ------------------------------------------------------------- training

    def set_input(self, batch: Dict[str, Any]):
        """Place the host batch onto the mesh, sharded over `data`."""
        self._batch = shard_batch(
            {k: v for k, v in batch.items() if hasattr(v, "shape")}, self.mesh)

    # ------------------------------------------------- multi-step dispatch

    def make_multi_step(self, k: int) -> Callable:
        """`(state, stacked_batches) -> (state, last_step_logs)` running `k`
        fused train steps in ONE device dispatch.

        Per-dispatch overhead on relay-backed PJRT transports is 2-10 ms
        (pytree flatten + transport round-trip), which the reference's
        per-iteration Python dispatch pays every step
        (/root/reference/ganslate/engines/trainer.py:64-76). Scanning the
        step body over a (k, B, ...) batch stack pays it once per k steps.
        The first step runs unrolled to seed the visuals carry (the step's
        log structure isn't known before tracing); the remaining k-1 ride a
        `lax.scan`, so compile time stays ~one step body. Losses/metrics
        come back as the CHUNK MEAN over the k steps (one add per step
        inside the dispatch — strictly more informative than sampling the
        last step); visuals stay last-step-only, because scan-stacking k
        copies of the visual grids would cost k full image sets of HBM for
        logs that the tracker reads at most once per chunk."""
        step = self.make_train_step()
        if k <= 1:
            return step

        def multi(state, batches):
            first = jax.tree_util.tree_map(lambda a: a[0], batches)
            rest = jax.tree_util.tree_map(lambda a: a[1:], batches)
            # Tail chunks may arrive shorter than k (trainer epoch ends);
            # the stack length is static at trace time.
            if jax.tree_util.tree_leaves(rest)[0].shape[0] == 0:
                return step(state, first)
            state, logs0 = step(state, first)

            def body(carry, b):
                s, _ = carry
                s, logs = step(s, b)
                small = {n: v for n, v in logs.items() if n != "visuals"}
                return (s, logs.get("visuals", {})), small

            (state, visuals), smalls = jax.lax.scan(
                body, (state, logs0.get("visuals", {})), rest)
            small0 = {n: v for n, v in logs0.items() if n != "visuals"}
            logs = jax.tree_util.tree_map(
                lambda first, stack: (first + jnp.sum(stack, axis=0))
                / (1 + stack.shape[0]),
                small0, smalls)
            logs["visuals"] = visuals
            return state, logs

        return multi

    def set_input_multi(self, batches):
        """Stack k host batches on a new leading axis and place them on the
        mesh (batch dim sharded over `data`, step dim replicated)."""
        import numpy as _np
        stacked = {}
        for key in batches[0]:
            if hasattr(batches[0][key], "shape"):
                stacked[key] = _np.stack([_np.asarray(b[key])
                                          for b in batches])
        self._batch = shard_batch(stacked, self.mesh, stacked_steps=True)

    def optimize_parameters(self, sync: bool = False):
        """Run the single fused train step; keep logs as lazy device arrays.

        `sync=True` blocks until the step finishes on device — engines pass it
        on log-frequency iterations so the computation timer measures real
        device time instead of async dispatch time. Off-frequency steps stay
        fully asynchronous (host races ahead, device queue stays full)."""
        self.state, logs = self._train_step_fn(self.state, self._batch)
        self.losses = logs.get("losses", {})
        self.visuals = logs.get("visuals", {})
        self.metrics = logs.get("metrics", {})
        if sync and self.losses:
            # A host read, not block_until_ready: some PJRT transports (e.g.
            # the axon relay) return from block_until_ready before execution
            # finishes; fetching a scalar is the reliable fence.
            for v in self.losses.values():
                float(jax.device_get(v))
                break

    def update_learning_rate(self):
        """No-op: LR schedules are part of the optax chain and advance with
        every optimizer update (reference stepped LambdaLR each iter)."""

    def get_learning_rates(self):
        lrs = {}
        for group, opt_state in self.state.opt_state.items():
            try:
                lr = opt_state.hyperparams["learning_rate"]
                lrs[f"lr_{group}"] = float(jax.device_get(lr))
            except (AttributeError, KeyError, TypeError):
                pass
        return lrs

    def get_loggable_data(self):
        """Learning rates, losses, visuals and metrics for the tracker."""
        return self.get_learning_rates(), self.losses, self.visuals, self.metrics

    # ------------------------------------------------------------ inference

    def infer(self, x, direction: str = "AB"):
        name = f"G_{direction}" if f"G_{direction}" in self.networks else "G"
        assert name in self.networks, f"Specify a valid generator direction, got {direction}."
        if name not in self._infer_fns:
            module = self.networks[name]
            dtype = self.compute_dtype

            def fn(params, x):
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
                return module.apply({"params": p}, x.astype(dtype)).astype(jnp.float32)

            self._infer_fns[name] = jax.jit(fn)
        return self._infer_fns[name](self.state.params[name], x)

    def get_pure_infer(self, direction: str = "AB"):
        """Return `(pure_fn, params)` where `pure_fn(params, x)` applies the
        direction's generator under the compute policy. Used by the
        sliding-window inferer so parameters stay traced arguments (not baked
        constants) in its compiled program."""
        name = f"G_{direction}" if f"G_{direction}" in self.networks else "G"
        assert name in self.networks, f"Specify a valid generator direction, got {direction}."
        cache_key = f"pure_{name}"
        if cache_key not in self._infer_fns:
            module = self.networks[name]
            dtype = self.compute_dtype

            def fn(params, x):
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
                return module.apply({"params": p}, x.astype(dtype)).astype(jnp.float32)

            self._infer_fns[cache_key] = fn
        return self._infer_fns[cache_key], self.state.params[name]

    # ---------------------------------------------------------- checkpoints

    def _checkpoint_dir(self) -> Path:
        return Path(self.output_dir) / "checkpoints"

    def _checkpointable_pools(self) -> Dict[str, Any]:
        """Pools with actual buffers. `pool_size=0` pools are stateless
        pass-throughs whose arrays have zero rows — orbax refuses zero-size
        arrays, and there is nothing to save anyway."""
        return {name: pool for name, pool in self.state.pools.items()
                if all(leaf.size > 0
                       for leaf in jax.tree_util.tree_leaves(pool))}

    def save_checkpoint(self, iter_idx: int):
        """Save `{params, opt_state, step, rng, pools}` (reference:
        base.py:226-251 — which does NOT save its ImagePools; we do, so a
        SIGTERM-resume reproduces the uninterrupted trajectory instead of
        silently resetting the discriminators' fake history).
        Multi-host safe: orbax coordinates across processes."""
        import orbax.checkpoint as ocp
        path = (self._checkpoint_dir() / str(iter_idx)).resolve()
        logger.info(f"Saving checkpoint at iteration {iter_idx} -> {path}")
        with ocp.StandardCheckpointer() as ckptr:
            payload = {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "rng": jax.random.key_data(self.state.rng),
            }
            pools = self._checkpointable_pools()
            if pools:
                payload["pools"] = pools
            ckptr.save(path, payload, force=True)

    def load_networks(self, iter_idx: int):
        """Restore params (+ optimizers when configured) from a checkpoint
        (reference parity: base.py:253-287, `load_optimizers` semantics)."""
        import orbax.checkpoint as ocp
        path = (self._checkpoint_dir() / str(iter_idx)).resolve()
        assert path.exists(), f"No checkpoint at {path}"
        logger.info(f"Loading checkpoint of iteration {iter_idx} from {path}")

        load_optimizers = False
        if self.is_train:
            load_optimizers = bool(self.conf.train.checkpointing.load_optimizers)

        with ocp.StandardCheckpointer() as ckptr:
            if self.state is not None:
                target = {
                    "params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "step": self.state.step,
                    "rng": jax.random.key_data(self.state.rng),
                }
                saved_pools = self._checkpointable_pools()
                if saved_pools:
                    target["pools"] = saved_pools
                # Progressive fallback: full -> without pools (checkpoints
                # written before pools were saved) -> without optimizer state
                # either (checkpoints converted from PyTorch,
                # utils/torch_import.py).
                restored = None
                for drop in ((), ("pools",), ("pools", "opt_state")):
                    t = {k: v for k, v in target.items() if k not in drop}
                    try:
                        restored = ckptr.restore(path, t)
                        break
                    except Exception:
                        if drop == ("pools", "opt_state"):
                            raise
                if "opt_state" not in restored and load_optimizers:
                    logger.warning(
                        "Checkpoint has no optimizer state (e.g. imported "
                        "from PyTorch); optimizers start fresh.")
                    load_optimizers = False
                new_state = self.state.replace(
                    params=restored["params"],
                    rng=jax.random.wrap_key_data(restored["rng"]),
                    step=restored["step"],
                )
                if "pools" in restored:
                    # Zero-size (disabled) pools aren't saved; keep their
                    # fresh stateless init and merge the restored buffers.
                    new_state = new_state.replace(
                        pools={**self.state.pools, **restored["pools"]})
                elif saved_pools:
                    logger.warning(
                        "Checkpoint has no pool state (written by an older "
                        "version); pools start fresh.")
                if load_optimizers:
                    new_state = new_state.replace(opt_state=restored["opt_state"])
                else:
                    logger.info("Optimizers not loaded (load_optimizers=False).")
                self.state = new_state
            else:
                # Eval/infer: no optimizer state exists; restore params only.
                restored = ckptr.restore(path)
                params = {name: restored["params"][name] for name in self.networks}
                self.state = GANState(
                    step=jnp.asarray(restored.get("step", iter_idx), jnp.int32),
                    params=params,
                    opt_state={},
                    pools={},
                    rng=jax.random.key(0),
                )


def _np_dtype(v):
    return np.asarray(v).dtype if not hasattr(v, "dtype") else v.dtype
