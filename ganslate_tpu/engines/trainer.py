"""Trainer: the training loop engine.

Reference parity: /root/reference/ganslate/engines/trainer.py — zip(iters,
loader) loop, per-iteration model step + tracker log, freq-gated rank-0
checkpointing, freq-gated validation, resume semantics
(start_iter = 1 + load_iter, n_iters relative to the loaded iteration).

TPU notes:
- the model's first setup needs an example batch (shapes) — the Trainer peeks
  one batch from the loader, uses it for `model.setup`, and trains on it as
  iteration one (nothing is skipped);
- `update_learning_rate` is a no-op here: schedules advance inside the optax
  chain within the jitted step;
- the loop body enqueues the next step before reading logs — JAX's async
  dispatch overlaps host-side tracker work with device compute.
"""

from ganslate_tpu.engines.base import BaseEngine
from ganslate_tpu.engines.validator_tester import Validator
from ganslate_tpu.utils import communication, environment
from ganslate_tpu.utils.builders import build_gan, build_loader
from ganslate_tpu.utils.trackers.training import TrainingTracker


def chunk_gate_warnings(conf, k: int) -> list:
    """Under multi-step dispatch every frequency gate (logging, checkpoint,
    validation) only fires on iteration indices that land on a chunk
    boundary; a frequency that is not a multiple of k silently loses its
    events (e.g. val.freq=25 with k=8 never validates). One warning string
    per misaligned frequency."""
    gated = [("train.logging.freq", conf.train.logging.freq),
             ("train.checkpointing.freq", conf.train.checkpointing.freq)]
    if conf.get("val"):
        gated.append(("val.freq", conf.val.freq))
    return [f"{name}={freq} is not a multiple of steps_per_dispatch={k}; "
            f"it will fire only when a chunk boundary lands on it."
            for name, freq in gated if freq % k]


class Trainer(BaseEngine):

    def __init__(self, conf):
        super().__init__(conf)
        environment.setup_logging_with_config(self.conf)

        if self.conf.train.seed:
            environment.set_seed(self.conf.train.seed)

        if getattr(self.conf.train, "spatial_mesh", None):
            from ganslate_tpu.parallel import mesh as mesh_mod
            mesh_mod.set_mesh(mesh_mod.make_mesh(
                {"data": -1, "spatial": int(self.conf.train.spatial_mesh)}))

        self.tracker = TrainingTracker(self.conf)

        self.data_loader = build_loader(self.conf)
        if self.conf.train.checkpointing.load_iter:
            # Resume the data stream BEFORE the first batch is drawn: the
            # sampler fast-forwards to the interrupted position so the
            # trajectory continues instead of restarting the permutation
            # stream (the reference restarts:
            # /root/reference/ganslate/data/samplers.py has no cursor).
            self._restore_data_state(self.conf.train.checkpointing.load_iter)
        self._data_iter = iter(self.data_loader)
        self._first_batch = next(self._data_iter)

        self.model = build_gan(self.conf)
        self.model.setup(example_batch=self._first_batch)

        self.validator = self._init_validator()

        start_iter = 1
        if self.conf.train.checkpointing.load_iter:
            start_iter += self.conf.train.checkpointing.load_iter

        end_iter = 1 + self.conf.train.n_iters + self.conf.train.n_iters_decay
        assert start_iter < end_iter, \
            "If continuing, define the `n_iters` relative to the loaded iteration."

        self.iters = range(start_iter, end_iter)
        self.iter_idx = 0

    def _set_mode(self):
        self.conf.mode = "train"

    def _batches(self):
        yield self._first_batch
        yield from self._data_iter

    def run(self):
        from ganslate_tpu.utils.summary import gan_summary
        self.logger.info(gan_summary(self.model))
        self.logger.info("Training started.")

        self._install_preemption_handler()

        k = int(getattr(self.conf.train, "steps_per_dispatch", 1) or 1)
        if k > 1:
            return self._run_chunked(k)

        self.tracker.start_dataloading_timer()
        for i, data in zip(self.iters, self._batches()):
            self._set_iter_idx(i)
            self._profiler_step()
            self.tracker.start_computation_timer()
            self.tracker.end_dataloading_timer()

            self._run_iteration(data)
            self.tracker.end_computation_timer()

            learning_rates, losses, visuals, metrics = self.model.get_loggable_data()
            self.tracker.log_iter(learning_rates, losses, visuals, metrics)

            self._save_checkpoint()
            self.model.update_learning_rate()

            self._run_validation()

            if self._preempted:
                self.logger.warning(
                    f"Preemption signal received; saving checkpoint at iteration "
                    f"{self.iter_idx} and stopping.")
                self._save_model_checkpoint(self.iter_idx)
                break

            self.tracker.start_dataloading_timer()

        self._profiler_stop()
        self.tracker.close()
        if self.validator:
            self.validator.tracker.close()

    def _run_chunked(self, k: int):
        """Multi-step dispatch (train.steps_per_dispatch = k): collect k
        loader batches, run k fused steps in ONE device dispatch
        (BaseGAN.make_multi_step), and do tracker/checkpoint/validation
        work at chunk boundaries. Logged losses/metrics are the CHUNK MEAN
        (computed inside the dispatch); visuals are the chunk's last step;
        the computation timer covers the whole chunk. Gates
        (logging/checkpoint/validation freq) only fire on iteration indices
        at chunk boundaries, so keep frequencies multiples of k."""
        for msg in chunk_gate_warnings(self.conf, k):
            self.logger.warning(msg)

        batches, idxs = [], []
        last_iter = self.iters[-1]
        self.tracker.start_dataloading_timer()
        for i, data in zip(self.iters, self._batches()):
            batches.append(data)
            idxs.append(i)
            if len(batches) < k and i != last_iter:
                continue

            self._set_iter_idx(idxs[-1])
            self._profiler_step()
            self.tracker.start_computation_timer()
            self.tracker.end_dataloading_timer()

            self.model.set_input_multi(batches)
            will_log = self.iter_idx % self.conf.train.logging.freq == 0
            self.model.optimize_parameters(sync=will_log)
            self.tracker.end_computation_timer()
            batches, idxs = [], []

            learning_rates, losses, visuals, metrics = \
                self.model.get_loggable_data()
            self.tracker.log_iter(learning_rates, losses, visuals, metrics)

            self._save_checkpoint()
            self._run_validation()

            if self._preempted:
                self.logger.warning(
                    f"Preemption signal received; saving checkpoint at "
                    f"iteration {self.iter_idx} and stopping.")
                self._save_model_checkpoint(self.iter_idx)
                break

            self.tracker.start_dataloading_timer()

        self._profiler_stop()
        self.tracker.close()
        if self.validator:
            self.validator.tracker.close()

    # ---------------------------------------------------- preemption safety

    def _install_preemption_handler(self):
        """Checkpoint-on-preemption: TPU pods are preemptible; SIGTERM sets a
        flag and the loop saves + exits at the next iteration boundary
        (the reference left this as 'TODO: save on cancel')."""
        import signal
        self._preempted = False

        def handler(signum, frame):
            self._preempted = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            # Not in the main thread (e.g. tests); skip installation.
            pass

    # ------------------------------------------------------------ profiling

    def _profiler_step(self):
        profiler_conf = self.conf.train.logging.profiler
        if not profiler_conf:
            return
        import jax
        if self.iter_idx == self.iters.start + profiler_conf.start_iter:
            out_dir = profiler_conf.output_dir or str(
                self.output_dir / "profile")
            self.logger.info(f"Starting device trace -> {out_dir}")
            jax.profiler.start_trace(out_dir)
            self._profiling = True
        elif getattr(self, "_profiling", False) and \
                self.iter_idx == self.iters.start + profiler_conf.end_iter:
            self._profiler_stop()

    def _profiler_stop(self):
        if getattr(self, "_profiling", False):
            import jax
            jax.profiler.stop_trace()
            self._profiling = False
            self.logger.info("Device trace stopped.")

    def _run_iteration(self, data):
        self.model.set_input(data)
        # Block on device completion only on log iterations, so the tracker's
        # computation timer reports device time without breaking async
        # dispatch on the other iterations.
        will_log = self.iter_idx % self.conf.train.logging.freq == 0
        self.model.optimize_parameters(sync=will_log)

    def _save_checkpoint(self):
        # orbax coordinates multi-host saving internally; gate on rank 0 for
        # the single-host case to mirror the reference.
        if communication.get_rank() == 0:
            freq = self.conf.train.checkpointing.freq
            start_after = self.conf.train.checkpointing.start_after
            if self.iter_idx % freq == 0 and self.iter_idx >= start_after:
                self.logger.info(f"Saving the model after {self.iter_idx} iterations.")
                self._save_model_checkpoint(self.iter_idx)

    # ------------------------------------------------- data-plane checkpoint

    def _save_model_checkpoint(self, iter_idx):
        """Model checkpoint + data-plane sidecar: `{sampler_seed, position,
        world_size}` in `checkpoints/data_state_<iter>.json`. Position is the
        per-process index count actually CONSUMED by training (iters x local
        batch) — the sampler's live cursor runs ahead by the loader's
        prefetch depth, so it must not be read here."""
        self.model.save_checkpoint(iter_idx)
        sampler = getattr(self.data_loader, "sampler", None)
        if not (hasattr(sampler, "set_state") and hasattr(sampler, "seed")):
            return
        if communication.get_rank() == 0:
            import json
            state = {
                "sampler_seed": int(sampler.seed),
                "position": int(iter_idx * self.data_loader.local_batch_size),
                "world_size": communication.get_world_size(),
            }
            path = self.model._checkpoint_dir() / f"data_state_{iter_idx}.json"
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(json.dumps(state))

    def _restore_data_state(self, load_iter):
        sampler = getattr(self.data_loader, "sampler", None)
        if not hasattr(sampler, "set_state"):
            return
        # The model is built after the loader; derive the path from config.
        from pathlib import Path
        path = Path(self.conf.train.output_dir) / "checkpoints" / \
            f"data_state_{load_iter}.json"
        if not path.exists():
            self.logger.warning(
                f"Checkpoint {load_iter} has no data-plane state ({path.name} "
                "missing — written by an older version?); the sampler stream "
                "restarts instead of resuming.")
            return
        import json
        state = json.loads(path.read_text())
        position = int(state["position"])
        saved_ws = int(state.get("world_size") or 1)
        world_size = communication.get_world_size()
        if saved_ws != world_size:
            # World-size-portable resume (pod reshapes are the TPU-native
            # case): ranks interleave the shared raw stream, so a run at
            # world_size W with every process at per-process position P has
            # consumed exactly the first P*W raw slots. Remap that global
            # cursor to the new striding; if it doesn't divide evenly the
            # position rounds DOWN (up to new_ws-1 samples repeat — never
            # skipped).
            global_consumed = position * saved_ws
            position, remainder = divmod(global_consumed, world_size)
            msg = (f"Data-plane state was saved at world_size={saved_ws}; "
                   f"remapped global cursor {global_consumed} to "
                   f"per-process position {position} for world_size="
                   f"{world_size}")
            if remainder:
                msg += (f" ({remainder} already-seen samples repeat: the "
                        "global cursor is not divisible by the new world "
                        "size)")
            self.logger.warning(msg + ".")
        sampler.set_state(state["sampler_seed"], position)
        self.logger.info(
            f"Data stream resumed at position {position} "
            f"(seed {state['sampler_seed']}).")

    def _init_validator(self):
        if not self.conf.get("val"):
            return None
        return Validator(self.conf, self.model)

    def _run_validation(self):
        if self.validator:
            freq = self.conf.val.freq
            start_after = self.conf.val.start_after
            if self.iter_idx % freq == 0 and self.iter_idx >= start_after:
                self.validator.run(current_idx=self.iter_idx)

    def _set_iter_idx(self, iter_idx):
        self.iter_idx = iter_idx
        self.tracker.set_iter_idx(iter_idx)
