"""Validator/Tester engines: multi-dataset eval loop with sliding-window
inference, full image-quality metric suite (+ masked, cycle, over-input
variants), dataset `save()`/`denormalize()` hooks.

Reference parity: /root/reference/ganslate/engines/validator_tester.py.
"""

import numpy as np

from ganslate_tpu.engines.base import BaseEngineWithInference
from ganslate_tpu.utils import environment
from ganslate_tpu.utils.builders import build_gan, build_loader
from ganslate_tpu.utils.metrics.val_test_metrics import ValTestMetrics
from ganslate_tpu.utils.trackers.validation_testing import ValTestTracker


class BaseValTestEngine(BaseEngineWithInference):

    def __init__(self, conf):
        super().__init__(conf)

        self.data_loaders = build_loader(self.conf)
        # A single dataset is treated as the anonymous entry of a multi-dataset.
        if not isinstance(self.data_loaders, dict):
            self.data_loaders = {None: self.data_loaders}
        self.current_data_loader = None

        self.tracker = ValTestTracker(self.conf)
        self.metricizer = ValTestMetrics(self.conf)
        self.visuals = {}
        self.fid = self._init_fid()

    def _init_fid(self):
        """Standard InceptionV3-pool3 FID over the whole val/test set
        (config `metrics.fid` + `metrics.fid_weights`; beyond-reference —
        BASELINE.md north star)."""
        mconf = self.conf[self.conf.mode].metrics
        if not getattr(mconf, "fid", False):
            return None
        weights = getattr(mconf, "fid_weights", None)
        if not weights:
            raise ValueError(
                "metrics.fid requires metrics.fid_weights: the native .npz "
                "(from `ganslate convert-fid-weights`) or a torchvision "
                "inception_v3 state_dict .pth (needs torch at eval time); "
                "see ganslate_tpu/nn/inception.py")
        from ganslate_tpu.nn.inception import (fid_feature_fn,
                                               load_inception_weights)
        from ganslate_tpu.utils.metrics.fid import FID
        return FID(fid_feature_fn(load_inception_weights(weights)))

    def run(self, current_idx=None):
        self.logger.info(
            f'{"Validation" if self.conf.mode == "val" else "Testing"} started.')

        for dataset_name, data_loader in self.data_loaders.items():
            self.current_data_loader = data_loader
            for data in self.current_data_loader:
                self.visuals = {}
                self.visuals["real_A"] = np.asarray(data["A"])
                self.visuals["fake_B"] = self.infer(self.visuals["real_A"])
                self.visuals["real_B"] = np.asarray(data["B"])

                if "masks" in data:
                    self.visuals["masks"] = data["masks"]

                metadata = data["metadata"] if "metadata" in data else None
                self.save_generated_tensor(generated_tensor=self.visuals["fake_B"],
                                           metadata=metadata,
                                           data_loader=self.current_data_loader,
                                           idx=current_idx,
                                           dataset_name=dataset_name)

                metrics = self._calculate_metrics()
                self.tracker.add_sample(self.visuals, metrics)

                self._update_fid()

            set_metrics = None
            if self.fid is not None:
                # Collective (uniform across processes): merge every
                # process's features so FID covers the whole set. The
                # O(d^3) Frechet solve then runs on the main process only —
                # the tracker consuming set_metrics is rank-0-only.
                from ganslate_tpu.utils import communication
                self.fid.sync_across_processes()
                if (communication.is_main_process()
                        and self.fid.num_samples("real")):
                    set_metrics = {"fid": self.fid.compute()}
                self.fid.reset()
            self.tracker.log_samples(current_idx, dataset_name=dataset_name,
                                     set_metrics=set_metrics)

        if self.conf.mode == "test":
            self.tracker.close()

    _FID_SLICE_CHUNK = 32

    def _update_fid(self):
        """Stream the current visuals into the FID accumulator.

        2D batches (N, H, W, C) go in directly. 3D volumes (N, D, H, W, C)
        use the SLICE-WISE pool3 convention when `metrics.fid_3d_slicewise`
        (default on): every axial slice is treated as one Inception image
        (grayscale repeated to RGB, resized to 299) — the standard medical
        workaround, since no canonical 3D Inception statistics exist. Slices
        feed in fixed-size chunks so the jitted feature fn compiles for at
        most two batch shapes regardless of volume depth."""
        if self.fid is None:
            return
        mconf = self.conf[self.conf.mode].metrics
        for which in ("real", "fake"):
            batch = np.asarray(self.visuals[f"{which}_B"])
            if batch.ndim == 5:
                if not getattr(mconf, "fid_3d_slicewise", True):
                    return
                batch = batch.reshape(-1, *batch.shape[2:])
                for i in range(0, len(batch), self._FID_SLICE_CHUNK):
                    self.fid.update(batch[i:i + self._FID_SLICE_CHUNK], which)
            else:
                self.fid.update(batch, which)

    def _calculate_metrics(self):
        original = self.visuals["real_A"]
        pred = np.asarray(self.visuals["fake_B"])
        target = self.visuals["real_B"]

        compute_over_input = getattr(self.conf[self.conf.mode].metrics,
                                     "compute_over_input", False)

        # Dataset-provided denormalization hook (e.g. back to HU range).
        denormalize = getattr(self.current_data_loader.dataset, "denormalize", False)
        if denormalize:
            pred, target = denormalize(np.array(pred)), denormalize(np.array(target))
            if compute_over_input:
                original = denormalize(np.array(original))

        metrics = self.metricizer.get_metrics(pred, target)

        if compute_over_input:
            metrics.update({f"Original_{k}": v for k, v in
                            self.metricizer.get_metrics(original, target).items()})

        # Masked metrics, per mask label.
        mask_metrics = {}
        if "masks" in self.visuals:
            masks_dict = self.visuals.pop("masks")
            for label, mask in masks_dict.items():
                mask = np.asarray(mask)
                for name, value in self.metricizer.get_metrics(
                        pred, target, mask=mask).items():
                    mask_metrics[f"{name}_{label}"] = value
                if compute_over_input:
                    for name, value in self.metricizer.get_metrics(
                            original, target, mask=mask).items():
                        mask_metrics[f"Original_{name}_{label}"] = value
                # Mask joins the visuals ([0,1] -> [-1,1] display range).
                self.visuals[label] = 2.0 * mask - 1

        # Cycle metrics: translate fake_B back with the BA generator.
        cycle_metrics = {}
        if getattr(self.conf[self.conf.mode].metrics, "cycle_metrics", False):
            rec_A = self.infer(np.asarray(self.visuals["fake_B"]), direction="BA")
            cycle_metrics = self.metricizer.get_cycle_metrics(
                np.asarray(rec_A), self.visuals["real_A"])

        metrics.update(mask_metrics)
        metrics.update(cycle_metrics)
        return metrics


class Validator(BaseValTestEngine):
    """Runs during training, sharing the live model."""

    def __init__(self, conf, model):
        super().__init__(conf)
        self.model = model

    def _set_mode(self):
        self.conf.mode = "val"


class Tester(BaseValTestEngine):

    def __init__(self, conf):
        super().__init__(conf)
        environment.setup_logging_with_config(self.conf)
        self.model = build_gan(self.conf)
        self.model.setup()

    def _set_mode(self):
        self.conf.mode = "test"
