"""Inference engine.

Drives a trained generator over an inference dataset: each batch is
translated (optionally through the sliding-window inferer), handed to the
dataset's ``save()`` hook when one exists, and logged as input/output grids
with load / infer / save timings. With ``infer.is_deployment: true`` the
engine strips down to a bare ``infer()`` callable — no loader, tracker, or
logging — for embedding in serving code.

Behavior parity with the reference engine
(/root/reference/ganslate/engines/inferer.py): same deployment switch, same
accepted input keys, same progress accounting across processes.
"""

import numpy as np

from ganslate_tpu.engines.base import BaseEngineWithInference
from ganslate_tpu.utils import communication, environment
from ganslate_tpu.utils.builders import build_gan, build_loader
from ganslate_tpu.utils.trackers.inference import InferenceTracker

#: A batch dict must carry the tensor to translate under one of these keys.
INPUT_KEYS = ("input", "A")

_NO_SAVE_HOOK_NOTE = (
    "The dataset class used does not have a 'save' method. It is not "
    "necessary, however, it may be useful when outputs should be stored "
    "individually or in a specific format ('images/' saves input+output "
    "side by side).")


class Inferer(BaseEngineWithInference):

    def __init__(self, conf):
        super().__init__(conf)

        self.deployment = bool(self.conf.infer.is_deployment)
        if not self.deployment:
            assert self.conf.infer.dataset, \
                "Please specify the dataset for inference."
            environment.setup_logging_with_config(self.conf)
            self.tracker = InferenceTracker(self.conf)
            self.data_loader = build_loader(self.conf)

        self.model = build_gan(self.conf)
        self.model.setup()

    def _set_mode(self):
        self.conf.mode = "infer"

    # ------------------------------------------------------------------ run

    def run(self):
        assert not self.deployment, \
            "`Inferer.run()` cannot be used in deployment, please use `Inferer.infer()`."
        self.logger.info("Inference started.")

        # How many examples one loop iteration advances globally: every
        # process consumes its own batch.
        stride = communication.get_world_size() * self.conf.infer.batch_size
        n_examples = len(self.data_loader.dataset)
        input_key = None

        self.tracker.start_dataloading_timer()
        for i, batch in enumerate(self.data_loader):
            self.tracker.set_iter_idx(i * stride + 1)
            if input_key is None:
                input_key = self._resolve_input_key(batch)

            out = self._translate(batch[input_key])

            self.tracker.start_saving_timer()
            self.save_generated_tensor(generated_tensor=out,
                                       metadata=batch.get("metadata"),
                                       data_loader=self.data_loader)
            self.tracker.end_saving_timer()

            self.tracker.log_iter(
                {"input": np.asarray(batch[input_key]), "output": out},
                n_examples)
            self.tracker.start_dataloading_timer()
        self.tracker.close()

    def _translate(self, tensor) -> np.ndarray:
        """Run the generator under the compute timer; the host materialize
        blocks so the timer records device time, not dispatch time. Under
        the bf16 wire format the D2H transfer moves 2-byte elements; the
        fp32 upcast happens here on the host (lossless)."""
        self.tracker.start_computation_timer()
        self.tracker.end_dataloading_timer()
        out = np.asarray(self.infer(np.asarray(tensor)))
        if out.dtype != np.float32:
            out = out.astype(np.float32)
        self.tracker.end_computation_timer()
        return out

    def _resolve_input_key(self, batch) -> str:
        for key in INPUT_KEYS:
            if key in batch:
                break
        else:
            raise ValueError(
                "An inference dataset needs to provide the input data under "
                f"one of the dict keys {INPUT_KEYS}.")
        if not hasattr(self.data_loader.dataset, "save"):
            self.logger.warning(_NO_SAVE_HOOK_NOTE)
        return key
