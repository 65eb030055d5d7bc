"""TensorBoard sink (via tensorboardX). Reference parity:
/root/reference/ganslate/utils/trackers/tensorboard.py."""

import numpy as np

from ganslate_tpu.utils.trackers.utils import apply_image_window


class TensorboardTracker:

    def __init__(self, conf):
        from tensorboardX import SummaryWriter
        mode = conf.mode
        self.image_window = conf[mode].logging.image_window
        log_dir = str(conf[mode].output_dir) + f"/{mode}/tensorboard"
        self.writer = SummaryWriter(log_dir)

    def log_iter(self, iter_idx, visuals=None, mode="train", learning_rates=None,
                 losses=None, metrics=None):
        for group, values in (("losses", losses), ("metrics", metrics),
                              ("learning_rates", learning_rates)):
            if values:
                for name, value in values.items():
                    self.writer.add_scalar(f"{mode}/{group}/{name}", float(value),
                                           iter_idx)
        if visuals:
            if isinstance(visuals, dict):
                visuals = [visuals]
            for v in visuals:
                image = apply_image_window(v["image"], self.image_window)
                # tensorboardX expects CHW
                self.writer.add_image(f"{mode}/{v['name']}",
                                      np.transpose(image, (2, 0, 1)), iter_idx)

    def close(self):
        self.writer.close()
