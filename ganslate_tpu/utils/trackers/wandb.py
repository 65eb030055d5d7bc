"""Weights & Biases sink. Reference parity:
/root/reference/ganslate/utils/trackers/wandb.py (resumable runs via `id`,
windowed image logging). The wandb package is optional; when unavailable this
tracker degrades to a logged warning so configs with `wandb:` still run."""

import logging

from ganslate_tpu.utils.trackers.utils import apply_image_window

logger = logging.getLogger(__name__)

try:
    import wandb as _wandb
except ImportError:
    _wandb = None


class WandbTracker:

    def __init__(self, conf):
        self.enabled = _wandb is not None
        mode = conf.mode
        self.image_window = conf[mode].logging.image_window
        if not self.enabled:
            logger.warning("wandb is not installed; WandbTracker is a no-op.")
            return

        wandb_conf = conf[mode].logging.wandb
        project = wandb_conf.project
        entity = wandb_conf.entity
        run_name = wandb_conf.run
        run_id = wandb_conf.id

        _wandb.init(project=project, entity=entity, name=run_name, id=run_id,
                    resume="allow" if run_id else None,
                    dir=str(conf[mode].output_dir),
                    config=conf.to_container(resolve=True))

    def log_iter(self, iter_idx, visuals=None, mode="train", learning_rates=None,
                 losses=None, metrics=None):
        if not self.enabled:
            return
        log_dict = {"iter_idx": iter_idx}
        for group, values in (("losses", losses), ("metrics", metrics),
                              ("learning_rates", learning_rates)):
            if values:
                for name, value in values.items():
                    log_dict[f"{mode}/{group}/{name}"] = float(value)
        if visuals:
            if isinstance(visuals, dict):
                visuals = [visuals]
            images = [_wandb.Image(apply_image_window(v["image"], self.image_window),
                                   caption=v["name"]) for v in visuals]
            log_dict[f"{mode}/visuals"] = images
        _wandb.log(log_dict)
