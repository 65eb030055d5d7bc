"""Process environment: logging, seeding, host-thread hygiene.

Reference parity: `/root/reference/ganslate/utils/environment.py` (loguru
rank-aware logging, torch/np/random seeding, SimpleITK/OpenCV thread pinning).
TPU version uses stdlib logging (loguru is not available), seeds numpy/random
plus the JAX PRNG key root, and pins OpenCV threads so host data workers don't
oversubscribe cores that XLA's compiler and runtime need.
"""

import logging
import os
import random
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from ganslate_tpu.utils import communication, io

logger = logging.getLogger("ganslate_tpu")

_LOG_FORMAT = "[%(asctime)s][%(name)s][%(levelname)s] - %(message)s"
_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"


def setup_logging(use_stdout: bool = True,
                  filename: Optional[os.PathLike] = None,
                  log_level: str = "INFO") -> None:
    if log_level not in ["DEBUG", "INFO", "WARNING", "ERROR"]:
        raise ValueError(f"Unexpected log level, got {log_level}.")

    root = logging.getLogger()
    for handler in list(root.handlers):
        root.removeHandler(handler)
    root.setLevel(log_level)

    formatter = logging.Formatter(_LOG_FORMAT, datefmt=_DATE_FORMAT)
    if use_stdout:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(formatter)
        root.addHandler(sh)
    if filename is not None:
        fh = logging.FileHandler(filename)
        fh.setFormatter(formatter)
        root.addHandler(fh)


def setup_logging_with_config(conf, debug: bool = False) -> None:
    output_dir = Path(conf[conf.mode].output_dir).resolve()
    io.mkdirs(output_dir)

    filename = None
    if communication.get_rank() == 0:
        filename = output_dir / f"{conf.mode}_log.txt"
    use_stdout = communication.get_local_rank() == 0 or debug
    setup_logging(use_stdout, filename, log_level="DEBUG" if debug else "INFO")

    import jax
    logger.info(f"Configuration:\n{conf.to_yaml()}")
    logger.info(f"Saving checkpoints, logs and config to: {output_dir}")
    logger.info(f"Python version: {sys.version.strip()}")
    logger.info(f"JAX version: {jax.__version__}")
    logger.info(f"Devices: {jax.devices()}")
    logger.info(f"Global rank: {communication.get_rank()}")


def set_seed(seed: int = 0) -> None:
    """Seed host RNGs. Device-side randomness is keyed `jax.random` carried in
    train state; engines derive the root key from this seed."""
    logger.info(f"Reproducible mode ON with seed : {seed}")
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def setup_threading() -> None:
    """Pin host-side image libraries to 1 thread; data-plane parallelism comes
    from the loader's worker threads, not intra-op threads."""
    try:
        import cv2
        cv2.setNumThreads(1)
    except ImportError:
        pass
