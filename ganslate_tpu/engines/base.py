"""Engine bases: mode isolation + the shared inference path.

Reference parity: /root/reference/ganslate/engines/base.py — conf deep-copy
with per-engine mode, sliding-window-or-direct inference dispatch, and
dataset-`save()` output dispatch with decollated per-sample metadata.
"""

import copy
import logging
from abc import ABC, abstractmethod
from pathlib import Path

from ganslate_tpu.utils.io import decollate
from ganslate_tpu.utils.sliding_window_inferer import SlidingWindowInferer

logger = logging.getLogger(__name__)


class BaseEngine(ABC):

    def __init__(self, conf):
        # Deep copy isolates this engine's conf.mode from other engines.
        self.conf = copy.deepcopy(conf)
        self._set_mode()

        self.output_dir = Path(conf[conf.mode].output_dir) / self.conf.mode
        self.model = None
        self.logger = logger

    @abstractmethod
    def _set_mode(self):
        """Set self.conf.mode for this engine ('train', 'val', ...)."""


class BaseEngineWithInference(BaseEngine):

    def __init__(self, conf):
        super().__init__(conf)
        self.sliding_window_inferer = self._init_sliding_window_inferer()
        mode_conf = self.conf[self.conf.mode]
        self.spatial_sharding = mode_conf.spatial_sharding \
            if "spatial_sharding" in mode_conf else None
        assert not (self.sliding_window_inferer and self.spatial_sharding), \
            "Use either sliding_window or spatial_sharding, not both."
        # bf16 wire format (InferenceConfig.wire_dtype): inputs cross
        # host->device as bf16 (bit-identical to the in-network cast) and
        # predictions come back bf16 — half the bytes on a transport-bound
        # serving path. Modes without the config field (val/test) keep fp32.
        self.wire_dtype = str(mode_conf.wire_dtype) \
            if "wire_dtype" in mode_conf else "float32"
        if self.wire_dtype == "bfloat16":
            self.logger.info(
                "Serving wire format: bfloat16 (halved host<->device "
                "transfer bytes; saved outputs keep the fp32 blend's value "
                "to bf16 precision). Set wire_dtype=float32 in the mode "
                "config for full-precision transfers.")

    def infer(self, data, *args, **kwargs):
        from ganslate_tpu.parallel import get_mesh, shard_batch
        data = self._to_wire(data)
        if self.sliding_window_inferer:
            data = shard_batch({"x": data})["x"]
            fn, params = self.model.get_pure_infer(*args, **kwargs)
            out = self.sliding_window_inferer(data, fn, params)
        elif self.spatial_sharding and get_mesh().devices.size > 1:
            # Full-volume inference sharded over the mesh (config:
            # spatial_sharding.{method,halo,dim}; parallel/spatial.py):
            # 'gspmd' = XLA-partitioned, exact incl. global norm stats;
            # 'halo' = manual neighbor halo exchange.
            import jax.numpy as jnp
            from ganslate_tpu.parallel import spatial
            fn, params = self.model.get_pure_infer(*args, **kwargs)
            dim = self.spatial_sharding.dim + 1  # +1: batch dim first
            if getattr(self.spatial_sharding, "method", "gspmd") == "gspmd":
                out = spatial.spatially_sharded_infer_gspmd(
                    fn, params, jnp.asarray(data), get_mesh(), dim=dim)
            else:
                out = spatial.spatially_sharded_infer(
                    fn, params, jnp.asarray(data), get_mesh(),
                    halo=self.spatial_sharding.halo, dim=dim)
        else:
            data = shard_batch({"x": data})["x"]
            out = self.model.infer(data, *args, **kwargs)
        return self._from_wire(out)

    def _to_wire(self, data):
        """Down-cast before the H2D transfer. fp32->bf16 here is
        bit-identical to the cast the network applies on device, so the
        computation is unchanged — only the wire bytes halve. Inputs that
        are ALREADY device-resident cast on device instead: pulling them to
        the host for the cast would pay the very fp32 round-trip this
        format exists to avoid."""
        if self.wire_dtype != "bfloat16":
            return data
        import jax
        import jax.numpy as jnp
        if isinstance(data, jax.Array):
            return data.astype(jnp.bfloat16) \
                if data.dtype == jnp.float32 else data
        import ml_dtypes
        import numpy as np
        data = np.asarray(data)
        return data.astype(ml_dtypes.bfloat16) \
            if data.dtype == np.float32 else data

    def _from_wire(self, out):
        """Device-side down-cast before the D2H transfer (one tiny compiled
        convert; the caller upcasts on host). The fp32 blend still ran at
        full precision — only sub-bf16 bits of the final volume are wire
        losses."""
        if self.wire_dtype != "bfloat16":
            return out
        import jax.numpy as jnp
        return out.astype(jnp.bfloat16)

    def _init_sliding_window_inferer(self):
        sw = self.conf[self.conf.mode].sliding_window \
            if "sliding_window" in self.conf[self.conf.mode] else None
        if not sw:
            return None
        return SlidingWindowInferer(roi_size=tuple(sw.window_size),
                                    sw_batch_size=sw.batch_size,
                                    overlap=sw.overlap,
                                    mode=sw.mode,
                                    cval=-1.0)

    def save_generated_tensor(self, generated_tensor, metadata, data_loader,
                              idx=None, dataset_name=None):
        """Dispatch outputs to the dataset's `save()` when it defines one."""
        save_fn = getattr(data_loader.dataset, "save", False)
        if not save_fn:
            return

        def save(tensor, save_dir, metadata=None):
            if metadata is None:
                save_fn(tensor=tensor, save_dir=save_dir)
            else:
                save_fn(tensor=tensor, save_dir=save_dir, metadata=metadata)

        save_dir = "saved/"
        if dataset_name is not None:
            save_dir += f"{dataset_name}/"
        if idx is not None:
            save_dir += f"{idx}/"
        save_dir = self.output_dir / save_dir

        if metadata:
            metadata = decollate(metadata, batch_size=len(generated_tensor))

        import numpy as np
        generated_tensor = np.asarray(generated_tensor)
        for batch_idx in range(len(generated_tensor)):
            current_metadata = metadata[batch_idx] if metadata is not None else None
            save(tensor=generated_tensor[batch_idx], save_dir=save_dir,
                 metadata=current_metadata)
