"""Device-mesh construction for the (data, model) 2-D SPMD layout.

The reference builds explicit NCCL process groups for tensor/pipeline/data
parallelism (reference: initialize.py:107-169, mpu.initialize_model_parallel).
TPU-natively the same structure is a single ``jax.sharding.Mesh`` with named
axes; GSPMD emits the collectives that Megatron hand-codes.

Axis conventions used throughout the framework:

- ``data``:  batch dimension sharding + optimizer-state sharding (ZeRO-1
  equivalent; reference: utils.py:483-562 DeepSpeed config).
- ``model``: tensor-parallel sharding of attention heads / MLP hidden /
  vocab (reference: megatron_util mpu Column/Row/VocabParallel layers,
  modeling_distributed_gpt3.py:843-857).

The mesh is laid out so that the ``model`` axis varies fastest over devices,
keeping TP collectives on the densest ICI links (same recipe as the
scaling-book: model axis inner, data axis outer, DCN only across slices).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Parallelism degrees. -1 for ``data`` means "all remaining devices"."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        model = self.model if self.model > 0 else 1
        data = self.data
        if data <= 0:
            if n_devices % model != 0:
                raise ValueError(
                    f"n_devices={n_devices} not divisible by model={model}")
            data = n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != n_devices {n_devices}")
        return MeshConfig(data=data, model=model)


def make_mesh(
    config: MeshConfig | None = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2-D (data, model) mesh over the given (or all) devices.

    Uses ``mesh_utils.create_device_mesh`` when possible so the model axis
    maps onto physically adjacent chips (ICI-contiguous), falling back to a
    plain reshape for host-platform (CPU-simulated) devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    cfg = (config or MeshConfig()).resolve(len(devices))
    shape = (cfg.data, cfg.model)
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=axis_names)


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-host batch size when the batch is sharded over the data axis."""
    data = mesh.shape[DATA_AXIS]
    if global_batch_size % data != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data={data}")
    n_hosts = max(1, jax.process_count())
    per_host = global_batch_size // n_hosts
    if global_batch_size % n_hosts != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by hosts={n_hosts}")
    return per_host


def distributed_init(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (reference NCCL rendezvous: initialize.py:134-141).

    On a single host this is a no-op; under a TPU pod runtime jax picks
    everything up from the environment.
    """
    if num_processes is not None and num_processes > 1:
        try:
            # multi-process CPU (simulation/tests) needs a cross-process
            # collectives backend; TPU pods ignore this
            if "cpu" in str(jax.config.jax_platforms or ""):
                jax.config.update("jax_cpu_collectives_implementation",
                                  "gloo")
        except Exception:
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def mfu(flops_per_step: float, step_time_s: float,
        peak_flops: float | None = None) -> float:
    """Model-flops-utilization given per-step model flops and step time."""
    if peak_flops is None:
        peak_flops = device_peak_flops() * jax.device_count()
    return flops_per_step / (step_time_s * peak_flops)


_PEAK_FLOPS_BF16 = {
    # chip kind substring -> peak bf16 FLOP/s per chip
    "v5 lite": 197e12,   # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,        # trillium
    "v3": 123e12,
    "v2": 45e12,
}


def device_peak_flops(device: jax.Device | None = None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, flops in _PEAK_FLOPS_BF16.items():
        if key in kind:
            return flops
    return 197e12  # assume v5e-class if unknown
