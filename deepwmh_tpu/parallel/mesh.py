"""Device mesh / distributed runtime helpers.

The reference's only 'distribution' is a shared filesystem plus manually
launched shards (SURVEY.md §2.2). The TPU framework's equivalents:

- data-parallel training over a `jax.sharding.Mesh` (unet/train.py — XLA
  inserts the gradient all-reduce over ICI),
- sharded sliding-window inference (parallel/infer_sharded.py — patch
  positions split across the dp axis, partial Gaussian accumulators summed
  with one psum),
- `init_distributed()` for multi-host pods (jax.distributed over DCN),
- subject-level fan-out stays embarrassingly parallel: shards of the
  registration pair list via `--distributed a/b` exactly like the reference.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int = None, axis: str = "dp", local: bool = False):
    """A 1-D data-parallel mesh over the first n (or all) devices.

    local=True restricts to jax.local_devices() — required for
    single-process CLIs (e.g. DeepWMH_predict --mesh) where a global mesh
    on a multi-host pod would contain non-addressable devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None):
    """Initialize jax.distributed for multi-host execution (DCN). No-op for
    single-process runs."""
    import jax

    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def init_distributed_from_env() -> bool:
    """CLI hook: initialize jax.distributed when the environment carries the
    multi-host contract (mirrors the reference's env-var configuration
    style, SURVEY.md §5):

      DEEPWMH_COORDINATOR   host:port of process 0
      DEEPWMH_NUM_PROCESSES total process count
      DEEPWMH_PROCESS_ID    this process's rank

    Returns True when distributed mode was initialized. Tested end-to-end
    with 2 CPU processes + gloo collectives in tests/test_distributed.py."""
    import os

    num = os.environ.get("DEEPWMH_NUM_PROCESSES")
    if not num:
        return False
    pid = os.environ.get("DEEPWMH_PROCESS_ID")
    if int(num) > 1 and pid is None:
        # defaulting the rank to 0 would make every host claim rank 0 and
        # hang the coordinator with no hint of the cause — fail fast
        raise ValueError(
            "DEEPWMH_NUM_PROCESSES=%s but DEEPWMH_PROCESS_ID is unset — "
            "every process must export its rank (0..%d)"
            % (num, int(num) - 1)
        )
    return init_distributed(
        coordinator=os.environ.get("DEEPWMH_COORDINATOR", "127.0.0.1:12355"),
        num_processes=int(num),
        process_id=int(pid or 0),
    )


def select_device(index: int):
    """Pin all subsequent (unsharded) computation to one local device —
    the TPU role of the reference's `-g` flag, which sets
    CUDA_VISIBLE_DEVICES to pick the GPU (deepwmh/main/predict.py:150,
    DCNN_multistage.py:191). Lets N single-chip servers/CLIs share a
    multi-chip host, one chip each. Returns the selected device.

    Indexes jax.local_devices(): on a multi-host pod the flag picks among
    THIS host's chips (a remote device is not addressable as a default)."""
    import jax

    devs = jax.local_devices()
    if not 0 <= index < len(devs):
        raise ValueError(
            "device index %d out of range (0..%d local devices)"
            % (index, len(devs) - 1)
        )
    jax.config.update("jax_default_device", devs[index])
    return devs[index]


def device_info() -> dict:
    import jax

    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "process_count": jax.process_count(),
        "platforms": sorted({d.platform for d in devs}),
    }
