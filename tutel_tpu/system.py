"""Session bootstrap, timing and path utilities.

TPU-native counterpart of the reference's `tutel.system`
(reference: tutel/system.py:10-104). Under JAX SPMD one process drives many
devices, so "rank" concepts map to (process_index, device mesh position);
`init_data_model_parallel` becomes: pick devices, record the data x model
group factoring, and hand out mesh builders. NUMA pinning / CUDA sandboxing
(reference system.py:10-25, launcher/execl.py) have no TPU equivalent — the
TPU runtime owns core placement.
"""

import dataclasses
import os
import re
import time
from typing import Optional, Sequence

import jax

from .parallel import mesh as mesh_lib


@dataclasses.dataclass
class ParallelEnv:
    """Session object (reference DistributedProperties,
    communicate.py:120-146)."""
    devices: tuple
    global_size: int
    group_count: int          # number of data-parallel groups
    model_size: int           # devices per group
    global_rank: int          # this process's index (0 in single-process)
    is_distributed: bool

    def dist_print(self, *args):
        if self.global_rank == 0:
            print(*args)

    def moe_mesh(self, num_global_experts: int,
                 adaptive_r: int = 1) -> mesh_lib.MoeMesh:
        w = self.global_size
        sharded = max(1, w // num_global_experts) if num_global_experts < w else 1
        return mesh_lib.MoeMesh(
            devices=self.devices,
            num_expert_groups=w // sharded,
            sharded_count=sharded,
            adaptive_r=min(adaptive_r, sharded) if adaptive_r else 0,
        )

    def hierarchical_mesh(self, num_hosts: Optional[int] = None):
        hosts = num_hosts or mesh_lib.infer_num_hosts(self.devices)
        return mesh_lib.HierarchicalMesh(self.devices, hosts)


_LOCAL_SESSION = None


def init_data_model_parallel(group_count=1, backend=None,
                             devices: Optional[Sequence] = None) -> ParallelEnv:
    """Create the session (reference system.py:27-46).

    `backend` is accepted for signature parity and ignored (XLA picks the
    platform); `group_count` splits the world into data groups exactly like
    create_groups_from_world (reference communicate.py:89-97), including the
    negative convention: group_count=-k means groups of size k.
    """
    global _LOCAL_SESSION
    maybe_init_distributed()
    devices = tuple(devices if devices is not None else jax.devices())
    world = len(devices)
    if group_count < 0:
        group_count = world // -group_count
    assert group_count > 0 and world % group_count == 0, (
        f"Expected to evenly divide {world} devices into {group_count} groups.")
    env = ParallelEnv(
        devices=devices,
        global_size=world,
        group_count=group_count,
        model_size=world // group_count,
        global_rank=jax.process_index(),
        is_distributed=world > 1,
    )
    _LOCAL_SESSION = env
    return env


_DISTRIBUTED_READY = False


def maybe_init_distributed():
    """Multi-host bootstrap from launcher env (tutel_tpu.launcher.run).

    The reference rendezvouses via torch.distributed + manual NCCL comm
    init (reference communicate.py:67-77, custom_kernel.cpp:354-431); here
    one `jax.distributed.initialize` gives every process the global device
    view and XLA owns the collectives."""
    global _DISTRIBUTED_READY
    if _DISTRIBUTED_READY or not os.environ.get("TUTEL_TPU_AUTO_DISTRIBUTED"):
        return
    _DISTRIBUTED_READY = True
    coord = os.environ.get("TUTEL_TPU_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["TUTEL_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["TUTEL_TPU_PROCESS_ID"]))
    else:
        jax.distributed.initialize()


def get_local_session() -> ParallelEnv:
    global _LOCAL_SESSION
    if _LOCAL_SESSION is None:
        _LOCAL_SESSION = init_data_model_parallel()
    return _LOCAL_SESSION


# ---------------------------------------------------------------------------
# Timing (reference system.py:73-79: wall clock with device sync)
# ---------------------------------------------------------------------------

def record_time(sync_value=None):
    """Wall time after draining outstanding device work. Pass the most
    recent output array(s) to block on; with None, blocks on all devices'
    async dispatch via a trivial barrier."""
    if sync_value is not None:
        jax.block_until_ready(sync_value)
    else:
        jax.effects_barrier()
    return time.perf_counter()


import contextlib


@contextlib.contextmanager
def profile_trace(log_dir):
    """Capture a device profile for the enclosed region
    (SURVEY.md section 5: the reference has only wall timers,
    reference system.py:73-79; on TPU `jax.profiler` gives the full
    timeline — view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.effects_barrier()
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# {rank}/{size} path templating (reference system.py:92-104)
# ---------------------------------------------------------------------------

def apply_rank_size_from_pattern(pattern, rank, size):
    original = pattern
    pattern = pattern.replace("{rank}", str(rank)).replace("{size}", str(size))
    if re.search(r"\{rank\}|\{size\}", original) is None and size > 1:
        raise ValueError(
            "checkpoint path must contain {rank}/{size} patterns for "
            "multi-file checkpoints: %s" % original)
    return pattern


# ---------------------------------------------------------------------------
# Global KV cache (reference system.py:48-66, used for l_aux collection)
# ---------------------------------------------------------------------------

_CACHE = {}


def cache(key, default=None):
    return _CACHE.setdefault(key, default)


def cache_set(key, value):
    _CACHE[key] = value
    return value


def cache_clear():
    _CACHE.clear()


# ---------------------------------------------------------------------------
# Tensor save/load (reference system.py:81-90 torch.save/load wrappers)
# ---------------------------------------------------------------------------

def save(t, path):
    import numpy as np
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.save(path if path.endswith(".npy") else path + ".npy",
            np.asarray(jax.device_get(t)))


def load(path, device=None):
    import numpy as np
    arr = np.load(path if path.endswith(".npy") else path + ".npy")
    import jax.numpy as jnp
    x = jnp.asarray(arr)
    return jax.device_put(x, device) if device is not None else x


def init_affinity_at_program_beginning():
    """No-op on TPU (reference system.py:10-25 pins NUMA affinity for GPU
    worker processes; the TPU runtime owns core placement)."""
    return None
