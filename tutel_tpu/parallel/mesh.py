"""Device-mesh session management.

TPU-native replacement for the reference's process-group machinery
(reference: tutel/impls/communicate.py:49-168 `create_groups_from_world` and
custom NCCL comm bootstrap). Under JAX SPMD there are no per-rank process
groups: parallel structure is a `jax.sharding.Mesh` over the device array,
and "groups" are mesh axes. This module provides:

  * `MoeMesh` — the expert-parallel mesh for one MoE world: axes
    ('e', 'r', 'g') where e = expert-parallel groups, and (r, g) factor the
    per-expert shard ranks (sharded_count = r * g). The flat token/EP axis is
    the tuple ('e', 'r', 'g'); adaptive-r weight regathering all-gathers over
    'g' only (reference experts/ffn.py:95-102's ffn_zero_group).
  * hierarchy-aware factoring for the 2DH all-to-all: an optional
    ('dcn', 'ici') outer factoring of the same devices
    (reference custom_kernel.cpp:656-738).

Device order is always row-major over the flat device list, matching the
reference's consecutive-rank model groups (communicate.py:104-107).
"""

import dataclasses
from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def default_devices():
    return jax.devices()


@dataclasses.dataclass(frozen=True)
class MoeMesh:
    """A (possibly re-factorable) expert-parallel device mesh."""
    devices: tuple                      # flat device tuple, canonical order
    num_expert_groups: int              # e axis size
    sharded_count: int                  # r*g total ranks sharing one expert
    adaptive_r: int = 1                 # r axis size (weights replicated r x)

    def __post_init__(self):
        w = len(self.devices)
        assert self.num_expert_groups * self.sharded_count == w, (
            f"mesh factoring {self.num_expert_groups}x{self.sharded_count} "
            f"!= {w} devices")
        assert self.sharded_count % self.adaptive_r == 0

    @property
    def world_size(self):
        return len(self.devices)

    @property
    def gather_group_size(self):
        return self.sharded_count // self.adaptive_r

    def build(self) -> Mesh:
        arr = np.asarray(self.devices, dtype=object).reshape(
            self.num_expert_groups, self.adaptive_r, self.gather_group_size)
        return Mesh(arr, ("e", "r", "g"))

    def with_adaptive_r(self, r: int) -> "MoeMesh":
        return dataclasses.replace(self, adaptive_r=r)

    # Flat token / EP axis: all three axes, e-major (matches the reference's
    # rank ordering where an expert's shard ranks are consecutive).
    EP_AXES = ("e", "r", "g")


@dataclasses.dataclass(frozen=True)
class HierarchicalMesh:
    """('dcn', 'ici') factoring of the same flat device order, used by the
    2DH all-to-all (reference custom_kernel.cpp:656-738: inter-node x
    intra-node phases)."""
    devices: tuple
    num_hosts: int                      # dcn axis size

    def build(self) -> Mesh:
        w = len(self.devices)
        assert w % self.num_hosts == 0
        arr = np.asarray(self.devices, dtype=object).reshape(
            self.num_hosts, w // self.num_hosts)
        return Mesh(arr, ("dcn", "ici"))


def infer_num_hosts(devices: Sequence) -> int:
    """Number of distinct hosts among devices (dcn axis size)."""
    hosts = {getattr(d, "process_index", 0) for d in devices}
    return max(1, len(hosts))
