"""Parallelism building blocks: the MoE device mesh and the (beyond-
reference) GPipe pipeline schedule."""

from .mesh import MoeMesh, HierarchicalMesh, default_devices, \
    infer_num_hosts
from .pipeline import pipeline, pipeline_1f1b, stack_stage_params

__all__ = [
    "MoeMesh", "HierarchicalMesh", "default_devices", "infer_num_hosts",
    "pipeline", "pipeline_1f1b", "stack_stage_params",
]
