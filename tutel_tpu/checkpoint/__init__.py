"""Elastic checkpointing: save/load + offline world-size mutation
(reference: tutel/checkpoint/, doc/CHECKPOINT.md)."""

from . import serial, reshard  # noqa: F401
from .serial import save_state, load_state  # noqa: F401
from .reshard import gather_states, scatter_state  # noqa: F401
