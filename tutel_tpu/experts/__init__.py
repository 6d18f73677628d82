"""Pluggable expert registry (reference: tutel/impls/moe_layer.py:160-189)."""

from . import ffn  # noqa: F401
from . import llama_ffn  # noqa: F401

_REGISTRY = {
    "ffn": ffn.ExpertModule,
    "llama_ffn": llama_ffn.ExpertModule,
}


def register(name, expert_cls):
    _REGISTRY[name] = expert_cls


def resolve(name):
    if name not in _REGISTRY:
        raise Exception("Builtin expert type is not recognized: %s" % name)
    return _REGISTRY[name]
