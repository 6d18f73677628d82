"""Pluggable gate registry (reference: tutel/impls/moe_layer.py:206-230).

Gates are addressed by name ('top', 'cosine_top') or by a 'custom' class,
mirroring the reference's importlib-by-name protocol.
"""

from . import top  # noqa: F401
from . import cosine_top  # noqa: F401
from . import expert_choice  # noqa: F401

_REGISTRY = {
    "top": top.Gate,
    "cosine_top": cosine_top.Gate,
    "expert_choice": expert_choice.Gate,
}


def register(name, gate_cls):
    _REGISTRY[name] = gate_cls


def resolve(name):
    if name not in _REGISTRY:
        raise Exception("Unrecognized gate_type: %s" % name)
    return _REGISTRY[name]
