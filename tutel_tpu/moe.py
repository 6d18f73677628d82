"""Public MoE facade (reference: tutel/moe.py:6-12)."""

from .impls.moe_layer import moe_layer, MOELayer  # noqa: F401
from .ops.routing import extract_critical  # noqa: F401
from .ops.dispatch import fast_encode, fast_decode  # noqa: F401
from .ops.routing import RoutingResult  # noqa: F401


def top_k_routing(scores, top_k, capacity, **kwargs):
    """Convenience alias (reference exports extract_critical as
    top_k_routing)."""
    return extract_critical(scores, top_k, capacity, **kwargs)

from .ops.routing import cumsum_sub_one as fast_cumsum_sub_one  # noqa: F401,E402
from .ops.dispatch import fast_dispatcher, TutelMoeFastDispatcher  # noqa: F401,E402
from .ops.expert_choice import (  # noqa: F401,E402
    expert_choice_routing, ec_encode, ec_decode, router_z_loss)
