"""Core MoE compute ops: routing, dispatch, grouped GEMM, losses, quant."""

from . import losses  # noqa: F401
from . import routing  # noqa: F401
from . import dispatch  # noqa: F401
from .routing import extract_critical, RoutingResult  # noqa: F401
from .dispatch import fast_encode, fast_decode  # noqa: F401
from .losses import gshard_loss, load_importance_loss  # noqa: F401
from . import quant  # noqa: F401
from .quant import QuantizedWeight, quantize, dequantize  # noqa: F401
from . import ragged  # noqa: F401
from . import grouped_gemm  # noqa: F401
