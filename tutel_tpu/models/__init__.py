"""Model families built on the MoE layer.

The reference integrates MoE into models externally (a fairseq patch
converting every MOE-th decoder FFN into a `moe_layer`,
reference examples/fairseq_moe/fairseq_patch.diff:44-54); here the
Transformer-MoE LM is a first-class model family.
"""

from . import transformer  # noqa: F401
from .transformer import TransformerMoEConfig, TransformerMoE  # noqa: F401
from . import vision  # noqa: F401
from .vision import VisionMoEConfig, VisionMoE  # noqa: F401
