"""Weight-only INT8 / INT4 quantization for expert weights.

North-star extension over the reference (which ships fp16/fp32 experts only;
its megablocks path is fp-only — reference tutel/custom/custom_kernel.cpp:
874-889). Scheme:

  * symmetric per-(expert, output-channel) scales: q = round(w / s),
    s = max|w| / qmax over the contraction axis, so dequant is a cheap
    post-GEMM column scale (mathematically exact: int values are exactly
    representable in bf16, so `x @ q * s == x @ (q * s)` up to f32 accum).
  * INT4 packs two values per int8 byte in *split-half* order along the
    contraction axis: packed[k] holds w[k] in the low nibble and
    w[k + K/2] in the high nibble. Unpacking a full-K tile is then just
    `concat(low_nibbles, high_nibbles, axis=0)` — no row interleave, no
    TPU relayout.

The fused dequant+GEMM kernel lives in ops/grouped_gemm_pallas.py.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("values", "scales"),
    meta_fields=("bits", "orig_k", "blocks"),
)
@dataclasses.dataclass(frozen=True)
class QuantizedWeight:
    """Per-expert quantized weight of logical shape [E, K, N].

    values: int8 [E, K, N] (bits=8) or [E, K//2, N] nibble-packed (bits=4).
    scales: f32 [E, 1, N] per-output-channel symmetric scales.
    """
    values: jnp.ndarray
    scales: jnp.ndarray
    bits: int
    orig_k: int                    # K at quantize time (global view)
    blocks: int = 1                # INT4 split-half packing block count

    @property
    def shape(self):
        # K derives from the values actually held: inside a shard_map a
        # TP-sliced weight sees its local K, not the global orig_k.
        k = self.values.shape[1] * (2 if self.bits == 4 else 1)
        return (self.values.shape[0], k, self.values.shape[2])

    @property
    def ndim(self):
        return 3


def quantize(w, bits=8, shard_blocks=1):
    """Quantize [E, K, N] (or [K, N]) weights to INT8/INT4.

    Returns a QuantizedWeight with the same leading expert dim (a [K, N]
    input is treated as E=1 and squeezed back on dequant by shape).

    shard_blocks: for INT4 weights whose K dim will be TP-sliced into
    `shard_blocks` contiguous slices (expert-slicing model parallelism),
    the split-half nibble packing is applied *within each block*, so a
    packed-row slice of size K/(2*shard_blocks) is exactly the split-half
    packing of that shard's local K range — slicing and unpacking
    commute. shard_blocks=1 is the plain global packing.
    """
    assert bits in (8, 4), f"unsupported bit width: {bits}"
    squeeze = w.ndim == 2
    if squeeze:
        w = w[None]
    e, k, n = w.shape
    qmax = 127.0 if bits == 8 else 7.0
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)       # [E, 1, N]
    scales = jnp.where(absmax > 0, absmax / qmax, 1.0)
    q = jnp.clip(jnp.round(w32 / scales), -qmax - 1, qmax).astype(jnp.int8)
    if bits == 4:
        assert k % (2 * shard_blocks) == 0, (
            f"INT4 needs K divisible by 2*shard_blocks, got {k} / "
            f"{shard_blocks}")
        qb = q.reshape(e, shard_blocks, k // shard_blocks, n)
        half = k // (2 * shard_blocks)
        low = qb[:, :, :half, :].astype(jnp.int32) & 0xF
        high = (qb[:, :, half:, :].astype(jnp.int32) & 0xF) << 4
        q = (low | high).astype(jnp.int8).reshape(e, k // 2, n)
    return QuantizedWeight(values=q, scales=scales, bits=bits,
                           orig_k=k, blocks=shard_blocks)


def unpack_int4(packed, blocks=1):
    """[.., K//2, N] packed int8 -> [.., K, N] int8 in [-8, 7].

    Split-half order within each of `blocks` contiguous K-blocks
    (blocks=1 is the plain global split-half packing)."""
    lead = packed.shape[:-2]
    kp, n = packed.shape[-2:]
    v = packed.reshape(lead + (blocks, kp // blocks, n)).astype(jnp.int32)
    low = (v << 28) >> 28          # sign-extend low nibble
    high = v >> 4                  # arithmetic shift sign-extends high nibble
    out = jnp.concatenate([low, high], axis=-2)
    return out.reshape(lead + (2 * kp, n)).astype(jnp.int8)


def dequantize(qw: QuantizedWeight, dtype=jnp.float32):
    """Reference dequantization to a dense [E, K, N] array."""
    q = qw.values if qw.bits == 8 else unpack_int4(qw.values, qw.blocks)
    return (q.astype(jnp.float32) * qw.scales).astype(dtype)


def quantize_expert_params(params, bits=8, keys=("fc1_w", "fc2_w",
                                                 "w1", "w2", "w3"),
                           sharded_count=1,
                           k_sliced=("fc2_w", "w3")):
    """Quantize the weight matrices of an expert param dict; biases and
    unknown entries pass through unchanged.

    sharded_count > 1 prepares the weights for expert-slicing TP: the
    contraction-sliced matrices (`k_sliced`; the layer shards their K
    dim) get block-wise INT4 packing so per-shard slices stay
    self-contained (see `quantize`)."""
    out = {}
    for name, p in params.items():
        if name in keys and not isinstance(p, QuantizedWeight) and p.ndim == 3:
            blocks = sharded_count if (bits == 4 and name in k_sliced
                                       and sharded_count > 1) else 1
            out[name] = quantize(p, bits=bits, shard_blocks=blocks)
        else:
            out[name] = p
    return out
