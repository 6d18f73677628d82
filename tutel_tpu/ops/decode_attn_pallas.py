"""Fused decode attention (flash-decode) Pallas kernel.

The LM serving hot path reads each row's K/V cache window every decode
step. XLA's lowering of the windowed one-token attention (slice +
batched matvec einsums, models/transformer.py `_attn_step`) measured
~215-240 us/step/layer on v5e at B=64, window 336 — 2.2x the ~107 us
HBM roofline of the 88 MB K+V read, because the strided window slice is
materialized instead of streamed into the dots. This kernel streams
each row's window through VMEM exactly once: grid (B, W/wc), online-
softmax (flash) accumulation in VMEM scratch, and both the score and
the combine ride the MXU over the [wc, D] cache slab via a block-
diagonal q layout (one dot per slab instead of NH batched matvecs).

Reference parity note: the reference has no serving attention kernel —
this is a beyond-reference TPU-native addition feeding `LmDecodeEngine`
(reference tutel/examples — no serving engine; see SURVEY.md §2).

Layout:
  q   [B, NH, HD]      one query token per row
  k,v [B, T, NH, HD]   KV cache (only the first `attn_len` positions
                       are read — exact when every live pos < attn_len,
                       because later positions are masked to zero
                       probability either way)
  pos [B] int32        per-row current position (mask: t <= pos)
  out [B, NH, HD]

The block-diagonal trick: scores[w, nh] = K[w] . qbd[nh] where
qbd[nh, nh*HD:(nh+1)*HD] = q[nh] (zeros elsewhere), so the whole-slab
dot contracts D at once; the combine dot(p [wc, NH], V [wc, D]) gives
[NH, D] whose block-diagonal slices are the per-head outputs. The
NH-fold FLOP waste is irrelevant: the step is HBM-bound (the two dots
are ~11 MFLOP/row against 1.4 MB of DMA).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack4_slab(packed, compute_t):
    """[wc, D/2] int8 split-half-packed -> [wc, D] compute_t.

    Full-width split-half convention (the KV analogue of ops/quant.py's
    weight packing): byte column c holds logical value column c in its
    LOW nibble and column c + D/2 in its HIGH nibble, so the unpack is
    one lane-dim concat — no interleave relayout. The nibble shifts run
    in the int32 domain (Mosaic rejects i8/i16 shifts; values are
    exact in bf16 up to +-7)."""
    v = packed.astype(jnp.int32)
    low = (v << 28) >> 28                                  # sign-extend
    high = v >> 4
    return jnp.concatenate([low, high], axis=-1).astype(compute_t)


def _decode_attn_kernel(pos_ref, qbd_ref, k_ref, v_ref, *rest, wc,
                        n_chunks, nh, hd, mq, scale, out_dtype,
                        quantized, pack4, fresh):
    if fresh:
        sn_ref, vn_ref, vsn_ref, *rest = rest
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, z_ref = rest
    else:
        o_ref, acc_ref, m_ref, z_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    p = pos_ref[b]

    @pl.when(j == 0)
    def _init():
        if fresh:
            # the CURRENT token's K/V never round-trip through the
            # cache: its (stored-precision) score and V row seed the
            # online softmax directly — m = s_fresh, z = exp(0) = 1,
            # acc[h, :] = vs_fresh[h] * v_fresh (wrong-group columns
            # get head h's scale, but the final block-diagonal select
            # discards them). This decouples the decode step's cache
            # WRITE from its attention READ, so all layers' writes
            # batch into one end-of-step RMW kernel
            # (models/transformer.py apply_decode).
            m_ref[...] = sn_ref[0]                       # [nh, 1]
            z_ref[...] = jnp.ones_like(z_ref)
            acc_ref[...] = (vsn_ref[0]
                            * vn_ref[0].astype(jnp.float32))
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            z_ref[...] = jnp.zeros_like(z_ref)

    # positions this chunk covers: j*wc + [0, wc). With a fresh token
    # the stored row at p is stale (or unwritten) and the fresh term
    # already covers it, so the mask is strict there.
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (nh, wc), 1) + j * wc
    live = (t_iota < p) if fresh else (t_iota <= p)

    # INT8/INT4 KV dequant rides the block-diagonal structure for free:
    # score row h only touches head h's columns, so the per-(pos, head)
    # K scale factors out of the dot as an elementwise [nh, wc] multiply
    # on the score tile; likewise the V scale folds into the softmax
    # weights e BEFORE the combine dot (columns of other heads get the
    # wrong scale, but the final block-diagonal select discards them).
    # The int8 slab is cast in VMEM (int8 is exact in bf16 up to 127);
    # the int4 slab additionally unpacks nibbles first (_unpack4_slab).
    compute_t = qbd_ref.dtype if quantized else k_ref.dtype
    if pack4:
        kslab = _unpack4_slab(k_ref[0], compute_t)
    elif quantized:
        kslab = k_ref[0].astype(compute_t)
    else:
        kslab = k_ref[0]

    # scores [nh, wc] = block-diag(q) . K-slab^T, f32 on the MXU.
    # GQA (mq = nh/kvh query heads per KV group, group of head h =
    # h % kvh): qbd places q_h at its GROUP's column block of the
    # kvh*hd-wide slab, and the per-group scale/output tiles below
    # expand to nh rows with jnp.tile — row h of tile(x, (mq, 1)) is
    # exactly x[h % kvh].
    s = jax.lax.dot_general(
        qbd_ref[0], kslab, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if quantized:
        ks = ks_ref[0]                                    # [kvh, wc]
        s = s * (jnp.tile(ks, (mq, 1)) if mq > 1 else ks)
    s = jnp.where(live, s, -1e30)

    # online softmax: rescale the running accumulator by exp(m_old-m_new)
    m_old = m_ref[...]                                    # [nh, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_old - m_new)                         # [nh, 1]
    e = jnp.exp(s - m_new)                                # [nh, wc]
    e = jnp.where(live, e, 0.0)
    m_ref[...] = m_new
    z_ref[...] = z_ref[...] * corr + jnp.sum(e, axis=1, keepdims=True)
    # combine: dot(p, V-slab) -> [nh, Dkv]; rescale old acc first
    if quantized:
        vs = vs_ref[0]                                    # [kvh, wc]
        ev = e * (jnp.tile(vs, (mq, 1)) if mq > 1 else vs)
    else:
        ev = e
    if pack4:
        vslab = _unpack4_slab(v_ref[0], compute_t)
    elif quantized:
        vslab = v_ref[0].astype(compute_t)
    else:
        vslab = v_ref[0]
    d = jax.lax.dot_general(
        ev.astype(compute_t), vslab, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [nh, Dkv]
    acc_ref[...] = acc_ref[...] * corr + d

    @pl.when(j == n_chunks - 1)
    def _finalize():
        z = jnp.maximum(z_ref[...], 1e-30)                # [nh, 1]
        a = acc_ref[...] / z                              # [nh, Dkv]
        # block-diagonal select: head h's output lives in its GROUP's
        # column block [g(h)*hd, (g(h)+1)*hd) of row h. Tiling the
        # Dkv-wide accumulator mq times gives [nh, nh*hd] whose column
        # c holds block (c//hd) % kvh — exactly g(h_c) under the
        # h % kvh group convention — so the plain head-diagonal mask
        # then selects the right block (mq=1 reduces to the MHA form).
        a_t = jnp.tile(a, (1, mq)) if mq > 1 else a       # [nh, nh*hd]
        row = jax.lax.broadcasted_iota(jnp.int32, (nh, nh * hd), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (nh, nh * hd), 1)
        diag = (c >= row * hd) & (c < (row + 1) * hd)
        o = jnp.sum(jnp.where(diag, a_t, 0.0), axis=0, keepdims=True)
        o_ref[0] = o.astype(out_dtype)


def decode_attn(q, k, v, pos, *, k_scale=None, v_scale=None,
                attn_len=None, wc=512, kv_bits=8, interpret=False,
                k_new=None, v_new=None, k_new_scale=None,
                v_new_scale=None):
    """One-token attention over the first `attn_len` cache positions.

    out[b, nh] = softmax_t(q[b, nh] . k[b, t, nh] / sqrt(hd)
                           | t <= pos[b]) . v[b, :, nh]

    Args:
      q: [B, NH, HD].
      k, v: the KV cache — [B, T, KVH, HD] or flat [B, T, KVH*HD]
        (the production layout; KVH == NH for MHA, a divisor of NH
        for grouped-query attention: query head h reads group
        h % KVH) in float, or int8 when k_scale / v_scale are
        given; with kv_bits=4 the cache is nibble-PACKED
        [B, T, KVH*HD//2] int8 in the full-width split-half layout
        (byte column c = value c low nibble | value c + D/2 high; see
        `_unpack4_slab`). Quantized modes halve / quarter the decode
        HBM bytes; dequant is an elementwise multiply on the
        score / softmax tiles (see the kernel comment).
      k_scale, v_scale: [B, KVH, T] f32 per-(head, position) symmetric
        scales for quantized k/v, or None for a float cache.
      pos: [B] int32; positions t > pos[b] are masked out.
      attn_len: static read bound (None = T). Exact whenever every
        row's pos < attn_len. Rounded up to a multiple of 16.
      wc: window chunk (VMEM slab length).
      kv_bits: 8 or 4 — quantized cache width (only read when scales
        are given).
      k_new, v_new: the CURRENT token's K/V row in the cache's stored
        form ([B, KVH*HD] float or int8; [B, KVH*HD//2] packed for
        kv_bits=4), with k_new_scale/v_new_scale [B, KVH] when
        quantized. When given, position pos[b] is NOT read from the
        cache: the fresh row seeds the online softmax (same
        stored-precision arithmetic, so the result matches a
        write-then-read decode step), and the caller may defer the
        actual cache write to an end-of-step batched kernel.
    Returns:
      [B, NH, HD] in q.dtype.
    """
    bsz, nh, hd = q.shape
    quantized = k_scale is not None
    pack4 = quantized and kv_bits == 4
    if pack4:
        _, t, dp = k.shape
        kvh = k_scale.shape[1]
        assert dp * 2 == kvh * hd, (k.shape, k_scale.shape, q.shape)
    elif k.ndim == 3:
        # flat slab [B, T, KVH*HD] — the production cache layout for
        # EVERY dtype (a tiled [.., KVH, HD] -> [.., KVH*HD] reshape
        # is a physical copy on TPU, so the cache stores the flat form)
        _, t, dflat = k.shape
        kvh = k_scale.shape[1] if quantized else dflat // hd
        assert dflat == kvh * hd, (k.shape, q.shape)
    else:
        _, t, kvh, hd2 = k.shape
        assert hd == hd2, (q.shape, k.shape)
    assert nh % kvh == 0, (q.shape, kvh)
    mq = nh // kvh
    if quantized:
        assert v_scale is not None and k.dtype == jnp.int8, (
            k.dtype, v_scale)
        assert k_scale.shape == (bsz, kvh, t), (k_scale.shape, k.shape)
    d = kvh * hd                 # K/V slab width (== nh*hd when MHA)
    dk = d // 2 if pack4 else d  # stored slab width (packed bytes)
    d_out = nh * hd
    # the quantized kernel's scale slabs are [nh, wc] blocks whose LAST
    # dim is wc — Mosaic requires lane dims be multiples of 128, so the
    # window and chunk align to 128 there (extra read positions are
    # masked by pos and contribute zero either way)
    align = 128 if quantized else 16
    w = t if attn_len is None else min(int(attn_len), t)
    w = -(-w // align) * align
    w = min(w, t)
    assert t % align == 0, (
        f"cache length {t} must be {align}-aligned for this kernel")
    wc = min(wc, w)
    if w % wc:
        # shrink to the largest align-multiple divisor of w (w is
        # align-ed so align itself always works); non-power-of-2
        # divisors matter — e.g. w=1792 under a 1024 cap shrinks to
        # 896, not all the way to 256
        wc = next(c for c in range(wc - wc % align, 0, -align)
                  if w % c == 0)
    n_chunks = w // wc

    # block-diagonal q: qbd[b, h, g(h)*hd:(g(h)+1)*hd] = q[b, h] with
    # g(h) = h % kvh (== h for MHA), zeros elsewhere. Built as a
    # group-onehot broadcast multiply, NOT a gather (a take_along_axis
    # here measured ~6 ms/step on v5e: TPU gathers run at scalar rate)
    go = (jnp.arange(kvh)[None, :]
          == (jnp.arange(nh) % kvh)[:, None]).astype(q.dtype)
    qbd = (go[None, :, :, None] * q[:, :, None, :]).reshape(bsz, nh, d)

    kf = k.reshape(bsz, t, dk)
    vf = v.reshape(bsz, t, dk)
    scale = hd ** -0.5

    fresh = k_new is not None
    if fresh:
        assert v_new is not None
        compute_t = q.dtype
        # dequantize the fresh row exactly as the kernel would have
        # read it back: int values cast (exact in bf16), scales applied
        # in f32 — so deferred-write decode == write-then-read decode
        if pack4:
            kn = _unpack4_slab(k_new.astype(jnp.int8), compute_t)
            vn = _unpack4_slab(v_new.astype(jnp.int8), compute_t)
        else:
            kn = k_new.reshape(bsz, d).astype(compute_t)
            vn = v_new.reshape(bsz, d).astype(compute_t)
        # score of the fresh token, per query head: q_h . k_new[g(h)]
        qg = q.reshape(bsz, mq, kvh, hd)
        s_new = jnp.einsum("bmgd,bgd->bmg", qg,
                           kn.reshape(bsz, kvh, hd),
                           preferred_element_type=jnp.float32) * scale
        s_new = s_new.reshape(bsz, nh)
        if quantized:
            assert k_new_scale is not None and v_new_scale is not None
            s_new = s_new * jnp.tile(k_new_scale.astype(jnp.float32),
                                     (1, mq))
            vs_new = jnp.tile(v_new_scale.astype(jnp.float32), (1, mq))
        else:
            vs_new = jnp.ones((bsz, nh), jnp.float32)
        s_new = s_new[..., None]                       # [B, nh, 1]
        vs_new = vs_new[..., None]                     # [B, nh, 1]
        vn = vn[:, None, :]                            # [B, 1, d]

    kernel = functools.partial(
        _decode_attn_kernel, wc=wc, n_chunks=n_chunks, nh=nh, hd=hd,
        mq=mq, scale=scale, out_dtype=q.dtype, quantized=quantized,
        pack4=pack4, fresh=fresh)
    in_specs = [
        pl.BlockSpec((1, nh, d), lambda b, j, pos: (b, 0, 0)),
        pl.BlockSpec((1, wc, dk), lambda b, j, pos: (b, j, 0)),
        pl.BlockSpec((1, wc, dk), lambda b, j, pos: (b, j, 0)),
    ]
    args = [pos.astype(jnp.int32), qbd, kf, vf]
    if fresh:
        in_specs += [
            pl.BlockSpec((1, nh, 1), lambda b, j, pos: (b, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda b, j, pos: (b, 0, 0)),
            pl.BlockSpec((1, nh, 1), lambda b, j, pos: (b, 0, 0)),
        ]
        args += [s_new, vn, vs_new]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, kvh, wc), lambda b, j, pos: (b, 0, j)),
            pl.BlockSpec((1, kvh, wc), lambda b, j, pos: (b, 0, j)),
        ]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_chunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, d_out),
                                   lambda b, j, pos: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((nh, d), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, d_out), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * w * d,
            bytes_accessed=2 * bsz * w * dk * k.dtype.itemsize,
            transcendentals=bsz * w * nh),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out.reshape(bsz, nh, hd)


def vmem_bytes_decode_attn(t, d, itemsize, wc=512, nh=1,
                           quantized=False, mq=1, kv_bits=8):
    """VMEM footprint estimate: double-buffered K+V slabs (the dominant
    term) + the f32 accumulator scratch [nh, d] + the qbd input block
    and output block. `quantized` adds the f32 scale slabs of the
    INT8/INT4 KV modes (itemsize should then be 1); kv_bits=4 halves
    the stored slab but adds the int32 + bf16 nibble-unpack
    temporaries. `d` is the K/V slab width (kvh*hd under GQA);
    `mq` = nh/kvh (output width is mq*d)."""
    wc = min(wc, t)
    kvh = max(nh // max(mq, 1), 1)
    pack4 = quantized and kv_bits == 4
    stored = d // 2 if pack4 else d
    slabs = 2 * 2 * wc * stored * itemsize     # K + V, double-buffered
    if quantized:
        slabs += 2 * 2 * wc * kvh * 4          # k/v scale slabs (f32)
    if pack4:
        # int32 low/high halves + the concatenated bf16 slab, K and V
        slabs += 2 * (wc * d * 4 + wc * d * 2)
    scratch = nh * d * 4 + 2 * nh * 4          # acc + m + z (f32)
    qio = 2 if quantized else itemsize         # qbd stays in q.dtype
    io = 2 * nh * d * qio + mq * d * qio       # qbd (dbl-buf) + out
    return slabs + scratch + io


# Leave headroom under the ~16 MB/core VMEM for Mosaic's own buffers;
# the fused-FFN ladder uses 15 MB, but this kernel's estimate is
# coarser (per-buffer padding to tile multiples), so budget lower.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def pick_wc(t, d, itemsize, nh=1, budget=VMEM_BUDGET_BYTES,
            quantized=False, mq=1, kv_bits=8):
    """Largest window chunk whose kernel fits the VMEM budget, or None
    when even the minimum chunk (16) does not fit — the caller must
    then take the XLA windowed-attention path. Mirrors the fused-FFN
    ladder pattern: shrink the streamed slab under VMEM pressure
    instead of failing to compile at large model_dim."""
    import os
    cap = int(os.environ.get("TUTEL_TPU_DECODE_WC_CAP", "0") or 0)
    floor = 128 if quantized else 16       # scale slabs lane-align 128
    # the ladder extends ABOVE 512 because per-grid-step overhead (DMA
    # issue + semaphore + pipeline bookkeeping, ~350 ns measured) beats
    # the transfer time when the [wc, d] slab is small: at the GQA
    # serving config (d=256 int8) wc=256 moves 64 KB/step and the
    # kernel measured 231 GB/s — 3x off the stream ceiling; the same
    # window in 448 KB chunks (wc=1792, one chunk per row) runs the
    # DMA engine at full rate. decode_attn clamps wc to the actual
    # window, so a large pick just means "one chunk" at serving sizes.
    for wc in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16):
        if wc < floor:
            break
        if cap and wc > cap:
            continue
        if vmem_bytes_decode_attn(t, d, itemsize, wc=wc, nh=nh,
                                  quantized=quantized, mq=mq,
                                  kv_bits=kv_bits) <= budget:
            return wc
    return None


# ---------------------------------------------------------------------------
# Prefill (multi-query chunk) flash attention
# ---------------------------------------------------------------------------

def _prefill_attn_kernel(start_ref, qg_ref, k_ref, v_ref, *rest, wc,
                         n_chunks, rows, mq, scale, out_dtype,
                         quantized, pack4, high_nibble, ng):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, z_ref = rest
    else:
        o_ref, acc_ref, m_ref, z_ref = rest
    g = pl.program_id(1)
    j = pl.program_id(2)

    def _scale_row(ref):
        # the scale block spans ALL ng groups (Mosaic requires blocked
        # dims divide by 8 or equal the array dim); pick this grid
        # step's group row with a one-hot sublane reduction
        sl = ref[0]                                    # [ng, wc]
        if ng == 1:
            return sl
        hit = (jax.lax.broadcasted_iota(jnp.int32, (ng, wc), 0)
               == g).astype(sl.dtype)
        return jnp.sum(sl * hit, axis=0, keepdims=True)  # [1, wc]

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        z_ref[...] = jnp.zeros_like(z_ref)

    compute_t = qg_ref.dtype
    if pack4:
        # the group's hd values sit in ONE nibble of a contiguous
        # hd- (or hd/2-) wide byte block of the split-half layout;
        # high_nibble(g) was resolved on the host into the grid
        kv = k_ref[0].astype(jnp.int32)
        kslab = ((kv >> 4) if high_nibble else ((kv << 28) >> 28)
                 ).astype(compute_t)
        vv = v_ref[0].astype(jnp.int32)
        vslab = ((vv >> 4) if high_nibble else ((vv << 28) >> 28)
                 ).astype(compute_t)
    elif quantized:
        kslab = k_ref[0].astype(compute_t)
        vslab = v_ref[0].astype(compute_t)
    else:
        kslab = k_ref[0]
        vslab = v_ref[0]

    # scores [rows, wc]: rows = tq*mq group-major queries, contraction
    # over hd only — no block-diagonal packing needed (enough query
    # rows to fill the MXU), so no kvh-fold FLOP waste
    s = jax.lax.dot_general(
        qg_ref[0, 0], kslab, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if quantized:
        s = s * _scale_row(ks_ref)                     # [1, wc] bcast
    # causal mask by GLOBAL position: query row r sits at
    # start + r // mq; window position = j*wc + lane
    qpos = (start_ref[0]
            + jax.lax.broadcasted_iota(jnp.int32, (rows, wc), 0) // mq)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, wc), 1) + j * wc
    live = t_iota <= qpos
    s = jnp.where(live, s, -1e30)

    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_old - m_new)
    e = jnp.exp(s - m_new)
    e = jnp.where(live, e, 0.0)
    m_ref[...] = m_new
    z_ref[...] = z_ref[...] * corr + jnp.sum(e, axis=1, keepdims=True)
    ev = e * _scale_row(vs_ref) if quantized else e
    d = jax.lax.dot_general(
        ev.astype(compute_t), vslab, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [rows, hd]
    acc_ref[...] = acc_ref[...] * corr + d

    @pl.when(j == n_chunks - 1)
    def _finalize():
        z = jnp.maximum(z_ref[...], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / z).astype(out_dtype)


def prefill_attn(q, k, v, start, *, k_scale=None, v_scale=None,
                 attn_len=None, wc=1024, kv_bits=8, interpret=False):
    """Chunk-parallel prefill attention over the cache prefix.

    out[b, t, h] = softmax_{p <= start + t}(q[b, t, h] . K[b, p, g(h)]
                   * hd^-0.5) . V[b, :, g(h)]        (g(h) = h % KVH)

    The XLA einsum chain materializes the [B, tc, W] score/softmax
    tensors (the dominant prefill cost after the round-5 window
    segmentation); this kernel streams the K/V window per
    (batch row, KV group) with an online softmax — the prefill
    counterpart of `decode_attn`, sharing its quantized-cache
    conventions (INT8: per-(head, pos) scales folded into the
    score/softmax tiles; INT4: split-half nibble slab — each group's
    hd values sit in ONE nibble of a contiguous byte block, so the
    grid splits into a low-nibble and a high-nibble call). Unlike the
    decode kernel there is no block-diagonal packing: a chunk brings
    tq*mq query rows per group, enough to fill the MXU with a plain
    hd-contraction (no kvh-fold FLOP waste). `start` may be TRACED
    (the prefill scan's chunk offset) — it rides scalar prefetch.

    Args:
      q: [B, TQ, NH, HD] chunk queries at global positions start + t.
      k, v: cache slabs as stored — [B, T, KVH*HD] (float or int8) or
        [B, T, KVH*HD//2] (kv_bits=4 packed; KVH must be even).
      start: int32 scalar, the chunk's global offset.
      k_scale, v_scale: [B, KVH, T] f32 for quantized caches.
      attn_len: static read bound (>= start + TQ; None = T).
    Returns:
      [B, TQ, NH, HD] in q.dtype.
    """
    bsz, tq, nh, hd = q.shape
    quantized = k_scale is not None
    pack4 = quantized and kv_bits == 4
    t = k.shape[1]
    kvh = k_scale.shape[1] if quantized else k.shape[2] // hd
    mq = nh // kvh
    rows = tq * mq
    if pack4 and kvh % 2:
        raise NotImplementedError("prefill_attn: kv4 needs even KVH")
    align = 128 if quantized else 16
    assert t % align == 0, (
        f"cache length {t} must be {align}-aligned for prefill_attn "
        "(the window clips to the cache length, which must then "
        "divide into aligned chunks)")
    w = t if attn_len is None else min(int(attn_len), t)
    w = min(-(-w // align) * align, t)
    wc = min(wc, w)
    if w % wc:
        wc = next(c for c in range(wc - wc % align, 0, -align)
                  if w % c == 0)
    n_chunks = w // wc

    # group-major query layout: head h = j*kvh + g -> group g, slot j
    qg = q.reshape(bsz, tq, mq, kvh, hd).transpose(0, 3, 1, 2, 4)
    qg = qg.reshape(bsz, kvh, rows, hd)

    kvh2 = kvh // 2 if pack4 else kvh
    # one spec serves both layouts: each group's hd values live in a
    # contiguous hd-wide block — byte block g of the packed kv4 slab
    # (one nibble per half), value block g otherwise
    kv_spec = pl.BlockSpec((1, wc, hd),
                           lambda b, g, j, start: (b, j, g))

    def call(high_nibble, ng, k_, v_, ks_, vs_, qg_):
        kernel = functools.partial(
            _prefill_attn_kernel, wc=wc, n_chunks=n_chunks, rows=rows,
            mq=mq, scale=hd ** -0.5, out_dtype=q.dtype,
            quantized=quantized, pack4=pack4,
            high_nibble=high_nibble, ng=ng)
        in_specs = [
            pl.BlockSpec((1, 1, rows, hd),
                         lambda b, g, j, start: (b, g, 0, 0)),
            kv_spec,
            kv_spec,
        ]
        args = [qg_, k_, v_]
        if quantized:
            in_specs += [
                pl.BlockSpec((1, ng, wc),
                             lambda b, g, j, start: (b, 0, j)),
                pl.BlockSpec((1, ng, wc),
                             lambda b, g, j, start: (b, 0, j)),
            ]
            args += [ks_, vs_]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bsz, ng, n_chunks),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (1, 1, rows, hd),
                    lambda b, g, j, start: (b, g, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((rows, hd), jnp.float32),
                    pltpu.VMEM((rows, 1), jnp.float32),
                    pltpu.VMEM((rows, 1), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, ng, rows, hd), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel",
                                     "arbitrary")),
            interpret=interpret,
        )(jnp.asarray(start, jnp.int32).reshape(1), *args)

    ksf = k_scale.astype(jnp.float32) if quantized else None
    vsf = v_scale.astype(jnp.float32) if quantized else None
    if not pack4:
        out = call(False, kvh, k, v, ksf, vsf, qg)
    else:
        # split-half packing: groups [0, kvh/2) live in low nibbles of
        # byte blocks [g*hd, (g+1)*hd), groups [kvh/2, kvh) in the high
        # nibbles of the same blocks — one call per nibble
        lo = call(False, kvh2, k, v, ksf[:, :kvh2], vsf[:, :kvh2],
                  qg[:, :kvh2])
        hi = call(True, kvh2, k, v, ksf[:, kvh2:], vsf[:, kvh2:],
                  qg[:, kvh2:])
        out = jnp.concatenate([lo, hi], axis=1)
    # [B, kvh, tq*mq, hd] -> [B, tq, nh, hd]
    out = out.reshape(bsz, kvh, tq, mq, hd).transpose(0, 2, 3, 1, 4)
    return out.reshape(bsz, tq, nh, hd)
