"""Sequence-parallel (SP x EP) Transformer-MoE training demo.

The round-4 capability the reference only sketches (spatial_split,
reference tutel/impls/communicate.py:589-604): the LM trains with its
SEQUENCE sharded across all devices of the MoE layers' own mesh —
attention runs context-parallel (--attn ulysses: the head<->sequence
all-to-all pair; --attn ring: blockwise ring attention over ppermute,
which lifts the head-count bound and supports GQA via --num_kv_heads)
and each MoE layer consumes the token shard directly, so sequence
parallelism, expert parallelism, and expert-slicing TP share one mesh.

Runs on the virtual CPU mesh out of the box:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m tutel_tpu.examples.seqpar_lm --device cpu --steps 10

and verifies the SP loss == the single-device loss on the first step.
"""

import argparse
import time

import numpy as np


def run(args, log=print):
    import jax
    if args.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp
    import dataclasses
    from tutel_tpu.models import TransformerMoE, TransformerMoEConfig

    devices = jax.devices()
    sp = len(devices)
    if args.attn == "ulysses":
        assert args.num_heads % sp == 0, (
            f"num_heads={args.num_heads} must divide the {sp}-device "
            "mesh for Ulysses (pass --attn ring to lift the bound)")
    assert args.seq_len % sp == 0, (
        f"seq_len={args.seq_len} must divide the {sp}-device mesh "
        "(round 5: the loss runs the FULL sequence and shifts the "
        "logits afterwards)")

    cfg = TransformerMoEConfig(
        vocab_size=256, max_len=args.seq_len, model_dim=args.model_dim,
        num_heads=args.num_heads, num_layers=args.num_layers,
        ffn_hidden=2 * args.model_dim, moe_every=2,
        num_local_experts=args.experts_per_device, top_k=2,
        capacity_factor=2.0, expert_hidden=2 * args.model_dim,
        num_kv_heads=args.num_kv_heads)
    sp_model = TransformerMoE(cfg, group=devices)
    e_global = list(sp_model.moe_layers.values())[0].num_global_experts
    ref_model = TransformerMoE(
        dataclasses.replace(cfg, num_local_experts=e_global),
        group=devices[:1])

    params = ref_model.init(jax.random.PRNGKey(0))
    sp_params = dict(params)
    sp_params["blocks"] = [
        ({**blk, "moe": sp_model.moe_layers[i].shard_params(blk["moe"])}
         if "moe" in blk else blk)
        for i, blk in enumerate(params["blocks"])]

    rng = np.random.RandomState(0)
    tokens = jnp.asarray(
        rng.randint(0, 256, (args.batch, args.seq_len)), jnp.int32)
    cap = args.batch * args.seq_len

    def sp_loss(p, toks):
        loss, (nll, _aux) = sp_model.loss_seqpar(
            p, toks, l_aux_wt=0.0, training=True,
            moe_overrides={"capacity_override": cap},
            attn_mode=args.attn)
        return nll

    # sanity: SP == single device on the first batch
    ref_nll = float(ref_model.loss(
        params, tokens, l_aux_wt=0.0, training=True,
        moe_overrides={"capacity_override": cap})[1][0])
    sp_nll = float(jax.jit(sp_loss)(sp_params, tokens))
    log(f"single-device nll {ref_nll:.6f} | {sp}-way SP nll "
        f"{sp_nll:.6f} (|delta| {abs(ref_nll - sp_nll):.2e})")
    assert abs(ref_nll - sp_nll) < 1e-3, (ref_nll, sp_nll)

    step_fn = jax.jit(jax.value_and_grad(sp_loss))
    losses = []
    t0 = time.time()
    for i in range(args.steps):
        toks = jnp.asarray(
            rng.randint(0, 256, (args.batch, args.seq_len)), jnp.int32)
        loss, grads = step_fn(sp_params, toks)
        sp_params = jax.tree.map(
            lambda p, g: p - args.lr * g.astype(p.dtype),
            sp_params, grads)
        losses.append(float(loss))
        log(f"STEP-{i}: loss = {losses[-1]:.6f}")
    log(f"{args.steps} SP training steps in {time.time() - t0:.1f}s "
        f"on {sp} devices")
    return losses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--model_dim", type=int, default=64)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--experts_per_device", type=int, default=1)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--device", type=str, default="")
    p.add_argument("--attn", type=str, default="ulysses",
                   choices=("ulysses", "ring"),
                   help="context-parallel attention: the Ulysses "
                        "head<->sequence a2a pair, or blockwise ring "
                        "attention (no head bound; GQA supported)")
    p.add_argument("--num_kv_heads", type=int, default=0,
                   help="grouped-query attention KV heads "
                        "(0 = MHA; requires --attn ring)")
    run(p.parse_args())


if __name__ == "__main__":
    main()
