"""Checkpoint save/load + elastic world-size resharding.

Mirrors the reference's checkpoint workflow (reference doc/CHECKPOINT.md):
train at one world size, gather to all-in-one, scatter to another world
size — including M > E expert-slicing — and keep forward numerics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tutel_tpu import moe, checkpoint
from tutel_tpu.checkpoint import reshard, serial


def _layer(devices, num_local_experts, model_dim=32, hidden=64):
    return moe.moe_layer(
        gate_type={"type": "top", "k": 2, "capacity_factor": 1.0},
        experts={"type": "ffn", "num_experts_per_device": num_local_experts,
                 "hidden_size_per_expert": hidden},
        model_dim=model_dim, seeds=(1, 1, 1), group=devices)


def test_serial_roundtrip(tmp_path):
    state = {"a": {"b.c": np.arange(6).reshape(2, 3)},
             "top": np.float32(1.5)}
    p = str(tmp_path / "s.npz")
    serial.save_state(p, state)
    back = serial.load_state(p)
    np.testing.assert_array_equal(back["a"]["b.c"], state["a"]["b.c"])
    assert float(back["top"]) == 1.5


def test_state_dict_roundtrip():
    layer = _layer(jax.devices()[:1], 4)
    params = layer.init(jax.random.PRNGKey(0))
    sd = layer.state_dict(params)
    assert int(sd["_num_global_experts"]) == 4
    params2 = layer.load_state_dict(layer.init(jax.random.PRNGKey(9)), sd)
    for (n1, p1), (_, p2) in zip(
            layer.get_parameter_iterator(params, "local_experts"),
            layer.get_parameter_iterator(params2, "local_experts")):
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_gather_scatter_inverse_E_ge_size():
    """E=8 experts over 4 'ranks' -> all-in-one -> back to 2 ranks."""
    layer_global = _layer(jax.devices()[:1], 8)
    params = layer_global.init(jax.random.PRNGKey(0))
    sd = layer_global.state_dict(params)
    # fabricate 4 per-rank states by chunking the expert dim
    ranks = reshard.scatter_state(sd, 4)
    assert ranks[0]["experts.fc1_w"].shape[0] == 2
    merged = reshard.gather_states(ranks)
    for k in sd:
        np.testing.assert_array_equal(merged[k], sd[k])
    # re-scatter to a different world size
    two = reshard.scatter_state(sd, 2)
    assert two[0]["experts.fc1_w"].shape[0] == 4


def test_scatter_more_ranks_than_experts():
    """M=8 ranks > E=4 experts: hidden dim sliced 2-ways per expert, and
    gather inverts it exactly."""
    layer_global = _layer(jax.devices()[:1], 4, model_dim=32, hidden=64)
    params = layer_global.init(jax.random.PRNGKey(0))
    sd = layer_global.state_dict(params)
    ranks = reshard.scatter_state(sd, 8)
    # fc1_w global [4, 32, 64] -> per rank [1, 32, 32] (hidden sliced)
    assert ranks[0]["experts.fc1_w"].shape == (1, 32, 32)
    # rank 0 and 1 hold the two hidden halves of expert 0
    full = np.asarray(sd["experts.fc1_w"])
    np.testing.assert_array_equal(ranks[0]["experts.fc1_w"][0],
                                  full[0, :, :32])
    np.testing.assert_array_equal(ranks[1]["experts.fc1_w"][0],
                                  full[0, :, 32:])
    merged = reshard.gather_states(ranks)
    for k in sd:
        np.testing.assert_array_equal(merged[k], sd[k])


def test_cli_roundtrip(tmp_path):
    """gather/scatter CLI mains over files, with a namespace."""
    from tutel_tpu.checkpoint import gather as gather_cli
    from tutel_tpu.checkpoint import scatter as scatter_cli

    layer = _layer(jax.devices()[:1], 4)
    params = layer.init(jax.random.PRNGKey(0))
    sd = layer.state_dict(params)
    ranks = reshard.scatter_state(sd, 2)
    for r, flat in enumerate(ranks):
        serial.save_state(str(tmp_path / f"ck-{r}-of-2.npz"),
                          {"model": serial.unflatten_state(flat)})
    gather_cli.main([
        "--inputs", str(tmp_path / "ck-{rank}-of-{size}.npz"),
        "--input_size", "2", "--namespace", "model",
        "--output", str(tmp_path / "all.npz")])
    root = serial.load_state(str(tmp_path / "all.npz"))
    merged = serial.flatten_state(root["model"])
    np.testing.assert_array_equal(merged["experts.fc1_w"],
                                  sd["experts.fc1_w"])
    scatter_cli.main([
        "--input", str(tmp_path / "all.npz"), "--output_size", "4",
        "--namespace", "model",
        "--outputs", str(tmp_path / "out-{rank}-of-{size}.npz")])
    r3 = serial.flatten_state(
        serial.load_state(str(tmp_path / "out-3-of-4.npz"))["model"])
    np.testing.assert_array_equal(r3["experts.fc1_w"],
                                  sd["experts.fc1_w"][3:4])


def test_helloworld_checkpoint_resume(tmp_path):
    """Save from a training run; resuming reproduces the same eval loss."""
    from tutel_tpu.examples import helloworld
    ck = str(tmp_path / "hw.npz")
    args = helloworld.build_args(
        ["--device", "cpu", "--num_steps", "3", "--batch_size", "2",
         "--num_tokens", "32", "--model_dim", "64", "--hidden_size", "64",
         "--checkpoint_path", ck])
    helloworld.run(args, log=lambda *a, **k: None)
    args2 = helloworld.build_args(
        ["--device", "cpu", "--num_steps", "1", "--batch_size", "2",
         "--num_tokens", "32", "--model_dim", "64", "--hidden_size", "64",
         "--checkpoint_path", ck, "--eval"])
    losses_a, _ = helloworld.run(args2, log=lambda *a, **k: None)
    losses_b, _ = helloworld.run(args2, log=lambda *a, **k: None)
    assert losses_a == losses_b
