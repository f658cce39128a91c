"""Mixture-of-Experts block + expert parallelism on the CPU mesh.

Oracles: Switch top-1 semantics are checked directly (identity at init,
capacity overflow falls through the residual, load fractions), and the
expert-parallel sharded step must equal the unsharded step — the dispatch/
combine einsums are the same math whether GSPMD scatters them or not.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from cnn_tpu import optim
from cnn_tpu.models import MoECNN, get_model
from cnn_tpu.nn.moe import MoEBlock
from cnn_tpu.parallel import (create_train_state, make_train_step,
                              shard_train_state)


def test_moe_identity_at_init():
    """w2 zero-init => the block is the residual identity at init."""
    blk = MoEBlock("moe", dim=16, hidden=32, n_experts=4)
    params, state = blk.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((8, 16)), jnp.float32)
    y, new_state = blk.apply(params, state, x, train=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(float(jnp.sum(new_state["load"])), 1.0,
                               rtol=1e-6)


def test_moe_capacity_overflow_falls_through_residual():
    """Force every token to expert 0 with capacity 2: tokens 3..B-1 must
    come out exactly x (dropped), tokens 0..1 get the expert delta."""
    blk = MoEBlock("moe", dim=4, hidden=8, n_experts=4, capacity_factor=1.0)
    params, state = blk.init(jax.random.key(1))
    params = dict(params)
    # router hard-biased to expert 0; nonzero output projection
    params["router"] = jnp.zeros((4, 4)).at[:, 0].set(100.0)
    params["w2"] = jnp.ones_like(params["w2"]) * 0.1
    x = jnp.asarray(np.random.default_rng(1).random((8, 4)), jnp.float32)
    y, _ = blk.apply(params, state, x, train=True)
    cap = int(1.0 * 8 / 4)  # = 2
    delta = np.abs(np.asarray(y) - np.asarray(x)).max(axis=1)
    assert (delta[:cap] > 0).all(), "in-capacity tokens must be transformed"
    np.testing.assert_array_equal(delta[cap:], 0.0)


def test_moe_routes_to_distinct_experts():
    blk = MoEBlock("moe", dim=16, hidden=32, n_experts=4)
    params, state = blk.init(jax.random.key(2))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(64, 16)),
                    jnp.float32)
    _, new_state = blk.apply(params, state, x, train=True)
    load = np.asarray(new_state["load"])
    assert (load > 0).sum() >= 2, f"router collapsed at init: {load}"


def test_moecnn_trains_and_router_learns():
    model = get_model("moecnn", num_classes=3, width=16, n_experts=4,
                      expert_hidden=32, image_size=32)
    assert isinstance(model, MoECNN)
    opt = optim.make_optimizer("momentum", 5e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(3))
    step = make_train_step(model, opt, donate=False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 256, (32, 32, 32, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 3, (32,), dtype=np.int32))
    ts, m0 = step(ts, x, y)
    for _ in range(15):
        ts, m = step(ts, x, y)
    assert float(m["loss"]) < float(m0["loss"])
    # expert params received gradient (zero-init w2 moved)
    assert float(jnp.max(jnp.abs(ts.params["moe"]["w2"]))) > 0.0


def test_expert_parallel_matches_single_device():
    """('data','expert') mesh: experts shard over 'expert' via
    param_pspecs_ep; the sharded step equals the unsharded one."""
    model = get_model("moecnn", num_classes=3, width=16, n_experts=4,
                      expert_hidden=32, image_size=32)
    opt = optim.make_optimizer("momentum", 1e-2, 0.9)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 3, (16,), dtype=np.int32))

    ts1 = create_train_state(model, opt, jax.random.key(5))
    step1 = make_train_step(model, opt, donate=False)
    # a few steps first so w2 != 0 and routing is non-degenerate
    for _ in range(3):
        ts1, m1 = step1(ts1, x, y)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "expert"))
    ts2 = shard_train_state(create_train_state(model, opt, jax.random.key(5)),
                            mesh, model)
    # expert params actually live sharded over 'expert'
    w1_sh = ts2.params["moe"]["w1"].sharding
    assert w1_sh.spec[0] == "expert", w1_sh
    step2 = make_train_step(model, opt, mesh=mesh, donate=False)
    for _ in range(3):
        ts2, m2 = step2(ts2, x, y)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_moe_bf16_smoke():
    model = get_model("moecnn", num_classes=3, width=16, n_experts=4,
                      expert_hidden=32, image_size=32)
    opt = optim.sgd(1e-2)
    ts = create_train_state(model, opt, jax.random.key(6))
    step = make_train_step(model, opt, compute_dtype=jnp.bfloat16,
                           donate=False)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 3, (8,), dtype=np.int32))
    ts, m = step(ts, x, y)
    assert np.isfinite(float(m["loss"]))


def test_moe_balance_loss_value_and_gradient():
    """VERDICT r3 item 9's lever: the Switch aux loss (balance_coeff) is
    coeff at perfect balance and approaches coeff*E at collapse; its
    gradient flows to the router (through P — f is argmax-constant)."""
    from cnn_tpu.nn.moe import MoEBlock
    from cnn_tpu.parallel.train_step import collect_aux_losses

    block = MoEBlock("moe", dim=16, hidden=32, n_experts=4,
                     balance_coeff=0.01)
    params, state = block.init(jax.random.key(7))
    # positive inputs: a +10 bias on column 0's weights then dominates every
    # token's logit_0 (with zero-mean x the bias sign would flip per token)
    x = jnp.asarray(np.abs(np.random.default_rng(7).standard_normal(
        (256, 16))), jnp.float32)

    # collapse the router onto expert 0
    skew = dict(params)
    skew["router"] = params["router"].at[:, 0].add(10.0)

    def aux(p):
        _, st = block.apply(p, state, x, train=True)
        return collect_aux_losses(st)

    a_skew = float(aux(skew))
    a_fair = float(aux(params))
    assert a_skew > 2.5 * 0.01          # near coeff*E = 0.04
    assert a_fair < a_skew
    g = jax.grad(aux)(skew)["router"]
    assert float(jnp.max(jnp.abs(g))) > 0.0
    # a coeff=0 block neither stores nor differentiates the term
    b0 = MoEBlock("moe", dim=16, hidden=32, n_experts=4)
    p0, s0 = b0.init(jax.random.key(7))
    _, st0 = b0.apply(p0, s0, x, train=True)
    assert "aux_loss" not in st0


def test_moecnn_balance_flag_trains():
    """balance_coeff wires through the model factory and the train step
    adds the aux term (train-mode only) to the objective."""
    model = get_model("moecnn", num_classes=3, width=16, n_experts=4,
                      expert_hidden=32, image_size=32, balance_coeff=0.01)
    opt = optim.make_optimizer("momentum", 5e-2, 0.9)
    ts = create_train_state(model, opt, jax.random.key(8))
    assert "aux_loss" in ts.state["moe"]
    step = make_train_step(model, opt, donate=False)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(0, 256, (32, 32, 32, 3), dtype=np.uint8))
    y = jnp.asarray(rng.integers(0, 3, (32,), dtype=np.int32))
    ts, m0 = step(ts, x, y)
    for _ in range(10):
        ts, m = step(ts, x, y)
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(ts.state["moe"]["aux_loss"]))
    # eval is untouched by the aux term
    from cnn_tpu.parallel import make_eval_step
    out = make_eval_step(model)(ts.params, ts.state, x, y)
    assert np.isfinite(float(out["loss"]))
