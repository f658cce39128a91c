"""Mixture-of-Experts block with expert parallelism (EP).

The reference's capacity story ends at one dense head; this is the standard
TPU way to grow parameters without growing per-token FLOPs: a Switch-style
top-1-routed expert MLP bank. Everything is fixed-shape (XLA needs static
shapes): routing uses one-hot DISPATCH/COMBINE einsums with a hard capacity
``C = capacity_factor * B / E`` per expert — tokens over capacity fall
through the residual connection untouched, the classic Switch overflow
semantics.

Expert parallelism: every expert parameter carries a leading ``[E]`` axis.
``parallel.shard_train_state`` places it over the mesh's 'expert' axis (see
``param_pspecs``), and the dispatch einsum ``[B,E,C] x [B,D] -> [E,C,D]``
becomes the all-to-all-shaped collective GSPMD derives from the shardings —
tokens travel to their expert's chip, the expert MLP runs shard-local, and
the combine einsum routes results back. No manual collectives; the
equivalence tests pin the math to the unsharded layer.

Router balance: the router gradient flows through the combine probabilities
(Switch top-1); per-expert load fractions are exposed in the layer state for
monitoring (the train CLI logs them to the history at every validation).
The standard Switch auxiliary balance loss is available behind
``balance_coeff`` (Fedus et al. 2021 eq. 4: ``coeff * E * sum_e f_e * P_e``
with f the dispatch fractions and P the mean router probs) but DEFAULTS OFF.
The measured A/B (BASELINE.md §r4) says: without it the router DOES collapse
at this scale (2 of 8 experts dead, max load 4.4x uniform) — but accuracy is
unaffected (best valid 0.960 vs 0.957, test 0.947 vs 0.930), so the default
stays off for single-chip quality. Turn it on (0.01 is measured neutral) for
expert-parallel runs, where dead experts are idle chips. When on,
the layer writes the differentiable term into its state under 'aux_loss'
and the train step adds it to the objective
(``parallel.train_step.collect_aux_losses``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from cnn_tpu.nn.module import Layer


@dataclass(frozen=True)
class MoEBlock(Layer):
    """[B, D] -> [B, D]: residual top-1 MoE FFN (Switch semantics)."""
    dim: int = 128
    hidden: int = 256
    n_experts: int = 8
    capacity_factor: float = 2.0
    balance_coeff: float = 0.0   # Switch aux balance loss (0 = off)

    def __post_init__(self):
        object.__setattr__(self, "has_params", True)
        object.__setattr__(self, "has_state", True)   # load stats (monitor)
        # the state is per-expert load fractions — pure monitoring, never
        # read by the forward pass, so eval-only transforms (BN folding,
        # int8 serving — quant.py) may drop it and keep the block
        object.__setattr__(self, "state_eval_inert", True)

    def init(self, key, dtype=jnp.float32):
        k_r, k_1, k_2 = jax.random.split(key, 3)
        e, d, h = self.n_experts, self.dim, self.hidden
        params = {
            "router": jax.random.normal(k_r, (d, e), dtype) * (d ** -0.5),
            "w1": jax.random.normal(k_1, (e, d, h), dtype) * (d ** -0.5),
            "b1": jnp.zeros((e, h), dtype),
            # zero-init the output projection: the block is the identity at
            # init (residual), so routing can settle before experts push
            "w2": jnp.zeros((e, h, d), dtype),
            "b2": jnp.zeros((e, d), dtype),
        }
        state = {"load": jnp.full((e,), 1.0 / e, jnp.float32)}
        if self.balance_coeff > 0.0:
            state["aux_loss"] = jnp.zeros((), jnp.float32)
        return params, state

    def apply(self, params, state, x, *, train, rng=None, compute_dtype=None):
        e = self.n_experts
        b, d = x.shape
        cap = max(1, int(self.capacity_factor * b / e))

        xr = x.astype(jnp.float32)
        # HIGHEST: routing is an argmax over these logits — default (bf16)
        # MXU precision would route near-tie tokens differently on TPU
        # than on the CPU test mesh
        logits = jnp.matmul(xr, params["router"].astype(jnp.float32),
                            precision=jax.lax.Precision.HIGHEST)   # [B, E]
        probs = jax.nn.softmax(logits, axis=-1)
        top = jnp.argmax(probs, axis=-1)                           # [B]
        onehot = jax.nn.one_hot(top, e, dtype=jnp.float32)         # [B, E]
        # position of each token within its expert's queue; >= cap drops
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0            # [B, E]
        keep = (pos >= 0) & (pos < cap)
        dispatch = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                  dtype=jnp.float32) * keep[..., None]
        # [B, E, C]; combine carries the router prob (its gradient trains
        # the router — Switch top-1)
        gate = jnp.sum(probs * onehot, axis=-1)                    # [B]
        combine = dispatch * gate[:, None, None]

        w_dtype = compute_dtype or x.dtype
        xe = jnp.einsum("bec,bd->ecd", dispatch.astype(w_dtype),
                        x.astype(w_dtype))                         # [E, C, D]
        h = jax.nn.relu(jnp.einsum("ecd,edh->ech", xe,
                                   params["w1"].astype(w_dtype))
                        + params["b1"][:, None, :].astype(w_dtype))
        ye = jnp.einsum("ech,ehd->ecd", h,
                        params["w2"].astype(w_dtype)) \
            + params["b2"][:, None, :].astype(w_dtype)             # [E, C, D]
        y = jnp.einsum("bec,ecd->bd", combine.astype(w_dtype), ye)

        if train:
            f = jnp.mean(onehot, axis=0)
            new_state = {"load": f}
            if self.balance_coeff > 0.0:
                # Switch eq. 4: E * sum_e f_e * P_e — minimized at uniform
                # load; f is piecewise-constant (argmax) so the gradient
                # flows through P, pushing router probs toward balance
                p_mean = jnp.mean(probs, axis=0)
                new_state["aux_loss"] = (self.balance_coeff * e
                                         * jnp.sum(f * p_mean))
        else:
            new_state = state
        return x + y.astype(x.dtype), new_state

    def out_shape(self, in_shape):
        return in_shape

    def param_pspecs(self, model_dim):
        del model_dim
        return None

    def param_pspecs_ep(self) -> dict:
        """Expert-parallel placement: every [E]-leading param over 'expert'."""
        from jax.sharding import PartitionSpec as P
        return {"w1": P("expert", None, None), "b1": P("expert", None),
                "w2": P("expert", None, None), "b2": P("expert", None)}
