"""Channel-level dropout (drops whole feature maps).

Reference (``cpu/src/dropout.cpp``): in train it zeroes channels with index
``< int(p*C)`` — note: the *first* ``p*C`` channel indices, every step; the
seeded shuffle at ``dropout.cpp:24`` only permutes a bookkeeping list that is
never used for selection, so the reference's drop pattern is deterministic.
Eval multiplies all activations by ``1-p`` (vanilla, non-inverted scaling,
``dropout.cpp:39-48``). The author flags eval quality as poor
(``README.md:16``); both quirks are reproducible here via flags.

Modes:
- ``compat="reference"``: deterministic first-``int(p*C)``-channels drop +
  eval ``*(1-p)`` scaling (bit-faithful to the C++).
- ``compat="sampled"``: proper per-step random channel subset (what the
  reference *intended*), vanilla scaling.
- ``compat="inverted"`` (default): random channel subset with inverted
  scaling ``/(1-keep)`` at train time, identity at eval — the modern form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def channel_dropout(x: jnp.ndarray, p: float, *, train: bool,
                    rng: jax.Array | None = None,
                    compat: str = "inverted") -> jnp.ndarray:
    """NHWC channel dropout. ``p`` = drop probability (fraction of channels)."""
    if compat not in ("reference", "sampled", "inverted"):
        raise ValueError(f"unknown dropout compat mode: {compat!r}")
    if p <= 0.0:
        return x
    c = x.shape[-1]
    n_drop = int(p * c)
    assert c > n_drop, "cannot drop all channels"

    if compat == "reference":
        if train:
            keep = (jnp.arange(c) >= n_drop).astype(x.dtype)
            return x * keep
        return x * jnp.asarray(1.0 - p, dtype=x.dtype)

    if not train:
        if compat == "sampled":
            return x * jnp.asarray(1.0 - p, dtype=x.dtype)
        return x  # inverted: eval is identity

    assert rng is not None, "sampled dropout needs an rng key in training"
    # drop exactly n_drop channels, chosen uniformly at random per step
    perm = jax.random.permutation(rng, c)
    keep = (perm >= n_drop).astype(x.dtype)
    if compat == "inverted":
        keep_frac = 1.0 - n_drop / c
        keep = keep / jnp.asarray(keep_frac, dtype=x.dtype)
    return x * keep
