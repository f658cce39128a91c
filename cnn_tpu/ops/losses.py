"""Softmax, one-hot, and fused softmax cross-entropy.

Reference (``cpu/src/func.cpp``):
- ``softmax``: per-sample max-subtraction, exp clamped (x>=88 -> FLT_MAX,
  x<=-50 -> 0), NaN -> 0 (``func.cpp:6-37``). After max subtraction all
  inputs are <= 0, so the clamps are dead on the hot path; we use the plain
  stable form.
- ``cross_entroy_backward`` (``func.cpp:56-73``): loss = -mean_b sum_i y*log p,
  delta = p - y (NOT divided by batch; each reference layer divides its own
  weight grad by B instead — net effect identical to ``jax.grad`` of the
  batch-mean loss, which is what we use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=axis)


def one_hot(labels: jnp.ndarray, num_classes: int, dtype=jnp.float32) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          label_smoothing: float = 0.0) -> jnp.ndarray:
    """Batch-mean softmax CE. ``labels``: int [B] or one-hot [B, C].

    Gradient wrt logits is ``(softmax(logits) - y) / B`` — composed with the
    per-layer math this yields exactly the reference's parameter gradients
    (see module docstring). ``label_smoothing`` is a superset (reference
    trains on hard one-hots only, func.cpp:40-53).
    """
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == logits.ndim - 1:
        labels = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    if label_smoothing > 0.0:
        n = logits.shape[-1]
        labels = labels * (1.0 - label_smoothing) + label_smoothing / n
    nll = -jnp.sum(labels * log_p, axis=-1)
    return jnp.mean(nll)


def distillation_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                      temperature: float = 2.0) -> jnp.ndarray:
    """Hinton-style knowledge-distillation term (superset — the reference
    trains on hard labels only, func.cpp:40-53).

    Batch-mean ``T^2 * KL(softmax(teacher/T) || softmax(student/T))``; the
    ``T^2`` keeps the soft-target gradient magnitude comparable to the hard
    CE term as the temperature changes (Hinton et al. 2015, §2). The
    teacher logits must already be gradient-free (computed outside the
    differentiated function); a ``stop_gradient`` here guards the math
    anyway.
    """
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32)) / temperature
    s = student_logits.astype(jnp.float32) / temperature
    p_t = jax.nn.softmax(t, axis=-1)
    kl = jnp.sum(p_t * (jax.nn.log_softmax(t, axis=-1)
                        - jax.nn.log_softmax(s, axis=-1)), axis=-1)
    return (temperature ** 2) * jnp.mean(kl)


def distillation_loss_from_probs(student_logits: jnp.ndarray,
                                 teacher_probs: jnp.ndarray,
                                 temperature: float = 2.0) -> jnp.ndarray:
    """KD term against pre-computed teacher probabilities at temperature
    ``T`` — the multi-teacher form: average each teacher's
    ``softmax(logits/T)`` FIRST (the ensemble's predictive distribution),
    then distill against the mixture (Hinton et al. 2015, §7 uses exactly
    this ensemble-mean target). ``distillation_loss`` is the one-teacher
    special case.
    """
    p_t = jax.lax.stop_gradient(teacher_probs.astype(jnp.float32))
    s = student_logits.astype(jnp.float32) / temperature
    # KL(p_t || softmax(s)) up to the constant entropy of p_t — keep the
    # full form so the reported loss is a true KL (zero when matched)
    log_p_t = jnp.log(jnp.maximum(p_t, 1e-20))
    kl = jnp.sum(p_t * (log_p_t - jax.nn.log_softmax(s, axis=-1)), axis=-1)
    return (temperature ** 2) * jnp.mean(kl)
