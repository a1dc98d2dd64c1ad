"""Training losses.

Reference semantics (``MERBench/toolkit/utils/loss.py``):
  * ``CELoss``  = NLL of log-softmax, summed over the batch then divided by
    batch size (i.e. plain mean cross entropy) — loss.py:5-15.
  * ``MSELoss`` = squared error summed then divided by batch size — loss.py:18-28.

Here both take an optional ``mask`` because TPU batches are padded to static
shapes; masked entries contribute nothing and the divisor is the *valid*
count, which reproduces the reference exactly on unpadded data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean CE over valid samples. logits: (B, C); labels: (B,) int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def mse(preds: jnp.ndarray, targets: jnp.ndarray,
        mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean squared error over valid samples. preds/targets: (B,) or (B, 1)."""
    preds = preds.reshape(-1).astype(jnp.float32)
    targets = targets.reshape(-1).astype(jnp.float32)
    sq = (preds - targets) ** 2
    if mask is None:
        return jnp.mean(sq)
    mask = mask.reshape(-1).astype(sq.dtype)
    return jnp.sum(sq * mask) / jnp.maximum(jnp.sum(mask), 1.0)
