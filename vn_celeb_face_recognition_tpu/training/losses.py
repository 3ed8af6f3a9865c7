"""Loss / metric registry.

The reference pairs log_softmax model outputs with nn.NLLLoss
(/root/reference/losses/__init__.py:3) and an argmax accuracy
(losses/metrics.py:3-7). Both are reimplemented as weighted, jittable
functions: the ``weight`` vector carries the padding mask from the
fixed-shape DataLoader so padded rows contribute nothing.
"""

import jax.numpy as jnp


def neg_log_llhood(log_probs, targets, weights=None):
    """Mean negative log-likelihood of the target class."""
    picked = jnp.take_along_axis(
        log_probs, targets[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    if weights is None:
        return -jnp.mean(picked)
    return -jnp.sum(picked * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def accuracy(log_probs, targets, weights=None):
    """Fraction of argmax matches."""
    pred = jnp.argmax(log_probs, axis=1)
    match = (pred == targets).astype(jnp.float32)
    if weights is None:
        return jnp.mean(match)
    return jnp.sum(match * weights) / jnp.maximum(jnp.sum(weights), 1.0)


LOSSES = {"neg_log_llhood": neg_log_llhood}
METRICS = {"accuracy": accuracy}
