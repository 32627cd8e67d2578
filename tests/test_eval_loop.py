"""Evaluation-loop coverage: the reported accuracy must cover the FULL
eval set (drop_remainder silently truncated it to a batch multiple)."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from qtpu.data.datasets import Dataset
from qtpu.train import evaluate


class _ConstModel(nn.Module):
    """Always predicts class 0 (top-1) and classes {0..4} (top-5)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = jnp.arange(10, 0, -1, dtype=jnp.float32)   # class 0 highest
        return jnp.broadcast_to(base, (x.shape[0], 10))


def test_evaluate_counts_remainder_batch():
    # 6 samples, batch 4: the 2-sample remainder MUST be evaluated.
    # labels: five 0s (correct) + one 9 (wrong, also outside top-5)
    images = np.zeros((6, 8, 8, 1), np.float32)
    labels = np.array([0, 0, 0, 0, 0, 9], np.int64)
    ds = Dataset(images=images, labels=labels, num_classes=10)
    m = _ConstModel()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(images[:2]))
    top1, top5 = evaluate(m, variables, ds, batch_size=4)
    assert top1 == 5 / 6                     # 1.0 if the tail were dropped
    assert top5 == 5 / 6
