"""Pipeline parallelism vs the sequential oracle (8-virtual-device CPU mesh).

The pipelined schedule must be numerically IDENTICAL to applying the stages
in sequence — exactly for integer stages, to fp tolerance for fp32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.parallel.pipeline import (make_pipeline_mesh, pipeline_apply,
                                    stage_sharding)

KEY = jax.random.PRNGKey(0)


def test_pipeline_fp32_residual_mlp():
    """4 stages × 6 microbatches of a residual MLP block."""
    n_stages, n_micro, mb, d = 4, 6, 2, 16
    ws = jax.random.normal(KEY, (n_stages, d, d)) * 0.1
    bs = jax.random.normal(jax.random.fold_in(KEY, 1), (n_stages, d)) * 0.1
    x = jax.random.normal(jax.random.fold_in(KEY, 2), (n_micro, mb, d))

    def stage(p, x):
        w, b = p
        return x + jax.nn.relu(x @ w + b)

    ref = x
    for i in range(n_stages):
        ref = stage((ws[i], bs[i]), ref)

    mesh = make_pipeline_mesh(n_stages, devices=jax.devices()[:n_stages])
    params = (jax.device_put(ws, stage_sharding(mesh)),
              jax.device_put(bs, stage_sharding(mesh)))
    out = pipeline_apply(stage, params, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_int8_stage_exact():
    """int8 qmatmul+requant stages: pipelined == sequential bit-for-bit."""
    n_stages, n_micro, mb, d = 8, 5, 3, 8
    ws = jax.random.randint(KEY, (n_stages, d, d), -128, 128, dtype=jnp.int8)
    x = jax.random.randint(jax.random.fold_in(KEY, 1), (n_micro, mb, d),
                           -128, 128, dtype=jnp.int8)

    def stage(w, xq):
        acc = qops.qmatmul(xq, w)
        # toy requant back to int8 codes so stages chain shape/dtype-stably
        return jnp.clip(acc // 64, -128, 127).astype(jnp.int8)

    ref = x
    for i in range(n_stages):
        ref = stage(ws[i], ref)

    mesh = make_pipeline_mesh(n_stages)
    out = pipeline_apply(stage, jax.device_put(ws, stage_sharding(mesh)),
                         x, mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_single_stage_degenerate():
    mesh = make_pipeline_mesh(1, devices=jax.devices()[:1])
    w = jax.random.normal(KEY, (1, 4, 4))
    x = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 2, 4))
    out = pipeline_apply(lambda p, xx: xx @ p, (w,)[0], x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w[0]),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_rejects_mismatched_stage_count():
    with pytest.raises(ValueError):
        make_pipeline_mesh(3, devices=jax.devices()[:4])
