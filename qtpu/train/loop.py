"""Training / evaluation loops: fp32 baseline training and STE-based QAT.

Rebuild of the reference's example-script training flow (SURVEY.md §3.3; mount
empty, §0): forward with fake-quant applied to live fp32 master weights, loss,
backprop through the dequantized values into the masters (STE), optimizer step.
Here that is an optax-driven jitted step; BN batch statistics and activation
observer EMAs update through Flax mutable collections in the same step.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from qtpu.data.datasets import Dataset, batches

MUTABLE = ("batch_stats", "quant_stats")


@struct.dataclass
class TrainState:
    params: Any
    extra: Dict[str, Any]          # batch_stats / quant_stats / quant_params
    opt_state: Any
    step: jax.Array

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, **self.extra}


def create_train_state(model: nn.Module, key: jax.Array, sample: jax.Array,
                       tx: optax.GradientTransformation) -> TrainState:
    variables = jax.jit(model.init, static_argnames="train")(key, sample,
                                                             train=True)
    variables = dict(variables)
    params = variables.pop("params")
    return TrainState(params=params, extra=variables,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(model: nn.Module, tx: optax.GradientTransformation,
                    mesh=None):
    """Jitted (state, x, y) -> (state, metrics) training step.

    ``mesh``: a ``jax.sharding.Mesh`` with a 'data' axis enables
    data-parallel training (SURVEY.md §2.3 DP row: "also DP for the QAT
    trainer (grad psum)") the TPU-native way — the global batch is sharded
    over 'data', params/optimizer state are replicated, and GSPMD inserts
    the gradient all-reduce (the loss is a mean over the global batch, so
    the psum is the partitioner's own reduction — no hand-written
    collective).  Numerics match the single-device step up to f32
    reduction order (asserted in tests/test_dp_train.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    mutable = list(MUTABLE)
    data_sh = (NamedSharding(mesh, PartitionSpec("data"))
               if mesh is not None else None)
    rep = (NamedSharding(mesh, PartitionSpec())
           if mesh is not None else None)

    @jax.jit
    def step(state: TrainState, x, y):
        if data_sh is not None:
            x = jax.lax.with_sharding_constraint(x, data_sh)
            y = jax.lax.with_sharding_constraint(y, data_sh)

        def loss_fn(params):
            out, mut = model.apply({"params": params, **state.extra}, x,
                                   train=True, mutable=mutable)
            return cross_entropy(out, y), (out, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if rep is not None:
            # pin the updated state to replicated so the carried TrainState
            # keeps its placement across steps (GSPMD would otherwise be
            # free to leave per-device shardings on opt-state leaves)
            grads = jax.lax.with_sharding_constraint(grads, jax.tree.map(
                lambda _: rep, grads))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = {**state.extra, **mut}
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return (TrainState(params, extra, opt_state, state.step + 1),
                {"loss": loss, "acc": acc})

    return step


def make_eval_step(model: nn.Module):
    @jax.jit
    def step(variables, x, y):
        logits = model.apply(variables, x, train=False)
        top1 = jnp.argmax(logits, -1) == y
        top5 = jnp.any(jnp.argsort(logits, -1)[:, -5:] == y[:, None], axis=-1)
        return jnp.sum(top1), jnp.sum(top5)

    return step


def evaluate(model: nn.Module, variables: Dict[str, Any], ds: Dataset,
             batch_size: int = 256) -> Tuple[float, float]:
    """(top-1, top-5) accuracy over a dataset."""
    step = make_eval_step(model)
    n = c1 = c5 = 0
    # keep the remainder batch: dropping it silently reported accuracy
    # over a truncated eval set (at most one extra jit shape compiles)
    for x, y in batches(ds, batch_size, shuffle=False, drop_remainder=False):
        t1, t5 = step(variables, jnp.asarray(x), jnp.asarray(y))
        c1 += int(t1); c5 += int(t5); n += len(y)
    if n == 0:
        return 0.0, 0.0
    return c1 / n, c5 / n


def fit(model: nn.Module, train_ds: Dataset, *, epochs: int = 1,
        batch_size: int = 128, lr: float = 1e-3,
        tx: Optional[optax.GradientTransformation] = None,
        key: Optional[jax.Array] = None, state: Optional[TrainState] = None,
        eval_ds: Optional[Dataset] = None, log_every: int = 0,
        json_logs: bool = False, seed: int = 0, mesh=None) -> TrainState:
    """Train ``model`` (fp32 or quantized — QAT works through the same loop).

    ``mesh``: data-parallel training over the mesh's 'data' axis (see
    :func:`make_train_step`); ``batch_size`` is the GLOBAL batch and must
    divide by the axis size.  Reachable from the CLI as
    ``python -m qtpu.examples.run --dp N``.

    ``json_logs=True`` emits one structured JSON line per log event
    (SURVEY.md §5.5 observability) instead of human-readable text.
    """
    import json as _json

    key = key if key is not None else jax.random.PRNGKey(seed)
    tx = tx if tx is not None else optax.adamw(lr)
    if state is None:
        sample = jnp.asarray(train_ds.images[:2])
        state = create_train_state(model, key, sample, tx)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        dp = mesh.shape.get("data", 1)
        if batch_size % dp:
            raise ValueError(f"global batch_size={batch_size} must divide "
                             f"by the data axis ({dp})")
        # replicate the train state once; the step's output constraint
        # keeps it replicated across iterations
        rep = NamedSharding(mesh, PartitionSpec())
        state = jax.tree.map(lambda l: jax.device_put(l, rep), state)
    step = make_train_step(model, tx, mesh=mesh)

    def log(payload: dict, text: str) -> None:
        print(_json.dumps(payload) if json_logs else text, flush=True)

    for epoch in range(epochs):
        for i, (x, y) in enumerate(
                batches(train_ds, batch_size, seed=seed + epoch)):
            state, metrics = step(state, jnp.asarray(x), jnp.asarray(y))
            if log_every and (i % log_every == 0):
                loss, acc = float(metrics["loss"]), float(metrics["acc"])
                log({"event": "train", "epoch": epoch, "step": i,
                     "loss": round(loss, 4), "acc": round(acc, 4)},
                    f"epoch {epoch} step {i}: loss={loss:.4f} acc={acc:.3f}")
        if eval_ds is not None:
            t1, t5 = evaluate(model, state.variables(), eval_ds, batch_size)
            log({"event": "eval", "epoch": epoch, "top1": round(t1, 4),
                 "top5": round(t5, 4)},
                f"epoch {epoch}: eval top1={t1:.4f} top5={t5:.4f}")
    return state
