"""Observability: structured train logs and best-effort profiler wrapper."""
import json

import jax
import jax.numpy as jnp

from qtpu.bench.profile import annotate, trace
from qtpu.data import synthetic_dataset
from qtpu.models import get_model
from qtpu.train import fit


def test_json_logs(capsys):
    ds = synthetic_dataset("mnist", "train", n=256)
    model = get_model("lenet5")
    fit(model, ds, epochs=1, batch_size=128, log_every=1, json_logs=True,
        eval_ds=synthetic_dataset("mnist", "test", n=128))
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    events = [json.loads(l) for l in lines]
    kinds = {e["event"] for e in events}
    assert {"train", "eval"} <= kinds
    assert all("loss" in e for e in events if e["event"] == "train")


def test_profiler_wrapper_degrades_gracefully(tmp_path):
    with trace(str(tmp_path)):
        with annotate("layer0"):
            y = jnp.sum(jnp.ones((8, 8)))
    assert float(y) == 64.0
