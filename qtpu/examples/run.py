"""Experiment runner CLI: ``python -m qtpu.examples.run --config <name>``.

Covers the reference's example-script layer (SURVEY.md §1.2 R1; mount empty,
§0) for the five BASELINE.json configs: fp32 train → quantize (PTQ calibrate or
QAT fine-tune) → eval, reporting fp32/quant top-1/top-5 and the delta as one
JSON line (structured stdout per SURVEY.md §5.5).

Any ExperimentConfig field can be overridden: ``--set fp32_epochs=5``.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from qtpu.data import load_dataset
from qtpu.examples.configs import CONFIGS, ExperimentConfig
from qtpu.models import get_model
from qtpu.nn import QuantMode
from qtpu.train import TrainState, evaluate, fit
from qtpu.transform import (calibrate, convert_model, quantize_variables,
                            set_mode)
from qtpu.utils.cache import enable_persistent_cache


def build_model(cfg: ExperimentConfig, quant=None, torch_pad: bool = False):
    kwargs = dict(num_classes=cfg.num_classes, quant=quant)
    if cfg.model.startswith("resnet"):
        kwargs["cifar_stem"] = cfg.cifar_stem
        if cfg.width is not None:
            kwargs["width"] = cfg.width
    if torch_pad:
        # torchvision checkpoint geometry (qtpu/data/import_torch.py)
        kwargs["torch_pad"] = True
    return get_model(cfg.model, **kwargs)


def run_experiment(cfg: ExperimentConfig, seed: int = 0, verbose: bool = True,
                   save_state: Optional[str] = None,
                   load_state: Optional[str] = None,
                   torch_ckpt: Optional[str] = None,
                   dp: Optional[int] = None) -> dict:
    enable_persistent_cache()
    if torch_ckpt:
        # validate against the importer registry BEFORE building the model:
        # unsupported models (lenet5, mobilenet_v1 — no torchvision naming
        # convention) must fail with the registry's explanation, not an
        # opaque 'unexpected keyword torch_pad' dataclass error.
        from qtpu.data.import_torch import supported_models

        if cfg.model not in supported_models():
            raise SystemExit(
                f"--torch-ckpt: no torch importer for '{cfg.model}' "
                f"(available: {', '.join(supported_models())}; see "
                f"qtpu/data/import_torch.py for why)")
    # --dp N: data-parallel training over a ('data',) mesh of N devices
    # (SURVEY.md §2.3 DP row — batch sharded, params replicated, grads
    # psum'd by GSPMD; see qtpu.train.make_train_step)
    mesh = None
    if dp is not None and dp > 1:
        from qtpu.parallel import make_mesh

        mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
    key = jax.random.PRNGKey(seed)
    train_ds = load_dataset(cfg.dataset, "train", n=cfg.n_train, seed=seed)
    eval_ds = load_dataset(cfg.dataset, "test", n=cfg.n_eval, seed=seed)

    # --- fp32 baseline (train, resume from an orbax checkpoint, or import
    # a pretrained torch/torchvision .pth — the reference's model-zoo entry
    # workflow, SURVEY.md §1.2 R1/R6) ---
    model = build_model(cfg, torch_pad=bool(torch_ckpt))
    if torch_ckpt:
        from qtpu.data.import_torch import (import_torch_state,
                                            load_torch_checkpoint)
        from qtpu.train import create_train_state

        tx = optax.adamw(cfg.lr)
        state = create_train_state(model, key,
                                   jnp.asarray(train_ds.images[:2]), tx)
        imported = import_torch_state(
            cfg.model, load_torch_checkpoint(torch_ckpt), state.variables())
        state = state.replace(params=imported["params"],
                              extra={k: v for k, v in imported.items()
                                     if k != "params"})
    elif load_state:
        from qtpu.train import create_train_state
        from qtpu.utils import checkpoint as ckpt

        tx = optax.adamw(cfg.lr)
        state = create_train_state(model, key,
                                   jnp.asarray(train_ds.images[:2]), tx)
        restored = ckpt.load(load_state, target=state.variables())
        state = state.replace(params=restored["params"],
                              extra={k: v for k, v in restored.items()
                                     if k != "params"})
    else:
        state = fit(model, train_ds, epochs=cfg.fp32_epochs,
                    batch_size=cfg.batch_size, lr=cfg.lr, seed=seed,
                    log_every=50 if verbose else 0, mesh=mesh)
    if save_state:
        from qtpu.utils import checkpoint as ckpt

        ckpt.save(save_state, dict(state.variables()))
    fp32_top1, fp32_top5 = evaluate(model, state.variables(), eval_ds,
                                    cfg.batch_size)

    # --- quantize ---
    qmodel = convert_model(model, cfg.policy())
    # deep-merge: keeps quantizer-owned params (e.g. PACT alphas) that the
    # fp32 baseline never had
    qvars = quantize_variables(qmodel, state.variables(),
                               jnp.asarray(train_ds.images[:2]), rng=key,
                               train=True)

    if cfg.method == "ptq":
        calib = [jnp.asarray(train_ds.images[i * cfg.batch_size:
                                             (i + 1) * cfg.batch_size])
                 for i in range(cfg.calib_batches)]
        calib = [c for c in calib if len(c) == cfg.batch_size]
        qvars = calibrate(qmodel, qvars, calib)
        eval_model = set_mode(qmodel, QuantMode.QUANT)
    elif cfg.method == "qat":
        tx = optax.adamw(cfg.qat_lr)
        qparams = qvars.pop("params")
        qstate = TrainState(params=qparams, extra=qvars,
                            opt_state=tx.init(qparams),
                            step=jnp.zeros((), jnp.int32))
        qstate = fit(qmodel, train_ds, epochs=cfg.qat_epochs,
                     batch_size=cfg.batch_size, tx=tx, state=qstate,
                     seed=seed + 1, log_every=50 if verbose else 0,
                     mesh=mesh)
        qvars = qstate.variables()
        eval_model = qmodel          # QUANT_EMA: frozen stats used in eval
    else:  # online
        eval_model = qmodel

    q_top1, q_top5 = evaluate(eval_model, qvars, eval_ds, cfg.batch_size)

    serve_stats = None
    if cfg.serve:
        # BASELINE.json config 4: freeze to integer weights and serve the
        # eval set through the sharded continuous-batching engine.
        from qtpu.parallel import make_mesh
        from qtpu.serve import ServingEngine
        from qtpu.transform import freeze

        smodel, svars = freeze(eval_model, qvars,
                               jnp.asarray(train_ds.images[:2]))
        n_dev = len(jax.devices())
        tp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
        # Flat-engine dispatch: ONE shared policy (qtpu.serve.dispatch, also
        # used by the serve CLI — VERDICT r4 #9).  stem/fc excludes run
        # fp32 inside the flat engines (tests/test_engine.py::
        # test_engine_fp32_stem_headline_config); other excludes → module
        # path.  Imported torch checkpoints carry torchvision geometry; the
        # flat engines run the same explicit pads.
        from qtpu.serve.dispatch import make_flat_forward

        forward_factory, _, _, serve_path = make_flat_forward(
            cfg.model, exclude=cfg.exclude, num_classes=cfg.num_classes,
            image_size=cfg.image_size, width=cfg.width,
            torch_pad=bool(torch_ckpt))
        engine = ServingEngine(smodel, svars,
                               mesh=make_mesh(dp=n_dev // tp, tp=tp),
                               batch_buckets=(cfg.batch_size,),
                               forward_factory=forward_factory)
        shape = eval_ds.images.shape[1:]
        engine.warmup(shape)
        n_serve = min(len(eval_ds.images), 4 * cfg.batch_size)
        preds = engine.predict(eval_ds.images[:n_serve])
        serve_top1 = float(
            (preds.argmax(-1) == eval_ds.labels[:n_serve]).mean())
        serve_stats = {**{k: round(float(vv), 2)
                          for k, vv in engine.stats().items()},
                       "serve_top1": round(serve_top1, 4),
                       "mesh": f"dp={n_dev // tp},tp={tp}",
                       "serve_path": serve_path}
        engine.stop()

    result = {
        "config": cfg.name,
        "dataset": cfg.dataset,
        "synthetic_data": bool(train_ds.synthetic),
        "fp32_top1": round(fp32_top1, 4), "fp32_top5": round(fp32_top5, 4),
        "quant_top1": round(q_top1, 4), "quant_top5": round(q_top5, 4),
        "top1_delta": round(fp32_top1 - q_top1, 4),
        "top5_delta": round(fp32_top5 - q_top5, 4),
        "w_bits": cfg.w_bits, "a_bits": cfg.a_bits,
        "method": cfg.method, "act_observer": cfg.act_observer,
    }
    if serve_stats is not None:
        result["serving"] = serve_stats
    print(json.dumps(result), flush=True)
    return result


def main(argv=None) -> int:
    from qtpu.utils.platform import honor_platform_env

    honor_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, choices=sorted(CONFIGS))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--set", action="append", default=[],
                   help="override config fields, e.g. --set fp32_epochs=5")
    p.add_argument("--save-state", help="save fp32 baseline variables (orbax)")
    p.add_argument("--load-state", help="resume fp32 baseline from checkpoint")
    p.add_argument("--torch-ckpt",
                   help="import a pretrained torchvision-convention .pth as "
                        "the fp32 baseline (skips fp32 training; implies "
                        "torch_pad geometry)")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel training over N devices (batch "
                        "sharded over a 'data' mesh axis, grads psum'd)")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)

    cfg = CONFIGS[args.config]
    for override in args.set:
        k, _, v = override.partition("=")
        if not hasattr(cfg, k):
            p.error(f"unknown config field {k!r}")
        field_type = type(getattr(cfg, k))
        if field_type is bool:
            value = v.lower() in ("1", "true", "yes")
        elif field_type is tuple:
            value = tuple(s for s in v.split(",") if s)
        elif getattr(cfg, k) is None:
            value = int(v)
        else:
            value = field_type(v)
        cfg = dataclasses.replace(cfg, **{k: value})
    run_experiment(cfg, seed=args.seed, verbose=not args.quiet,
                   save_state=args.save_state, load_state=args.load_state,
                   torch_ckpt=args.torch_ckpt, dp=args.dp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
