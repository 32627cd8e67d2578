"""Serve CLI: ``python -m qtpu.serve --config <name>`` — the launchable server.

Assembles the whole north-star serving stack ([B] "continuous batching of
inference requests across hosts, quantized weights tensor-sharded over the
mesh"; reference has no serving story at all — SURVEY.md §1.3 N8, mount
empty §0) into one entry point:

1. ``enable_overlap_flags()``        — collective/compute overlap (libtpu),
2. ``initialize_from_env()``         — multi-host bring-up (QTPU_COORDINATOR
   / QTPU_NUM_PROCESSES / QTPU_PROCESS_ID; no-op single-process),
3. weights — ``--load-frozen`` (orbax tree saved by a previous ``--save-
   frozen``) or build: model from the experiment config, optional
   ``--load-state`` fp32 checkpoint, calibrate on the config's dataset
   (synthetic fallback offline), ``freeze()`` to integer weights,
4. ``('data', 'model')`` mesh — DP over hosts/chips, TP over output channels,
5. :class:`~qtpu.serve.engine.ServingEngine` — flat int8-resident engine for
   ResNet archs, module SERVE path otherwise; optional ``--uint8-ingest``
   (host-side fused normalize+quantize → int8 codes on the wire, 4x less
   transfer — the measured request-latency bottleneck, BASELINE.md),
6. :func:`~qtpu.serve.http_front.serve_http` until SIGINT/SIGTERM.

Every host in a multi-process launch runs this same command (same args,
per-host QTPU_PROCESS_ID); each serves its own HTTP port and the lockstep
schedulers batch across hosts.  ``--round-timeout`` bounds a wedged peer's
blast radius (engine watchdog → 503).
"""
from __future__ import annotations

import argparse
import json
import signal
import sys
import threading
from typing import Optional, Sequence, Tuple

import numpy as np


def build_engine(cfg, *, tp: int = 1, dp: Optional[int] = None,
                 buckets: Sequence[int] = (8, 32, 128),
                 uint8_ingest: bool = False,
                 load_state: Optional[str] = None,
                 torch_ckpt: Optional[str] = None,
                 torch_pad: bool = False,
                 load_frozen: Optional[str] = None,
                 save_frozen: Optional[str] = None,
                 max_wait_ms: float = 2.0,
                 round_timeout_s: Optional[float] = None,
                 mean: Sequence[float] = (0.0,), std: Sequence[float] = (1.0,),
                 stem_dtype=None, pipeline: bool = True,
                 seed: int = 0):
    """Build the full serving stack for an ExperimentConfig; returns
    ``(engine, info)``.  See the module docstring for the assembly order."""
    import jax
    import jax.numpy as jnp

    from qtpu.parallel import make_mesh
    from qtpu.serve.engine import ServingEngine

    key = jax.random.PRNGKey(seed)
    shape = (cfg.image_size, cfg.image_size, 1 if cfg.dataset == "mnist" else 3)

    # Exactly one fp32 weight source may win (ADVICE r3): importing a torch
    # checkpoint AND restoring an orbax state/frozen tree would silently
    # overwrite one with the other.
    if torch_ckpt and (load_state or load_frozen):
        raise SystemExit("--torch-ckpt conflicts with --load-state/"
                         "--load-frozen: pick one fp32 weight source")
    if torch_ckpt:
        from qtpu.data.import_torch import supported_models

        if cfg.model not in supported_models():
            raise SystemExit(
                f"--torch-ckpt: no torch importer for '{cfg.model}' "
                f"(available: {', '.join(supported_models())}; see "
                f"qtpu/data/import_torch.py for why)")
    # torch checkpoints carry torchvision stride-2 geometry
    # (qtpu/data/import_torch.py); the flat engines take the same torch_pad
    # flag and run the explicit-pad geometry bit-for-bit.
    torch_pad = torch_pad or bool(torch_ckpt)
    if load_frozen:
        from qtpu.utils import checkpoint as ckpt

        svars = ckpt.load(load_frozen)
        smodel = _serve_module(cfg, torch_pad=torch_pad)
    else:
        smodel, svars = _freeze_from_config(cfg, key, shape,
                                            load_state=load_state,
                                            torch_ckpt=torch_ckpt)
    if save_frozen:
        from qtpu.utils import checkpoint as ckpt

        ckpt.save(save_frozen, svars)

    n_dev = len(jax.devices())
    if dp is None:
        dp = n_dev // tp
    mesh = make_mesh(dp=dp, tp=tp)

    # Flat int8-resident engine dispatch: ONE shared policy
    # (qtpu.serve.dispatch, also used by qtpu.examples.run — VERDICT r4 #9).
    # stem/fc excludes run fp32 inside the flat engines (the recommended
    # fp32-stem config serves through here); other excludes → module path.
    # --uint8-ingest: int8 codes when the stem is quantized, raw uint8 with
    # on-device normalize when the stem is excluded (the r5 composition).
    from qtpu.serve.dispatch import make_flat_forward

    forward_factory, preprocess_fn, raw_dtype, serve_path = make_flat_forward(
        cfg.model, exclude=cfg.exclude, num_classes=cfg.num_classes,
        image_size=cfg.image_size, width=cfg.width, torch_pad=torch_pad,
        uint8_ingest=uint8_ingest, mean=mean, std=std,
        stem_dtype=stem_dtype)

    engine = ServingEngine(
        smodel, svars, mesh=mesh, batch_buckets=tuple(buckets),
        max_wait_ms=max_wait_ms, forward_factory=forward_factory,
        preprocess_fn=preprocess_fn, raw_dtype=raw_dtype,
        round_timeout_s=round_timeout_s, pipeline=pipeline)
    engine.warmup(shape)
    info = dict(config=cfg.name, model=cfg.model, image_shape=shape,
                mesh=f"dp={dp},tp={tp}", buckets=list(engine.buckets),
                serve_path=serve_path, torch_pad=torch_pad,
                processes=jax.process_count(),
                raw_dtype=str(np.dtype(raw_dtype)))
    return engine, info


def _serve_module(cfg, torch_pad: bool = False):
    """The SERVE-mode module matching a config (structure for frozen vars)."""
    from qtpu.nn import QuantMode
    from qtpu.transform import convert_model, set_mode

    from qtpu.examples.run import build_model

    return set_mode(
        convert_model(build_model(cfg, torch_pad=torch_pad), cfg.policy()),
        QuantMode.SERVE)


def _freeze_from_config(cfg, key, shape, load_state: Optional[str] = None,
                        torch_ckpt: Optional[str] = None):
    """Convert → (restore fp32 state or import a pretrained torch .pth) →
    calibrate → freeze, per the config."""
    import jax
    import jax.numpy as jnp

    from qtpu.data import load_dataset
    from qtpu.transform import calibrate, convert_model, freeze

    from qtpu.examples.run import build_model

    model = build_model(cfg, torch_pad=bool(torch_ckpt))
    qmodel = convert_model(model, cfg.policy())
    ds = load_dataset(cfg.dataset, "train", n=cfg.n_train, seed=0)
    x0 = jnp.asarray(ds.images[:max(2, min(cfg.batch_size, 8))])
    qvars = dict(jax.jit(qmodel.init, static_argnames="train")(
        key, x0, train=True))
    if torch_ckpt:
        from qtpu.data.import_torch import (import_torch_state,
                                            load_torch_checkpoint)

        qvars = dict(import_torch_state(
            cfg.model, load_torch_checkpoint(torch_ckpt), qvars))
    if load_state:
        from qtpu.utils import checkpoint as ckpt

        from qtpu.transform.convert import deep_merge

        restored = ckpt.load(load_state)
        for col in restored:
            if col in qvars:
                qvars[col] = deep_merge(qvars[col], restored[col])
    calib = [jnp.asarray(ds.images[i * cfg.batch_size:
                                   (i + 1) * cfg.batch_size])
             for i in range(cfg.calib_batches)]
    calib = [c for c in calib if len(c)]
    qvars = calibrate(qmodel, qvars, calib)
    return freeze(qmodel, qvars, x0)


def main(argv=None) -> int:
    from qtpu.parallel.distributed import (enable_overlap_flags,
                                           initialize_from_env)
    from qtpu.utils.cache import enable_persistent_cache
    from qtpu.utils.platform import honor_platform_env

    p = argparse.ArgumentParser(prog="python -m qtpu.serve",
                                description=__doc__)
    p.add_argument("--config", required=True,
                   help="experiment config name (qtpu.examples.configs)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--tp", type=int, default=1, help="model-axis size")
    p.add_argument("--dp", type=int, default=None,
                   help="data-axis size (default: devices/tp)")
    p.add_argument("--buckets", default="8,32,128",
                   help="comma-separated batch buckets")
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    p.add_argument("--max-body-mb", type=float, default=256.0,
                   help="reject POST bodies larger than this (HTTP 413)")
    p.add_argument("--round-timeout", type=float, default=None,
                   help="multi-host lockstep round deadline in seconds")
    p.add_argument("--uint8-ingest", action="store_true",
                   help="accept uint8 images; host-side fused "
                        "normalize+quantize to int8 codes (4x less transfer)")
    p.add_argument("--mean", default="0.0",
                   help="per-channel normalize mean(s), for --uint8-ingest")
    p.add_argument("--std", default="1.0",
                   help="per-channel normalize std(s), for --uint8-ingest")
    p.add_argument("--stem-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="excluded-stem conv dtype (measured a wash at B=128 "
                        "— scripts/chip_stem_dtype_ab.py)")
    p.add_argument("--no-pipeline", action="store_true",
                   help="disable the double-buffered scheduler (serial "
                        "upload->forward->download rounds)")
    p.add_argument("--load-state", help="fp32/QAT orbax checkpoint to quantize")
    p.add_argument("--torch-ckpt",
                   help="pretrained torchvision-convention .pth to import as "
                        "the fp32 baseline (torch_pad geometry; serves on "
                        "the flat int8 engines)")
    p.add_argument("--torch-pad", action="store_true",
                   help="with --load-frozen: the frozen tree came from a "
                        "torch_pad (torchvision-geometry) model")
    p.add_argument("--load-frozen", help="orbax tree of frozen serve weights")
    p.add_argument("--save-frozen", help="save the frozen serve weights here")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    enable_overlap_flags()       # before any backend initialization
    honor_platform_env()
    enable_persistent_cache()
    distributed = initialize_from_env()
    import jax.numpy as jnp

    from qtpu.examples.configs import CONFIGS

    if args.config not in CONFIGS:
        p.error(f"unknown config {args.config!r}; "
                f"choices: {', '.join(sorted(CONFIGS))}")
    cfg = CONFIGS[args.config]

    engine, info = build_engine(
        cfg, tp=args.tp, dp=args.dp,
        buckets=tuple(int(b) for b in args.buckets.split(",") if b),
        uint8_ingest=args.uint8_ingest, load_state=args.load_state,
        torch_ckpt=args.torch_ckpt, torch_pad=args.torch_pad,
        load_frozen=args.load_frozen, save_frozen=args.save_frozen,
        max_wait_ms=args.max_wait_ms, round_timeout_s=args.round_timeout,
        mean=[float(v) for v in args.mean.split(",")],
        std=[float(v) for v in args.std.split(",")],
        stem_dtype=(jnp.bfloat16 if args.stem_dtype == "bfloat16" else None),
        pipeline=not args.no_pipeline, seed=args.seed)
    from qtpu.serve.http_front import serve_http

    # Handlers before the server, READY only after the port is bound:
    # a supervisor that terminates on a slow start must still get a clean
    # exit, and a READY reader must never race the bind.
    stop_evt = threading.Event()

    def _sig(_s, _f):
        stop_evt.set()

    signal.signal(signal.SIGINT, _sig)
    signal.signal(signal.SIGTERM, _sig)
    server, thread = serve_http(engine, host=args.host, port=args.port,
                                block=False,
                                max_body_bytes=int(args.max_body_mb * 2**20))
    info.update(distributed=bool(distributed), host=args.host,
                port=int(server.server_address[1]))
    print("QTPU_SERVE_READY " + json.dumps(info), flush=True)
    try:
        while not stop_evt.is_set() and engine.healthy:
            stop_evt.wait(0.5)
    finally:
        server.shutdown()
        engine.stop()
        print("QTPU_SERVE_STOPPED " + json.dumps(engine.stats()), flush=True)
    return 0 if engine._error is None else 1


if __name__ == "__main__":
    sys.exit(main())
