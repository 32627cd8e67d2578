"""Spatial partitioning — the CNN analog of sequence parallelism.

SURVEY.md §2.3/§5.7: transformers shard the sequence axis (SP/CP/ring
attention); CNNs have no sequence axis, so the honest analog is sharding the
activation *height* dim across devices with **halo exchange** for the conv
windows.  The reference (single device, SURVEY §2.3 [K-high]; mount empty,
§0) has nothing like it; rounds 1-2 documented the omission, this module
implements it so activation-bound regimes (high-resolution inputs, tiny
per-device batch) have a real mechanism instead of a design note.

TPU-native shape:

* a ``'spatial'`` mesh axis; activations sharded ``P(None, 'spatial')`` on H
  (NHWC), weights replicated;
* inside ``shard_map``, each shard pulls the halo rows it needs from its H
  neighbors with two ``lax.ppermute`` s — point-to-point ICI transfers of
  ``(kh−stride)`` rows, NOT an all-gather of the full activation;
* edge shards substitute the conv pad value (0, or the activation zero-point
  ``zp`` for affine int8 grids — the same zero-point-padding rule as
  ``qtpu.ops.qops.qconv2d``);
* the local conv then runs VALID on H: output stays H-sharded with no
  re-layout, so consecutive convs chain without collectives beyond the halos.

Stride-s SAME convs are supported whenever the global H divides the axis and
the local H divides the stride (true for every ResNet/MobileNet stage at
224²/32² inputs on 2-8 way spatial splits).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qtpu.ops.qops import same_pads
from qtpu.utils import debug

Array = jax.Array
SPATIAL_AXIS = "spatial"
DATA_AXIS = "data"


def make_spatial_mesh(sp: int, dp: int = 1,
                      devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """('data', 'spatial') mesh: DP over batch, halo exchange over H."""
    devices = list(devices if devices is not None else jax.devices())
    if dp * sp != len(devices):
        raise ValueError(f"dp*sp = {dp}*{sp} != {len(devices)} devices")
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations: batch over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def _halo_pad_h(x: Array, plo: int, phi: int, *, axis: str, n: int,
                pad_val) -> Array:
    """Concatenate neighbor halo rows onto the local H dim (axis 1).

    Runs inside shard_map.  ``ppermute`` leaves non-receiving shards with
    zeros, so edge shards overwrite their missing halo with ``pad_val``
    (free when pad_val is 0 — jnp.where folds to the received value
    elsewhere and XLA drops the select on interior shards at runtime cost
    ~nothing next to the transfer itself).
    """
    idx = jax.lax.axis_index(axis)
    parts = []
    if plo:
        top = jax.lax.ppermute(x[:, -plo:], axis,
                               [(j, j + 1) for j in range(n - 1)])
        top = jnp.where(idx == 0, jnp.full_like(top, pad_val), top)
        parts.append(top)
    parts.append(x)
    if phi:
        bot = jax.lax.ppermute(x[:, :phi], axis,
                               [(j + 1, j) for j in range(n - 1)])
        bot = jnp.where(idx == n - 1, jnp.full_like(bot, pad_val), bot)
        parts.append(bot)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def spatial_conv2d(x: Array, w: Array, mesh: Mesh, *,
                   strides: Tuple[int, int] = (1, 1),
                   zp: Optional[Array] = None,
                   groups: int = 1) -> Array:
    """SAME conv over H-sharded NHWC activations with halo exchange.

    ``x``: NHWC, fp32 or int8, (to-be-)sharded ``P('data', 'spatial')``;
    ``w``: HWIO, replicated.  int8 inputs contract on the MXU int8 path
    (``preferred_element_type=int32``) and return int32, exactly like
    ``qtpu.ops.qops.qconv2d``; fp32 inputs return fp32.  ``zp`` is the
    affine-activation zero point used as the pad value (int8 only).

    Output is H-sharded with the same spec — chains without re-sharding.
    """
    n = mesh.shape[SPATIAL_AXIS]
    B, H, W, _ = x.shape
    kh, kw = w.shape[:2]
    if H % n:
        raise ValueError(f"global H={H} not divisible by spatial axis ({n})")
    if (H // n) % strides[0]:
        raise ValueError(f"local H={H // n} not divisible by row stride "
                         f"{strides[0]}")
    (plo, phi_pad), (wlo, whi) = same_pads((H, W), (kh, kw), strides)
    # rows needed below the local block: window reach past the last output
    # row's start = kh − stride − plo (clamped); the global SAME pad phi_pad
    # equals it when H divides the stride, but derive it independently so a
    # mismatch fails loudly in tests rather than silently cropping.
    phi = max(kh - strides[0] - plo, 0)
    if phi != phi_pad:
        raise ValueError(f"unsupported pad geometry: phi={phi} != global "
                         f"SAME pad {phi_pad} (H={H}, kh={kh}, s={strides[0]})")
    if max(plo, phi) > H // n:
        # a halo larger than one neighbor's shard would need multi-hop
        # exchange; without this check the slice silently under-fills and
        # the failure surfaces as an opaque GSPMD assertion inside jit
        raise ValueError(
            f"halo rows ({max(plo, phi)}) exceed the local shard height "
            f"({H // n}): kernel {kh} needs H/sp > {max(plo, phi)} — use "
            f"fewer spatial shards or a larger H")
    integer = jnp.issubdtype(x.dtype, jnp.integer)
    if integer:
        debug.check_int_inputs(x, w, what="spatial_conv2d")
    pad_val = (jnp.zeros((), x.dtype) if zp is None
               else jnp.asarray(zp).astype(x.dtype))

    def local(xl: Array, wl: Array) -> Array:
        xl = _halo_pad_h(xl, plo, phi, axis=SPATIAL_AXIS, n=n,
                         pad_val=pad_val)
        if wlo or whi:
            xl = jax.lax.pad(
                xl, pad_val,
                ((0, 0, 0), (0, 0, 0), (wlo, whi, 0), (0, 0, 0)))
        kwargs = dict(window_strides=strides, padding="VALID",
                      dimension_numbers=("NHWC", "HWIO", "NHWC"),
                      feature_group_count=groups)
        if integer:
            return jax.lax.conv_general_dilated(
                xl, wl, preferred_element_type=jnp.int32, **kwargs)
        return jax.lax.conv_general_dilated(xl, wl, **kwargs)

    spec = P(DATA_AXIS if DATA_AXIS in mesh.shape else None, SPATIAL_AXIS)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, P()),
                         out_specs=spec)(x, w)


def spatial_max_pool(x: Array, mesh: Mesh, *, window: Tuple[int, int] = (3, 3),
                     strides: Tuple[int, int] = (2, 2)) -> Array:
    """SAME max-pool over H-sharded NHWC activations (halo exchange).

    The ResNet stem's 3×3/2 max-pool, spatially sharded: same halo geometry
    as :func:`spatial_conv2d`, but the pad/halo fill is the reduction
    identity (dtype min) rather than the conv zero point — XLA's SAME
    pooling semantics exactly.
    """
    n = mesh.shape[SPATIAL_AXIS]
    B, H, W, _ = x.shape
    kh, kw = window
    if H % n or (H // n) % strides[0]:
        raise ValueError(f"H={H} not partitionable by sp={n} at row stride "
                         f"{strides[0]}")
    (plo, phi_pad), (wlo, whi) = same_pads((H, W), window, strides)
    phi = max(kh - strides[0] - plo, 0)
    if phi != phi_pad:
        raise ValueError(f"unsupported pool geometry (H={H}, kh={kh}, "
                         f"s={strides[0]})")
    if max(plo, phi) > H // n:
        raise ValueError(
            f"halo rows ({max(plo, phi)}) exceed the local shard height "
            f"({H // n}) (window {kh}, sp={n})")
    ident = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
             else jnp.iinfo(x.dtype).min)
    ident = jnp.asarray(ident, x.dtype)

    def local(xl: Array) -> Array:
        xl = _halo_pad_h(xl, plo, phi, axis=SPATIAL_AXIS, n=n, pad_val=ident)
        return jax.lax.reduce_window(
            xl, ident, jax.lax.max, (1, kh, kw, 1), (1, *strides, 1),
            ((0, 0), (0, 0), (wlo, whi), (0, 0)))

    spec = P(DATA_AXIS if DATA_AXIS in mesh.shape else None, SPATIAL_AXIS)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec,),
                         out_specs=spec)(x)
