"""Focused qivr repro: same geometry, vary ONLY images-per-step (grid count)."""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from chip_qivr_parity import _blocks, _ref, _stack

from qtpu.ops.pallas.qivr import ivr_coeffs, qivr_fused

KEY = jax.random.PRNGKey(3)


def main() -> int:
    next_grid = (jnp.float32(0.018), jnp.int32(-2))
    # the failing bench geometry: H=28, C=32, E=192, nrun=2 (k was 4, grid 32)
    for (H, C, E, nrun, B, k) in [
            (28, 32, 192, 2, 8, 8),    # grid=1
            (28, 32, 192, 2, 8, 4),    # grid=2
            (28, 32, 192, 2, 8, 2),    # grid=4
            (28, 32, 192, 2, 8, 1),    # grid=8  (mb=784, %8==0)
            (28, 32, 192, 2, 32, 4),   # grid=8 at the bench's k
            (14, 96, 576, 2, 32, 16),  # bench run@11 shape, grid=2
            (14, 96, 576, 2, 32, 4),   # grid=8
    ]:
        blocks = _blocks(jax.random.fold_in(KEY, E * 7 + nrun), nrun, C, E)
        x = jax.random.randint(jax.random.fold_in(KEY, E + H),
                               (B, H, H, C), -128, 128, jnp.int8)
        ref = np.asarray(_ref(x, blocks, next_grid))
        out = qivr_fused(x.reshape(-1, C), **_stack(blocks, C, E),
                         **ivr_coeffs(blocks, next_grid), h=H, w=H, k=k)
        out = np.asarray(out).reshape(ref.shape)
        bad = int(np.sum(out != ref))
        where = ""
        if bad:
            idx = np.argwhere(out != ref)
            im = np.unique(idx[:, 0])
            hs = np.unique(idx[:, 1])
            where = (f" imgs={im[:8].tolist()} rows={hs[:8].tolist()}"
                     f" maxdiff={int(np.max(np.abs(out.astype(np.int32) - ref.astype(np.int32))))}")
        print(f"H={H} C={C} E={E} nrun={nrun} B={B} k={k} "
              f"grid={B // k}: {'exact' if not bad else f'INEXACT {bad}'}"
              f"{where}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
