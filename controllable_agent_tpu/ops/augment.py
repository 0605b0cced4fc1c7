"""Random-shift image augmentation (DrQ-style) as a pure JAX op.

The reference's RandomShiftsAug (url_benchmark/utils.py:258-290) replicate-
pads by ``pad`` and bilinearly resamples at a grid offset by a *random
integer* number of pixels (torch.randint), i.e. the bilinear grid_sample
degenerates to an exact integer translation. The TPU-native formulation
exploits that directly: replicate-pad + one per-sample dynamic_slice —
no gather/grid_sample, fully fusible under vmap/jit.

Layout is NHWC (TPU-preferred), vs the reference's NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def random_shift_aug(key: jax.Array, imgs: Array, pad: int = 4) -> Array:
    """Per-image random integer translation in [-pad, pad].

    imgs: [B, H, W, C] (any float/int dtype; returned unchanged in dtype).
    """
    b, h, w, c = imgs.shape
    padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")
    shifts = jax.random.randint(key, (b, 2), 0, 2 * pad + 1)

    def slice_one(img: Array, sh: Array) -> Array:
        return jax.lax.dynamic_slice(img, (sh[0], sh[1], 0), (h, w, c))

    return jax.vmap(slice_one)(padded, shifts)
