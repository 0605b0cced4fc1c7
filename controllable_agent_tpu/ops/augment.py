"""Random-shift image augmentation (DrQ-style) as a pure JAX op.

The reference's RandomShiftsAug (url_benchmark/utils.py:258-290) replicate-
pads by ``pad`` and bilinearly resamples at a grid offset by a *random
integer* number of pixels (torch.randint), i.e. the bilinear grid_sample
degenerates to an exact integer translation. The TPU-native formulation:
replicate-pad + two batched row/column gathers (take_along_axis).

Do NOT write this as a vmapped dynamic_slice: on real TPU that lowers to
one dynamic-update-slice PER SAMPLE, serializing the batch (measured 85%
of the whole DDPG pixel update). Batched gathers run as two vectorized
ops.

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
    rows = shifts[:, 0, None] + jnp.arange(h)  # [B, H]
    cols = shifts[:, 1, None] + jnp.arange(w)  # [B, W]
    out = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)
    return jnp.take_along_axis(out, cols[:, None, :, None], axis=2)
