"""On-device training augmentations, fused into the jitted train step.

Semantics of ``getDefaultTrainTransform`` (``src/data.py:162-168``):
RandomHorizontalFlip p=0.5 on image+depth (``:27-29``), RandomChannelSwap
p=0.5 with a uniformly random RGB permutation (identity included, ``:39-46``).
Where the reference runs these per-sample on the host through PIL, here they
are jnp ops inside the XLA graph (vectorized per-sample via batched selects),
so the host pipeline stays decode-only and augmentation costs ~0 (fused into
the first conv's input read).
"""

from __future__ import annotations

from itertools import permutations
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# list(permutations(range(3))) matches the reference's indices table order
_PERMS = np.asarray(list(permutations(range(3))), dtype=np.int32)  # [6, 3]


def augment_batch(
    rng: jax.Array, image: jax.Array, depth: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-sample random flip + channel swap on an NHWC batch."""
    b = image.shape[0]
    k_flip, k_swap_p, k_swap_i = jax.random.split(rng, 3)

    do_flip = jax.random.uniform(k_flip, (b,)) < 0.5
    flipped_img = jnp.flip(image, axis=2)
    flipped_dep = jnp.flip(depth, axis=2)
    image = jnp.where(do_flip[:, None, None, None], flipped_img, image)
    depth = jnp.where(do_flip[:, None, None, None], flipped_dep, depth)

    do_swap = jax.random.uniform(k_swap_p, (b,)) < 0.5
    # randint(0, len-1) inclusive in the reference -> maxval=len(_PERMS)
    perm_idx = jax.random.randint(k_swap_i, (b,), 0, len(_PERMS))
    perms = jnp.asarray(_PERMS)[perm_idx]  # [b, 3]
    swapped = jnp.take_along_axis(image, perms[:, None, None, :], axis=-1)
    image = jnp.where(do_swap[:, None, None, None], swapped, image)
    return image, depth
