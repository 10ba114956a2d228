"""Device-side voxel-grid scan downsampling.

Replaces the reference's pcl::VoxelGrid (`downSizeFilterSurf`, reference
src/voxel_mapping.cpp:1888-1891) and its own `down_sampling_voxel` grid
average (:1162-1219) with a statically-shaped segment-mean: quantize →
exact coordinate dedup (map/hash.frame_unique_coords) → segment mean.
Output is (K, 3) with a validity mask; if the scan has more than K occupied
cells the lexicographically-largest cells are dropped (spatially-biased but
bounded — raise K in config).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from immesh_tpu.map.hash import frame_unique_coords


def voxel_downsample(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     k_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pts: (N, 3), mask: (N,) → ((K, 3) cell means, (K,) mask)."""
    c = jnp.floor(pts / leaf).astype(jnp.int32)
    seg, first, _ = frame_unique_coords(c, mask, k_out)
    ok = seg < k_out

    w = ok.astype(pts.dtype)
    feats = jnp.concatenate([pts * w[:, None], w[:, None]], axis=-1)
    agg = jax.ops.segment_sum(
        feats, jnp.where(ok, seg, k_out), num_segments=k_out + 1)[:-1]
    cnt = jnp.maximum(agg[:, 3], 1.0)
    out = agg[:, 0:3] / cnt[:, None]
    out_mask = (first < pts.shape[0]) & (agg[:, 3] > 0)
    return out, out_mask
