"""Device-side voxel-grid scan downsampling.

Replaces the reference's pcl::VoxelGrid (`downSizeFilterSurf`, reference
src/voxel_mapping.cpp:1888-1891) and its own `down_sampling_voxel` grid
average (:1162-1219) with a statically-shaped segment-mean: quantize →
scan-local 30-bit pack → unique(size=K) → segment mean.  Output is (K, 3)
with a validity mask; if the scan has more than K occupied cells the largest
packed keys are dropped (spatially-biased but bounded — raise K in config).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def voxel_downsample(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     k_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pts: (N, 3), mask: (N,) → ((K, 3) cell means, (K,) mask)."""
    c = jnp.floor(pts / leaf).astype(jnp.int32)
    big = jnp.int32(1 << 20)
    cmin = jnp.min(jnp.where(mask[:, None], c, big), axis=0)
    local = jnp.clip(c - cmin, 0, 1023)
    pack = local[:, 0] + (local[:, 1] << 10) + (local[:, 2] << 20)
    pack = jnp.where(mask, pack, jnp.int32(1 << 30))

    uniq = jnp.unique(pack, size=k_out, fill_value=jnp.int32(1 << 30))
    # method='sort': one VMEM-resident sort instead of a binary-search
    # while-loop of N-lane gathers (measured ~13 ms/frame at 131k pts)
    seg = jnp.searchsorted(uniq, pack, method="sort").astype(jnp.int32)
    ok = (uniq[jnp.clip(seg, 0, k_out - 1)] == pack) & mask
    seg = jnp.where(ok, seg, k_out)

    w = ok.astype(pts.dtype)
    feats = jnp.concatenate([pts * w[:, None], w[:, None]], axis=-1)
    agg = jax.ops.segment_sum(feats, seg, num_segments=k_out + 1)[:-1]
    cnt = jnp.maximum(agg[:, 3], 1.0)
    out = agg[:, 0:3] / cnt[:, None]
    out_mask = (uniq != (1 << 30)) & (agg[:, 3] > 0)
    return out, out_mask
