"""Static voxel binning — the TPU-native replacement for the PCL octree.

The reference partitions the cloud with `pcl::octree::OctreePointCloudSearch`
plus a custom leaf carrying a gp_index (src/gp_octree.h:19-27,
src/gp_leaf.h:7-13) and gathers each patch's points with a radiusSearch of
r = sqrt(3)/2 * res around the voxel center (src/gp_compressor.cpp:194,220).

Here the octree disappears: voxel keys are a quantisation, the leaf table is
a sorted unique over linearised keys (static `max_patches` bound), and the
radius search becomes a gather over each point's 27-neighbourhood — every
point can only fall inside the search sphere of a voxel adjacent to its own.
Leaf order (and therefore gp_index numbering and contested-point claiming)
is lexicographic in (kx, ky, kz); the reference's depth-first octree order
is a different but equally arbitrary fixed order, so semantics are
preserved patch-for-patch (documented divergence).

All functions are shape-static and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

SQRT3_2 = 0.8660254037844386  # sqrt(3)/2

# 27 neighbour offsets, home voxel first is not required — claiming uses
# leaf order, not offset order.
_OFFSETS = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=jnp.int32)


class VoxelGrid(NamedTuple):
    """Sorted leaf table over a point cloud.

    keys:      [max_patches] linearised voxel keys, ascending; INT32_MAX fill
    n_leaves:  scalar int32 — number of real leaves
    origin:    [3] grid origin (min corner)
    dims:      [3] int32 grid extents
    res:       scalar voxel edge
    table:     optional [max_cells] dense linear-key -> leaf-index map
               (-1 = none); replaces O(log B) searchsorted lookups with
               O(1) gathers when the world fits the static cell budget
    """

    keys: jnp.ndarray
    n_leaves: jnp.ndarray
    origin: jnp.ndarray
    dims: jnp.ndarray
    res: jnp.ndarray
    table: Optional[jnp.ndarray] = None


_FILL = jnp.iinfo(jnp.int32).max


def point_keys(points: jnp.ndarray, origin: jnp.ndarray, res) -> jnp.ndarray:
    """[N, 3] float -> [N, 3] int32 voxel keys."""
    return jnp.floor((points - origin) / res).astype(jnp.int32)


def linearize(keys3: jnp.ndarray, dims: jnp.ndarray) -> jnp.ndarray:
    """[.., 3] int keys -> linear key; invalid (out-of-grid) -> _FILL."""
    ok = jnp.all((keys3 >= 0) & (keys3 < dims), axis=-1)
    lin = (keys3[..., 0] * dims[1] + keys3[..., 1]) * dims[2] + keys3[..., 2]
    return jnp.where(ok, lin, _FILL)


def delinearize(lin: jnp.ndarray, dims: jnp.ndarray) -> jnp.ndarray:
    kz = lin % dims[2]
    rem = lin // dims[2]
    ky = rem % dims[1]
    kx = rem // dims[1]
    return jnp.stack([kx, ky, kz], axis=-1)


def build_grid(points: jnp.ndarray, valid: jnp.ndarray, res,
               max_patches: int, max_cells: int = 0) -> VoxelGrid:
    """Construct the leaf table. points: [N, 3], valid: [N] bool.
    max_cells > 0 additionally builds the dense lookup table (cells
    outside the budget fall back to searchsorted)."""
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    p_lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    p_hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    dims = jnp.maximum(
        jnp.floor((p_hi - p_lo) / res).astype(jnp.int32) + 1, 1)
    keys3 = point_keys(points, p_lo, res)
    lin = jnp.where(valid, linearize(keys3, dims), _FILL)

    def _dense(lin):
        # O(max_cells) unique: presence histogram + cumsum compaction.
        # Avoids the O(N log^2 N) bitonic sort when the world fits the
        # dense-cell budget; keeps the same ascending key order and the
        # same keep-the-B-smallest overflow behaviour as jnp.unique.
        presence = jnp.zeros((max_cells,), jnp.int32).at[lin].set(
            1, mode='drop')                       # _FILL/oob keys drop out
        rank = jnp.cumsum(presence)
        tgt = jnp.where(presence > 0, rank - 1, max_patches)
        uniq = jnp.full((max_patches,), _FILL, jnp.int32).at[tgt].set(
            jnp.arange(max_cells, dtype=jnp.int32), mode='drop')
        return uniq, jnp.minimum(rank[-1], max_patches).astype(jnp.int32)

    def _sorted(lin):
        uniq = jnp.unique(lin, size=max_patches, fill_value=_FILL)
        return uniq, jnp.sum(uniq != _FILL).astype(jnp.int32)

    if max_cells > 0:
        # f32 product is exact for dims < 2^24 per axis; only the
        # <= max_cells (< 2^24) comparison matters
        fits = (dims[0].astype(jnp.float32) * dims[1] * dims[2]) <= max_cells
        uniq, n = jax.lax.cond(fits, _dense, _sorted, lin)
    else:
        uniq, n = _sorted(lin)
    table = None
    if max_cells > 0:
        real = uniq != _FILL
        tgt = jnp.where(real & (uniq < max_cells), uniq, max_cells)
        table = jnp.full((max_cells,), -1, jnp.int32).at[tgt].set(
            jnp.arange(max_patches, dtype=jnp.int32), mode='drop')
    return VoxelGrid(keys=uniq, n_leaves=n, origin=p_lo, dims=dims,
                     res=jnp.asarray(res, points.dtype), table=table)


def lookup(grid: VoxelGrid, lin: jnp.ndarray):
    """Linear keys -> (leaf index a.k.a. gp_index, exists mask)."""
    if grid.table is not None:
        nc = grid.table.shape[0]
        safe = jnp.clip(lin, 0, nc - 1)
        idx = grid.table[safe]
        in_table = (lin >= 0) & (lin < nc) & (lin != _FILL)
        exists = in_table & (idx >= 0)
        return jnp.where(exists, idx, 0).astype(jnp.int32), exists
    idx = jnp.searchsorted(grid.keys, lin)
    idx = jnp.minimum(idx, grid.keys.shape[0] - 1)
    exists = (grid.keys[idx] == lin) & (lin != _FILL)
    return idx.astype(jnp.int32), exists


def voxel_centers(grid: VoxelGrid) -> jnp.ndarray:
    """[max_patches, 3] centers of the leaf voxels (reference:
    gp_octree::generate_voxel_center, src/gp_octree.cpp:8-11)."""
    keys3 = delinearize(jnp.minimum(grid.keys, _FILL - 1), grid.dims)
    return grid.origin + (keys3.astype(grid.origin.dtype) + 0.5) * grid.res


def candidate_at_offset(grid: VoxelGrid, points: jnp.ndarray,
                        valid: jnp.ndarray, offset) -> tuple:
    """Leaf candidacy of each point at ONE of its 27 neighbour offsets.

    Returns (idx [N] gp_index, ok [N] bool, centers [N, 3]). `ok` requires:
    leaf exists, point valid, and the point lies within the search sphere
    r = sqrt(3)/2 * res of that leaf's voxel center — the radiusSearch
    gather of src/gp_compressor.cpp:220. Processing one offset at a time
    keeps front-end memory O(N) instead of O(27 N) at Kinect scale.
    """
    keys3 = point_keys(points, grid.origin, grid.res)            # [N, 3]
    cand3 = keys3 + jnp.asarray(offset, jnp.int32)[None, :]
    lin = linearize(cand3, grid.dims)                            # [N]
    idx, exists = lookup(grid, lin)
    centers = grid.origin + (cand3.astype(points.dtype) + 0.5) * grid.res
    d2 = jnp.sum((points - centers) ** 2, axis=-1)
    radius2 = (SQRT3_2 * grid.res) ** 2
    ok = exists & valid & (d2 <= radius2)
    return idx, ok, centers
