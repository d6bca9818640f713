"""Marching tetrahedra iso-surface extraction (numpy, vectorized).

Replaces the reference's open3d/mcubes marching cubes (utils/mcube_utils.py).
Each grid cube is split into 6 tetrahedra; each tetrahedron with a sign change
emits 1-2 triangles with edge-interpolated vertices. Table-free and fully
vectorized; produces slightly more triangles than marching cubes but an
equivalent surface.
"""

from __future__ import annotations

import numpy as np

# 6-tetrahedra decomposition of a cube (corner ids 0..7 with bit order x,y,z:
# corner = x + 2y + 4z)
_TETS = np.array([
    [0, 5, 1, 3],
    [0, 5, 3, 7],
    [0, 5, 7, 4],
    [0, 7, 3, 2],
    [0, 7, 2, 6],
    [0, 7, 6, 4],
], dtype=np.int32)

_CORNER_OFFSETS = np.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)],
    dtype=np.int32)[:, :]  # index = x + 2y + 4z ordering below
_CORNER_OFFSETS = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1]
                            for i in range(8)], dtype=np.int32)


def marching_tetrahedra(values: np.ndarray, level: float = 0.0,
                        origin=(0.0, 0.0, 0.0), spacing: float = 1.0):
    """values: [X,Y,Z] scalar field. Returns (verts [V,3] float32,
    faces [F,3] int32). Vertices are deduplicated per shared edge."""
    X, Y, Z = values.shape
    if min(X, Y, Z) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    v = values - level

    # cube corner scalar values: [X-1,Y-1,Z-1,8]
    idx = np.stack(np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                               np.arange(Z - 1), indexing="ij"), axis=-1)
    corners = idx[..., None, :] + _CORNER_OFFSETS[None, None, None]
    cv = v[corners[..., 0], corners[..., 1], corners[..., 2]]  # [...,8]
    cube_pos = idx.reshape(-1, 3)
    cv = cv.reshape(-1, 8)

    # only keep cubes crossing the level
    cross = (cv.min(axis=1) < 0) & (cv.max(axis=1) >= 0)
    cv = cv[cross]
    cube_pos = cube_pos[cross]
    if len(cv) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    tv = cv[:, _TETS]                        # [C,6,4] values
    tcorn = _TETS[None].repeat(len(cv), 0)   # [C,6,4] corner ids
    tv = tv.reshape(-1, 4)
    tcorn = tcorn.reshape(-1, 4)
    tcube = np.repeat(np.arange(len(cv)), 6)

    inside = tv < 0                          # [T,4]
    code = (inside * np.array([1, 2, 4, 8])).sum(axis=1)
    active = (code > 0) & (code < 15)
    tv, tcorn, tcube, code = tv[active], tcorn[active], tcube[active], code[active]

    # canonical edge list per sign code: each case yields 1 or 2 triangles
    # over the edges separating inside from outside. Edges of a tet: (a,b)
    # corner-index pairs.
    EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
    # triangle edge-id triples per code (standard marching-tets table),
    # -1 padding for single-triangle cases
    TRI_TABLE = {
        1: [[0, 1, 2]], 14: [[0, 2, 1]],
        2: [[0, 4, 3]], 13: [[0, 3, 4]],
        4: [[1, 3, 5]], 11: [[1, 5, 3]],
        8: [[2, 5, 4]], 7: [[2, 4, 5]],
        3: [[1, 2, 4], [1, 4, 3]], 12: [[1, 4, 2], [1, 3, 4]],
        5: [[0, 3, 5], [0, 5, 2]], 10: [[0, 5, 3], [0, 2, 5]],
        6: [[0, 4, 5], [0, 5, 1]], 9: [[0, 5, 4], [0, 1, 5]],
    }

    tri_edge_ids = []
    tri_tet_ids = []
    for c, tris in TRI_TABLE.items():
        sel = np.nonzero(code == c)[0]
        if len(sel) == 0:
            continue
        for tri in tris:
            tri_edge_ids.append(np.tile(np.array(tri), (len(sel), 1)))
            tri_tet_ids.append(sel)
    if not tri_edge_ids:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tri_edge_ids = np.concatenate(tri_edge_ids)   # [F,3] edge id within tet
    tri_tet_ids = np.concatenate(tri_tet_ids)     # [F]

    # interpolate vertices on the 3 edges of each face
    ea = EDGES[tri_edge_ids][..., 0]              # [F,3] corner a (tet-local)
    eb = EDGES[tri_edge_ids][..., 1]
    ca = np.take_along_axis(tcorn[tri_tet_ids], ea, axis=1)  # cube corner ids
    cb = np.take_along_axis(tcorn[tri_tet_ids], eb, axis=1)
    va = np.take_along_axis(tv[tri_tet_ids], ea, axis=1)
    vb = np.take_along_axis(tv[tri_tet_ids], eb, axis=1)
    base = cube_pos[tcube[tri_tet_ids]][:, None, :]          # [F,1,3]
    pa = base + _CORNER_OFFSETS[ca]
    pb = base + _CORNER_OFFSETS[cb]
    t = va / (va - vb + 1e-12)
    pts = pa + t[..., None] * (pb - pa)           # [F,3,3] grid coords

    # dedup shared-edge vertices: key on (global corner a, corner b) sorted
    def corner_key(base_pos, off_id):
        g = base_pos + _CORNER_OFFSETS[off_id]
        return (g[..., 0].astype(np.int64) * (Y * Z)
                + g[..., 1].astype(np.int64) * Z + g[..., 2].astype(np.int64))

    ka = corner_key(base, ca)
    kb = corner_key(base, cb)
    lo = np.minimum(ka, kb)
    hi = np.maximum(ka, kb)
    ekey = lo * (X * Y * Z) + hi
    flat_key = ekey.reshape(-1)
    uniq, inv = np.unique(flat_key, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float32)
    verts[inv] = pts.reshape(-1, 3).astype(np.float32)
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    faces = faces[good]
    verts = verts * spacing + np.asarray(origin, np.float32)
    return verts, faces
