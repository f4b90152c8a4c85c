"""Triangle-mesh rasterization to point clouds.

Equivalent of the reference's `rasterize_mesh` (tensorflow/utils/mesh.py),
used to sample training points from ScanNet meshes: points are sampled on
each face with density ∝ face area (plus the vertices themselves), carrying
interpolated vertex attributes and the face label.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def face_areas(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    a = vertices[faces[:, 1]] - vertices[faces[:, 0]]
    b = vertices[faces[:, 2]] - vertices[faces[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=1)


def rasterize_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    density: float = 1000.0,
    vertex_attrs: Optional[np.ndarray] = None,
    face_labels: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
    include_vertices: bool = True,
):
    """Sample ~`density` points per unit area on a triangle mesh.

    vertices [V,3] float; faces [F,3] int; vertex_attrs [V,C] interpolated
    barycentrically; face_labels [F] copied per sample.

    Returns (points [N,3], attrs [N,C] | None, labels [N] | None).
    """
    rng = rng or np.random.default_rng()
    areas = face_areas(vertices, faces)
    counts = rng.poisson(np.maximum(areas * density, 0.0))
    total = int(counts.sum())

    face_idx = np.repeat(np.arange(len(faces)), counts)
    # uniform barycentric sampling: u,v ~ U(0,1), fold the triangle
    u = rng.random(total)
    v = rng.random(total)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    w = 1 - u - v
    bary = np.stack([w, u, v], axis=1)  # [N, 3]

    tri = vertices[faces[face_idx]]  # [N, 3, 3]
    pts = np.einsum("nk,nkd->nd", bary, tri)

    attrs = None
    if vertex_attrs is not None:
        va = vertex_attrs[faces[face_idx]]  # [N, 3, C]
        attrs = np.einsum("nk,nkc->nc", bary, va)
    labels = face_labels[face_idx] if face_labels is not None else None

    if include_vertices:
        pts = np.concatenate([pts, vertices])
        if attrs is not None:
            attrs = np.concatenate([attrs, vertex_attrs])
        if labels is not None:
            # vertex label = label of a face containing it (last write wins,
            # deterministic given face order)
            vlab = np.full(len(vertices), -1, labels.dtype)
            for c in range(3):
                vlab[faces[:, c]] = face_labels
            labels = np.concatenate([labels, vlab])
    return pts.astype(np.float32), (
        attrs.astype(np.float32) if attrs is not None else None
    ), (labels if labels is None else labels.astype(np.int64))
