"""One-time ScanNet raw → npy conversion.

Equivalent of the reference's ScanNet preparation
(tensorflow/datasets/tf_scannet_dataset.py: mesh rasterization via
utils/mesh.py + label remap): reads each scene's
  <scene>_vh_clean_2.ply          (vertices x,y,z,red,green,blue + faces)
  <scene>_vh_clean_2.labels.ply   (per-vertex raw label ids)
rasterizes the mesh at `density` points/m² (vertex colors interpolated,
face label = majority of its vertices) and writes `<out>/<scene>.npy`
float32 [N, 7] xyzrgb + RAW label id (ScanNetDataset remaps to the 20-class
benchmark at load time).
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from ..utils.mesh import rasterize_mesh
from ..utils.ply import read_ply


def _read_faces(path: str) -> np.ndarray:
    """Vertex-index triples from a ply's face element. The generic reader
    handles only vertex elements, so faces are parsed here (binary LE,
    uchar count + int32 indices — ScanNet's layout)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a ply")
        n_vert = n_face = 0
        vert_size = 0
        in_vertex = False
        while True:
            line = f.readline().strip().decode()
            if line == "end_header":
                break
            p = line.split()
            if p[0] == "element":
                in_vertex = p[1] == "vertex"
                if p[1] == "vertex":
                    n_vert = int(p[2])
                elif p[1] == "face":
                    n_face = int(p[2])
            elif p[0] == "property" and in_vertex:
                sizes = {"float": 4, "double": 8, "uchar": 1, "char": 1,
                         "int": 4, "uint": 4, "short": 2, "ushort": 2,
                         "uint8": 1, "int32": 4, "float32": 4, "uint16": 2}
                vert_size += sizes[p[1]]
        f.seek(n_vert * vert_size, os.SEEK_CUR)
        faces = np.empty((n_face, 3), np.int64)
        raw = f.read(n_face * (1 + 12))
        off = 0
        for i in range(n_face):
            cnt = raw[off]
            if cnt != 3:
                raise ValueError(f"{path}: non-triangle face ({cnt})")
            faces[i] = np.frombuffer(raw, "<i4", 3, off + 1)
            off += 13
    return faces


def convert_scene(
    mesh_ply: str,
    labels_ply: str,
    density: float = 2000.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """One scene → [N, 7] xyzrgb + raw label."""
    v = read_ply(mesh_ply)
    vertices = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float64)
    colors = np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.float64)
    lab = read_ply(labels_ply)["label"].astype(np.int64)
    faces = _read_faces(mesh_ply)

    # face label = majority of its three vertex labels (ties → first)
    fl = lab[faces]  # [F, 3]
    face_labels = np.where(
        (fl[:, 1] == fl[:, 2]) & (fl[:, 0] != fl[:, 1]), fl[:, 1], fl[:, 0]
    )
    pts, attrs, labels = rasterize_mesh(
        vertices, faces, density=density, vertex_attrs=colors,
        face_labels=face_labels, rng=rng or np.random.default_rng(0),
        include_vertices=True,
    )
    # appended vertices carry their own labels, not a face's
    labels[-len(vertices):] = lab
    return np.concatenate(
        [pts, attrs, labels[:, None].astype(np.float32)], axis=1
    ).astype(np.float32)


def prepare_scannet(raw_root: str, out_dir: str, density: float = 2000.0,
                    verbose: bool = True) -> List[str]:
    """Convert every `<raw_root>/<scene>/<scene>_vh_clean_2.ply` scene."""
    os.makedirs(out_dir, exist_ok=True)
    converted = []
    for mesh in sorted(glob.glob(os.path.join(raw_root, "*", "*_vh_clean_2.ply"))):
        scene = os.path.basename(mesh)[: -len("_vh_clean_2.ply")]
        labels = mesh[: -len(".ply")] + ".labels.ply"
        out = os.path.join(out_dir, f"{scene}.npy")
        if os.path.exists(out) or not os.path.exists(labels):
            continue
        arr = convert_scene(mesh, labels, density)
        np.save(out, arr)
        converted.append(out)
        if verbose:
            print(f"{out}: {arr.shape}")
    return converted


if __name__ == "__main__":
    import sys

    prepare_scannet(sys.argv[1], sys.argv[2])
