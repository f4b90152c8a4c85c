"""On-device multi-resolution pyramid builder.

The reference builds its pyramid either on CPU inside the tf.data pipeline
(tensorflow/datasets/base.py:767-842, C++ radius/grid ops) or lazily inside
the forward pass per block (pytorch/model/blocks.py:69-71 FPS+KNN per
TransitionDown, and a fresh `knnquery` inside *every* PointTransformerLayer,
blocks.py:34-35). Here the full pyramid — sample indices, per-level self-KNN,
down-KNN, IDW up-interpolation indices/weights, nearest-to-level-0 indices,
contrast-KNN and sub-scene label KNN — is computed **once per batch** in a
single jitted function and shared by every block of a level. That removes the
reference's repeated KNNs (e.g. 18 redundant searches across the 18
transformer blocks) and keeps the model itself purely gather+matmul.

All shapes are static: N_l = N // prod(strides[:l+1]).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.gather import batch_gather
from .interpolate import interpolation_weights
from .knn import knn, windowed_knn
from .sampling import bucket_fps, fps, serialized_sample, voxel_sample


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static description of the pyramid (hashable → usable as a jit static arg).

    Defaults reproduce the flagship point-transformer + CBL configuration:
    strides [1,4,4,4,4] and backbone nsample [8,16,16,16,16]
    (pytorch/model/pointtransformer_seg.py:44), contrast nsample
    [36,24,24,24,24] (pytorch/config/s3dis/origin_*-w.1.yaml).
    """

    strides: Tuple[int, ...] = (1, 4, 4, 4, 4)
    k_self: Tuple[int, ...] = (8, 16, 16, 16, 16)
    k_down: Tuple[int, ...] = (8, 16, 16, 16, 16)
    k_up: int = 3
    k_contrast: Optional[Tuple[int, ...]] = None
    with_subscene: bool = False
    sampler: str = "bucket_fps"  # fps | bucket_fps | serialized | strided | voxel
    num_buckets: int = 64
    knn_chunk: int = 2048
    # ConvNet radius semantics: KNN results beyond radius get the shadow
    # index (reference BatchOrderedNeighbors). radii[l] masks self-KNN at
    # level l; down_radii[l] masks the level-(l-1)→l pooling KNN.
    radii: Optional[Tuple[float, ...]] = None
    down_radii: Optional[Tuple[float, ...]] = None
    # sampler='voxel': grid cell size per level (level 0 unused)
    voxel_sizes: Optional[Tuple[float, ...]] = None
    # None → exact lax.top_k; float → lax.approx_max_k recall target
    # (TPU-native, ~30× faster; self-neighbors are force-restored)
    knn_recall: Optional[float] = 0.95
    # >0 → Morton-tile windowed KNN (ops/knn.py::windowed_knn) with this
    # window half-width in tiles of `knn_tile` points: ~N/((2w+1)·tile) less
    # distance/top-k work, recall ~0.97 at window=4/tile=256
    knn_window: int = 0
    knn_tile: int = 256
    # 'tile' → contrast neighbors restricted to a Morton tile window and
    # returned WINDOW-RELATIVE in sorted space (ops/knn.py::tile_self_knn),
    # enabling the matmul-gather CBL path (ops/tile_gather.py) that removes
    # the gather/scatter row cost — PERF.md round-2 lever (a)
    contrast_mode: str = "dense"  # dense | tile
    contrast_tile: int = 256
    contrast_window: int = 1
    # layout='sorted': every level's points are stored Morton-SORTED
    # (Pyramid.order0 maps original → sorted rows at level 0; sampled levels
    # inherit sortedness because subsets of a Morton-sorted cloud sorted by
    # row index stay Morton-sorted). Backbone self-KNN then returns
    # window-relative tile-local indices (Pyramid.self_local) and the model's
    # neighbor gathers run as per-tile one-hot MXU matmuls
    # (ops/tile_gather.py) instead of row gathers — PERF.md round-2 lever.
    # Callers must permute features/labels by order0 (train/trainer.py does).
    layout: str = "natural"  # natural | sorted
    self_tile: int = 256
    self_window: int = 1

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def level_sizes(self, n: int) -> Tuple[int, ...]:
        sizes = []
        for s in self.strides:
            n = n // s
            sizes.append(n)
        return tuple(sizes)

    def subscene_k(self, level: int) -> int:
        """kr for sub-scene label inference = prod(strides up to level)
        (pytorch/model/basic_operators.py:20-22)."""
        k = 1
        for s in self.strides[1 : level + 1]:
            k *= s
        return k


@struct.dataclass
class Pyramid:
    """Per-level index arrays (tuples over levels; None-slots where N/A).

    points:       [B, N_l, 3] level coordinates.
    sample_idx:   [B, N_l] indices into level l-1 (level 0: identity).
    self_idx:     [B, N_l, k_self_l] self-KNN including self.
    down_idx:     [B, N_l, k_down_l] KNN of level-(l-1) supports for level-l
                  queries (None at level 0).
    up_idx/up_w:  [B, N_{l-1}, k_up] IDW interpolation of level l onto level
                  l-1 (None at level 0).
    near0_idx:    [B, N_0] nearest level-l point per level-0 point.
    contrast_idx: [B, N_l, k_contrast_l - 1] self-KNN excluding self.
    subscene_idx: [B, N_l, kr_l] KNN of level-0 supports for level-l queries.
    """

    points: Tuple
    sample_idx: Tuple
    self_idx: Tuple
    down_idx: Tuple
    up_idx: Tuple
    up_w: Tuple
    near0_idx: Tuple
    contrast_idx: Tuple
    subscene_idx: Tuple
    # precomputed relative neighbor positions (gathers are row-bound on TPU
    # at ~8.5ns/row; sharing p_nb − p across all blocks of a level removes
    # one full gather per block):
    self_rel: Tuple  # [B, N_l, k_self_l, 3]
    down_rel: Tuple  # [B, N_l, k_down_l, 3] (None at level 0)
    # contrast_mode='tile': Morton order per level ([B, N_l]; None = dense
    # mode for that level) — contrast_idx then holds WINDOW-RELATIVE sorted-
    # space indices with shadow = width·tile
    contrast_order: Tuple = ()
    # static per-level (tile, width) metadata for the tile path
    contrast_local: Tuple = struct.field(pytree_node=False, default=())
    # layout='sorted': Morton order of the ORIGINAL level-0 rows ([B, N0];
    # None = natural layout). Callers permute features/labels by it before
    # the model and un-permute predictions after (train/trainer.py).
    order0: Optional[jax.Array] = None
    # layout='sorted': static per-level (tile, width) for self_idx, which is
    # then WINDOW-RELATIVE in the level's (sorted) row space with shadow =
    # tile·width; None-slots fall back to global indices.
    self_local: Tuple = struct.field(pytree_node=False, default=())
    # layout='sorted' (round 4): WINDOW-RELATIVE twins of down_idx / up_idx /
    # near0_idx in the tile_cross_knn geometry (shadow = tile·width), letting
    # TransitionDown/Up and the multihead upsamples run as one-hot MXU
    # matmuls (ops/tile_gather.py::cross_window_gather) instead of row
    # gathers + backward scatter-adds. None-slots → use the global arrays.
    down_local: Tuple = ()
    up_local: Tuple = ()
    near0_local: Tuple = ()
    # matching static (tile, width, window) per level (None where N/A)
    down_meta: Tuple = struct.field(pytree_node=False, default=())
    up_meta: Tuple = struct.field(pytree_node=False, default=())
    near0_meta: Tuple = struct.field(pytree_node=False, default=())


def _sample(points: jax.Array, m: int, spec: PyramidSpec, level: int = 1) -> jax.Array:
    if spec.sampler == "fps":
        return fps(points, m)
    if spec.sampler == "bucket_fps":
        g = spec.num_buckets
        n = points.shape[1]
        while g > 1 and (n % g or m % g):
            g //= 2
        if g <= 1:
            return fps(points, m)
        return bucket_fps(points, m, g)
    if spec.sampler in ("serialized", "strided"):
        # natural layout has no inherited order — 'strided' degrades to the
        # re-sorting serialized sampler there
        return serialized_sample(points, m)
    if spec.sampler == "random":
        # RandLA-Net-style uniform random decimation (BASELINE configs[1]):
        # a fixed pseudo-random row permutation per level keeps the program
        # static under jit; the host pipeline shuffles crop rows every step,
        # so the selected POINTS still vary uniformly across steps.
        idx = jax.random.permutation(
            jax.random.PRNGKey(level), points.shape[1]
        )[:m].astype(jnp.int32)
        return jnp.broadcast_to(idx[None], (points.shape[0], m))
    if spec.sampler == "voxel":
        if spec.voxel_sizes is None:
            raise ValueError("sampler='voxel' requires voxel_sizes")
        return voxel_sample(points, m, spec.voxel_sizes[level])
    raise ValueError(f"unknown sampler {spec.sampler!r}")


def _knn(spec: PyramidSpec, query, support, k, **kw):
    """Dispatch to the windowed fast path when enabled and shapes allow."""
    if (
        spec.knn_window > 0
        and query.shape[1] % spec.knn_tile == 0
        and support.shape[1] % spec.knn_tile == 0
        and kw.get("support_mask") is None
    ):
        kw.pop("chunk", None)
        return windowed_knn(
            query, support, k, tile=spec.knn_tile, window=spec.knn_window, **kw
        )
    return knn(query, support, k, **kw)


@functools.partial(jax.jit, static_argnames=("spec",))
def build_pyramid(points: jax.Array, spec: PyramidSpec) -> Pyramid:
    """Build the full index pyramid from level-0 points [B, N, 3]."""
    b, n, _ = points.shape
    chunk = spec.knn_chunk
    sorted_layout = spec.layout == "sorted"
    if sorted_layout and (spec.radii or spec.down_radii):
        # radius→shadow masks use global-index semantics (ConvNet models);
        # the sorted/tile layout is the point-transformer fast path
        raise ValueError("layout='sorted' does not support radius masks")

    order0 = None
    if sorted_layout:
        from .sampling import serialized_order

        order0 = serialized_order(points)
        points = batch_gather(points, order0)

    # When the backbone self-KNN and the contrast-KNN share the same tile
    # window geometry (the flagship default), ONE window search serves both:
    # the top-max(k_self, k_contrast) list INCLUDING self yields
    #   self_idx    = first k_self slots with slot 0 forced to self
    #                 (bit-identical to the separate ensure_self search:
    #                 the first k of a longer exact top-k is the top-k), and
    #   contrast_idx = the first k_contrast slots with the self entry
    #                 dropped (bit-identical to the exclude-self search:
    #                 removing self from the top-k leaves the k-1 smallest
    #                 non-self candidates in the same tie-break order; if
    #                 self is absent — all-duplicate corner — the first
    #                 k_contrast-1 slots already are that set).
    # This halves the window distance einsums and merges the two top-k
    # extractions per level (PERF.md round 3).
    merge_contrast = (
        sorted_layout
        and spec.k_contrast is not None
        and spec.self_tile == spec.contrast_tile
        and spec.self_window == spec.contrast_window
    )
    merged_contrast_idx: list = [None] * spec.num_levels

    def _merged_self_contrast(pts_l, level, tile_l):
        """One tile-window search → (self_idx, (tile, width), contrast_idx)."""
        import numpy as _np

        from .knn import tile_self_knn

        b_l, m_l, _ = pts_l.shape
        ks = spec.k_self[level]
        kc = spec.k_contrast[level]  # contrast keeps kc-1 neighbors
        km = max(ks, kc)
        _, li, width = tile_self_knn(
            pts_l, km, tile=tile_l, window=spec.self_window,
            exclude_self=False, ensure_self=False,
            recall=spec.knn_recall, assume_sorted=True,
        )
        g = m_l // tile_l
        starts = _np.clip(
            _np.arange(g) - spec.self_window, 0, g - width
        )  # [g] tiles
        self_pos = jnp.asarray(
            _np.arange(m_l) - _np.repeat(starts * tile_l, tile_l), jnp.int32
        )  # [m_l] window-relative self position (static)

        s_idx = jnp.concatenate(
            [
                jnp.broadcast_to(self_pos[None, :, None], (b_l, m_l, 1)),
                li[..., 1:ks],
            ],
            axis=-1,
        )
        is_self = li[..., :kc] == self_pos[None, :, None]
        slot = jnp.where(
            jnp.any(is_self, axis=-1), jnp.argmax(is_self, axis=-1), kc
        )  # position of self among the first kc slots; kc if absent
        j = jnp.arange(kc - 1, dtype=jnp.int32)
        c_idx = jnp.where(
            j[None, None, :] < slot[..., None], li[..., : kc - 1], li[..., 1:kc]
        )
        return s_idx, (tile_l, width), c_idx

    def _self_knn(pts_l, k, level):
        """Level self-KNN → (idx, local_meta). Sorted layout: window-relative
        tile-local indices (+ (tile, width)); else global indices (+ None)."""
        m_l = pts_l.shape[1]
        tile_l = min(spec.self_tile, m_l)
        if sorted_layout and m_l % tile_l == 0:
            from .knn import tile_self_knn

            _, li, width = tile_self_knn(
                pts_l, k, tile=tile_l, window=spec.self_window,
                exclude_self=False, ensure_self=True,
                recall=spec.knn_recall, assume_sorted=True,
            )
            return li, (tile_l, width)
        s_idx, _ = _knn(
            spec, pts_l, pts_l, k,
            radius=spec.radii[level] if spec.radii else None, chunk=chunk,
            recall=spec.knn_recall, ensure_self=True,
        )
        return s_idx, None

    def _cross(query, support, k, radius=None):
        """Cross-level KNN → (idx, d2, meta). Sorted layout: both sides share
        the Morton order, so the window-aligned search (ops/knn.py::
        tile_cross_knn) replaces the dense distance matrix — no re-sort,
        ~N/(width·tile) less work. meta = (tile, width, window) when the
        window search ran (its indices then have a window-relative twin for
        the one-hot matmul gathers, round 4), else None."""
        if sorted_layout and radius is None:
            t = min(spec.self_tile, query.shape[1], support.shape[1])
            if query.shape[1] % t == 0 and support.shape[1] % t == 0:
                import os

                from .knn import tile_cross_knn

                idx, d2 = tile_cross_knn(
                    query, support, k, tile=t, window=spec.self_window,
                    recall=spec.knn_recall,
                )
                if os.environ.get("XGATHER", "on") == "off":
                    # A/B hook: suppress the window-relative twins so model
                    # consumers fall back to global-index row gathers
                    return idx, d2, None
                gq, gs = query.shape[1] // t, support.shape[1] // t
                span = -(-gs // gq)
                width = min(span + 2 * spec.self_window, gs)
                return idx, d2, (t, width, spec.self_window)
        idx, d2 = _knn(
            spec, query, support, k, radius=radius, chunk=chunk,
            recall=spec.knn_recall,
        )
        return idx, d2, None

    def _cross_local(idx, meta, n_sup):
        """Global support-row indices → window-relative (shadow = W)."""
        import numpy as _np

        from .tile_gather import cross_window_starts

        t, width, window = meta
        gq = idx.shape[1] // t
        starts = cross_window_starts(gq, n_sup // t, width, window) * t
        st = jnp.asarray(_np.repeat(starts, t), jnp.int32)
        return jnp.where(
            idx >= n_sup, width * t, idx - st[None, :, None]
        ).astype(jnp.int32)

    def _level_self(pts_l, level):
        """Self-KNN for one level, using the merged search when it applies."""
        m_l = pts_l.shape[1]
        tile_l = min(spec.self_tile, m_l)
        if merge_contrast and m_l % tile_l == 0:
            s_idx, loc, c_idx = _merged_self_contrast(pts_l, level, tile_l)
            merged_contrast_idx[level] = c_idx
            return s_idx, loc
        return _self_knn(pts_l, spec.k_self[level], level)

    pts = [points]
    sample_idx = [jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))]
    s_idx0, s_loc0 = _level_self(points, 0)
    self_idx = [s_idx0]
    self_local = [s_loc0]
    down_idx = [None]
    up_idx = [None]
    up_w = [None]
    near0_idx = [sample_idx[0]]
    down_local, down_meta = [None], [None]
    up_local, up_meta = [None], [None]
    near0_local, near0_meta = [None], [None]
    contrast_idx = []
    subscene_idx = []

    for l in range(1, spec.num_levels):
        prev = pts[l - 1]
        m = prev.shape[1] // spec.strides[l]
        if sorted_layout and spec.sampler == "strided":
            # the level is already Morton-sorted: strided sampling is a pure
            # strided row pick of the INHERITED curve order — no argsort, no
            # FPS chain (PTv3-style serialized pooling). Differs from
            # 'serialized' only in tie-level details: 'serialized' re-sorts
            # each level by its own (subset-normalized) Morton codes, so it
            # selects identical sets in both layouts (the equivalence tests
            # rely on that); 'strided' keeps the parent level's rank order.
            n_prev = prev.shape[1]
            stride_idx = jnp.linspace(0, n_prev - 1, m).round().astype(jnp.int32)
            idx = jnp.broadcast_to(stride_idx[None], (b, m))
        else:
            idx = _sample(prev, m, spec, l)
            if sorted_layout:
                # any subset of a Morton-sorted cloud, sorted by row index,
                # is itself Morton-sorted — one int sort keeps the level
                # sorted
                idx = jnp.sort(idx, axis=1)
        cur = batch_gather(prev, idx)
        pts.append(cur)
        sample_idx.append(idx)
        d_idx, _, d_meta = _cross(
            cur, prev, spec.k_down[l],
            radius=spec.down_radii[l] if spec.down_radii else None,
        )
        down_idx.append(d_idx)
        down_meta.append(d_meta)
        down_local.append(
            _cross_local(d_idx, d_meta, prev.shape[1]) if d_meta else None
        )
        s_idx, s_loc = _level_self(cur, l)
        self_idx.append(s_idx)
        self_local.append(s_loc)
        u_idx, u_d2, u_meta = _cross(prev, cur, spec.k_up)
        up_idx.append(u_idx)
        up_w.append(interpolation_weights(u_d2))
        up_meta.append(u_meta)
        up_local.append(
            _cross_local(u_idx, u_meta, cur.shape[1]) if u_meta else None
        )
        n0_idx, _, n0_meta = _cross(points, cur, 1)
        near0_idx.append(n0_idx[..., 0])
        near0_meta.append(n0_meta)
        near0_local.append(
            _cross_local(n0_idx, n0_meta, cur.shape[1])[..., 0]
            if n0_meta else None
        )

    contrast_order: list = [None] * spec.num_levels
    contrast_local: list = [None] * spec.num_levels
    if spec.k_contrast is not None:
        from .knn import tile_self_knn

        use_tile = spec.contrast_mode == "tile" or sorted_layout
        for l in range(spec.num_levels):
            m_l = pts[l].shape[1]
            tile_l = min(spec.contrast_tile, m_l)
            if merged_contrast_idx[l] is not None:
                # already computed by the merged self+contrast search
                contrast_idx.append(merged_contrast_idx[l])
                contrast_local[l] = self_local[l]
                continue
            if use_tile and m_l % tile_l == 0:
                # sorted layout: the level is already Morton-sorted, so the
                # CBL needs no per-stage re-sort (contrast_order stays None)
                order, li, width = tile_self_knn(
                    pts[l], spec.k_contrast[l] - 1, tile=tile_l,
                    window=spec.contrast_window, exclude_self=True,
                    recall=spec.knn_recall, assume_sorted=sorted_layout,
                )
                contrast_idx.append(li)
                contrast_order[l] = order
                contrast_local[l] = (tile_l, width)
            else:
                c_idx, _ = _knn(
                    spec, pts[l], pts[l], spec.k_contrast[l] - 1,
                    exclude_self=True, chunk=chunk, recall=spec.knn_recall,
                )
                contrast_idx.append(c_idx)
    else:
        contrast_idx = [None] * spec.num_levels

    if spec.with_subscene:
        subscene_idx.append(None)  # level 0 uses labels directly
        for l in range(1, spec.num_levels):
            kr = spec.subscene_k(l)
            ss_idx, _, _ = _cross(pts[l], points, kr)
            subscene_idx.append(ss_idx)
    else:
        subscene_idx = [None] * spec.num_levels

    def _rel(p_support, p_query, idx):
        nb = batch_gather(p_support, jnp.minimum(idx, p_support.shape[1] - 1))
        valid = (idx < p_support.shape[1])[..., None]
        return jnp.where(valid, nb - p_query[:, :, None, :], 0.0)

    def _rel_local(p, li, tile, width):
        from .tile_gather import tile_window_gather

        nb = tile_window_gather(p, li, tile, width)  # shadow rows → 0
        valid = (li < tile * width)[..., None]
        return jnp.where(valid, nb - p[:, :, None, :], 0.0)

    self_rel = [
        _rel_local(pts[l], self_idx[l], *self_local[l])
        if self_local[l] is not None
        else _rel(pts[l], pts[l], self_idx[l])
        for l in range(spec.num_levels)
    ]
    def _rel_cross(p_support, p_query, li, meta):
        from .tile_gather import cross_window_gather

        t, width, window = meta
        nb = cross_window_gather(
            p_support, li, p_support.shape[1], t, width, window
        )  # shadow rows → 0
        valid = (li < t * width)[..., None]
        return jnp.where(valid, nb - p_query[:, :, None, :], 0.0)

    down_rel = [None] + [
        _rel_cross(pts[l - 1], pts[l], down_local[l], down_meta[l])
        if down_meta[l] is not None
        else _rel(pts[l - 1], pts[l], down_idx[l])
        for l in range(1, spec.num_levels)
    ]

    return Pyramid(
        points=tuple(pts),
        sample_idx=tuple(sample_idx),
        self_idx=tuple(self_idx),
        down_idx=tuple(down_idx),
        up_idx=tuple(up_idx),
        up_w=tuple(up_w),
        near0_idx=tuple(near0_idx),
        contrast_idx=tuple(contrast_idx),
        subscene_idx=tuple(subscene_idx),
        self_rel=tuple(self_rel),
        down_rel=tuple(down_rel),
        contrast_order=tuple(contrast_order),
        contrast_local=tuple(contrast_local),
        order0=order0,
        self_local=tuple(self_local),
        down_local=tuple(down_local),
        up_local=tuple(up_local),
        near0_local=tuple(near0_local),
        down_meta=tuple(down_meta),
        up_meta=tuple(up_meta),
        near0_meta=tuple(near0_meta),
    )
