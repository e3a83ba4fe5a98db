"""Input encodings (TPU-native re-implementation of the tcnn encoding zoo).

The reference consumes tcnn encodings selected by JSON ``otype``
(src/testbed.cu:2258-2302): HashGrid / DenseGrid / SphericalHarmonics /
Frequency / OneBlob / TriangleWave / Identity / Composite. We re-implement
the same math as vectorized JAX (gathers + VPU elementwise); the hash-grid
hot path uses the "brick" layout (one wide row-gather per level, additive
hashing) with a scatter-free sort/histogram backward (ops/table_ops.py).

Numerical conventions follow tcnn's grid encoding so that convergence
behavior matches:

* per-level scale: ``scale_l = 2^(l·log2(b)) · N_min − 1``,
  ``res_l = ceil(scale_l) + 1``
* sample coordinate: ``p = x·scale_l + 0.5`` (cell-centered)
* dense indexing when ``res_l³ ≤ T``; else spatial hash — xor-of-primes
  ``x ⊕ (y·2654435761) ⊕ (z·805459861) mod T`` in the tcnn-parity layouts,
  ADDITIVE ``(x + y·2654435761 + z·805459861) mod T`` in the brick layout
  (so all cell corners sit at fixed slot offsets → one gather per level)
* trilinear interpolation of F features per level; init U(−1e−4, 1e−4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_HASH_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


class Encoding:
    """Stateless encoding: params pytree via init(), pure apply()."""

    n_input_dims: int
    n_output_dims: int

    def init(self, rng: jax.Array):
        return ()

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Grid encodings (HashGrid / DenseGrid / TiledGrid)
# ---------------------------------------------------------------------------


@dataclass
class GridEncoding(Encoding):
    n_input_dims: int = 3
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0
    hash_type: str = "hash"  # "hash" (HashGrid) or "dense" (DenseGrid)
    interpolation: str = "linear"
    #: Table access strategy — the perf-critical design choice on TPU, where
    #: random row-gathers are the cost (~1.3e8–2.6e8 rows/s on v5e) and
    #: scatter-adds are worse (~1.2e7 rows/s):
    #:
    #: * "brick" (default): ONE row-gather per level per sample. The hash is
    #:   ADDITIVE — idx = (x + y·P2 + z·P3) mod m, m a power of two — so all
    #:   2^D cell corners live at fixed offsets {cx + cy·sy + cz·sz} from the
    #:   base slot, and a derived "brick" table (one dense roll of the
    #:   canonical table per corner, rebuilt inside the jitted step) serves
    #:   all corners in a single wide row. C0 continuity is preserved because
    #:   bricks alias the SAME canonical entries. Backward is the
    #:   scatter-free sort/cumsum/histogram pipeline (ops/table_ops.py).
    #: * "paired": 2^(D−1) gathers per level (x-corner pairs share a row).
    #: * "plain": 2^D gathers per level (tcnn-layout xor hash, exact
    #:   tcnn-parity indexing; kept for interop/ablation).
    layout: str = "brick"

    def __post_init__(self):
        assert self.n_input_dims in (2, 3), "grid encoding supports 2D/3D"
        assert self.layout in ("brick", "paired", "plain"), self.layout
        T = 1 << self.log2_hashmap_size
        self.level_scales: List[float] = []
        self.level_res: List[int] = []
        self.level_sizes: List[int] = []
        self.level_dense: List[bool] = []
        self.level_offsets: List[int] = [0]
        for l in range(self.n_levels):
            scale = 2.0 ** (l * math.log2(self.per_level_scale)) * self.base_resolution - 1.0
            res = int(math.ceil(scale)) + 1
            dense_size = res**self.n_input_dims
            if self.hash_type == "dense":
                size = dense_size
                dense = True
            elif self.layout == "brick":
                # dense when it fits; else the full power-of-two hash size
                # (additive hashing needs m | 2^32 for modular consistency)
                dense = dense_size <= T
                size = dense_size if dense else T
            else:
                # align to 8 like tcnn, cap at hashmap size
                size = min(T, -(-dense_size // 8) * 8)
                dense = dense_size <= T
            if self.layout == "brick":
                # histogram backward needs m % 128 == 0 (radix-128 matmul)
                size = -(-size // 128) * 128
            self.level_scales.append(scale)
            self.level_res.append(res)
            self.level_sizes.append(size)
            self.level_dense.append(dense)
            self.level_offsets.append(self.level_offsets[-1] + size)
        self.table_size = self.level_offsets[-1]
        if self.layout == "brick":
            self._brick_shifts: List[List[int]] = []
            D = self.n_input_dims
            for l in range(self.n_levels):
                m = self.level_sizes[l]
                res = self.level_res[l]
                if self.level_dense[l]:
                    strides = [1, res, res * res][:D]
                else:
                    strides = [1] + [int(_HASH_PRIMES[d] % np.uint32(m)) for d in range(1, D)]
                shifts = []
                for c in range(1 << D):
                    s = sum(((c >> d) & 1) * strides[d] for d in range(D))
                    shifts.append(int(s % m))
                self._brick_shifts.append(shifts)
            from nerfshop_tpu.ops import table_ops

            self._brick_encode = table_ops.make_brick_encode(
                self.level_sizes,
                self.level_offsets,
                self._brick_shifts,
                self.n_features_per_level,
                D,
            )

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def init(self, rng: jax.Array):
        return {
            "table": jax.random.uniform(
                rng,
                (self.table_size, self.n_features_per_level),
                jnp.float32,
                -1e-4,
                1e-4,
            )
        }

    def _corner_indices(self, x: jnp.ndarray):
        """x: [N, D] in [0,1] → (global gather indices [N, L, 2^D],
        trilinear weights [N, L, 2^D])."""
        D = self.n_input_dims
        N = x.shape[0]
        L = self.n_levels
        scales = jnp.asarray(self.level_scales, x.dtype)  # [L]
        p = x[:, None, :] * scales[None, :, None] + 0.5  # [N, L, D]
        p0 = jnp.floor(p)
        frac = p - p0
        p0 = p0.astype(jnp.int32)

        n_corners = 1 << D
        offs = np.stack(
            [[(c >> d) & 1 for d in range(D)] for c in range(n_corners)]
        ).astype(np.int32)  # [2^D, D]
        corner = p0[:, :, None, :] + jnp.asarray(offs)[None, None]  # [N, L, 2^D, D]

        w = jnp.where(
            jnp.asarray(offs)[None, None] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :]
        ).prod(-1)  # [N, L, 2^D]

        res = jnp.asarray(self.level_res, jnp.int32)  # [L]
        corner = jnp.clip(corner, 0, res[None, :, None, None] - 1)
        cu = corner.astype(jnp.uint32)

        # dense index: x + y*res + z*res² ; hash index: xor of prime products
        res_u = res.astype(jnp.uint32)[None, :, None]
        if D == 3:
            dense_idx = cu[..., 0] + res_u * (cu[..., 1] + res_u * cu[..., 2])
        else:
            dense_idx = cu[..., 0] + res_u * cu[..., 1]
        hashed = cu[..., 0]
        for d in range(1, D):
            hashed = hashed ^ (cu[..., d] * jnp.uint32(_HASH_PRIMES[d]))
        sizes = jnp.asarray(self.level_sizes, jnp.uint32)[None, :, None]
        hash_idx = hashed % sizes
        use_dense = jnp.asarray(self.level_dense, jnp.bool_)[None, :, None]
        local = jnp.where(use_dense, dense_idx % sizes, hash_idx)
        global_idx = local.astype(jnp.int32) + jnp.asarray(self.level_offsets[:-1], jnp.int32)[None, :, None]
        return global_idx, w

    def _paired_level_indices(self, x: jnp.ndarray, l: int):
        """x [N, D] → per-level (pair-row indices [N, C], yz weights [N, C],
        x-fraction [N]) for level ``l``; C = 2^(D−1) yz-corner combos.

        Each gathered pair-row holds features of corners (x₀, …) and
        (x₀+1, …): dense levels are x-fastest so adjacency is free; hash
        levels place x additively mod (size−1) so idx+1 stays in-level."""
        D = self.n_input_dims
        res = self.level_res[l]
        size = self.level_sizes[l]
        p = x * jnp.asarray(self.level_scales[l], x.dtype) + 0.5  # [N, D]
        p0f = jnp.floor(p)
        frac = p - p0f
        p0 = jnp.clip(p0f.astype(jnp.int32), 0, res - 1)
        # fold the +x clamp into the lerp weight: when x₀ == res−1 the
        # (clamped) corner x₁ aliases x₀, so give x₀ the full weight
        fx = jnp.where(p0[:, 0] == res - 1, 0.0, frac[:, 0])  # [N]

        n_yz = 1 << (D - 1)
        offs = np.stack(
            [[(c >> d) & 1 for d in range(D - 1)] for c in range(n_yz)]
        ).astype(np.int32)  # [C, D-1]
        corner_yz = jnp.clip(p0[:, None, 1:] + jnp.asarray(offs)[None], 0, res - 1)  # [N,C,D-1]
        w_yz = jnp.where(
            jnp.asarray(offs)[None] == 1, frac[:, None, 1:], 1.0 - frac[:, None, 1:]
        ).prod(-1)  # [N, C]

        cu = corner_yz.astype(jnp.uint32)
        x0u = p0[:, 0].astype(jnp.uint32)[:, None]  # [N, 1]
        if self.level_dense[l]:
            if D == 3:
                local = x0u + np.uint32(res) * (cu[..., 0] + np.uint32(res) * cu[..., 1])
            else:
                local = x0u + np.uint32(res) * cu[..., 0]
            local = local % np.uint32(size)
        else:
            hashed = cu[..., 0] * jnp.uint32(_HASH_PRIMES[1])
            for d in range(1, D - 1):
                hashed = hashed ^ (cu[..., d] * jnp.uint32(_HASH_PRIMES[d + 1]))
            # additive x placement; mod (size−1) keeps the (i, i+1) pair in-level
            m = np.uint32(max(size - 1, 1))
            local = (hashed % m + x0u) % m
        return local.astype(jnp.int32) + self.level_offsets[l], w_yz, fx

    def build_brick_tables(self, table: jnp.ndarray) -> list:
        """Prebuild the per-level [m, 2^D·F] brick tables for inference-time
        injection as ``params['brick_tables']`` (skips the per-dispatch
        roll+concat build inside apply). Barriered so chunk programs gather
        from materialized buffers."""
        return [jax.lax.optimization_barrier(b) for b in self._brick_tables(table)]

    def _brick_tables(self, table: jnp.ndarray) -> list:
        """Canonical table [Σm, F] → per-level brick tables [[m_l, 2^D·F]]:
        corner c's features live at columns [cF, (c+1)F) of the row at the
        cell's base slot (one dense roll per corner — differentiable, so the
        backward reduces brick-row grads onto canonical entries with dense
        adds). Kept per level: gather throughput degrades with operand
        footprint (ops/table_ops.make_level_gather)."""
        # f32 by default (bf16 won isolated-uniform gather probes but
        # regressed the real train step — ops/table_ops.py feat_dtype note);
        # NERFSHOP_BF16_TABLES=1 flips for render/bake-path A/Bs
        import os

        dt = jnp.float32
        if os.environ.get("NERFSHOP_BF16_TABLES") == "1" and jax.default_backend() != "cpu":
            dt = jnp.bfloat16
        blocks = []
        for l in range(self.n_levels):
            Tl = table[self.level_offsets[l] : self.level_offsets[l + 1]].astype(dt)
            cols = [Tl if s == 0 else jnp.roll(Tl, -s, axis=0) for s in self._brick_shifts[l]]
            blocks.append(jnp.concatenate(cols, axis=1))
        return blocks

    def _brick_fracs(self, x: jnp.ndarray):
        """x [N, D] → (base slot idx [L, N], folded lerp fracs [L, N, D]).

        Boundary clamp is folded into the fracs: when p0_d == res−1 the
        +1 corner on axis d aliases p0_d in the reference's clamped indexing,
        so that axis's lerp weight collapses to the base corner — identical
        math, no index clamping needed."""
        D = self.n_input_dims
        idxs, fracs = [], []
        for l in range(self.n_levels):
            res = self.level_res[l]
            m = self.level_sizes[l]
            p = x * jnp.asarray(self.level_scales[l], x.dtype) + 0.5
            p0f = jnp.floor(p)
            frac = p - p0f
            p0 = jnp.clip(p0f.astype(jnp.int32), 0, res - 1)
            w1 = jnp.where(p0 == res - 1, 0.0, frac)  # [N, D]
            cu = p0.astype(jnp.uint32)
            if self.level_dense[l]:
                if D == 3:
                    base = cu[:, 0] + np.uint32(res) * (cu[:, 1] + np.uint32(res) * cu[:, 2])
                else:
                    base = cu[:, 0] + np.uint32(res) * cu[:, 1]
            else:
                base = cu[:, 0]
                for d in range(1, D):
                    base = base + cu[:, d] * jnp.uint32(_HASH_PRIMES[d])
                base = base & np.uint32(m - 1)
            idxs.append(base.astype(jnp.int32))
            fracs.append(w1)
        return jnp.stack(idxs), jnp.stack(fracs)

    def _brick_indices(self, x: jnp.ndarray):
        """x [N, D] → (base slot idx [L, N], corner weights [L, N, 2^D])."""
        from nerfshop_tpu.ops import table_ops

        idx, w1 = self._brick_fracs(x)
        return idx, table_ops.corner_products(w1)

    def precompute(self, x: jnp.ndarray):
        """Param-independent half of ``apply`` (brick layout): the slot
        indices + lerp weights. Computing these OUTSIDE a grad closure keeps
        the frac pipeline out of the VJP trace (it gets no residuals and no
        transpose rules) — measured 13.5 ms/step at batch 2^18 on v5e
        (scratch/probe_bwd_stages.py: manual 33.0 vs in-model 46.5 ms).
        Falls back to the raw input for non-brick layouts."""
        if self.layout != "brick":
            return x
        from nerfshop_tpu.ops import table_ops

        idx, w1 = self._brick_fracs(x)
        return (idx, w1, table_ops.corner_products(w1))

    def apply_pre(self, params, pre) -> jnp.ndarray:
        """apply() from a ``precompute`` result."""
        if self.layout != "brick":
            return self.apply(params, pre)
        idx, w1, w8 = pre
        out = self._brick_encode(params["table"], idx, w8, w1)  # [L, N, F]
        N = idx.shape[1]
        return out.transpose(1, 0, 2).reshape(N, self.n_output_dims)

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, D] in [0,1] → [N, L·F].

        The paired path runs per level / per yz-corner with 2D arrays only:
        XLA tile-pads >2D arrays with small minor dims by up to 64× (the
        round-1 render OOM), while 2D gathers get a clean flipped layout."""
        table = params["table"]
        F = self.n_features_per_level
        if self.layout == "brick":
            from nerfshop_tpu.ops import table_ops

            idx, w1 = self._brick_fracs(x)  # [L, N], [L, N, D]
            w8 = table_ops.corner_products(w1)  # [L, N, 2^D]
            L, N = idx.shape
            bricks = params.get("brick_tables") if isinstance(params, dict) else None
            if bricks is not None:
                # inference fast path: PREBUILT brick tables (one build per
                # bake instead of per chunk dispatch — 12x on bake_volume).
                # Same stacked-einsum structure as the fused op.
                C = 1 << self.n_input_dims
                F = self.n_features_per_level
                feats = jnp.stack(
                    [jnp.take(bricks[l], idx[l], axis=0) for l in range(self.n_levels)]
                ).reshape(L, N, C, F)
                out = jnp.einsum(
                    "lnc,lncf->lnf", w8.astype(feats.dtype), feats,
                    preferred_element_type=jnp.float32,
                )
            else:
                out = self._brick_encode(table, idx, w8, w1)  # [L, N, F]
            return out.transpose(1, 0, 2).reshape(N, self.n_output_dims)
        if self.layout == "paired":
            # doubled table: row i = (canon[i], canon[i+1]) → one row-gather
            # fetches both x-corners (roll is dense + autodiff-transparent)
            pair = jnp.concatenate([table, jnp.roll(table, -1, axis=0)], axis=-1)
            outs = []
            n_yz = 1 << (self.n_input_dims - 1)
            for l in range(self.n_levels):
                idx, w_yz, fx = self._paired_level_indices(x, l)
                fx = fx.astype(table.dtype)[:, None]
                acc = None
                for c in range(n_yz):
                    feats = jnp.take(pair, idx[:, c], axis=0)  # [N, 2F]
                    lerp = feats[:, :F] * (1.0 - fx) + feats[:, F:] * fx
                    term = lerp * w_yz[:, c : c + 1].astype(table.dtype)
                    acc = term if acc is None else acc + term
                outs.append(acc)
            return jnp.concatenate(outs, axis=-1)
        idx, w = self._corner_indices(x)  # [N, L, C], [N, L, C]
        feats = jnp.take(table, idx, axis=0)  # [N, L, C, F]
        out = jnp.einsum("nlc,nlcf->nlf", w.astype(feats.dtype), feats)
        return out.reshape(x.shape[0], self.n_output_dims)


# ---------------------------------------------------------------------------
# Spherical harmonics (degree ≤ 4, matching tcnn's polynomial expansion)
# ---------------------------------------------------------------------------


@dataclass
class SphericalHarmonicsEncoding(Encoding):
    """Input in [0,1]³ (warped direction); output degree² coefficients."""

    n_input_dims: int = 3
    degree: int = 4

    @property
    def n_output_dims(self) -> int:
        return self.degree**2

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        d = x * 2.0 - 1.0
        xx, yy, zz = d[..., 0], d[..., 1], d[..., 2]
        x2, y2, z2 = xx * xx, yy * yy, zz * zz
        out = [jnp.full_like(xx, 0.28209479177387814)]  # l=0
        if self.degree >= 2:
            out += [
                -0.48860251190291987 * yy,
                0.48860251190291987 * zz,
                -0.48860251190291987 * xx,
            ]
        if self.degree >= 3:
            xy, yz, xz = xx * yy, yy * zz, xx * zz
            out += [
                1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.94617469575755997 * z2 - 0.31539156525251999,
                -1.0925484305920792 * xz,
                0.54627421529603959 * (x2 - y2),
            ]
        if self.degree >= 4:
            out += [
                0.59004358992664352 * yy * (-3.0 * x2 + y2),
                2.8906114426405538 * xx * yy * zz,
                0.45704579946446572 * yy * (1.0 - 5.0 * z2),
                0.3731763325901154 * zz * (5.0 * z2 - 3.0),
                0.45704579946446572 * xx * (1.0 - 5.0 * z2),
                1.4453057213202769 * zz * (x2 - y2),
                0.59004358992664352 * xx * (-x2 + 3.0 * y2),
            ]
        if self.degree >= 5:
            raise NotImplementedError("SH degree > 4")
        return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Takikawa (NGLOD) octree encoding — reference: takikawa_encoding.cuh +
# triangle_octree.cuh. The CUDA version traverses explicit node/dual-node
# arrays; here each depth is a hashed corner-feature table masked by the
# octree's per-depth occupancy (features exist only where the surface is,
# zeros outside — the same semantics traverse() produces).
# ---------------------------------------------------------------------------


@dataclass
class TakikawaEncoding(Encoding):
    octree: Any = None  # geometry.triangle_octree.TriangleOctree
    n_input_dims: int = 3
    n_levels: int = 10
    starting_level: int = 4
    n_features_per_level: int = 8
    log2_hashmap_size: int = 19
    sum_instead_of_concat: bool = False

    def __post_init__(self):
        T = 1 << self.log2_hashmap_size
        self.level_sizes: List[int] = []
        self.level_offsets: List[int] = [0]
        for l in range(self.n_levels):
            depth = self.starting_level + l
            res = (1 << depth) + 1  # corner-vertex grid
            size = min(T, -(-(res**3) // 8) * 8)
            self.level_sizes.append(size)
            self.level_offsets.append(self.level_offsets[-1] + size)
        self.table_size = self.level_offsets[-1]
        # device copies of the per-depth occupancy masks
        self._masks = None

    @property
    def n_output_dims(self) -> int:
        if self.sum_instead_of_concat:
            return self.n_features_per_level
        return self.n_levels * self.n_features_per_level

    def init(self, rng: jax.Array):
        return {
            "table": jax.random.uniform(
                rng, (self.table_size, self.n_features_per_level), jnp.float32, -1e-4, 1e-4
            )
        }

    def _mask_arrays(self):
        if self._masks is None:
            ms = []
            for l in range(self.n_levels):
                occ = self.octree.occupancy_at_depth(self.starting_level + l)
                ms.append(jnp.asarray(np.asarray(occ).reshape(-1)))
            self._masks = ms
        return self._masks

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        table = params["table"]
        F = self.n_features_per_level
        masks = self._mask_arrays()
        outs = []
        for l in range(self.n_levels):
            depth = self.starting_level + l
            res = 1 << depth
            p = jnp.clip(x, 0.0, 1.0) * res
            p0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, res - 1)
            frac = p - p0.astype(x.dtype)
            # node membership at this depth (dense mask, ancestor-clamped)
            mres = int(round(masks[l].shape[0] ** (1 / 3)))
            mc = jnp.clip((p0 * mres) // res, 0, mres - 1)
            inside = jnp.take(
                masks[l], (mc[:, 0] * mres + mc[:, 1]) * mres + mc[:, 2], axis=0
            )
            acc = None
            for c in range(8):
                off = jnp.asarray([(c >> d) & 1 for d in range(3)], jnp.int32)
                corner = jnp.minimum(p0 + off[None], res).astype(jnp.uint32)
                h = corner[:, 0] ^ (corner[:, 1] * jnp.uint32(_HASH_PRIMES[1])) ^ (
                    corner[:, 2] * jnp.uint32(_HASH_PRIMES[2])
                )
                idx = (h % jnp.uint32(self.level_sizes[l])).astype(jnp.int32) + self.level_offsets[l]
                w = jnp.prod(
                    jnp.where(off[None] == 1, frac, 1.0 - frac), axis=-1, keepdims=True
                )
                term = jnp.take(table, idx, axis=0) * w.astype(table.dtype)
                acc = term if acc is None else acc + term
            acc = jnp.where(inside[:, None], acc, 0.0)
            outs.append(acc)
        if self.sum_instead_of_concat:
            return sum(outs)
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Frequency / TriangleWave / OneBlob / Identity / Composite
# ---------------------------------------------------------------------------


@dataclass
class FrequencyEncoding(Encoding):
    n_input_dims: int = 3
    n_frequencies: int = 12

    @property
    def n_output_dims(self) -> int:
        return self.n_input_dims * self.n_frequencies * 2

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        freqs = jnp.exp2(jnp.arange(self.n_frequencies, dtype=x.dtype)) * jnp.pi
        ang = x[..., :, None] * freqs  # [N, D, F]
        out = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [N, D, F, 2]
        return out.reshape(*x.shape[:-1], self.n_output_dims)


@dataclass
class TriangleWaveEncoding(Encoding):
    n_input_dims: int = 3
    n_frequencies: int = 12

    @property
    def n_output_dims(self) -> int:
        return self.n_input_dims * self.n_frequencies

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        freqs = jnp.exp2(jnp.arange(self.n_frequencies, dtype=x.dtype))
        ang = x[..., :, None] * freqs
        tri = jnp.abs(2.0 * (ang - jnp.floor(ang + 0.5)))
        return tri.reshape(*x.shape[:-1], self.n_output_dims)


@dataclass
class OneBlobEncoding(Encoding):
    n_input_dims: int = 3
    n_bins: int = 16

    @property
    def n_output_dims(self) -> int:
        return self.n_input_dims * self.n_bins

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        # Gaussian kernel integrated over each bin (quartic approx à la tcnn)
        centers = (jnp.arange(self.n_bins, dtype=x.dtype) + 0.5) / self.n_bins
        sigma = 1.0 / self.n_bins
        d = x[..., :, None] - centers  # [N, D, B]
        blob = jnp.exp(-0.5 * (d / sigma) ** 2) / (sigma * math.sqrt(2 * math.pi)) / self.n_bins
        return blob.reshape(*x.shape[:-1], self.n_output_dims)


@dataclass
class IdentityEncoding(Encoding):
    n_input_dims: int = 3
    scale: float = 1.0
    offset: float = 0.0

    @property
    def n_output_dims(self) -> int:
        return self.n_input_dims

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.scale + self.offset


@dataclass
class CompositeEncoding(Encoding):
    nested: Sequence[Encoding] = field(default_factory=list)

    @property
    def n_input_dims(self) -> int:  # type: ignore[override]
        return sum(e.n_input_dims for e in self.nested)

    @property
    def n_output_dims(self) -> int:
        return sum(e.n_output_dims for e in self.nested)

    def init(self, rng: jax.Array):
        keys = jax.random.split(rng, max(len(self.nested), 1))
        return [e.init(k) for e, k in zip(self.nested, keys)]

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        outs, start = [], 0
        for e, p in zip(self.nested, params):
            outs.append(e.apply(p, x[..., start : start + e.n_input_dims]))
            start += e.n_input_dims
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Factory from JSON config (reference: src/testbed.cu:2258-2302)
# ---------------------------------------------------------------------------


def build_encoding(cfg: dict, n_input_dims: int, per_level_scale: Optional[float] = None, octree=None) -> Encoding:
    otype = cfg.get("otype", "HashGrid")
    if otype == "Takikawa":
        if octree is None:
            raise ValueError("Takikawa encoding requires an octree (built from the scene mesh)")
        return TakikawaEncoding(
            octree=octree,
            n_levels=cfg.get("n_levels", 10),
            starting_level=cfg.get("starting_level", 4),
            n_features_per_level=cfg.get("n_features_per_level", 8),
            log2_hashmap_size=cfg.get("log2_hashmap_size", 19),
            sum_instead_of_concat=cfg.get("sum_instead_of_concat", False),
        )
    if otype in ("HashGrid", "DenseGrid", "TiledGrid", "Grid"):
        return GridEncoding(
            n_input_dims=n_input_dims,
            n_levels=cfg.get("n_levels", 16),
            n_features_per_level=cfg.get("n_features_per_level", 2),
            log2_hashmap_size=cfg.get("log2_hashmap_size", 19),
            base_resolution=cfg.get("base_resolution", 16),
            per_level_scale=per_level_scale or cfg.get("per_level_scale", 2.0),
            hash_type="dense" if otype == "DenseGrid" else "hash",
            interpolation=cfg.get("interpolation", "linear").lower(),
            layout=cfg.get("layout", "brick"),
        )
    if otype == "SphericalHarmonics":
        return SphericalHarmonicsEncoding(n_input_dims=3, degree=cfg.get("degree", 4))
    if otype == "Frequency":
        return FrequencyEncoding(n_input_dims=n_input_dims, n_frequencies=cfg.get("n_frequencies", 12))
    if otype == "TriangleWave":
        return TriangleWaveEncoding(n_input_dims=n_input_dims, n_frequencies=cfg.get("n_frequencies", 12))
    if otype == "OneBlob":
        return OneBlobEncoding(n_input_dims=n_input_dims, n_bins=cfg.get("n_bins", 16))
    if otype == "Identity":
        return IdentityEncoding(
            n_input_dims=n_input_dims, scale=cfg.get("scale", 1.0), offset=cfg.get("offset", 0.0)
        )
    if otype == "Composite":
        nested_cfgs = cfg.get("nested", [])
        remaining = n_input_dims
        nested = []
        for i, nc in enumerate(nested_cfgs):
            nd = nc.get("n_dims_to_encode")
            if nd is None:
                nd = remaining if i == len(nested_cfgs) - 1 else remaining
            nd = min(nd, remaining)
            if nd <= 0:
                continue
            nested.append(build_encoding(nc, nd, per_level_scale))
            remaining -= nd
        return CompositeEncoding(nested=nested)
    raise ValueError(f"unknown encoding otype {otype!r}")
