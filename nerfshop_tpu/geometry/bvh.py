"""Triangle BVH: host build + JAX device traversal.

The reference's TriangleBvh (src/triangle_bvh.cu, ~730 LoC CUDA with optional
OptiX) provides GPU ray tracing and signed-distance queries for the SDF
testbed. TPU re-design:

* build: host-side median-split over centroids (numpy, one-time);
  fixed-fanout leaves (LEAF_SIZE tris, padded with sentinel triangles) so
  device traversal has static shapes;
* queries: ``lax.while_loop`` stack traversal vmapped over query points —
  signed distance (angle-weighted pseudo-normal sign, the robust
  "Watertight" heuristic; OptiX raystab is not needed) and nearest-hit ray
  intersection (Möller–Trumbore).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4
MAX_STACK = 64
_FAR = 1e8


class BvhArrays(NamedTuple):
    """Device-resident BVH (a pytree of arrays)."""

    node_min: jnp.ndarray  # [N, 3]
    node_max: jnp.ndarray  # [N, 3]
    node_left: jnp.ndarray  # [N] child index, or -1 for leaf
    node_leaf: jnp.ndarray  # [N] leaf slot index, or -1 for inner
    leaf_tris: jnp.ndarray  # [L, LEAF_SIZE] triangle indices (padded w/ sentinel)
    tri_a: jnp.ndarray  # [F+1, 3] vertex 0 (last = sentinel at _FAR)
    tri_ab: jnp.ndarray  # [F+1, 3] edge vectors
    tri_ac: jnp.ndarray
    tri_pseudo_v: jnp.ndarray  # [F+1, 3, 3] per-corner (vertex) pseudo-normals
    tri_pseudo_e: jnp.ndarray  # [F+1, 3, 3] per-edge pseudo-normals (ab, bc, ca)
    tri_n: jnp.ndarray  # [F+1, 3] face normals


def build_bvh(vertices: np.ndarray, faces: np.ndarray) -> BvhArrays:
    """Median-split build; returns device arrays."""
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    tris = v[f]  # [F, 3, 3]
    cent = tris.mean(1)
    tmin = tris.min(1)
    tmax = tris.max(1)

    node_min, node_max, node_left, node_leaf = [], [], [], []
    leaves = []

    def new_node():
        node_min.append(np.zeros(3, np.float32))
        node_max.append(np.zeros(3, np.float32))
        node_left.append(-1)
        node_leaf.append(-1)
        return len(node_left) - 1

    # iterative build with an explicit work list (avoids Python recursion caps)
    root = new_node()
    work = [(root, np.arange(len(f)))]
    while work:
        ni, idx = work.pop()
        node_min[ni] = tmin[idx].min(0)
        node_max[ni] = tmax[idx].max(0)
        if len(idx) <= LEAF_SIZE:
            slot = np.full(LEAF_SIZE, len(f), np.int64)  # sentinel pad
            slot[: len(idx)] = idx
            node_leaf[ni] = len(leaves)
            leaves.append(slot)
            continue
        axis = int(np.argmax(node_max[ni] - node_min[ni]))
        order = np.argsort(cent[idx, axis], kind="stable")
        half = len(idx) // 2
        li = new_node()
        ri = new_node()
        node_left[ni] = li
        work.append((li, idx[order[:half]]))
        work.append((ri, idx[order[half:]]))

    # triangle-derived arrays with a sentinel triangle at index F
    a = np.concatenate([tris[:, 0], np.full((1, 3), _FAR, np.float32)])
    ab = np.concatenate([tris[:, 1] - tris[:, 0], np.zeros((1, 3), np.float32)])
    ac = np.concatenate([tris[:, 2] - tris[:, 0], np.zeros((1, 3), np.float32)])

    fn = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    fn_unit = fn / (np.linalg.norm(fn, axis=-1, keepdims=True) + 1e-20)

    # angle-weighted vertex pseudo-normals
    vn = np.zeros_like(v)
    for k in range(3):
        e1 = v[f[:, (k + 1) % 3]] - v[f[:, k]]
        e2 = v[f[:, (k + 2) % 3]] - v[f[:, k]]
        cosang = np.einsum("ij,ij->i", e1, e2) / (
            np.linalg.norm(e1, axis=-1) * np.linalg.norm(e2, axis=-1) + 1e-20
        )
        ang = np.arccos(np.clip(cosang, -1, 1))
        np.add.at(vn, f[:, k], fn_unit * ang[:, None])
    vn /= np.linalg.norm(vn, axis=-1, keepdims=True) + 1e-20

    # edge pseudo-normals: sum of the (≤2) adjacent face normals
    edge_key = {}
    edge_n = {}
    for ti in range(len(f)):
        for k in range(3):
            key = tuple(sorted((int(f[ti, k]), int(f[ti, (k + 1) % 3]))))
            edge_n[key] = edge_n.get(key, 0) + fn_unit[ti]
    en = np.zeros((len(f), 3, 3), np.float32)
    for ti in range(len(f)):
        for k in range(3):
            key = tuple(sorted((int(f[ti, k]), int(f[ti, (k + 1) % 3]))))
            n = edge_n[key]
            en[ti, k] = n / (np.linalg.norm(n) + 1e-20)

    pv = vn[f]  # [F, 3, 3]
    pad1 = np.zeros((1, 3, 3), np.float32)
    return BvhArrays(
        node_min=jnp.asarray(np.stack(node_min)),
        node_max=jnp.asarray(np.stack(node_max)),
        node_left=jnp.asarray(np.asarray(node_left, np.int32)),
        node_leaf=jnp.asarray(np.asarray(node_leaf, np.int32)),
        leaf_tris=jnp.asarray(np.stack(leaves).astype(np.int32)),
        tri_a=jnp.asarray(a),
        tri_ab=jnp.asarray(ab),
        tri_ac=jnp.asarray(ac),
        tri_pseudo_v=jnp.asarray(np.concatenate([pv, pad1])),
        tri_pseudo_e=jnp.asarray(np.concatenate([en, pad1])),
        tri_n=jnp.asarray(np.concatenate([fn_unit, np.zeros((1, 3), np.float32)])),
    )


def _closest_point_tri(p, a, ab, ac):
    """Ericson closest-point-on-triangle. Returns (point, region_code)
    region: 0=face, 1..3=vertex a/b/c, 4..6=edge ab/bc/ca."""
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - (a + ab)
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - (a + ac)
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc
    v = vb / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    w = vc / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    pt_face = a + v[..., None] * ab + w[..., None] * ac

    # vertex regions
    reg_a = (d1 <= 0) & (d2 <= 0)
    reg_b = (d3 >= 0) & (d4 <= d3)
    reg_c = (d6 >= 0) & (d5 <= d6)
    # edge regions
    vab = d1 * d4 - d3 * d2
    reg_ab = (~reg_a) & (~reg_b) & (vab <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ab = d1 / jnp.maximum(d1 - d3, 1e-30)
    vbc = d3 * d6 - d5 * d4
    reg_bc = (~reg_b) & (~reg_c) & (vbc <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    t_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30)
    vca = d5 * d2 - d1 * d6
    reg_ca = (~reg_c) & (~reg_a) & (vca <= 0) & (d2 >= 0) & (d6 <= 0)
    t_ca = d2 / jnp.maximum(d2 - d6, 1e-30)

    pt = pt_face
    reg = jnp.zeros(p.shape[:-1], jnp.int32)
    pt = jnp.where(reg_ca[..., None], a + t_ca[..., None] * ac, pt)
    reg = jnp.where(reg_ca, 6, reg)
    pt = jnp.where(reg_bc[..., None], a + ab + t_bc[..., None] * (ac - ab), pt)
    reg = jnp.where(reg_bc, 5, reg)
    pt = jnp.where(reg_ab[..., None], a + t_ab[..., None] * ab, pt)
    reg = jnp.where(reg_ab, 4, reg)
    pt = jnp.where(reg_c[..., None], a + ac, pt)
    reg = jnp.where(reg_c, 3, reg)
    pt = jnp.where(reg_b[..., None], a + ab, pt)
    reg = jnp.where(reg_b, 2, reg)
    pt = jnp.where(reg_a[..., None], a, pt)
    reg = jnp.where(reg_a, 1, reg)
    return pt, reg


def _aabb_dist2(p, lo, hi):
    d = jnp.maximum(jnp.maximum(lo - p, p - hi), 0.0)
    return jnp.sum(d * d, -1)


def signed_distance(bvh: BvhArrays, points: jnp.ndarray) -> jnp.ndarray:
    """[N,3] → signed distance (negative inside), Watertight pseudo-normal
    sign (the reference's default SDF ground-truth mode)."""

    def one(p):
        def cond(s):
            sp, _, _, _, _ = s
            return sp > 0

        def body(s):
            sp, stack, best_d2, best_tri, best_pt = s
            sp = sp - 1
            ni = stack[sp]
            d2 = _aabb_dist2(p, bvh.node_min[ni], bvh.node_max[ni])

            def skip(args):
                return args

            def visit(args):
                sp, stack, best_d2, best_tri, best_pt = args
                leaf = bvh.node_leaf[ni]

                def do_leaf(args):
                    sp, stack, best_d2, best_tri, best_pt = args
                    tis = bvh.leaf_tris[leaf]  # [LEAF_SIZE]
                    pt, _ = _closest_point_tri(
                        jnp.broadcast_to(p, (LEAF_SIZE, 3)),
                        bvh.tri_a[tis], bvh.tri_ab[tis], bvh.tri_ac[tis],
                    )
                    d2s = jnp.sum((pt - p) ** 2, -1)
                    j = jnp.argmin(d2s)
                    better = d2s[j] < best_d2
                    return (
                        sp, stack,
                        jnp.where(better, d2s[j], best_d2),
                        jnp.where(better, tis[j], best_tri),
                        jnp.where(better, pt[j], best_pt),
                    )

                def do_inner(args):
                    sp, stack, best_d2, best_tri, best_pt = args
                    li = bvh.node_left[ni]
                    dl = _aabb_dist2(p, bvh.node_min[li], bvh.node_max[li])
                    dr = _aabb_dist2(p, bvh.node_min[li + 1], bvh.node_max[li + 1])
                    # push farther child first so nearer is processed next
                    first = jnp.where(dl <= dr, li, li + 1)
                    second = jnp.where(dl <= dr, li + 1, li)
                    stack = stack.at[sp].set(second)
                    stack = stack.at[sp + 1].set(first)
                    return (sp + 2, stack, best_d2, best_tri, best_pt)

                return jax.lax.cond(leaf >= 0, do_leaf, do_inner, args)

            return jax.lax.cond(d2 < best_d2, visit, skip, (sp, stack, best_d2, best_tri, best_pt))

        stack0 = jnp.zeros(MAX_STACK, jnp.int32)
        init = (jnp.int32(1), stack0, jnp.float32(1e30), jnp.int32(-1), jnp.zeros(3))
        _, _, best_d2, best_tri, best_pt = jax.lax.while_loop(cond, body, init)

        # pseudo-normal sign from the closest feature
        _, reg = _closest_point_tri(p, bvh.tri_a[best_tri], bvh.tri_ab[best_tri], bvh.tri_ac[best_tri])
        n_face = bvh.tri_n[best_tri]
        pv = bvh.tri_pseudo_v[best_tri]
        pe = bvh.tri_pseudo_e[best_tri]
        normal = jax.lax.switch(
            reg,
            [lambda: n_face, lambda: pv[0], lambda: pv[1], lambda: pv[2],
             lambda: pe[0], lambda: pe[1], lambda: pe[2]],
        )
        sign = jnp.where(jnp.sum((p - best_pt) * normal) >= 0, 1.0, -1.0)
        return sign * jnp.sqrt(best_d2)

    return jax.vmap(one)(points)


def ray_intersect(bvh: BvhArrays, origins: jnp.ndarray, directions: jnp.ndarray):
    """Nearest hit: → (t [N] (_FAR if miss), tri_idx [N] (-1 if miss))."""

    def one(o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

        def aabb_t(lo, hi, t_best):
            t0 = (lo - o) * inv
            t1 = (hi - o) * inv
            tn = jnp.max(jnp.minimum(t0, t1))
            tf = jnp.min(jnp.maximum(t0, t1))
            return (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)

        def cond(s):
            return s[0] > 0

        def body(s):
            sp, stack, t_best, tri_best = s
            sp = sp - 1
            ni = stack[sp]
            hit_box = aabb_t(bvh.node_min[ni], bvh.node_max[ni], t_best)

            def visit(args):
                sp, stack, t_best, tri_best = args
                leaf = bvh.node_leaf[ni]

                def do_leaf(args):
                    sp, stack, t_best, tri_best = args
                    tis = bvh.leaf_tris[leaf]
                    a = bvh.tri_a[tis]
                    ab = bvh.tri_ab[tis]
                    ac = bvh.tri_ac[tis]
                    # Möller–Trumbore
                    pvec = jnp.cross(jnp.broadcast_to(d, ab.shape), ac)
                    det = jnp.sum(ab * pvec, -1)
                    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
                    tvec = o - a
                    u = jnp.sum(tvec * pvec, -1) * inv_det
                    qvec = jnp.cross(tvec, ab)
                    v = jnp.sum(jnp.broadcast_to(d, ab.shape) * qvec, -1) * inv_det
                    t = jnp.sum(ac * qvec, -1) * inv_det
                    ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6) & (t < t_best)
                    t = jnp.where(ok, t, _FAR)
                    j = jnp.argmin(t)
                    better = t[j] < t_best
                    return (
                        sp, stack,
                        jnp.where(better, t[j], t_best),
                        jnp.where(better, tis[j], tri_best),
                    )

                def do_inner(args):
                    sp, stack, t_best, tri_best = args
                    li = bvh.node_left[ni]
                    stack = stack.at[sp].set(li)
                    stack = stack.at[sp + 1].set(li + 1)
                    return (sp + 2, stack, t_best, tri_best)

                return jax.lax.cond(leaf >= 0, do_leaf, do_inner, args)

            return jax.lax.cond(hit_box, visit, lambda a: a, (sp, stack, t_best, tri_best))

        stack0 = jnp.zeros(MAX_STACK, jnp.int32)
        init = (jnp.int32(1), stack0, jnp.float32(_FAR), jnp.int32(-1))
        _, _, t_best, tri_best = jax.lax.while_loop(cond, body, init)
        return t_best, tri_best

    return jax.vmap(one)(origins, directions)
