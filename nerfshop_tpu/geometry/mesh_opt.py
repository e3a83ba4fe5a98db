"""Mesh refinement against the density field (S7 parity).

Replaces the reference's ``optimise_mesh_step`` / ``compute_mesh_opt_gradients``
(src/testbed_nerf.cu:4470, src/marching_cubes.cu): marching-cubes vertices are
treated as a trainable buffer and stepped with Adam so that each vertex

* lands on the target iso-surface (density term: ½·(σ(v) − thresh)²),
* stays smooth (½·|v − mean(1-ring)|² laplacian term),
* optionally inflates along the outward normal (constant force).

TPU-first design: the reference launches a hand-written gradient kernel per
term and feeds a tcnn ``TrainableBuffer<3,1>`` Adam; here the density term is
plain JAX autodiff through the network's density path, the laplacian is one
gather + segment mean over a fixed-fanout neighbor table, and the whole step
is a single jitted function — vertices stay on device for all steps.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfshop_tpu.geometry.mesh_io import TriMesh


def build_neighbor_table(faces: np.ndarray, n_vertices: int) -> Tuple[np.ndarray, np.ndarray]:
    """Undirected 1-ring adjacency as a fixed-fanout table.

    → (neighbors [V, D] int32 padded with the vertex's own index,
       counts [V] float32). Fixed fanout keeps the laplacian a static-shape
    gather (XLA-friendly) instead of a ragged CSR loop."""
    pairs = set()
    for a, b, c in faces:
        pairs.update(((a, b), (b, a), (b, c), (c, b), (c, a), (a, c)))
    adj = [[] for _ in range(n_vertices)]
    for a, b in pairs:
        adj[a].append(b)
    deg = max((len(a) for a in adj), default=1)
    nbr = np.empty((n_vertices, deg), np.int32)
    cnt = np.zeros((n_vertices,), np.float32)
    for v, a in enumerate(adj):
        cnt[v] = max(len(a), 1)
        row = a + [v] * (deg - len(a))  # pad with self: contributes v itself
        nbr[v] = row if a else [v] * deg
    return nbr, cnt


def optimize_mesh(
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],  # [N,3] unit cube → σ [N]
    mesh: TriMesh,
    n_steps: int = 100,
    thresh: float = 2.5,
    density_amount: float = 0.001,
    smooth_amount: float = 4.0,
    inflate_amount: float = 0.0,
    learning_rate: float = 1e-4,
) -> TriMesh:
    """Refine ``mesh`` vertices in place against the density iso-surface.

    Amount defaults mirror the reference GUI sliders (testbed.h m_mesh:
    smooth_amount 2048 scaled by vert count there; ours are per-vertex)."""
    if mesh.n_vertices == 0 or n_steps <= 0:
        return mesh
    nbr_np, cnt_np = build_neighbor_table(mesh.faces, mesh.n_vertices)
    nbr = jnp.asarray(nbr_np)
    cnt = jnp.asarray(cnt_np)
    pad_self = nbr_np == np.arange(mesh.n_vertices, dtype=np.int32)[:, None]
    pad_mask = jnp.asarray(~pad_self, jnp.float32)  # 0 where padded with self

    faces = jnp.asarray(mesh.faces)

    def vertex_normals(v):
        fn = jnp.cross(v[faces[:, 1]] - v[faces[:, 0]], v[faces[:, 2]] - v[faces[:, 0]])
        n = jnp.zeros_like(v).at[faces[:, 0]].add(fn).at[faces[:, 1]].add(fn).at[faces[:, 2]].add(fn)
        return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-20)

    def loss(v):
        sig = density_fn(v)
        l_density = 0.5 * jnp.mean((sig - thresh) ** 2) * density_amount
        ring = jnp.sum(v[nbr] * pad_mask[..., None], axis=1) / cnt[:, None]
        l_smooth = 0.5 * jnp.mean(jnp.sum((v - ring) ** 2, -1)) * smooth_amount
        return l_density + l_smooth

    grad_fn = jax.grad(loss)

    @jax.jit
    def step(v, m, s, t):
        g = grad_fn(v)
        if inflate_amount:
            g = g - vertex_normals(v) * inflate_amount
        m = 0.9 * m + 0.1 * g
        s = 0.99 * s + 0.01 * g * g
        mh = m / (1.0 - 0.9 ** t)
        sh = s / (1.0 - 0.99 ** t)
        v = v - learning_rate * mh / (jnp.sqrt(sh) + 1e-8)
        return v, m, s

    v = jnp.asarray(mesh.vertices)
    m = jnp.zeros_like(v)
    s = jnp.zeros_like(v)
    for t in range(1, n_steps + 1):
        v, m, s = step(v, m, s, jnp.asarray(float(t)))
    mesh.vertices = np.asarray(v, np.float32)
    return mesh
