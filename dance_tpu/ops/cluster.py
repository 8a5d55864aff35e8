"""Device clustering: Lloyd KMeans under jit (kmeans++ init), host Louvain.

Replaces sklearn.KMeans (used for clustering heads across the model zoo,
e.g. graph-sc dance/modules/.../graphsc.py:247-272) and the vendored
python-louvain (dance/modules/spatial/spatial_domain/louvain.py).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST


class KMeansResult(NamedTuple):
    labels: jax.Array
    centers: jax.Array
    inertia: jax.Array


@partial(jax.jit, static_argnames=("n_clusters",))
def _kmeans_pp_init(x, key, n_clusters: int):
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers0 = jnp.zeros((n_clusters, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        centers, key = carry
        d2 = _sq_dists(x, centers)
        # distance to nearest chosen center; unchosen slots are zero-rows —
        # mask by only considering the first i centers
        valid = jnp.arange(centers.shape[0]) < i
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        dmin = d2.min(axis=1)
        key, sub = jax.random.split(key)
        probs = dmin / jnp.maximum(dmin.sum(), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(x[idx]), key

    centers, _ = jax.lax.fori_loop(1, n_clusters, body, (centers0, key))
    return centers


def _sq_dists(x, centers):
    xx = (x ** 2).sum(1)[:, None]
    cc = (centers ** 2).sum(1)[None, :]
    xc = jnp.dot(x, centers.T, precision=HI)
    return jnp.maximum(xx + cc - 2 * xc, 0.0)


def _lloyd_step(x, centers, n_clusters: int):
    d2 = _sq_dists(x, centers)
    labels = jnp.argmin(d2, axis=1)
    onehot = jax.nn.one_hot(labels, n_clusters, dtype=x.dtype)
    counts = onehot.sum(0)
    sums = jnp.dot(onehot.T, x, precision=HI)
    new = sums / jnp.maximum(counts[:, None], 1.0)
    # keep old center for empty clusters
    return jnp.where(counts[:, None] > 0, new, centers)


@partial(jax.jit, static_argnames=("n_clusters", "n_iter", "tol"))
def _lloyd(x, centers, n_clusters: int, n_iter: int, tol: float = 0.0):
    if tol > 0.0:
        # sklearn semantics: stop when the squared Frobenius norm of the
        # center shift falls under tol * mean per-feature variance
        # (sklearn _kmeans._tolerance); runs inside one while_loop so the
        # whole fit stays a single dispatch with no fixed 300-iter burn.
        tol_ = tol * jnp.var(x, axis=0).mean()

        def cond(state):
            i, _, shift2 = state
            return (i < n_iter) & (shift2 > tol_)

        def body(state):
            i, centers, _ = state
            new = _lloyd_step(x, centers, n_clusters)
            return i + 1, new, ((new - centers) ** 2).sum()

        _, centers, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), centers, jnp.inf))
    else:
        centers = jax.lax.fori_loop(
            0, n_iter, lambda _, c: _lloyd_step(x, c, n_clusters), centers)
    d2 = _sq_dists(x, centers)
    labels = jnp.argmin(d2, axis=1)
    inertia = jnp.take_along_axis(d2, labels[:, None], axis=1).sum()
    return labels, centers, inertia


@partial(jax.jit, static_argnames=("n_clusters", "n_iter", "n_init", "tol"))
def _kmeans_multi(x, seed, n_clusters: int, n_iter: int, n_init: int,
                  tol: float = 0.0):
    # same stream as the historical loop: restart i uses key(seed + i)
    keys = jax.vmap(jax.random.key)(seed + jnp.arange(n_init))

    def one(key):
        centers = _kmeans_pp_init(x, key, n_clusters)
        return _lloyd(x, centers, n_clusters, n_iter, tol)

    labels, centers, inertias = jax.vmap(one)(keys)
    b = jnp.argmin(inertias)
    return labels[b], centers[b], inertias[b]


def kmeans(x, n_clusters: int, *, n_init: int = 5, n_iter: int = 100,
           seed: int = 0, tol: float = 0.0) -> KMeansResult:
    """KMeans with kmeans++ init, best of ``n_init`` restarts, all on device.

    The restarts run vmapped in ONE dispatch with the argmin-by-inertia on
    device — the previous Python loop pulled an inertia scalar per restart
    (n_init relay round trips per call, and the DEC family calls this every
    fit). ``tol > 0`` adds sklearn-style convergence stopping (center-shift
    Frobenius norm vs tol × mean feature variance) so callers that mirror
    sklearn's ``KMeans(tol=1e-4)`` don't burn the full ``n_iter`` budget."""
    x = jnp.asarray(x, jnp.float32)
    labels, centers, inertia = _kmeans_multi(x, seed, n_clusters, n_iter,
                                             n_init, float(tol))
    return KMeansResult(labels, centers, inertia)


def louvain(adj, resolution: float = 1.0, seed: int = 0, max_passes: int = 10) -> np.ndarray:
    """Louvain community detection on a (sparse) adjacency matrix (host-side).

    Replaces the vendored python-louvain module (reference louvain.py:328).
    Standard two-phase modularity optimization; returns integer labels.
    Dispatches to the C++ kernel (native/louvain.cpp) when the toolchain is
    available — the numpy loop below is the behavioral spec and fallback.
    """
    import scipy.sparse as sp

    adj = sp.csr_matrix(adj)
    adj = adj + adj.T  # symmetrize
    from dance_tpu.native import louvain_labels
    raw = louvain_labels(adj, resolution=resolution, seed=seed,
                         max_passes=max_passes)
    if raw is not None:
        _, labels = np.unique(raw, return_inverse=True)
        return labels
    n0 = adj.shape[0]
    node_map = np.arange(n0)  # community of each original node
    rng = np.random.default_rng(seed)

    for _ in range(max_passes):
        n = adj.shape[0]
        m2 = adj.sum()
        if m2 == 0:
            break
        degrees = np.asarray(adj.sum(axis=1)).ravel()
        comm = np.arange(n)
        comm_deg = degrees.copy()
        improved = False
        order = rng.permutation(n)
        for _ in range(10):  # local move iterations
            moved = False
            for u in order:
                cu = comm[u]
                comm_deg[cu] -= degrees[u]
                start, end = adj.indptr[u], adj.indptr[u + 1]
                nbrs, wts = adj.indices[start:end], adj.data[start:end]
                link_w = {}
                for v, w in zip(nbrs, wts):
                    if v != u:
                        link_w[comm[v]] = link_w.get(comm[v], 0.0) + w
                best_c, best_gain = cu, 0.0
                base = link_w.get(cu, 0.0) - resolution * comm_deg[cu] * degrees[u] / m2
                for c, w in link_w.items():
                    gain = (w - resolution * comm_deg[c] * degrees[u] / m2) - base
                    if gain > best_gain + 1e-12:
                        best_c, best_gain = c, gain
                comm[u] = best_c
                comm_deg[best_c] += degrees[u]
                if best_c != cu:
                    moved = improved = True
            if not moved:
                break
        if not improved:
            break
        # phase 2: aggregate graph
        uniq, inv = np.unique(comm, return_inverse=True)
        node_map = inv[node_map]
        proj = sp.csr_matrix((np.ones(n), (np.arange(n), inv)), shape=(n, len(uniq)))
        adj = (proj.T @ adj @ proj).tocsr()
        if len(uniq) == n:
            break
    _, labels = np.unique(node_map, return_inverse=True)
    return labels


def leiden(adj, resolution: float = 1.0, seed: int = 0) -> np.ndarray:
    """Leiden-style clustering: Louvain with a refinement pass.

    A pragmatic stand-in with the same call surface; uses Louvain moves plus a
    connectivity-refinement step splitting disconnected communities.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    labels = louvain(adj, resolution=resolution, seed=seed)
    adj = sp.csr_matrix(adj)
    out = labels.copy()
    next_label = labels.max() + 1
    for c in np.unique(labels):
        idx = np.nonzero(labels == c)[0]
        if len(idx) <= 1:
            continue
        sub = adj[idx][:, idx]
        ncomp, comp = connected_components(sub, directed=False)
        if ncomp > 1:
            for k in range(1, ncomp):
                out[idx[comp == k]] = next_label
                next_label += 1
    _, out = np.unique(out, return_inverse=True)
    return out


__all__ = ["KMeansResult", "kmeans", "leiden", "louvain"]
