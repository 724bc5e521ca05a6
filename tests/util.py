"""Shared test helpers: build tiny padded layers by hand."""
import jax.numpy as jnp
import numpy as np


def make_layer(nodes, edges, n_max=None, e_max=None, dtype=jnp.float64):
    """Pack python node/edge lists into the padded-array convention used by
    tinycarlo_tpu.geometry (pads repeat node 0 / edge (0,0) with False mask).
    """
    nodes = np.asarray(nodes, dtype=np.float64).reshape(-1, 2)
    edges = np.asarray(edges, dtype=np.int32).reshape(-1, 2) if len(edges) else np.zeros((0, 2), np.int32)
    n, e = len(nodes), len(edges)
    n_max = n_max or max(n, 1)
    e_max = e_max or max(e, 1)
    pn = np.zeros((n_max, 2), np.float64)
    pn[:n] = nodes
    if n:
        pn[n:] = nodes[0]
    pe = np.zeros((e_max, 2), np.int32)
    pe[:e] = edges
    return (
        jnp.asarray(pn, dtype=dtype),
        jnp.asarray(np.arange(n_max) < n),
        jnp.asarray(pe),
        jnp.asarray(np.arange(e_max) < e),
    )


def adjacency(edges, n_nodes, deg=4):
    """Successor/predecessor tables in edge order (matches map_compiler)."""
    nt = np.full((n_nodes, deg), -1, np.int32)
    pt = np.full((n_nodes, deg), -1, np.int32)
    nc = np.zeros(n_nodes, np.int32)
    pc = np.zeros(n_nodes, np.int32)
    for s, d in edges:
        nt[s, nc[s]] = d
        nc[s] += 1
        pt[d, pc[d]] = s
        pc[d] += 1
    return jnp.asarray(nt), jnp.asarray(nc), jnp.asarray(pt), jnp.asarray(pc)
