"""Positional / structural encodings for graph transformers.

Host-side Laplacian eigenvector positional encodings (computed once per
network at build time — scipy ``eigsh`` on the symmetrized normalized
Laplacian) plus out-degree structural encodings, and the ``EmbeddingMixer``
module that fuses them with node embeddings.

Reference: src/transformer/embedding.py:8-83 and the shared
``compute_encodings`` logic (agents/mpnn_agent.py:233-264,
agents/transformer_agent.py:152-200 incl. zero-padding for SRC/DEST nodes).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def laplacian_positional_encoding(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    num_nodes: int,
    positional_dim: int,
    total_num_nodes: Optional[int] = None,
) -> np.ndarray:
    """[total_num_nodes, positional_dim] Laplacian eigenvector PE.

    Symmetrize the adjacency, take the normalized Laplacian, keep the first
    ``positional_dim`` non-trivial eigenvectors (eigenvalue > 1e-5), column-
    normalize, and zero-pad rows for virtual SRC/DEST nodes
    (transformer_agent.py:171-200).
    """
    import scipy.sparse as sp
    from scipy.sparse import csgraph
    from scipy.sparse.linalg import eigsh

    a = sp.coo_matrix(
        (np.ones(len(edge_src)), (np.asarray(edge_src), np.asarray(edge_dst))),
        shape=(num_nodes, num_nodes),
    ).tocsr()
    a = (a + a.T) / 2
    lap = csgraph.laplacian(a, normed=True)
    k = min(positional_dim + 5, num_nodes - 1)
    try:
        eigvals, eigvecs = eigsh(lap, k=k, which="SM")
    except Exception:
        # Dense fallback for tiny graphs where ARPACK cannot converge.
        eigvals, eigvecs = np.linalg.eigh(lap.toarray())
    order = np.argsort(eigvals)
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    nontrivial = eigvals > 1e-5
    eigvecs = eigvecs[:, nontrivial][:, :positional_dim]

    norms = np.linalg.norm(eigvecs, axis=0, keepdims=True)
    eigvecs = eigvecs / np.maximum(norms, 1e-12)

    if eigvecs.shape[1] < positional_dim:  # pad if too few non-trivial modes
        eigvecs = np.pad(
            eigvecs, ((0, 0), (0, positional_dim - eigvecs.shape[1]))
        )

    total = total_num_nodes or num_nodes
    pe = np.zeros((total, positional_dim), dtype=np.float32)
    pe[:num_nodes] = eigvecs
    return pe


def degree_structural_encoding(
    edge_src: np.ndarray, num_nodes: int, total_num_nodes: Optional[int] = None
) -> np.ndarray:
    """[total_num_nodes, 1] out-degree encoding (embedding.py:56)."""
    deg = np.bincount(np.asarray(edge_src), minlength=num_nodes).astype(np.float32)
    total = total_num_nodes or num_nodes
    out = np.zeros((total, 1), dtype=np.float32)
    out[:num_nodes] = deg[:, None]
    return out


class EmbeddingMixer(nn.Module):
    """Fuse raw node features with positional + structural encodings
    (embedding.py:8-83): three linear maps summed."""

    out_dim: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,           # [N, F] raw node features
        pe: jnp.ndarray,          # [N, P] Laplacian PE
        se: jnp.ndarray,          # [N, 1] structural encoding
    ) -> jnp.ndarray:
        x_emb = nn.Dense(self.out_dim, name="linear")(x)
        x_pos = nn.Dense(self.out_dim, name="linear_positional")(pe)
        x_struct = nn.Dense(self.out_dim, name="linear_structural")(se)
        return x_emb + x_pos + x_struct
