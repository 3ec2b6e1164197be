"""Cell-subset maps: the multi-material submesh machinery as gather/scatter.

The reference builds dolfinx submeshes with precomputed parent/sub dof index
arrays (`SpaceMap`/`SubSpaceMap`/`IdentityMap`, solver/maps.py:14-178) and
copies QP data back and forth per law (`map_to_parent`/`map_to_sub`). On
arrays this collapses to fancy indexing on the leading cell axis; the map
object exists for API parity, for observation code, and to carry the
identity-fast-path semantics (maps.py:29-59).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = ["CellSubsetMap", "build_cell_subset_map"]


@dataclass(frozen=True)
class CellSubsetMap:
    """Maps [C_parent, Q, ...] QP arrays to/from a cell subset block."""

    cells: np.ndarray  # subset cell indices (parent numbering)
    n_parent: int
    identity: bool

    def map_to_sub(self, parent: jnp.ndarray) -> jnp.ndarray:
        if self.identity:
            return parent
        return parent[jnp.asarray(self.cells)]

    def map_to_parent(
        self, sub: jnp.ndarray, parent: jnp.ndarray
    ) -> jnp.ndarray:
        """Write the subset block into (a copy of) the parent array."""
        if self.identity:
            return sub
        return parent.at[jnp.asarray(self.cells)].set(sub)


def build_cell_subset_map(cells: np.ndarray, n_parent: int) -> CellSubsetMap:
    """Analog of build_subspace_map (reference maps.py:126-178) with the
    whole-mesh identity fast path."""
    cells = np.asarray(cells, np.int32)
    identity = len(cells) == n_parent and np.array_equal(
        cells, np.arange(n_parent, dtype=np.int32)
    )
    return CellSubsetMap(cells=cells, n_parent=n_parent, identity=identity)
