"""The 7-ary height-13 Poseidon2 note tree.

Same tree shape as contracts/MerkleTree.sol: a 1-based heap over a sparse map
(empty nodes = 0), ``parent(i) = (i + ARITY - 2) / ARITY``, children of p at
``p*ARITY - (ARITY-2) .. p*ARITY + 1``; leaves occupy ``firstLeafId ..``
(treeBounds geometric series, MerkleTree.sol:160-174).  ``get_merkle_path``
returns the 13*7+1 flat layout of getMerklePath (MerkleTree.sol:92-118).

Two engines:
- ``MerkleTree`` — incremental host tree (python ints; 13 Poseidon2 hashes
  per insert, mirroring _addNote, MerkleTree.sol:121-148) with full root
  history;
- ``batch_build_levels`` — the TPU path: hash a whole level of 7-tuples in
  one batched device call (used to (re)build large trees and to verify paths
  en masse; the workload of BASELINE.json config 5).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import field as F
from ..ops import poseidon2 as P2
from .consts import ARITY, TREE_HEIGHT


def tree_bounds(height: int = TREE_HEIGHT) -> tuple[int, int]:
    """(max_leaf_id, first_leaf_id), 1-based heap ids (MerkleTree.sol:160-174)."""
    size = 1
    power = 1
    for _ in range(height):
        power *= ARITY
        size += power
    return size, size - power + 1


class MerkleTree:
    """Incremental note tree with root history (host-side golden engine)."""

    def __init__(self, height: int = TREE_HEIGHT):
        self.height = height
        self.max_leaf_id, self.first_leaf_id = tree_bounds(height)
        self.next_free_leaf_id = self.first_leaf_id
        self.notes: dict[int, int] = {}
        self.root = 0
        self.root_history: set[int] = set()

    def __len__(self) -> int:
        return self.next_free_leaf_id - self.first_leaf_id

    def add_note(self, note: int) -> int:
        """Insert; returns the 0-based leaf index (mirrors _addNote)."""
        if self.next_free_leaf_id > self.max_leaf_id:
            raise ValueError("max tree size exceeded")
        index = self.next_free_leaf_id
        self.notes[index] = note
        for _ in range(self.height):
            parent = (index + ARITY - 2) // ARITY
            base = parent * ARITY - (ARITY - 2)
            children = [self.notes.get(base + j, 0) for j in range(ARITY)]
            note = P2.hash_ints(children)
            self.notes[parent] = note
            index = parent
        self.root = note
        self.next_free_leaf_id += 1
        self.root_history.add(self.root)
        return self.next_free_leaf_id - self.first_leaf_id - 1

    def get_merkle_path(self, index: int) -> list[int]:
        """Flat [13*7 siblings..., root] path layout (MerkleTree.sol:92-118)."""
        if index >= len(self):
            raise IndexError("leaf not existing")
        index += self.first_leaf_id
        path = []
        for _ in range(self.height):
            parent = (index + ARITY - 2) // ARITY
            base = parent * ARITY - (ARITY - 2)
            path.extend(self.notes.get(base + j, 0) for j in range(ARITY))
            index = parent
        path.append(self.root)
        return path

    def root_exists(self, root: int) -> bool:
        return root in self.root_history


def path_to_matrix(path: list[int]) -> list[list[int]]:
    """height*7+1 flat path -> [[7 siblings] x height] (vec_to_path,
    crates/shielder_bindings/src/utils.rs:36-60; drops the trailing root)."""
    height, rem = divmod(len(path) - 1, ARITY)
    assert rem == 0, "path length must be height*ARITY + 1"
    return [path[i * ARITY : (i + 1) * ARITY] for i in range(height)]


def verify_path(leaf: int, path: list[int]) -> bool:
    """Check a getMerklePath output hashes up to its own root."""
    node = leaf
    for level in path_to_matrix(path):
        if node not in level:
            return False
        node = P2.hash_ints(level)
    return node == path[-1]


def batch_build_levels(leaves: np.ndarray, height: int = TREE_HEIGHT):
    """Device-batched dense-subtree build.

    leaves: (n,) array/list of python ints (n a power of 7 <= 7^height is not
    required — the level is zero-padded to a multiple of 7 like the sparse
    contract tree).  Returns (root_int, levels) where levels[i] is the numpy
    int list of level i (level 0 = leaves).

    Each level is ONE ``hash_n`` call of shape (18, 7, n/7) — the batch axis
    rides the vector lanes; with a mesh, wrap in
    ``parallel.sharded.sharded_hash_n``.
    """
    level = [int(x) for x in leaves]
    levels = [level]
    for _ in range(height):
        pad = (-len(level)) % ARITY
        level = level + [0] * pad
        n7 = len(level) // 7
        arr = np.zeros((F.N_LIMBS, ARITY, max(n7, 1)), dtype=np.uint32)
        for b in range(n7):
            for j in range(ARITY):
                arr[:, j, b] = F.to_limbs(level[b * ARITY + j])
        out = P2.hash_n(jnp.asarray(arr))
        level = F.from_limbs(np.asarray(out))
        if isinstance(level, int):
            level = [level]
        levels.append(level)
    assert len(levels[-1]) == 1
    return levels[-1][0], levels
