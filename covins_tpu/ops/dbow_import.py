"""DBoW2 `ORBvoc.txt` vocabulary import.

The reference backend loads the ORB-SLAM2/3 vocabulary tree at startup
(`covins_backend/src/covins_backend/backend.cpp:411-429`,
`include/covins/covins_base/vocabulary.h:44`; text format parsed by
`thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338-1421`).  Importing the
same file lets retrieval behavior be A/B'd against the reference instead
of depending on a self-trained vocabulary.

Text format (per the reference parser):
    line 0:   ``k L scoring_type weighting_type``
    line i:   ``parent_id is_leaf d0 .. d31 weight``
Node ids are implicit (line order, starting at 1; 0 is the root), leaves
get word ids in order of appearance.

Two consumption modes:

* :meth:`HierVocabulary.assign` — exact DBoW2 leaf word ids by tree
  descent, jittable (static ``L`` levels of gather + tiny Hamming argmin;
  no pointer chasing on device).
* :meth:`HierVocabulary.flatten` — a flat ``(K, 32)`` word-center matrix
  for the existing dense BoW database (`models/kf_database.py`), cut at
  the deepest tree level whose node count fits ``max_words`` (leaves above
  the cut keep the partition exact).  This trades DBoW2's 1M-leaf
  granularity for the dense-matmul retrieval path; both modes ship so the
  trade is measurable.
"""

from __future__ import annotations

import numpy as np

_POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    1).astype(np.int32)


class HierVocabulary:
    """Parsed DBoW2 vocabulary tree in flat numpy arrays."""

    def __init__(self, k, L, children, node_desc, node_weight, leaf_word_id,
                 depth, scoring=0, weighting=0):
        self.k = int(k)
        self.L = int(L)
        self.children = children          # (n_nodes, k) int32, -1 = none
        self.node_desc = node_desc        # (n_nodes, 32) uint8
        self.node_weight = node_weight    # (n_nodes,) float32
        self.leaf_word_id = leaf_word_id  # (n_nodes,) int32, -1 = inner
        self.depth = depth                # (n_nodes,) int32
        self.scoring = scoring
        self.weighting = weighting
        self.n_words = int((leaf_word_id >= 0).sum())

    # ------------------------------------------------------------- descent
    def assign(self, descs_u8, mask=None):
        """Exact DBoW2 word assignment by tree descent (jax).

        descs_u8: (N, 32) uint8.  Returns ``(word_ids (N,) int32,
        weights (N,) f32)``; masked rows get word id -1, weight 0.
        """
        import jax
        import jax.numpy as jnp

        children = jnp.asarray(self.children)
        node_desc = jnp.asarray(self.node_desc)
        weights = jnp.asarray(self.node_weight)
        word_of = jnp.asarray(self.leaf_word_id)
        pop = jnp.asarray(_POP)
        big = jnp.int32(1 << 14)

        def one(d):
            node = jnp.int32(0)
            for _ in range(self.L):  # static depth
                ch = children[node]  # (k,)
                valid = ch >= 0
                cd = node_desc[jnp.maximum(ch, 0)]  # (k, 32)
                dist = pop[(cd ^ d[None, :]).astype(jnp.int32)].sum(-1)
                dist = jnp.where(valid, dist, big)
                nxt = ch[jnp.argmin(dist)]
                # a leaf above depth L has no children: stay put
                node = jnp.where(jnp.any(valid), nxt, node)
            return word_of[node], weights[node]

        w, wt = jax.vmap(one)(jnp.asarray(descs_u8))
        if mask is not None:
            m = jnp.asarray(mask)
            w = jnp.where(m, w, -1)
            wt = jnp.where(m, wt, 0.0)
        return w, wt

    # ------------------------------------------------------------- flatten
    def flatten(self, max_words: int = 4096):
        """Flat word-center matrix for the dense BoW pipeline.

        Cuts the tree at the deepest level with <= ``max_words`` nodes
        (counting leaves that terminate above the cut, so the cut is a
        complete partition of descriptor space).  Returns ``(vocab
        (K, 32) uint8, idf_weights (K,) f32)``.
        """
        is_leaf = self.leaf_word_id >= 0
        best = 1
        for lvl in range(1, self.L + 1):
            n = int(((self.depth == lvl) | (is_leaf & (self.depth < lvl))).sum())
            if n <= max_words:
                best = lvl
            else:
                break
        sel = (self.depth == best) | (is_leaf & (self.depth < best))
        sel &= self.depth > 0  # never the root
        idx = np.where(sel)[0]
        return (self.node_desc[idx].copy(),
                self.node_weight[idx].astype(np.float32).copy())


def load_orb_vocabulary_text(path: str) -> HierVocabulary:
    """Parse a DBoW2 text vocabulary (`ORBvoc.txt`)."""
    with open(path) as fh:
        first = fh.readline().split()
        k, L = int(first[0]), int(first[1])
        scoring = int(first[2]) if len(first) > 2 else 0
        weighting = int(first[3]) if len(first) > 3 else 0
        body = fh.read()
    toks = np.array(body.split(), dtype=np.float64)
    ncols = 2 + 32 + 1  # parent, is_leaf, 32 descriptor bytes, weight
    if toks.size % ncols:
        raise ValueError(f"{path}: malformed DBoW2 text vocabulary")
    rows = toks.reshape(-1, ncols)
    n_nodes = len(rows) + 1  # + root

    parent = np.zeros(n_nodes, np.int32)
    parent[1:] = rows[:, 0].astype(np.int32)
    is_leaf = np.zeros(n_nodes, bool)
    is_leaf[1:] = rows[:, 1] > 0
    node_desc = np.zeros((n_nodes, 32), np.uint8)
    node_desc[1:] = rows[:, 2:34].astype(np.uint8)
    node_weight = np.zeros(n_nodes, np.float32)
    node_weight[1:] = rows[:, 34].astype(np.float32)

    children = np.full((n_nodes, k), -1, np.int32)
    slot = np.zeros(n_nodes, np.int32)
    order = np.arange(1, n_nodes, dtype=np.int32)
    for nid in order:  # child lists preserve file order, like the reference
        p = parent[nid]
        children[p, slot[p]] = nid
        slot[p] += 1

    leaf_word_id = np.full(n_nodes, -1, np.int32)
    leaf_word_id[is_leaf] = np.arange(int(is_leaf.sum()), dtype=np.int32)

    # depth by repeated parent-propagation (vectorized; parents precede
    # children in the file, so L passes converge for any tree of depth L —
    # a single fancy-indexed assignment would read the OLD depths)
    depth = np.zeros(n_nodes, np.int32)
    for _ in range(L):
        depth[1:] = depth[parent[1:]] + 1
    return HierVocabulary(k, L, children, node_desc, node_weight,
                          leaf_word_id, depth, scoring, weighting)


def save_orb_vocabulary_text(voc: HierVocabulary, path: str) -> None:
    """Write the DBoW2 text format (round-trip / test support)."""
    with open(path, "w") as fh:
        fh.write(f"{voc.k} {voc.L} {voc.scoring} {voc.weighting}\n")
        # nodes in id order (the format's implicit ids are line numbers)
        n_nodes = len(voc.node_desc)
        parent = np.zeros(n_nodes, np.int32)
        for p in range(n_nodes):
            for c in voc.children[p]:
                if c >= 0:
                    parent[c] = p
        for nid in range(1, n_nodes):
            d = " ".join(str(int(x)) for x in voc.node_desc[nid])
            leaf = 1 if voc.leaf_word_id[nid] >= 0 else 0
            fh.write(f"{parent[nid]} {leaf} {d} "
                     f"{float(voc.node_weight[nid])}\n")
