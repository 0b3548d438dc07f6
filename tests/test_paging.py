"""Page-Merkle memory commitment (zkvm/paging.py): roots, paths, updates.

Reference role: memory-image SystemState / paging of risc0's rv32im
circuit (SURVEY.md §2.4) — here the host substrate the lift circuit's
page section is checked against.
"""

import numpy as np
import pytest

from boundless_tpu.zkvm import paging


def test_zero_tree_and_sparse_root():
    t = paging.PageTree()
    r0 = t.root()
    assert r0 == paging.ZERO[paging.DEPTH]
    # setting an explicit zero page keeps the root
    t.set_page(5, [0] * paging.PAGE_WORDS)
    assert t.root() == r0


def test_set_word_and_path_roundtrip():
    rng = np.random.default_rng(0)
    t = paging.PageTree()
    touched = {}
    for _ in range(5):
        wa = int(rng.integers(0, 1 << paging.SPACE_WORDS_LOG2))
        val = int(rng.integers(0, 1 << 32))
        t.set_word(wa, val)
        touched[wa] = val
    for wa, val in touched.items():
        assert t.get_word(wa) == val
    root = t.root()
    for wa in touched:
        pg = wa // paging.PAGE_WORDS
        leaf = paging.page_hash(t.page_words(pg))
        path = t.path(pg)
        assert len(path) == paging.DEPTH
        assert paging.verify_path(pg, leaf, path, root)
        assert not paging.verify_path(pg ^ 1, leaf, path, root)


def test_update_changes_root_locally():
    t = paging.PageTree()
    t.set_word(100, 7)
    r1 = t.root()
    path_before = t.path(100 // paging.PAGE_WORDS)
    t.set_word(100, 8)
    r2 = t.root()
    assert r1 != r2
    # same page's sibling path is unchanged by an in-page update
    assert path_before == t.path(100 // paging.PAGE_WORDS)
    # and the new root verifies with the new leaf over the same path
    pg = 100 // paging.PAGE_WORDS
    assert paging.verify_path(pg, paging.page_hash(t.page_words(pg)),
                              path_before, r2)


def test_from_words_matches_incremental():
    rng = np.random.default_rng(1)
    words = {int(rng.integers(0, 1 << 20)): int(rng.integers(0, 1 << 32))
             for _ in range(20)}
    t1 = paging.PageTree.from_words(words)
    t2 = paging.PageTree()
    for wa, v in words.items():
        t2.set_word(wa, v)
    assert t1.root() == t2.root()
