"""Host-side trie: the mutable source of truth behind an Automaton.

This is the TPU-framework equivalent of the reference's pointer-based trie
(src/trienode.c, src/trie.c) — but it exists only on the host and only for the
*mutable* phase of an automaton's life.  ``make_automaton()`` lowers it into
dense numpy/JAX arrays (see compiler.py); the search hot path never touches
these Python objects.

Semantics mirrored from the reference:

* add word / new-word detection / replace semantics  (src/trie.c:14-63)
* remove word with last-multiway tail pruning        (src/trie.c:66-136)
* exact find / longest prefix                        (src/trie.c:139-174)
* DFS traverse in child-insertion order              (src/trie.c:196-225)
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple


def _letters(key):
    """Normalize a key (str | uint32 array | list) to a list of int letters."""
    if isinstance(key, str):
        return [ord(c) for c in key]
    return [int(x) for x in key]


class TrieNode:
    """One trie node.  ``children`` preserves insertion order (dict), matching
    the reference's append-only edge arrays (src/trienode.c:124-147)."""

    __slots__ = ("children", "eow", "value")

    def __init__(self) -> None:
        self.children: dict = {}
        self.eow: bool = False
        self.value = None

    @property
    def n(self) -> int:
        return len(self.children)


class Trie:
    def __init__(self) -> None:
        self.root: Optional[TrieNode] = None

    # -- mutation ----------------------------------------------------------

    def add_word(self, letters) -> Tuple[TrieNode, bool]:
        """Insert a path; returns (node, new_word).  (src/trie.c:14-63)"""
        letters = _letters(letters)
        if self.root is None:
            self.root = TrieNode()

        node = self.root
        for letter in letters:
            letter = int(letter)
            child = node.children.get(letter)
            if child is None:
                child = TrieNode()
                node.children[letter] = child
            node = child

        new_word = not node.eow
        node.eow = True
        return node, new_word

    def remove_word(self, letters) -> Tuple[bool, object]:
        """Remove a word, pruning the dangling tail below the last multiway
        node; returns (found, old_value).  (src/trie.c:66-136)"""
        if self.root is None:
            return False, None

        letters = _letters(letters)
        node = self.root
        last_multiway = node
        last_multiway_index = 0
        path = []
        for i, letter in enumerate(letters):
            letter = int(letter)
            node = node.children.get(letter)
            if node is None:
                return False, None
            path.append(letter)
            if node.n > 1 or (node.n == 1 and node.eow):
                last_multiway = node
                last_multiway_index = i + 1

        if not node.eow:
            return False, None

        value = node.value
        if node.n == 0:  # leaf: unlink the tail chain
            del last_multiway.children[path[last_multiway_index]]
        else:  # interior node: just unmark
            node.eow = False
            node.value = None
        return True, value

    def clear(self) -> None:
        self.root = None

    # -- queries -----------------------------------------------------------

    def find(self, letters) -> Optional[TrieNode]:
        node = self.root
        if node is None:
            return None
        for letter in _letters(letters):
            node = node.children.get(int(letter))
            if node is None:
                return None
        return node

    def longest_prefix(self, letters) -> int:
        node = self.root
        length = 0
        if node is None:
            return 0
        for letter in _letters(letters):
            node = node.children.get(int(letter))
            if node is None:
                break
            length += 1
        return length

    # -- traversal ---------------------------------------------------------

    def traverse(self) -> Iterator[Tuple[TrieNode, int]]:
        """Pre-order DFS yielding (node, depth), children in insertion order
        (src/trie.c:196-225)."""
        if self.root is None:
            return
        stack = [(self.root, 0)]
        while stack:
            node, depth = stack.pop()
            yield node, depth
            # push in reverse so iteration matches recursive first-to-last order
            stack.extend(
                (child, depth + 1) for child in reversed(list(node.children.values()))
            )

    def bfs_order(self):
        """Level-order traversal yielding (node, parent, letter, depth)."""
        if self.root is None:
            return
        from collections import deque

        queue = deque([(self.root, None, None, 0)])
        while queue:
            item = queue.popleft()
            yield item
            node = item[0]
            depth = item[3]
            for letter, child in node.children.items():
                queue.append((child, node, letter, depth + 1))

    def stats(self):
        """DFS statistics matching the reference's get_stats numbers
        (sizeof_node/total_size mimic the 32-byte x86-64 C node layout)."""
        nodes_count = words_count = links_count = 0
        longest = 0
        total_size = 0
        if self.root is not None:
            for node, depth in self.traverse():
                nodes_count += 1
                words_count += int(node.eow)
                links_count += node.n
                total_size += 32 + node.n * 8
                if depth > longest:
                    longest = depth
        return {
            "nodes_count": nodes_count,
            "words_count": words_count,
            "longest_word": longest,
            "links_count": links_count,
            "sizeof_node": 32,
            "total_size": total_size,
        }

    def bfs_arrays(self):
        """BFS-export to (parent u32[S], letter u32[S], eow u8[S], values)
        where values holds per-eow-node values in BFS order.  This is the
        canonical wire/compile form shared with the native backend, the
        serializer and the table compiler."""
        import numpy as np

        if self.root is None:
            return None
        parents = [0]
        letters = [0]
        eows = [1 if self.root.eow else 0]
        values = []
        order = [self.root]
        index_of = {id(self.root): 0}
        qi = 0
        while qi < len(order):
            node = order[qi]
            p = index_of[id(node)]
            if node.eow:
                values.append(node.value)
            for letter, child in node.children.items():
                index_of[id(child)] = len(order)
                order.append(child)
                parents.append(p)
                letters.append(int(letter))
                eows.append(1 if child.eow else 0)
            qi += 1
        return (
            np.asarray(parents, np.uint32),
            np.asarray(letters, np.uint32),
            np.asarray(eows, np.uint8),
            values,
        )
