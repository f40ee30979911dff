"""RadixAttention prefix cache: a radix tree over token sequences → KV pages.

Equivalent role to the reference's ``mem_cache/radix_cache.py`` (``RadixCache``
:280, ``TreeNode`` :217, ``match_prefix`` :355, ``insert`` :415, ``evict``
:563) — page-size-aware keys: only full pages are cached, children are keyed
by their first page's token tuple, and eviction is LRU over unlocked leaves.

Values are **page ids** into the paged KV pool (the reference stores
token-slot indices; with our page-granular pool, one value entry per page).
"""

from __future__ import annotations

import heapq
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple


class TreeNode:
    __slots__ = (
        "children",
        "parent",
        "key",
        "value",
        "lock_ref",
        "last_access_time",
        "hit_count",
        "id",
    )
    _counter = 0

    def __init__(self):
        self.children: Dict[Tuple[int, ...], "TreeNode"] = {}
        self.parent: Optional["TreeNode"] = None
        self.key: List[int] = []  # tokens on the edge into this node
        self.value: List[int] = []  # page ids (len == len(key) // page_size)
        self.lock_ref = 0
        self.last_access_time = time.monotonic()
        self.hit_count = 0
        TreeNode._counter += 1
        self.id = TreeNode._counter

    def __lt__(self, other: "TreeNode"):
        return self.last_access_time < other.last_access_time


@dataclass
class MatchResult:
    pages: List[int]  # page ids of the matched prefix
    matched_tokens: int  # == len(pages) * page_size
    node: "TreeNode"  # deepest matched node (lock handle)


class RadixCache:
    def __init__(self, page_size: int = 1, disable: bool = False):
        self.page_size = page_size
        self.disable = disable
        self.reset()

    def reset(self):
        self.root = TreeNode()
        self.root.lock_ref = 1  # never evicted
        self._evictable_pages = 0
        self._protected_pages = 0

    # ----------------------------------------------------------------- match
    def _child_key(self, tokens: List[int]) -> Tuple[int, ...]:
        return tuple(tokens[: self.page_size])

    def match_prefix(self, key: List[int]) -> MatchResult:
        """Longest cached prefix of ``key`` (full pages only).

        Splits the deepest partially-matched node so the returned node's
        path covers exactly the matched prefix (reference :355).
        """
        if self.disable or not key:
            return MatchResult([], 0, self.root)
        aligned = len(key) // self.page_size * self.page_size
        key = key[:aligned]

        pages: List[int] = []
        node = self.root
        node.last_access_time = time.monotonic()
        while key:
            child = node.children.get(self._child_key(key))
            if child is None:
                break
            child.last_access_time = time.monotonic()
            child.hit_count += 1
            # token-wise compare along the edge
            m = 0
            klen = min(len(child.key), len(key))
            while m < klen and child.key[m] == key[m]:
                m += 1
            m = m // self.page_size * self.page_size  # full pages only
            if m == 0:
                break
            if m < len(child.key):
                child = self._split_node(child, m)
                pages.extend(child.value)
                node = child
                break
            pages.extend(child.value)
            node = child
            key = key[m:]
        return MatchResult(pages, len(pages) * self.page_size, node)

    def _split_node(self, node: TreeNode, split_tokens: int) -> TreeNode:
        """Split ``node``'s edge after ``split_tokens`` (page-aligned);
        returns the new upper node."""
        assert 0 < split_tokens < len(node.key)
        assert split_tokens % self.page_size == 0
        upper = TreeNode()
        upper.key = node.key[:split_tokens]
        upper.value = node.value[: split_tokens // self.page_size]
        upper.parent = node.parent
        upper.lock_ref = node.lock_ref
        upper.last_access_time = node.last_access_time
        upper.children = {self._child_key(node.key[split_tokens:]): node}
        upper.parent.children[self._child_key(upper.key)] = upper

        node.key = node.key[split_tokens:]
        node.value = node.value[split_tokens // self.page_size :]
        node.parent = upper
        return upper

    # ---------------------------------------------------------------- insert
    def insert(self, key: List[int], pages: List[int]) -> int:
        """Insert ``key`` (page-aligned) with its page ids.

        Returns the number of *tokens* of prefix that were already cached —
        the caller must free the duplicate pages covering that prefix
        (reference ``cache_finished_req`` radix_cache.py:437).
        """
        if self.disable:
            return 0
        aligned = len(key) // self.page_size * self.page_size
        key = key[:aligned]
        pages = pages[: aligned // self.page_size]
        assert len(pages) == len(key) // self.page_size

        node = self.root
        total_matched = 0
        while key:
            node.last_access_time = time.monotonic()
            child = node.children.get(self._child_key(key))
            if child is None:
                new_node = TreeNode()
                new_node.key = list(key)
                new_node.value = list(pages)
                new_node.parent = node
                node.children[self._child_key(key)] = new_node
                self._evictable_pages += len(pages)
                break
            m = 0
            klen = min(len(child.key), len(key))
            while m < klen and child.key[m] == key[m]:
                m += 1
            m = m // self.page_size * self.page_size
            if m == 0:
                # first page differs inside the page: distinct child key —
                # cannot happen since children are keyed by first page
                raise AssertionError("child key collision with zero match")
            if m < len(child.key):
                child = self._split_node(child, m)
            total_matched += m
            key = key[m:]
            pages = pages[m // self.page_size :]
            node = child
        return total_matched

    # ------------------------------------------------------------ lock / ref
    def inc_lock_ref(self, node: TreeNode):
        """Protect the path root→node from eviction (reference :217 lock_ref)."""
        while node is not None and node is not self.root:
            if node.lock_ref == 0:
                self._evictable_pages -= len(node.value)
                self._protected_pages += len(node.value)
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode):
        while node is not None and node is not self.root:
            assert node.lock_ref > 0
            node.lock_ref -= 1
            if node.lock_ref == 0:
                self._evictable_pages += len(node.value)
                self._protected_pages -= len(node.value)
            node = node.parent

    # ---------------------------------------------------------------- evict
    def evict(self, num_pages: int, free_fn: Callable[[List[int]], None]) -> int:
        """Evict up to ``num_pages`` pages from unlocked LRU leaves; returns
        pages actually evicted (reference :563)."""
        if self.disable:
            return 0
        leaves = [
            n for n in self._iter_nodes() if not n.children and n.lock_ref == 0
        ]
        heapq.heapify(leaves)
        evicted = 0
        while leaves and evicted < num_pages:
            node = heapq.heappop(leaves)
            free_fn(list(node.value))
            evicted += len(node.value)
            self._evictable_pages -= len(node.value)
            parent = node.parent
            del parent.children[self._child_key(node.key)]
            if (
                parent is not self.root
                and not parent.children
                and parent.lock_ref == 0
            ):
                heapq.heappush(leaves, parent)
        return evicted

    def _iter_nodes(self):
        stack = [self.root]
        while stack:
            n = stack.pop()
            if n is not self.root:
                yield n
            stack.extend(n.children.values())

    # ---------------------------------------------------------------- stats
    def evictable_size(self) -> int:
        """Evictable pages."""
        return self._evictable_pages

    def protected_size(self) -> int:
        return self._protected_pages

    def total_cached_pages(self) -> int:
        return self._evictable_pages + self._protected_pages

    def pretty_print(self) -> str:
        lines: List[str] = []

        def rec(node, depth):
            for child in node.children.values():
                lines.append(
                    "  " * depth
                    + f"{child.key[:8]}... pages={len(child.value)} lock={child.lock_ref}"
                )
                rec(child, depth + 1)

        rec(self.root, 0)
        return "\n".join(lines)
