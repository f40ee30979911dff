"""Hierarchical KV cache: device pool + host-RAM backup tier.

Equivalent role to the reference's ``mem_cache/hiradix_cache.py``
(``HiRadixCache`` :76 — write_backup :784, load_back :1237) +
``managers/cache_controller.py``: pages evicted from the device radix
tree are backed up into a host-RAM pool and re-inserted into a host-side
radix tree; a later prefix match that extends past the device-resident
prefix promotes the host pages back into the device pool.

TPU notes: transfers are whole-page `[L, ps, 2, Hkv*D]` slabs via jitted
gather/scatter (``ModelRunner.extract_pages`` / ``inject_pages``); the
storage tier (mooncake/hf3fs/…) of the reference maps to a future backend
behind :class:`HostKVPool`.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

from sglang_tpu.core.radix_cache import MatchResult, RadixCache, TreeNode
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class HostKVPool:
    """Host-RAM page store with free-list allocation."""

    def __init__(self, num_pages: int, page_bytes_shape, dtype):
        self.num_pages = num_pages
        self.buf = np.zeros((num_pages,) + tuple(page_bytes_shape), dtype)
        self.free_list = list(range(num_pages - 1, -1, -1))

    @property
    def num_free(self) -> int:
        return len(self.free_list)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self.free_list):
            return None
        out = self.free_list[-n:][::-1]
        del self.free_list[-n:]
        return out

    def free(self, pages: List[int]):
        self.free_list.extend(pages)


class HiRadixCache(RadixCache):
    """Device radix tree that spills evicted pages to a host tier."""

    def __init__(
        self,
        page_size: int,
        host_pool: HostKVPool,
        extract_pages: Callable[[List[int]], np.ndarray],
        inject_pages: Callable[[List[int], np.ndarray], None],
        disable: bool = False,
        storage=None,  # KVStorageBackend — 3rd tier (file/shared-FS)
    ):
        super().__init__(page_size=page_size, disable=disable)
        self.host_pool = host_pool
        self.extract_pages = extract_pages
        self.inject_pages = inject_pages
        # host tree stores host-pool page ids (plain radix, LRU evicted)
        self.host_tree = RadixCache(page_size=page_size, disable=disable)
        self.num_backups = 0
        self.num_promotions = 0
        self.storage = storage
        self.storage_writer = None
        if storage is not None:
            from sglang_tpu.core.kv_storage import AsyncStorageWriter

            self.storage_writer = AsyncStorageWriter(storage)
        self.num_storage_hits = 0

    # ---------------------------------------------------------------- evict
    def _node_prefix_tokens(self, node: TreeNode) -> List[int]:
        parts = []
        while node is not None and node.key:
            parts.append(node.key)
            node = node.parent
        out: List[int] = []
        for part in reversed(parts):
            out.extend(part)
        return out

    def evict(self, num_pages: int, free_fn) -> int:
        """LRU-evict device leaves, backing each up to the host tier first
        (reference write_backup, hiradix_cache.py:784)."""
        import heapq

        if self.disable:
            return 0
        leaves = [
            n for n in self._iter_nodes() if not n.children and n.lock_ref == 0
        ]
        heapq.heapify(leaves)
        evicted = 0
        while leaves and evicted < num_pages:
            node = heapq.heappop(leaves)
            self._backup_node(node)
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

    def _backup_node(self, node: TreeNode):
        tokens = self._node_prefix_tokens(node)
        n = len(node.value)
        host_pages = self.host_pool.alloc(n)
        if host_pages is None:
            # host pool full → LRU-evict host tree leaves
            self.host_tree.evict(
                n - self.host_pool.num_free, self.host_pool.free
            )
            host_pages = self.host_pool.alloc(n)
            if host_pages is None:
                return  # still no room; drop silently
        data = self.extract_pages(list(node.value))  # [n, L, ps, 2, HD]
        for hp, i in zip(host_pages, range(n)):
            self.host_pool.buf[hp] = data[i]
        # host tree wants page ids for the FULL prefix; insert only works
        # top-down, so insert the whole chain (shared prefixes dedup).
        prefix_len = len(tokens) - len(node.key)
        prefix_pages = self._collect_pages_for(tokens[:prefix_len])
        if prefix_pages is None:
            return  # ancestor not host-resident; skip (rare: deep chains)
        dup = self.host_tree.insert(tokens, prefix_pages + host_pages)
        dup_pages = dup // self.page_size
        extra = max(dup_pages - len(prefix_pages), 0)
        if extra:  # tail already present → free duplicate host pages
            self.host_pool.free(host_pages[:extra])
        self.num_backups += n
        # 3rd tier: write-behind to storage, one blob per PAGE keyed by
        # the hash of its token-prefix chain (the reference's per-page
        # hash keys in mooncake_store; lookups walk the chain forward).
        # Disk IO never blocks the scheduler loop.
        if self.storage_writer is not None:
            from sglang_tpu.core.kv_storage import prefix_key

            ps = self.page_size
            start_page = (len(tokens) - len(node.key)) // ps
            for j in range(n):
                end = (start_page + j + 1) * ps
                if end > len(tokens):
                    break
                self.storage_writer.put_async(
                    prefix_key(tokens[:end]), data[j]
                )

    def _collect_pages_for(self, tokens: List[int]) -> Optional[List[int]]:
        if not tokens:
            return []
        m = self.host_tree.match_prefix(tokens + [-1])  # avoid full-match cut
        if m.matched_tokens >= len(tokens):
            return m.pages[: len(tokens) // self.page_size]
        return None

    # -------------------------------------------------------------- promote
    def match_host_extension(
        self, key: List[int], device_matched_tokens: int
    ) -> Tuple[int, List[int]]:
        """Host pages extending the device match: returns
        (extra_tokens, host_page_ids)."""
        if self.disable:
            return 0, []
        m = self.host_tree.match_prefix(key)
        extra_tokens = m.matched_tokens - device_matched_tokens
        if extra_tokens <= 0:
            return 0, []
        start = device_matched_tokens // self.page_size
        return extra_tokens, m.pages[start:]

    def match_storage_extension(
        self, key: List[int], matched_tokens: int, max_pages: int = 64
    ):
        """Walk the per-page hash chain forward from the current match;
        returns (extra_tokens, [storage page keys]) — each probe is one
        metadata stat against the backend."""
        if self.storage is None or self.disable:
            return 0, []
        from sglang_tpu.core.kv_storage import prefix_key

        ps = self.page_size
        start = matched_tokens // ps * ps
        keys = []
        end = start + ps
        while end <= len(key) and len(keys) < max_pages:
            k = prefix_key(key[:end])
            if (
                self.storage_writer is not None
                and self.storage_writer.in_flight(k)
            ):
                break  # still being written; pick it up next request
            if not self.storage.exists(k):
                break
            keys.append(k)
            end += ps
        return len(keys) * ps, keys

    def promote_from_storage(
        self, key: List[int], storage_keys: List[str],
        device_pages_prefix: List[int], new_device_pages: List[int],
        matched_tokens: int,
    ) -> bool:
        """Load per-page storage blobs into fresh device pages and insert
        the extended prefix (reference prefetch_from_storage :1585)."""
        blobs = []
        for k in storage_keys[: len(new_device_pages)]:
            b = self.storage.get(k)
            if b is None:
                return False
            blobs.append(b)
        if len(blobs) < len(new_device_pages):
            return False
        self.inject_pages(list(new_device_pages), np.stack(blobs))
        total_tokens = (
            len(device_pages_prefix) + len(new_device_pages)
        ) * self.page_size
        self.insert(
            key[:total_tokens], device_pages_prefix + new_device_pages
        )
        self.num_promotions += len(new_device_pages)
        self.num_storage_hits += len(new_device_pages)
        return True

    def promote(
        self,
        key: List[int],
        device_pages_prefix: List[int],
        new_device_pages: List[int],
        host_pages: List[int],
    ):
        """Copy host pages into freshly allocated device pages and insert
        the extended prefix into the device tree (reference load_back)."""
        data = np.stack([self.host_pool.buf[hp] for hp in host_pages])
        self.inject_pages(list(new_device_pages), data)
        total_tokens = (
            len(device_pages_prefix) + len(new_device_pages)
        ) * self.page_size
        self.insert(
            key[:total_tokens], device_pages_prefix + new_device_pages
        )
        self.num_promotions += len(new_device_pages)
