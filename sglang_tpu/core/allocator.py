"""Page allocator over the KV token-slot space.

Equivalent role to the reference's ``mem_cache/allocator/``
(``TokenToKVPoolAllocator`` token.py:28, ``PagedTokenToKVPoolAllocator``
paged.py:105): a free list of fixed-size pages; page 0 is reserved as the
garbage page that absorbs padded-token writes (reference: slot-0 absorb,
``memory_pool.py:1450``).
"""

from __future__ import annotations

from typing import List, Optional


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int):
        assert num_pages >= 2, "need at least garbage page + one usable page"
        self.num_pages = num_pages
        self.page_size = page_size
        # Page 0 reserved for garbage/padding writes.
        self._free: List[int] = list(range(num_pages - 1, 0, -1))

    @property
    def num_free_pages(self) -> int:
        return len(self._free)

    @property
    def num_free_tokens(self) -> int:
        return len(self._free) * self.page_size

    def alloc(self, n_pages: int) -> Optional[List[int]]:
        if n_pages > len(self._free):
            return None
        if n_pages == 0:
            return []
        pages = self._free[-n_pages:]
        del self._free[-n_pages:]
        pages.reverse()
        return pages

    def free_pages_view(self) -> List[int]:
        """Snapshot of the free list (invariant checks / KV canary)."""
        return list(self._free)

    def free(self, pages: List[int]):
        for p in pages:
            assert 0 < p < self.num_pages, f"bad page id {p}"
        self._free.extend(pages)

    def available_size(self) -> int:
        """Free tokens (for PrefillAdder budget math)."""
        return self.num_free_tokens

    def clear(self):
        self._free = list(range(self.num_pages - 1, 0, -1))
