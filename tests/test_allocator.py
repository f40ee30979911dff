"""Unit tests: page allocator (reference test model: test/registered/mem_cache/)."""

from sglang_tpu.core.allocator import PageAllocator


def test_alloc_free_roundtrip():
    a = PageAllocator(num_pages=10, page_size=4)
    assert a.num_free_pages == 9  # page 0 reserved
    pages = a.alloc(5)
    assert len(pages) == 5
    assert 0 not in pages
    assert a.num_free_pages == 4
    a.free(pages)
    assert a.num_free_pages == 9


def test_alloc_exhaustion_returns_none():
    a = PageAllocator(num_pages=4, page_size=2)
    assert a.alloc(3) is not None
    assert a.alloc(1) is None
    assert a.num_free_pages == 0


def test_alloc_zero():
    a = PageAllocator(num_pages=4, page_size=2)
    assert a.alloc(0) == []


def test_no_duplicate_pages():
    a = PageAllocator(num_pages=100, page_size=1)
    p1 = a.alloc(50)
    p2 = a.alloc(49)
    assert len(set(p1) | set(p2)) == 99
    a.free(p1[:10])
    p3 = a.alloc(10)
    assert set(p3) == set(p1[:10])
