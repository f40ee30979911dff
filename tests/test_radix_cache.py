"""Unit tests: radix prefix cache (reference: test/registered/radix_cache/)."""

from sglang_tpu.core.radix_cache import RadixCache


def toks(s):
    return [ord(c) for c in s]


def test_insert_and_match_page1():
    rc = RadixCache(page_size=1)
    rc.insert(toks("hello"), [1, 2, 3, 4, 5])
    m = rc.match_prefix(toks("hello world"))
    assert m.matched_tokens == 5
    assert m.pages == [1, 2, 3, 4, 5]
    m2 = rc.match_prefix(toks("help"))
    assert m2.matched_tokens == 3
    assert m2.pages == [1, 2, 3]


def test_page_alignment():
    rc = RadixCache(page_size=4)
    rc.insert(toks("abcdefgh"), [10, 11])
    # 6 matching tokens → only 1 full page (4 tokens)
    m = rc.match_prefix(toks("abcdefXY"))
    assert m.matched_tokens == 4
    assert m.pages == [10]


def test_split_and_shared_prefix():
    rc = RadixCache(page_size=1)
    rc.insert(toks("abcd"), [1, 2, 3, 4])
    rc.insert(toks("abxy"), [1, 2, 5, 6])
    assert rc.match_prefix(toks("abcd")).pages == [1, 2, 3, 4]
    assert rc.match_prefix(toks("abxy")).pages == [1, 2, 5, 6]
    assert rc.match_prefix(toks("abzz")).pages == [1, 2]
    # duplicate-prefix accounting: inserting abxy reported 2 matched tokens
    rc2 = RadixCache(page_size=1)
    rc2.insert(toks("abcd"), [1, 2, 3, 4])
    assert rc2.insert(toks("abxy"), [1, 2, 5, 6]) == 2


def test_lock_protects_from_eviction():
    rc = RadixCache(page_size=1)
    rc.insert(toks("abcd"), [1, 2, 3, 4])
    m = rc.match_prefix(toks("abcd"))
    rc.inc_lock_ref(m.node)
    assert rc.protected_size() == 4
    freed = []
    rc.evict(10, freed.extend)
    assert freed == []
    rc.dec_lock_ref(m.node)
    assert rc.evictable_size() == 4
    rc.evict(10, freed.extend)
    assert sorted(freed) == [1, 2, 3, 4]


def test_evict_lru_order():
    rc = RadixCache(page_size=1)
    rc.insert(toks("aaa"), [1, 2, 3])
    rc.insert(toks("bbb"), [4, 5, 6])
    rc.match_prefix(toks("aaa"))  # refresh a's recency
    freed = []
    rc.evict(3, freed.extend)
    assert sorted(freed) == [4, 5, 6]  # b was least recently used


def test_evictable_size_accounting():
    rc = RadixCache(page_size=2)
    rc.insert(toks("abcd"), [1, 2])
    rc.insert(toks("abef"), [1, 7])
    assert rc.evictable_size() == 3  # shared page 1 counted once + 2 leaves
    freed = []
    rc.evict(100, freed.extend)
    assert rc.evictable_size() == 0
    assert len(freed) == 3


def test_disabled_cache():
    rc = RadixCache(page_size=1, disable=True)
    assert rc.insert(toks("ab"), [1, 2]) == 0
    m = rc.match_prefix(toks("ab"))
    assert m.matched_tokens == 0 and m.pages == []
