"""Native C++ radix tree: differential test vs the Python implementation."""

import numpy as np
import pytest

from sglang_tpu.core.radix_cache import RadixCache

cpp = pytest.importorskip("sglang_tpu.core.radix_cache_cpp")
if not cpp.native_radix_available():
    pytest.skip("no native toolchain", allow_module_level=True)


def test_basic_match_insert_evict():
    t = cpp.RadixCacheCpp(page_size=4)
    key = list(range(16))
    assert t.insert(key, [10, 11, 12, 13]) == 0
    m = t.match_prefix(key)
    assert m.pages == [10, 11, 12, 13] and m.matched_tokens == 16
    # partial prefix (one and a half pages → one full page)
    m = t.match_prefix(key[:6])
    assert m.pages == [10] and m.matched_tokens == 4
    # diverging suffix shares the first two pages
    key2 = key[:8] + [99] * 8
    assert t.insert(key2, [10, 11, 20, 21]) == 8
    assert t.evictable_size() == 6  # 4 + 2 new
    m2 = t.match_prefix(key2)
    assert m2.pages == [10, 11, 20, 21]
    # lock one path, evict everything else
    t.inc_lock_ref(m2.node)
    assert t.protected_size() == 4 and t.evictable_size() == 2
    freed = []
    t.evict(100, freed.extend)
    assert sorted(freed) == [12, 13]
    assert t.match_prefix(key).matched_tokens == 8  # locked prefix remains
    t.dec_lock_ref(m2.node)
    assert t.protected_size() == 0


def _random_workload(cache, rng, page_size, n_ops=300):
    """Drive a cache through a deterministic random workload; return a trace
    of observable results for cross-implementation comparison."""
    trace = []
    locked = []
    seqs = []
    for op in range(n_ops):
        r = rng.random()
        if r < 0.45 or not seqs:
            # insert a (possibly prefix-sharing) new sequence
            if seqs and rng.random() < 0.5:
                base = seqs[rng.randrange(len(seqs))]
                keep = rng.randrange(0, len(base) + 1)
                keep = keep // page_size * page_size
                seq = base[:keep] + [
                    rng.randrange(50) for _ in range(page_size * rng.randrange(1, 4))
                ]
            else:
                seq = [rng.randrange(50) for _ in range(page_size * rng.randrange(1, 5))]
            pages = [1000 * op + i for i in range(len(seq) // page_size)]
            matched = cache.insert(seq, pages)
            seqs.append(seq)
            trace.append(("insert", matched))
        elif r < 0.75:
            seq = seqs[rng.randrange(len(seqs))]
            cut = rng.randrange(0, len(seq) + 1)
            m = cache.match_prefix(seq[:cut])
            trace.append(("match", m.matched_tokens, tuple(m.pages)))
            # python returns the root node on empty match, cpp returns
            # None — gate on matched_tokens to keep the RNG streams aligned
            if m.matched_tokens > 0 and rng.random() < 0.4:
                cache.inc_lock_ref(m.node)
                locked.append(m.node)
        elif r < 0.9 and locked:
            node = locked.pop(rng.randrange(len(locked)))
            cache.dec_lock_ref(node)
            trace.append(("unlock",))
        else:
            freed = []
            n = cache.evict(rng.randrange(1, 8), freed.extend)
            trace.append(("evict", n, tuple(sorted(freed))))
        trace.append(
            ("sizes", cache.evictable_size(), cache.protected_size())
        )
    return trace


@pytest.mark.parametrize("page_size", [1, 4])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_vs_python(page_size, seed):
    import random

    py = RadixCache(page_size=page_size)
    cc = cpp.RadixCacheCpp(page_size=page_size)
    t1 = _random_workload(py, random.Random(seed), page_size)
    t2 = _random_workload(cc, random.Random(seed), page_size)
    assert t1 == t2


def test_scheduler_uses_cpp_backend(tmp_path):
    from tests.conftest import TINY_HF_CONFIG

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.core.radix_cache_cpp import RadixCacheCpp
    from sglang_tpu.core.scheduler import Scheduler
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path="dummy://tiny",
        tokenizer_path="test:byte",
        load_format="dummy",
        dtype="float32",
        page_size=8,
        max_total_tokens=2048,
        radix_cache_backend="cpp",
    )
    runner = ModelRunner(
        args,
        model_config=ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32"),
    )
    sched = Scheduler(args, model_runner=runner)
    assert isinstance(sched.radix, RadixCacheCpp)
    sched.shutdown()
