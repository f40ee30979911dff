"""HiCache 3rd tier: file storage backend + async write-behind."""

import time

import numpy as np
import pytest

from tests.conftest import make_server_args, make_tiny_config


def _hicache_engine(tmpdir, **kw):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        enable_hierarchical_cache=True,
        hicache_storage_dir=str(tmpdir),
        max_total_tokens=256,  # tiny device pool → evictions happen
        hicache_ratio=0.5,  # tiny host pool too → spills to storage
        **kw,
    )
    runner = ModelRunner(args, model_config=make_tiny_config())
    return Engine(server_args=args, model_runner=runner)


def test_file_storage_roundtrip(tmp_path):
    from sglang_tpu.core.kv_storage import (
        AsyncStorageWriter,
        FileKVStorage,
        prefix_key,
    )

    st = FileKVStorage(str(tmp_path))
    key = prefix_key([1, 2, 3, 4])
    data = np.random.RandomState(0).randn(3, 2, 4, 2, 8).astype(np.float32)
    w = AsyncStorageWriter(st)
    assert w.put_async(key, data)
    w.flush()
    got = st.get(key)
    np.testing.assert_array_equal(got, data)
    assert st.exists(key)
    st.delete(key)
    assert not st.exists(key)


def test_storage_tier_survives_full_eviction(tmp_path):
    """Device AND host tiers get flushed; a repeated prompt must still hit
    the storage tier (prefix promoted back from disk)."""
    eng = _hicache_engine(tmp_path)
    try:
        prompt = list(range(5, 50))  # several pages
        sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
        out1 = eng.generate(input_ids=list(prompt), sampling_params=dict(sp))

        # force device-tier eviction by filling the pool with other work
        for i in range(6):
            eng.generate(
                input_ids=[200 + i * 7 + j for j in range(40)],
                sampling_params=dict(sp),
            )
        radix = eng.scheduler.radix
        if radix.storage_writer is not None:
            radix.storage_writer.flush()
        # wipe the HOST tier too → only storage can serve the prefix
        radix.host_tree.reset()
        radix.host_pool.free_list = list(
            range(radix.host_pool.num_pages - 1, -1, -1)
        )

        out2 = eng.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert out2["output_ids"] == out1["output_ids"]
        assert radix.num_storage_hits > 0, "storage tier never hit"
        assert out2["meta_info"]["cached_tokens"] > 0
        # the storage promotion ran through the ASYNC prefetch worker
        # (blob IO off the scheduler thread; reference cache_controller
        # prefetch threads), not a synchronous admit-time read
        assert eng.scheduler._prefetch_pool is not None
    finally:
        eng.shutdown()


def test_http_storage_backend_roundtrip():
    """Remote KV-pool backend (reference mooncake/lmcache connector
    role): PUT/GET/HEAD/DELETE over HTTP against the standalone server."""
    from sglang_tpu.core.kv_storage import HTTPKVStorage, KVStorageServer

    srv = KVStorageServer()
    try:
        st = HTTPKVStorage(f"http://127.0.0.1:{srv.port}")
        import numpy as np

        x = (np.arange(48, dtype=np.float32) / 7).reshape(2, 24)
        assert not st.exists("abc")
        assert st.get("abc") is None
        st.put("abc", x)
        assert st.exists("abc")
        got = st.get("abc")
        assert got.dtype == x.dtype and got.shape == x.shape
        np.testing.assert_array_equal(got, x)
        st.delete("abc")
        assert not st.exists("abc")
    finally:
        srv.close()


def test_storage_tier_over_http_backend(tmp_path):
    """The full HiCache storage tier runs against the HTTP backend: a
    repeated prompt after device+host eviction promotes pages back from
    the remote KV pool (prefix key spec = http URL)."""
    from sglang_tpu.core.kv_storage import KVStorageServer

    srv = KVStorageServer()
    try:
        eng = _hicache_engine_url(f"http://127.0.0.1:{srv.port}")
        try:
            prompt = list(range(5, 50))
            sp = {"max_new_tokens": 4, "temperature": 0.0,
                  "ignore_eos": True}
            out1 = eng.generate(input_ids=list(prompt),
                                sampling_params=dict(sp))
            for i in range(6):
                eng.generate(
                    input_ids=[200 + i * 7 + j for j in range(40)],
                    sampling_params=dict(sp),
                )
            radix = eng.scheduler.radix
            if radix.storage_writer is not None:
                radix.storage_writer.flush()
            radix.host_tree.reset()
            radix.host_pool.free_list = list(
                range(radix.host_pool.num_pages - 1, -1, -1)
            )
            out2 = eng.generate(input_ids=list(prompt),
                                sampling_params=dict(sp))
            assert out2["output_ids"] == out1["output_ids"]
            assert radix.num_storage_hits > 0
            assert len(srv.store) > 0  # pages actually live remotely
        finally:
            eng.shutdown()
    finally:
        srv.close()


def _hicache_engine_url(url):
    return _hicache_engine(url)
