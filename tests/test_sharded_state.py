"""Sharded-state checkpoints (reference ShardedStateLoader +
save_sharded_state.py): the live device-sharded param tree persists via
orbax so a multi-rank reload reads only each host's shards — and orbax
reshards transparently when the load mesh differs from save time."""

import jax
import numpy as np
import pytest

from tests.conftest import make_server_args, make_tiny_config


def _engine(**overrides):
    import dataclasses

    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(**overrides)
    cfg = make_tiny_config()
    if "model_path" in overrides:  # sharded_state restores from here
        cfg = dataclasses.replace(cfg, model_path=overrides["model_path"])
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner), runner


def test_sharded_state_roundtrip_and_reshard(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    ckpt = str(tmp_path / "sharded")
    prompt = [5, 9, 101, 33, 7, 250]
    sp = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True}

    src, src_runner = _engine(tp_size=2)
    try:
        base = src.generate(input_ids=list(prompt), sampling_params=dict(sp))
        src.save_sharded_state(ckpt)
    finally:
        src.shutdown()

    # same mesh: each rank restores its own shards
    dst, dst_runner = _engine(
        tp_size=2, model_path=ckpt, load_format="sharded_state"
    )
    try:
        qleaf = (
            "qkv_proj"
            if "qkv_proj" in dst_runner.params["layers"]
            else "q_proj"
        )
        assert dst_runner.params["layers"][qleaf].sharding.spec == (
            src_runner.params["layers"][qleaf].sharding.spec
        )
        out = dst.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert out["output_ids"] == base["output_ids"]
    finally:
        dst.shutdown()

    # different mesh (tp=1): orbax reshards on restore
    one, _ = _engine(model_path=ckpt, load_format="sharded_state")
    try:
        out1 = one.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert out1["output_ids"] == base["output_ids"]
    finally:
        one.shutdown()


def test_save_sharded_state_http_route(tmp_path):
    """The /save_sharded_state admin route writes a loadable checkpoint."""
    import asyncio
    import threading

    import httpx
    from aiohttp import web

    from sglang_tpu.entrypoints.http_server import build_app

    eng, _ = _engine()
    ckpt = str(tmp_path / "via_http")
    args = make_server_args(host="127.0.0.1", port=0)
    app = build_app(eng, args)
    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_box = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            r = web.AppRunner(app)
            await r.setup()
            site = web.TCPSite(r, "127.0.0.1", 0)
            await site.start()
            port_box["port"] = site._server.sockets[0].getsockname()[1]
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(15)
    try:
        r = httpx.post(
            f"http://127.0.0.1:{port_box['port']}/save_sharded_state",
            json={"path": ckpt}, timeout=60,
        )
        assert r.status_code == 200 and r.json()["success"]
    finally:
        loop.call_soon_threadsafe(loop.stop)
        eng.shutdown()

    dst, _ = _engine(model_path=ckpt, load_format="sharded_state")
    try:
        out = dst.generate(
            input_ids=[1, 2, 3],
            sampling_params={"temperature": 0.0, "max_new_tokens": 4,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 4
    finally:
        dst.shutdown()
