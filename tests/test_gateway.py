"""C++ gateway: proxying, LB policies, cache-aware stickiness, SSE relay."""

import json
import socket
import threading
import time

import httpx
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_workers():
    """Two engine HTTP servers on distinct ports."""
    import asyncio

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.entrypoints.http_server import build_app
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from aiohttp import web

    servers = []
    for _ in range(2):
        args = make_server_args(host="127.0.0.1", port=_free_port())
        runner = ModelRunner(
            args, model_config=ModelConfig.from_hf_dict(
                TINY_HF_CONFIG, dtype="float32")
        )
        eng = Engine(server_args=args, model_runner=runner)
        app = build_app(eng, args)
        loop = asyncio.new_event_loop()
        started = threading.Event()

        def run(loop=loop, app=app, args=args, started=started):
            asyncio.set_event_loop(loop)

            async def start():
                r = web.AppRunner(app)
                await r.setup()
                await web.TCPSite(r, args.host, args.port).start()
                started.set()

            loop.run_until_complete(start())
            loop.run_forever()

        t = threading.Thread(target=run, daemon=True)
        t.start()
        assert started.wait(15)
        servers.append((eng, loop, args))
    # wait healthy
    for _, _, args in servers:
        for _ in range(50):
            try:
                if httpx.get(f"http://{args.host}:{args.port}/health",
                             timeout=2).status_code == 200:
                    break
            except Exception:
                time.sleep(0.2)
    yield [(f"{a.host}:{a.port}") for _, _, a in servers]
    for eng, loop, _ in servers:
        loop.call_soon_threadsafe(loop.stop)
        eng.shutdown()


def test_gateway_proxies_and_balances(two_workers):
    from sglang_tpu.gateway import GatewayProcess

    gw = GatewayProcess(0, two_workers, policy="round_robin")
    try:
        base = f"http://127.0.0.1:{gw.port}"
        assert httpx.get(base + "/gateway/health", timeout=10).text == "ok"
        for i in range(4):
            r = httpx.post(base + "/generate", json={
                "input_ids": [5 + i, 6, 7],
                "sampling_params": {"max_new_tokens": 4, "temperature": 0.0,
                                    "ignore_eos": True},
            }, timeout=60)
            assert r.status_code == 200, r.text
            assert len(r.json()["output_ids"]) == 4
        info = httpx.get(base + "/gateway/workers", timeout=10).json()
        totals = [w["total"] for w in info["workers"]]
        assert sum(totals) == 4
        assert all(t == 2 for t in totals), totals  # round robin
    finally:
        gw.stop()


def test_gateway_cache_aware_stickiness(two_workers):
    from sglang_tpu.gateway import GatewayProcess

    gw = GatewayProcess(0, two_workers, policy="cache_aware",
                        cache_threshold=0.4)
    try:
        base = f"http://127.0.0.1:{gw.port}"
        prompt_a = "alpha " * 20
        prompt_b = "bravo " * 20
        for _ in range(3):
            for p in (prompt_a, prompt_b):
                r = httpx.post(base + "/generate", json={
                    "prompt": p,
                    "sampling_params": {"max_new_tokens": 2,
                                        "temperature": 0.0,
                                        "ignore_eos": True},
                }, timeout=60)
                assert r.status_code == 200, r.text
        info = httpx.get(base + "/gateway/workers", timeout=10).json()
        totals = sorted(w["total"] for w in info["workers"])
        # both prompts repeat -> each should stick to one worker (3, 3)
        assert totals == [3, 3], totals
    finally:
        gw.stop()


def test_gateway_sse_stream_relay(two_workers):
    from sglang_tpu.gateway import GatewayProcess

    gw = GatewayProcess(0, two_workers)
    try:
        base = f"http://127.0.0.1:{gw.port}"
        with httpx.stream("POST", base + "/generate", json={
            "input_ids": [9, 9, 9],
            "stream": True,
            "sampling_params": {"max_new_tokens": 6, "temperature": 0.0,
                                "ignore_eos": True},
        }, timeout=60) as r:
            assert r.status_code == 200
            chunks = [c for c in r.iter_text() if c.strip()]
        assert any("output_ids" in c for c in chunks)
    finally:
        gw.stop()


def test_gateway_worker_registry_and_failover(two_workers):
    """Production machinery (reference worker_manager.rs): dynamic
    add/remove, active health ejection of a dead worker, retry/failover
    so requests keep succeeding, and recovery re-admission."""
    from sglang_tpu.gateway import GatewayProcess

    # one REAL worker + one DEAD address; short health interval
    dead_port = _free_port()
    gw = GatewayProcess(
        0, [two_workers[0], f"127.0.0.1:{dead_port}"],
        policy="round_robin", health_interval_ms=200,
    )
    try:
        base = f"http://127.0.0.1:{gw.port}"
        # requests succeed despite the dead worker (connect failover)
        for i in range(4):
            r = httpx.post(base + "/generate", json={
                "input_ids": [9 + i, 6, 7],
                "sampling_params": {"max_new_tokens": 3, "temperature": 0.0,
                                    "ignore_eos": True},
            }, timeout=60)
            assert r.status_code == 200, r.text
        # the health loop marks the dead worker unhealthy
        deadline = time.time() + 5
        while time.time() < deadline:
            info = httpx.get(base + "/gateway/workers", timeout=10).json()
            by_port = {w["port"]: w for w in info["workers"]}
            if not by_port[dead_port]["healthy"]:
                break
            time.sleep(0.2)
        assert not by_port[dead_port]["healthy"], info
        assert info["retries"] >= 1  # failover happened

        # dynamic remove + add
        r = httpx.post(base + "/gateway/remove_worker",
                       json={"url": f"127.0.0.1:{dead_port}"}, timeout=10)
        assert r.status_code == 200
        r = httpx.post(base + "/gateway/add_worker",
                       json={"url": two_workers[1]}, timeout=10)
        assert r.status_code == 200
        # the added worker serves traffic
        deadline = time.time() + 5
        served = False
        while time.time() < deadline and not served:
            httpx.post(base + "/generate", json={
                "input_ids": [30, 31, 32],
                "sampling_params": {"max_new_tokens": 2, "temperature": 0.0,
                                    "ignore_eos": True},
            }, timeout=60)
            info = httpx.get(base + "/gateway/workers", timeout=10).json()
            port2 = int(two_workers[1].rsplit(":", 1)[1])
            served = any(
                w["port"] == port2 and w["total"] > 0
                for w in info["workers"]
            )
        assert served, info
        assert len(info["workers"]) == 2
    finally:
        gw.stop()


# ---------------------------------------------- discovery + PD pools
class _StubWorker:
    """Minimal HTTP worker: 200 on /health, records POST /generate
    bodies and replies with a small JSON — enough for routing tests."""

    def __init__(self):
        import http.server

        stub = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                stub.bodies.append(self.rfile.read(n).decode())
                body = b'{"ok": true}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.bodies = []
        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.server.server_address[1]
        self.addr = f"127.0.0.1:{self.port}"
        threading.Thread(target=self.server.serve_forever,
                         daemon=True).start()

    def stop(self):
        self.server.shutdown()


def _poll(fn, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if fn():
            return True
        time.sleep(0.1)
    return False


def test_gateway_discovery_file(tmp_path):
    """File-based endpoint discovery (the reference gateway's K8s
    service-discovery role): the worker pool reconciles to whatever the
    file lists — adds appear, removals leave."""
    from sglang_tpu.gateway import GatewayProcess

    s1, s2 = _StubWorker(), _StubWorker()
    disc = tmp_path / "endpoints.txt"
    disc.write_text(f"{s1.addr}\n")
    gw = GatewayProcess(0, [], discovery_file=str(disc),
                        discovery_interval_ms=100)
    try:
        base = f"http://127.0.0.1:{gw.port}"

        def pool():
            ws = httpx.get(base + "/gateway/workers", timeout=5).json()
            return sorted(w["port"] for w in ws["workers"])

        assert _poll(lambda: pool() == [s1.port]), pool()
        disc.write_text(f"{s1.addr}\n{s2.addr}\n")
        assert _poll(lambda: pool() == sorted([s1.port, s2.port])), pool()
        disc.write_text(f"# only s2 now\n{s2.addr}\n")
        assert _poll(lambda: pool() == [s2.port]), pool()
        # routing follows: requests land on the only discovered worker
        r = httpx.post(base + "/generate", json={"input_ids": [1, 2]},
                       timeout=10)
        assert r.status_code == 200
        assert len(s2.bodies) == 1 and not s1.bodies
    finally:
        gw.stop()
        s1.stop()
        s2.stop()


def test_gateway_pd_decode_load_balancing():
    """PD pools: decode workers picked least-in-flight, and each
    prefill request carries the CHOSEN decode worker's own bootstrap
    address (per-decode KV rendezvous)."""
    from sglang_tpu.gateway import GatewayProcess

    pre = _StubWorker()
    d1, d2 = _StubWorker(), _StubWorker()
    gw = GatewayProcess(
        0, [],
        pd_prefill=pre.addr,
        pd_decode=[f"{d1.addr}=127.0.0.1:7101", f"{d2.addr}=127.0.0.1:7102"],
    )
    try:
        base = f"http://127.0.0.1:{gw.port}"
        for i in range(6):
            r = httpx.post(base + "/generate", json={"input_ids": [i]},
                           timeout=10)
            assert r.status_code == 200, r.text
        # sequential requests alternate decode workers (ties on total)
        assert _poll(lambda: len(d1.bodies) + len(d2.bodies) == 6)
        assert len(d1.bodies) == 3 and len(d2.bodies) == 3, (
            len(d1.bodies), len(d2.bodies))
        # prefill saw all 6, with bootstraps matching the chosen decode
        assert _poll(lambda: len(pre.bodies) == 6)
        bs = [json.loads(b)["pd_bootstrap"] for b in pre.bodies]
        assert sorted(bs) == ["127.0.0.1:7101"] * 3 + ["127.0.0.1:7102"] * 3
        # decode bodies carry their role + room, never a bootstrap
        for b in d1.bodies + d2.bodies:
            j = json.loads(b)
            assert j["pd_role"] == "decode" and j["bootstrap_room"]
        info = httpx.get(base + "/gateway/workers", timeout=5).json()
        assert [w["total"] for w in info["pd_decode"]] == [3, 3]
        assert sum(w["total"] for w in info["pd_prefill"]) == 6
    finally:
        gw.stop()
        pre.stop()
        d1.stop()
        d2.stop()


def test_gateway_pd_prefill_cache_aware():
    """PD prefill routing is cache-aware: repeated prompts stick to the
    prefill worker whose prefix tree they seeded (radix cache affinity),
    reference pd_router prefill policy."""
    from sglang_tpu.gateway import GatewayProcess

    p1, p2 = _StubWorker(), _StubWorker()
    dec = _StubWorker()
    gw = GatewayProcess(
        0, [],
        pd_prefill=[p1.addr, p2.addr],
        pd_decode=[f"{dec.addr}=127.0.0.1:7201"],
    )
    try:
        base = f"http://127.0.0.1:{gw.port}"

        def post(text):
            r = httpx.post(base + "/generate",
                           json={"text": text}, timeout=10)
            assert r.status_code == 200, r.text

        post("AAAA common prefix request")   # seeds p1 (round robin)
        post("BBBB a different workload")    # seeds p2
        for _ in range(3):
            post("AAAA common prefix request")
            post("BBBB a different workload")
        assert _poll(lambda: len(p1.bodies) + len(p2.bodies) == 8)
        a_home = p1 if "AAAA" in p1.bodies[0] else p2
        b_home = p2 if a_home is p1 else p1
        assert all("AAAA" in b for b in a_home.bodies), a_home.bodies
        assert all("BBBB" in b for b in b_home.bodies), b_home.bodies
        assert len(a_home.bodies) == 4 and len(b_home.bodies) == 4
    finally:
        gw.stop()
        p1.stop()
        p2.stop()
        dec.stop()


def test_gateway_discovery_weights_and_priority(tmp_path):
    """Discovery-file worker attributes: 'host:port weight=N priority=N'.
    Only the highest-priority tier routes; within a tier, weighted
    shortest-queue spreads totals proportionally to weight."""
    from sglang_tpu.gateway import GatewayProcess

    s1, s2, s3 = _StubWorker(), _StubWorker(), _StubWorker()
    disc = tmp_path / "endpoints.txt"
    # s1 weight 3, s2 weight 1 (priority 0); s3 is a LOWER-priority
    # standby that must receive nothing while s1/s2 are healthy
    disc.write_text(
        f"{s1.addr} weight=3\n{s2.addr}\n{s3.addr} priority=-1\n"
    )
    gw = GatewayProcess(0, [], policy="shortest_queue",
                        discovery_file=str(disc),
                        discovery_interval_ms=100)
    try:
        base = f"http://127.0.0.1:{gw.port}"

        def workers():
            ws = httpx.get(base + "/gateway/workers", timeout=5).json()
            return {w["port"]: w for w in ws["workers"]}

        assert _poll(
            lambda: sorted(workers()) == sorted([s1.port, s2.port, s3.port])
        )
        w = workers()
        assert w[s1.port]["weight"] == 3 and w[s2.port]["weight"] == 1
        assert w[s3.port]["priority"] == -1
        for i in range(16):
            r = httpx.post(base + "/generate",
                           json={"input_ids": [i]}, timeout=10)
            assert r.status_code == 200
        # weighted spread: s1 gets ~3x s2's traffic; standby gets none
        assert len(s3.bodies) == 0
        assert len(s1.bodies) == 12 and len(s2.bodies) == 4, (
            len(s1.bodies), len(s2.bodies),
        )
    finally:
        gw.stop()
        s1.stop()
        s2.stop()
        s3.stop()


# ------------------------- r05 hardening: breaker / token bucket / queue
class _FakeWorker:
    """Minimal HTTP worker whose behavior flips at runtime: 'ok' answers
    200, 'flap' closes the connection before responding (passive relay
    failure — connect still succeeds, so only the circuit breaker can
    eject it), 'slow' sleeps before answering."""

    def __init__(self, mode="ok", delay=0.0):
        self.mode = mode
        self.delay = delay
        self.hits = 0
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.sock.listen(64)
        self._stop = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        while not self._stop:
            try:
                c, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(c,), daemon=True
            ).start()

    def _handle(self, c):
        try:
            buf = b""
            while b"\r\n\r\n" not in buf:
                d = c.recv(4096)
                if not d:
                    break
                buf += d
            self.hits += 1
            if self.mode == "flap":
                c.close()
                return
            if self.mode == "slow":
                time.sleep(self.delay)
            body = b'{"ok": true}'
            c.sendall(
                b"HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n"
                b"Content-Length: " + str(len(body)).encode()
                + b"\r\nConnection: close\r\n\r\n" + body
            )
            c.close()
        except OSError:
            pass

    def stop(self):
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass


def test_gateway_token_bucket_rate_limit():
    """r05 (r04 VERDICT next #10): per-worker token bucket — burst
    drains, excess answers 429, tokens refill over time."""
    from sglang_tpu.gateway import GatewayProcess

    w = _FakeWorker("ok")
    gw = GatewayProcess(
        port=0, workers=[f"127.0.0.1:{w.port}"], policy="round_robin",
        health_interval_ms=0, rate="2:2", max_retries=0,
    )
    try:
        base = f"http://127.0.0.1:{gw.port}"
        codes = [
            httpx.post(f"{base}/generate", json={"text": "x"},
                       timeout=5).status_code
            for _ in range(6)
        ]
        assert codes.count(200) == 2, codes  # burst of 2
        assert codes.count(429) == 4, codes
        time.sleep(1.1)  # ~2 tokens refill
        assert httpx.post(f"{base}/generate", json={"text": "x"},
                          timeout=5).status_code == 200
        stats = httpx.get(f"{base}/gateway/workers", timeout=5).json()
        assert stats["rate_limited"] >= 4
    finally:
        gw.stop()
        w.stop()


def test_gateway_circuit_breaker_flapping_worker():
    """A flapping worker (accepts, then drops the connection) trips its
    breaker after cb_failures passive errors; traffic keeps flowing via
    the healthy worker; after the cooldown a half-open trial re-admits
    the recovered worker."""
    from sglang_tpu.gateway import GatewayProcess

    good, flaky = _FakeWorker("ok"), _FakeWorker("flap")
    gw = GatewayProcess(
        port=0,
        workers=[f"127.0.0.1:{good.port}", f"127.0.0.1:{flaky.port}"],
        policy="round_robin", health_interval_ms=0,
        cb_failures=2, cb_cooldown_ms=2000, max_retries=2,
    )
    try:
        base = f"http://127.0.0.1:{gw.port}"
        # every request must succeed (failover), and after 2 flaky hits
        # the breaker opens so the flapper stops being tried
        for _ in range(10):
            r = httpx.post(f"{base}/generate", json={"text": "y"},
                           timeout=5)
            assert r.status_code == 200
        stats = httpx.get(f"{base}/gateway/workers", timeout=5).json()
        flap_row = next(
            x for x in stats["workers"] if x["port"] == flaky.port
        )
        assert flap_row["breaker_open"] is True, stats
        assert stats["breaker_skips"] > 0
        hits_while_open = flaky.hits
        # while OPEN, no traffic reaches the flapper
        for _ in range(4):
            assert httpx.post(f"{base}/generate", json={"text": "y"},
                              timeout=5).status_code == 200
        assert flaky.hits == hits_while_open
        # recover + cooldown: the half-open trial re-closes the breaker
        flaky.mode = "ok"
        time.sleep(2.2)
        for _ in range(6):
            assert httpx.post(f"{base}/generate", json={"text": "y"},
                              timeout=5).status_code == 200
        assert flaky.hits > hits_while_open  # trial + traffic returned
        stats = httpx.get(f"{base}/gateway/workers", timeout=5).json()
        flap_row = next(
            x for x in stats["workers"] if x["port"] == flaky.port
        )
        assert flap_row["breaker_open"] is False, stats
    finally:
        gw.stop()
        good.stop()
        flaky.stop()


def test_gateway_bounded_queue_sheds_overload():
    """Fixed connection pool + bounded accept queue: overload answers
    503 instead of spawning unbounded threads; a slow client cannot
    take down the gateway."""
    import concurrent.futures as cf

    from sglang_tpu.gateway import GatewayProcess

    w = _FakeWorker("slow", delay=1.0)
    gw = GatewayProcess(
        port=0, workers=[f"127.0.0.1:{w.port}"], policy="round_robin",
        health_interval_ms=0, max_conn_threads=1, conn_queue=1,
    )
    try:
        base = f"http://127.0.0.1:{gw.port}"

        def one():
            try:
                return httpx.post(f"{base}/generate", json={"text": "z"},
                                  timeout=10).status_code
            except Exception:
                return -1

        with cf.ThreadPoolExecutor(max_workers=6) as ex:
            codes = list(ex.map(lambda _: one(), range(6)))
        assert 200 in codes, codes   # service continued
        assert 503 in codes, codes   # overload shed
        stats = httpx.get(f"{base}/gateway/workers", timeout=5).json()
        assert stats["queue_rejects"] >= 1
    finally:
        gw.stop()
        w.stop()
