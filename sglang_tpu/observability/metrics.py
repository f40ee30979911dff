"""Prometheus metrics.

Equivalent role to the reference's ``observability/metrics_collector.py``
(``SchedulerMetricsCollector`` :236 — running/queued requests, token usage,
cache hit rate) and ``request_metrics_exporter.py`` (TTFT / ITL / e2e
histograms).  Exposed on ``GET /metrics`` when ``--enable-metrics``.
"""

from __future__ import annotations

import threading
from typing import Optional

_METRICS: Optional["EngineMetrics"] = None
_LOCK = threading.Lock()


def get_metrics(model_name: str = "") -> "EngineMetrics":
    global _METRICS
    with _LOCK:
        if _METRICS is None:
            _METRICS = EngineMetrics(model_name)
        return _METRICS


class EngineMetrics:
    def __init__(self, model_name: str = ""):
        from prometheus_client import Counter, Gauge, Histogram

        labels = {"model_name": model_name or "unknown"}
        self.labels = labels

        self.num_running = Gauge(
            "sglang_tpu_num_running_reqs",
            "Number of requests currently in the running batch",
            labelnames=list(labels),
        ).labels(**labels)
        self.num_waiting = Gauge(
            "sglang_tpu_num_waiting_reqs",
            "Number of requests in the waiting queue",
            labelnames=list(labels),
        ).labels(**labels)
        self.kv_usage = Gauge(
            "sglang_tpu_kv_cache_usage",
            "Fraction of KV pool pages in use",
            labelnames=list(labels),
        ).labels(**labels)

        self.prompt_tokens = Counter(
            "sglang_tpu_prompt_tokens_total",
            "Total prefilled tokens",
            labelnames=list(labels),
        ).labels(**labels)
        self.generation_tokens = Counter(
            "sglang_tpu_generation_tokens_total",
            "Total generated tokens",
            labelnames=list(labels),
        ).labels(**labels)
        self.cached_tokens = Counter(
            "sglang_tpu_cached_tokens_total",
            "Prompt tokens served from the radix cache",
            labelnames=list(labels),
        ).labels(**labels)
        self.num_requests = Counter(
            "sglang_tpu_requests_total",
            "Finished requests",
            labelnames=list(labels) + ["finish_reason"],
        )
        self.num_retracted = Counter(
            "sglang_tpu_retracted_reqs_total",
            "Requests retracted under memory pressure",
            labelnames=list(labels),
        ).labels(**labels)

        self.ttft = Histogram(
            "sglang_tpu_time_to_first_token_seconds",
            "Time to first token",
            labelnames=list(labels),
            buckets=[0.05, 0.1, 0.25, 0.5, 1, 2, 5, 10, 30, 60],
        ).labels(**labels)
        self.e2e_latency = Histogram(
            "sglang_tpu_e2e_request_latency_seconds",
            "End-to-end request latency",
            labelnames=list(labels),
            buckets=[0.1, 0.25, 0.5, 1, 2, 5, 10, 30, 60, 120, 300],
        ).labels(**labels)
        self.per_token_latency = Histogram(
            "sglang_tpu_inter_token_latency_seconds",
            "Mean inter-token latency per request",
            labelnames=list(labels),
            buckets=[0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 1],
        ).labels(**labels)

    # ------------------------------------------------------------- updates
    def observe_finished(self, req) -> None:
        """Record a finished request's lifecycle stats."""
        self.num_requests.labels(
            **self.labels, finish_reason=req.finish_reason.value or "abort"
        ).inc()
        self.prompt_tokens.inc(len(req.origin_input_ids))
        self.generation_tokens.inc(len(req.output_ids))
        if req.cache_hit_tokens:
            self.cached_tokens.inc(req.cache_hit_tokens)
        if req.first_token_time is not None:
            self.ttft.observe(req.first_token_time - req.arrival_time)
        if req.finish_time is not None:
            self.e2e_latency.observe(req.finish_time - req.arrival_time)
            n = len(req.output_ids)
            if n > 1 and req.first_token_time is not None:
                self.per_token_latency.observe(
                    (req.finish_time - req.first_token_time) / (n - 1)
                )

    def set_queue_state(self, running: int, waiting: int, kv_usage: float):
        self.num_running.set(running)
        self.num_waiting.set(waiting)
        self.kv_usage.set(kv_usage)
