"""Server configuration.

Equivalent role to the reference's ``python/sglang/srt/server_args.py:366``
(``ServerArgs`` annotated dataclass whose fields auto-map to CLI flags) —
rebuilt for the TPU runtime.  Fields map 1:1 to ``--kebab-case`` CLI flags via
:func:`ServerArgs.add_cli_args` / :func:`ServerArgs.from_cli_args`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import typing
from dataclasses import dataclass, field, fields
from typing import List, Optional


@dataclass
class ServerArgs:
    # ---- model & tokenizer ----
    model_path: str = ""
    tokenizer_path: Optional[str] = None  # defaults to model_path
    trust_remote_code: bool = False
    context_length: Optional[int] = None  # override model max context
    dtype: str = "bfloat16"  # model compute/weight dtype
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | float8_e4m3 | float8_e5m2
    quantization: Optional[str] = None  # fp8 | int8 | awq | gptq | None
    # auto | safetensors | gguf | bitsandbytes | sharded_state |
    # remote_instance | dummy
    load_format: str = "auto"
    # remote_instance bootstrap: pull live exec-layout weights from a
    # running instance (reference RemoteInstanceModelLoader,
    # loader.py:2196); the seed calls Engine.serve_weights_bootstrap()
    remote_instance_seed_addr: Optional[str] = None
    random_seed: int = 0
    served_model_name: Optional[str] = None
    revision: Optional[str] = None

    # ---- memory / KV cache ----
    mem_fraction_static: float = 0.85  # HBM fraction for weights+KV
    max_total_tokens: Optional[int] = None  # KV pool size in tokens (overrides)
    page_size: int = 32  # tokens per KV page (radix granularity; larger
    # pages = fewer/bigger DMAs in the decode attention kernel)
    max_running_requests: int = 256
    max_queued_requests: Optional[int] = None

    # ---- scheduling ----
    schedule_policy: str = "fcfs"  # fcfs | lpm | lof | random | dfs-weight
    # priority scheduling (reference schedule_policy.py:163-171): the
    # waiting queue orders by request priority first (ties keep the base
    # policy's order), and requests carrying a priority are rejected
    # unless this is on
    enable_priority_scheduling: bool = False
    schedule_low_priority_values_first: bool = False
    schedule_conservativeness: float = 1.0
    chunked_prefill_size: int = 2048  # -1 disables chunked prefill
    max_prefill_tokens: int = 8192
    disable_radix_cache: bool = False
    radix_cache_backend: str = "auto"  # auto | python | cpp (native C++)
    # hybrid-SWA split KV pools (Gemma-2/3-class mixed sliding/full
    # stacks; arms automatically when eligible — see
    # model_runner._hybrid_swa_spec)
    disable_hybrid_swa: bool = False
    enable_hierarchical_cache: bool = False  # host-RAM KV backup tier
    hicache_ratio: float = 2.0  # host pool size as a multiple of device pool
    disable_overlap_schedule: bool = False
    stream_interval: int = 1
    # Fused decode window: K decode steps run inside one jitted device loop
    # (tokens chain on device). Trades up to K-1 overshoot tokens per
    # finishing request for a Kx cut in host<->device round trips.
    decode_window_size: int = 16
    # chained decode windows kept in flight on the device (window N+1
    # absorbs window N's host fetch round-trip; raise over slow links)
    decode_chain_depth: int = 2
    # decode batch-size buckets for XLA compile cache (like CUDA-graph bs list)
    decode_bs_buckets: Optional[List[int]] = None
    prefill_len_buckets: Optional[List[int]] = None

    # ---- parallelism ----
    tp_size: int = 1
    dp_size: int = 1
    pp_size: int = 1
    # micro-batches for the pp wavefront (0 = auto: pp_size); 1 = serial
    pp_microbatches: int = 0
    ep_size: int = 1
    cp_size: int = 1  # prefill context parallelism (zigzag sequence shard)
    enable_expert_parallel: bool = False
    # EP token dispatch (reference --moe-a2a-backend: deepep): "a2a" moves
    # only routed rows via ragged all-to-all; "none" = replicate+psum
    moe_a2a_backend: str = "none"  # none | a2a
    dist_init_addr: Optional[str] = None
    nnodes: int = 1
    node_rank: int = 0

    # ---- server / api ----
    host: str = "127.0.0.1"
    port: int = 30000
    api_key: Optional[str] = None
    chat_template: Optional[str] = None
    reasoning_parser: Optional[str] = None  # deepseek-r1 | qwen3
    tool_call_parser: str = "auto"  # auto | qwen25 | hermes | llama3 | mistral
    enable_metrics: bool = False
    log_level: str = "info"
    log_requests: bool = False
    show_time_cost: bool = False

    # ---- sampling defaults / limits ----
    max_new_tokens_default: int = 128

    # ---- speculative decoding ----
    speculative_algorithm: Optional[str] = None  # NGRAM | EAGLE | EAGLE3
    speculative_num_draft_tokens: int = 4
    speculative_eagle_topk: int = 1  # >1 = top-b root-branch tree verify
    # Adaptive draft depth (reference adaptive_spec_params.py): tune the
    # EAGLE chain depth per decode-batch-size tier from accept-length
    # EMA; candidates are capped at speculative_num_draft_tokens.
    # EAGLE chain (topk=1) only.
    enable_adaptive_spec: bool = False
    speculative_ngram_n: int = 3
    speculative_draft_model_path: Optional[str] = None  # EAGLE draft ckpt

    # ---- quantization execution ----
    # "native": run checkpoints in their stored format; "int8": transcode
    # fp8 checkpoints to per-channel int8 at load (v5e-native MXU path,
    # ~3.5x faster than emulated fp8 dequant; precision comparable).
    # "auto" (default) picks int8 for fp8/block-fp8 checkpoints — fp8
    # weight dequant is VPU-emulated on v5e-class chips and measured
    # ~2.9x SLOWER than bf16, so native fp8 must be an explicit opt-in.
    quant_execution: str = "auto"
    plugins: Optional[List[str]] = None  # module paths (reference plugins/)
    # ---- two-batch overlap (reference batch_overlap/) ----
    enable_two_batch_overlap: bool = False
    tbo_token_threshold: int = 512  # min prefill tokens before splitting
    # ---- EPLB (expert-placement load balancing, MoE + EP) ----
    enable_eplb: bool = False
    # Elastic EP: DRAM expert backups at load + rank-fault recovery API
    # (reference elastic_ep/; /recover_expert_fault admin route)
    enable_elastic_ep: bool = False
    eplb_rebalance_interval: int = 512  # scheduler steps between checks
    eplb_min_gain: float = 1.05  # required imbalance improvement factor
    eplb_min_tokens: int = 4096  # min recorded routings before rebalance

    # ---- hicache storage tier ----
    hicache_storage_dir: Optional[str] = None  # file/shared-FS 3rd tier

    # ---- observability ----
    enable_request_tracing: bool = False  # per-request span recording

    # ---- grpc ----
    grpc_port: Optional[int] = None  # serve sglang.runtime.v1 when set

    # ---- PD disaggregation over HTTP (reference --disaggregation-mode) ----
    # "decode" starts a KV bootstrap server (prefill engines stream page
    # slabs to it); requests carrying pd_role/bootstrap_room route into
    # the PD scheduler lifecycle.  The gateway's --pd-prefill/--pd-decode
    # duplicates each request to both roles.
    disaggregation_mode: str = "none"  # none | prefill | decode
    pd_bootstrap_port: int = 0  # 0 = auto

    # ---- dp attention ----
    enable_dp_attention: bool = False

    # ---- double-sparsity decode attention (reference
    # layers/attention/double_sparsity_backend.py) ----
    # Long-context decode attends only the top-K pages per query, ranked
    # by approximate scores over a thin label cache (r key channels).
    enable_double_sparsity: bool = False
    ds_channels: int = 16  # label channels per kv head
    ds_top_pages: int = 32  # pages attended per decode query
    # NSA / InfLLM-v2 block-sparse attention (pooled-key block
    # summaries; decode AND prefill top-K pages — ops/nsa_attention.py)
    enable_nsa: bool = False
    nsa_top_pages: int = 16  # pages attended per decode step / q tile

    # ---- decode context parallelism (reference layers/dcp/) ----
    # KV pages shard over the tp axis (page p -> rank p % tp), attention
    # weights replicate, per-rank partials merge by LSE.  Lifts per-request
    # context past one shard's HBM (the head axis can't shard below 1 head).
    enable_dcp: bool = False

    # ---- lora ----
    enable_lora: bool = False
    max_loras_per_batch: int = 8
    max_lora_rank: int = 16

    # ---- constrained decoding ----
    grammar_backend: str = "native"
    # Jump-forward: commit deterministic grammar spans as forced tokens
    # through one extend pass (reference base_grammar_backend.py:91)
    disable_jump_forward: bool = False
    jump_forward_min_bytes: int = 4

    # ---- misc ----
    skip_server_warmup: bool = False
    # context length the startup warmup compiles page-table buckets for
    # (decode/extend P buckets; see ModelRunner.warmup_plan)
    warmup_ctx_len: int = 4096
    watchdog_timeout: float = 300.0
    device: str = "auto"  # auto | tpu | cpu

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.chunked_prefill_size is not None and self.chunked_prefill_size > 0:
            self.max_prefill_tokens = max(
                self.max_prefill_tokens, self.chunked_prefill_size
            )
        self.check()

    def check(self):
        assert self.page_size >= 1, "page_size must be >= 1"
        assert self.tp_size >= 1 and self.dp_size >= 1 and self.pp_size >= 1
        if self.schedule_policy not in ("fcfs", "lpm", "lof", "random", "dfs-weight"):
            raise ValueError(f"Unknown schedule policy {self.schedule_policy!r}")
        if self.speculative_algorithm not in (
            None, "NGRAM", "ngram", "EAGLE", "eagle", "EAGLE3", "eagle3",
        ):
            raise ValueError(
                f"Unknown speculative algorithm {self.speculative_algorithm!r}"
            )
        if self.moe_a2a_backend not in ("none", "a2a"):
            raise ValueError(
                f"Unknown moe_a2a_backend {self.moe_a2a_backend!r}"
            )
        if self.enable_double_sparsity:
            if (
                self.enable_dcp or self.cp_size > 1 or self.pp_size > 1
                or self.kv_cache_dtype not in ("auto", "bfloat16")
            ):
                raise ValueError(
                    "--enable-double-sparsity supports tp-only meshes "
                    "with native-dtype KV for now"
                )
        if self.enable_nsa:
            if (
                self.enable_dcp or self.cp_size > 1 or self.pp_size > 1
                or self.kv_cache_dtype not in ("auto", "bfloat16")
                or self.enable_double_sparsity
            ):
                raise ValueError(
                    "--enable-nsa supports tp-only meshes with "
                    "native-dtype KV (and excludes double sparsity)"
                )
        if self.enable_dcp:
            if self.tp_size < 2:
                raise ValueError("--enable-dcp requires tp_size >= 2")
            if self.enable_dp_attention or self.cp_size > 1 or self.pp_size > 1:
                raise ValueError(
                    "--enable-dcp is incompatible with dp-attention / cp / pp"
                )
            if self.kv_cache_dtype not in ("auto", "bfloat16"):
                raise ValueError("--enable-dcp requires bf16/native KV")
            if self.enable_hierarchical_cache or self.hicache_storage_dir:
                raise ValueError(
                    "--enable-dcp: hierarchical cache not supported yet "
                    "(page extraction assumes the unsharded pool layout)"
                )

    # ------------------------------------------------------------------ CLI
    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser):
        for f in fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            ftype = f.type
            origin = typing.get_origin(ftype)
            args_ = typing.get_args(ftype)
            default = (
                f.default
                if f.default is not dataclasses.MISSING
                else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
            )
            if ftype in ("bool", bool):
                parser.add_argument(
                    name,
                    action="store_true" if not default else "store_false",
                    default=default,
                )
            elif origin is typing.Union and type(None) in args_:
                inner = [a for a in args_ if a is not type(None)][0]
                if typing.get_origin(inner) is list:
                    parser.add_argument(name, type=json.loads, default=default)
                else:
                    parser.add_argument(name, type=inner, default=default)
            elif ftype in ("int", int):
                parser.add_argument(name, type=int, default=default)
            elif ftype in ("float", float):
                parser.add_argument(name, type=float, default=default)
            else:
                parser.add_argument(name, type=str, default=default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        kwargs = {f.name: getattr(args, f.name) for f in fields(cls) if hasattr(args, f.name)}
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class PortArgs:
    """ZMQ/IPC endpoint set for the multi-process topology.

    Mirrors the reference's ``PortArgs`` (server_args.py:7197) — sockets for
    tokenizer→scheduler, scheduler→detokenizer, detokenizer→tokenizer.
    """

    tokenizer_ipc: str = ""
    scheduler_ipc: str = ""
    detokenizer_ipc: str = ""
    rpc_ipc: str = ""

    @classmethod
    def init_new(cls, server_args: ServerArgs) -> "PortArgs":
        import tempfile
        import uuid

        base = tempfile.gettempdir()
        sid = uuid.uuid4().hex[:8]
        return cls(
            tokenizer_ipc=f"ipc://{base}/sgl_tpu_tok_{sid}",
            scheduler_ipc=f"ipc://{base}/sgl_tpu_sched_{sid}",
            detokenizer_ipc=f"ipc://{base}/sgl_tpu_detok_{sid}",
            rpc_ipc=f"ipc://{base}/sgl_tpu_rpc_{sid}",
        )
