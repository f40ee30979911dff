"""Multi-host leader/follower execution over jax.distributed.

Two local CPU processes (1 device each) form a 2-device global mesh; the
leader runs the engine with TP=2 across BOTH hosts, followers replay the
broadcast step stream.  Output must match a single-process TP=1 engine.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
addr = sys.argv[2]

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.parallel.multihost import run_node
from sglang_tpu.server_args import ServerArgs

TINY = {
    "architectures": ["LlamaForCausalLM"], "hidden_size": 64,
    "intermediate_size": 128, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
    "vocab_size": 512, "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "tie_word_embeddings": False, "eos_token_id": 257, "model_type": "llama",
}
args = ServerArgs(
    model_path="dummy://tiny", tokenizer_path="test:byte",
    load_format="dummy", dtype="float32", page_size=8,
    max_total_tokens=2048, tp_size=2, nnodes=2, node_rank=rank,
    dist_init_addr=addr,
)
cfg = ModelConfig.from_hf_dict(TINY, dtype="float32")
eng = run_node(args, model_config=cfg)
if rank == 0:
    out = eng.generate(
        input_ids=[9, 8, 7, 6, 5],
        sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                         "ignore_eos": True},
    )
    # protocol v2: penalties + grammar buffers broadcast to followers
    out_pen = eng.generate(
        input_ids=[9, 8, 7, 6, 5],
        sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                         "ignore_eos": True, "repetition_penalty": 1.5,
                         "frequency_penalty": 0.2},
    )
    out_gram = eng.generate(
        prompt="x",
        sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                         "regex": "(ab|cd)+"},
    )
    print("RESULT " + json.dumps(
        [out["output_ids"], out_pen["output_ids"], out_gram["text"]]
    ), flush=True)
    eng.scheduler.runner.stop_followers()
    eng.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_multihost_leader_follower(tmp_path):
    addr = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), addr],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            text=True,
        )
        for rank in (0, 1)
    ]
    try:
        out0, _ = procs[0].communicate(timeout=240)
        out1, _ = procs[1].communicate(timeout=60)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    assert procs[0].returncode == 0, out0[-2000:]
    assert procs[1].returncode == 0, out1[-2000:]
    line = [l for l in out0.splitlines() if l.startswith("RESULT ")]
    assert line, out0[-2000:]
    multihost_ids, mh_pen_ids, mh_gram_text = json.loads(
        line[0][len("RESULT "):]
    )

    # single-process TP=1 reference
    import jax

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import TINY_HF_CONFIG, make_server_args

    args = make_server_args()
    runner = ModelRunner(
        args,
        model_config=ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32"),
        devices=jax.devices()[:1],
    )
    eng = Engine(server_args=args, model_runner=runner)
    try:
        ref = eng.generate(
            input_ids=[9, 8, 7, 6, 5],
            sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                             "ignore_eos": True},
        )
        ref_pen = eng.generate(
            input_ids=[9, 8, 7, 6, 5],
            sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                             "ignore_eos": True, "repetition_penalty": 1.5,
                             "frequency_penalty": 0.2},
        )
        ref_gram = eng.generate(
            prompt="x",
            sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                             "regex": "(ab|cd)+"},
        )
    finally:
        eng.shutdown()
    assert multihost_ids == ref["output_ids"]
    assert mh_pen_ids == ref_pen["output_ids"]
    assert mh_gram_text == ref_gram["text"]


MOE_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
addr = sys.argv[2]

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.parallel.multihost import run_node
from sglang_tpu.server_args import ServerArgs

TINY_MOE = {
    "architectures": ["MixtralForCausalLM"], "model_type": "mixtral",
    "hidden_size": 64, "intermediate_size": 96, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
    "vocab_size": 512, "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "tie_word_embeddings": False, "eos_token_id": 257,
    "num_local_experts": 4, "num_experts_per_tok": 2,
}
args = ServerArgs(
    model_path="dummy://tiny-moe", tokenizer_path="test:byte",
    load_format="dummy", dtype="float32", page_size=8,
    max_total_tokens=2048, tp_size=2, nnodes=2, node_rank=rank,
    dist_init_addr=addr, enable_eplb=True,
    eplb_rebalance_interval=10**9,
)
cfg = ModelConfig.from_hf_dict(TINY_MOE, dtype="float32")
eng = run_node(args, model_config=cfg)
if rank == 0:
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    o1 = eng.generate(input_ids=[9, 8, 7, 6, 5], sampling_params=sp)
    sched = eng.scheduler
    assert sched.eplb_recorder is not None
    assert sched.eplb_recorder.counts.sum() > 0
    # coordinated rebalance: leader broadcasts K_EPLB, every host applies
    sched._maybe_eplb_rebalance(ep=2, force=True)
    o2 = eng.generate(input_ids=[9, 8, 7, 6, 5], sampling_params=sp)
    print("RESULT " + json.dumps([o1["output_ids"], o2["output_ids"]]),
          flush=True)
    eng.scheduler.runner.stop_followers()
    eng.shutdown()
"""


def test_multihost_eplb_rebalance(tmp_path):
    """MoE over 2 hosts with --enable-eplb: routing counts record on the
    leader and a forced rebalance broadcasts the permutation (K_EPLB) so
    both hosts stay in lock-step; outputs are permutation-invariant."""
    addr = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "moe_worker.py"
    script.write_text(MOE_WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), addr],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=repo,
            text=True,
        )
        for rank in (0, 1)
    ]
    try:
        out0, _ = procs[0].communicate(timeout=240)
        out1, _ = procs[1].communicate(timeout=60)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost eplb workers timed out")
    assert procs[0].returncode == 0, out0[-2000:]
    assert procs[1].returncode == 0, out1[-2000:]
    line = [l for l in out0.splitlines() if l.startswith("RESULT ")]
    assert line, out0[-2000:]
    o1, o2 = json.loads(line[0][len("RESULT "):])
    assert o1 == o2, (o1, o2)


EAGLE_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
addr = sys.argv[2]

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.parallel.multihost import run_node
from sglang_tpu.server_args import ServerArgs

TINY = {
    "architectures": ["LlamaForCausalLM"], "hidden_size": 64,
    "intermediate_size": 128, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
    "vocab_size": 512, "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "tie_word_embeddings": False, "eos_token_id": 257, "model_type": "llama",
}
args = ServerArgs(
    model_path="dummy://tiny", tokenizer_path="test:byte",
    load_format="dummy", dtype="float32", page_size=8,
    max_total_tokens=2048, tp_size=2, nnodes=2, node_rank=rank,
    dist_init_addr=addr,
    speculative_algorithm="EAGLE", speculative_num_draft_tokens=3,
)
cfg = ModelConfig.from_hf_dict(TINY, dtype="float32")
eng = run_node(args, model_config=cfg)
if rank == 0:
    out = eng.generate(
        input_ids=[9, 8, 7, 6, 5],
        sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                         "ignore_eos": True},
    )
    sched = eng.scheduler
    print("RESULT " + json.dumps(
        [out["output_ids"], sched.num_spec_drafted]
    ), flush=True)
    eng.scheduler.runner.stop_followers()
    eng.shutdown()
"""


def test_multihost_eagle(tmp_path):
    """VERDICT row 12: EAGLE over the leader/follower protocol — the
    draft/verify step stream broadcasts, followers regenerate identical
    drafts deterministically, greedy output matches single-host."""
    addr = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker_eagle.py"
    script.write_text(EAGLE_WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), addr],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=repo,
            text=True,
        )
        for rank in (0, 1)
    ]
    try:
        out0, _ = procs[0].communicate(timeout=300)
        out1, _ = procs[1].communicate(timeout=60)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost eagle workers timed out")
    assert procs[0].returncode == 0, out0[-2000:]
    assert procs[1].returncode == 0, out1[-2000:]
    line = [l for l in out0.splitlines() if l.startswith("RESULT ")]
    assert line, out0[-2000:]
    mh_ids, drafted = json.loads(line[0][len("RESULT "):])
    assert drafted > 0  # speculation actually ran multihost

    # single-process EAGLE reference (greedy => token-exact)
    import jax

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import TINY_HF_CONFIG, make_server_args

    args = make_server_args(
        speculative_algorithm="EAGLE", speculative_num_draft_tokens=3,
    )
    runner = ModelRunner(
        args,
        model_config=ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32"),
        devices=jax.devices()[:1],
    )
    eng = Engine(server_args=args, model_runner=runner)
    try:
        ref = eng.generate(
            input_ids=[9, 8, 7, 6, 5],
            sampling_params={"temperature": 0.0, "max_new_tokens": 10,
                             "ignore_eos": True},
        )
        assert mh_ids == ref["output_ids"], (mh_ids, ref["output_ids"])
    finally:
        eng.shutdown()


EMBEDS_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

rank = int(sys.argv[1])
addr = sys.argv[2]

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.parallel.multihost import run_node
from sglang_tpu.server_args import ServerArgs

TINY = {
    "architectures": ["LlamaForCausalLM"], "hidden_size": 64,
    "intermediate_size": 128, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
    "vocab_size": 512, "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    "tie_word_embeddings": False, "eos_token_id": 257, "model_type": "llama",
}
args = ServerArgs(
    model_path="dummy://tiny", tokenizer_path="test:byte",
    load_format="dummy", dtype="float32", page_size=8,
    max_total_tokens=2048, tp_size=2, nnodes=2, node_rank=rank,
    dist_init_addr=addr,
)
cfg = ModelConfig.from_hf_dict(TINY, dtype="float32")
eng = run_node(args, model_config=cfg)
if rank == 0:
    prompt = [5, 9, 2, 7, 1, 3]
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    base = eng.generate(input_ids=list(prompt), sampling_params=dict(sp))
    # splice token 2's own embedding row via the multimodal path —
    # broadcast to the follower (protocol v3 embeds buffer)
    runner = eng.scheduler.runner.runner  # unwrap LeaderRunner
    # the embedding is vocab-sharded across hosts: token 2's row lives
    # in this host's (first) shard
    shard = runner.params["embed"].addressable_shards[0]
    row0 = shard.index[0].start or 0
    emb_local = np.asarray(shard.data).astype(np.float32)
    state = eng._make_req(None, list(prompt), dict(sp), False, None)
    req = state.req
    req.fill_ids[2] = -1
    req.input_embeds = emb_local[prompt[2] - row0][None, :]
    eng.scheduler.add_request(req)
    out = eng._wait_final(state)
    print("RESULT " + json.dumps(
        [base["output_ids"], out["output_ids"]]
    ), flush=True)
    eng.scheduler.runner.stop_followers()
    eng.shutdown()
"""


def test_multihost_multimodal_embeds(tmp_path):
    """Protocol v3: input-embeds rows broadcast to followers (the vision
    tower runs only on the leader) — spliced output must equal the
    plain-token output."""
    addr = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker_embeds.py"
    script.write_text(EMBEDS_WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), addr],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=repo, text=True,
        )
        for rank in (0, 1)
    ]
    try:
        out0, _ = procs[0].communicate(timeout=300)
        out1, _ = procs[1].communicate(timeout=60)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost embeds workers timed out")
    assert procs[0].returncode == 0, out0[-2000:]
    assert procs[1].returncode == 0, out1[-2000:]
    line = [l for l in out0.splitlines() if l.startswith("RESULT ")]
    assert line, out0[-2000:]
    base_ids, spliced_ids = json.loads(line[0][len("RESULT "):])
    assert base_ids == spliced_ids, (base_ids, spliced_ids)
