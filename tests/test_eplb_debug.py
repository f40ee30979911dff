"""EPLB placement math + debug dump/compare utilities."""

import numpy as np
import pytest

from tests.conftest import make_server_args


def test_balanced_placement_reduces_imbalance():
    from sglang_tpu.eplb import balanced_placement, placement_imbalance

    rng = np.random.RandomState(0)
    L, E, ep = 4, 16, 4
    counts = (rng.zipf(1.5, size=(L, E)) * 100).astype(np.int64)
    identity = np.tile(np.arange(E), (L, 1))
    before = placement_imbalance(counts, identity, ep)
    perm = balanced_placement(counts, ep)
    after = placement_imbalance(counts, perm, ep)
    assert after <= before
    # without replication the floor is the single hottest expert's share
    lb = max(
        counts[l].max() / max(counts[l].sum() / ep, 1) for l in range(L)
    )
    assert after <= max(lb * 1.05, 1.25), (after, lb)
    # every permutation row is a true permutation
    for l in range(L):
        assert sorted(perm[l]) == list(range(E))


def test_expert_permutation_preserves_outputs():
    """Permuting expert placement (weights + gate columns together) must
    not change model outputs — the core EPLB invariant."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.eplb import apply_expert_permutation
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_moe import TINY_MOE_HF

    cfg = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
    args = make_server_args()
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
        base = eng.generate(input_ids=[4, 5, 6, 7], sampling_params=dict(sp))

        E = cfg.num_experts
        L = cfg.num_hidden_layers
        rng = np.random.RandomState(1)
        perm = np.stack([rng.permutation(E) for _ in range(L)])
        runner.params = apply_expert_permutation(runner.params, perm)
        eng.flush_cache()
        out = eng.generate(input_ids=[4, 5, 6, 7], sampling_params=dict(sp))
        assert out["output_ids"] == base["output_ids"]
    finally:
        eng.shutdown()


def test_expert_permutation_int8_resident_experts():
    """EPLB invariant with INT8-RESIDENT expert weights: the per-out-
    channel scale leaves (moe_w{1,3,2}_scale) must permute together with
    their int8 payloads, or dequantization pairs weights with the wrong
    experts' scales."""
    import jax.numpy as jnp

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.eplb import apply_expert_permutation
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_moe import TINY_MOE_HF

    hf = dict(TINY_MOE_HF)
    hf["quantization_config"] = {
        "quant_method": "w8a8_int8",
        "modules_to_not_convert": ["proj"],  # experts only
    }
    cfg = ModelConfig.from_hf_dict(hf, dtype="float32")
    args = make_server_args()
    runner = ModelRunner(args, model_config=cfg)
    assert runner.params["layers"]["moe_w1"].dtype == jnp.int8
    eng = Engine(server_args=args, model_runner=runner)
    try:
        sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
        base = eng.generate(input_ids=[4, 5, 6, 7], sampling_params=dict(sp))

        E = cfg.num_experts
        L = cfg.num_hidden_layers
        rng = np.random.RandomState(2)
        perm = np.stack([rng.permutation(E) for _ in range(L)])
        runner.params = apply_expert_permutation(runner.params, perm)
        eng.flush_cache()
        out = eng.generate(input_ids=[4, 5, 6, 7], sampling_params=dict(sp))
        assert out["output_ids"] == base["output_ids"]
    finally:
        eng.shutdown()


def test_dump_and_compare(tmp_path):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.debug_utils import TensorDumper, compare_dumps
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import make_tiny_config

    outs = []
    for run in ("a", "b"):
        args = make_server_args()
        runner = ModelRunner(args, model_config=make_tiny_config())
        TensorDumper.attach(runner, str(tmp_path / run))
        eng = Engine(server_args=args, model_runner=runner)
        try:
            outs.append(eng.generate(
                input_ids=[1, 2, 3, 4],
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            ))
        finally:
            eng.shutdown()
    assert outs[0]["output_ids"] == outs[1]["output_ids"]
    reports = compare_dumps(str(tmp_path / "a"), str(tmp_path / "b"))
    assert reports, "no dumps recorded"
    assert all(r["status"] == "match" for r in reports), reports


def test_eplb_online_loop_records_and_rebalances():
    """enable_eplb: live prefill traffic feeds the recorder; a forced
    rebalance permutes expert weights on device and generation output is
    unchanged (output-preserving permutation, e2e)."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs
    from tests.test_moe import TINY_MOE_HF

    args = ServerArgs(
        model_path="dummy://tiny-moe", tokenizer_path="test:byte",
        load_format="dummy", dtype="float32", page_size=8,
        max_total_tokens=4096, chunked_prefill_size=128,
        enable_eplb=True, eplb_rebalance_interval=10**9,
    )
    cfg = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        sched = eng.scheduler
        assert sched.eplb_recorder is not None
        prompt = [5, 9, 203, 17, 42, 7, 310, 8]
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        o1 = eng.generate(input_ids=prompt, sampling_params=sp)
        counts = sched.eplb_recorder.counts
        L = TINY_MOE_HF["num_hidden_layers"]
        E = TINY_MOE_HF["num_local_experts"]
        assert counts.shape == (L, E)
        # every prompt token routes to top_k experts in every MoE layer
        # (padded rows route too, so >=)
        assert counts.sum() >= len(prompt) * TINY_MOE_HF[
            "num_experts_per_tok"] * L
        # force a rebalance at ep=2 and check output invariance
        sched._maybe_eplb_rebalance(ep=2, force=True)
        assert sched.eplb_recorder.counts.sum() == 0  # reset after apply
        o2 = eng.generate(input_ids=prompt, sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"]
    finally:
        eng.shutdown()


# ------------------------------------------------------------- elastic EP
def test_expert_backup_roundtrip():
    """DRAM backup of expert stacks restores bit-exactly and generation
    is unchanged after a restore (reference expert_backup_manager.py)."""
    import numpy as np

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.eplb.elastic import ExpertBackupManager
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs
    from tests.test_moe import TINY_MOE_HF

    args = ServerArgs(
        model_path="dummy://tiny-moe", tokenizer_path="test:byte",
        load_format="dummy", dtype="float32", page_size=8,
        max_total_tokens=4096, chunked_prefill_size=128,
    )
    cfg = ModelConfig.from_hf_dict(TINY_MOE_HF, dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    eng = Engine(server_args=args, model_runner=runner)
    try:
        prompt = [5, 9, 203, 17]
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        o1 = eng.generate(input_ids=prompt, sampling_params=sp)
        mgr = ExpertBackupManager()
        nbytes = mgr.refresh(runner.params)
        assert nbytes > 0 and "moe_w1" in mgr.backup
        # simulate loss: zero the on-device experts, then restore
        import jax.numpy as jnp

        layers = dict(runner.params["layers"])
        layers["moe_w1"] = jnp.zeros_like(layers["moe_w1"])
        runner.params = dict(runner.params, layers=layers)
        runner.params = mgr.restore(runner.params)
        o2 = eng.generate(input_ids=prompt, sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"]
    finally:
        eng.shutdown()


def test_placement_for_rank_fault():
    import numpy as np

    from sglang_tpu.eplb.elastic import placement_for_rank_fault

    rng = np.random.RandomState(0)
    L, E, ep = 2, 8, 4
    counts = rng.randint(1, 1000, size=(L, E)).astype(np.int64)
    perm, survivors = placement_for_rank_fault(counts, ep, failed_ranks=[2])
    assert survivors == 3
    per_rank = perm.shape[1] // survivors
    for layer in range(L):
        # every expert still placed at least once
        assert set(perm[layer].tolist()) == set(range(E))
        # LPT balance: worst rank <= hottest single expert + mean
        loads = [
            counts[layer][perm[layer][r * per_rank : (r + 1) * per_rank]]
            .sum()
            for r in range(survivors)
        ]
        assert max(loads) <= counts[layer].max() + counts[layer].sum() / survivors


def test_elastic_ep_serving_recovery():
    """VERDICT weak#9: elastic EP wired into the serving path — after a
    rank fault the engine keeps serving with IDENTICAL outputs, every
    real expert living on a survivor and the degraded rank's slots
    masked out of routing."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs 2 virtual devices")
    import numpy as np

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.conftest import TINY_HF_CONFIG, make_server_args

    moe_hf = dict(
        TINY_HF_CONFIG,
        architectures=["MixtralForCausalLM"],
        model_type="mixtral",
        num_local_experts=4,
        num_experts_per_tok=2,
    )
    args = make_server_args(
        tp_size=2, enable_expert_parallel=True, enable_elastic_ep=True,
        dtype="float32",
    )
    runner = ModelRunner(
        args, model_config=ModelConfig.from_hf_dict(moe_hf, dtype="float32")
    )
    eng = Engine(server_args=args, model_runner=runner)
    try:
        assert runner.expert_backup is not None
        prompt = [(5 * i) % 250 + 1 for i in range(31)]
        sp = {"temperature": 0.0, "max_new_tokens": 12, "ignore_eos": True}
        before = eng.generate(input_ids=prompt, sampling_params=dict(sp))

        info = eng.recover_expert_fault([1])
        assert info["survivors"] == 1
        # 4 experts re-placed over 1 survivor; rank 1's span is masked
        g = np.asarray(runner.params["layers"]["gate_bias"])
        Lm, E_new = g.shape
        assert E_new == info["num_expert_slots"]
        assert (g[:, E_new // 2 :] <= -1e29).all()  # failed span masked
        assert (g[:, : E_new // 2] > -1e29).all()

        after = eng.generate(input_ids=prompt, sampling_params=dict(sp))
        assert after["output_ids"] == before["output_ids"]
        # a fresh request also serves fine post-recovery
        out = eng.generate(
            input_ids=[9, 9, 9, 8, 7], sampling_params=dict(sp)
        )
        assert len(out["output_ids"]) == 12
    finally:
        eng.shutdown()
