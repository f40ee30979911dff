"""bench_one_batch + GSM8K eval harness mechanics."""

import numpy as np

from tests.conftest import TINY_HF_CONFIG, make_server_args


def test_bench_one_batch_runs():
    from sglang_tpu.bench_one_batch import run_bench
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args()
    runner = ModelRunner(
        args, model_config=ModelConfig.from_hf_dict(TINY_HF_CONFIG, dtype="float32")
    )
    eng = Engine(server_args=args, model_runner=runner)
    try:
        r = run_bench(eng, batch_size=2, input_len=16, output_len=8, rounds=1)
    finally:
        eng.shutdown()
    assert r["prefill_throughput_tok_s"] > 0
    assert r["decode_throughput_tok_s"] > 0
    assert r["total_latency_s"] > 0


def test_gsm8k_extract_answer():
    from sglang_tpu.eval.gsm8k import INVALID, extract_answer

    assert extract_answer("the answer is 42.") == 42
    assert extract_answer("#### 1,234") == 1234
    assert extract_answer("costs $3.50 total") == 3.5
    assert extract_answer("first 7 then 9") == 9
    assert extract_answer("no numbers here") == INVALID


def test_gsm8k_harness_accuracy():
    from sglang_tpu.eval.gsm8k import evaluate_gsm8k

    dataset = [
        {"question": f"shot {i}", "answer": f"work #### {i}"} for i in range(3)
    ] + [
        {"question": "2+2?", "answer": "sum #### 4"},
        {"question": "3*3?", "answer": "prod #### 9"},
        {"question": "10-1?", "answer": "diff #### 9"},
        {"question": "5+5?", "answer": "sum #### 10"},
    ]

    answers = {"2+2?": "4", "3*3?": "9", "10-1?": "8", "5+5?": "gibberish"}

    def fake_generate(prompt: str) -> str:
        q = prompt.rsplit("Question: ", 1)[1].split("\n")[0]
        return answers[q]

    r = evaluate_gsm8k(fake_generate, dataset, num_questions=4, num_shots=3)
    assert r["n"] == 4
    assert r["accuracy"] == 0.5  # 2 of 4 correct
    assert r["invalid_rate"] == 0.25  # 'gibberish'


# ---------------------------------------------------- schedule simulator
def test_sched_sim_runs_and_reports():
    """Discrete-event schedule simulator drives the PRODUCTION
    PrefillAdder/policy/ratio-tracker (reference schedule-replay debug
    tooling role)."""
    from sglang_tpu.debug_utils.sched_sim import Workload, simulate

    rep = simulate(
        Workload.poisson(n=32, rate_rps=8.0, prompt_len=256,
                         output_len=64, seed=0),
        policy="fcfs", max_total_tokens=16384,
    )
    s = rep.summary()
    assert s["decode_windows"] > 0 and s["prefill_steps"] > 0
    assert s["median_ttft_s"] >= 0 and s["median_e2e_s"] > 0
    assert 0 < s["utilization"] <= 1.0
    assert len(rep.ttft) == 32 and np.isfinite(rep.ttft).all()


def test_sched_sim_memory_pressure_retracts():
    """A pool far too small for the burst must trigger the production
    retraction path and still complete every request."""
    from sglang_tpu.debug_utils.sched_sim import Workload, simulate

    rep = simulate(
        Workload.burst(n=16, prompt_len=32, output_len=512),
        policy="fcfs", max_total_tokens=2048, max_running_requests=16,
        conservativeness=0.3,  # optimistic admission -> pressure later
    )
    assert rep.retractions > 0
    assert np.isfinite(rep.e2e).all()


def test_sched_sim_policy_comparison():
    """Different admission policies produce (at least) a valid report —
    the point of the simulator: compare them without hardware."""
    from sglang_tpu.debug_utils.sched_sim import Workload, simulate

    outs = {}
    for pol in ("fcfs", "lpm", "lof", "random"):
        outs[pol] = simulate(
            Workload.poisson(n=24, rate_rps=6.0, prompt_len=128,
                             output_len=32, seed=1),
            policy=pol, max_total_tokens=8192,
        ).summary()
    assert all(o["decode_windows"] > 0 for o in outs.values())
