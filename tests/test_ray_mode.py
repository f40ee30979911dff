"""Actor-based engine topology (reference ray/scheduler_actor.py):
handle + futures call discipline, engine isolated behind messages.
Runs on the thread-backed local actor (ray not installed here); the
same interface binds to a real Ray actor when ray is present."""


def test_engine_actor_generate():
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.ray_mode import create_engine_actor
    from tests.conftest import TINY_HF_CONFIG, make_server_args

    def factory():
        from sglang_tpu.entrypoints.engine import Engine

        args = make_server_args()
        cfg = ModelConfig.from_hf_dict(
            TINY_HF_CONFIG, model_path="dummy://tiny", dtype="float32"
        )
        return Engine(
            server_args=args,
            model_runner=ModelRunner(args, model_config=cfg),
        )

    handle, get = create_engine_actor(engine_factory=factory)
    try:
        fut1 = handle.generate.remote(
            input_ids=[5, 9, 203, 17],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        fut2 = handle.generate.remote(
            input_ids=[1, 2, 3],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        o1, o2 = get(fut1), get(fut2)
        assert len(o1["output_ids"]) == 8
        assert len(o2["output_ids"]) == 4
        info = get(handle.get_server_info.remote())
        assert info["num_generated_tokens"] >= 12
    finally:
        get(handle.shutdown.remote())
