"""BitsAndBytes 4-bit checkpoint loading (reference model_loader/loader.py:1610
BitsAndBytesModelLoader, pre-quantized path): nf4 packed weights +
quant_state sidecars dequantize to dense floats at load."""

import numpy as np
import pytest

from tests.conftest import make_server_args
from tests.test_quant_e2e import _save_st, _tiny_hf_state, _write_cfg

from sglang_tpu.model_loader.bitsandbytes import (
    dequant_bnb_4bit,
    quantize_bnb_4bit,
)


@pytest.mark.parametrize("nested", [False, True])
@pytest.mark.parametrize("shape", [(8, 16), (7, 9), (33, 5)])
def test_quantize_dequantize_roundtrip(nested, shape):
    rng = np.random.RandomState(0)
    w = rng.randn(*shape).astype(np.float32)
    tensors = quantize_bnb_4bit(w, "w", blocksize=64, nested=nested)
    st = {"meta": None}
    import json

    st["meta"] = json.loads(
        bytes(tensors["w.quant_state.bitsandbytes__nf4"].tobytes())
    )
    for k in ("absmax", "quant_map", "nested_absmax", "nested_quant_map"):
        if f"w.{k}" in tensors:
            st[k] = tensors[f"w.{k}"]
    wd = dequant_bnb_4bit(tensors["w"], st)
    assert wd.shape == shape
    # nf4 is lossy but block-bounded: every block error <= absmax * step
    err = np.abs(wd - w).max()
    assert err < np.abs(w).max() * 0.25, err
    # exact at the codebook points
    w2 = wd.copy()
    tensors2 = quantize_bnb_4bit(w2, "w", nested=False)
    st2 = {
        "meta": json.loads(
            bytes(tensors2["w.quant_state.bitsandbytes__nf4"].tobytes())
        ),
        "absmax": tensors2["w.absmax"],
        "quant_map": tensors2["w.quant_map"],
    }
    np.testing.assert_allclose(
        dequant_bnb_4bit(tensors2["w"], st2), w2, rtol=1e-5, atol=1e-6
    )


@pytest.fixture(scope="module")
def bnb_pair_dirs(tmp_path_factory):
    """(bnb nf4 checkpoint dir, dense dir with the dequantized weights)."""
    import json

    st = _tiny_hf_state(seed=3)
    bnb, dense = {}, {}
    for name, w in st.items():
        if name.endswith(".weight") and (
            "self_attn" in name or "mlp." in name
        ):
            tensors = quantize_bnb_4bit(w, name)
            bnb.update(tensors)
            qst = {
                "meta": json.loads(bytes(
                    tensors[
                        name + ".quant_state.bitsandbytes__nf4"
                    ].tobytes()
                )),
            }
            for k in (
                "absmax", "quant_map", "nested_absmax", "nested_quant_map",
            ):
                if f"{name}.{k}" in tensors:
                    qst[k] = tensors[f"{name}.{k}"]
            dense[name] = dequant_bnb_4bit(tensors[name], qst)
        else:
            bnb[name] = w
            dense[name] = w
    db = str(tmp_path_factory.mktemp("bnb"))
    dd = str(tmp_path_factory.mktemp("dense"))
    _save_st(db, bnb)
    _save_st(dd, dense)
    _write_cfg(db)
    _write_cfg(dd)
    return db, dd


def _make_engine(model_dir, load_format="bitsandbytes"):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=model_dir, load_format=load_format, dtype="float32",
    )
    cfg = ModelConfig.from_model_path(model_dir, dtype="float32")
    return Engine(
        server_args=args, model_runner=ModelRunner(args, model_config=cfg)
    )


def test_bnb_checkpoint_matches_dequantized_dense(bnb_pair_dirs):
    db, dd = bnb_pair_dirs
    eb = _make_engine(db)
    ed = _make_engine(dd, load_format="safetensors")
    try:
        prompt = [5, 99, 203, 17, 42, 7, 310, 8]
        sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
        ob = eb.generate(input_ids=list(prompt), sampling_params=dict(sp))
        od = ed.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert ob["output_ids"] == od["output_ids"], (
            ob["output_ids"], od["output_ids"])
    finally:
        eb.shutdown()
        ed.shutdown()
