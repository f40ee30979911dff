"""EAGLE speculative decoding: exactness + rejection-sampling parity.

The self-consistency harness builds a 1-layer target and a draft whose
fc picks the token embedding and whose layer weights ARE the target's
layer — the draft then reproduces the target's computation exactly, so
greedy chain acceptance must be k/k every round and outputs must match
the non-speculative engine token-for-token.
"""

import numpy as np
import pytest

from tests.conftest import TINY_HF_CONFIG, make_server_args

ONE_LAYER_HF = dict(TINY_HF_CONFIG, num_hidden_layers=1)


def _make_engine(spec=None, seed_cfg=ONE_LAYER_HF, **extra):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        speculative_algorithm=spec,
        speculative_num_draft_tokens=4,
        **extra,
    )
    cfg = ModelConfig.from_hf_dict(
        seed_cfg, model_path="test://tiny", dtype="float32"
    )
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def _self_consistent_draft(runner):
    """Draft params replicating the 1-layer target exactly."""
    import jax.numpy as jnp

    p = runner.params
    H = runner.model_config.hidden_size
    lay = p["layers"]
    fc = np.zeros((2 * H, H), np.float32)
    fc[:H] = np.eye(H)  # pick the embedding half; ignore the feature half
    if "qkv_proj" in lay:  # fused execution layout (models/llama.py)
        m = runner.model
        QO, KO = m.hq * m.hd, m.hkv * m.hd
        qkv0 = lay["qkv_proj"][0]
        q0 = qkv0[:, :QO]
        k0 = qkv0[:, QO : QO + KO]
        v0 = qkv0[:, QO + KO :]
    else:
        q0, k0, v0 = lay["q_proj"][0], lay["k_proj"][0], lay["v_proj"][0]
    d = {
        "fc": jnp.asarray(fc),
        "fc_bias": jnp.zeros((H,), jnp.float32),
        "input_ln": lay["input_ln"][0],
        "q_proj": q0,
        "k_proj": k0,
        "v_proj": v0,
        "o_proj": lay["o_proj"][0],
        "post_ln": lay["post_ln"][0],
        "gate_proj": lay["gate_proj"][0],
        "up_proj": lay["up_proj"][0],
        "down_proj": lay["down_proj"][0],
    }
    return d


def test_eagle_self_consistent_draft_accepts_everything():
    eagle = _make_engine("EAGLE")
    plain = _make_engine(None)
    try:
        runner = eagle.scheduler.runner
        runner.eagle_params = _self_consistent_draft(runner)
        prompt = [5, 99, 203, 17, 42, 7, 310, 8]
        sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}
        oe = eagle.generate(input_ids=prompt, sampling_params=sp)
        op = plain.generate(input_ids=prompt, sampling_params=sp)
        assert oe["output_ids"] == op["output_ids"], (
            oe["output_ids"], op["output_ids"])
        sched = eagle.scheduler
        assert sched.num_spec_drafted > 0
        # perfect draft → every draft accepted
        assert sched.num_spec_accepted == sched.num_spec_drafted, (
            sched.num_spec_accepted, sched.num_spec_drafted)
    finally:
        eagle.shutdown()
        plain.shutdown()


def test_eagle_random_draft_still_exact_greedy():
    """A garbage draft must not change greedy outputs (rejection keeps
    target distribution; greedy = argmax-prefix acceptance)."""
    eagle = _make_engine("EAGLE")
    plain = _make_engine(None)
    try:
        prompt = [3, 1, 4, 1, 5, 9, 2, 6]
        sp = {"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True}
        oe = eagle.generate(input_ids=prompt, sampling_params=sp)
        op = plain.generate(input_ids=prompt, sampling_params=sp)
        assert oe["output_ids"] == op["output_ids"]
    finally:
        eagle.shutdown()
        plain.shutdown()


def test_eagle_batch_mixed_lengths():
    eagle = _make_engine("EAGLE")
    try:
        runner = eagle.scheduler.runner
        runner.eagle_params = _self_consistent_draft(runner)
        prompts = [[5, 9, 9], [1, 2, 3, 4, 5, 6], [7] * 10]
        outs = eagle.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert all(len(o["output_ids"]) == 12 for o in outs)
    finally:
        eagle.shutdown()


def test_chain_rejection_sample_distribution():
    """Spec sampling must preserve the target distribution p exactly
    regardless of the draft q (reference reject_sampling.py contract)."""
    import jax
    import jax.numpy as jnp

    from sglang_tpu.speculative.eagle import chain_rejection_sample

    rng = np.random.RandomState(0)
    V, K, N = 8, 3, 30000
    p_logits = jnp.asarray(rng.randn(1, K + 1, V).astype(np.float32) * 1.5)
    q_logits = jnp.asarray(rng.randn(1, K, V).astype(np.float32) * 1.5)
    q0 = np.asarray(jax.nn.softmax(q_logits[0, 0]))
    p0 = np.asarray(jax.nn.softmax(p_logits[0, 0]))
    temp = jnp.ones((1,), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def run(key):
        d = jax.random.categorical(key, q_logits[:, 0], axis=-1)
        drafts = jnp.stack(
            [d, jnp.zeros_like(d), jnp.zeros_like(d)], axis=1
        ).astype(jnp.int32)
        toks, a, _ = chain_rejection_sample(
            p_logits, q_logits, drafts, temp, jax.random.fold_in(key, 1)
        )
        return toks[0, 0]

    keys = jax.random.split(jax.random.PRNGKey(42), N)
    first = np.asarray(jax.vmap(run)(keys))
    freq = np.bincount(first, minlength=V) / N
    # total-variation distance to p must be small (sampling noise ~1/sqrt(N))
    tv = 0.5 * np.abs(freq - p0).sum()
    assert tv < 0.02, (tv, freq, p0)


def test_chain_rejection_truncated_distribution():
    """With top-p/top-k active, the emitted-token distribution must match
    the TRUNCATED+renormalized target — the same distribution the normal
    decode path samples from (ADVICE r2: nucleus params were ignored)."""
    import jax
    import jax.numpy as jnp

    from sglang_tpu.speculative.eagle import chain_rejection_sample

    rng = np.random.RandomState(3)
    V, K, N = 8, 2, 30000
    p_logits = jnp.asarray(rng.randn(1, K + 1, V).astype(np.float32) * 1.5)
    q_logits = jnp.asarray(rng.randn(1, K, V).astype(np.float32) * 1.5)
    temp = jnp.ones((1,), jnp.float32)
    top_p = jnp.asarray([0.7], jnp.float32)
    top_k = jnp.asarray([5], jnp.int32)
    min_p = jnp.asarray([0.0], jnp.float32)

    # expected truncated target at position 0 (same rules as sampler)
    p0 = np.asarray(jax.nn.softmax(p_logits[0, 0]))
    order = np.argsort(-p0)
    sorted_p = p0[order]
    keep = np.zeros(V, bool)
    cum = np.cumsum(sorted_p)
    for r in range(V):
        if r < 5 and (cum[r] - sorted_p[r]) < 0.7:
            keep[r] = True
    keep[0] = True
    kept = np.where(keep, sorted_p, 0.0)
    expect = np.zeros(V)
    expect[order] = kept / kept.sum()

    def run(key):
        d = jax.random.categorical(key, q_logits[:, 0], axis=-1)
        drafts = jnp.stack([d, jnp.zeros_like(d)], axis=1).astype(jnp.int32)
        toks, a, _ = chain_rejection_sample(
            p_logits, q_logits, drafts, temp, jax.random.fold_in(key, 1),
            trunc=(top_p, top_k, min_p),
        )
        return toks[0, 0]

    keys = jax.random.split(jax.random.PRNGKey(7), N)
    first = np.asarray(jax.vmap(run)(keys))
    freq = np.bincount(first, minlength=V) / N
    tv = 0.5 * np.abs(freq - expect).sum()
    assert tv < 0.02, (tv, freq, expect)
    # tokens outside the truncated set must NEVER be emitted
    assert freq[expect == 0].sum() == 0.0, freq


def test_chain_rejection_greedy_prefix():
    import jax
    import jax.numpy as jnp

    from sglang_tpu.speculative.eagle import chain_rejection_sample

    V, K = 16, 4
    rng = np.random.RandomState(1)
    p_logits = jnp.asarray(rng.randn(2, K + 1, V).astype(np.float32))
    q_logits = jnp.asarray(rng.randn(2, K, V).astype(np.float32))
    am = np.asarray(jnp.argmax(p_logits, axis=-1))
    # row 0: drafts match argmax for first 2, then diverge
    drafts = np.zeros((2, K), np.int32)
    drafts[0, :2] = am[0, :2]
    drafts[0, 2] = (am[0, 2] + 1) % V
    drafts[1, 0] = (am[1, 0] + 1) % V
    toks, a, lp = chain_rejection_sample(
        p_logits, q_logits, jnp.asarray(drafts),
        jnp.zeros((2,), jnp.float32), jax.random.PRNGKey(0),
    )
    a = np.asarray(a)
    toks = np.asarray(toks)
    assert a[0] == 2 and a[1] == 0
    np.testing.assert_array_equal(toks[0, :3], am[0, :3])
    assert toks[1, 0] == am[1, 0]


def test_chain_rejection_bootstrap_rows():
    import jax
    import jax.numpy as jnp

    from sglang_tpu.speculative.eagle import chain_rejection_sample

    V, K = 8, 2
    rng = np.random.RandomState(2)
    p_logits = jnp.asarray(rng.randn(1, K + 1, V).astype(np.float32))
    q_logits = jnp.asarray(np.zeros((1, K, V), np.float32))
    drafts = jnp.asarray(np.zeros((1, K), np.int32))
    # bootstrap row with temp>0: first token ~ p_0 exactly
    N = 20000
    keys = jax.random.split(jax.random.PRNGKey(7), N)

    def run(key):
        t, a, _ = chain_rejection_sample(
            p_logits, q_logits, drafts, jnp.ones((1,), jnp.float32), key,
            bootstrap=jnp.ones((1,), bool),
        )
        return t[0, 0], a[0]

    toks, accepts = jax.vmap(run)(keys)
    assert int(np.max(np.asarray(accepts))) == 0
    p0 = np.asarray(jax.nn.softmax(p_logits[0, 0]))
    freq = np.bincount(np.asarray(toks), minlength=V) / N
    tv = 0.5 * np.abs(freq - p0).sum()
    assert tv < 0.02, tv


# ------------------------------------------------------------- tree (top-b)
def test_eagle_tree_self_consistent_exact():
    """topk=2 tree round: perfect draft → branch 0 always wins with k/k
    accepts; outputs match the plain engine token-for-token."""
    eagle = _make_engine("EAGLE", speculative_eagle_topk=2)
    plain = _make_engine(None)
    try:
        runner = eagle.scheduler.runner
        runner.eagle_params = _self_consistent_draft(runner)
        prompt = [5, 99, 203, 17, 42, 7, 310, 8]
        sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}
        oe = eagle.generate(input_ids=prompt, sampling_params=sp)
        op = plain.generate(input_ids=prompt, sampling_params=sp)
        assert oe["output_ids"] == op["output_ids"], (
            oe["output_ids"], op["output_ids"])
        sched = eagle.scheduler
        assert sched.num_spec_drafted > 0
        assert sched.num_spec_accepted == sched.num_spec_drafted
    finally:
        eagle.shutdown()
        plain.shutdown()


def test_eagle_tree_random_draft_still_exact_greedy():
    """Garbage draft, topk=3: greedy outputs unchanged (argmax-prefix
    acceptance per branch; winner adoption must not corrupt KV)."""
    eagle = _make_engine("EAGLE", speculative_eagle_topk=3)
    plain = _make_engine(None)
    try:
        prompt = [3, 1, 4, 1, 5, 9, 2, 6]
        sp = {"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True}
        oe = eagle.generate(input_ids=prompt, sampling_params=sp)
        op = plain.generate(input_ids=prompt, sampling_params=sp)
        assert oe["output_ids"] == op["output_ids"]
    finally:
        eagle.shutdown()
        plain.shutdown()


def test_eagle_tree_batch_and_sampled_fallback():
    """Mixed batch runs; sampled requests go through the SAMPLED tree
    round (tree rejection sampling) and still serve."""
    eagle = _make_engine("EAGLE", speculative_eagle_topk=2)
    try:
        runner = eagle.scheduler.runner
        runner.eagle_params = _self_consistent_draft(runner)
        prompts = [[5, 9, 9], [1, 2, 3, 4, 5, 6], [7] * 10]
        outs = eagle.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert all(len(o["output_ids"]) == 12 for o in outs)
        out = eagle.generate(
            input_ids=[5, 6, 7, 8],
            sampling_params={"max_new_tokens": 8, "temperature": 0.7,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 8
    finally:
        eagle.shutdown()


def test_tree_rejection_sample_distribution():
    """Sampled TREE verify must preserve the target distribution exactly:
    TB i.i.d. root candidates from q0, recursive rejection + residual
    (reference reject_sampling.py tree sampling; SpecInfer scheme)."""
    import jax
    import jax.numpy as jnp

    from sglang_tpu.speculative.eagle import tree_rejection_sample

    rng = np.random.RandomState(3)
    V, K, TB, N = 8, 3, 2, 30000
    root_logits = jnp.asarray(rng.randn(1, V).astype(np.float32) * 1.5)
    q0_logits = jnp.asarray(rng.randn(1, V).astype(np.float32) * 1.5)
    # branch-row target logits: position 0 shared (root), rest arbitrary
    p_logits = jnp.asarray(
        rng.randn(1, TB, K + 1, V).astype(np.float32) * 1.5
    )
    p_logits = p_logits.at[:, :, 0].set(root_logits[:, None, :])
    qc = jnp.asarray(rng.randn(1, TB, K, V).astype(np.float32) * 1.5)
    temp = jnp.ones((1,), jnp.float32)
    p0 = np.asarray(jax.nn.softmax(root_logits[0]))

    def run(key):
        d0 = jax.random.categorical(
            key, q0_logits[:, None, :], axis=-1, shape=(1, TB)
        ).astype(jnp.int32)
        chain = jax.random.randint(
            jax.random.fold_in(key, 2), (1, TB, K - 1), 0, V, jnp.int32
        )
        drafts = jnp.concatenate([d0[..., None], chain], axis=2)
        toks, a, w, _ = tree_rejection_sample(
            p_logits, q0_logits, qc, drafts, temp,
            jax.random.fold_in(key, 1),
        )
        return toks[0, 0]

    keys = jax.random.split(jax.random.PRNGKey(11), N)
    first = np.asarray(jax.vmap(run)(keys))
    freq = np.bincount(first, minlength=V) / N
    tv = 0.5 * np.abs(freq - p0).sum()
    assert tv < 0.02, (tv, freq, p0)


def test_eagle_tree_sampled_serving():
    """Sampled requests now run the TREE round (no chain fallback): the
    sampled tree draft/verify programs engage and serving stays correct."""
    eagle = _make_engine("EAGLE", speculative_eagle_topk=2)
    try:
        runner = eagle.scheduler.runner
        runner.eagle_params = _self_consistent_draft(runner)
        outs = eagle.generate(
            input_ids=[[5, 6, 7, 8], [9, 10, 11]],
            sampling_params={"max_new_tokens": 10, "temperature": 0.8,
                             "top_p": 0.9, "ignore_eos": True},
        )
        assert all(len(o["output_ids"]) == 10 for o in outs)
        assert any(
            k[-2] or k[-1]  # a (sampled=True, use_trunc) tree verify ran
            for k in runner._eagle_tree_verify_fns
        ), list(runner._eagle_tree_verify_fns)
        # greedy after sampled on the same engine: the argmax-prefix
        # path still serves exactly
        out = eagle.generate(
            input_ids=[1, 2, 3, 4],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 8
    finally:
        eagle.shutdown()


def test_nextn_mtp_draft_checkpoint_served(tmp_path):
    """A NextN/MTP-geometry draft checkpoint (eh_proj + enorm/hnorm +
    shared_head.norm embedded as decoder layer N — reference
    models/llama_nextn.py / deepseek MTP module) loads into the draft
    schema and serves; greedy output stays token-exact vs plain decode
    regardless of draft quality."""
    import safetensors.numpy as stnp

    from tests.conftest import TINY_HF_CONFIG

    H = TINY_HF_CONFIG["hidden_size"]
    hq = TINY_HF_CONFIG["num_attention_heads"]
    hkv = TINY_HF_CONFIG["num_key_value_heads"]
    d = TINY_HF_CONFIG["head_dim"]
    I = TINY_HF_CONFIG["intermediate_size"]
    rng = np.random.RandomState(5)

    def w(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    pre = "model.layers.2."  # MTP layer appended at index 2
    sd = {
        pre + "eh_proj.weight": w(H, 2 * H),
        pre + "enorm.weight": np.ones(H, np.float32),
        pre + "hnorm.weight": np.ones(H, np.float32),
        pre + "shared_head.norm.weight": np.ones(H, np.float32),
        pre + "input_layernorm.weight": np.ones(H, np.float32),
        pre + "self_attn.q_proj.weight": w(hq * d, H),
        pre + "self_attn.k_proj.weight": w(hkv * d, H),
        pre + "self_attn.v_proj.weight": w(hkv * d, H),
        pre + "self_attn.o_proj.weight": w(H, hq * d),
        pre + "post_attention_layernorm.weight": np.ones(H, np.float32),
        pre + "mlp.gate_proj.weight": w(I, H),
        pre + "mlp.up_proj.weight": w(I, H),
        pre + "mlp.down_proj.weight": w(H, I),
    }
    stnp.save_file(sd, str(tmp_path / "model.safetensors"))

    eagle = _make_engine(
        "EAGLE", speculative_draft_model_path=str(tmp_path)
    )
    plain = _make_engine(None)
    try:
        runner = eagle.scheduler.runner
        assert runner.eagle.has_eh_norms
        assert runner.eagle.has_head_norm
        prompt = [3, 1, 4, 1, 5, 9, 2, 6]
        sp = {"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True}
        oe = eagle.generate(input_ids=prompt, sampling_params=sp)
        op = plain.generate(input_ids=prompt, sampling_params=sp)
        assert oe["output_ids"] == op["output_ids"]
    finally:
        eagle.shutdown()
        plain.shutdown()


# ------------------------------------------------------------- EAGLE3
def _make_eagle3_draft_dir(tmp_path, H=64, I=128, hq=4, hkv=2, d=16,
                           Vd=256, Vt=512):
    """Random EAGLE3-geometry draft checkpoint (fc 3H→H, 2H-in qkv,
    own draft-vocab head + d2t map, midlayer.* names)."""
    import json

    from safetensors.numpy import save_file

    rng = np.random.RandomState(77)

    def r(*s, scale=None):
        return (rng.randn(*s) / (scale or np.sqrt(s[-1]))).astype(
            np.float32
        )

    st = {
        "fc.weight": r(H, 3 * H),
        "d2t": np.arange(Vd, dtype=np.int64),  # draft i → target 2i
        "norm.weight": np.ones(H, np.float32),
        "lm_head.weight": r(Vd, H),
        "midlayer.input_layernorm.weight": np.ones(H, np.float32),
        "midlayer.hidden_norm.weight": np.ones(H, np.float32),
        "midlayer.self_attn.q_proj.weight": r(hq * d, 2 * H),
        "midlayer.self_attn.k_proj.weight": r(hkv * d, 2 * H),
        "midlayer.self_attn.v_proj.weight": r(hkv * d, 2 * H),
        "midlayer.self_attn.o_proj.weight": r(H, hq * d),
        "midlayer.post_attention_layernorm.weight": np.ones(H, np.float32),
        "midlayer.mlp.gate_proj.weight": r(I, H),
        "midlayer.mlp.up_proj.weight": r(I, H),
        "midlayer.mlp.down_proj.weight": r(H, I),
    }
    d_dir = tmp_path / "eagle3_draft"
    d_dir.mkdir()
    save_file(st, str(d_dir / "model.safetensors"))
    with open(d_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": Vt, "draft_vocab_size": Vd,
            "eagle_config": {
                "eagle_aux_hidden_state_layer_ids": [1, 2, 3],
            },
        }, f)
    return str(d_dir)


def test_eagle3_greedy_exact_and_serves(tmp_path):
    """EAGLE3 (reference llama_eagle3.py): target aux capture at 3
    layers, fc-fused draft input, draft-vocab head mapped by d2t —
    greedy outputs must equal the plain engine token-for-token (the
    rejection contract holds for ANY draft), and drafting must engage."""
    four = dict(TINY_HF_CONFIG, num_hidden_layers=4)
    draft_dir = _make_eagle3_draft_dir(tmp_path)
    eagle = _make_engine(
        "EAGLE3", seed_cfg=four,
        speculative_draft_model_path=draft_dir,
    )
    plain = _make_engine(None, seed_cfg=four)
    try:
        runner = eagle.scheduler.runner
        assert runner.eagle.is_eagle3
        assert runner.eagle_feats.shape[-1] == 3 * 64
        prompt = [5, 99, 203, 17, 42, 7, 310, 8]
        sp = {"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True}
        oe = eagle.generate(input_ids=list(prompt), sampling_params=dict(sp))
        op = plain.generate(input_ids=list(prompt), sampling_params=dict(sp))
        assert oe["output_ids"] == op["output_ids"], (
            oe["output_ids"], op["output_ids"])
        assert eagle.scheduler.num_spec_drafted > 0
        # sampled path also serves through the same draft
        os_ = eagle.generate(
            input_ids=list(prompt),
            sampling_params={"max_new_tokens": 8, "temperature": 0.8,
                             "ignore_eos": True},
        )
        assert len(os_["output_ids"]) == 8
    finally:
        eagle.shutdown()
        plain.shutdown()
