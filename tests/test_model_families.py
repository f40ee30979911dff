"""OLMo2 / Granite / Phi-3 families — token-exact greedy vs HF
transformers (config-delta subclasses on the shared Llama stack)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import make_server_args  # noqa: E402


def _engine(model_dir):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(
        model_path=str(model_dir), load_format="safetensors",
        dtype="float32",
    )
    cfg = ModelConfig.from_model_path(str(model_dir), dtype="float32")
    runner = ModelRunner(args, model_config=cfg)
    return Engine(server_args=args, model_runner=runner)


def _check_greedy(tmp_path, hf_model, extra_cfg, prompt, n_new=12):
    import safetensors.torch as st

    sd = {k: v.contiguous() for k, v in hf_model.state_dict().items()}
    # drop tied duplicates (safetensors refuses shared storage)
    if "lm_head.weight" in sd and extra_cfg.get("tie_word_embeddings"):
        del sd["lm_head.weight"]
    st.save_file(sd, f"{tmp_path}/model.safetensors")
    with open(f"{tmp_path}/config.json", "w") as f:
        json.dump(extra_cfg, f)
    eng = _engine(tmp_path)
    try:
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": n_new,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new,
                do_sample=False,
            )[0, len(prompt):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_olmo2_greedy_matches_hf(tmp_path):
    """OLMo2: post-block norms only + flat-projection qk RMSNorm.

    Teacher-forced comparison: this random tiny init has razor-thin
    top-2 ties (gap ~0.01 logits), where HF generate's KV-cache
    arithmetic disagrees with HF's own full-recompute forward — so
    compare our greedy tokens against the HF full-recompute argmax at
    every step instead (a real architecture bug diverges logits by
    orders of magnitude, not the 4th decimal)."""
    import json as _json

    import safetensors.torch as st

    from transformers import Olmo2Config, Olmo2ForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        eos_token_id=257,
    )
    torch.manual_seed(0)
    m = Olmo2ForCausalLM(Olmo2Config(**kw)).float().eval()
    sd = {k: v.contiguous() for k, v in m.state_dict().items()}
    st.save_file(sd, f"{tmp_path}/model.safetensors")
    with open(f"{tmp_path}/config.json", "w") as f:
        _json.dump(
            dict(kw, architectures=["Olmo2ForCausalLM"],
                 model_type="olmo2"), f,
        )
    eng = _engine(tmp_path)
    try:
        prompt = [(7 * i) % 500 + 1 for i in range(20)]
        out = eng.generate(
            input_ids=list(prompt),
            sampling_params={"temperature": 0.0, "max_new_tokens": 8,
                             "ignore_eos": True},
        )
        seq = list(prompt)
        with torch.no_grad():
            for step, tok in enumerate(out["output_ids"]):
                hl = m(torch.tensor([seq])).logits[0, -1]
                assert tok == int(hl.argmax()), (step, out["output_ids"])
                seq.append(tok)
    finally:
        eng.shutdown()


def test_granite_greedy_matches_hf(tmp_path):
    """Granite: embedding/attention/residual multipliers + logit scale."""
    from transformers import GraniteConfig, GraniteForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True,
        embedding_multiplier=6.0, attention_multiplier=0.11,
        residual_multiplier=0.5, logits_scaling=3.0,
        attention_bias=False, mlp_bias=False,
        eos_token_id=257,
    )
    torch.manual_seed(1)
    m = GraniteForCausalLM(GraniteConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["GraniteForCausalLM"], model_type="granite"
    )
    _check_greedy(tmp_path, m, cfg, [(5 * i) % 500 + 1 for i in range(18)])


def test_phi3_longrope_greedy_matches_hf(tmp_path):
    """Phi-3: fused qkv/gate_up checkpoint tensors + longrope su-scaling
    (long factors + the sqrt(1+ln(scale)/ln(orig)) attention factor —
    prompt exceeds original_max so HF is on the long branch too)."""
    from transformers import Phi3Config, Phi3ForCausalLM

    rng = np.random.RandomState(3)
    half = 8  # head_dim 16 → 8 rotary freqs
    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512,
        original_max_position_embeddings=16,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, eos_token_id=257, pad_token_id=0,
        rope_scaling={
            "type": "longrope",
            "short_factor": (1.0 + rng.rand(half)).tolist(),
            "long_factor": (2.0 + rng.rand(half)).tolist(),
        },
    )
    torch.manual_seed(2)
    m = Phi3ForCausalLM(Phi3Config(**kw)).float().eval()
    cfg = dict(kw, architectures=["Phi3ForCausalLM"], model_type="phi3")
    # prompt longer than original_max → long factors from step 1
    _check_greedy(tmp_path, m, cfg, [(3 * i) % 500 + 1 for i in range(24)])


def test_cohere_greedy_matches_hf(tmp_path):
    """Cohere Command-R: parallel attn+mlp block, mean-centered
    LayerNorm, interleaved rotary pairs, logit_scale, tied embeds."""
    from transformers import CohereConfig, CohereForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, layer_norm_eps=1e-5,
        rope_theta=10000.0, logit_scale=0.25, use_qk_norm=False,
        tie_word_embeddings=True, eos_token_id=257, pad_token_id=0,
    )
    torch.manual_seed(4)
    m = CohereForCausalLM(CohereConfig(**kw)).float().eval()
    cfg = dict(kw, architectures=["CohereForCausalLM"], model_type="cohere")
    _check_greedy(tmp_path, m, cfg, [(9 * i) % 500 + 1 for i in range(18)])


def test_starcoder2_greedy_matches_hf(tmp_path):
    """StarCoder2: LayerNorm with bias, non-gated gelu MLP with bias,
    biased attention projections, tied embeddings."""
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, norm_epsilon=1e-5,
        rope_theta=10000.0, use_bias=True, tie_word_embeddings=True,
        eos_token_id=257, pad_token_id=0,
    )
    torch.manual_seed(5)
    m = Starcoder2ForCausalLM(Starcoder2Config(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["Starcoder2ForCausalLM"],
        model_type="starcoder2",
    )
    _check_greedy(tmp_path, m, cfg, [(11 * i) % 500 + 1 for i in range(18)])


def test_llama4_greedy_matches_hf(tmp_path):
    """Llama 4 (Scout geometry: all-MoE): NoPE layers with temperature
    tuning, qk L2 norm on rope layers, CHUNKED attention (negative
    per-layer window), interleaved-pair rotary, router-scaled expert
    INPUTS + shared expert."""
    from transformers import Llama4ForCausalLM as HFLlama4
    from transformers import Llama4TextConfig

    kw = dict(
        hidden_size=64, intermediate_size=96, intermediate_size_mlp=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, vocab_size=512, max_position_embeddings=512,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=1, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=4.0, attn_scale=0.1,
        attention_chunk_size=8,  # tiny → chunking bites within the prompt
        eos_token_id=257, pad_token_id=0,
    )
    torch.manual_seed(6)
    m = HFLlama4(Llama4TextConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["Llama4ForCausalLM"], model_type="llama4_text"
    )
    _check_greedy(tmp_path, m, cfg, [(13 * i) % 500 + 1 for i in range(24)])


def test_glm4_moe_greedy_matches_hf(tmp_path):
    """GLM-4.5-class MoE: GQA attention with qk norms + qkv bias +
    partial rotary, DeepSeek-style sigmoid/bias/group-limited routing,
    shared experts, and a first_k_dense_replace dense prefix riding the
    dense-prefix scan."""
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, moe_intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, vocab_size=512, max_position_embeddings=512,
        rms_norm_eps=1e-5, rope_theta=10000.0, partial_rotary_factor=0.5,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, n_group=2, topk_group=1,
        use_qk_norm=True, attention_bias=True,
        tie_word_embeddings=False, eos_token_id=257, pad_token_id=0,
    )
    torch.manual_seed(7)
    m = Glm4MoeForCausalLM(Glm4MoeConfig(**kw)).float().eval()
    # give the selection bias real values (init is zeros)
    with torch.no_grad():
        for layer in m.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.normal_(0, 0.5)
    cfg = dict(
        kw, architectures=["Glm4MoeForCausalLM"], model_type="glm4_moe"
    )
    _check_greedy(tmp_path, m, cfg, [(17 * i) % 500 + 1 for i in range(20)])


def test_smollm3_greedy_matches_hf(tmp_path):
    """SmolLM3: llama with NoPE layers (every 4th layer skips rotary)."""
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True,
        eos_token_id=257, pad_token_id=0,
    )
    torch.manual_seed(8)
    m = SmolLM3ForCausalLM(SmolLM3Config(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["SmolLM3ForCausalLM"], model_type="smollm3",
        no_rope_layers=list(m.config.no_rope_layers),
    )
    _check_greedy(tmp_path, m, cfg, [(19 * i) % 500 + 1 for i in range(20)])


def test_olmoe_greedy_matches_hf(tmp_path):
    """OLMoE: Mixtral-style MoE (softmax→top-8, norm_topk_prob=False in
    released configs) + OLMo2-style FULL-width qk RMSNorm + clip_qkv
    clamping (clip chosen small enough to actually bite on the
    RMS-normalized q/k)."""
    from transformers import OlmoeConfig, OlmoeForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=False,
        clip_qkv=0.8,
    )
    torch.manual_seed(2)
    m = OlmoeForCausalLM(OlmoeConfig(**kw)).float().eval()
    cfg = dict(kw, architectures=["OlmoeForCausalLM"], model_type="olmoe")
    _check_greedy(tmp_path, m, cfg, [(5 * i) % 500 + 1 for i in range(12)])


def test_granitemoe_greedy_matches_hf(tmp_path):
    """GraniteMoE: the four granite multipliers on a Mixtral-style MoE
    with FUSED stacked expert tensors (input_linear [E, 2I, H] splits
    into gate/up; output_linear transposes into [E, I, H]) and
    top-k-then-softmax gating."""
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        num_local_experts=8, num_experts_per_tok=2,
        embedding_multiplier=6.0, attention_multiplier=0.21,
        residual_multiplier=0.3, logits_scaling=4.0,
    )
    torch.manual_seed(3)
    m = GraniteMoeForCausalLM(GraniteMoeConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["GraniteMoeForCausalLM"], model_type="granitemoe",
    )
    _check_greedy(tmp_path, m, cfg, [(7 * i) % 500 + 1 for i in range(12)])


def test_dbrx_greedy_matches_hf(tmp_path):
    """DBRX: nested attn/ffn config, fused clamped Wqkv, bias-free
    LayerNorm, flat [E*I, H] expert slabs with w2 applied un-transposed,
    softmax→top-k→L1-normalized router."""
    from transformers import DbrxConfig, DbrxForCausalLM

    cfg_kw = dict(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=512, vocab_size=512,
        attn_config=dict(kv_n_heads=2, clip_qkv=0.15, rope_theta=10000.0),
        ffn_config=dict(ffn_hidden_size=96, moe_num_experts=8, moe_top_k=2),
    )
    torch.manual_seed(4)
    m = DbrxForCausalLM(DbrxConfig(**cfg_kw)).float().eval()
    cfg = dict(
        cfg_kw, architectures=["DbrxForCausalLM"], model_type="dbrx",
        eos_token_id=257, tie_word_embeddings=False,
    )
    _check_greedy(tmp_path, m, cfg, [(9 * i) % 500 + 1 for i in range(12)])


def test_gpt2_greedy_matches_hf(tmp_path):
    """GPT-2: learned absolute positions, Conv1D fused c_attn (weights
    stored [in, out] — no transpose), LayerNorm+bias, non-gated gelu_new
    MLP, tied embeddings."""
    from transformers import GPT2Config, GPT2LMHeadModel

    kw = dict(
        n_embd=64, n_layer=2, n_head=4, n_positions=512, vocab_size=512,
        eos_token_id=257, bos_token_id=256,
    )
    torch.manual_seed(5)
    m = GPT2LMHeadModel(GPT2Config(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["GPT2LMHeadModel"], model_type="gpt2",
        tie_word_embeddings=True,
    )
    _check_greedy(tmp_path, m, cfg, [(3 * i) % 500 + 1 for i in range(12)])


def test_gpt_bigcode_greedy_matches_hf(tmp_path):
    """GPT-BigCode: GPT-2 layout with nn.Linear projections and
    MULTI-QUERY attention (1 kv head)."""
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    kw = dict(
        n_embd=64, n_layer=2, n_head=4, n_positions=512, vocab_size=512,
        multi_query=True, activation_function="gelu_pytorch_tanh",
        eos_token_id=257, bos_token_id=256,
    )
    torch.manual_seed(6)
    m = GPTBigCodeForCausalLM(GPTBigCodeConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["GPTBigCodeForCausalLM"],
        model_type="gpt_bigcode", tie_word_embeddings=True,
    )
    _check_greedy(tmp_path, m, cfg, [(11 * i) % 500 + 1 for i in range(12)])


def test_opt_greedy_matches_hf(tmp_path):
    """OPT: learned positions with the fairseq +2 table offset, LN+bias,
    non-gated ReLU MLP, tied embeddings."""
    from transformers import OPTConfig, OPTForCausalLM

    kw = dict(
        hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, vocab_size=512,
        max_position_embeddings=512, word_embed_proj_dim=64,
        do_layer_norm_before=True, eos_token_id=257, bos_token_id=256,
        pad_token_id=0,
    )
    torch.manual_seed(7)
    m = OPTForCausalLM(OPTConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["OPTForCausalLM"], model_type="opt",
        tie_word_embeddings=True,
    )
    _check_greedy(tmp_path, m, cfg, [(13 * i) % 500 + 1 for i in range(12)])


def test_stablelm_greedy_matches_hf(tmp_path):
    """StableLM-2: LayerNorm+bias, partial rotary (factor 0.5), qkv
    biases via use_qkv_bias."""
    from transformers import StableLmConfig, StableLmForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, partial_rotary_factor=0.5,
        use_qkv_bias=True, rope_theta=10000.0, layer_norm_eps=1e-5,
        tie_word_embeddings=False, eos_token_id=257,
    )
    torch.manual_seed(8)
    m = StableLmForCausalLM(StableLmConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["StableLmForCausalLM"], model_type="stablelm",
    )
    _check_greedy(tmp_path, m, cfg, [(17 * i) % 500 + 1 for i in range(12)])


def test_arcee_greedy_matches_hf(tmp_path):
    """Arcee: non-gated ReLU-squared MLP on the llama trunk."""
    from transformers import ArceeConfig, ArceeForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        hidden_act="relu2",
    )
    torch.manual_seed(9)
    m = ArceeForCausalLM(ArceeConfig(**kw)).float().eval()
    cfg = dict(kw, architectures=["ArceeForCausalLM"], model_type="arcee")
    _check_greedy(tmp_path, m, cfg, [(19 * i) % 500 + 1 for i in range(12)])


def test_exaone4_greedy_matches_hf(tmp_path):
    """EXAONE 4.0 hybrid: OLMo2-style post-block norms + PER-HEAD qk
    RMSNorm; layers 1..3 sliding-window ROPE, layer 4 global NoPE
    (sliding_window_pattern=4), window small enough to bite on the
    prompt."""
    from transformers import Exaone4Config, Exaone4ForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        sliding_window=8, sliding_window_pattern=4,
    )
    torch.manual_seed(10)
    m = Exaone4ForCausalLM(Exaone4Config(**kw)).float().eval()
    cfg = dict(kw, architectures=["Exaone4ForCausalLM"], model_type="exaone4")
    _check_greedy(tmp_path, m, cfg, [(23 * i) % 500 + 1 for i in range(20)])


def test_persimmon_greedy_matches_hf(tmp_path):
    """Persimmon: head-interleaved fused qkv, per-head qk LayerNorm WITH
    bias, partial rotary 0.5, biased ReLU-squared MLP, LN+bias."""
    from transformers import PersimmonConfig, PersimmonForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, vocab_size=512,
        max_position_embeddings=512, partial_rotary_factor=0.5,
        rope_theta=25000.0, layer_norm_eps=1e-5, qk_layernorm=True,
        hidden_act="relu2", tie_word_embeddings=False, eos_token_id=257,
    )
    torch.manual_seed(11)
    m = PersimmonForCausalLM(PersimmonConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["PersimmonForCausalLM"], model_type="persimmon",
    )
    _check_greedy(tmp_path, m, cfg, [(29 * i) % 500 + 1 for i in range(12)])


def test_apertus_greedy_matches_hf(tmp_path):
    """Apertus: non-gated xIELU MLP with per-layer learned scalars +
    per-head qk RMSNorm + renamed pre-norms."""
    from transformers import ApertusConfig, ApertusForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        hidden_act="xielu",
    )
    torch.manual_seed(12)
    m = ApertusForCausalLM(ApertusConfig(**kw)).float().eval()
    # randomize the learned activation scalars so the test bites
    with torch.no_grad():
        for layer in m.model.layers:
            layer.mlp.act_fn.alpha_p.add_(0.3)
            layer.mlp.act_fn.alpha_n.add_(-0.2)
    cfg = dict(kw, architectures=["ApertusForCausalLM"], model_type="apertus")
    _check_greedy(tmp_path, m, cfg, [(31 * i) % 500 + 1 for i in range(12)])


def test_nemotron_greedy_matches_hf(tmp_path):
    """Nemotron: LayerNorm1P (weight stored centered at zero, computed
    as weight+1), non-gated ReLU-squared MLP, partial rotary 0.5."""
    from transformers import NemotronConfig, NemotronForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, norm_eps=1e-5,
        rope_theta=10000.0, partial_rotary_factor=0.5,
        tie_word_embeddings=False, eos_token_id=257, hidden_act="relu2",
    )
    torch.manual_seed(13)
    m = NemotronForCausalLM(NemotronConfig(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["NemotronForCausalLM"], model_type="nemotron",
    )
    _check_greedy(tmp_path, m, cfg, [(37 * i) % 500 + 1 for i in range(12)])


def test_hunyuan_moe_greedy_matches_hf(tmp_path):
    """HunYuan MoE v1: softmax top-k routing + ALWAYS-ON shared MLP +
    per-head q/k RMSNorm (query_layernorm/key_layernorm names)."""
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=512, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        num_experts=4, moe_topk=2, attention_bias=False,
    )
    torch.manual_seed(14)
    m = HunYuanMoEV1ForCausalLM(HunYuanMoEV1Config(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["HunYuanMoEV1ForCausalLM"],
        model_type="hunyuan_v1_moe",
    )
    _check_greedy(tmp_path, m, cfg, [(41 * i) % 500 + 1 for i in range(12)])


def test_ernie45_moe_greedy_matches_hf(tmp_path):
    """ERNIE 4.5 MoE: dense prefix (moe_layer_start_index), shared
    experts, softmax routing with a SELECTION-ONLY e_score correction
    bias (randomized so it changes the routing)."""
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, moe_intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=512, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, eos_token_id=257,
        pad_token_id=0, moe_num_experts=4, moe_k=2,
        moe_num_shared_experts=1, moe_layer_start_index=1, use_bias=False,
    )
    torch.manual_seed(15)
    m = Ernie4_5_MoeForCausalLM(Ernie4_5_MoeConfig(**kw)).float().eval()
    with torch.no_grad():
        for layer in m.model.layers[1:]:
            layer.mlp.moe_statics.e_score_correction_bias.normal_(0, 0.3)
    cfg = dict(
        kw, architectures=["Ernie4_5_MoeForCausalLM"],
        model_type="ernie4_5_moe",
    )
    _check_greedy(tmp_path, m, cfg, [(43 * i) % 500 + 1 for i in range(12)])


def test_ernie45_dense_greedy_matches_hf(tmp_path):
    """ERNIE 4.5 dense: llama stack with use_bias qkv biases."""
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, eos_token_id=257,
        pad_token_id=0, use_bias=False, head_dim=16,
    )
    torch.manual_seed(16)
    m = Ernie4_5ForCausalLM(Ernie4_5Config(**kw)).float().eval()
    cfg = dict(
        kw, architectures=["Ernie4_5ForCausalLM"], model_type="ernie4_5",
    )
    _check_greedy(tmp_path, m, cfg, [(47 * i) % 500 + 1 for i in range(12)])


def test_granitemoe_shared_greedy_matches_hf(tmp_path):
    """GraniteMoeShared: GraniteMoE plus an always-on shared MLP stored
    fused (input_linear gate;up rows, output_linear)."""
    from transformers import (
        GraniteMoeSharedConfig,
        GraniteMoeSharedForCausalLM,
    )

    kw = dict(
        hidden_size=64, intermediate_size=96, shared_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=512, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=3.0, attention_multiplier=0.2,
        residual_multiplier=0.4, logits_scaling=2.0,
    )
    torch.manual_seed(17)
    m = GraniteMoeSharedForCausalLM(
        GraniteMoeSharedConfig(**kw)
    ).float().eval()
    cfg = dict(
        kw, architectures=["GraniteMoeSharedForCausalLM"],
        model_type="granitemoeshared",
    )
    _check_greedy(tmp_path, m, cfg, [(53 * i) % 500 + 1 for i in range(12)])


def test_phimoe_greedy_matches_hf(tmp_path):
    """Phi-3.5-MoE: SPARSEMIXER top-2 routing (two greedy rounds over
    near-max-masked softmaxes, no renormalization) + LayerNorm-with-bias
    + lm_head bias, on the Mixtral expert layout."""
    from transformers import PhimoeConfig, PhimoeForCausalLM

    kw = dict(
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
        max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        num_local_experts=8, num_experts_per_tok=2,
        router_jitter_noise=0.05, attention_bias=True, lm_head_bias=True,
    )
    torch.manual_seed(18)
    m = PhimoeForCausalLM(PhimoeConfig(**kw)).float().eval()
    cfg = dict(kw, architectures=["PhimoeForCausalLM"], model_type="phimoe")
    _check_greedy(tmp_path, m, cfg, [(59 * i) % 500 + 1 for i in range(12)])


def test_granitemoe_hybrid_greedy_matches_hf(tmp_path):
    """Granite 4.0 hybrid: Mamba2 + NoPE attention layers, GraniteMoE
    fused experts + always-on shared MLP per layer, granite multipliers
    — token-exact through the hybrid {kv, conv, ssm} cache."""
    from transformers import (
        GraniteMoeHybridConfig,
        GraniteMoeHybridForCausalLM,
    )

    kw = dict(
        hidden_size=64, intermediate_size=96, shared_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=512, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=257,
        pad_token_id=0, num_local_experts=4, num_experts_per_tok=2,
        layer_types=["mamba", "attention"],
        mamba_n_heads=4, mamba_d_head=32, mamba_d_state=16,
        mamba_n_groups=1, mamba_expand=2, mamba_d_conv=4,
        mamba_chunk_size=16,
        embedding_multiplier=4.0, attention_multiplier=0.2,
        residual_multiplier=0.4, logits_scaling=3.0,
    )
    torch.manual_seed(19)
    m = GraniteMoeHybridForCausalLM(
        GraniteMoeHybridConfig(**kw)
    ).float().eval()
    cfg = dict(
        kw, architectures=["GraniteMoeHybridForCausalLM"],
        model_type="granitemoehybrid",
    )
    _check_greedy(
        tmp_path, m, cfg, [(61 * i) % 500 + 1 for i in range(20)],
    )
