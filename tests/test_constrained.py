"""Constrained decoding: regex→DFA engine, JSON-schema compiler, token FSM,
and engine-level structured output."""

import json

import numpy as np
import pytest

from sglang_tpu.constrained.json_schema import build_regex_from_schema
from sglang_tpu.constrained.regex_engine import compile_regex
from sglang_tpu.constrained.token_fsm import (
    GrammarState,
    TokenVocab,
    compile_regex_fsm,
    pack_vocab_masks,
)
from sglang_tpu.tokenizer_utils import get_tokenizer


# ----------------------------------------------------------------- regex DFA
@pytest.mark.parametrize(
    "pattern,accept,reject",
    [
        (r"abc", ["abc"], ["ab", "abcd", "abd"]),
        (r"a+b*", ["a", "aab", "abbbb"], ["", "b", "ba"]),
        (r"(foo|bar)+", ["foo", "barfoo"], ["fo", "ba", "foobaz"]),
        (r"[a-c]{2,3}", ["ab", "abc", "ccc"], ["a", "abcd", "ad"]),
        (r"-?(0|[1-9][0-9]*)", ["0", "-7", "123"], ["00", "-", "01"]),
        (r"a.c", ["abc", "axc"], ["ac", "a\nc"]),
        (r"\d{3}-\d{4}", ["555-1234"], ["5551234", "55-1234"]),
        (r"(?:yes|no)?", ["", "yes", "no"], ["y", "yesno"]),
        (r"[^0-9]+", ["abc!", "x y"], ["a1", ""]),
        (r"héllo", ["héllo"], ["hello"]),  # utf-8 multibyte literal
    ],
)
def test_regex_dfa(pattern, accept, reject):
    dfa = compile_regex(pattern)
    for s in accept:
        assert dfa.matches(s.encode()), (pattern, s)
    for s in reject:
        assert not dfa.matches(s.encode()), (pattern, s)


# ---------------------------------------------------------------- JSON schema
@pytest.mark.parametrize(
    "schema,good,bad",
    [
        (
            {"type": "object", "properties": {"a": {"type": "integer"}},
             "required": ["a"]},
            ['{"a": 5}', '{"a": -12}'],
            ['{"a": "x"}', '{}', '{"a": 01}', '{ "a" : 0 }'],
        ),
        (
            {"type": "object",
             "properties": {"name": {"type": "string"},
                            "ok": {"type": "boolean"}},
             "required": ["name", "ok"]},
            ['{"name": "bob", "ok": true}', '{"name": "", "ok": false}'],
            ['{"name": "bob"}', '{"ok": true, "name": "bob"}',
             '{"name":"bob","ok":true}'],
        ),
        (
            {"type": "array", "items": {"type": "integer"}, "minItems": 1},
            ["[1]", "[1, 2, 3]"],
            ["[]", '["a"]', "[1,2]"],
        ),
        (
            {"enum": ["red", "green", 7]},
            ['"red"', '"green"', "7"],
            ['"blue"', "8"],
        ),
        (
            {"anyOf": [{"type": "integer"}, {"type": "null"}]},
            ["42", "null"],
            ['"42"', "nul"],
        ),
        (
            {"type": "number"},
            ["1.5", "-0.25", "2e10", "0"],
            ["--1", "1.", ".5"],
        ),
    ],
)
def test_json_schema_regex(schema, good, bad):
    pattern = build_regex_from_schema(schema)
    dfa = compile_regex(pattern)
    for s in good:
        assert dfa.matches(s.encode()), (pattern[:80], s)
    for s in bad:
        assert not dfa.matches(s.encode()), (pattern[:80], s)


def test_json_schema_refs():
    schema = {
        "type": "object",
        "properties": {"color": {"$ref": "#/$defs/color"}},
        "required": ["color"],
        "$defs": {"color": {"enum": ["r", "g", "b"]}},
    }
    dfa = compile_regex(build_regex_from_schema(schema))
    assert dfa.matches(b'{"color": "g"}')
    assert not dfa.matches(b'{"color": "x"}')


# ----------------------------------------------------------------- token FSM
def test_token_fsm_masks_and_walk():
    tok = get_tokenizer("test:byte")
    fsm = compile_regex_fsm(r"(ab|cd)+", tok)
    st = GrammarState(fsm)
    mask = st.fill_vocab_mask()
    # only 'a' (97) and 'c' (99) may start
    allowed = set(np.nonzero(mask)[0].tolist())
    assert allowed == {ord("a"), ord("c")}
    assert st.accept_token(ord("a"))
    allowed = set(np.nonzero(st.fill_vocab_mask())[0].tolist())
    assert allowed == {ord("b")}
    assert st.accept_token(ord("b"))
    # accept state: 'a', 'c', or EOS
    allowed = set(np.nonzero(st.fill_vocab_mask())[0].tolist())
    assert allowed == {ord("a"), ord("c"), tok.eos_token_id}
    assert st.accept_token(tok.eos_token_id)
    assert st.is_terminated


def test_pack_vocab_masks_bit_layout():
    V = 70
    m = np.zeros(V, bool)
    m[0] = m[33] = m[69] = True
    packed = pack_vocab_masks([m, None], B=2, V=V)
    assert packed.shape == (2, 3)
    assert packed[0, 0] == 1  # bit 0
    assert packed[0, 1] == (1 << 1)  # token 33 → word 1 bit 1
    assert packed[0, 2] == (1 << 5)  # token 69 → word 2 bit 5
    assert (packed[1] == 0xFFFFFFFF).all()  # None row allows all


def test_apply_vocab_mask_device():
    import jax.numpy as jnp

    from sglang_tpu.layers.sampler import apply_vocab_mask

    V = 70
    m = np.zeros(V, bool)
    m[3] = m[64] = True
    packed = pack_vocab_masks([m], B=1, V=V)
    logits = jnp.zeros((1, V))
    out = np.asarray(apply_vocab_mask(logits, jnp.asarray(packed)))
    assert out[0, 3] == 0.0 and out[0, 64] == 0.0
    assert (out[0, [0, 1, 2, 4, 63, 65, 69]] < -1e9).all()


# ------------------------------------------------------------ engine-level
def test_engine_regex_constrained(tiny_engine):
    out = tiny_engine.generate(
        prompt="ignored",
        sampling_params={
            "temperature": 1.0,
            "top_k": 50,
            "max_new_tokens": 24,
            "regex": r"(ab|cd){3}",
        },
    )
    assert out["text"] in {
        a + b + c
        for a in ("ab", "cd")
        for b in ("ab", "cd")
        for c in ("ab", "cd")
    }
    assert out["meta_info"]["finish_reason"]["type"] == "stop"


def test_engine_json_schema_constrained(tiny_engine):
    schema = {
        "type": "object",
        "properties": {"n": {"type": "integer"}, "ok": {"type": "boolean"}},
        "required": ["n", "ok"],
    }
    out = tiny_engine.generate(
        prompt="gimme json",
        sampling_params={
            "temperature": 1.0,
            "top_k": 30,
            "max_new_tokens": 64,
            "json_schema": json.dumps(schema),
        },
    )
    obj = json.loads(out["text"])
    assert isinstance(obj["n"], int) and isinstance(obj["ok"], bool)


def test_engine_mixed_grammar_batch(tiny_engine):
    """Grammar + free requests in one batch must not cross-contaminate."""
    import threading

    results = {}

    def run(name, sp):
        results[name] = tiny_engine.generate(prompt="x", sampling_params=sp)

    ts = [
        threading.Thread(
            target=run,
            args=("re", {"temperature": 1.0, "max_new_tokens": 16,
                          "regex": r"[0-9]{4}"}),
        ),
        threading.Thread(
            target=run,
            args=("free", {"temperature": 0.0, "max_new_tokens": 8,
                            "ignore_eos": True}),
        ),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=180)
    assert results["re"]["text"].isdigit() and len(results["re"]["text"]) == 4
    assert len(results["free"]["output_ids"]) == 8


def test_two_distinct_grammars_one_batch(tiny_engine):
    """Two DIFFERENT grammars batched together: the device-FSM combined
    table rebases each grammar's next-state indices by its row offset, so
    the grammar at a non-zero offset must still honour its own automaton
    (regression: grammar-local indices walked into the other grammar's
    state region after the first fused step)."""
    import re
    import threading

    results = {}

    def run(name, rx):
        results[name] = tiny_engine.generate(
            prompt=name,
            sampling_params={"temperature": 0.0, "max_new_tokens": 24,
                            "regex": rx},
        )

    specs = {"g_digits": r"[0-9]{6}", "g_words": r"(ab|cd){5}"}
    ts = [threading.Thread(target=run, args=(n, rx))
          for n, rx in specs.items()]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=180)
    for name, rx in specs.items():
        assert re.fullmatch(rx, results[name]["text"]), (
            name, results[name]["text"])


def test_grammar_decodes_with_fused_windows(tiny_engine):
    """Small-FSM grammars must keep K>1 fused decode windows (device-side
    FSM advance) instead of one dispatch per token."""
    out = tiny_engine.generate(
        prompt="q",
        sampling_params={"temperature": 0.0, "max_new_tokens": 24,
                         "regex": "(ab|cd){8}"},
    )
    import re
    assert re.fullmatch("(ab|cd){8}", out["text"]) is not None
    sched = tiny_engine.scheduler
    # far fewer steps than generated tokens → fused windows were used
    n_tok = out["meta_info"]["completion_tokens"]
    assert n_tok >= 16
    assert sched.num_steps < n_tok, (sched.num_steps, n_tok)


def test_ebnf_compiles_and_constrains(tiny_engine):
    """EBNF grammar (GBNF-style) through the native DFA engine."""
    grammar = '''
# a tiny command grammar
root   ::= verb " " noun ("!" | ".")
verb   ::= "go" | "stop"
noun   ::= [a-c]+
'''
    out = tiny_engine.generate(
        prompt="x",
        sampling_params={"temperature": 0.0, "max_new_tokens": 16,
                         "ebnf": grammar},
    )
    import re as _re
    assert _re.fullmatch(r"(go|stop) [a-c]+[!.]", out["text"]), out["text"]


def test_ebnf_repetition_and_ranges():
    from sglang_tpu.constrained.ebnf import compile_ebnf_to_regex
    import re as _re

    rx = compile_ebnf_to_regex('root ::= "a" [0-9]{2,3} "b"?')
    assert _re.fullmatch(rx, "a12")
    assert _re.fullmatch(rx, "a123b")
    assert not _re.fullmatch(rx, "a1")


def test_ebnf_recursion_raises():
    from sglang_tpu.constrained.ebnf import EbnfError, compile_ebnf_to_regex
    import pytest as _pytest

    with _pytest.raises(EbnfError, match="recursive"):
        compile_ebnf_to_regex('root ::= "(" root ")" | "x"')


# ------------------------------------------------------------ jump-forward
def test_jump_tokens_unit():
    """Deterministic byte chain + greedy vocab tiling from a DFA state
    (reference compressed-FSM jump-forward, base_grammar_backend.py:91)."""
    tok = get_tokenizer("test:byte")
    fsm = compile_regex_fsm(r'\{"name": "[a-z]{3}"\}', tok)
    s0 = 0  # DFA start state
    assert fsm.deterministic_bytes(s0) == b'{"name": "'
    toks, end = fsm.jump_tokens(s0, min_bytes=4)
    # byte tokenizer: one token per byte
    assert bytes(toks) == b'{"name": "'
    # end state admits exactly the [a-z] class next
    mask = fsm.mask_for(end)
    allowed = set(np.nonzero(mask)[0].tolist())
    assert allowed == {ord(c) for c in "abcdefghijklmnopqrstuvwxyz"}
    # cached peek returns the identical object
    assert fsm.jump_tokens(s0, min_bytes=4) == (toks, end)
    # a state with a short (<min_bytes) forced span yields None
    s_mid = end  # [a-z]{3}: nothing deterministic from here
    assert fsm.jump_tokens(s_mid, min_bytes=4) is None


def test_grammar_state_jump_forward_advances_cursor():
    tok = get_tokenizer("test:byte")
    fsm = compile_regex_fsm(r'ab: [0-9]', tok)
    st = GrammarState(fsm)
    forced = st.jump_forward(min_bytes=3)
    assert bytes(forced) == b"ab: "
    assert st.accept_token(ord("7"))
    # terminal accept state (no transitions out): auto-finished
    assert st.is_terminated


def test_engine_jump_forward_e2e(tiny_engine):
    """Scaffold-heavy schema: the engine must emit the forced spans via
    extend passes (num_jump_forward_tokens > 0) and still produce valid
    JSON; a second engine with jump-forward disabled validates the same
    schema for comparison."""
    schema = {
        "type": "object",
        "properties": {
            "first_name": {"type": "string", "maxLength": 8},
            "last_name": {"type": "string", "maxLength": 8},
            "age": {"type": "integer"},
        },
        "required": ["first_name", "last_name", "age"],
    }
    out = tiny_engine.generate(
        prompt="json please",
        sampling_params={
            "temperature": 1.0,
            "top_k": 30,
            "max_new_tokens": 96,
            "json_schema": json.dumps(schema),
        },
    )
    obj = json.loads(out["text"])
    assert isinstance(obj["first_name"], str)
    assert isinstance(obj["age"], int)
    sched = tiny_engine.scheduler
    assert getattr(sched, "num_jump_forward_tokens", 0) > 0
    # every forced span is >= min_bytes long
    assert (
        sched.num_jump_forward_tokens
        >= sched.num_jump_forwards
        * tiny_engine.server_args.jump_forward_min_bytes
    )


def test_engine_jump_forward_disabled_matches_grammar():
    from tests.conftest import make_server_args, make_tiny_config
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.model_executor.model_runner import ModelRunner

    args = make_server_args(disable_jump_forward=True)
    runner = ModelRunner(args, model_config=make_tiny_config())
    eng = Engine(server_args=args, model_runner=runner)
    try:
        out = eng.generate(
            prompt="json please",
            sampling_params={
                "temperature": 0.0,
                "max_new_tokens": 64,
                "regex": r'\{"tag": "[a-z]{4}"\}',
            },
        )
        import re as _re

        assert _re.fullmatch(r'\{"tag": "[a-z]{4}"\}', out["text"])
        assert getattr(eng.scheduler, "num_jump_forwards", 0) == 0
    finally:
        eng.shutdown()


def test_engine_jump_forward_greedy_output_valid(tiny_engine):
    """Greedy + regex with interleaved forced spans: the final text must
    fullmatch the pattern (KV for forced tokens materialized correctly —
    a wrong extend span would derail the continuation sampling)."""
    import re as _re

    pat = r'name: "[a-z]{3}", age: [0-9]{2}, done\.'
    out = tiny_engine.generate(
        prompt="fill the form",
        sampling_params={
            "temperature": 0.0,
            "max_new_tokens": 96,
            "regex": pat,
        },
    )
    assert _re.fullmatch(pat, out["text"]), out["text"]
    assert tiny_engine.scheduler.num_jump_forward_tokens > 0
