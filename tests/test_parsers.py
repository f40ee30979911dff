"""Reasoning and function-call parsers."""

import json

import pytest

from sglang_tpu.parsers import FunctionCallParser, ReasoningParser


# ----------------------------------------------------------------- reasoning
def test_reasoning_oneshot_with_tags():
    r = ReasoningParser()
    reasoning, content = r.parse("<think>let me think</think>\nThe answer is 4.")
    assert reasoning == "let me think"
    assert content == "The answer is 4."


def test_reasoning_oneshot_implicit_start():
    # DeepSeek-R1 starts inside the think block without the opening tag.
    r = ReasoningParser()
    reasoning, content = r.parse("chain of thought</think>answer")
    assert reasoning == "chain of thought"
    assert content == "answer"


def test_reasoning_unclosed():
    r = ReasoningParser()
    reasoning, content = r.parse("<think>still thinking")
    assert reasoning == "still thinking" and content == ""


def test_reasoning_streaming():
    r = ReasoningParser()
    chunks = ["<think>a", "bc</th", "ink>he", "llo"]
    rs, cs = "", ""
    for ch in chunks:
        dr, dc = r.parse_stream_chunk(ch)
        rs += dr
        cs += dc
    assert rs == "abc" and cs == "hello"


# ------------------------------------------------------------ function call
TOOLS = [
    {"type": "function", "function": {"name": "get_weather",
                                      "parameters": {"type": "object"}}},
    {"type": "function", "function": {"name": "search",
                                      "parameters": {"type": "object"}}},
]


def test_qwen25_tool_call():
    p = FunctionCallParser(TOOLS)
    text = (
        'Sure, checking.\n<tool_call>\n'
        '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
        '</tool_call>'
    )
    normal, calls = p.parse(text)
    assert normal == "Sure, checking."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}


def test_qwen25_multiple_calls():
    p = FunctionCallParser(TOOLS)
    text = (
        '<tool_call>{"name": "get_weather", "arguments": {}}</tool_call>'
        '<tool_call>{"name": "search", "arguments": {"q": "x"}}</tool_call>'
    )
    _, calls = p.parse(text)
    assert [c.name for c in calls] == ["get_weather", "search"]
    assert [c.tool_index for c in calls] == [0, 1]


def test_llama3_json_tool_call():
    p = FunctionCallParser(TOOLS, format="llama3")
    text = '{"name": "search", "parameters": {"q": "llamas"}}'
    normal, calls = p.parse(text)
    assert calls and calls[0].name == "search"
    assert json.loads(calls[0].arguments) == {"q": "llamas"}
    assert normal == ""


def test_mistral_tool_call():
    p = FunctionCallParser(TOOLS, format="mistral")
    text = '[TOOL_CALLS] [{"name": "get_weather", "arguments": {"c": 1}}]'
    normal, calls = p.parse(text)
    assert calls and calls[0].name == "get_weather"


def test_unknown_tool_rejected():
    p = FunctionCallParser(TOOLS)
    text = '<tool_call>{"name": "rm_rf", "arguments": {}}</tool_call>'
    normal, calls = p.parse(text)
    assert calls == []


def test_no_tool_call_passthrough():
    p = FunctionCallParser(TOOLS)
    normal, calls = p.parse("just a normal sentence {not json}")
    assert calls == [] and "normal sentence" in normal


def test_auto_format_detection():
    p = FunctionCallParser(TOOLS, format="auto")
    _, c1 = p.parse('<tool_call>{"name": "search", "arguments": {}}</tool_call>')
    _, c2 = p.parse('[TOOL_CALLS] [{"name": "search", "arguments": {}}]')
    assert c1 and c2


# ------------------------------------------------ streaming + registry
def test_streaming_qwen25_arg_deltas():
    from sglang_tpu.parsers import StreamingFunctionCallParser

    p = StreamingFunctionCallParser(
        tools=[{"name": "get_weather"}], format="qwen25"
    )
    text = ('I will check. <tool_call>{"name": "get_weather", '
            '"arguments": {"city": "Paris", "unit": "C"}}</tool_call> ok')
    outs, events = [], []
    for i in range(0, len(text), 7):  # 7-char chunks
        t, ev = p.push(text[i : i + 7])
        outs.append(t)
        events.extend(ev)
    tail, ev, calls = p.finish()
    outs.append(tail)
    events.extend(ev)
    assert "".join(outs) == "I will check.  ok"
    names = [e for e in events if e["type"] == "name"]
    assert names == [{"type": "name", "index": 0, "name": "get_weather"}]
    args = "".join(e["delta"] for e in events if e["type"] == "args")
    import json

    assert json.loads(args) == {"city": "Paris", "unit": "C"}
    # argument deltas streamed incrementally, not one blob
    assert sum(1 for e in events if e["type"] == "args") > 1
    assert calls[0].name == "get_weather"


def test_streaming_holds_back_partial_marker():
    from sglang_tpu.parsers import StreamingFunctionCallParser

    p = StreamingFunctionCallParser(format="qwen25")
    t1, _ = p.push("hello <tool")   # could become <tool_call>
    assert t1 == "hello "
    t2, _ = p.push("box> world")    # it wasn't — text released
    assert t2 == "<toolbox> world"


def test_streaming_mistral_resolves_at_finish():
    from sglang_tpu.parsers import StreamingFunctionCallParser

    p = StreamingFunctionCallParser(
        tools=[{"name": "f"}], format="mistral"
    )
    t1, _ = p.push("thinking... ")
    t2, _ = p.push('[TOOL_CALLS] [{"name": "f", "arguments": {"x": 1}}]')
    assert t1 + t2 == "thinking... "
    text, events, calls = p.finish()
    assert len(calls) == 1 and calls[0].name == "f"
    assert any(e["type"] == "args" for e in events)


def test_detector_registry():
    from sglang_tpu.parsers import detector_for_model

    assert detector_for_model("qwen2") == "qwen25"
    assert detector_for_model("mixtral") == "mistral"
    assert detector_for_model("deepseek_v3") == "deepseekv3"
    assert detector_for_model("unknown-model", default="auto") == "auto"


def test_parse_deepseekv3_format():
    from sglang_tpu.parsers import FunctionCallParser

    text = (
        "<|tool▁calls▁begin|><|tool▁call▁begin|>function"
        "<|tool▁sep|>get_weather\n```json\n{\"city\": \"SF\"}\n```"
        "<|tool▁call▁end|><|tool▁calls▁end|>"
    )
    normal, calls = FunctionCallParser(format="deepseekv3").parse(text)
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    import json

    assert json.loads(calls[0].arguments) == {"city": "SF"}


def test_parse_glm4_format():
    from sglang_tpu.parsers import FunctionCallParser

    text = 'get_weather\n{"city": "Beijing"}'
    normal, calls = FunctionCallParser(
        tools=[{"name": "get_weather"}], format="glm4"
    ).parse(text)
    assert len(calls) == 1 and calls[0].name == "get_weather"
