"""Chat prompt construction.

Equivalent role to the reference's ``parser/conversation.py`` +
``managers/template_manager.py``: turn an OpenAI ``messages`` list into a
prompt string.  Prefers the tokenizer's own HF chat template; falls back
to named built-ins (``--chat-template``), then to ChatML.
"""

from __future__ import annotations

from typing import List, Optional

from sglang_tpu.entrypoints.protocol import ChatMessage


def _chatml(messages: List[ChatMessage]) -> str:
    out = []
    for m in messages:
        out.append(f"<|im_start|>{m.role}\n{m.flat_text()}<|im_end|>\n")
    out.append("<|im_start|>assistant\n")
    return "".join(out)


def _llama3(messages: List[ChatMessage]) -> str:
    out = ["<|begin_of_text|>"]
    for m in messages:
        out.append(
            f"<|start_header_id|>{m.role}<|end_header_id|>\n\n"
            f"{m.flat_text()}<|eot_id|>"
        )
    out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def _plain(messages: List[ChatMessage]) -> str:
    out = [f"{m.role}: {m.flat_text()}\n" for m in messages]
    out.append("assistant:")
    return "".join(out)


BUILTIN_TEMPLATES = {
    "chatml": _chatml,
    "llama-3": _llama3,
    "llama3": _llama3,
    "plain": _plain,
}


def _tools_block(tools) -> str:
    """Qwen-style tool advertisement block for builtin templates."""
    import json

    lines = [
        "# Tools",
        "You may call one or more functions. For each call, return",
        '<tool_call>{"name": <name>, "arguments": <args>}</tool_call>.',
        "<tools>",
    ]
    for t in tools:
        lines.append(json.dumps(t, separators=(",", ":")))
    lines.append("</tools>")
    return "\n".join(lines)


def apply_chat_template(
    tokenizer,
    messages: List[ChatMessage],
    template_name: Optional[str] = None,
    tools=None,
) -> str:
    """messages → prompt string ending with the assistant generation cue."""
    if tools:
        messages = [
            ChatMessage(role="system", content=_tools_block(tools))
        ] + list(messages)
    if template_name:
        fn = BUILTIN_TEMPLATES.get(template_name)
        if fn is None:
            raise ValueError(
                f"unknown chat template {template_name!r}; "
                f"available: {sorted(BUILTIN_TEMPLATES)}"
            )
        return fn(messages)
    if (
        tokenizer is not None
        and hasattr(tokenizer, "apply_chat_template")
        and getattr(tokenizer, "chat_template", None)
    ):
        try:
            return tokenizer.apply_chat_template(
                [m.model_dump(exclude_none=True) for m in messages],
                tokenize=False,
                add_generation_prompt=True,
                tools=tools,
            )
        except TypeError:
            return tokenizer.apply_chat_template(
                [m.model_dump(exclude_none=True) for m in messages],
                tokenize=False,
                add_generation_prompt=True,
            )
    return _chatml(messages)
