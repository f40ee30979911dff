"""OpenAI-compatible API protocol models.

Equivalent role to the reference's ``entrypoints/openai/protocol.py``
(1,797 lines of pydantic models) — the subset of fields the TPU runtime
serves today, kept wire-compatible with the OpenAI API.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, Field


def _id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex}"


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0
    prompt_tokens_details: Optional[Dict[str, int]] = None  # {"cached_tokens": n}


class SamplingFields(BaseModel):
    """Shared sampling knobs (OpenAI + SGLang extensions)."""

    max_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    seed: Optional[int] = None
    user: Optional[str] = None
    # SGLang extensions (reference protocol.py CompletionRequest extras)
    top_k: int = -1
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    min_tokens: int = 0
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    stop_token_ids: Optional[List[int]] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    json_schema: Optional[str] = None

    def to_sampling_dict(self, default_max_tokens: int) -> Dict[str, Any]:
        d = dict(
            max_new_tokens=self.max_tokens
            if self.max_tokens is not None
            else default_max_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            frequency_penalty=self.frequency_penalty,
            presence_penalty=self.presence_penalty,
            repetition_penalty=self.repetition_penalty,
            min_new_tokens=self.min_tokens,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            seed=self.seed,
            regex=self.regex,
            ebnf=self.ebnf,
            json_schema=self.json_schema,
        )
        return d


class CompletionRequest(SamplingFields):
    model: str = ""
    prompt: Union[str, List[str], List[int], List[List[int]]] = ""
    suffix: Optional[str] = None
    logprobs: Optional[int] = None
    echo: bool = False


class LogProbs(BaseModel):
    text_offset: List[int] = Field(default_factory=list)
    token_logprobs: List[Optional[float]] = Field(default_factory=list)
    tokens: List[str] = Field(default_factory=list)
    top_logprobs: List[Optional[Dict[str, float]]] = Field(default_factory=list)


class CompletionChoice(BaseModel):
    index: int
    text: str
    logprobs: Optional[LogProbs] = None
    finish_reason: Optional[str] = None
    matched_stop: Optional[Union[str, int]] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: _id("cmpl"))
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[CompletionChoice] = Field(default_factory=list)
    usage: Optional[UsageInfo] = None


class ChatMessage(BaseModel):
    role: str
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    name: Optional[str] = None
    tool_calls: Optional[List[Dict[str, Any]]] = None
    tool_call_id: Optional[str] = None
    reasoning_content: Optional[str] = None

    def flat_text(self) -> str:
        if self.content is None:
            return ""
        if isinstance(self.content, str):
            return self.content
        parts = []
        for p in self.content:
            if isinstance(p, dict) and p.get("type") == "text":
                parts.append(p.get("text", ""))
        return "".join(parts)


class ResponseFormat(BaseModel):
    type: str = "text"  # text | json_object | json_schema
    json_schema: Optional[Dict[str, Any]] = None


class ChatCompletionRequest(SamplingFields):
    model: str = ""
    messages: List[ChatMessage] = Field(default_factory=list)
    max_completion_tokens: Optional[int] = None
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    response_format: Optional[ResponseFormat] = None
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Optional[Union[str, Dict[str, Any]]] = None

    def to_sampling_dict(self, default_max_tokens: int) -> Dict[str, Any]:
        d = super().to_sampling_dict(default_max_tokens)
        if self.max_completion_tokens is not None:
            d["max_new_tokens"] = self.max_completion_tokens
        if self.logprobs:
            d["return_logprob"] = True
            d["top_logprobs_num"] = self.top_logprobs or 0
        rf = self.response_format
        if rf is not None:
            if rf.type == "json_object":
                d["json_schema"] = '{"type": "object"}'
            elif rf.type == "json_schema" and rf.json_schema is not None:
                import json as _json

                schema = rf.json_schema.get("schema", rf.json_schema)
                d["json_schema"] = _json.dumps(schema)
        return d


class ChatCompletionChoice(BaseModel):
    index: int
    message: ChatMessage
    logprobs: Optional[Dict[str, Any]] = None
    finish_reason: Optional[str] = None
    matched_stop: Optional[Union[str, int]] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: _id("chatcmpl"))
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionChoice] = Field(default_factory=list)
    usage: Optional[UsageInfo] = None


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None
    tool_calls: Optional[List[dict]] = None


class ChatCompletionChunkChoice(BaseModel):
    index: int
    delta: DeltaMessage
    logprobs: Optional[Dict[str, Any]] = None
    finish_reason: Optional[str] = None


class ChatCompletionChunk(BaseModel):
    id: str
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionChunkChoice] = Field(default_factory=list)
    usage: Optional[UsageInfo] = None


class EmbeddingRequest(BaseModel):
    model: str = ""
    input: Union[str, List[str], List[int], List[List[int]]] = ""
    encoding_format: str = "float"
    user: Optional[str] = None


class EmbeddingObject(BaseModel):
    object: str = "embedding"
    embedding: List[float] = Field(default_factory=list)
    index: int = 0


class EmbeddingResponse(BaseModel):
    object: str = "list"
    data: List[EmbeddingObject] = Field(default_factory=list)
    model: str = ""
    usage: Optional[UsageInfo] = None


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "sglang-tpu"


class ModelList(BaseModel):
    object: str = "list"
    data: List[ModelCard] = Field(default_factory=list)


class ErrorResponse(BaseModel):
    object: str = "error"
    message: str
    type: str = "invalid_request_error"
    param: Optional[str] = None
    code: int = 400
