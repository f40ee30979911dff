"""The structured-generation DSL ("SGLang the language").

Equivalent role to the reference's ``python/sglang/lang/`` (``api.py``
``@function``/``gen``/``select``, ``interpreter.py:274`` StreamExecutor) —
re-implemented as an EAGER interpreter over the in-process Engine: each
``gen``/``select`` submits a request whose prompt is the program's text so
far, so shared prefixes hit the radix cache exactly like the reference's
KV-reuse-aware executor.

    import sglang_tpu.lang as sgl

    @sgl.function
    def pipeline(s, question):
        s += sgl.system("You are terse.")
        s += sgl.user(question)
        with s.assistant():
            s += "The answer is " + sgl.gen("answer", max_tokens=16)

    state = pipeline.run(question="2+2?", backend=sgl.EngineBackend(engine))
    print(state["answer"])
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

_DEFAULT_BACKEND: Optional["EngineBackend"] = None


def set_default_backend(backend: "EngineBackend"):
    global _DEFAULT_BACKEND
    _DEFAULT_BACKEND = backend


class EngineBackend:
    """Runs DSL programs against an in-process Engine (the reference's
    ``lang/backend/runtime_endpoint.py`` talks HTTP; same contract)."""

    def __init__(self, engine, chat_template: Optional[str] = None):
        self.engine = engine
        self.tokenizer = engine.tokenizer
        self.chat_template = chat_template

    def generate(self, prompt: str, params: Dict[str, Any]) -> Dict[str, Any]:
        return self.engine.generate(prompt=prompt, sampling_params=params)

    def score_choice(self, prompt: str, choice: str) -> tuple:
        """(sum_logprob, n_tokens) of ``choice`` continuing ``prompt``."""
        prefix_ids = self.tokenizer.encode(prompt)
        full_ids = self.tokenizer.encode(prompt + choice)
        n_choice = len(full_ids) - len(prefix_ids)
        if n_choice <= 0:
            return (float("-inf"), 1)
        out = self.engine.generate(
            input_ids=full_ids,
            sampling_params={
                "max_new_tokens": 0,
                "return_logprob": True,
                "logprob_start_len": len(full_ids) - n_choice,
            },
        )
        lps = out["meta_info"]["input_token_logprobs"][-n_choice:]
        total = sum(lp for lp, _tid, _ in lps if lp is not None)
        return (total, n_choice)


# ------------------------------------------------------------ expressions
@dataclass
class SglGen:
    name: Optional[str] = None
    params: Dict[str, Any] = field(default_factory=dict)


@dataclass
class SglSelect:
    name: Optional[str]
    choices: List[str]
    method: str = "token_length_normalized"


@dataclass
class SglRole:
    role: str
    content: str


def gen(
    name: Optional[str] = None,
    max_tokens: int = 128,
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = -1,
    stop: Union[None, str, List[str]] = None,
    regex: Optional[str] = None,
    json_schema: Optional[str] = None,
    ignore_eos: bool = False,
    **extra,
) -> SglGen:
    params = dict(
        max_new_tokens=max_tokens,
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        stop=stop,
        regex=regex,
        json_schema=json_schema,
        ignore_eos=ignore_eos,
    )
    params.update(extra)
    return SglGen(name, params)


def select(
    name: Optional[str] = None,
    choices: List[str] = (),
    method: str = "token_length_normalized",
) -> SglSelect:
    return SglSelect(name, list(choices), method)


def system(content: str) -> SglRole:
    return SglRole("system", content)


def user(content: str) -> SglRole:
    return SglRole("user", content)


def assistant(content: str) -> SglRole:
    return SglRole("assistant", content)


# ------------------------------------------------------------------ state
class ProgramState:
    """Mutable program text + captured variables (reference StreamExecutor
    state, executed eagerly)."""

    def __init__(self, backend: EngineBackend):
        self.backend = backend
        self.text_ = ""
        self.variables: Dict[str, Any] = {}
        self.meta: Dict[str, Any] = {}
        self._role_open: Optional[str] = None

    # -------------------------------------------------------------- appends
    def __iadd__(self, other):
        if isinstance(other, str):
            self.text_ += other
        elif isinstance(other, SglGen):
            self._run_gen(other)
        elif isinstance(other, SglSelect):
            self._run_select(other)
        elif isinstance(other, SglRole):
            self.text_ += self._role_text(other.role, other.content)
        elif isinstance(other, (list, tuple)):
            for o in other:
                self.__iadd__(o)
        else:
            raise TypeError(f"cannot append {type(other)} to program state")
        return self

    def _role_text(self, role: str, content: str) -> str:
        return f"<|im_start|>{role}\n{content}<|im_end|>\n"

    @contextmanager
    def role(self, role: str):
        self.text_ += f"<|im_start|>{role}\n"
        try:
            yield self
        finally:
            self.text_ += "<|im_end|>\n"

    def system(self):
        return self.role("system")

    def user(self):
        return self.role("user")

    def assistant(self):
        return self.role("assistant")

    # ------------------------------------------------------------- actions
    def _run_gen(self, g: SglGen):
        out = self.backend.generate(self.text_, dict(g.params))
        text = out["text"]
        self.text_ += text
        if g.name:
            self.variables[g.name] = text
            self.meta[g.name] = out["meta_info"]

    def _run_select(self, s: SglSelect):
        assert s.choices, "select() needs at least one choice"
        scores = []
        for choice in s.choices:
            total, n = self.backend.score_choice(self.text_, choice)
            if s.method == "token_length_normalized":
                scores.append(total / max(n, 1))
            else:  # "greedy_token" == raw sum
                scores.append(total)
        best = s.choices[int(max(range(len(scores)), key=scores.__getitem__))]
        self.text_ += best
        if s.name:
            self.variables[s.name] = best
            self.meta[s.name] = {
                "choices": list(s.choices),
                "scores": scores,
            }

    # ---------------------------------------------------------------- fork
    def fork(self, n: int) -> List["ProgramState"]:
        """n independent branches sharing this prefix (radix-cache reuse
        makes the shared prefix free — the reference's fork semantics)."""
        out = []
        for _ in range(n):
            st = ProgramState(self.backend)
            st.text_ = self.text_
            st.variables = dict(self.variables)
            out.append(st)
        return out

    # --------------------------------------------------------------- sugar
    def __getitem__(self, name: str) -> Any:
        return self.variables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.variables

    def text(self) -> str:
        return self.text_


# -------------------------------------------------------------- functions
class SglFunction:
    def __init__(self, func):
        self.func = func

    def run(
        self, *args, backend: Optional[EngineBackend] = None, **kwargs
    ) -> ProgramState:
        backend = backend or _DEFAULT_BACKEND
        if backend is None:
            raise RuntimeError(
                "no backend: pass backend= or call set_default_backend()"
            )
        state = ProgramState(backend)
        self.func(state, *args, **kwargs)
        return state

    def run_batch(
        self,
        batch_kwargs: List[Dict[str, Any]],
        backend: Optional[EngineBackend] = None,
        num_threads: int = 8,
    ) -> List[ProgramState]:
        """Run many program instances concurrently (the engine's continuous
        batching turns the thread fan-out into one device batch)."""
        results: List[Optional[ProgramState]] = [None] * len(batch_kwargs)
        errors: List[Optional[BaseException]] = [None] * len(batch_kwargs)
        sem = threading.Semaphore(num_threads)

        def run_one(i):
            with sem:
                try:
                    results[i] = self.run(backend=backend, **batch_kwargs[i])
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    errors[i] = e

        threads = [
            threading.Thread(target=run_one, args=(i,))
            for i in range(len(batch_kwargs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for e in errors:
            if e is not None:
                raise e
        return results

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


def function(func=None):
    if func is not None:
        return SglFunction(func)
    return function
