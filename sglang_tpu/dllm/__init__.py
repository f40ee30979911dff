"""Diffusion-LLM decoding: LLaDA-style iterative parallel denoising.

Equivalent role to the reference's ``dllm/`` (``DllmAlgorithm`` hooked
into ``tp_worker.py:432-446``): the response window starts fully MASKED
and T denoise steps each (1) run the bidirectional model over the whole
window and (2) reveal the highest-confidence masked positions
(low-confidence remasking, the LLaDA schedule).  Semi-autoregressive
block mode reveals left-to-right in fixed blocks, denoising only within
the active block.

TPU-native: the ENTIRE generation is one jitted ``lax.scan`` over the T
steps — token updates feed the next step on device, so the host pays
one dispatch + one fetch per request batch regardless of T.  Dynamic
per-step reveal counts use a rank-vs-threshold comparison instead of
``top_k`` (static shapes; no data-dependent control flow).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

NEG_INF = -1e30


def _denoise_scan(
    model,
    params: Dict[str, Any],
    x0: jnp.ndarray,  # [B, L] prompt + mask_id response window
    gen_start: jnp.ndarray,  # [B] first response position
    gen_len: int,
    mask_id: int,
    steps: int,
    block_len: int,
    temperature: jnp.ndarray,  # [B]
    rng: jnp.ndarray,
    per_step: Optional[int] = None,  # reveal quota (None: derive)
    finalize: bool = True,  # greedy-resolve leftover masks at the end
    gen_end: Optional[jnp.ndarray] = None,  # [B] per-row window end
):
    B, L = x0.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    if gen_end is None:
        gen_end = gen_start + gen_len
    in_window = (pos >= gen_start[:, None]) & (pos < gen_end[:, None])
    # per-step reveal quota (last step mops up the remainder)
    if per_step is None:
        per_step = -(-gen_len // steps)
    greedy = (temperature <= 0.0)[:, None]
    temp = jnp.where(greedy, 1.0, temperature[:, None])

    def step(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        logits = model.forward_dense(params, x)  # [B, L, V] f32
        lsm = jax.nn.log_softmax(logits, axis=-1)
        sampled = jnp.where(
            greedy,
            jnp.argmax(logits, axis=-1),
            jax.random.categorical(sub, logits / temp[..., None], axis=-1),
        ).astype(jnp.int32)
        conf = jnp.take_along_axis(
            lsm, sampled[..., None], axis=-1
        )[..., 0]  # [B, L] logprob of the chosen token

        masked = (x == mask_id) & in_window
        if block_len > 0:
            # semi-autoregressive: only the leftmost unfinished block
            # denoises this step (LLaDA block schedule)
            rel = pos - gen_start[:, None]
            done_before = jnp.where(
                (x != mask_id) | ~in_window, 1, 0
            )
            # first masked relative position → active block index
            first_masked_rel = jnp.min(
                jnp.where(masked, rel, gen_len), axis=1
            )  # [B]
            blk = first_masked_rel // block_len
            in_block = (rel >= (blk * block_len)[:, None]) & (
                rel < ((blk + 1) * block_len)[:, None]
            )
            candidates = masked & in_block
            del done_before
        else:
            candidates = masked

        # reveal the per_step highest-confidence candidates: rank by
        # confidence among candidates (static-shape sort, dynamic quota)
        c_scores = jnp.where(candidates, conf, NEG_INF)
        order = jnp.argsort(-c_scores, axis=-1)  # best first
        rank = jnp.zeros((B, L), jnp.int32).at[
            jnp.arange(B)[:, None], order
        ].set(jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L)))
        reveal = candidates & (rank < per_step)
        x = jnp.where(reveal, sampled, x)
        return (x, key), None

    (x, _), _ = jax.lax.scan(
        step, (x0, rng), np.arange(steps, dtype=np.int32)
    )
    if finalize:
        # safety: any position still masked after T steps resolves greedily
        logits = model.forward_dense(params, x)
        final = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        x = jnp.where((x == mask_id) & in_window, final, x)
    return x


class DllmAlgorithm:
    """Batched diffusion generation over a runner's model/params
    (reference dllm/ DllmAlgorithm)."""

    def __init__(self, runner, mask_id: Optional[int] = None,
                 steps: int = 0, block_len: int = 0):
        self.runner = runner
        hf = runner.model_config.hf_config or {}
        self.mask_id = int(
            mask_id
            if mask_id is not None
            else hf.get("mask_token_id", runner.model_config.vocab_size - 1)
        )
        self.steps = steps
        self.block_len = block_len
        self._fns: Dict[Any, Any] = {}

    def generate(
        self,
        input_ids,  # List[List[int]] or List[int]
        gen_len: int,
        steps: Optional[int] = None,
        temperature: float = 0.0,
        block_len: Optional[int] = None,
        seed: int = 0,
    ):
        """→ List[List[int]] of gen_len response tokens per prompt."""
        if input_ids and isinstance(input_ids[0], int):
            input_ids = [input_ids]
        steps = steps or self.steps or gen_len
        block_len = self.block_len if block_len is None else block_len
        B = len(input_ids)
        Lp = max(len(p) for p in input_ids)
        L = Lp + gen_len
        x0 = np.full((B, L), self.mask_id, np.int32)
        gen_start = np.zeros((B,), np.int32)
        for i, p in enumerate(input_ids):
            # right-align prompts so every response window is contiguous
            x0[i, Lp - len(p) : Lp] = p
            x0[i, : Lp - len(p)] = (
                self.runner.model_config.eos_token_ids[0]
                if self.runner.model_config.eos_token_ids
                else 0
            )
            gen_start[i] = Lp

        key = (B, L, gen_len, steps, block_len)
        fn = self._fns.get(key)
        if fn is None:
            logger.info(
                "compiling dllm denoise: B=%d L=%d gen=%d steps=%d blk=%d",
                B, L, gen_len, steps, block_len,
            )
            fn = jax.jit(
                functools.partial(
                    _denoise_scan,
                    self.runner.model,
                    gen_len=gen_len,
                    mask_id=self.mask_id,
                    steps=steps,
                    block_len=block_len,
                )
            )
            self._fns[key] = fn
        out = fn(
            self.runner.params,
            jnp.asarray(x0),
            jnp.asarray(gen_start),
            temperature=jnp.full((B,), temperature, jnp.float32),
            rng=jax.random.PRNGKey(seed),
        )
        out = np.asarray(out)
        return [out[i, Lp : Lp + gen_len].tolist() for i in range(B)]

    # ------------------------------------------------- serving (stateful)
    def denoise_block(
        self,
        x: np.ndarray,  # [B, L] current canvas (prompt + partial reveal)
        gen_start: np.ndarray,  # [B]
        gen_end: np.ndarray,  # [B]
        temperature: np.ndarray,  # [B]
        steps: int,
        per_step: int,
        finalize: bool,
        seed: int,
    ) -> np.ndarray:
        """Advance the batch by ``steps`` denoise steps (semi-AR: only
        each row's leftmost unfinished block denoises).  The canvas ``x``
        IS the whole state, so the scheduler can re-batch between calls —
        that is what makes diffusion requests continuously batchable
        (rows join/leave at block boundaries; reference tp_worker.py:432
        runs dllm batches inside the scheduler loop the same way)."""
        B, L = x.shape
        gen_max = int((gen_end - gen_start).max()) if B else 0
        key = ("serve", B, L, gen_max, steps, per_step,
               self.block_len or 32, finalize)
        fn = self._fns.get(key)
        if fn is None:
            logger.info(
                "compiling dllm serve block: B=%d L=%d steps=%d", B, L, steps
            )
            fn = jax.jit(
                functools.partial(
                    _denoise_scan,
                    self.runner.model,
                    gen_len=gen_max,
                    mask_id=self.mask_id,
                    steps=steps,
                    block_len=self.block_len or 32,
                    per_step=per_step,
                    finalize=finalize,
                )
            )
            self._fns[key] = fn
        out = fn(
            self.runner.params,
            jnp.asarray(x, jnp.int32),
            jnp.asarray(gen_start, jnp.int32),
            temperature=jnp.asarray(temperature, jnp.float32),
            rng=jax.random.PRNGKey(seed),
            gen_end=jnp.asarray(gen_end, jnp.int32),
        )
        return np.asarray(out)
