"""Phi-3 family causal LM.

Equivalent role to the reference's ``srt/models/phi3_small.py`` /
vLLM-style phi3 support — a Llama stack whose checkpoints store FUSED
projections (``qkv_proj`` = [q; k; v] rows, ``gate_up_proj`` =
[gate; up] rows; split host-side at load) and whose long-context rope
is "longrope" (su-scaling): per-dim frequency factors chosen between
``short_factor`` / ``long_factor`` by whether the deployment context
exceeds ``original_max_position_embeddings``, with the matching
sqrt(1 + ln(scale)/ln(orig)) attention factor on cos/sin.
"""

from __future__ import annotations

import math

import numpy as np

from sglang_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    def __init__(self, config, mesh_ctx=None):
        super().__init__(config, mesh_ctx=mesh_ctx)
        rs = (config.hf_config or {}).get("rope_scaling") or {}
        rtype = rs.get("rope_type", rs.get("type", ""))
        if rtype == "longrope":
            hf = config.hf_config
            orig = int(hf.get("original_max_position_embeddings", 4096))
            scale = config.max_position_embeddings / orig
            # the factor set is a STATIC deployment choice: long when the
            # serving context exceeds the original window (HF picks per
            # forward by seq_len; a serving engine sizes for its max)
            factors = np.asarray(
                rs["long_factor"] if scale > 1.0 else rs["short_factor"],
                np.float64,
            )
            rot = self.rot_dim
            base = 1.0 / (
                config.rope_theta
                ** (np.arange(0, rot, 2, dtype=np.float64) / rot)
            )
            self.inv_freq = (base / factors).astype(np.float32)
            if scale > 1.0:
                self.rope_mscale = math.sqrt(
                    1.0 + math.log(scale) / math.log(orig)
                )

    def hf_weight_mapping(self):
        base = super().hf_weight_mapping()
        hq = self.hq * self.hd
        hkv = self.hkv * self.hd
        inter = self.config.intermediate_size

        def split_qkv(t):
            # fused [hq+2*hkv, H] rows → transposed per-proj leaves
            return {
                "q_proj": np.ascontiguousarray(t[:hq].T),
                "k_proj": np.ascontiguousarray(t[hq: hq + hkv].T),
                "v_proj": np.ascontiguousarray(t[hq + hkv:].T),
            }

        def split_gate_up(t):
            return {
                "gate_proj": np.ascontiguousarray(t[:inter].T),
                "up_proj": np.ascontiguousarray(t[inter:].T),
            }

        def mapping(name: str):
            parts = name.split(".")
            if "layers" in parts:
                li = int(parts[parts.index("layers") + 1])
                tail = ".".join(parts[parts.index("layers") + 2 :])
                if tail == "self_attn.qkv_proj.weight":
                    return ("layers", li, split_qkv)
                if tail == "mlp.gate_up_proj.weight":
                    return ("layers", li, split_gate_up)
            return base(name)

        return mapping


EntryClass = [Phi3ForCausalLM]
