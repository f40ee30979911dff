"""Tokenizer construction.

Equivalent role to the reference's ``utils/hf_transformers_utils.py`` +
``tokenizer/tiktoken_tokenizer.py``: HF fast tokenizers from a local path,
plus a tiny in-repo byte tokenizer for hermetic tests (no hub access).
"""

from __future__ import annotations

from typing import List, Optional


def get_tokenizer(tokenizer_path: str, trust_remote_code: bool = False):
    if tokenizer_path == "test:byte":
        return ByteTokenizer()
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        tokenizer_path,
        trust_remote_code=trust_remote_code,
        use_fast=True,
        local_files_only=True,
    )


class ByteTokenizer:
    """Byte-level tokenizer for hermetic tests: token id = byte value.

    ids 0..255 = bytes; 256 = BOS; 257 = EOS.  Vocab padded to 512.
    """

    vocab_size = 512
    bos_token_id = 256
    eos_token_id = 257
    pad_token_id = 258
    all_special_ids = [256, 257, 258]

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = list(text.encode("utf-8"))
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def decode(
        self,
        ids,
        skip_special_tokens: bool = True,
        clean_up_tokenization_spaces: bool = False,
        spaces_between_special_tokens: bool = True,
    ) -> str:
        data = bytes(i for i in ids if i < 256)
        return data.decode("utf-8", errors="replace")

    def convert_ids_to_tokens(self, ids):
        return [f"<0x{i:02X}>" if i < 256 else f"<special_{i}>" for i in ids]

    def __call__(self, text, **kw):
        return {"input_ids": self.encode(text)}
