"""Test-fixture tokenizer reproducing the Qwen-VL tokenizer CONTRACT.

The real Qwen-VL-Chat tokenizer (checkpoint file ``tokenization_qwen.py``,
loaded with trust_remote_code — see /root/reference/extract_activations.py:17-20)
is a tiktoken BPE with special image tags: encoding ``<img>path</img>``
yields ``img_start_id``, the path's tokens padded with ``img_pad_id`` to
exactly IMG_TOKEN_SPAN (= n_queries = 256) entries, then ``img_end_id``.
The real BPE ranks ship with the checkpoint and cannot exist in this
zero-egress environment, so this fixture uses byte-level ranks (every
byte is a token) while keeping the special-tag ids, the span contract,
and the HF remote-code loading path IDENTICAL — which is exactly the
surface ``tdax.models.qwen_vl.tokenizer.QwenTokenizerAdapter`` consumes.

This is an original minimal implementation of that contract, not a copy
of Qwen's tokenizer code.
"""

from __future__ import annotations

import tiktoken
from transformers import PreTrainedTokenizer

IMG_TOKEN_SPAN = 256
IMG_START = "<img>"
IMG_END = "</img>"
IMG_PAD = "<imgpad>"
ENDOFTEXT = "<|endoftext|>"

# the real Qwen-VL-Chat ids (tdax/models/qwen_vl/config.py:51-53)
SPECIAL_TOKENS = {
    ENDOFTEXT: 151643,
    IMG_START: 151857,
    IMG_END: 151858,
    IMG_PAD: 151859,
}


class FixtureQwenTokenizer(PreTrainedTokenizer):
    """Byte-level tiktoken tokenizer with Qwen-VL image-tag semantics."""

    model_input_names = ["input_ids", "attention_mask"]
    vocab_files_names: dict = {}

    def __init__(self, **kwargs):
        self._ranks = {bytes([i]): i for i in range(256)}
        self._tik = tiktoken.Encoding(
            "tdax-fixture",
            pat_str=r"(?s:.)",
            mergeable_ranks=self._ranks,
            special_tokens=SPECIAL_TOKENS,
        )
        self._id_to_special = {v: k for k, v in SPECIAL_TOKENS.items()}
        kwargs.setdefault("pad_token", ENDOFTEXT)
        kwargs.setdefault("eos_token", ENDOFTEXT)
        super().__init__(**kwargs)

    @property
    def vocab_size(self) -> int:
        return 256

    def get_vocab(self) -> dict:
        vocab = {chr(i): i for i in range(256)}
        vocab.update(SPECIAL_TOKENS)
        return vocab

    def tokenize(self, text: str, **kwargs) -> list:
        """Returns bytes tokens / special-string tokens, with each
        <img>...</img> group padded to IMG_TOKEN_SPAN entries."""
        ids = self._tik.encode(text, allowed_special="all")
        tokens: list = [self._id_to_special[i] if i >= 256 else bytes([i])
                        for i in ids]
        out: list = []
        i = 0
        while i < len(tokens):
            if tokens[i] == IMG_START:
                j = tokens.index(IMG_END, i + 1)
                url = tokens[i + 1:j]
                if len(url) > IMG_TOKEN_SPAN:
                    raise ValueError("image path too long for the span")
                out.append(IMG_START)
                out.extend(url)
                out.extend([IMG_PAD] * (IMG_TOKEN_SPAN - len(url)))
                out.append(IMG_END)
                i = j + 1
            else:
                out.append(tokens[i])
                i += 1
        return out

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, (str, bytes)):
            return self._convert_token_to_id(tokens)
        return [self._convert_token_to_id(t) for t in tokens]

    def _convert_token_to_id(self, token):
        if isinstance(token, bytes):
            return self._ranks[token]
        return SPECIAL_TOKENS[token]

    def _convert_id_to_token(self, index: int):
        if index in self._id_to_special:
            return self._id_to_special[index]
        return bytes([index])

    def convert_tokens_to_string(self, tokens) -> str:
        buf = b""
        for t in tokens:
            buf += t if isinstance(t, bytes) else t.encode("utf-8")
        return buf.decode("utf-8", errors="replace")

    def save_vocabulary(self, save_directory: str,
                        filename_prefix: str | None = None) -> tuple:
        return ()
