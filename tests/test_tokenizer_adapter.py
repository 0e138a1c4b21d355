"""QwenTokenizerAdapter exercised through the REAL HF remote-code path.

VERDICT r02 flagged the adapter as untested-until-weights-exist.  The
real BPE ranks can't exist here (zero egress), but everything else the
adapter touches can: tests/fixtures/qwen_tok_fixture is a
trust_remote_code tokenizer (tiktoken, byte-level ranks) reproducing
the Qwen-VL contract — real special-tag ids, the <img>...</img> ->
img_start + path+pads(=n_queries) + img_end span, HF AutoTokenizer
dynamic loading — so the adapter integration (reference
extract_activations.py:17-20,71-107) runs for real instead of only
against the ToyTokenizer.
"""

import os

import numpy as np
import pytest

from tdax.models.qwen_vl.config import QwenVLConfig
from tdax.models.qwen_vl.tokenizer import (QwenTokenizerAdapter, ToyTokenizer,
                                           batch_encode, from_list_format,
                                           get_tokenizer)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "qwen_tok_fixture")
CFG = QwenVLConfig()  # full config: real special ids, n_queries = 256


@pytest.fixture(scope="module")
def adapter():
    tok = get_tokenizer(FIXTURE, CFG)
    if not isinstance(tok, QwenTokenizerAdapter):  # pragma: no cover
        pytest.fail(f"fixture dir did not load as an adapter: {type(tok)}")
    return tok


def test_get_tokenizer_prefers_real_over_toy(adapter):
    assert isinstance(adapter, QwenTokenizerAdapter)
    assert not isinstance(adapter, ToyTokenizer)
    assert adapter.pad_id == 151643  # <|endoftext|>, not the toy's 0


def test_encode_text_byte_ids(adapter):
    ids = adapter.encode_text("abc")
    assert ids == [ord("a"), ord("b"), ord("c")]


def test_image_span_contract(adapter):
    """<img>path</img> must become img_start + (path bytes + img_pad to
    n_queries) + img_end, and the adapter must locate the span start."""
    query = from_list_format([
        {"image": "images/red_cube.png"},
        {"text": "a photo of a red cube"},
    ])
    enc = adapter(query)
    ids = enc["input_ids"]
    assert enc["images"] == ["images/red_cube.png"]
    (s,) = enc["image_span_starts"]
    assert ids[s - 1] == CFG.img_start_id
    assert ids[s + CFG.visual.n_queries] == CFG.img_end_id
    span = ids[s:s + CFG.visual.n_queries]
    path = "images/red_cube.png".encode()
    assert span[:len(path)] == [b for b in path]
    assert all(t == CFG.img_pad_id for t in span[len(path):])


def test_batch_encode_last_text_token_and_padding(adapter):
    """The reference's last-text-token substring search
    (extract_activations.py:88-107) through the real-tokenizer path."""
    samples = [
        {"image_path": "img/a.png", "prompt": "a photo of a red cube"},
        {"image_path": "img/b.png", "prompt": "a blue sphere"},
    ]
    batch = batch_encode(adapter, samples, CFG)
    ids = batch["input_ids"]
    for j, item in enumerate(samples):
        n_real = int(batch["attn_mask"][j].sum())
        last = int(batch["last_token_idx"][j])
        # the prompt is the query suffix, so its last byte is the last
        # real token of the sequence
        assert last == n_real - 1
        assert ids[j, last] == item["prompt"].encode()[-1]
        s = int(batch["image_positions"][j, 0])
        assert ids[j, s - 1] == CFG.img_start_id
    # right-padding with the real pad id
    pad_cols = ids[0, int(batch["attn_mask"][0].sum()):]
    if pad_cols.size:
        assert (pad_cols == adapter.pad_id).all()
    assert batch["image_paths"] == ["img/a.png", "img/b.png"]
    assert np.asarray(batch["image_positions"]).shape == (2, CFG.visual.n_queries)
