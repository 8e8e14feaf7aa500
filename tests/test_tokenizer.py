"""Tokenizer parity: ids must match the reference CLIP BPE exactly.

Golden ids were captured from the reference tokenizer
(/root/reference/clip/simple_tokenizer.py) via tools/gen_goldens.py; when the
reference tree is mounted the test also re-checks live.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from excel_tpu.text.tokenizer import get_tokenizer, tokenize

STRINGS = [
    "a clean origami cat.",
    "a clean origami person with clothes,people,human.",
    "a clean origami diningtable.",
    "a clean origami tvmonitor screen.",
    "a clean origami hairdrier,blowdrier.",
    "this is one pottedplant in the scene.",
    "it's 3 dogs & cats -- weird!",
    "A   Clean &amp; ORIGAMI {thing}?",
]


def _load_reference_tokenizer():
    path = "/root/reference/clip/simple_tokenizer.py"
    if not os.path.exists(path):
        return None
    if "ftfy" not in sys.modules:
        shim = types.ModuleType("ftfy")
        shim.fix_text = lambda s: s
        sys.modules["ftfy"] = shim
    spec = importlib.util.spec_from_file_location("_ref_tok", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer()


def test_vocab_size():
    assert get_tokenizer().vocab_size == 49408


def test_tokenize_shape_and_framing():
    arr = tokenize(STRINGS)
    tok = get_tokenizer()
    assert arr.shape == (len(STRINGS), 77)
    assert (arr[:, 0] == tok.sot).all()
    # eot is the max id in every row (reference takes argmax for pooling)
    assert (arr.argmax(axis=1) > 0).all()
    assert (arr.max(axis=1) == tok.eot).all()


def test_truncation():
    long = "cat " * 200
    arr = tokenize([long], truncate=True)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == get_tokenizer().eot
    with pytest.raises(RuntimeError):
        tokenize([long], truncate=False)


def test_parity_with_reference():
    ref = _load_reference_tokenizer()
    if ref is None:
        pytest.skip("reference tree not mounted")
    mine = get_tokenizer()
    for s in STRINGS:
        assert ref.encode(s) == mine.encode(s), s
        assert ref.decode(ref.encode(s)) == mine.decode(mine.encode(s))
