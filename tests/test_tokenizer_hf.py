"""Golden tests for the HF tokenizer.json loader (tokenizer/hf.py).

Trains tiny tokenizers of each supported flavor with the `tokenizers`
library, saves them to tokenizer.json, and checks our pure-Python
implementation produces identical ids (and lossless decode) on a
corpus of adversarial strings.

Reference parity note: the reference framework has no tokenizer
loading at all — a ~120-entry hardcoded vocab
(src/model/inference_engine.cpp:1224-1297). This subsystem is a
deliberate improvement called for by SURVEY.md §7.
"""

import json
import os

import pytest

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import Tokenizer as HFRef, models, pre_tokenizers, \
    normalizers, trainers, decoders  # noqa: E402

from turboinfer_tpu.tokenizer import hf as hf_tok  # noqa: E402

CORPUS = [
    "Hello, world!",
    "the quick brown fox jumps over the lazy dog",
    "The Quick Brown Fox.",
    "  leading and   internal   spaces  ",
    "numbers 12345 and mixed a1b2c3",
    "punct!?.,;:'\"()[]{}",
    "tab\tand\nnewline",
    "unicode: héllo wörld ñ",
    "emoji 🎉 and CJK 你好世界",
    "code: def f(x): return x**2  # comment",
    "don't can't won't it's",
    "",
    "a",
    " ",
    "camelCaseAndPascalCase",
]

TRAIN = [
    "hello world the quick brown fox jumps over the lazy dog",
    "numbers 123 456 789 and words mixed together",
    "don't stop believing, hold on to that feeling",
    "def function(argument): return argument + 1",
    "punctuation, is! important? yes; it: is.",
    "the the the a a a an an of of to to in in",
] * 4


def _golden(tmp_path, ref: HFRef, texts=CORPUS, decode_vs_ref=True):
    """Save ref to tokenizer.json, load ours, compare encodes.

    decode_vs_ref=False checks sentencepiece-style lossless round-trip
    to the original text instead of matching HF's decoder chain (the
    test's Llama-style decoder chain drops spaces around byte-fallback
    tokens — real SP decoding, which ours implements, does not).
    """
    path = os.path.join(str(tmp_path), "tokenizer.json")
    ref.save(path)
    ours = hf_tok.from_tokenizer_json(path)
    for text in texts:
        want = ref.encode(text, add_special_tokens=False).ids
        got = ours.encode(text)
        assert got == want, (
            f"{ours.kind} mismatch on {text!r}:\n ours={got}\n  ref={want}\n"
            f" ours toks={[ours.tokens[i] for i in got]}\n"
            f"  ref toks={[ref.id_to_token(i) for i in want]}")
        if decode_vs_ref:
            assert ours.decode(got) == ref.decode(
                want, skip_special_tokens=True)
        else:
            assert ours.decode(got, skip_special=False) == text
    return ours


def _train_byte_level():
    """GPT-2/Qwen-style: byte-level BPE, no unk."""
    ref = HFRef(models.BPE())
    ref.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    ref.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    ref.train_from_iterator(TRAIN, trainer)
    return ref


def _train_metaspace():
    """Llama-1/2/Mistral-style: Metaspace BPE with byte_fallback."""
    ref = HFRef(models.BPE(unk_token="<unk>", byte_fallback=True,
                           fuse_unk=True))
    ref.normalizer = normalizers.Sequence([
        normalizers.Prepend("▁"), normalizers.Replace(" ", "▁")])
    ref.decoder = decoders.Sequence([
        decoders.Replace("▁", " "), decoders.ByteFallback(),
        decoders.Strip(" ", 1, 0)])
    byte_toks = [f"<0x{b:02X}>" for b in range(256)]
    trainer = trainers.BpeTrainer(
        vocab_size=700, special_tokens=["<unk>", "<s>", "</s>"] + byte_toks)
    ref.train_from_iterator(TRAIN, trainer)
    return ref


def _train_unigram():
    """Gemma/T5-style: Unigram with Metaspace pretokenizer."""
    ref = HFRef(models.Unigram())
    ref.pre_tokenizer = pre_tokenizers.Metaspace()
    ref.decoder = decoders.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=300, special_tokens=["<unk>", "<s>", "</s>"],
        unk_token="<unk>")
    ref.train_from_iterator(TRAIN, trainer)
    return ref


def test_byte_level_bpe_golden(tmp_path):
    _golden(tmp_path, _train_byte_level())


def test_metaspace_bpe_golden(tmp_path):
    ours = _golden(tmp_path, _train_metaspace(), decode_vs_ref=False)
    assert ours.byte_fallback
    # byte fallback: unseen unicode becomes <0xXX> tokens, decode restores
    ids = ours.encode("→")
    assert all(ours.tokens[i].startswith("<0x") for i in ids[1:])
    # skip_special=False: this trainer marks byte tokens special (real
    # Llama checkpoints keep them in the vocab, unmarked)
    assert ours.decode(ids, skip_special=False) == "→"


def test_unigram_golden(tmp_path):
    ours = _golden(tmp_path, _train_unigram())
    assert ours.kind == "Unigram"


def test_added_tokens_and_specials(tmp_path):
    ref = _train_byte_level()
    ref.add_special_tokens(["<|im_start|>", "<|im_end|>"])
    ours = _golden(
        tmp_path, ref,
        texts=["<|im_start|>user\nhi<|im_end|>",
               "plain text <|im_start|> then more",
               "<|im_start|><|im_end|>"])
    ids = ours.encode("<|im_start|>hi<|im_end|>")
    assert ours.added["<|im_start|>"] in ids
    assert ours.added["<|im_end|>"] in ids
    # specials are skipped on decode
    assert "<|im_start|>" not in ours.decode(ids)


def test_bos_eos_resolution(tmp_path):
    ref = _train_metaspace()
    path = os.path.join(str(tmp_path), "tokenizer.json")
    ref.save(path)
    with open(os.path.join(str(tmp_path), "tokenizer_config.json"),
              "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>"}, f)
    ours = hf_tok.from_hf_dir(str(tmp_path))
    assert ours.bos_id == ref.token_to_id("<s>")
    assert ours.eos_id == ref.token_to_id("</s>")
    assert ours.encode("hi", add_bos=True)[0] == ours.bos_id


def test_config_json_ids_override(tmp_path):
    ref = _train_byte_level()
    path = os.path.join(str(tmp_path), "tokenizer.json")
    ref.save(path)
    eot = ref.token_to_id("<|endoftext|>")
    with open(os.path.join(str(tmp_path), "config.json"), "w") as f:
        json.dump({"bos_token_id": eot, "eos_token_id": [eot, 3]}, f)
    ours = hf_tok.from_hf_dir(str(tmp_path))
    assert ours.bos_id == eot
    assert ours.eos_id == eot          # list → first id


def test_missing_sidecar_returns_none(tmp_path):
    assert hf_tok.from_hf_dir(str(tmp_path)) is None


def test_unsupported_model_type_raises(tmp_path):
    path = os.path.join(str(tmp_path), "tokenizer.json")
    with open(path, "w") as f:
        json.dump({"model": {"type": "WordPiece", "vocab": {}}}, f)
    with pytest.raises(ValueError, match="WordPiece"):
        hf_tok.from_tokenizer_json(path)
