"""Chat template tests (tokenizer/chat.py) — golden vs transformers.

The reference has no chat/template support (raw-string prompts end to
end); this subsystem is a beyond-reference addition, so correctness is
pinned to `transformers.apply_chat_template` on real-world template
sources rather than to the reference.
"""

import json

import pytest

pytest.importorskip("jinja2")

from turboinfer_tpu.tokenizer import chat  # noqa: E402

MESSAGES = [
    {"role": "system", "content": "You are terse."},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "what's 2+2?"},
]

# Real-world template shapes: Zephyr (loops + eos), Llama-2 (system
# folding + bos/strip), ChatML-with-condition.
ZEPHYR_TPL = (
    "{% for message in messages %}\n"
    "{% if message['role'] == 'user' %}\n"
    "{{ '<|user|>\n' + message['content'] + eos_token }}\n"
    "{% elif message['role'] == 'system' %}\n"
    "{{ '<|system|>\n' + message['content'] + eos_token }}\n"
    "{% elif message['role'] == 'assistant' %}\n"
    "{{ '<|assistant|>\n'  + message['content'] + eos_token }}\n"
    "{% endif %}\n"
    "{% if loop.last and add_generation_prompt %}\n"
    "{{ '<|assistant|>' }}\n"
    "{% endif %}\n"
    "{% endfor %}")

MISTRAL_TPL = (
    "{{ bos_token }}{% for message in messages %}"
    "{% if message['role'] == 'user' %}"
    "{{ '[INST] ' + message['content'] + ' [/INST]' }}"
    "{% elif message['role'] == 'assistant' %}"
    "{{ message['content'] + eos_token}}"
    "{% endif %}{% endfor %}")


def _hf_render(tpl, messages, add_generation_prompt=True,
               bos="<s>", eos="</s>"):
    transformers = pytest.importorskip("transformers")
    from transformers import PreTrainedTokenizerFast
    from tokenizers import Tokenizer as TK, models
    tok = PreTrainedTokenizerFast(
        tokenizer_object=TK(models.BPE(vocab={"a": 0}, merges=[])),
        bos_token=bos, eos_token=eos)
    tok.chat_template = tpl
    return tok.apply_chat_template(
        messages, tokenize=False,
        add_generation_prompt=add_generation_prompt)


@pytest.mark.parametrize("tpl", [ZEPHYR_TPL, MISTRAL_TPL,
                                 chat.DEFAULT_TEMPLATE])
@pytest.mark.parametrize("agp", [True, False])
def test_golden_vs_transformers(tpl, agp):
    msgs = MESSAGES if tpl is not MISTRAL_TPL else MESSAGES[1:]
    ours = chat.ChatTemplate(tpl, bos_token="<s>", eos_token="</s>")
    assert ours.render(msgs, add_generation_prompt=agp) == \
        _hf_render(tpl, msgs, add_generation_prompt=agp)


def test_default_is_chatml():
    out = chat.ChatTemplate().render(
        [{"role": "user", "content": "hi"}], add_generation_prompt=True)
    assert out == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"


def test_raise_exception_helper():
    tpl = chat.ChatTemplate(
        "{% if messages[0]['role'] != 'user' %}"
        "{{ raise_exception('first must be user') }}{% endif %}ok")
    assert tpl.render([{"role": "user", "content": "x"}]) == "ok"
    with pytest.raises(ValueError, match="first must be user"):
        tpl.render([{"role": "system", "content": "x"}])


def test_from_tokenizer_config_forms():
    # plain string
    t = chat.from_tokenizer_config({"chat_template": "A{{ bos_token }}",
                                    "bos_token": "<s>"})
    assert t.render([]) == "A<s>"
    assert not t.is_default
    # named list — "default" entry wins
    t = chat.from_tokenizer_config({"chat_template": [
        {"name": "tool_use", "template": "T"},
        {"name": "default", "template": "D"}]})
    assert t.render([]) == "D"
    # AddedToken-style dict bos
    t = chat.from_tokenizer_config(
        {"chat_template": "{{ bos_token }}",
         "bos_token": {"content": "<bos>", "special": True}})
    assert t.render([]) == "<bos>"
    # absent → ChatML default
    assert chat.from_tokenizer_config({}).is_default
    assert chat.from_tokenizer_config(None).is_default


def test_gguf_metadata_template():
    md = {"tokenizer.chat_template": "{{ bos_token }}X",
          "tokenizer.ggml.bos_token_id": 1,
          "tokenizer.ggml.eos_token_id": 2}
    t = chat.from_gguf_metadata(md, ["<unk>", "<s>", "</s>"])
    assert t.render([]) == "<s>X"


def test_tokenizer_apply_chat_template(tmp_path):
    """End-to-end through HFTokenizer: template from
    tokenizer_config.json, tokenize=True avoids double BOS."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer as TK, models, trainers, \
        pre_tokenizers, decoders
    from turboinfer_tpu.tokenizer import hf as hf_tok
    ref = TK(models.BPE())
    ref.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    ref.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    ref.train_from_iterator(["hello user assistant turn"] * 4, tr)
    ref.add_special_tokens(["<|im_start|>", "<|im_end|>"])
    ref.save(str(tmp_path / "tokenizer.json"))
    with open(tmp_path / "tokenizer_config.json", "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>"}, f)
    ours = hf_tok.from_hf_dir(str(tmp_path))
    assert ours.chat_template is not None and ours.chat_template.is_default
    msgs = [{"role": "user", "content": "hello"}]
    text = ours.apply_chat_template(msgs)
    assert text.endswith("<|im_start|>assistant\n")
    ids = ours.apply_chat_template(msgs, tokenize=True)
    assert ids[0] == ours.bos_id
    assert ours.added["<|im_start|>"] in ids

    # template that bakes the bos into the text: no double bos
    with open(tmp_path / "tokenizer_config.json", "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>",
                   "chat_template": "{{ bos_token }}"
                                    "{% for m in messages %}"
                                    "{{ m['content'] }}{% endfor %}"}, f)
    ours2 = hf_tok.from_hf_dir(str(tmp_path))
    ids2 = ours2.apply_chat_template(msgs, tokenize=True)
    assert ids2[0] == ours2.bos_id and ids2[1] != ours2.bos_id


def test_engine_chat(tiny_params, tiny_cfg):
    import turboinfer_tpu as ti
    from turboinfer_tpu.tokenizer.bpe import BuiltinTokenizer
    tok = BuiltinTokenizer(vocab_size=tiny_cfg.vocab_size)
    eng = ti.InferenceEngine(tiny_params, tiny_cfg, tokenizer=tok)
    res = eng.chat([{"role": "user", "content": "hello"}],
                   max_new_tokens=6, temperature=0.0)
    assert isinstance(res.text, str)
    # chat_stream text equals chat text under greedy decoding
    streamed = "".join(
        c.text for c in eng.chat_stream([{"role": "user",
                                          "content": "hello"}],
                                        max_new_tokens=6, temperature=0.0))
    assert streamed == res.text


def test_engine_chat_requires_tokenizer(tiny_engine):
    with pytest.raises(RuntimeError, match="tokenizer"):
        tiny_engine.chat([{"role": "user", "content": "x"}])
