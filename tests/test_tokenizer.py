"""Tokenizer tests: BPE round-trip + Whisper special-token scheme.

The special-token ID layout is checked against the published constants of
OpenAI Whisper checkpoints (multilingual base vocab 50257): e.g. for
large-v3 (100 languages) sot=50258, transcribe=50360, timestamp_begin=50365,
n_vocab=51866; for tiny..large-v2 (99 languages) transcribe=50359,
timestamp_begin=50364, n_vocab=51865.
"""

import pytest

from manual_whisper_tpu.tokenizer import (
    ByteLevelBPE, SpecialTokens, WhisperTokenizer, bytes_to_unicode,
    make_test_tokenizer)


def test_bytes_to_unicode_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_byte_tokenizer_roundtrip():
    tok = make_test_tokenizer()
    for text in ["hello world", "中文会议讨论记录，保持原意。",
                 "mixed 中英 text! 123", "emoji 🎙️ test"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_bpe_merges_apply():
    # base vocab: bytes; add a merge for 'h'+'e' and token 'he'
    vocab = {ch: i for i, ch in
             enumerate(bytes_to_unicode()[b] for b in range(256))}
    vocab["he"] = 256
    bpe = ByteLevelBPE(vocab, [("h", "e")])
    ids = bpe.encode("he")
    assert ids == [256]
    assert bpe.decode(ids) == "he"


def test_special_token_layout_large_v3():
    sp = SpecialTokens.build(50257, num_languages=100)
    assert sp.eot == 50257
    assert sp.sot == 50258
    assert sp.lang_base == 50259
    assert sp.translate == 50359
    assert sp.transcribe == 50360
    assert sp.sot_lm == 50361
    assert sp.sot_prev == 50362
    assert sp.no_speech == 50363
    assert sp.no_timestamps == 50364
    assert sp.timestamp_begin == 50365
    assert sp.n_vocab == 51866


def test_special_token_layout_v2():
    sp = SpecialTokens.build(50257, num_languages=99)
    assert sp.transcribe == 50359
    assert sp.no_timestamps == 50363
    assert sp.timestamp_begin == 50364
    assert sp.n_vocab == 51865


def test_language_tokens():
    tok = make_test_tokenizer()
    zh = tok.language_token("zh")
    en = tok.language_token("en")
    assert zh == tok.special.lang_base + 1
    assert en == tok.special.lang_base
    assert tok.language_from_token(zh) == "zh"
    assert tok.language_token("yue") == tok.special.lang_base + 99
    with pytest.raises(KeyError):
        tok.language_token("xx")


def test_sot_sequence():
    tok = make_test_tokenizer()
    seq = tok.sot_sequence(language="zh", task="transcribe",
                           without_timestamps=True)
    sp = tok.special
    assert seq == [sp.sot, tok.language_token("zh"), sp.transcribe,
                   sp.no_timestamps]
    seq_ts = tok.sot_sequence(language="en", task="translate",
                              without_timestamps=False)
    assert seq_ts == [sp.sot, tok.language_token("en"), sp.translate]


def test_prompt_sequence_truncates():
    tok = make_test_tokenizer()
    seq = tok.prompt_sequence("术语参考" * 300, max_len=10)
    assert seq[0] == tok.special.sot_prev
    assert len(seq) == 11


def test_timestamp_tokens():
    tok = make_test_tokenizer()
    t0 = tok.timestamp_token(0.0)
    assert t0 == tok.special.timestamp_begin
    t5 = tok.timestamp_token(5.0)
    assert tok.timestamp_from_token(t5) == pytest.approx(5.0)
    t_max = tok.timestamp_token(99.0)  # clamped to 30.00
    assert tok.timestamp_from_token(t_max) == pytest.approx(30.0)
    assert tok.is_timestamp(t0)
    assert not tok.is_timestamp(tok.special.eot)


def test_decode_skips_specials():
    tok = make_test_tokenizer()
    ids = tok.sot_sequence() + tok.encode("你好") + [tok.special.eot]
    assert tok.decode(ids) == "你好"


def test_decode_with_timestamps():
    tok = make_test_tokenizer()
    ids = ([tok.timestamp_token(0.0)] + tok.encode("hi")
           + [tok.timestamp_token(1.5)])
    assert tok.decode_with_timestamps(ids) == "<|0.00|>hi<|1.50|>"


def test_save_load_roundtrip(tmp_path):
    tok = make_test_tokenizer()
    tok.bpe.save(tmp_path)
    loaded = WhisperTokenizer.from_dir(tmp_path, num_languages=100)
    text = "中文 mixed 123"
    assert loaded.decode(loaded.encode(text)) == text
    assert loaded.special.n_vocab == tok.special.n_vocab


def _train_mini_bpe(corpus, n_merges=160):
    """Tiny greedy byte-level BPE trainer (test-only): produces a realistic
    vocab.json/merges.txt pair so the real-checkpoint loader path can be
    cross-validated against HF's tokenizer without hub access."""
    import collections

    from manual_whisper_tpu.tokenizer.bpe import (ByteLevelBPE, _PRETOKENIZE,
                                                  bytes_to_unicode)

    be = bytes_to_unicode()
    words = collections.Counter()
    for text in corpus:
        for chunk in _PRETOKENIZE.findall(text):
            words[tuple(be[b] for b in chunk.encode("utf-8"))] += 1

    vocab = {ch: i for i, ch in enumerate(sorted(be.values()))}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, freq in words.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # deterministic: max count, ties by pair
        (a, b), _n = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        merges.append((a, b))
        vocab.setdefault(a + b, len(vocab))
        merged = {}
        for word, freq in words.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + freq
        words = collections.Counter(merged)
    return ByteLevelBPE(vocab, merges)


CORPUS = [
    "今天的会议讨论了三个议题，关于产品发布的时间表。",
    "我们需要在下周完成数据分析和模型训练的全部工作。",
    "The meeting covered quarterly results and the product roadmap.",
    "Speaker two raised questions about the deployment timeline.",
    "混合 language text with 数字 123 and punctuation!?",
]


def test_bpe_matches_hf_gpt2_tokenizer(tmp_path):
    """Our vocab.json/merges.txt loader + BPE must reproduce HF's byte-level
    BPE exactly on the same files (the path real Whisper checkpoints use;
    the reference gets this via faster-whisper's bundled tokenizer)."""
    pytest.importorskip("transformers")
    from transformers import GPT2Tokenizer

    bpe = _train_mini_bpe(CORPUS)
    bpe.save(tmp_path)
    ours = type(bpe).from_dir(tmp_path)
    hf = GPT2Tokenizer(str(tmp_path / "vocab.json"),
                       str(tmp_path / "merges.txt"))

    cases = CORPUS + [
        "unseen 词汇 outside the corpus façade naïve",
        "  leading and   irregular   spaces  ",
        "don't它's contractions 'll 've",
        "emoji 🙂 and ünïcödé",
        "",
    ]
    for text in cases:
        ours_ids = ours.encode(text)
        hf_ids = hf.encode(text, add_special_tokens=False)
        assert ours_ids == hf_ids, f"mismatch on {text!r}"
        assert ours.decode(ours_ids) == hf.decode(hf_ids)


def test_whisper_tokenizer_from_hf_style_dir(tmp_path):
    """WhisperTokenizer.from_dir on an HF-style vocab (specials included in
    vocab.json) finds the right base size and round-trips text."""
    bpe = _train_mini_bpe(CORPUS)
    bpe.vocab["<|endoftext|>"] = len(bpe.vocab)
    bpe.save(tmp_path)
    tok = WhisperTokenizer.from_dir(tmp_path, num_languages=100)
    assert tok.special.eot == bpe.vocab["<|endoftext|>"]
    text = "会议 transcript 123"
    assert tok.decode(tok.encode(text)) == text


def test_from_dir_requires_language_count_evidence(tmp_path):
    """No meta, no added_tokens.json -> explicit error, not a silent
    100-language default that shifts every special id for v2 dirs."""
    import json
    import pytest
    tok = make_test_tokenizer()
    tok.bpe.save(tmp_path)
    with pytest.raises(ValueError, match="language count"):
        WhisperTokenizer.from_dir(tmp_path)
    (tmp_path / "added_tokens.json").write_text(
        json.dumps({"<|endoftext|>": 1}))
    assert WhisperTokenizer.from_dir(tmp_path).num_languages == 99
    (tmp_path / "added_tokens.json").write_text(
        json.dumps({"<|yue|>": 2}))
    assert WhisperTokenizer.from_dir(tmp_path).num_languages == 100


def test_split_to_word_tokens_cjk():
    tok = make_test_tokenizer()
    tok.language = "zh"
    ids = tok.encode("\u4f60\u597d\u4e16\u754c")
    words = tok.split_to_word_tokens(ids)
    assert [w for w, _ in words] == ["\u4f60", "\u597d", "\u4e16", "\u754c"]
    assert [i for _, grp in words for i in grp] == ids
    tok.language = "en"
    ids = tok.encode("hello world again")
    words = tok.split_to_word_tokens(ids)
    assert [w for w, _ in words] == ["hello", " world", " again"]


def test_non_speech_tokens_cover_music_symbols():
    """OpenAI adds the first token of multi-token music symbols (their
    leading byte token on the byte-level test tokenizer) — but NEVER the
    bare space token: " -" is one BPE token on real vocabs, while the
    byte tokenizer splits it to [space, '-'], and suppressing space
    would ban the word separator (this destroyed the synth eval once)."""
    tok = make_test_tokenizer()
    sup = set(tok.non_speech_tokens())
    for sym in "\u266a\u266b\u266f":
        assert tok.encode(sym)[0] in sup
    assert tok.encode(" ")[0] not in sup
