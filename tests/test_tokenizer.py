"""Tokenizer tests: SP + GPT-2 modes, byte fallback, round-trips."""
from ntransformer_tpu.inference.tokenizer import (
    Tokenizer,
    gpt2_byte_to_unicode,
    gpt2_unicode_to_byte,
)


def _sp_tokenizer():
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(6)
        scores.append(0.0)
    vocab_words = ["▁hello", "▁world", "hello", "world", "▁h", "el", "lo",
                   "▁w", "or", "ld", "h", "e", "l", "o", "w", "r", "d"]
    for i, t in enumerate(vocab_words):
        tokens.append(t)
        types.append(1)
        scores.append(-float(i))
    return Tokenizer(tokens, scores, types, bos_id=1, eos_id=2)


def _gpt2_tokenizer():
    b2u = gpt2_byte_to_unicode()
    tokens = ["<s>", "</s>"]
    types = [3, 3]
    # all single bytes as tokens
    for b in range(256):
        tokens.append(b2u[b])
        types.append(1)
    words = ["he", "ll", "hell", "hello", "Ġw", "Ġwo", "Ġwor", "Ġworl",
             "Ġworld", "o", "Ġ"]
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "Ġwo r",
              "Ġwor l", "Ġworl d"]
    tokens += words
    types += [1] * len(words)
    return Tokenizer(tokens, None, types, merges=merges, bos_id=0, eos_id=1)


def test_byte_tables():
    b2u = gpt2_byte_to_unicode()
    assert b2u[0x20] == "Ġ"
    assert b2u[ord("a")] == "a"
    u2b = gpt2_unicode_to_byte()
    assert u2b["Ġ"] == 0x20
    assert len(set(b2u.values())) == 256


def test_sp_mode_detected():
    t = _sp_tokenizer()
    assert not t.use_gpt2


def test_sp_encode_decode():
    t = _sp_tokenizer()
    ids = t.encode("hello world", add_bos=True)
    assert ids[0] == t.bos_id
    # No dummy-prefix space (matches reference tokenizer.cpp:104-117)
    assert t.decode(ids) == "hello world"
    # longest-match should produce the word tokens directly
    assert t.tokens[ids[1]] == "hello"
    assert t.tokens[ids[2]] == "▁world"


def test_sp_byte_fallback():
    t = _sp_tokenizer()
    ids = t.encode("héllo", add_bos=False)  # é is not in vocab → bytes
    text = t.decode(ids)
    assert "é".encode("utf-8")[0:1].decode("latin-1") in text or "é" in text


def test_gpt2_mode_detected():
    t = _gpt2_tokenizer()
    assert t.use_gpt2


def test_gpt2_encode_decode_roundtrip():
    t = _gpt2_tokenizer()
    for text in ["hello world", "hello", " world", "hw"]:
        ids = t.encode(text, add_bos=False)
        assert t.decode(ids) == text, (text, ids, [t.tokens[i] for i in ids])


def test_gpt2_merges_respected():
    t = _gpt2_tokenizer()
    ids = t.encode("hello", add_bos=False)
    # rank-driven merges must build up to the full word token
    assert [t.tokens[i] for i in ids] == ["hello"]


def test_control_tokens_dropped_in_decode():
    t = _sp_tokenizer()
    assert t.decode_token(t.bos_id) == ""
    assert t.decode([1, 2]) == ""


def test_empty_and_bos():
    t = _sp_tokenizer()
    assert t.encode("", add_bos=True) == [1]
    assert t.encode("", add_bos=False) == []


def test_exact_bpe_rank_merges_beat_greedy_seeding():
    """With merges present, encoding follows canonical lowest-rank-first BPE
    from single characters — a case where greedy longest-match seeding picks
    the wrong boundary: vocab has 'ab' but rank says merge (b,c) first."""
    from ntransformer_tpu.inference.tokenizer import Tokenizer
    toks = ["<unk>", "<s>", "</s>", "a", "b", "c", "ab", "bc", "Ġ", "Ġa"]
    tok = Tokenizer(toks, merges=["b c", "a b"])
    assert tok.use_gpt2
    ids = tok.encode("abc", add_bos=False)
    # canonical: a,b,c -> merge (b,c) rank 0 -> [a, bc]
    assert ids == [toks.index("a"), toks.index("bc")], ids
    # pretokenization prevents merges across word boundaries
    ids2 = tok.encode("ab ab", add_bos=False)
    texts = [tok.tokens[i] for i in ids2]
    assert "".join(texts).replace("Ġ", " ").lstrip() != ""  # sanity
    assert all("Ġ" not in t or t.startswith("Ġ") for t in texts)


def _llama3_like_tokenizer():
    """Exact-BPE (merges present) vocab with Llama-3-style control tokens."""
    b2u = gpt2_byte_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    types = [1] * 256
    words = ["he", "ll", "hell", "hello", "Ġ"]
    merges = ["h e", "l l", "he ll", "hell o"]
    tokens += words
    types += [1] * len(words)
    specials = ["<|begin_of_text|>", "<|end_of_text|>",
                "<|start_header_id|>", "<|end_header_id|>", "<|eot_id|>"]
    for s in specials:
        tokens.append(s)
        types.append(3)  # CONTROL
    t = Tokenizer(tokens, None, types, merges=merges,
                  bos_id=tokens.index("<|begin_of_text|>"),
                  eos_id=tokens.index("<|end_of_text|>"))
    return t, tokens


def test_exact_bpe_special_tokens_single_id():
    """Special tokens must encode to their single control ids, not be
    regex-split and BPE'd (r1 verdict: the LLAMA3 pretokenizer shredded
    '<|eot_id|>' into punctuation pieces). Ref: tokenizer.cpp:101-217
    longest-match seeding gets this right."""
    t, toks = _llama3_like_tokenizer()
    assert t.use_gpt2 and t.merge_rank
    ids = t.encode("<|eot_id|>", add_bos=False)
    assert ids == [toks.index("<|eot_id|>")], ids


def test_exact_bpe_chat_template_golden():
    """A Llama-3 chat template round-trips with control ids intact and the
    text between them BPE'd normally."""
    t, toks = _llama3_like_tokenizer()
    text = ("<|begin_of_text|><|start_header_id|>user<|end_header_id|>"
            "hello<|eot_id|>")
    ids = t.encode(text, add_bos=False)
    want_controls = [toks.index("<|begin_of_text|>"),
                     toks.index("<|start_header_id|>"),
                     toks.index("<|end_header_id|>"),
                     toks.index("<|eot_id|>")]
    assert ids[0] == want_controls[0]
    assert ids[1] == want_controls[1]
    assert toks.index("<|end_header_id|>") in ids
    assert ids[-1] == want_controls[3]
    # 'user' between the header markers, 'hello' merged to its token
    assert toks.index("hello") in ids
    # decode drops control tokens, keeps the text
    assert t.decode(ids) == "userhello"


def test_parse_special_false_treats_specials_as_text():
    t, toks = _llama3_like_tokenizer()
    ids = t.encode("<|eot_id|>", add_bos=False, parse_special=False)
    assert toks.index("<|eot_id|>") not in ids
    assert t.decode(ids) == "<|eot_id|>"


def test_stop_ids_include_eot():
    t, toks = _llama3_like_tokenizer()
    assert toks.index("<|eot_id|>") in t.stop_ids
    assert t.eos_id in t.stop_ids


def test_special_tokens_greedy_path():
    """The greedy (scores) path also pre-segments specials."""
    t = _sp_tokenizer()
    ids = t.encode("</s>", add_bos=False)
    assert ids == [2], ids


def test_gpt2_byte_fallback_recovers_original_byte():
    """A byte-mapped proxy char missing from the vocab must map back
    through gpt2_unicode_to_byte before the <0xXX> lookup (advisor r1:
    UTF-8-encoding the proxy char looked up the wrong byte tokens)."""
    b2u = gpt2_byte_to_unicode()
    # vocab: all bytes EXCEPT 0xFF's proxy; SP-style <0xFF> present
    tokens = []
    types = []
    for b in range(255):
        tokens.append(b2u[b])
        types.append(1)
    tokens.append("<0xFF>")
    types.append(6)
    t = Tokenizer(tokens, None, types, bos_id=0, eos_id=0)
    assert t.use_gpt2
    missing_proxy = b2u[0xFF]
    ids = t._byte_fallback_ids(missing_proxy)
    assert [t.tokens[i] for i in ids] == ["<0xFF>"]


def test_exact_bpe_roundtrip():
    from ntransformer_tpu.inference.tokenizer import Tokenizer
    toks = (["<unk>", "<s>", "</s>"]
            + [chr(c) for c in range(33, 127)] + ["Ġ", "he", "llo", "hello",
                                                  "Ġwo", "rld", "Ġworld"])
    toks += ["lo", "wo", "ld"]
    merges = ["h e", "l o", "l lo", "he llo", "w o", "Ġ wo",
              "l d", "r ld", "Ġwo rld"]
    tok = Tokenizer(toks, merges=merges)
    ids = tok.encode("hello world", add_bos=False)
    assert tok.decode(ids) == "hello world"
    assert toks.index("hello") in ids and toks.index("Ġworld") in ids


def test_sp_multibyte_fallback_emits_all_bytes():
    """A multi-byte character outside the vocab must emit one byte token
    PER UTF-8 BYTE — an earlier version dropped all but the first byte
    (e.g. '▁' E2 96 81 collapsed to just <0xE2>)."""
    t = _sp_tokenizer()
    ids = t.encode("日", add_bos=False)  # 3 UTF-8 bytes, not in vocab
    names = [t.tokens[i] for i in ids]
    want = [f"<0x{b:02X}>" for b in "日".encode("utf-8")]
    assert names == want, names
    assert t.decode(ids) == "日"  # decode reassembles the bytes


def test_stream_decoder_reassembles_split_utf8():
    """Streaming push() buffers bytes until a code point completes: a
    3-byte character split over 3 byte-fallback tokens streams as
    '', '', '日' — never mojibake (advisor finding r2; decode_token
    rendered each byte with chr())."""
    t = _sp_tokenizer()
    ids = t.encode("日", add_bos=False)
    assert len(ids) == 3
    dec = t.stream_decoder()
    pieces = [dec.push(i) for i in ids]
    assert pieces == ["", "", "日"], pieces
    assert dec.flush() == ""


def test_stream_decoder_matches_batch_decode():
    t = _sp_tokenizer()
    ids = t.encode("hello 日 world", add_bos=False)
    dec = t.stream_decoder()
    streamed = "".join(dec.push(i) for i in ids) + dec.flush()
    assert streamed == t.decode(ids)


def test_stream_decoder_flushes_incomplete_tail():
    """A generation ending mid-code-point drains as U+FFFD, not silence."""
    t = _sp_tokenizer()
    lead = t.token_to_id["<0xE2>"]  # first byte of a 3-byte char, alone
    dec = t.stream_decoder()
    assert dec.push(lead) == ""
    assert dec.flush() == "�"


def test_byte_fallback_never_emits_id0():
    """An unmappable byte emits the vocab's unk id (or nothing) — id 0 is
    a real text token in GPT-2-style vocabs (advisor finding r2)."""
    tokens = ["!", "<s>", "</s>", "a"]  # no <0xXX> tokens at all
    types = [1, 3, 3, 1]
    t = Tokenizer(tokens, [0.0] * 4, types, bos_id=1, eos_id=2)
    ids = t.encode("日", add_bos=False)  # unencodable: no byte tokens
    assert 0 not in ids, ids            # must not inject '!'
    t.unk_id = 3
    ids = t.encode("日", add_bos=False)
    assert ids and all(i == 3 for i in ids), ids
