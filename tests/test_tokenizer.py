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
