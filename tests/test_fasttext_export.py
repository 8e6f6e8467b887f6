"""fastText .bin parser + embedding exporter (reference vocab.py:70-84)."""

import struct

import numpy as np
import pytest

from hop_tpu.data.fasttext_export import (FastTextModel, compute_subwords,
                                          export_embeddings, ft_hash)
from hop_tpu.data.vocab import Vocab

DIM, BUCKET, MINN, MAXN = 16, 500, 3, 6
WORDS = ["the", "gesture", "speech", "naïve", "</s>"]


def write_fixture_bin(path, rng):
    """Write a tiny fastText model in the v12 file format, packed
    independently of the module under test (fasttext FastText::saveModel:
    magic, version, args, dictionary, quant flags, dense matrices)."""
    nwords = len(WORDS)
    mat = rng.standard_normal((nwords + BUCKET, DIM)).astype(np.float32)
    out = bytearray()
    out += struct.pack("<ii", 793712314, 12)
    #                 dim ws epoch minCount neg wordNgrams loss model
    out += struct.pack("<12i", DIM, 5, 5, 5, 5, 1, 1, 2,
                       BUCKET, MINN, MAXN, 100)   # bucket minn maxn lrur
    out += struct.pack("<d", 1e-4)
    out += struct.pack("<iii", nwords, nwords, 0)   # size nwords nlabels
    out += struct.pack("<qq", 12345, -1)            # ntokens, pruneidx=-1
    for w in WORDS:
        out += w.encode("utf-8") + b"\0"
        out += struct.pack("<qb", 7, 0)             # count, type=word
    out += struct.pack("<b", 0)                     # quant_input = false
    out += struct.pack("<qq", *mat.shape)
    out += mat.tobytes()
    out += struct.pack("<b", 0)                     # qout = false
    out += struct.pack("<qq", nwords, DIM)          # output matrix
    out += np.zeros((nwords, DIM), np.float32).tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))
    return mat


@pytest.fixture()
def model(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "tiny.bin")
    mat = write_fixture_bin(path, rng)
    return FastTextModel(path), mat


def test_header_and_dictionary(model):
    m, _ = model
    assert m.dim == DIM and m.bucket == BUCKET
    assert m.minn == MINN and m.maxn == MAXN
    assert m.words[:2] == ["the", "gesture"] and m.nwords == len(WORDS)
    assert m.input.shape == (len(WORDS) + BUCKET, DIM)


def test_hash_sign_extension():
    # FNV-1a with *signed* chars: multibyte UTF-8 must sign-extend
    assert ft_hash(b"abc") == ((((2166136261 ^ 97) * 16777619 & 0xFFFFFFFF)
                                ^ 98) * 16777619 & 0xFFFFFFFF ^ 99) \
        * 16777619 & 0xFFFFFFFF
    h1 = ft_hash("é".encode("utf-8"))
    b0, b1 = "é".encode("utf-8")
    h = (2166136261 ^ ((b0 - 256) & 0xFFFFFFFF)) * 16777619 & 0xFFFFFFFF
    h = (h ^ ((b1 - 256) & 0xFFFFFFFF)) * 16777619 & 0xFFFFFFFF
    assert h1 == h


def test_subword_rule():
    # "<ab>" with minn=2, maxn=3: boundary 1-grams excluded by the
    # n==1&&(i==0||j==size) rule; enumerate by hand
    grams = set()
    word = b"<ab>"
    for i in range(4):
        for n in range(2, 4):
            if i + n <= 4:
                grams.add(word[i:i + n])
    got = compute_subwords("ab", 2, 3, 1 << 30)
    assert sorted(got) == sorted(ft_hash(bytes(g)) % (1 << 30)
                                 for g in grams)


def test_subword_utf8_boundaries():
    # ngrams never start/split inside a UTF-8 continuation byte
    for g in compute_subwords("naïve", MINN, MAXN, BUCKET):
        assert 0 <= g < BUCKET
    # count matches a char-level enumeration of <naïve>
    chars = list("<naïve>")
    expect = sum(1 for i in range(len(chars))
                 for n in range(MINN, MAXN + 1)
                 if i + n <= len(chars)
                 and not (n == 1 and (i == 0 or i + n == len(chars))))
    assert len(compute_subwords("naïve", MINN, MAXN, BUCKET)) == expect


def test_word_vector_in_vocab(model):
    m, mat = model
    ids = [m.word2id["gesture"]] + [
        len(WORDS) + h for h in compute_subwords("gesture", MINN, MAXN,
                                                 BUCKET)]
    np.testing.assert_allclose(m.get_word_vector("gesture"),
                               mat[ids].mean(0), rtol=1e-6)


def test_word_vector_oov_and_eos(model):
    m, mat = model
    ids = [len(WORDS) + h
           for h in compute_subwords("zzzqqq", MINN, MAXN, BUCKET)]
    np.testing.assert_allclose(m.get_word_vector("zzzqqq"),
                               mat[ids].mean(0), rtol=1e-6)
    # EOS gets no subwords (dictionary.cc initNgrams)
    np.testing.assert_allclose(m.get_word_vector("</s>"),
                               mat[m.word2id["</s>"]], rtol=1e-6)


def test_export_aligned_with_vocab(model):
    m, _ = model
    vocab = Vocab("t")
    for w in ["gesture", "speech", "unseen"]:
        vocab.index_word(w)
    weights = export_embeddings(m, vocab, seed=0)
    assert weights.shape == (vocab.n_words, DIM)
    np.testing.assert_allclose(weights[vocab.word2index["gesture"]],
                               m.get_word_vector("gesture"), rtol=1e-6)
    # OOV vocab words still get (subword) fastText vectors
    np.testing.assert_allclose(weights[vocab.word2index["unseen"]],
                               m.get_word_vector("unseen"), rtol=1e-6)
    # special tokens keep the normal(0, 1/sqrt(dim)) init
    sd = np.std(weights[:4])
    assert 0.5 / np.sqrt(DIM) < sd < 2.0 / np.sqrt(DIM)


def test_cli_and_vocab_load(model, tmp_path):
    m, _ = model
    vocab = Vocab("t")
    for w in WORDS[:3]:
        vocab.index_word(w)
    # callable source (what --wordembed-path foo.bin wires up)
    w = vocab.load_word_vectors(m.get_word_vector, DIM)
    np.testing.assert_allclose(w[vocab.word2index["the"]],
                               m.get_word_vector("the"), rtol=1e-6)
    # .npy round trip through load_word_vectors
    out = str(tmp_path / "emb.npy")
    np.save(out, w)
    v2 = Vocab("t")
    for word in WORDS[:3]:
        v2.index_word(word)
    w2 = v2.load_word_vectors(out, DIM)
    np.testing.assert_array_equal(w, w2)
