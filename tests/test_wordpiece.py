"""WordPiece tokenizer golden tests vs transformers.BertTokenizer.

The reference feeds BertTokenizer output (add_special_tokens=False) into
the LLM token stream (lmdb_data_loader.py:155,174-199); our pure-Python
tokenizer must match it token-for-token on the same vocab.
"""

import pytest

from hop_tpu.data.wordpiece import WordPieceTokenizer, build_vocab_file

VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + ["the", "a", "and", "to", "of", "in", "is", "it", "you", "we",
       "hello", "world", "gesture", "speech", "motion", "##s", "##ing",
       "##ed", "##er", "##ly", "un", "##aff", "##able", "play", "##ground",
       "talk", "walk", "##k", "##alk", "co", "##sp", "##ee", "##ch",
       "don", "'", "t", ",", ".", "!", "?", "-", "$", "3", "##0", "##3",
       "café", "cafe", "über", "uber", "##e", "##r", "中", "国", "naive",
       "##ve", "nai"]
)

CORPUS = [
    "Hello world, we are talking about gestures!",
    "the playground is in the world",
    "don't walk — talk.",
    "unaffable",
    "playing played player playingly",
    "Café über naïve",           # accent stripping
    "we went to 中国 in march",    # CJK isolation
    "a $30 thing?!",
    "   weird\tspacing\nhere   ",
    "x" * 150,                    # > max_input_chars_per_word -> [UNK]
    "supercalifragilistic",       # unmatchable span -> [UNK]
    "co-speech gesture generation",
    "IT IS THE THE THE",
    "it's it, it. it! it?",
    "\x00control\x7fchars�here",
    "",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wp") / "vocab.txt"
    build_vocab_file(VOCAB, str(p))
    return str(p)


def test_matches_transformers_bert_tokenizer(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file)
    for text in CORPUS:
        ref_ids = hf(text, add_special_tokens=False)["input_ids"]
        assert ours(text) == ref_ids, (
            f"mismatch on {text!r}: ours={ours.tokenize(text)} "
            f"theirs={hf.tokenize(text)}")


def test_matches_reference_call_pattern(vocab_file):
    """The exact call the reference makes: truncation to max_length over
    the pre-special-token stream (lmdb_data_loader.py:155)."""
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file)
    text = " ".join(CORPUS[:8])
    ref = hf(text, padding=False, truncation=True, max_length=16,
             add_special_tokens=False)["input_ids"]
    assert ours(text)[:16] == ref


def test_basic_properties(vocab_file):
    tok = WordPieceTokenizer(vocab_file)
    assert tok("") == []
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert tok.tokenize("zzzqqq") == ["[UNK]"]
    # ids index the vocab file line numbers
    assert tok("hello world") == [VOCAB.index("hello"), VOCAB.index("world")]


def test_requires_unk():
    with pytest.raises(ValueError):
        WordPieceTokenizer({"hello": 0})
