import os

from mkg_analogy_tpu.text.wordpiece import (
    SPECIAL_TOKENS,
    BasicTokenizer,
    WordPieceTokenizer,
    train_wordpiece_vocab,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps",
    "a lazy dog and a quick fox",
    "dogs and cats and foxes",
] * 5


def test_basic_tokenizer():
    bt = BasicTokenizer()
    assert bt.tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert bt.tokenize("café") == ["cafe"]
    assert bt.tokenize("  spaces\t\tand\nnewlines ") == ["spaces", "and", "newlines"]


def test_train_and_roundtrip(tmp_path):
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=128)
    tok = WordPieceTokenizer(vocab)
    for sp in SPECIAL_TOKENS:
        assert sp in tok.vocab
    ids = tok.encode("the quick brown fox")
    assert all(isinstance(i, int) for i in ids)
    assert "[UNK]" not in tok.decode(ids)
    assert tok.decode(ids).replace(" ", "") == "thequickbrownfox"
    # frequent words become single tokens
    assert tok.tokenize("quick") == ["quick"]

    tok.save(str(tmp_path / "tok"))
    tok2 = WordPieceTokenizer.load(str(tmp_path / "tok"))
    assert tok2.vocab == tok.vocab
    assert tok2.encode("lazy dog") == tok.encode("lazy dog")


def test_unknown_chars_map_to_unk():
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=128)
    tok = WordPieceTokenizer(vocab)
    ids = tok.encode("ωψζ")
    assert ids == [tok.unk_id]


def test_vocab_file_format(tmp_path):
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=96)
    tok = WordPieceTokenizer(vocab)
    path = tmp_path / "vocab.txt"
    tok.save_vocab(str(path))
    tok2 = WordPieceTokenizer.from_vocab_file(str(path))
    assert tok2.vocab == tok.vocab


def test_long_word_maps_to_unk():
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=128)
    tok = WordPieceTokenizer(vocab, max_chars_per_word=10)
    assert tok.tokenize("a" * 50) == ["[UNK]"]


def test_special_token_ids_fixed():
    vocab = train_wordpiece_vocab(CORPUS, vocab_size=96)
    tok = WordPieceTokenizer(vocab)
    assert tok.pad_id == 0 and tok.unk_id == 1
    assert tok.cls_id == 2 and tok.sep_id == 3 and tok.mask_id == 4
