from .wordpiece import WordPieceTokenizer, train_wordpiece_vocab, BasicTokenizer

__all__ = ["WordPieceTokenizer", "train_wordpiece_vocab", "BasicTokenizer"]
