"""Vocabulary with the reference's reserved-id layout.

(reference: PosTagger/Lingvo.PosTagger/Models/Vocab.cs:14-19,27,48-54 — EOS=0, BOS=1,
UNK=2, real words from START_MEANING_INDEX=3; GetIndicesByWords Vocab.cs:177-194 maps
unknown → UNK; vocab build = frequency-descending capped list,
Corpus/CorpusBatch.cs:98-221 with default cap 50k, Applications/Options.cs:72.)
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

EOS = "</s>"
BOS = "<s>"
UNK = "<unk>"
EOS_ID, BOS_ID, UNK_ID = 0, 1, 2
START_MEANING_INDEX = 3

PREDEFINED = (EOS, BOS, UNK)


class Vocab:
    def __init__(self, items: Iterable[str]):
        self.word2id: dict[str, int] = {EOS: EOS_ID, BOS: BOS_ID, UNK: UNK_ID}
        for w in items:
            if w not in self.word2id:
                self.word2id[w] = len(self.word2id)
        self.id2word = {i: w for w, i in self.word2id.items()}

    def __len__(self) -> int:
        return len(self.word2id)

    def get_indices(self, words: Iterable[str]) -> list[int]:
        w2i = self.word2id
        return [w2i.get(w, UNK_ID) for w in words]

    def get_words(self, ids: Iterable[int]) -> list[str]:
        i2w = self.id2word
        return [i2w.get(i, UNK) for i in ids]

    @staticmethod
    def from_file(path: str) -> "Vocab":
        """Vocab file source (S6): one ``word`` or ``word<TAB>anything`` per line; ids
        are REASSIGNED sequentially from START_MEANING_INDEX=3 in file order — any id
        column in the file is ignored, empty words and the predefined tokens are
        skipped (reference: Models/Vocab.cs:97-119)."""
        words = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n\r")
                idx = line.find("\t")
                word = line if idx == -1 else line[:idx]
                if not word or word in PREDEFINED:
                    continue
                words.append(word)
        return Vocab(words)

    def to_file(self, path: str) -> str:
        """Inverse of from_file: ``word<TAB>id`` lines, meaning ids only, id order."""
        with open(path, "w", encoding="utf-8") as f:
            for w, i in sorted(self.word2id.items(), key=lambda kv: kv[1]):
                if i >= START_MEANING_INDEX:
                    f.write(f"{w}\t{i}\n")
        return path

    @staticmethod
    def build(token_lists: Iterable[Iterable[str]], cap: int = 50_000) -> "Vocab":
        """Frequency-descending vocab (ties broken lexicographically for determinism —
        the reference's Dictionary ordering is unspecified, so we pin one)."""
        c: Counter[str] = Counter()
        for toks in token_lists:
            c.update(toks)
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
        return Vocab(w for w, _ in ranked)
