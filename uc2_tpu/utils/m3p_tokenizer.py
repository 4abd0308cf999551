"""XLM-R tokenizer with fairseq id offset (M3P-compatible preprocessing).

Reference: utils/m3p_tokenizer.py — a sentencepiece-backed XLM-R tokenizer
whose ids are shifted to fairseq's layout: <s>=0, <pad>=1, </s>=2, <unk>=3,
then sentencepiece pieces offset by +1 (fairseq reserves one extra slot),
with <mask> as the last id. Used for M3P-format multilingual eval data.

The sentencepiece python package isn't in this image; the class accepts
either a sentencepiece model path (preferred, exact) or falls back to a HF
tokenizer if available. All runtime training paths consume *precomputed*
ids from the DBs, so this is an offline-prep tool (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import List, Optional


class M3PTokenizer:
    FAIRSEQ_OFFSET = 1

    def __init__(self, spm_path: Optional[str] = None,
                 vocab_size: int = 250002):
        self.vocab_size = vocab_size
        self.bos_id = 0
        self.pad_id = 1
        self.eos_id = 2
        self.unk_id = 3
        self.mask_id = vocab_size - 1
        self.sp = None
        if spm_path is not None:
            try:
                import sentencepiece as spm
                self.sp = spm.SentencePieceProcessor()
                self.sp.Load(spm_path)
            except ImportError as e:
                raise ImportError(
                    "sentencepiece is required for M3PTokenizer with a "
                    ".model path; precompute ids offline or install it"
                ) from e
        else:
            try:
                from transformers import XLMRobertaTokenizer
                self._hf = XLMRobertaTokenizer.from_pretrained(
                    "xlm-roberta-base")
            except Exception:
                self._hf = None

    def tokenize(self, text: str) -> List[str]:
        if self.sp is not None:
            return self.sp.EncodeAsPieces(text)
        if self._hf is not None:
            return self._hf.tokenize(text)
        raise RuntimeError("no tokenizer backend available")

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        if self.sp is not None:
            out = []
            for t in tokens:
                i = self.sp.PieceToId(t)
                out.append(self.unk_id if i == self.sp.unk_id()
                           else i + self.FAIRSEQ_OFFSET)
            return out
        if self._hf is not None:
            return [self._hf._convert_token_to_id(t) for t in tokens]
        raise RuntimeError("no tokenizer backend available")

    def encode(self, text: str, add_special: bool = True) -> List[int]:
        ids = self.convert_tokens_to_ids(self.tokenize(text))
        if add_special:
            return [self.bos_id] + ids + [self.eos_id]
        return ids
