"""HF tokenizer.json loading via the `tokenizers` library.

The reference re-implements tokenizer.json parsing by hand
(/root/reference/src/tokenizer/mod.rs:1403-1859); here we wrap the official
Rust `tokenizers` package (available in the image) behind the same Tokenizer
surface so GGUF- and HF-backed tokenizers are interchangeable.
"""

from __future__ import annotations

import json
from typing import Iterable


class HFTokenizer:
    def __init__(self, path: str):
        from tokenizers import Tokenizer as _T

        self._tok = _T.from_file(path)
        self.bos_id = None
        self.eos_id = None
        self.add_bos = False
        self.add_eos = False
        self.chat_template = None
        self.eot_ids: tuple[int, ...] = ()
        # sniff special ids from config next to the json if present
        import os

        cfgp = os.path.join(os.path.dirname(path), "tokenizer_config.json")
        if os.path.exists(cfgp):
            with open(cfgp) as f:
                cfg = json.load(f)
            self.chat_template = cfg.get("chat_template")
            for key, attr in (("bos_token", "bos_id"), ("eos_token", "eos_id")):
                v = cfg.get(key)
                if isinstance(v, dict):
                    v = v.get("content")
                if isinstance(v, str):
                    tid = self._tok.token_to_id(v)
                    if tid is not None:
                        setattr(self, attr, tid)
            self.add_bos = bool(cfg.get("add_bos_token", False))
        if self.eos_id is not None:
            self.eot_ids = (self.eos_id,)

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, add_bos: bool | None = None,
               add_special: bool = True, parse_special: bool = True) -> list[int]:
        ids = self._tok.encode(text, add_special_tokens=add_special).ids
        use_bos = self.add_bos if add_bos is None else add_bos
        if use_bos and self.bos_id is not None and (not ids or ids[0] != self.bos_id):
            ids = [self.bos_id] + ids
        return ids

    def decode(self, ids: Iterable[int], skip_special: bool = True) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=skip_special)

    def token_bytes(self, token_id: int) -> bytes:
        return self._tok.decode([token_id], skip_special_tokens=False).encode("utf-8")

    def streaming_decoder(self):
        from .gguf_tokenizer import StreamingDecoder

        return StreamingDecoder(self)  # type: ignore[arg-type]

    def is_eog(self, token_id: int) -> bool:
        return token_id == self.eos_id or token_id in self.eot_ids
