"""Engine: model + tokenizer + sampler -> text generation.

Parity target: /root/reference/src/engine.rs:309-1522 (Engine::load /
generate / generate_streaming / embed, ChatEngine), re-designed around the
jitted ModelRunner: prefill is batched over prompt tokens (the reference
feeds them one at a time), decode keeps the KV cache donated on device, and
greedy sampling runs on device so only a single int crosses the host
boundary per token.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile
from ..models.loader import ModelLoader
from ..sampling.sampler import Sampler, SamplerConfig
from ..tokenizer.gguf_tokenizer import Tokenizer
from .chat import ChatTemplate
from .runner import ModelRunner

log = logging.getLogger(__name__)


@dataclass
class EngineConfig:
    max_context_len: int | None = None
    max_batch: int = 1
    weight_mode: str = "quant"  # "quant" (fused kernels) | "dequant"
    kv_dtype: str = "float32"  # float32 | bfloat16 (legacy; see kv_format)
    kv_format: str | None = None  # f32 | bf16 | i8 | f8_e4m3 | f8_e5m2
    matmul_precision: str = "highest"
    seed: int | None = None
    chat_template: str | None = None  # override autodetected style
    # generate past the context window by sliding the KV cache left
    # (exact RoPE re-rotation; see models/kv.shift_left)
    context_shift: bool = False
    prompt_cache: bool = False  # prefix-sharing KV snapshots (LRU)
    prompt_cache_bytes: int = 2 << 30
    # session-file persistence (llama.cpp --prompt-cache parity): load the
    # cache from this .npz at startup (implies prompt_cache=True); call
    # Engine.save_prompt_cache() to write it back
    prompt_cache_file: str | None = None
    # GGUF LoRA adapter path applied at load (models/lora.py); None = base
    lora: str | None = None
    lora_scale: float | None = None  # override adapter alpha/rank scaling
    # tensor/data-parallel mesh axes over local devices (1,1 = single chip);
    # mesh_model=0 picks the smallest model axis that fits HBM (auto)
    mesh_data: int = 1
    mesh_model: int = 1


@dataclass
class GenerationStats:
    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_time: float = 0.0
    decode_time: float = 0.0

    @property
    def decode_tps(self) -> float:
        return self.generated_tokens / self.decode_time if self.decode_time else 0.0

    @property
    def prefill_tps(self) -> float:
        return self.prompt_tokens / self.prefill_time if self.prefill_time else 0.0


class Engine:
    def __init__(self, runner: ModelRunner | None, tokenizer,
                 config: EngineConfig, gguf: GGUFFile | None = None,
                 encoder=None, t5=None):
        self.runner = runner
        self.encoder = encoder  # BertEncoder for encoder-only models
        self.t5 = t5  # T5Runner for encoder-decoder models
        self.tokenizer = tokenizer
        self.config = config
        self.gguf = gguf
        self.chat_template = (ChatTemplate(config.chat_template)
                              if config.chat_template
                              else ChatTemplate.detect(tokenizer))
        self.stats = GenerationStats()
        self.prompt_cache = None
        if config.prompt_cache or config.prompt_cache_file:
            from .prompt_cache import PromptCache

            self.prompt_cache = PromptCache(max_bytes=config.prompt_cache_bytes)
            if config.prompt_cache_file and \
                    os.path.exists(config.prompt_cache_file):
                n = self.prompt_cache.load(config.prompt_cache_file)
                log.info("prompt cache: loaded %d entries from %s", n,
                         config.prompt_cache_file)

    @staticmethod
    def _enable_compile_cache() -> None:
        """Persistent XLA compilation cache: on this class of device some
        kernels (notably the fused MoE dispatch) take minutes of Mosaic
        compile — paying that once per machine instead of once per process
        is the difference between a usable and an unusable first token.
        LLAMA_GGUF_NO_COMPILE_CACHE=1 disables."""
        if os.environ.get("LLAMA_GGUF_NO_COMPILE_CACHE", "0") == "1":
            return
        try:
            import jax

            cache_dir = os.environ.get(
                "LLAMA_GGUF_COMPILE_CACHE",
                os.path.expanduser("~/.cache/llama-gguf-tpu/jax_cache"))
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:  # never fatal
            pass

    @classmethod
    def load(cls, path: str, config: EngineConfig | None = None) -> "Engine":
        config = config or EngineConfig()
        cls._enable_compile_cache()
        t0 = time.time()
        if str(path).endswith(".onnx"):
            return cls._load_onnx(path, config, t0)
        gguf = GGUFFile.open(path)
        tokenizer = Tokenizer.from_gguf(gguf.metadata)
        # mesh loads keep weights on host (numpy) so the full model is never
        # materialized on one device before sharding — shard_params then
        # device_puts each leaf straight to its NamedSharding
        needs_mesh = config.mesh_model != 1 or config.mesh_data != 1
        loader = ModelLoader(
            gguf, mode=config.weight_mode,
            to_device=(lambda arr, name: np.asarray(arr)) if needs_mesh
            else None,
        )
        if loader.config.arch_info is not None and \
                loader.config.arch_info.name in ("t5", "t5encoder"):
            from ..models.t5 import T5Runner

            params, cfg = loader.build()
            max_seq = cfg.max_seq_len
            if config.max_context_len:
                max_seq = min(max_seq, config.max_context_len)
            log.info("loaded encoder-decoder %s (%s, %d enc / %d dec "
                     "layers) in %.1fs", path, cfg.arch,
                     len(params["enc"]["layers"]),
                     len(params.get("dec", {}).get("layers", ())),
                     time.time() - t0)
            # decoder cache default-capped at 1024 slots; an explicit
            # max_context_len overrides (T5 models rarely decode long)
            dec_cap = config.max_context_len or min(max_seq, 1024)
            return cls(None, tokenizer, config, gguf,
                       t5=T5Runner(params, cfg, max_seq=dec_cap))
        if loader.config.arch_info is not None and \
                loader.config.arch_info.is_encoder_only:
            from ..models.bert import BertEncoder, load_bert

            params, cfg = load_bert(loader)
            log.info("loaded encoder-only %s (%s, %d layers) in %.1fs",
                     path, cfg.arch, cfg.num_layers, time.time() - t0)
            return cls(None, tokenizer, config, gguf,
                       encoder=BertEncoder(params, cfg))
        params, cfg = loader.build()
        max_seq = cfg.max_seq_len
        if config.max_context_len:
            max_seq = min(max_seq, config.max_context_len)
        mesh = None
        n_model, n_data = config.mesh_model, config.mesh_data
        if n_model == 0:  # auto: fit weights into per-device HBM
            from ..parallel.multihost import auto_mesh

            weight_bytes = sum(i.nbytes for i in gguf.tensors.values())
            n_data, n_model = auto_mesh(int(weight_bytes * 1.5))
        if n_model * n_data > 1:
            from ..parallel.sharding import make_mesh, shard_params

            mesh = make_mesh(n_model=n_model, n_data=n_data)
            params = shard_params(params, mesh)
            log.info("sharded over mesh (data=%d, model=%d)", n_data, n_model)
        elif needs_mesh:  # auto-fit resolved to a single device
            params = jax.tree_util.tree_map(jnp.asarray, params)
        if config.lora:
            # after sharding: LoraLinear wraps the (possibly sharded) base
            # leaf; the low-rank a/b factors stay replicated and XLA fuses
            # the x@a@b correction into the same pass
            from ..models.lora import LoraAdapter, apply_lora

            adapter = LoraAdapter.load_gguf(config.lora)
            n = apply_lora(params, adapter, scale=config.lora_scale)
            log.info("lora: attached %d tensors from %s (rank %d)",
                     n, config.lora, adapter.rank)
        runner = ModelRunner(
            params, cfg, max_batch=config.max_batch, max_seq=max_seq,
            kv_dtype=jnp.bfloat16 if config.kv_dtype == "bfloat16" else jnp.float32,
            matmul_precision=config.matmul_precision,
            kv_format=config.kv_format, mesh=mesh,
            swa_ring=not config.context_shift,
        )
        log.info("loaded %s (%s, %d layers, vocab %d) in %.1fs",
                 path, cfg.arch, cfg.num_layers, cfg.vocab_size,
                 time.time() - t0)
        return cls(runner, tokenizer, config, gguf)

    @classmethod
    def _load_onnx(cls, path: str, config: EngineConfig,
                   t0: float) -> "Engine":
        """ONNX path (parity: reference Engine::load ONNX branch): HF
        Optimum export + tokenizer.json in the same directory."""
        import os

        from ..onnx.loader import load_onnx_model

        params, cfg = load_onnx_model(path)
        tok_path = os.path.join(os.path.dirname(os.path.abspath(path)),
                                "tokenizer.json")
        tokenizer = None
        if os.path.exists(tok_path):
            from ..tokenizer.hf_json import HFTokenizer

            tokenizer = HFTokenizer(tok_path)
        max_seq = cfg.max_seq_len
        if config.max_context_len:
            max_seq = min(max_seq, config.max_context_len)
        runner = ModelRunner(
            params, cfg, max_batch=config.max_batch, max_seq=max_seq,
            kv_dtype=jnp.bfloat16 if config.kv_dtype == "bfloat16"
            else jnp.float32,
            matmul_precision=config.matmul_precision,
            kv_format=config.kv_format,
        )
        log.info("loaded ONNX %s (%s, %d layers) in %.1fs",
                 path, cfg.arch, cfg.num_layers, time.time() - t0)
        return cls(runner, tokenizer, config)

    # -- generation ----------------------------------------------------------

    def generate(self, prompt: str, max_tokens: int = 128,
                 sampler: SamplerConfig | Sampler | None = None,
                 stop: list[str] | None = None,
                 on_token: Callable[[str], None] | None = None,
                 grammar=None) -> str:
        return "".join(
            self.generate_streaming(prompt, max_tokens, sampler, stop,
                                    on_token, grammar=grammar)
        )

    def save_prompt_cache(self, path: str | None = None) -> int:
        """Write the prompt cache to disk (llama.cpp session-file parity);
        path defaults to config.prompt_cache_file. Returns entries saved."""
        path = path or self.config.prompt_cache_file
        if self.prompt_cache is None or not path:
            return 0
        return self.prompt_cache.save(path)

    def make_grammar_sampler(self, machine) -> "GrammarSampler":
        """Bind a grammar machine (json_grammar()/gbnf_grammar()/...) to this
        model's vocab for constrained decoding."""
        from ..sampling.grammar import GrammarSampler

        vocab = [self.tokenizer.decode([i]) for i in
                 range(self.tokenizer.vocab_size)]
        return GrammarSampler(machine, vocab,
                              eos_token_id=self.tokenizer.eos_id)

    def _t5_stream(self, prompt: str, max_tokens: int, sampler, stop,
                   on_token) -> Iterator[str]:
        """Seq2seq generation: encode the prompt once (with a trailing
        EOS, the T5 convention), then decode from decoder_start_token_id
        through the incremental cross-attention step. Stop strings use
        the same prefix-withholding buffer as the batched engine."""
        if "dec" not in self.t5.params:
            raise RuntimeError(
                "t5encoder model: use embed(), not generate()")
        if sampler is not None and isinstance(sampler, SamplerConfig):
            sampler = Sampler(sampler)
        ids = self._t5_encoder_ids(prompt)
        self.stats = GenerationStats(prompt_tokens=len(ids))
        t0 = time.time()
        history: list[int] = []

        def pick(row):  # row: 1-D [V] raw logits
            if sampler is None:
                return int(np.argmax(row))
            return sampler.sample(row, history)

        from .batched import _StopBuffer

        decoder = self.tokenizer.streaming_decoder()
        stopbuf = _StopBuffer(stop or [])
        t5 = self.t5
        enc_out, enc_mask = t5.encode_ids(ids)
        cache = t5.make_cache(enc_out)
        self.stats.prefill_time = time.time() - t0
        t1 = time.time()
        tok = t5.cfg.decoder_start_token_id
        import jax.numpy as jnp
        for t in range(min(max_tokens, t5.max_seq - 1)):
            logits, cache = t5._step(
                jnp.asarray([[tok]], jnp.int32),
                jnp.asarray([[t]], jnp.int32),
                jnp.asarray([t + 1], jnp.int32), cache, enc_mask)
            tok = pick(np.asarray(logits[0, 0]))
            if self.tokenizer.is_eog(tok):
                break
            history.append(tok)
            self.stats.generated_tokens += 1
            piece = decoder.push(tok)
            if piece:
                out, hit = stopbuf.push(piece)
                if out:
                    if on_token:
                        on_token(out)
                    yield out
                if hit:
                    self.stats.decode_time = time.time() - t1
                    return
        tail = stopbuf.flush()
        if tail:
            if on_token:
                on_token(tail)
            yield tail
        self.stats.decode_time = time.time() - t1

    def _t5_encoder_ids(self, prompt: str | list[int]) -> list[int]:
        """Tokenize (or pass through) encoder input, appending the
        trailing EOS that llama.cpp/HF T5 conventions expect."""
        ids = (self.tokenizer.encode(prompt) if isinstance(prompt, str)
               else list(prompt))
        eos = self.tokenizer.eos_id if self.tokenizer else None
        if eos is not None and (not ids or ids[-1] != eos):
            ids = ids + [eos]
        return ids

    def generate_streaming(self, prompt: str, max_tokens: int = 128,
                           sampler: SamplerConfig | Sampler | None = None,
                           stop: list[str] | None = None,
                           on_token: Callable[[str], None] | None = None,
                           grammar=None) -> Iterator[str]:
        if self.t5 is not None:  # encoder-decoder (T5) path
            if grammar is not None:
                raise ValueError(
                    "grammar-constrained decoding is not supported for "
                    "T5 models")
            yield from self._t5_stream(prompt, max_tokens, sampler, stop,
                                       on_token)
            return
        if self.runner is None:
            raise RuntimeError(
                "encoder-only model: use embed(), not generate()")
        if sampler is None:
            sampler = Sampler(SamplerConfig(seed=self.config.seed))
        elif isinstance(sampler, SamplerConfig):
            sampler = Sampler(sampler)

        ids = self.tokenizer.encode(prompt)
        ids = ids[-(self.runner.max_seq - max_tokens - 1):] if \
            len(ids) + max_tokens >= self.runner.max_seq else ids
        self.stats = GenerationStats(prompt_tokens=len(ids))

        t0 = time.time()
        kv = self.runner.init_kv()
        shared = 0
        if self.prompt_cache is not None:
            kv, shared = self.prompt_cache.restore(ids, kv)
        logits, kv, pos = self.runner.prefill(ids[shared:], kv,
                                              start_pos=shared)
        if self.prompt_cache is not None:
            self.prompt_cache.put(ids, kv)
        self.stats.prefill_time = time.time() - t0

        decoder = self.tokenizer.streaming_decoder()
        history = list(ids)
        tail = ""  # holds text that might be a stop-pattern prefix
        t1 = time.time()
        for _ in range(max_tokens):
            mask = grammar.get_token_mask() if grammar is not None else None
            tok = sampler.sample(np.asarray(logits), history, mask=mask)
            if self.tokenizer.is_eog(tok):
                break
            history.append(tok)
            piece = decoder.push(tok)
            if grammar is not None:
                grammar.record_token(self.tokenizer.decode([tok]))
                if grammar.is_complete and grammar.state is not None and \
                        grammar.machine.exhausted(grammar.state):
                    if piece:
                        if on_token:
                            on_token(piece)
                        yield piece
                    break
            self.stats.generated_tokens += 1
            if piece:
                if stop:
                    tail += piece
                    hit = next((s for s in stop if s in tail), None)
                    if hit is not None:
                        out = tail[: tail.index(hit)]
                        if out:
                            if on_token:
                                on_token(out)
                            yield out
                        break
                    # emit all but the longest possible stop prefix
                    keep = max(
                        (len(s) - 1 for s in stop if s and tail.endswith(s[: len(s) - 1])),
                        default=0,
                    )
                    emit, tail = (tail[:-keep], tail[-keep:]) if keep else (tail, "")
                    if emit:
                        if on_token:
                            on_token(emit)
                        yield emit
                else:
                    if on_token:
                        on_token(piece)
                    yield piece
            if pos >= self.runner.max_seq - 1:
                if not self.config.context_shift:
                    break
                # context shift: drop the oldest quarter of the window and
                # slide the cache left with exact RoPE re-rotation
                # (parity: KVCache::shift_left + ensure_context_space, but
                # the reference's memmove leaves stale rotations)
                from ..models import kv as KV

                n = max(self.runner.max_seq // 4, 1)
                kv = KV.shift_left(kv, n, model_cfg=self.runner.cfg)
                pos -= n
            logits, kv = self.runner.decode_one(tok, pos, kv)
            pos += 1
        else:
            if tail:
                yield tail
                tail = ""
        self.stats.decode_time = time.time() - t1

    def greedy_tokens(self, prompt_ids: list[int], max_tokens: int) -> list[int]:
        """Pure greedy decode for parity harnesses: returns generated ids."""
        if self.t5 is not None:
            eos = self.tokenizer.eos_id if self.tokenizer else None
            return self.t5.generate_ids(self._t5_encoder_ids(prompt_ids),
                                        max_tokens, eos_id=eos)
        kv = self.runner.init_kv()
        logits, kv, pos = self.runner.prefill(prompt_ids, kv)
        out = []
        for _ in range(max_tokens):
            tok = int(np.argmax(np.asarray(logits)))
            out.append(tok)
            if self.tokenizer is not None and self.tokenizer.is_eog(tok):
                break
            if pos >= self.runner.max_seq - 1:
                break
            logits, kv = self.runner.decode_one(tok, pos, kv)
            pos += 1
        return out

    # -- embeddings ----------------------------------------------------------

    def embed(self, text: str, pooling: str = "mean",
              normalize: bool = True) -> np.ndarray:
        ids = self.tokenizer.encode(text)
        if self.encoder is not None:  # encoder-only (BERT-family) model
            return self.encoder.embed(ids, pooling=pooling,
                                      normalize=normalize)
        if self.t5 is not None:  # t5 / t5encoder: pooled encoder output
            enc_out, mask = self.t5.encode_ids(ids)
            h = np.asarray(enc_out[0])[np.asarray(mask[0])]
            vec = h[-1] if pooling == "last" else (
                h[0] if pooling == "cls" else h.mean(axis=0))
            if normalize:
                vec = vec / (np.linalg.norm(vec) + 1e-12)
            return vec
        from ..models.embeddings import extract_embedding

        return extract_embedding(self.runner, ids, pooling=pooling,
                                 normalize=normalize)

    # -- chat ----------------------------------------------------------------

    def chat(self, messages: list[dict], max_tokens: int = 512,
             sampler: SamplerConfig | None = None,
             stop: list[str] | None = None) -> str:
        prompt = self.chat_template.render(messages)
        return self.generate(prompt, max_tokens=max_tokens, sampler=sampler,
                             stop=stop)

    def chat_streaming(self, messages: list[dict], max_tokens: int = 512,
                       sampler: SamplerConfig | None = None,
                       stop: list[str] | None = None) -> Iterator[str]:
        prompt = self.chat_template.render(messages)
        return self.generate_streaming(prompt, max_tokens=max_tokens,
                                       sampler=sampler, stop=stop)


class ChatEngine:
    """Multi-turn conversation state on top of Engine (parity:
    reference engine.rs:1113-1460, incl. context-shift on overflow)."""

    def __init__(self, engine: Engine, system_prompt: str | None = None):
        self.engine = engine
        self.messages: list[dict] = []
        if system_prompt:
            self.messages.append({"role": "system", "content": system_prompt})

    def send(self, user_message: str, max_tokens: int = 512,
             sampler: SamplerConfig | None = None) -> str:
        self.messages.append({"role": "user", "content": user_message})
        self._ensure_context_space(max_tokens)
        reply = self.engine.chat(self.messages, max_tokens=max_tokens,
                                 sampler=sampler)
        self.messages.append({"role": "assistant", "content": reply})
        return reply

    def send_streaming(self, user_message: str, max_tokens: int = 512,
                       sampler: SamplerConfig | None = None) -> Iterator[str]:
        self.messages.append({"role": "user", "content": user_message})
        self._ensure_context_space(max_tokens)
        parts: list[str] = []
        for piece in self.engine.chat_streaming(self.messages,
                                                max_tokens=max_tokens,
                                                sampler=sampler):
            parts.append(piece)
            yield piece
        self.messages.append({"role": "assistant", "content": "".join(parts)})

    def _ensure_context_space(self, max_tokens: int) -> None:
        """Drop oldest non-system turns until the prompt fits
        (parity: ensure_context_space, engine.rs:1394)."""
        limit = self.engine.runner.max_seq - max_tokens - 16
        while len(self.messages) > 2:
            prompt = self.engine.chat_template.render(self.messages)
            if len(self.engine.tokenizer.encode(prompt)) <= limit:
                return
            start = 1 if self.messages[0]["role"] == "system" else 0
            del self.messages[start : start + 2]

    def reset(self) -> None:
        keep_system = self.messages[:1] if self.messages and \
            self.messages[0]["role"] == "system" else []
        self.messages = keep_system
